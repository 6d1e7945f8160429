"""Wavefront scheduler: must produce bit-identical images to the lockstep
scheduler (same per-ray op sequence, different slots) on every scene
class, including deep-bounce RR-heavy ones."""

import numpy as np
import pytest

import halogen_tpu as ht
from halogen_tpu.scene import cornell
from halogen_tpu.scene.envmap import Envmap

CAM = ht.make_camera(position=(0, 0, 3.2), target=(0, 0, 0), fov_deg=40)
ST = ht.RenderSettings(width=24, height=24, samples_per_pixel=4,
                       max_bounces=6, ray_chunk_size=576,
                       wavefront_block=256)


@pytest.mark.parametrize("scene_name", ["cornell", "glass", "sky"])
def test_wavefront_matches_lockstep(scene_name):
    if scene_name == "cornell":
        scene = cornell.cornell_box().build()
        st = ST
    elif scene_name == "glass":
        scene = cornell.glass_sphere_box().build()
        st = ST.replace(max_bounces=12, max_transmission_bounces=12)
    else:
        scene = cornell.material_demo_spheres().build(
            envmap=Envmap.gradient_sky())
        st = ST.replace(use_envmap=True, env_importance_sampling=True,
                        env_mip_level=0)
    a = np.asarray(ht.render_frame(scene, CAM, st, 1))
    b = np.asarray(ht.render_frame(scene, CAM, st.replace(wavefront=True), 1))
    np.testing.assert_array_equal(a, b)


def test_wavefront_block_size_invariance():
    scene = cornell.cornell_box().build()
    a = np.asarray(ht.render_frame(
        scene, CAM, ST.replace(wavefront=True, wavefront_block=128), 1))
    b = np.asarray(ht.render_frame(
        scene, CAM, ST.replace(wavefront=True, wavefront_block=1024), 1))
    np.testing.assert_array_equal(a, b)


def test_wavefront_nondivisible_pool():
    """Pool size not divisible by the block: padding must not leak."""
    scene = cornell.cornell_box().build()
    st = ST.replace(width=17, height=13, ray_chunk_size=221,
                    wavefront_block=100)
    a = np.asarray(ht.render_frame(scene, CAM, st, 1))
    b = np.asarray(ht.render_frame(scene, CAM, st.replace(wavefront=True), 1))
    np.testing.assert_array_equal(a, b)
