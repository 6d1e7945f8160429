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
@pytest.mark.slow
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


@pytest.mark.slow
def test_wavefront_block_size_invariance():
    scene = cornell.cornell_box().build()
    a = np.asarray(ht.render_frame(
        scene, CAM, ST.replace(wavefront=True, wavefront_block=128), 1))
    b = np.asarray(ht.render_frame(
        scene, CAM, ST.replace(wavefront=True, wavefront_block=1024), 1))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_wavefront_gradients_match_lockstep():
    """The custom_vjp wavefront path (wavefront forward, lockstep replay
    backward) must yield the same loss AND gradients as lockstep."""
    import jax
    from halogen_tpu.diff.grad import render_loss_grad

    scene = cornell.cornell_box().build()
    st = ST.replace(samples_per_pixel=2, max_bounces=4)
    target = ht.render_frame(scene, CAM, st, 7) * 0.8
    params = {"materials": scene.materials}

    loss_a, grads_a = render_loss_grad(params, scene, CAM, st, target, 1)
    loss_b, grads_b = render_loss_grad(
        params, scene, CAM, st.replace(wavefront=True), target, 1)

    np.testing.assert_array_equal(np.asarray(loss_a), np.asarray(loss_b))
    for ga, gb in zip(jax.tree.leaves(grads_a), jax.tree.leaves(grads_b)):
        if ga.dtype == jax.dtypes.float0:
            continue
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_wavefront_nondivisible_pool():
    """Pool size not divisible by the block: padding must not leak."""
    scene = cornell.cornell_box().build()
    st = ST.replace(width=17, height=13, ray_chunk_size=221,
                    wavefront_block=100)
    a = np.asarray(ht.render_frame(scene, CAM, st, 1))
    b = np.asarray(ht.render_frame(scene, CAM, st.replace(wavefront=True), 1))
    np.testing.assert_array_equal(a, b)
