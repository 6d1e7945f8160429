"""Pallas traversal kernel (interpret mode on CPU): must agree with the
brute-force and lockstep-JAX BVH intersectors on full renders."""

import numpy as np
import pytest

import halogen_tpu as ht
from halogen_tpu.config import Intersector
from halogen_tpu.scene import cornell
from halogen_tpu.scene.envmap import Envmap
from halogen_tpu.scene.meshes import dragons_hero_scene

CAM = ht.make_camera(position=(0, 0, 3.2), target=(0, 0, 0), fov_deg=40)
ST = ht.RenderSettings(width=24, height=24, samples_per_pixel=2,
                       max_bounces=2, ray_chunk_size=576)


def test_pallas_matches_brute_cornell():
    scene = cornell.cornell_box().build()
    a = np.asarray(ht.render_frame(scene, CAM, ST.replace(
        intersector=Intersector.BRUTE), 1))
    b = np.asarray(ht.render_frame(scene, CAM, ST.replace(
        intersector=Intersector.PALLAS), 1))
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)


def test_pallas_matches_bvh_dragons():
    cam = ht.make_camera(position=(0, 1.5, 5.0), target=(0, -0.3, 0),
                         fov_deg=45)
    scene = dragons_hero_scene(2, tris=1280).build(
        envmap=Envmap.gradient_sky())
    st = ST.replace(use_envmap=True)
    a = np.asarray(ht.render_frame(scene, cam, st.replace(
        intersector=Intersector.BVH), 1))
    b = np.asarray(ht.render_frame(scene, cam, st.replace(
        intersector=Intersector.PALLAS), 1))
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)


def test_pallas_sphere_priority():
    """Sphere in front of a mesh: the sphere must win in the Pallas path."""
    from halogen_tpu.scene.material import Material
    from halogen_tpu.scene.scene import Scene

    s = Scene()
    s.add_mesh(
        np.array([(-2, -2, -1), (2, -2, -1), (2, 2, -1), (-2, 2, -1)],
                 np.float32),
        np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        Material.emissive((0, 1, 0), 1.0),
    )
    s.add_sphere((0, 0, 0.5), 0.4, Material.emissive((1, 0, 0), 1.0))
    scene = s.build()
    img = np.asarray(ht.render_frame(scene, CAM, ST.replace(
        intersector=Intersector.PALLAS, samples_per_pixel=1, max_bounces=0),
        1))
    center = img[12, 12]
    assert center[0] > 0.9 and center[1] < 0.1  # sphere (red) wins
    corner = img[1, 1]
    assert corner[1] > 0.9  # wall (green) visible around it
