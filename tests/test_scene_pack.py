"""Scene packing: material dedup, buffer offsets, transforms, OBJ import,
and envmap table shapes (reference HalogenRenderPass.UpdateObjectBuffers,
SURVEY.md §2 #8/#9)."""

import pytest
import numpy as np

from halogen_tpu.scene.envmap import Envmap
from halogen_tpu.scene.material import Material
from halogen_tpu.scene.meshes import load_obj, torus_knot
from halogen_tpu.scene.scene import Scene


def _tri():
    v = np.array([(0, 0, 0), (1, 0, 0), (0, 1, 0)], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    return v, f


def test_material_dedup():
    """Identical materials share one table row (PackMaterialToList,
    HalogenRenderPass.cs:524-537)."""
    s = Scene()
    white = Material.diffuse((0.7, 0.7, 0.7))
    s.add_sphere((0, 0, 0), 1.0, white)
    s.add_sphere((2, 0, 0), 1.0, Material.diffuse((0.7, 0.7, 0.7)))
    s.add_sphere((4, 0, 0), 1.0, Material.diffuse((0.1, 0.2, 0.3)))
    sc = s.build()
    assert sc.materials.count == 2
    assert int(sc.sphere_material[0]) == int(sc.sphere_material[1])
    assert int(sc.sphere_material[2]) != int(sc.sphere_material[0])


def test_mesh_offsets_concatenate():
    s = Scene()
    v, f = _tri()
    s.add_mesh(v, f, Material.diffuse((1, 0, 0)))
    v2, f2 = torus_knot(segments=16, tube_segments=4)
    s.add_mesh(v2, f2, Material.diffuse((0, 1, 0)))
    sc = s.build()
    assert sc.num_meshes == 2
    assert int(sc.mesh_tri_offset[0]) == 0
    assert int(sc.mesh_tri_offset[1]) == 1  # first mesh has 1 tri
    assert sc.num_triangles == 1 + f2.shape[0]
    assert int(sc.mesh_bvh_offset[1]) > 0


def test_transform_bakes_world_copies():
    s = Scene()
    v, f = _tri()
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = (5.0, -2.0, 1.0)
    s.add_mesh(v, f, Material.diffuse((1, 1, 1)), transform=m)
    sc = s.build()
    np.testing.assert_allclose(
        np.asarray(sc.tri_verts_world)[0, 0], [5.0, -2.0, 1.0], atol=1e-6
    )
    # local copy untouched
    np.testing.assert_allclose(
        np.asarray(sc.tri_verts_local)[0, 0], [0, 0, 0], atol=1e-6
    )


def test_obj_loader_quads_and_negative_indices(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1 2 3 4\n"  # quad -> 2 tris
        "f -4 -3 -2\n"  # negative indices
    )
    v, f, n = load_obj(str(p))
    assert v.shape == (4, 3)
    assert f.shape == (3, 3)
    np.testing.assert_array_equal(f[0], [0, 1, 2])
    np.testing.assert_array_equal(f[1], [0, 2, 3])
    np.testing.assert_array_equal(f[2], [0, 1, 2])


def test_envmap_tables_in_scene():
    s = Scene()
    s.add_sphere((0, 0, 0), 1.0, Material.diffuse((1, 1, 1)))
    sc = s.build(envmap=Envmap.gradient_sky(height=16))
    assert len(sc.env_mips) > 1
    assert sc.env_cdf is not None
    h, w = sc.env_mips[0].shape[:2]
    assert sc.env_cdf.pdf.shape == (h, w)
    # pdf integrates to ~1 over the sphere
    import jax.numpy as jnp
    sin_t = np.sin((np.arange(h) + 0.5) / h * np.pi)
    sa = (2 * np.pi / w) * (np.pi / h) * sin_t[:, None]
    total = float((np.asarray(sc.env_cdf.pdf) * sa).sum())
    np.testing.assert_allclose(total, 1.0, atol=1e-3)


def test_scene_without_envmap_has_no_tables():
    s = Scene()
    s.add_sphere((0, 0, 0), 1.0, Material.diffuse((1, 1, 1)))
    sc = s.build()
    assert sc.env_mips == ()
    assert sc.env_cdf is None


@pytest.mark.slow
def test_feature_matrix_scenes_render():
    """Every reference test-scene group constructor builds and renders
    finite images (the feature-matrix sandbox, SURVEY.md §2 assets)."""
    import jax.numpy as jnp
    import halogen_tpu as ht
    from halogen_tpu.scene import cornell

    cam = ht.make_camera(position=(0, 1.0, 5.0), target=(0, -0.3, 0),
                         fov_deg=45)
    st = ht.RenderSettings(width=12, height=12, samples_per_pixel=1,
                           max_bounces=2, ray_chunk_size=144,
                           use_envmap=True)
    from halogen_tpu.scene import meshes

    for ctor in (cornell.material_demo_spheres, cornell.fresnel_spheres,
                 cornell.scale_demo, cornell.glow_orbs,
                 cornell.transparency_spheres,
                 # Testing-Scene groups added round 3 (VERDICT r2 #4):
                 meshes.suzanne_scene, meshes.closet_scene,
                 meshes.outdoors_scene, meshes.bvh_test_scene):
        scene = ctor().build(envmap=Envmap.gradient_sky())
        img = np.asarray(ht.render_frame(scene, cam, st, 1))
        assert np.isfinite(img).all(), ctor.__name__


def test_scale_demo_normals_correct():
    """Non-uniformly scaled mesh normals stay unit-length outward
    (inverse-transpose path)."""
    import halogen_tpu as ht
    from halogen_tpu.config import DebugMode
    from halogen_tpu.scene import cornell

    scene = cornell.scale_demo().build()
    cam = ht.make_camera(position=(0, 1.5, 6.0), target=(0, -0.5, 0),
                         fov_deg=45)
    st = ht.RenderSettings(width=24, height=24, samples_per_pixel=1,
                           max_bounces=0, ray_chunk_size=576,
                           debug_mode=DebugMode.NORMAL)
    img = np.asarray(ht.render_frame(scene, cam, st, 1))
    hit = img.sum(-1) > 1e-6  # sky (no envmap) renders exactly black
    assert hit.any()
    n = img * 2.0 - 1.0  # decode normals
    lens = np.linalg.norm(n, axis=-1)
    np.testing.assert_allclose(lens[hit], 1.0, atol=1e-2)
