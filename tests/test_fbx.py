"""Binary-FBX geometry loader + the real Dragon_8k reference asset.

The reference ships its hero geometry as binary FBX
(`/root/reference/Assets/Models/Dragon_8k.fbx`); Unity's importer did the
parsing there (`RayTracingMesh.cs:60-62` reads the imported mesh). Here
`scene/fbx.py` is the importer, and the converted fixture
(`halogen_tpu/scene/assets/dragon_8k.npz`) feeds the ladder-4/5 scenes.
"""

import pathlib

import numpy as np
import pytest

from halogen_tpu.scene.meshes import real_dragon_mesh

_REF_FBX = pathlib.Path("/root/reference/Assets/Models/Dragon_8k.fbx")


def _mesh_stats(verts, faces):
    assert verts.ndim == 2 and verts.shape[1] == 3
    assert faces.ndim == 2 and faces.shape[1] == 3
    assert faces.min() >= 0 and faces.max() < len(verts)
    # non-degenerate: every triangle has nonzero area
    e1 = verts[faces[:, 1]] - verts[faces[:, 0]]
    e2 = verts[faces[:, 2]] - verts[faces[:, 0]]
    areas = np.linalg.norm(np.cross(e1, e2), axis=1)
    return areas


@pytest.mark.skipif(not _REF_FBX.exists(), reason="reference FBX absent")
def test_fbx_parses_reference_dragon():
    from halogen_tpu.scene.fbx import load_fbx_geometry

    verts, faces = load_fbx_geometry(str(_REF_FBX))
    assert len(faces) == 8712  # Dragon_8k: 8,712 triangles
    areas = _mesh_stats(verts, faces)
    assert (areas > 0).mean() > 0.999


def test_dragon_fixture_matches_fbx_source():
    verts, faces = real_dragon_mesh()
    assert len(faces) == 8712
    areas = _mesh_stats(verts, faces)
    assert (areas > 0).mean() > 0.999
    # normalized: centered, largest axis = 2
    lo, hi = verts.min(0), verts.max(0)
    assert np.allclose((lo + hi) * 0.5, 0.0, atol=1e-3)
    assert np.isclose((hi - lo).max(), 2.0, atol=1e-3)


def test_glass_dragon_scene_uses_real_geometry():
    from halogen_tpu.scene.meshes import glass_dragon_scene

    scene = glass_dragon_scene().build()
    # Cornell shell (12) + dragon (8712)
    assert scene.num_triangles == 12 + 8712


def test_real_dragon_renders():
    """Smoke render of the real dragon through the BVH path: finite image
    with the dragon visibly occluding the background."""
    import jax.numpy as jnp
    import halogen_tpu as ht
    from halogen_tpu.scene.material import Material
    from halogen_tpu.scene.scene import Scene

    verts, faces = real_dragon_mesh()
    s = Scene()
    s.add_mesh(verts, faces, Material.emissive((1.0, 0.2, 0.2), 2.0))
    scene = s.build()
    cam = ht.make_camera(position=(0, 0.2, 3.0), target=(0, 0, 0),
                         fov_deg=45)
    st = ht.RenderSettings(width=24, height=24, samples_per_pixel=1,
                           max_bounces=0, ray_chunk_size=576)
    img = np.asarray(ht.render_frame(scene, cam, st, 1))
    assert np.isfinite(img).all()
    center = img[8:16, 8:16]
    assert center[..., 0].mean() > 0.5  # emissive dragon fills the middle


@pytest.mark.parametrize("fbx,loader,expect_faces", [
    ("Suzanne Final.fbx", "real_suzanne_mesh", 15744),
    ("Closet_Solid.fbx", "real_closet_mesh", 540),
])
def test_fbx_parses_remaining_reference_meshes(fbx, loader, expect_faces):
    """All three reference meshes load: Dragon_8k + Suzanne Final +
    Closet_Solid (`/root/reference/Assets/Models/`)."""
    import halogen_tpu.scene.meshes as meshes

    verts, faces = getattr(meshes, loader)()
    assert len(faces) == expect_faces
    areas = _mesh_stats(verts, faces)
    assert (areas > 0).mean() > 0.99
    # fixture matches a fresh parse when the reference tree is present
    path = pathlib.Path("/root/reference/Assets/Models") / fbx
    if path.exists():
        from halogen_tpu.scene.fbx import load_fbx_geometry, normalized

        v2, f2 = load_fbx_geometry(str(path))
        assert len(f2) == expect_faces
        np.testing.assert_allclose(
            normalized(v2, 2.0), verts, atol=1e-5)
