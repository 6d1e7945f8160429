"""Native (C++) binned-SAH BVH builder: structural invariants and render
parity with the Python midpoint builder (SURVEY.md §2 #7 — the builder is
host-native in the reference too)."""

import numpy as np
import pytest

from halogen_tpu.accel import native_loader
from halogen_tpu.accel.bvh import build_bvh, validate_bvh
from halogen_tpu.scene.meshes import dragon_mesh, torus_knot

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native builder not built"
)


@pytest.mark.parametrize("mesh", ["dragon", "knot", "tiny"])
def test_sah_invariants(mesh):
    if mesh == "dragon":
        v, f = dragon_mesh(3)
    elif mesh == "knot":
        v, f = torus_knot(segments=48, tube_segments=6)
    else:
        v = np.array([(0, 0, 0), (1, 0, 0), (0, 1, 0)], np.float32)
        f = np.array([[0, 1, 2]], np.int32)
    tris = v[f]
    b = build_bvh(tris.copy(), method="sah")
    assert validate_bvh(b, tris[b.tri_order]) == []
    assert b.count.max() <= b.max_leaf
    assert sorted(b.tri_order.tolist()) == list(range(tris.shape[0]))


def test_sah_beats_midpoint_on_sah_cost():
    """The SAH build should have lower total surface-area cost than the
    midpoint build on an irregular mesh."""
    v, f = dragon_mesh(3)
    tris = v[f]

    def sah_cost(b):
        area = np.prod(np.maximum(b.hi - b.lo, 0), axis=1)  # proxy: volume-ish
        ext = np.maximum(b.hi - b.lo, 0)
        area = 2 * (ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2]
                    + ext[:, 2] * ext[:, 0])
        leaf = b.count > 0
        root = area[0] if area[0] > 0 else 1.0
        return float((area[leaf] * b.count[leaf]).sum() / root)

    c_sah = sah_cost(build_bvh(tris.copy(), method="sah"))
    c_mid = sah_cost(build_bvh(tris.copy(), method="midpoint"))
    assert c_sah <= c_mid * 1.05  # never meaningfully worse


@pytest.mark.slow
def test_sah_render_matches_midpoint():
    import jax.numpy as jnp
    import halogen_tpu as ht
    from halogen_tpu.config import Intersector
    from halogen_tpu.scene.material import Material
    from halogen_tpu.scene.scene import Scene

    v, f = dragon_mesh(2)
    for method in ("sah", "midpoint"):
        s = Scene()
        s.add_mesh(v, f, Material.emissive((1, 0.5, 0.25), 2.0))
        # monkeypatch build method through max_leaf path: rebuild manually
        import halogen_tpu.accel.bvh as bvh_mod
        orig = bvh_mod.build_bvh
        scene = None
        try:
            bvh_mod_build = lambda t, max_leaf=5, max_depth=32, m=method: (
                orig(t, max_leaf, max_depth, method=m))
            import halogen_tpu.scene.scene as scene_mod
            scene_mod.build_bvh = bvh_mod_build
            scene = s.build()
        finally:
            import halogen_tpu.scene.scene as scene_mod
            scene_mod.build_bvh = orig
        cam = ht.make_camera(position=(0, 0, 3.5), target=(0, 0, 0))
        st = ht.RenderSettings(width=32, height=32, samples_per_pixel=1,
                               max_bounces=0, ray_chunk_size=1024,
                               intersector=Intersector.BVH)
        img = np.asarray(ht.render_frame(scene, cam, st, 1))
        if method == "sah":
            img_sah = img
        else:
            img_mid = img
    np.testing.assert_allclose(img_sah, img_mid, atol=1e-5)
