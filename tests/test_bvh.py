"""BVH builder invariants (SURVEY.md §4a): every triangle in exactly one
leaf, child AABBs within parents, contiguous children, bounded leaves; and
traversal equivalence against brute force."""

import pytest
import numpy as np
import jax.numpy as jnp

from halogen_tpu.accel.bvh import build_bvh, validate_bvh
from halogen_tpu.config import Intersector, RenderSettings
from halogen_tpu.integrator.intersect import intersect_brute, intersect_bvh
from halogen_tpu.scene.scene import Scene
from halogen_tpu.scene.material import Material


def _random_mesh(n_tris=200, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-5, 5, size=(n_tris, 1, 3))
    offsets = rng.normal(0, 0.3, size=(n_tris, 3, 3))
    return (centers + offsets).astype(np.float32)


def test_invariants_random_mesh():
    tris = _random_mesh(500)
    bvh = build_bvh(tris.copy())
    assert validate_bvh(bvh, tris[bvh.tri_order]) == []
    # bounded leaves
    leaf_counts = bvh.count[bvh.count > 0]
    assert leaf_counts.max() <= 5
    assert bvh.num_nodes > 1


def test_single_triangle():
    tris = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    bvh = build_bvh(tris.copy())
    assert bvh.num_nodes == 1
    assert bvh.count[0] == 1


def test_degenerate_colocated_centroids():
    # All centroids identical: midpoint split fails; median fallback must
    # still terminate with bounded leaves (the reference keeps oversized
    # leaves here — deliberate deviation, SURVEY.md §2 #7).
    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    tris = np.repeat(tri, 64, axis=0)
    bvh = build_bvh(tris.copy())
    assert validate_bvh(bvh, tris[bvh.tri_order]) == []
    assert bvh.count[bvh.count > 0].max() <= 5


def test_thin_mesh_aabb_epsilon():
    # A perfectly flat (z=0) mesh must still get nonzero-thickness AABBs
    tris = _random_mesh(50)
    tris[..., 2] = 0.0
    bvh = build_bvh(tris.copy())
    assert np.all(bvh.hi[:, 2] > bvh.lo[:, 2])


def _two_backend_scene(n_tris=300):
    s = Scene()
    tris = _random_mesh(n_tris, seed=3)
    verts = tris.reshape(-1, 3)
    idx = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
    s.add_mesh(verts, idx, Material.diffuse((0.8, 0.2, 0.2)))
    s.add_sphere((0, 0, 8.0), 1.0, Material.diffuse((0.2, 0.8, 0.2)))
    return s.build()


@pytest.mark.slow
def test_bvh_matches_brute_force():
    scene = _two_backend_scene()
    rng = np.random.default_rng(1)
    n = 256
    origins = jnp.asarray(rng.uniform(-8, 8, (n, 3)).astype(np.float32))
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = jnp.asarray(dirs)
    far = jnp.full((n,), 1000.0, jnp.float32)

    hit_a, *_ = intersect_brute(scene, origins, dirs, far)
    hit_b, *_ = intersect_bvh(scene, origins, dirs, far)

    np.testing.assert_allclose(
        np.asarray(hit_a.t), np.asarray(hit_b.t), rtol=2e-4, atol=2e-4
    )
    both_hit = np.isfinite(np.asarray(hit_a.t))
    np.testing.assert_array_equal(
        np.asarray(hit_a.material)[both_hit], np.asarray(hit_b.material)[both_hit]
    )
    # normals agree where both hit
    na = np.asarray(hit_a.normal)[both_hit]
    nb = np.asarray(hit_b.normal)[both_hit]
    np.testing.assert_allclose(na, nb, atol=2e-3)


@pytest.mark.slow
def test_bvh_with_transformed_mesh():
    s = Scene()
    tris = _random_mesh(100, seed=5)
    verts = tris.reshape(-1, 3)
    idx = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = np.diag([2.0, 0.5, 1.0])  # non-uniform scale
    t[:3, 3] = [1.0, -2.0, 3.0]
    s.add_mesh(verts, idx, Material.diffuse((0.5, 0.5, 0.9)), transform=t)
    scene = s.build()

    rng = np.random.default_rng(2)
    n = 128
    origins = jnp.asarray(rng.uniform(-10, 10, (n, 3)).astype(np.float32))
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dirs = jnp.asarray(dirs)
    far = jnp.full((n,), 1000.0, jnp.float32)

    hit_a, *_ = intersect_brute(scene, origins, dirs, far)
    hit_b, *_ = intersect_bvh(scene, origins, dirs, far)
    np.testing.assert_allclose(
        np.asarray(hit_a.t), np.asarray(hit_b.t), rtol=5e-4, atol=5e-4
    )
    both = np.isfinite(np.asarray(hit_a.t))
    np.testing.assert_allclose(
        np.asarray(hit_a.normal)[both], np.asarray(hit_b.normal)[both], atol=5e-3
    )
