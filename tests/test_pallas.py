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


@pytest.mark.slow
def test_pallas_matches_brute_cornell():
    scene = cornell.cornell_box().build()
    a = np.asarray(ht.render_frame(scene, CAM, ST.replace(
        intersector=Intersector.BRUTE), 1))
    b = np.asarray(ht.render_frame(scene, CAM, ST.replace(
        intersector=Intersector.PALLAS), 1))
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
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


@pytest.mark.slow
def test_chunked_world_bvh_matches_single():
    """Large-scene chunked packing must produce identical hits to the
    single resident chunk (and both match brute force)."""
    import jax.numpy as jnp
    from halogen_tpu.integrator.intersect import intersect_tris_brute
    from halogen_tpu.kernels.bvh_pallas import (
        ChunkedWorldBVH, pack_world_bvh, pack_world_bvh_auto,
        traverse_world_bvh_any)

    rng = np.random.default_rng(7)
    n = 4000
    v0 = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    tv = np.stack([v0, v0 + rng.normal(0, 0.3, (n, 3)),
                   v0 + rng.normal(0, 0.3, (n, 3))], 1).astype(np.float32)
    single = pack_world_bvh(tv)
    chunked = pack_world_bvh_auto(tv, chunk_tris=900, max_resident=1500)
    assert isinstance(chunked, ChunkedWorldBVH)
    assert len(chunked.chunks) == 5

    m = 1024
    o = rng.uniform(-6, 6, (m, 3)).astype(np.float32)
    d = rng.normal(size=(m, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    seed = jnp.full((m,), np.inf, jnp.float32)
    a = traverse_world_bvh_any(single, jnp.asarray(o), jnp.asarray(d), seed,
                               interpret=True)
    b = traverse_world_bvh_any(chunked, jnp.asarray(o), jnp.asarray(d), seed,
                               interpret=True)
    ta = np.asarray(a[0])
    np.testing.assert_array_equal(ta, np.asarray(b[0]))
    hit = np.isfinite(ta)
    for i in range(1, 5):  # tri, u, v, s agree wherever something was hit
        np.testing.assert_array_equal(np.asarray(a[i])[hit],
                                      np.asarray(b[i])[hit])
    bt, *_ = intersect_tris_brute(jnp.asarray(o), jnp.asarray(d),
                                  jnp.asarray(tv))
    np.testing.assert_allclose(np.where(hit, ta, np.inf), np.asarray(bt),
                               rtol=2e-5, atol=1e-6)


@pytest.mark.slow
def test_treelet_matches_bvh_dragons():
    """Per-ray treelet traversal kernel (kernels/treelet_bvh.py): full
    render parity with the lockstep BVH intersector on a multi-treelet
    scene (the incoherent-ray fast path)."""
    cam = ht.make_camera(position=(0, 1.5, 5.0), target=(0, -0.3, 0),
                         fov_deg=45)
    scene = dragons_hero_scene(2, tris=1280).build(
        envmap=Envmap.gradient_sky())
    assert scene.tbvh is not None and scene.tbvh.num_treelets > 1
    st = ST.replace(use_envmap=True)
    a = np.asarray(ht.render_frame(scene, cam, st.replace(
        intersector=Intersector.BVH), 1))
    b = np.asarray(ht.render_frame(scene, cam, st.replace(
        intersector=Intersector.TREELET), 1))
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_treelet_kernel_exact_vs_shared_stack():
    """Raw kernel contract: treelet traversal returns bit-identical
    (t, tri, u, v, sign) to the shared-stack kernel on random rays."""
    from halogen_tpu.kernels.bvh_pallas import (
        pack_world_bvh,
        traverse_world_bvh_any,
    )
    from halogen_tpu.kernels.treelet_bvh import (
        pack_treelet_bvh,
        traverse_treelets,
    )
    from halogen_tpu.scene.meshes import dragon_mesh
    import jax.numpy as jnp

    verts, faces = dragon_mesh(2)
    tv = verts[faces]
    tb = pack_treelet_bvh(tv)
    wb = pack_world_bvh(np.asarray(tv))
    rng = np.random.default_rng(0)
    n = 512
    o = rng.normal(size=(n, 3)).astype(np.float32) * 3.0
    tgt = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    d = tgt - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    seed = jnp.full((n,), 1e30, jnp.float32)
    r1 = traverse_world_bvh_any(wb, jnp.asarray(o), jnp.asarray(d), seed,
                                interpret=True)
    r2 = traverse_treelets(tb, jnp.asarray(o), jnp.asarray(d), seed,
                           interpret=True)
    t1, t2 = np.asarray(r1[0]), np.asarray(r2[0])
    np.testing.assert_array_equal(t1, t2, err_msg="t")
    hit = np.isfinite(t1)  # on miss the winner payload is unused
    assert hit.mean() > 0.5
    for a, b, name in zip(r1[1:5], r2[1:5], "tri u v s".split()):
        np.testing.assert_array_equal(np.asarray(a)[hit],
                                      np.asarray(b)[hit], err_msg=name)


def _flatlet_ray_set(n=512, seed=0, inf_seeds=False):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)).astype(np.float32) * 3.0
    tgt = rng.normal(size=(n, 3)).astype(np.float32) * 0.4
    d = tgt - o
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    if inf_seeds:
        # legal input for the traverse contract: no sphere hit, far=inf
        ts = np.full((n,), np.inf, np.float32)
        ts[::3] = 1e30
    else:
        ts = np.full((n,), 1e30, np.float32)
    return o, d, ts


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["near", "order", "plain"])
@pytest.mark.parametrize("inf_seeds", [False, True])
def test_flatlet_kernel_exact_vs_shared_stack(mode, inf_seeds):
    """Raw kernel contract: flatlet worklist traversal returns the same
    closest hit (t, tri, u, v, sign) as the shared-stack kernel, for all
    extraction modes, including rays with +inf best-t seeds (the
    termination edge case: ADVICE r3 #1) and pad lanes (n=512 pads the
    1024-ray block with 512 dead rays)."""
    from halogen_tpu.kernels.bvh_pallas import (
        pack_world_bvh,
        traverse_world_bvh_any,
    )
    from halogen_tpu.kernels.flatlet import pack_flatlets, traverse_flatlets
    from halogen_tpu.scene.meshes import dragon_mesh
    import jax.numpy as jnp

    verts, faces = dragon_mesh(2)
    tv = verts[faces]
    fb = pack_flatlets(np.asarray(tv))
    assert fb.num_flatlets > 4
    wb = pack_world_bvh(np.asarray(tv))
    o, d, ts = _flatlet_ray_set(inf_seeds=inf_seeds)
    seed = jnp.asarray(ts)
    r1 = traverse_world_bvh_any(wb, jnp.asarray(o), jnp.asarray(d), seed,
                                interpret=True)
    r2 = traverse_flatlets(fb, jnp.asarray(o), jnp.asarray(d), seed,
                           interpret=True, mode=mode)
    t1, t2 = np.asarray(r1[0]), np.asarray(r2[0])
    np.testing.assert_array_equal(t1, t2, err_msg="t")
    hit = np.isfinite(t1)
    assert hit.mean() > 0.5
    for a, b, name in zip((r1[1], r1[4]), (r2[1], r2[4]), ("tri", "s")):
        np.testing.assert_array_equal(np.asarray(a)[hit],
                                      np.asarray(b)[hit], err_msg=name)
    # u/v may differ by a few ULP on the CPU backend: XLA contracts the
    # mul+add chains into fma differently across the two lowerings.
    for a, b, name in zip(r1[2:4], r2[2:4], ("u", "v")):
        np.testing.assert_allclose(np.asarray(a)[hit],
                                   np.asarray(b)[hit],
                                   rtol=1e-5, atol=1e-6, err_msg=name)


@pytest.mark.slow
def test_flatlet_matches_bvh_dragons():
    """Full render parity: FLATLET intersector vs the lockstep BVH
    intersector on a multi-flatlet scene."""
    cam = ht.make_camera(position=(0, 1.5, 5.0), target=(0, -0.3, 0),
                         fov_deg=45)
    scene = dragons_hero_scene(2, tris=1280).build(
        envmap=Envmap.gradient_sky())
    assert scene.fbvh is not None and scene.fbvh.num_flatlets > 1
    st = ST.replace(use_envmap=True)
    a = np.asarray(ht.render_frame(scene, cam, st.replace(
        intersector=Intersector.BVH), 1))
    b = np.asarray(ht.render_frame(scene, cam, st.replace(
        intersector=Intersector.FLATLET), 1))
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
@pytest.mark.parametrize("granule", [8, 32, 128])
@pytest.mark.parametrize("inf_seeds", [False, True])
def test_raylet_kernel_exact_vs_shared_stack(granule, inf_seeds):
    """Raw kernel contract: raylet per-ray worklist traversal returns
    the same closest hit (t, tri, u, v, sign) as the shared-stack
    kernel, for several granule widths, including rays with +inf
    best-t seeds (worklist-exhaustion termination) and pad lanes
    (n=512 pads the 1024-ray block with 512 dead rays). Also exercises
    the one-hot MXU gather's bit-exactness contract (interpret mode
    here; the on-chip row is parity_raylet_traversal in
    perf/tpu_evidence.jsonl)."""
    from halogen_tpu.kernels.bvh_pallas import (
        pack_world_bvh,
        traverse_world_bvh_any,
    )
    from halogen_tpu.kernels.raylet import pack_raylets, traverse_raylets
    from halogen_tpu.scene.meshes import dragon_mesh
    import jax.numpy as jnp

    verts, faces = dragon_mesh(2)
    tv = verts[faces]
    rb = pack_raylets(np.asarray(tv))
    assert rb.num_flatlets >= 128
    wb = pack_world_bvh(np.asarray(tv))
    o, d, ts = _flatlet_ray_set(inf_seeds=inf_seeds)
    seed = jnp.asarray(ts)
    r1 = traverse_world_bvh_any(wb, jnp.asarray(o), jnp.asarray(d), seed,
                                interpret=True)
    r2 = traverse_raylets(rb, jnp.asarray(o), jnp.asarray(d), seed,
                          interpret=True, rays_per_granule=granule)
    t1, t2 = np.asarray(r1[0]), np.asarray(r2[0])
    np.testing.assert_array_equal(t1, t2, err_msg="t")
    hit = np.isfinite(t1)
    assert hit.mean() > 0.5
    for a, b, name in zip((r1[1], r1[4]), (r2[1], r2[4]), ("tri", "s")):
        np.testing.assert_array_equal(np.asarray(a)[hit],
                                      np.asarray(b)[hit], err_msg=name)
    for a, b, name in zip(r1[2:4], r2[2:4], ("u", "v")):
        np.testing.assert_allclose(np.asarray(a)[hit],
                                   np.asarray(b)[hit],
                                   rtol=1e-5, atol=1e-6, err_msg=name)


@pytest.mark.slow
def test_raylet_multi_group_exact():
    """Raylet parity on a scene whose flatlet table spans multiple
    128-lane groups (F > 128): the per-ray extraction, one-hot matmul
    K dimension, and padded-group degenerate tiles all cross the group
    boundary."""
    from halogen_tpu.kernels.bvh_pallas import (
        pack_world_bvh,
        traverse_world_bvh_any,
    )
    from halogen_tpu.kernels.raylet import pack_raylets, traverse_raylets
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    T = 30000
    centers = rng.uniform(-2, 2, (T, 1, 3))
    tv = (centers + rng.normal(0, 0.1, (T, 3, 3))).astype(np.float32)
    rb = pack_raylets(tv)
    assert rb.num_flatlets > 128  # multi-group
    wb = pack_world_bvh(tv.copy())
    o, d, ts = _flatlet_ray_set(n=1024, seed=3)
    o *= 2.0
    seed = jnp.asarray(ts)
    r1 = traverse_world_bvh_any(wb, jnp.asarray(o), jnp.asarray(d), seed,
                                interpret=True)
    r2 = traverse_raylets(rb, jnp.asarray(o), jnp.asarray(d), seed,
                          interpret=True)
    t1, t2 = np.asarray(r1[0]), np.asarray(r2[0])
    np.testing.assert_array_equal(t1, t2, err_msg="t")
    hit = np.isfinite(t1)
    assert hit.mean() > 0.3
    np.testing.assert_array_equal(np.asarray(r1[1])[hit],
                                  np.asarray(r2[1])[hit], err_msg="tri")


@pytest.mark.slow
def test_raylet_matches_bvh_dragons():
    """Full render parity: RAYLET intersector vs the lockstep BVH
    intersector on a multi-flatlet scene."""
    cam = ht.make_camera(position=(0, 1.5, 5.0), target=(0, -0.3, 0),
                         fov_deg=45)
    scene = dragons_hero_scene(2, tris=1280).build(
        envmap=Envmap.gradient_sky())
    assert scene.rbvh is not None and scene.rbvh.num_flatlets >= 128
    st = ST.replace(use_envmap=True)
    a = np.asarray(ht.render_frame(scene, cam, st.replace(
        intersector=Intersector.BVH), 1))
    b = np.asarray(ht.render_frame(scene, cam, st.replace(
        intersector=Intersector.RAYLET), 1))
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-3)
