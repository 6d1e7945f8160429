"""Pallas TPU kernel: flat-treelet ("flatlet") worklist traversal.

Third device-native traversal tier, designed from the measured failure
modes of the first two (perf/tpu_evidence.jsonl):

- the shared-stack kernel (`bvh_pallas.py`) block-descends the full BVH
  and degenerates on incoherent bounce rays (~2,000 box tests/ray on
  glass_dragon bounces, ~1.35x brute force);
- the skip-link treelet kernel (`treelet_bvh.py`) walks per-ray but
  serializes on a monotone treelet schedule and pays ~18 dynamic
  gathers per iteration (0.44 Mrays/s on glass_dragon);
- XLA-side ray binning (sort/scatter regrouping per bounce) is out:
  measured XLA:TPU sort/scatter/random-gather throughput on this chip
  is 0.1-1 Gelem/s, far below the ~100M irregular moves/bounce a
  binned design needs (scripts/xla_micro.py);
- and, measured while building THIS kernel: (a) each dynamic
  control-flow boundary (lax.cond / loop iteration) costs hundreds of
  cycles of scalar-vector sync — a per-box branch is ~20x its 14-op
  slab test; (b) box culling against the *seed* t instead of the
  evolving best-t inflates block unions ~12x on primary rays — per-ray
  best-t pruning is load-bearing; (c) non-128-aligned lane slices of
  vregs miscompile silently (parity 0.5 on chip, clean in interpret) —
  only scalar extraction (`w[0, k]`, the `bvh_pallas.py` idiom) and
  free dynamic *sublane* slices are trustworthy relayouts.

Design v4 — every building block is an idiom already proven on chip:

1. The BVH is cut into T **flatlets** of <= `leaf_tris` (<=128)
   triangles; a flat list at trace time. Triangles are packed one
   flatlet per tile [T, 10, 128]: lane = triangle slot, rows v0.xyz |
   e1.xyz | e2.xyz | global-tri-id.
2. Per 1024-ray block and box group, a **dense box pass** (slab test,
   reference compute:244-259) runs 128 static octet iterations (the
   8 rays of lane column c arrive as a free dynamic-sublane slice of a
   pre-transposed (1024, 1) copy) against 128 sublane-broadcast boxes,
   accumulating each box's minimal masked entry distance. Exactly N*T
   box tests, zero branches, zero scalar extracts.
3. An **extraction loop** pops candidates nearest-first (min over the
   entry tile), stops when the nearest remaining entry exceeds every
   ray's best-t, and **rechecks** each candidate against the evolving
   best-t with one whole-tile slab test (6 scalars via the lane-roll +
   scalar-extract idiom) — recovering the per-ray pruning a real
   traversal gets, at one branch per candidate.
4. Survivors run the **dense triangle pass** (Moller-Trumbore,
   compute:307-355): all 1024 rays against the tile, 8 triangles per
   lane-rolled chunk with static scalar extraction (the bvh_pallas
   leaf idiom).

Rays arrive Morton/octant-sorted from `intersect.py` (same coherence
key as the other kernels) so block unions stay near per-ray candidate
counts. Same contract as `bvh_pallas.traverse_world_bvh_any`.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_SUB = 8
RAY_LANE = 128
BLOCK_RAYS = RAY_SUB * RAY_LANE  # 1024
BOX_LANE = 128  # flatlets per box group (one vreg of lanes)
TRI_CHUNK = 8  # triangles per rolled chunk in the dense tri pass
# VMEM cap: tri tiles cost 10*128*4 B = 5 KB per flatlet; ~75% fill at
# the 128 cut puts 400k tris near 21 MB — well inside the 100 MB scoped
# budget. Bigger scenes fall back to the chunked shared-stack kernel.
FLATLET_MAX_TRIS = 400_000
DET_EPS = np.float32(1e-8)
INF = np.float32(np.inf)
BIG = np.float32(3e38)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlatletBVH:
    """Host-packed flatlet tables (device arrays).

    boxes: [G, 6, RAY_SUB, BOX_LANE] f32 — flatlet j at lane j%128 of
        group j//128, rows lo.xyz | hi.xyz, sublanes broadcast. Padded
        lanes carry degenerate point boxes at 1e30: never hit (and
        never overflow the slab products — see pack_flatlets note).
    tris: [G*128, 10, RAY_LANE] f32 — one flatlet per tile, triangle k
        at lane k; rows 0-2 v0 | 3-5 e1 | 6-8 e2 | 9 global tri id.
        Padded lanes/tiles are degenerate (det 0 -> never hit); the
        table spans the full group range so any extracted lane indexes
        in bounds.
    """

    boxes: jnp.ndarray
    tris: jnp.ndarray
    leaf_tris: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_flatlets(self) -> int:
        return self.tris.shape[0]

    @property
    def num_groups(self) -> int:
        return self.boxes.shape[0]


def _subtree_ranges(bvh):
    """Per-node (first_tri, tri_count) over the builder's reordered
    triangle array — contiguous because accel/bvh.py partitions the
    index list in place (same invariant the reference's builder keeps,
    BVHGenerator.cs:68-82)."""
    B = bvh.num_nodes
    first = np.zeros(B, np.int64)
    count = np.zeros(B, np.int64)
    stack = [(0, False)]
    while stack:
        o, visited = stack.pop()
        if visited:
            a = bvh.index_a[o]
            first[o] = min(first[a], first[a + 1])
            count[o] = count[a] + count[a + 1]
            continue
        if bvh.count[o] > 0:
            first[o] = bvh.index_a[o]
            count[o] = bvh.count[o]
            continue
        stack.append((o, True))
        a = bvh.index_a[o]
        stack.append((a, False))
        stack.append((a + 1, False))
    return first, count


def _cut_flatlets(bvh, first, count, max_tris: int):
    """Greedy top-down cut: emit every highest subtree with <= max_tris
    triangles. Returns [(first, count, lo, hi)] sorted by tri range."""
    cuts = []
    stack = [0]
    while stack:
        o = stack.pop()
        if count[o] <= max_tris or bvh.count[o] > 0:
            cuts.append((int(first[o]), int(count[o]),
                         bvh.lo[o].copy(), bvh.hi[o].copy()))
            continue
        a = bvh.index_a[o]
        stack.append(a + 1)
        stack.append(a)
    cuts.sort(key=lambda c: c[0])
    return cuts


def pack_flatlets(tri_verts_world: np.ndarray, leaf_tris: int = 128,
                  max_leaf: int = 5, max_depth: int = 32,
                  tri_ids: np.ndarray | None = None) -> FlatletBVH:
    """Build + pack the flatlet tables (host side, numpy)."""
    from halogen_tpu.accel.bvh import build_bvh

    tv = np.asarray(tri_verts_world, np.float32)
    L = min(leaf_tris, RAY_LANE)
    # The dense tri pass runs L // TRI_CHUNK chunks; a non-multiple
    # would silently skip the tail triangles of every flatlet.
    L = -(-L // TRI_CHUNK) * TRI_CHUNK
    bvh = build_bvh(tv.copy(), max_leaf=max_leaf, max_depth=max_depth)
    order = bvh.tri_order
    gids = (np.asarray(tri_ids, np.int64)[order]
            if tri_ids is not None else order.astype(np.int64))
    tv = tv[order]

    first, count = _subtree_ranges(bvh)
    cuts = _cut_flatlets(bvh, first, count, L)
    T = len(cuts)
    G = -(-T // BOX_LANE)

    # Padded box lanes: a degenerate point box at huge distance. An
    # inverted lo=+BIG/hi=-BIG box would *pass* the slab test with
    # entry 0 (the +-3e38 * inv_d products overflow to -+inf on every
    # axis), poisoning the worklist with out-of-range flatlet ids —
    # measured on chip as ~41% phantom hits from OOB tri-tile reads.
    boxes = np.full((G, 6, BOX_LANE), 1e30, np.float32)
    # Tri tiles padded to the full group span so even a (clamped or
    # not) pad-lane index stays in bounds; pad tiles are degenerate.
    tris = np.zeros((G * BOX_LANE, 10, RAY_LANE), np.float32)
    for j, (f, c, lo, hi) in enumerate(cuts):
        g, lane = divmod(j, BOX_LANE)
        boxes[g, 0:3, lane] = lo
        boxes[g, 3:6, lane] = hi
        sl = slice(f, f + c)
        v0 = tv[sl, 0]
        tris[j, 0:3, :c] = v0.T
        tris[j, 3:6, :c] = (tv[sl, 1] - v0).T
        tris[j, 6:9, :c] = (tv[sl, 2] - v0).T
        tris[j, 9, :c] = gids[sl].astype(np.float32)
    boxes_b = np.broadcast_to(boxes[:, :, None, :],
                              (G, 6, RAY_SUB, BOX_LANE)).copy()
    return FlatletBVH(jnp.asarray(boxes_b), jnp.asarray(tris), L)


def _flatlet_kernel(G: int, L: int, mode: str = "near"):
    # mode: chip-bisect knob.
    #   "near"  — nearest-first extraction + recheck + early stop
    #   "order" — lane-order extraction + recheck, no early stop
    #   "plain" — lane-order extraction, no recheck, no early stop

    def kernel(boxes_ref, tris_ref, o_ref, d_ref, seed_ref,
               oT_ref, iT_ref, sT_ref,
               t_ref, tri_ref, u_ref, v_ref, s_ref, tt_ref, bt_ref):
        # lane-major ray tiles (tri pass + recheck)
        ox, oy, oz = o_ref[0, 0, 0], o_ref[0, 0, 1], o_ref[0, 0, 2]
        dx, dy, dz = d_ref[0, 0, 0], d_ref[0, 0, 1], d_ref[0, 0, 2]
        seed = seed_ref[0, 0]

        def safe_inv(x):
            tiny = jnp.float32(1e-30)
            return 1.0 / jnp.where(jnp.abs(x) < tiny, tiny, x)

        ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
        lane_iota = jax.lax.broadcasted_iota(
            jnp.int32, (RAY_SUB, RAY_LANE), 1)

        def tri_pass(jt, best):
            """All rays vs flatlet jt's tile, statically unrolled
            TRI_CHUNK at a time (bvh_pallas leaf idiom: lane-roll the
            tile, extract scalars, full-tile Moller-Trumbore)."""
            best_t, btri, bu, bv, bs, tt = best
            tile = tris_ref[jt]  # [10, 128]
            for ci in range(L // TRI_CHUNK):
                w = (pltpu.roll(tile, RAY_LANE - ci * TRI_CHUNK, axis=1)
                     if ci else tile)
                for k in range(TRI_CHUNK):
                    v0x, v0y, v0z = w[0, k], w[1, k], w[2, k]
                    e1x, e1y, e1z = w[3, k], w[4, k], w[5, k]
                    e2x, e2y, e2z = w[6, k], w[7, k], w[8, k]
                    gid = w[9, k]
                    px = dy * e2z - dz * e2y
                    py = dz * e2x - dx * e2z
                    pz = dx * e2y - dy * e2x
                    det = px * e1x + py * e1y + pz * e1z
                    parallel = jnp.abs(det) < DET_EPS
                    inv_det = 1.0 / jnp.where(parallel, 1.0, det)
                    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
                    u = (tvx * px + tvy * py + tvz * pz) * inv_det
                    qx = tvy * e1z - tvz * e1y
                    qy = tvz * e1x - tvx * e1z
                    qz = tvx * e1y - tvy * e1x
                    v = (dx * qx + dy * qy + dz * qz) * inv_det
                    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    valid = (
                        (~parallel) & (u >= 0.0) & (u <= 1.0)
                        & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
                        & (t < best_t)
                    )
                    sgn = jnp.where(det >= 0.0, 1.0, -1.0)
                    best_t = jnp.where(valid, t, best_t)
                    btri = jnp.where(valid, gid, btri)
                    bu = jnp.where(valid, u, bu)
                    bv = jnp.where(valid, v, bv)
                    bs = jnp.where(valid, sgn, bs)
            return (best_t, btri, bu, bv, bs, tt + L)

        def group(g, carry):
            best_t, btri, bu, bv, bs, tt, bt = carry
            blo_x = boxes_ref[g, 0]
            blo_y = boxes_ref[g, 1]
            blo_z = boxes_ref[g, 2]
            bhi_x = boxes_ref[g, 3]
            bhi_y = boxes_ref[g, 4]
            bhi_z = boxes_ref[g, 5]

            # dense box pass: 128 static octet iterations, no branches;
            # per-box minimal masked entry distance accumulates in emin
            emin = jnp.where(lane_iota < 0, 0.0, BIG)
            for c in range(RAY_LANE):
                def colv(ref, comp):
                    # (1024,1) transposed copies: rows 8c..8c+8 hold
                    # the 8 rays of lane column c; dynamic sublane
                    # slices are free (bvh_pallas layout note)
                    return ref[0, 0, comp, pl.ds(c * RAY_SUB, RAY_SUB)]

                cox, coy, coz = (colv(oT_ref, 0), colv(oT_ref, 1),
                                 colv(oT_ref, 2))
                cix, ciy, ciz = (colv(iT_ref, 0), colv(iT_ref, 1),
                                 colv(iT_ref, 2))
                cseed = sT_ref[0, 0, pl.ds(c * RAY_SUB, RAY_SUB)]
                t1x, t2x = (blo_x - cox) * cix, (bhi_x - cox) * cix
                t1y, t2y = (blo_y - coy) * ciy, (bhi_y - coy) * ciy
                t1z, t2z = (blo_z - coz) * ciz, (bhi_z - coz) * ciz
                tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                               jnp.minimum(t1y, t2y)),
                                   jnp.minimum(t1z, t2z))
                tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                               jnp.maximum(t1y, t2y)),
                                   jnp.maximum(t1z, t2z))
                ent = jnp.maximum(tmin, 0.0)
                hit = (tmax > jnp.maximum(0.0, tmin)) & (ent < cseed)
                emin = jnp.minimum(emin, jnp.where(hit, ent, BIG))

            # nearest-first extraction with live recheck + early stop
            def w_cond(c):
                emin, best = c
                if mode == "near":
                    # stop once the nearest remaining entry cannot beat
                    # any ray's best-t (pad rays best_t=-1: no effect).
                    # The `< BIG` guard keeps the loop finite when a
                    # ray's best-t is +inf (no sphere hit, far=inf):
                    # without it an exhausted worklist (emin all BIG)
                    # still satisfies BIG < inf and re-pops forever.
                    return (jnp.min(emin) < BIG) & (
                        jnp.min(emin) < jnp.max(best[0]))
                return jnp.min(
                    jnp.where(emin < BIG, lane_iota, 9999)) < 9999

            def w_body(c):
                emin, best = c
                if mode == "near":
                    m = jnp.min(emin)
                    j_rel = jnp.min(
                        jnp.where(emin <= m, lane_iota, 9999))
                else:
                    j_rel = jnp.min(
                        jnp.where(emin < BIG, lane_iota, 9999))
                # recheck vs evolving best-t: whole-tile slab, box
                # scalars via the 2D lane-roll + scalar-extract idiom
                def bx(f):
                    return pltpu.roll(boxes_ref[g, f, 0:1, :],
                                      -j_rel, axis=1)[0, 0]

                lo_x, lo_y, lo_z = bx(0), bx(1), bx(2)
                hi_x, hi_y, hi_z = bx(3), bx(4), bx(5)
                t1x, t2x = (lo_x - ox) * ix, (hi_x - ox) * ix
                t1y, t2y = (lo_y - oy) * iy, (hi_y - oy) * iy
                t1z, t2z = (lo_z - oz) * iz, (hi_z - oz) * iz
                tmin = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1x, t2x),
                                jnp.minimum(t1y, t2y)),
                    jnp.minimum(t1z, t2z))
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1x, t2x),
                                jnp.maximum(t1y, t2y)),
                    jnp.maximum(t1z, t2z))
                live = ((tmax > jnp.maximum(0.0, tmin))
                        & (jnp.maximum(tmin, 0.0) < best[0]))
                if mode == "plain":
                    # no recheck branch: extraction already yields only
                    # hit flatlets, run the tri pass unconditionally
                    best = tri_pass(g * BOX_LANE + j_rel, best)
                else:
                    best = jax.lax.cond(
                        jnp.any(live),
                        lambda b: tri_pass(g * BOX_LANE + j_rel, b),
                        lambda b: b, best)
                emin = jnp.where(lane_iota == j_rel, BIG, emin)
                return (emin, best)

            emin, (best_t, btri, bu, bv, bs, tt) = jax.lax.while_loop(
                w_cond, w_body,
                (emin, (best_t, btri, bu, bv, bs, tt)))
            return (best_t, btri, bu, bv, bs, tt, bt + BOX_LANE)

        init = (
            seed,  # best_t seeded with min(far, sphere_t - eps)
            jnp.full(seed.shape, -1.0, jnp.float32),  # winner tri id
            jnp.zeros(seed.shape, jnp.float32),  # u
            jnp.zeros(seed.shape, jnp.float32),  # v
            jnp.ones(seed.shape, jnp.float32),  # sign
            jnp.int32(0),  # tri tests (block-uniform)
            jnp.int32(0),  # box tests (block-uniform)
        )
        best_t, btri, bu, bv, bs, tt, bt = jax.lax.cond(
            jnp.any(seed > 0.0),
            lambda c: jax.lax.fori_loop(0, G, group, c),
            lambda c: c, init)

        miss = btri < 0.0
        zi = (ox * 0.0).astype(jnp.int32)
        t_ref[0, 0] = jnp.where(miss, INF, best_t)
        tri_ref[0, 0] = btri.astype(jnp.int32)
        u_ref[0, 0] = bu
        v_ref[0, 0] = bv
        s_ref[0, 0] = bs
        tt_ref[0, 0] = zi + tt
        bt_ref[0, 0] = zi + bt

    return kernel


def traverse_flatlets(
    fbvh: FlatletBVH,
    origin: jnp.ndarray,  # [N, 3]
    direction: jnp.ndarray,  # [N, 3]
    t_seed: jnp.ndarray,  # [N] best-t seed (min(far, sphere hit))
    interpret: bool = False,
    mode: str = "near",
):
    """Closest hit for N rays; returns (t [N] (+inf miss), tri [N] i32
    GLOBAL triangle ids, u, v, sign, tri_tests, box_tests) — drop-in
    for `bvh_pallas.traverse_world_bvh_any`."""
    n = origin.shape[0]
    nb = -(-n // BLOCK_RAYS)
    pad = nb * BLOCK_RAYS - n

    def padded(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
        ) if pad else x

    def lane_major(x):
        if x.ndim == 2:
            return x.T.reshape(3, nb, RAY_SUB, RAY_LANE).transpose(
                1, 0, 2, 3).reshape(nb, 1, 3, RAY_SUB, RAY_LANE)
        return x.reshape(nb, 1, RAY_SUB, RAY_LANE)

    def col_major(x):
        # transposed copies: row lane*8+sublane, one element wide
        if x.ndim == 2:
            t = x.T.reshape(3, nb, RAY_SUB, RAY_LANE).transpose(
                0, 1, 3, 2)  # [3, nb, 128, 8]
            return t.reshape(3, nb, BLOCK_RAYS, 1).transpose(
                1, 0, 2, 3).reshape(nb, 1, 3, BLOCK_RAYS, 1)
        t = x.reshape(nb, RAY_SUB, RAY_LANE).transpose(0, 2, 1)
        return t.reshape(nb, 1, BLOCK_RAYS, 1)

    o_p = padded(origin, 0.0)
    d_p = padded(direction, 1.0)
    s_p = padded(t_seed, -1.0)  # pad rays: best_t<0 -> nothing hits
    tiny = jnp.float32(1e-30)
    inv_p = 1.0 / jnp.where(jnp.abs(d_p) < tiny, tiny, d_p)

    o = lane_major(o_p)
    d = lane_major(d_p)
    seed = lane_major(s_p)
    oT = col_major(o_p)
    iT = col_major(inv_p)
    sT = col_major(s_p)

    f32, i32 = jnp.float32, jnp.int32
    out_shape = [
        jax.ShapeDtypeStruct((nb, 1, RAY_SUB, RAY_LANE), dt)
        for dt in (f32, i32, f32, f32, f32, i32, i32)
    ]
    ray_spec = pl.BlockSpec((1, 1, 3, RAY_SUB, RAY_LANE),
                            lambda i: (i, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    rayT_spec = pl.BlockSpec((1, 1, 3, BLOCK_RAYS, 1),
                             lambda i: (i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec((1, 1, RAY_SUB, RAY_LANE),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    flatT_spec = pl.BlockSpec((1, 1, BLOCK_RAYS, 1),
                              lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _flatlet_kernel(fbvh.num_groups, fbvh.leaf_tris, mode),
        grid=(nb,),
        in_specs=[full(), full(), ray_spec, ray_spec, flat_spec,
                  rayT_spec, rayT_spec, flatT_spec],
        out_specs=[flat_spec] * 7,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fbvh.boxes, fbvh.tris, o, d, seed, oT, iT, sT)

    def unshape(x):
        return x.reshape(-1)[:n]

    return tuple(unshape(x) for x in outs)
