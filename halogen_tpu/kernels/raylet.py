"""Pallas TPU kernel: per-ray worklist traversal over flatlet tables
("raylet") — the fourth-generation big-scene intersector.

Why another tier (measured, scripts/traversal_diag.py on glass_dragon):
per-ray best-t-pruned flatlet candidates average **2.5** (p90 5), but
any granule that SHARES a worklist pays the union of its rays'
candidate sets — 26-100 of ~108 flatlets for 128-ray rows and ~all of
them for the round-3 kernels' 1024-ray blocks. The round-1..3 kernels
(shared-stack, treelet, flatlet) are all union-bound: 0.33-0.44
Mrays/s on the dragon ladder configs vs 209 on Cornell.

This kernel gives every ray its OWN nearest-first worklist and keeps
the machine dense anyway:

1. **Dense box pass** per R-ray granule: all R rays x all F flatlet
   boxes in one (R, F) slab test (rays on sublanes, boxes on lanes),
   producing per-ray entry distances `emin` (reference slab test,
   HalgoenCompute.compute:244-259).
2. **Round loop**: each ray pops the argmin lane of its own emin row
   (one lane-reduction — no scalar extraction, no dynamic indexing)
   and is done when its nearest remaining entry can't beat its own
   best-t (a hit inside a box is never closer than the box entry).
3. **One-hot MXU gather**: the R popped flatlets' triangle tiles are
   fetched in one matmul `onehot[R, F] @ tris_flat[F, 1280]` at
   `Precision.HIGHEST` — measured bit-exact on TPU v5e (bf16x6
   multi-pass covers the full f32 mantissa) and ~100 cycles, vs ~20x
   that for per-sublane dynamic assembly.
4. **Dense Möller-Trumbore** (compute:307-355) on the composite: R
   rays (sublanes) x 128 triangles (lanes) per vector op, with
   per-lane running best so the winner reduction happens once per
   granule, not once per round.

Measured round cost (scripts + /tmp micro, TPU v5e): ~530 cycles at
R=32 — ~17 cycles per (ray, flatlet) candidate, independent of block
union. Host tables are the flatlet packing (`flatlet.pack_flatlets`,
SAH cut via the native builder) plus a [F, 1280] row-major flattening
of the triangle tiles for the matmul RHS.

Same contract as `flatlet.traverse_flatlets` / `bvh_pallas.
traverse_world_bvh_any`: closest hit, global triangle ids, t=+inf on
miss, pad rays seeded with best_t<0 hit nothing, +inf seeds terminate
(cond requires a live candidate lane, not just emin < best_t).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from halogen_tpu.kernels.flatlet import FlatletBVH, pack_flatlets

RAY_SUB = 8
RAY_LANE = 128
BLOCK_RAYS = RAY_SUB * RAY_LANE  # rays per grid block
GRANULE = 32  # rays per worklist granule (R); static kernel param
FUSED_TILE = 128  # tris per tile in the fused-tier cut (on-chip A/B glass_dragon: 128->6.55, 64->6.37, 32->5.96 Mrays/s - box-pass cost at higher F beats the MT-slot savings)
# The one-hot matmul needs the whole [F, 1280] triangle table resident
# in VMEM: G groups of 128 flatlets cost G * 0.66 MB (plus emin rows at
# (R, G*128)). Cap well inside the 100 MB scoped budget with room for
# double buffering; bigger scenes fall back to the chunked shared-stack
# kernel exactly like the flatlet tier.
RAYLET_MAX_TRIS = 200_000
DET_EPS = np.float32(1e-8)
INF = np.float32(np.inf)
BIG = np.float32(3e38)
IBIG = np.int32(2**30)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RayletBVH:
    """Device tables for the raylet kernel.

    boxes: [6, 1, F] f32 — flatlet f's lo.xyz | hi.xyz at lane f
        (row-major groups of 128). Padded lanes are degenerate point
        boxes at 1e30: never hit, never overflow the slab products.
    tris_flat: [F, 1280] f32 — row f = flatlet f's triangle tile,
        columns [v0x*128 | v0y | v0z | e1x | e1y | e1z | e2x | e2y |
        e2z | gid]; triangle slot k at column j*128+k. Padded rows and
        slots are degenerate (det 0 -> never hit).
    leaf_tris: static tile width (always 128 here).
    """

    boxes: jnp.ndarray
    tris_flat: jnp.ndarray
    # Transposed tables for the fused megakernel's in-kernel row-granule
    # traversal tier (kernels/megakernel._make_raylet_traversal), or None:
    # boxesT [6, F, 1] (boxes on sublanes); gtab [3*1152, F] bf16 and
    # stab [3*1280, F] bf16 are the geometry / shading payload tables
    # PRE-SPLIT into three bf16 planes (hi rows, then mid, then lo) so
    # the kernel's one-hot gathers run as three single-pass bf16 MXU
    # matmuls instead of one f32 Precision.HIGHEST matmul — measured
    # ~680x faster per round on v5e and bit-exact for normal-range f32
    # (the one-hot RHS is exact in bf16; hi/mid/lo cover disjoint
    # mantissa windows and recombine exactly in the f32 accumulator).
    # gtab rows within a plane: j*128+k = geometry field j (v0|e1|e2)
    # of slot k; stab fields are n0.xyz | n1-n0 | n2-n0 | material id.
    boxesT: jnp.ndarray | None = None
    gtab: jnp.ndarray | None = None
    stab: jnp.ndarray | None = None
    leaf_tris: int = dataclasses.field(
        default=RAY_LANE, metadata=dict(static=True))
    fused_tile: int = dataclasses.field(
        default=RAY_LANE, metadata=dict(static=True))

    @property
    def num_flatlets(self) -> int:
        return self.tris_flat.shape[0]

    @property
    def num_fused_flatlets(self) -> int:
        return self.gtab.shape[1]


def pack_raylets(tri_verts_world: np.ndarray, max_leaf: int = 5,
                 max_depth: int = 32,
                 tri_ids: np.ndarray | None = None,
                 fbvh: FlatletBVH | None = None,
                 tri_normals_world: np.ndarray | None = None,
                 tri_materials: np.ndarray | None = None,
                 fused_tile: int = FUSED_TILE) -> RayletBVH:
    """Build the raylet tables (host side). Reuses the flatlet packing
    (greedy top-down SAH-subtree cut at <=128 tris) and re-lays it out
    for the one-hot matmul. When `tri_normals_world`/`tri_materials`
    are given, also packs the transposed fused-tier tables (boxesT,
    gtab, stab) consumed by the megakernel's in-kernel traversal, cut
    at `fused_tile` triangles per tile: narrower tiles mean fewer
    wasted Möller-Trumbore slots per pop (the tile loop is the fused
    round's dominant VPU cost) at the price of more flatlet boxes in
    the dense per-row box pass."""
    if fbvh is None:
        fbvh = pack_flatlets(tri_verts_world, leaf_tris=RAY_LANE,
                             max_leaf=max_leaf, max_depth=max_depth,
                             tri_ids=tri_ids)
    assert fbvh.leaf_tris == RAY_LANE
    # fbvh.boxes: [G, 6, 8, 128] sublane-broadcast -> [6, 1, G*128]
    b = np.asarray(fbvh.boxes)[:, :, 0, :]  # [G, 6, 128]
    boxes = b.transpose(1, 0, 2).reshape(6, 1, -1)
    # fbvh.tris: [F, 10, 128] -> [F, 1280] row-major (component-major
    # columns, matching the kernel's static 128-lane slices)
    t = np.asarray(fbvh.tris)
    F = t.shape[0]
    tris_flat = t.reshape(F, -1)

    boxesT = gtab = stab = None
    if tri_normals_world is not None and tri_materials is not None:
        fb2 = fbvh
        if fused_tile != RAY_LANE:
            fb2 = pack_flatlets(tri_verts_world, leaf_tris=fused_tile,
                                max_leaf=max_leaf, max_depth=max_depth,
                                tri_ids=tri_ids)
        # flatlet tiles are always 128 slots wide; a narrower cut just
        # leaves slots >= fused_tile empty, so slice them off
        t2 = np.asarray(fb2.tris)[:, :, :fused_tile]  # [F2, 10, tile]
        b2 = np.asarray(fb2.boxes)[:, :, 0, :]
        F2 = t2.shape[0]
        boxesT = b2.transpose(1, 0, 2).reshape(6, F2)[:, :, None]
        # shading payload per (flatlet, slot): n0 | n1-n0 | n2-n0 | mat,
        # gathered by the slot's global triangle id. Pad slots (gid row
        # carries 0) get tri 0's payload — harmless, they can never win
        # (degenerate pad triangles have det 0).
        tn = np.asarray(tri_normals_world, np.float32)
        tm = np.asarray(tri_materials, np.float32).reshape(-1)
        gid = t2[:, 9, :].astype(np.int64)  # [F2, tile]
        n0 = tn[gid, 0]  # [F2, tile, 3]
        d1 = tn[gid, 1] - n0
        d2 = tn[gid, 2] - n0
        fields = np.concatenate(
            [n0.transpose(0, 2, 1), d1.transpose(0, 2, 1),
             d2.transpose(0, 2, 1), tm[gid][:, None, :]],
            axis=1)  # [F2, 10, tile]
        shadeT = np.ascontiguousarray(
            fields.reshape(F2, -1).T)  # [10*tile, F2]
        # Fused-tier geometry table: v0 | e1 | e2 fields only — the
        # winner's shading payload is fetched from the shade table once
        # per row granule, not on every pop round.
        tabT = np.ascontiguousarray(
            t2.reshape(F2, -1).T[:9 * fused_tile])  # [9*tile, F2]
        boxesT = jnp.asarray(np.ascontiguousarray(boxesT))
        gtab = jnp.asarray(_split_bf16x3(tabT))
        stab = jnp.asarray(_split_bf16x3(shadeT))
    return RayletBVH(jnp.asarray(boxes), jnp.asarray(tris_flat),
                     boxesT, gtab, stab, RAY_LANE, fused_tile)


def _split_bf16x3(x: np.ndarray) -> np.ndarray:
    """[R, F] f32 -> [3*R, F] bf16: hi | mid | lo round-to-nearest
    splits covering disjoint mantissa windows. A one-hot matmul against
    each plane (f32 accumulate) recombines the original f32 exactly in
    normal range — three single-pass bf16 MXU matmuls replace one
    multi-pass f32 Precision.HIGHEST matmul (~680x faster per round on
    v5e, measured)."""
    import ml_dtypes

    x = np.asarray(x, np.float32)
    hi = x.astype(ml_dtypes.bfloat16)
    mid = (x - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    lo = (x - hi.astype(np.float32) - mid.astype(np.float32)).astype(
        ml_dtypes.bfloat16)
    return np.concatenate([hi, mid, lo], axis=0)


def _raylet_kernel(F: int, R: int):
    n_granules = BLOCK_RAYS // R

    def kernel(boxes_ref, tris_ref, oT_ref, dT_ref, iT_ref, sT_ref,
               t_ref, tri_ref, u_ref, v_ref, s_ref, tt_ref, bt_ref):
        lane_f = jax.lax.broadcasted_iota(jnp.int32, (R, F), 1)
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (R, RAY_LANE), 1)

        def granule(g, _):
            def col(ref, comp):
                # (R, 1) slice of the (1024, 1) column layouts: row i =
                # ray i, so granule g's rays are one free dynamic
                # sublane slice.
                return ref[0, 0, comp, pl.ds(g * R, R)]

            ox, oy, oz = col(oT_ref, 0), col(oT_ref, 1), col(oT_ref, 2)
            dx, dy, dz = col(dT_ref, 0), col(dT_ref, 1), col(dT_ref, 2)
            ix, iy, iz = col(iT_ref, 0), col(iT_ref, 1), col(iT_ref, 2)
            seed = sT_ref[0, 0, pl.ds(g * R, R)]  # (R, 1)

            def live_granule(_):
                # ---- dense box pass: (R rays, F boxes) in one shot
                def box(c):
                    return boxes_ref[c]  # (1, F)

                t1x, t2x = (box(0) - ox) * ix, (box(3) - ox) * ix
                t1y, t2y = (box(1) - oy) * iy, (box(4) - oy) * iy
                t1z, t2z = (box(2) - oz) * iz, (box(5) - oz) * iz
                tmin = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1x, t2x),
                                jnp.minimum(t1y, t2y)),
                    jnp.minimum(t1z, t2z))
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1x, t2x),
                                jnp.maximum(t1y, t2y)),
                    jnp.maximum(t1z, t2z))
                ent = jnp.maximum(tmin, 0.0)
                hit = (tmax > jnp.maximum(0.0, tmin)) & (ent < seed)
                emin = jnp.where(hit, ent, BIG)  # (R, F)

                # ---- per-ray nearest-first rounds
                # Lane-local payload: best among the triangles lane k
                # has seen; the global winner is reduced once at the
                # end. btr (R,1) is the per-ray best-t that drives the
                # worklist pruning.
                pt0 = jnp.broadcast_to(seed, (R, RAY_LANE))
                zeros = jnp.zeros((R, RAY_LANE), jnp.float32)
                carry0 = (
                    emin,
                    pt0,                                   # lane best t
                    jnp.full((R, RAY_LANE), -1.0),         # lane tri id
                    zeros,                                 # lane u
                    zeros,                                 # lane v
                    jnp.ones((R, RAY_LANE), jnp.float32),  # lane sign
                    seed,                                  # btr (R,1)
                    jnp.zeros((R, 1), jnp.int32),          # tri tests
                )

                def w_cond(c):
                    emin, *_, btr, _tt = c
                    m = jnp.min(emin, axis=1, keepdims=True)
                    # `< BIG` keeps the loop finite for +inf seeds
                    # (exhausted worklists must not re-pop forever).
                    return jnp.any((m < BIG) & (m < btr))

                def w_body(c):
                    emin, pt, ptri, pu, pv, ps, btr, tt = c
                    rowmin = jnp.min(emin, axis=1, keepdims=True)
                    jrel = jnp.min(
                        jnp.where(emin <= rowmin, lane_f, IBIG),
                        axis=1, keepdims=True)
                    live = (rowmin < BIG) & (rowmin < btr)
                    pop = lane_f == jrel
                    oh = (pop & live).astype(jnp.float32)
                    comp = jax.lax.dot_general(
                        oh, tris_ref[:], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)  # (R,1280)

                    def cc(j):
                        return comp[:, j * RAY_LANE:(j + 1) * RAY_LANE]

                    v0x, v0y, v0z = cc(0), cc(1), cc(2)
                    e1x, e1y, e1z = cc(3), cc(4), cc(5)
                    e2x, e2y, e2z = cc(6), cc(7), cc(8)
                    gid = cc(9)
                    # Möller-Trumbore (compute:307-355), rays on
                    # sublanes x 128 triangles on lanes
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
                        & (t < pt)
                    )
                    sgn = jnp.where(det >= 0.0, 1.0, -1.0)
                    pt = jnp.where(valid, t, pt)
                    ptri = jnp.where(valid, gid, ptri)
                    pu = jnp.where(valid, u, pu)
                    pv = jnp.where(valid, v, pv)
                    ps = jnp.where(valid, sgn, ps)
                    btr = jnp.minimum(
                        btr,
                        jnp.min(jnp.where(valid, t, BIG), axis=1,
                                keepdims=True))
                    emin = jnp.where(pop, BIG, emin)
                    tt = tt + jnp.where(live, RAY_LANE, 0)
                    return (emin, pt, ptri, pu, pv, ps, btr, tt)

                _, pt, ptri, pu, pv, ps, btr, tt = jax.lax.while_loop(
                    w_cond, w_body, carry0)

                # ---- winner reduction: first lane achieving the min t
                t_row = jnp.min(pt, axis=1, keepdims=True)
                wl = jnp.min(
                    jnp.where(pt <= t_row, lane_c, IBIG),
                    axis=1, keepdims=True)
                wsel = lane_c == wl

                def pick(a):
                    return jnp.sum(jnp.where(wsel, a, 0.0), axis=1,
                                   keepdims=True)

                tri = pick(ptri)
                miss = tri < 0.0
                bt = jnp.where(seed > 0.0, F, 0)
                return (jnp.where(miss, INF, t_row),
                        tri.astype(jnp.int32),
                        pick(pu), pick(pv), pick(ps),
                        tt, bt.astype(jnp.int32))

            def dead_granule(_):
                fz = jnp.zeros((R, 1), jnp.float32)
                iz_ = jnp.zeros((R, 1), jnp.int32)
                return (jnp.full((R, 1), INF), iz_ - 1, fz, fz,
                        fz + 1.0, iz_, iz_)

            t, tri, u, v, s, tt, bt = jax.lax.cond(
                jnp.any(seed > 0.0), live_granule, dead_granule, 0)
            sl = pl.ds(g * R, R)
            t_ref[0, 0, sl] = t
            tri_ref[0, 0, sl] = tri
            u_ref[0, 0, sl] = u
            v_ref[0, 0, sl] = v
            s_ref[0, 0, sl] = s
            tt_ref[0, 0, sl] = tt
            bt_ref[0, 0, sl] = bt
            return 0

        jax.lax.fori_loop(0, n_granules, granule, 0)

    return kernel


def traverse_raylets(
    rbvh: RayletBVH,
    origin: jnp.ndarray,  # [N, 3]
    direction: jnp.ndarray,  # [N, 3]
    t_seed: jnp.ndarray,  # [N] best-t seed (min(far, sphere hit))
    interpret: bool = False,
    rays_per_granule: int = GRANULE,
):
    """Closest hit for N rays; returns (t [N] (+inf miss), tri [N] i32
    GLOBAL triangle ids, u, v, sign, tri_tests, box_tests) — drop-in
    for `flatlet.traverse_flatlets`."""
    n = origin.shape[0]
    R = rays_per_granule
    assert BLOCK_RAYS % R == 0 and R % RAY_SUB == 0
    nb = -(-n // BLOCK_RAYS)
    pad = nb * BLOCK_RAYS - n
    F = rbvh.num_flatlets

    def padded(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
        ) if pad else x

    def col_major(x):
        # plain (1024, 1) column layout: row i = ray i (Morton-sorted
        # order preserved, so granules are coherent neighbor groups)
        if x.ndim == 2:
            return x.T.reshape(3, nb, BLOCK_RAYS, 1).transpose(
                1, 0, 2, 3).reshape(nb, 1, 3, BLOCK_RAYS, 1)
        return x.reshape(nb, 1, BLOCK_RAYS, 1)

    o_p = padded(origin, 0.0)
    d_p = padded(direction, 1.0)
    s_p = padded(t_seed, -1.0)  # pad rays: best_t<0 -> nothing hits
    tiny = jnp.float32(1e-30)
    inv_p = 1.0 / jnp.where(jnp.abs(d_p) < tiny, tiny, d_p)

    oT = col_major(o_p)
    dT = col_major(d_p)
    iT = col_major(inv_p)
    sT = col_major(s_p)

    f32, i32 = jnp.float32, jnp.int32
    out_shape = [
        jax.ShapeDtypeStruct((nb, 1, BLOCK_RAYS, 1), dt)
        for dt in (f32, i32, f32, f32, f32, i32, i32)
    ]
    rayT_spec = pl.BlockSpec((1, 1, 3, BLOCK_RAYS, 1),
                             lambda i: (i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    flatT_spec = pl.BlockSpec((1, 1, BLOCK_RAYS, 1),
                              lambda i: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _raylet_kernel(F, R),
        grid=(nb,),
        in_specs=[full(), full(), rayT_spec, rayT_spec, rayT_spec,
                  flatT_spec],
        out_specs=[flatT_spec] * 7,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(rbvh.boxes, rbvh.tris_flat, oT, dT, iT, sT)

    def unshape(x):
        return x.reshape(-1)[:n]

    return tuple(unshape(x) for x in outs)
