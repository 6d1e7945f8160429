"""Pallas TPU kernel: PER-RAY BVH traversal over treelet tiles.

Second device-native traversal tier, built for INCOHERENT rays — the
regime where the shared-stack kernel (`bvh_pallas.py`) degenerates: a
1024-ray block's node union approaches the whole tree once bounce rays
stop sharing subtrees (measured ~2,000 box tests/ray on glass_dragon
bounces vs ~200 for primaries).

Design:
- **Skip-link (threaded) BVH in DFS preorder**: a ray's state is ONE
  node id; step = slab test -> first child (= id + 1 in preorder) on
  hit, skip link on miss. No stack, so no per-lane dynamic stack
  indexing (TPU has no per-lane scatter).
- **Treelet tiles**: nodes are cut into preorder-contiguous treelets of
  <=128 nodes and <=128 leaf triangles; each field is stored
  sublane-broadcast as an [8, 128] tile, so a ray block fetches ALL its
  rays' (per-ray!) nodes with one `tpu.dynamic_gather` per field
  (`jnp.take_along_axis(tile, local_id, axis=1)` — measured ~20 ns per
  [8,128] gather on v5e; the gather range is one 128-lane vreg, which
  is exactly what sets the 128-node treelet size).
- **Monotone treelet schedule**: both preorder children and skip links
  point FORWARD in preorder, so every ray's treelet id is
  non-decreasing. The block serially processes `cur = min(live rays'
  treelet)`; rays outside `cur` idle (masked) but each ray passes each
  treelet at most once. This bounds the incoherence cost at treelet
  granularity instead of node granularity.
- Per iteration every ray does either one NODE step or one TRIANGLE
  test (a leaf's triangles live in its own treelet, tested one per
  iteration) — uniform vector work, per-ray progress.

Same contract as `bvh_pallas.traverse_world_bvh_any`; Moller-Trumbore
and slab formulas mirror it exactly (reference
`HalgoenCompute.compute:244-259,307-355`).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_SUB = 8
RAY_LANE = 128
BLOCK_RAYS = RAY_SUB * RAY_LANE  # 1024
T_NODES = 128  # nodes per treelet (== dynamic_gather lane range)
T_TRIS = 128  # leaf triangles per treelet
# VMEM-resident cap: each treelet costs 8*8*128*4 B of nodes + 10*8*128*4 B
# of triangles = 72 KB; ~100 tris/treelet keeps 64k-tri scenes near 46 MB,
# inside the 100 MB scoped-VMEM budget with ray-block headroom.
TREELET_MAX_TRIS = 65536
DET_EPS = np.float32(1e-8)
INF = np.float32(np.inf)

# Node field rows (sublane-broadcast [8,128] tiles):
#   0-2 lo.xyz | 3-5 hi.xyz | 6 skip (padded id) |
#   7 tag: leaf -> 1 + 2*count + 16*tri_start_local ; inner -> 2*child_id
# Triangle field rows: 0-2 v0 | 3-5 e1 | 6-8 e2 | 9 global tri id


class TreeletBVH(NamedTuple):
    nodes: jnp.ndarray  # [K, 8, 8, 128] f32
    tris: jnp.ndarray  # [K, 10, 8, 128] f32
    # Optional shading payload for the fused megakernel's winner
    # post-pass: rows 0-2 n0.xyz | 3-5 (n1-n0).xyz | 6-8 (n2-n0).xyz |
    # 9 material id. Kept out of `tris` so the traversal-only kernels
    # (bvh parity path) don't pay its VMEM cost.
    shade: jnp.ndarray | None = None  # [K, 10, 8, 128] f32

    @property
    def num_treelets(self) -> int:
        return self.nodes.shape[0]


def pack_treelet_bvh(tri_verts_world: np.ndarray, max_leaf: int = 5,
                     max_depth: int = 32,
                     tri_ids: np.ndarray | None = None,
                     tri_normals_world: np.ndarray | None = None,
                     tri_materials: np.ndarray | None = None) -> TreeletBVH:
    """Build + pack the skip-link treelet BVH (host side, numpy)."""
    from halogen_tpu.accel.bvh import build_bvh

    tv = np.asarray(tri_verts_world, np.float32)
    n = tv.shape[0]
    bvh = build_bvh(tv.copy(), max_leaf=max_leaf, max_depth=max_depth)
    order = bvh.tri_order
    global_ids = (np.asarray(tri_ids, np.int64)[order]
                  if tri_ids is not None else order.astype(np.int64))
    tv = tv[order]

    # --- preorder walk with subtree sizes (iterative; depth <= 32)
    B = bvh.num_nodes
    pre: list[int] = []
    size = np.zeros(B, np.int64)
    # state: (old_id, visited_flag)
    stack = [(0, False)]
    post: list[int] = []
    while stack:
        o, visited = stack.pop()
        if visited:
            if bvh.count[o] > 0:
                size[o] = 1
            else:
                a = bvh.index_a[o]
                size[o] = 1 + size[a] + size[a + 1]
            continue
        pre.append(o)
        stack.append((o, True))
        if bvh.count[o] == 0:
            a = bvh.index_a[o]
            stack.append((a + 1, False))  # pushed first -> visited second
            stack.append((a, False))
    pre_arr = np.asarray(pre, np.int64)
    new_of_old = np.zeros(B, np.int64)
    new_of_old[pre_arr] = np.arange(B)

    # --- treelet cuts (preorder-contiguous; <=T_NODES nodes, <=T_TRIS tris)
    tid = np.zeros(B, np.int64)
    local = np.zeros(B, np.int64)
    t_nodes = 0
    t_tris = 0
    cur = 0
    tri_start_local = np.zeros(B, np.int64)  # valid for leaves
    for g, o in enumerate(pre_arr):
        c = int(bvh.count[o])
        if t_nodes + 1 > T_NODES or t_tris + c > T_TRIS:
            cur += 1
            t_nodes = 0
            t_tris = 0
        tid[g] = cur
        local[g] = t_nodes
        tri_start_local[g] = t_tris
        t_nodes += 1
        t_tris += c
    K = cur + 1
    padded = tid * T_NODES + local  # padded id per preorder position
    end_id = K * T_NODES

    # skip link: next preorder node after the subtree
    skip = np.empty(B, np.int64)
    for g, o in enumerate(pre_arr):
        nxt = g + size[o]
        skip[g] = end_id if nxt >= B else padded[nxt]

    with_shade = tri_normals_world is not None
    if with_shade:
        tn = np.asarray(tri_normals_world, np.float32)[order]
        tm = (np.asarray(tri_materials, np.float32)[order]
              if tri_materials is not None else np.zeros(n, np.float32))

    nodes = np.zeros((K, 8, T_NODES), np.float32)
    tris = np.zeros((K, 10, T_TRIS), np.float32)
    shade = np.zeros((K, 10, T_TRIS), np.float32) if with_shade else None
    for g, o in enumerate(pre_arr):
        k, loc = tid[g], local[g]
        nodes[k, 0:3, loc] = bvh.lo[o]
        nodes[k, 3:6, loc] = bvh.hi[o]
        nodes[k, 6, loc] = float(skip[g])
        c = int(bvh.count[o])
        if c > 0:
            ts = tri_start_local[g]
            nodes[k, 7, loc] = float(1 + 2 * c + 16 * ts)
            sl = slice(int(bvh.index_a[o]), int(bvh.index_a[o]) + c)
            v0 = tv[sl, 0]
            tris[k, 0:3, ts:ts + c] = v0.T
            tris[k, 3:6, ts:ts + c] = (tv[sl, 1] - v0).T
            tris[k, 6:9, ts:ts + c] = (tv[sl, 2] - v0).T
            tris[k, 9, ts:ts + c] = global_ids[sl].astype(np.float32)
            if with_shade:
                n0 = tn[sl, 0]
                shade[k, 0:3, ts:ts + c] = n0.T
                shade[k, 3:6, ts:ts + c] = (tn[sl, 1] - n0).T
                shade[k, 6:9, ts:ts + c] = (tn[sl, 2] - n0).T
                shade[k, 9, ts:ts + c] = tm[sl]
        else:
            child = padded[g + 1]  # first child follows in preorder
            nodes[k, 7, loc] = float(2 * child)
    # degenerate filler triangles keep padded slots inert (v0=e1=e2=0)
    nodes_b = np.broadcast_to(nodes[:, :, None, :],
                              (K, 8, RAY_SUB, T_NODES)).copy()
    tris_b = np.broadcast_to(tris[:, :, None, :],
                             (K, 10, RAY_SUB, T_TRIS)).copy()
    shade_b = (jnp.asarray(np.broadcast_to(
        shade[:, :, None, :], (K, 10, RAY_SUB, T_TRIS)).copy())
        if with_shade else None)
    return TreeletBVH(jnp.asarray(nodes_b), jnp.asarray(tris_b), shade_b)


def _traverse_kernel(K: int):
    end_id = K * T_NODES

    def kernel(nodes_ref, tris_ref, o_ref, d_ref, seed_ref,
               t_ref, tri_ref, u_ref, v_ref, s_ref, tt_ref, bt_ref):
        ox, oy, oz = o_ref[0, 0, 0], o_ref[0, 0, 1], o_ref[0, 0, 2]
        dx, dy, dz = d_ref[0, 0, 0], d_ref[0, 0, 1], d_ref[0, 0, 2]
        tiny = jnp.float32(1e-30)
        ix = 1.0 / jnp.where(jnp.abs(dx) < tiny, tiny, dx)
        iy = 1.0 / jnp.where(jnp.abs(dy) < tiny, tiny, dy)
        iz = 1.0 / jnp.where(jnp.abs(dz) < tiny, tiny, dz)

        i32 = jnp.int32
        # Carry init values must NOT be splat constants: Mosaic assigns
        # constants a replicated vector layout, and the while_loop body
        # produces non-replicated values — the resulting relayout is
        # rejected at compile time ("Non-singleton logical dimension is
        # replicated in destination but not in source"). Deriving the
        # zeros/ones from loaded ray data pins a concrete (8,128) layout.
        zf = ox * 0.0
        zi = zf.astype(i32)
        state = (
            jnp.int32(0),  # safety iteration counter
            zi,  # node (padded id; root = 0)
            zi,  # trem: tris remaining at current leaf
            zi,  # tcur: current local tri slot
            seed_ref[0, 0],  # best_t
            zf - 1.0,  # winner global tri id
            zf,  # u
            zf,  # v
            zf + 1.0,  # sign
            zi,  # tri tests
            zi,  # box tests
        )

        def cond(c):
            # the monotone walk visits every node and triangle at most
            # once per ray; 2*end_id iterations is a hard upper bound
            # (safety net against non-termination bugs on hardware)
            return jnp.any(c[1] < end_id) & (c[0] < 2 * end_id + 16)

        def body(c):
            (it, node, trem, tcur, best_t, wtri, wu, wv, ws, tt, bt) = c
            alive = node < end_id
            t_id = jnp.right_shift(node, 7)
            cur = jnp.min(jnp.where(alive, t_id, K)).astype(i32)
            in_cur = alive & (t_id == cur)
            local = jnp.bitwise_and(node, T_NODES - 1)

            def g8(ref, f, idx):
                return jnp.take_along_axis(ref[cur, f], idx, axis=1)

            # --- node fetch (8 lane-gathers)
            lo_x = g8(nodes_ref, 0, local)
            lo_y = g8(nodes_ref, 1, local)
            lo_z = g8(nodes_ref, 2, local)
            hi_x = g8(nodes_ref, 3, local)
            hi_y = g8(nodes_ref, 4, local)
            hi_z = g8(nodes_ref, 5, local)
            skip = g8(nodes_ref, 6, local).astype(i32)
            tag = g8(nodes_ref, 7, local).astype(i32)
            is_leaf = jnp.bitwise_and(tag, 1) == 1
            child = jnp.right_shift(tag, 1)
            count = jnp.bitwise_and(jnp.right_shift(tag, 1), 7)
            tstart = jnp.right_shift(tag, 4)

            leaf_phase = in_cur & (trem > 0)
            node_phase = in_cur & (~leaf_phase)

            # --- slab test (ray_AABB_test, compute:244-259)
            t1x, t2x = (lo_x - ox) * ix, (hi_x - ox) * ix
            t1y, t2y = (lo_y - oy) * iy, (hi_y - oy) * iy
            t1z, t2z = (lo_z - oz) * iz, (hi_z - oz) * iz
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                           jnp.minimum(t1y, t2y)),
                               jnp.minimum(t1z, t2z))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                           jnp.maximum(t1y, t2y)),
                               jnp.maximum(t1z, t2z))
            # clamped entry: equal to (tmin < best_t) for live rays
            # (best_t > 0) and false for pad rays (seed -1), which would
            # otherwise walk the whole tree from inside the root box
            hitbox = ((tmax > jnp.maximum(0.0, tmin))
                      & (jnp.maximum(tmin, 0.0) < best_t))

            enter_leaf = node_phase & hitbox & is_leaf

            # --- triangle test for leaf-phase rays (10 lane-gathers;
            # Moller-Trumbore, compute:307-355)
            v0x = g8(tris_ref, 0, tcur)
            v0y = g8(tris_ref, 1, tcur)
            v0z = g8(tris_ref, 2, tcur)
            e1x = g8(tris_ref, 3, tcur)
            e1y = g8(tris_ref, 4, tcur)
            e1z = g8(tris_ref, 5, tcur)
            e2x = g8(tris_ref, 6, tcur)
            e2y = g8(tris_ref, 7, tcur)
            e2z = g8(tris_ref, 8, tcur)
            gid = g8(tris_ref, 9, tcur)
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = px * e1x + py * e1y + pz * e1z
            parallel = jnp.abs(det) < DET_EPS
            inv_det = 1.0 / jnp.where(parallel, 1.0, det)
            tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
            uu = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            vv = (dx * qx + dy * qy + dz * qz) * inv_det
            th = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            valid = (
                leaf_phase & (~parallel) & (uu >= 0.0) & (uu <= 1.0)
                & (vv >= 0.0) & (uu + vv <= 1.0) & (th > 0.0)
                & (th < best_t)
            )
            best_t = jnp.where(valid, th, best_t)
            wtri = jnp.where(valid, gid, wtri)
            wu = jnp.where(valid, uu, wu)
            wv = jnp.where(valid, vv, wv)
            ws = jnp.where(valid,
                           jnp.where(det >= 0.0, 1.0, -1.0), ws)

            # --- advance
            trem_n = jnp.where(enter_leaf, count,
                               jnp.where(leaf_phase, trem - 1, trem))
            tcur_n = jnp.where(enter_leaf, tstart,
                               jnp.where(leaf_phase, tcur + 1, tcur))
            # NOTE: the first child follows its parent in PREORDER, but
            # padded ids have holes at treelet boundaries — use the
            # stored child id, never node + 1.
            node_n = jnp.where(
                node_phase & hitbox & (~is_leaf), child,
                jnp.where(node_phase & (~hitbox), skip,
                          jnp.where(leaf_phase & (trem_n == 0), skip,
                                    node)))
            # mask casts, not where(mask, 1, 0): Mosaic cannot relayout
            # the replicated scalar-constant vector into the (8,128) tile
            tt = tt + leaf_phase.astype(jnp.int32)
            bt = bt + node_phase.astype(jnp.int32)
            return (it + 1, node_n, trem_n, tcur_n, best_t, wtri, wu, wv,
                    ws, tt, bt)

        (_, node, trem, tcur, best_t, wtri, wu, wv, ws, tt, bt) = (
            jax.lax.while_loop(cond, body, state))
        miss = wtri < 0.0
        t_ref[0, 0] = jnp.where(miss, INF, best_t)
        tri_ref[0, 0] = wtri.astype(i32)
        u_ref[0, 0] = wu
        v_ref[0, 0] = wv
        s_ref[0, 0] = ws
        tt_ref[0, 0] = tt
        bt_ref[0, 0] = bt

    return kernel


def traverse_treelets(
    tbvh: TreeletBVH,
    origin: jnp.ndarray,  # [N, 3]
    direction: jnp.ndarray,  # [N, 3]
    t_seed: jnp.ndarray,  # [N] best-t seed (min(far, sphere hit))
    interpret: bool = False,
    block_sub: int = RAY_SUB,
):
    """Closest hit for N rays; returns (t [N] (+inf miss), tri [N] i32
    GLOBAL triangle ids, u, v, sign, tri_tests, box_tests) — drop-in for
    `bvh_pallas.traverse_world_bvh_any`."""
    n = origin.shape[0]
    block_rays = block_sub * RAY_LANE
    nb = -(-n // block_rays)
    pad = nb * block_rays - n

    def shape_rays(x, fill):
        x = jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]
        ) if pad else x
        if x.ndim == 2:
            return x.T.reshape(3, nb, block_sub, RAY_LANE).transpose(
                1, 0, 2, 3).reshape(nb, 1, 3, block_sub, RAY_LANE)
        return x.reshape(nb, 1, block_sub, RAY_LANE)

    o = shape_rays(origin, 0.0)
    d = shape_rays(direction, 1.0)
    seed = shape_rays(t_seed, -1.0)  # pad rays: best_t<0 -> nothing hits

    f32, i32 = jnp.float32, jnp.int32
    out_shape = [
        jax.ShapeDtypeStruct((nb, 1, block_sub, RAY_LANE), dt)
        for dt in (f32, i32, f32, f32, f32, i32, i32)
    ]
    ray_spec = pl.BlockSpec((1, 1, 3, block_sub, RAY_LANE),
                            lambda i: (i, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec((1, 1, block_sub, RAY_LANE),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _traverse_kernel(tbvh.num_treelets),
        grid=(nb,),
        in_specs=[full(), full(), ray_spec, ray_spec, flat_spec],
        out_specs=[flat_spec] * 7,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tbvh.nodes, tbvh.tris, o, d, seed)

    def unshape(x):
        return x.reshape(-1)[:n]

    return tuple(unshape(x) for x in outs)
