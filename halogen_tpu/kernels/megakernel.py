"""Pallas fused-bounce megakernel: the whole path loop in one TPU kernel.

The TPU answer to the reference's megakernel design
(`HalgoenCompute.compute:876-1063`): instead of the lockstep JAX
integrator's ~60 HBM-roundtrip fusions per bounce, every bounce of every
ray in a block runs inside ONE `pallas_call` — ray state lives in
registers/VMEM, the scene (triangles, spheres, materials) lives in SMEM
as broadcast scalars, and the only HBM traffic is the initial ray load
and the final color store. This is the single-chip speed-of-light path
for small (Cornell-class) scenes where the whole scene fits in SMEM.

Scope (static eligibility, `fused_supported`): no NEE (neither envmap
importance sampling nor area-light NEE), debug off, <=MAX_TRIS triangles
and <=MAX_SPHERES spheres. Transmissive scenes run the full
nested-dielectric interface-tracking path (the medium stack lives in
VMEM as per-slot SoA register arrays); environment lookups are DEFERRED:
a ray misses at most once — at its death — so the kernel records the
miss attenuation / direction / accumulated roughness and the host
wrapper adds `sample_env(dir, level) * attenuation` in one fused XLA
pass afterwards. Everything else (NEE scenes, debug views, huge scenes)
falls back to the lockstep / wavefront schedulers in
`integrator/trace.py`. Per-ray results mirror `trace._pool_bounce`
op-for-op (same formulas, same selection order), so images match the
lockstep tracer to float addition-order tolerance.

Semantics preserved (same reference citations as integrator/trace.py):
- brute-force closest-hit with first-min tie-breaking and the
  sphere-vs-mesh HIT_EPS rule (compute:357-376, 452)
- per-type bounce limits with `>` (compute:869-871), emission before
  BRDF (compute:901-902), Russian roulette with 1/p after the kill test
  (compute:923-936), sampler dims advancing 5 per bounce (compute:921)
- evaluate_material_hit (compute:743-817): nested-dielectric priority
  rule + push/pop sequencing incl. the reflected-ray bandaid pop
  (compute:799-802), refraction with TIR (compute:711-734), Beer-Lambert
  absorption through the current medium (compute:810-813); opaque scenes
  compile the stack-free specialization
- miss -> sky with the accumulated-roughness mip bias
  (QUESTIONABLE_IMPORTANCE_SAMPLING, compute:940-945) incl. the
  float3->float roughness-accumulator truncation quirk (compute:911)

Differentiability: the kernel is forward-only; `trace_color_fused_diff`
wraps it in a custom_vjp whose backward is the vjp of the lockstep
tracer (path replay) — the same decomposition as the wavefront
scheduler's.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from halogen_tpu.config import DebugMode, RenderSettings, SamplerKind
from halogen_tpu.core.types import SceneData
from halogen_tpu.scene.envmap import sample_env_packed

# Static eligibility caps: the scene tables must fit in SMEM and the
# primitive loops are fully unrolled in the kernel body.
MAX_TRIS = 128
MAX_SPHERES = 32
MAX_MATERIALS = 64

LANES = 128
DEFAULT_SUBLANES = 32  # rays per program = SUBLANES * LANES
# Raylet-tier block size: on-chip A/B on glass_dragon kept 32 (64 ->
# 6.19 Mrays/s vs 6.56, and Mosaic compile 204 s vs 46 s — the bigger
# block body outweighs the denser compaction pool).
RAYLET_SUBLANES = 32

_HIT_EPS = np.float32(1e-4)
_OFFSET_EPS = np.float32(1e-4)
_DET_EPS = np.float32(1e-8)
_INF = np.float32(np.inf)
_TWO_PI = np.float32(2.0 * np.pi)
_INV_U32 = np.float32(1.0 / 4294967296.0)

_U32 = jnp.uint32


# ---------------------------------------------------------------------------
# uint32 sampler primitives on in-kernel arrays (mirror sampler/sobol.py)
# ---------------------------------------------------------------------------

def _reverse_bits(x):
    m1 = _U32(0x55555555)
    m2 = _U32(0x33333333)
    m4 = _U32(0x0F0F0F0F)
    m8 = _U32(0x00FF00FF)
    x = ((x >> _U32(1)) & m1) | ((x & m1) << _U32(1))
    x = ((x >> _U32(2)) & m2) | ((x & m2) << _U32(2))
    x = ((x >> _U32(4)) & m4) | ((x & m4) << _U32(4))
    x = ((x >> _U32(8)) & m8) | ((x & m8) << _U32(8))
    return (x >> _U32(16)) | (x << _U32(16))


def _owen_scramble(value, seed):
    x = _reverse_bits(value)
    x = x ^ (x * _U32(0x3D20ADEA))
    x = x + seed
    x = x * ((seed >> _U32(16)) | _U32(1))
    x = x ^ (x * _U32(0x05526C56))
    x = x ^ (x * _U32(0x53A22864))
    return _reverse_bits(x)


def _u32_hash(v):
    state = v * _U32(747796405) + _U32(2891336453)
    word = ((state >> ((state >> _U32(28)) + _U32(4))) ^ state) * _U32(277803737)
    return (word >> _U32(22)) ^ word


def _hash_combine(seed, v: int):
    return seed ^ (_U32(v) + (seed << _U32(6)) + (seed >> _U32(2)))


# Sobol direction numbers for dimension 1 (sampler/sobol._SOBOL_DIRECTIONS
# row 1); dimension 0 is the identity table, i.e. sobol1d(i, 0) ==
# reverse_bits(i) — folded below.
_SOBOL_DIM1 = (
    0x80000000, 0xC0000000, 0xA0000000, 0xF0000000,
    0x88000000, 0xCC000000, 0xAA000000, 0xFF000000,
    0x80800000, 0xC0C00000, 0xA0A00000, 0xF0F00000,
    0x88880000, 0xCCCC0000, 0xAAAA0000, 0xFFFF0000,
    0x80008000, 0xC000C000, 0xA000A000, 0xF000F000,
    0x88008800, 0xCC00CC00, 0xAA00AA00, 0xFF00FF00,
    0x80808080, 0xC0C0C0C0, 0xA0A0A0A0, 0xF0F0F0F0,
    0x88888888, 0xCCCCCCCC, 0xAAAAAAAA, 0xFFFFFFFF,
)


def _sobol_dim1(index):
    x = jnp.zeros_like(index)
    for bit in range(32):
        mask = (index >> _U32(bit)) & _U32(1)
        x = x ^ (mask * _U32(_SOBOL_DIM1[bit]))
    return x


def _to_unit(u):
    # Mosaic has no uint32->f32 convert; split into a 24-bit high part and
    # an 8-bit low part (both exact in f32) so hi*256+lo rounds ONCE —
    # bit-identical to XLA's round-to-nearest u32->f32 used by the
    # lockstep sampler (sampler/sobol.to_unit_float).
    hi = (u >> _U32(8)).astype(jnp.int32).astype(jnp.float32)
    lo = (u & _U32(0xFF)).astype(jnp.int32).astype(jnp.float32)
    return (hi * np.float32(256.0) + lo) * _INV_U32


def _sobol_2d(index, dim, seed):
    """ld_sample_2d; `dim` is a traced uint32 scalar (the per-bounce
    dimension stride lives inside the kernel's fori_loop)."""
    sd = seed ^ _u32_hash(dim)
    shuffled = _owen_scramble(index, sd)
    x = _owen_scramble(_reverse_bits(shuffled), _hash_combine(sd, 0))
    y = _owen_scramble(_sobol_dim1(shuffled), _hash_combine(sd, 1))
    return _to_unit(x), _to_unit(y)


def _sobol_1d(index, dim, seed):
    """ld_sample_1d: scrambles the value, does NOT shuffle the index
    (reference quirk, HalogenRandom.hlsl:203-209)."""
    sd = seed ^ _u32_hash(dim)
    return _to_unit(_owen_scramble(_reverse_bits(index), _u32_hash(sd)))


def _prng_2d_impl(index, dim, seed):
    # mirror sampler/sobol.prng_sample_2d: hash_combine(hash_combine(seed,
    # index), dim) — index is per-ray, dim a traced uint32 scalar.
    h = seed ^ (index + (seed << _U32(6)) + (seed >> _U32(2)))
    h0 = h ^ (dim + (h << _U32(6)) + (h >> _U32(2)))
    return _to_unit(_u32_hash(h0)), _to_unit(_u32_hash(h0 ^ _U32(0x9E3779B9)))


def _prng_1d_impl(index, dim, seed):
    h = seed ^ (index + (seed << _U32(6)) + (seed >> _U32(2)))
    h0 = h ^ (dim + (h << _U32(6)) + (h >> _U32(2)))
    return _to_unit(_u32_hash(h0))


# ---------------------------------------------------------------------------
# SoA float helpers (component triples of [BS, 128] arrays)
# ---------------------------------------------------------------------------

def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _normalize3(v, eps=np.float32(1e-20)):
    n = jnp.sqrt(_dot3(v, v))
    inv = 1.0 / jnp.maximum(n, eps)
    return (v[0] * inv, v[1] * inv, v[2] * inv)


def _where3(c, a, b):
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def _sign(x):
    return jnp.where(x > 0.0, np.float32(1.0),
                     jnp.where(x < 0.0, np.float32(-1.0), np.float32(0.0)))


# ---------------------------------------------------------------------------
# Nested-dielectric medium stack as per-slot SoA register arrays
# (mirrors core/medium.MediumStack op-for-op; see its docstring for the
# reference semantics, HalgoenCompute.compute:582-665)
# ---------------------------------------------------------------------------

STACK_DEPTH = 8  # participatingMediumStack[8] (HalgoenCompute.compute:188)
_EMPTY_PRIO = np.int32(2**31 - 1)
_NO_MEDIUM = np.int32(-1)


class _Stack:
    """Per-ray medium stacks: D slot-lists of [S,128] arrays + size.
    Functional: every op returns a new _Stack."""

    __slots__ = ("ior", "ab", "prio", "mid", "size")

    def __init__(self, ior, ab, prio, mid, size):
        self.ior = ior      # list[D] of [S,128] f32
        self.ab = ab        # list[D] of 3-tuples of [S,128] f32
        self.prio = prio    # list[D] of [S,128] i32
        self.mid = mid      # list[D] of [S,128] i32
        self.size = size    # [S,128] i32

    @property
    def depth(self):
        return len(self.ior)

    @staticmethod
    def create(shape, depth=STACK_DEPTH):
        f0 = jnp.zeros(shape, jnp.float32)
        return _Stack(
            ior=[jnp.ones(shape, jnp.float32)] * depth,
            ab=[(f0, f0, f0)] * depth,
            prio=[jnp.full(shape, _EMPTY_PRIO)] * depth,
            mid=[jnp.full(shape, _NO_MEDIUM)] * depth,
            size=jnp.zeros(shape, jnp.int32),
        )

    def top(self):
        """(ior, (ab_r, ab_g, ab_b), prio, mid) of the top slot, or the
        empty medium (get_top_ray_medium, compute:647-654)."""
        shape = self.size.shape
        idx = jnp.maximum(self.size - 1, 0)
        ior = jnp.ones(shape, jnp.float32)
        ab = [jnp.zeros(shape, jnp.float32) for _ in range(3)]
        prio = jnp.full(shape, _EMPTY_PRIO)
        mid = jnp.full(shape, _NO_MEDIUM)
        nonempty = self.size > 0
        for s in range(self.depth):
            sel = nonempty & (idx == s)
            ior = jnp.where(sel, self.ior[s], ior)
            prio = jnp.where(sel, self.prio[s], prio)
            mid = jnp.where(sel, self.mid[s], mid)
            for c in range(3):
                ab[c] = jnp.where(sel, self.ab[s][c], ab[c])
        return ior, tuple(ab), prio, mid

    def is_true_hit(self, priority):
        """Priority rule (determine_true_medium_hit, compute:656-665)."""
        _, _, top_prio, _ = self.top()
        return (self.size == 0) | (priority <= top_prio)

    def push(self, med, mask):
        """Sorted insertion where `mask` (add_to_medium_stack,
        compute:582-622); full stacks drop the push."""
        m_ior, m_ab, m_prio, m_mid = med
        _, _, top_prio, _ = self.top()
        idx_sorted = jnp.zeros_like(self.size)
        for s in range(self.depth):
            gt = (s < self.size) & (self.prio[s] > m_prio)
            idx_sorted = idx_sorted + gt.astype(jnp.int32)
        at_top = m_prio <= top_prio
        idx = jnp.where(at_top, self.size, idx_sorted)
        can = mask & (self.size < self.depth)

        def place(slots, val, tup=False):
            out = []
            for s in range(self.depth):
                src = slots[s - 1]  # s=0 wraps like jnp.roll; overwritten
                up = can & (s >= idx)
                wr = can & (s == idx)
                if tup:
                    out.append(tuple(
                        jnp.where(wr, val[c],
                                  jnp.where(up, src[c], slots[s][c]))
                        for c in range(3)))
                else:
                    out.append(jnp.where(wr, val,
                                         jnp.where(up, src, slots[s])))
            return out

        return _Stack(
            ior=place(self.ior, m_ior),
            ab=place(self.ab, m_ab, tup=True),
            prio=place(self.prio, m_prio),
            mid=place(self.mid, m_mid),
            size=self.size + can.astype(jnp.int32),
        )

    def pop_id(self, material_id, mask):
        """Remove the bottom-most entry matching material_id where `mask`
        (pop_from_medium_stack, compute:627-642). Missing ID = no-op."""
        first = jnp.full_like(self.size, self.depth)
        found = jnp.zeros(self.size.shape, bool)
        for s in reversed(range(self.depth)):
            m = (s < self.size) & (self.mid[s] == material_id)
            first = jnp.where(m, s, first)
            found = found | m
        do = mask & found

        def remove(slots, fill, tup=False):
            out = []
            for s in range(self.depth):
                src = slots[(s + 1) % self.depth]
                down = do & (s >= first)
                dead = do & (s == self.size - 1)
                if tup:
                    out.append(tuple(
                        jnp.where(dead, fill[c],
                                  jnp.where(down, src[c], slots[s][c]))
                        for c in range(3)))
                else:
                    out.append(jnp.where(dead, fill,
                                         jnp.where(down, src, slots[s])))
            return out

        z = np.float32(0.0)
        return _Stack(
            ior=remove(self.ior, np.float32(1.0)),
            ab=remove(self.ab, (z, z, z), tup=True),
            prio=remove(self.prio, _EMPTY_PRIO),
            mid=remove(self.mid, _NO_MEDIUM),
            size=self.size - do.astype(jnp.int32),
        )


def _sel_medium(cond, a, b):
    """Select between two (ior, ab3, prio, mid) media per lane."""
    return (
        jnp.where(cond, a[0], b[0]),
        tuple(jnp.where(cond, a[1][c], b[1][c]) for c in range(3)),
        jnp.where(cond, a[2], b[2]),
        jnp.where(cond, a[3], b[3]),
    )


# ---------------------------------------------------------------------------
# Kernel body
# ---------------------------------------------------------------------------

def _make_traversal(treelet_k: int):
    """In-kernel skip-link treelet traversal (kernels/treelet_bvh.py
    semantics, proven bit-exact on hardware) for the fused bounce loop:
    the whole treelet table set stays VMEM-resident (v5e has ~128 MB of
    VMEM; K*112 KB for nodes+tris+shade), each ray walks its own
    skip-link pointer, and the block serializes only on the monotone
    treelet schedule. Returns a `tri_intersect(refs, o, d, inv_d, seed)`
    closure producing the same winner tuple as the brute unrolled loop.

    Reference: the HLSL megakernel traverses its BVH inside the same
    kernel that shades (HalgoenCompute.compute:876-950 calling :378-472
    per bounce); this is that design under TPU constraints (no per-lane
    stack -> skip links; 128-lane gather range -> treelet tiles)."""
    from halogen_tpu.kernels.treelet_bvh import T_NODES

    end_id = treelet_k * T_NODES

    def tri_intersect(nodes_ref, tris_ref, shade_ref, o, d, inv_d, seed):
        i32 = jnp.int32
        zf = o[0] * 0.0  # data-derived zeros: Mosaic while-carry layouts
        zi = zf.astype(i32)
        state = (
            jnp.int32(0),   # safety iteration counter
            zi,             # node (padded id; root = 0)
            zi,             # trem: tris remaining at current leaf
            zi,             # tcur: current local tri slot
            seed,           # best_t (pruned by sphere hit / far)
            zf - 1.0,       # winner global tri id
            zf,             # u
            zf,             # v
            zf + 1.0,       # sign
            zi - 1,         # winner treelet id
            zi,             # winner local tri slot
        )

        def cond(c):
            return jnp.any(c[1] < end_id) & (c[0] < 2 * end_id + 16)

        def body(c):
            (it, node, trem, tcur, best_t, wtri, wu, wv, ws, wk,
             wslot) = c
            alive = node < end_id
            t_id = jnp.right_shift(node, 7)
            cur = jnp.min(jnp.where(alive, t_id, treelet_k)).astype(i32)
            in_cur = alive & (t_id == cur)
            local = jnp.bitwise_and(node, T_NODES - 1)

            def g8(ref, f, idx):
                return jnp.take_along_axis(ref[cur, f], idx, axis=1)

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

            # slab test (ray_AABB_test, compute:244-259)
            t1x, t2x = (lo_x - o[0]) * inv_d[0], (hi_x - o[0]) * inv_d[0]
            t1y, t2y = (lo_y - o[1]) * inv_d[1], (hi_y - o[1]) * inv_d[1]
            t1z, t2z = (lo_z - o[2]) * inv_d[2], (hi_z - o[2]) * inv_d[2]
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                           jnp.minimum(t1y, t2y)),
                               jnp.minimum(t1z, t2z))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                           jnp.maximum(t1y, t2y)),
                               jnp.maximum(t1z, t2z))
            hitbox = ((tmax > jnp.maximum(0.0, tmin))
                      & (jnp.maximum(tmin, 0.0) < best_t))
            enter_leaf = node_phase & hitbox & is_leaf

            # triangle test for leaf-phase rays (Moller-Trumbore,
            # compute:307-355)
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
            px = d[1] * e2z - d[2] * e2y
            py = d[2] * e2x - d[0] * e2z
            pz = d[0] * e2y - d[1] * e2x
            det = px * e1x + py * e1y + pz * e1z
            parallel = jnp.abs(det) < _DET_EPS
            inv_det = 1.0 / jnp.where(parallel, np.float32(1.0), det)
            tvx, tvy, tvz = o[0] - v0x, o[1] - v0y, o[2] - v0z
            uu = (tvx * px + tvy * py + tvz * pz) * inv_det
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            vv = (d[0] * qx + d[1] * qy + d[2] * qz) * inv_det
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
            wk = jnp.where(valid, cur, wk)
            wslot = jnp.where(valid, tcur, wslot)

            trem_n = jnp.where(enter_leaf, count,
                               jnp.where(leaf_phase, trem - 1, trem))
            tcur_n = jnp.where(enter_leaf, tstart,
                               jnp.where(leaf_phase, tcur + 1, tcur))
            node_n = jnp.where(
                node_phase & hitbox & (~is_leaf), child,
                jnp.where(node_phase & (~hitbox), skip,
                          jnp.where(leaf_phase & (trem_n == 0), skip,
                                    node)))
            return (it + 1, node_n, trem_n, tcur_n, best_t, wtri, wu, wv,
                    ws, wk, wslot)

        (_, _, _, _, best_t, wtri, wu, wv, ws, wk, wslot) = (
            jax.lax.while_loop(cond, body, state))

        # Winner post-pass: one masked 10-field gather round per treelet
        # fetches the winner's shading payload (n0, n1-n0, n2-n0, mat)
        # at its recorded slot — O(K) gathers per bounce instead of 10
        # extra gathers on every traversal step.
        def fetch(k, acc):
            sel = wk == k
            out = []
            for f in range(10):
                v = jnp.take_along_axis(shade_ref[k, f], wslot, axis=1)
                out.append(jnp.where(sel, v, acc[f]))
            return tuple(out)

        sh = jax.lax.fori_loop(0, treelet_k, fetch, (zf,) * 10)
        (n0x, n0y, n0z, d1x, d1y, d1z, d2x, d2y, d2z, matf) = sh
        miss = wtri < 0.0
        tr_t = jnp.where(miss, _INF, best_t)
        tr_nx = n0x + d1x * wu + d2x * wv
        tr_ny = n0y + d1y * wu + d2y * wv
        tr_nz = n0z + d1z * wu + d2z * wv
        return tr_t, ws, tr_nx, tr_ny, tr_nz, matf

    return tri_intersect


def _make_raylet_traversal(raylet_f: int, tile: int):
    """In-kernel per-ray worklist traversal (kernels/raylet.py design)
    for the fused bounce loop, in row granules: each 128-lane sublane
    row of the ray block runs its own nearest-first worklist rounds —
    every ray pops the argmin flatlet of its OWN emin column, and the
    popped tiles (triangle geometry; the winner's shading payload once
    per row) are fetched with transposed one-hot matmuls from the
    bf16x3 pre-split tables (raylet._split_bf16x3: three single-pass
    bf16 MXU matmuls recombining the f32 values exactly — measured
    ~680x faster per round than the f32 Precision.HIGHEST matmul they
    replace). Cost scales with per-ray candidate counts (~2.5 on
    glass_dragon, scripts/traversal_diag.py), not block unions (~100)
    — the measured failure mode of the in-kernel treelet tier
    (perf_glass_dragon_fusedtrav 0.33 Mrays/s).

    Between bounces the caller compacts live rays into dense leading
    rows (see the `compact` path below): at deep bounces survivors
    scatter 1-4 per 128-ray row, and an uncompacted row pays a full
    worklist round (~2k cycles) for those 1-4 rays — the measured
    reason glass_dragon sat at 3.6 Mrays/s (VERDICT r4).

    Reference: the HLSL megakernel traverses inside the shading kernel
    (HalgoenCompute.compute:876-950 -> :378-472); this is that design
    with the traversal reformulated as dense worklist rounds."""
    F = raylet_f
    TILE = tile
    i32 = jnp.int32
    f32 = jnp.float32
    BIGF = np.float32(3e38)
    GR = 9 * tile    # geometry rows per bf16 plane
    SR = 10 * tile   # shade rows per bf16 plane

    def tri_intersect(boxesT_ref, gtab_ref, stab_ref, o, d, inv_d,
                      seed, rays_ref, comp_ref, res_ref, os_ref,
                      cmeta_ref, want_shade=True, any_hit_far=None):
        S = o[0].shape[0]
        iota_fl = jax.lax.broadcasted_iota(i32, (F, LANES), 0)
        iota_s8 = jax.lax.broadcasted_iota(i32, (8, LANES), 0)
        iota_sl128 = jax.lax.broadcasted_iota(i32, (LANES, LANES), 0)
        iota_lane = jax.lax.broadcasted_iota(i32, (1, LANES), 1)
        bf16 = jnp.bfloat16

        def oh_fetch(tab_ref, rows, ohT):
            # bf16x3 one-hot gather: tab columns selected per lane,
            # exact f32 reconstruction (hi+mid+lo accumulate in f32).
            out = jax.lax.dot_general(
                tab_ref[0:rows], ohT, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            for p in (1, 2):
                out = out + jax.lax.dot_general(
                    tab_ref[p * rows:(p + 1) * rows], ohT,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
            return out

        def split3(x):
            # in-kernel bf16x3 split (exact in normal range): the
            # matmul-side counterpart of raylet._split_bf16x3
            hi = x.astype(bf16)
            r1 = x - hi.astype(f32)
            mid = r1.astype(bf16)
            lo = (r1 - mid.astype(f32)).astype(bf16)
            return hi, mid, lo

        def permute3(x, p, dims):
            # exact f32 permutation x @ p via bf16x3 (p is a 0/1
            # selection matrix, exact in bf16)
            out = None
            for part in split3(x):
                t = jax.lax.dot_general(part, p, (dims, ((), ())),
                                        preferred_element_type=f32)
                out = t if out is None else out + t
            return out

        # Stage the per-ray fields in VMEM so each row granule can take
        # a free dynamic sublane slice (Mosaic has no dynamic_slice on
        # values, only on refs). Layout [S, 16, 128]: one dynamic-row
        # read yields all 10 fields of a 128-ray row at once (the
        # compaction matmuls need them as a single [10, 128] operand).
        for j, v in enumerate((*o, *d, *inv_d, seed)):
            rays_ref[:, j:j + 1, :] = v[:, None, :]

        # ------------------------------------------------------------
        # Live-ray compaction ranks (VERDICT r4 item 1): flattened
        # row-major rank of every live ray, computed with two exact
        # one-hot-ish matmuls (prefix sums ride the MXU; counts <= 4096
        # are exact in the f32 accumulator, operands exact in bf16).
        # ------------------------------------------------------------
        live = seed > 0.0                      # [S, 128]
        live_f = live.astype(f32)
        su128 = (jax.lax.broadcasted_iota(i32, (LANES, LANES), 0)
                 < jax.lax.broadcasted_iota(i32, (LANES, LANES), 1)
                 ).astype(bf16)
        ex = jax.lax.dot_general(                      # within-row excl
            live.astype(bf16), su128, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                # [S, 128]
        rowsum = jnp.sum(live_f, axis=1, keepdims=True)     # [S, 1]
        rowsum_b = jnp.broadcast_to(rowsum, (S, LANES))
        slS = (jax.lax.broadcasted_iota(i32, (S, S), 0)
               > jax.lax.broadcasted_iota(i32, (S, S), 1)).astype(bf16)
        base = jax.lax.dot_general(                    # cross-row excl
            slS, rowsum_b.astype(bf16), (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                # [S, 128]
        rank = base + ex
        n_live = jnp.sum(live_f)
        rows_live = jnp.sum(jnp.max(live_f, axis=1, keepdims=True))
        dense_rows = jnp.ceil(n_live * np.float32(1.0 / LANES))
        # compact only when it saves at least ~2 full rows of worklist
        # work (the compaction loops themselves cost a few hundred
        # cycles per live source row)
        do_compact = rows_live > dense_rows + 1.0
        cmeta_ref[0] = rank
        cmeta_ref[1] = live_f
        cmeta_ref[2] = base
        cmeta_ref[3] = rowsum_b

        def row_loop(src_ref, dst_ref):
            jax.lax.fori_loop(0, S, lambda r, c: row(r, c, src_ref,
                                                     dst_ref), 0)

        def row(r, acc, src_ref, dst_ref):  # noqa: C901
            blk = jnp.reshape(src_ref[pl.ds(r, 1)], (16, LANES))

            def rs(j):
                return blk[j:j + 1, :]  # (1, 128)

            ox, oy, oz = rs(0), rs(1), rs(2)
            dx, dy, dz = rs(3), rs(4), rs(5)
            ix, iy, iz = rs(6), rs(7), rs(8)
            rseed = rs(9)

            def live_row(_):
                # ---- dense box pass: (F boxes, 128 rays) in one shot
                # (slab test, compute:244-259; boxes on sublanes)
                def bx(c):
                    return boxesT_ref[c]  # (F, 1)

                t1x, t2x = (bx(0) - ox) * ix, (bx(3) - ox) * ix
                t1y, t2y = (bx(1) - oy) * iy, (bx(4) - oy) * iy
                t1z, t2z = (bx(2) - oz) * iz, (bx(5) - oz) * iz
                tmin = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1x, t2x),
                                jnp.minimum(t1y, t2y)),
                    jnp.minimum(t1z, t2z))
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1x, t2x),
                                jnp.maximum(t1y, t2y)),
                    jnp.maximum(t1z, t2z))
                ent = jnp.maximum(tmin, 0.0)
                hit = (tmax > jnp.maximum(0.0, tmin)) & (ent < rseed)
                emin = jnp.where(hit, ent, BIGF)  # (F, 128)

                # ---- per-ray nearest-first rounds with per-(slot
                # sublane, ray) running winner payload, reduced once
                # after the loop. Geometry-only matmul per round; the
                # winner's shading payload is fetched once at the end.
                z8 = jnp.zeros((8, LANES), f32)
                carry0 = (
                    emin,
                    jnp.broadcast_to(rseed, (8, LANES)),  # pt8 best t
                    z8,                                   # u
                    z8,                                   # v
                    z8 + 1.0,                             # sign
                    z8,                                   # slot
                    z8 - 1.0,                             # flatlet id
                    rseed,                                # btr (1,128)
                )

                def w_cond(c):
                    m = jnp.min(c[0], axis=0, keepdims=True)
                    return jnp.any((m < BIGF) & (m < c[7]))

                def w_body(c):
                    emin, pt8, pu8, pv8, ps8, pl8, pf8, btr = c
                    colmin = jnp.min(emin, axis=0, keepdims=True)
                    pop = jnp.min(
                        jnp.where(emin <= colmin, iota_fl, F + 1),
                        axis=0, keepdims=True)  # (1,128)
                    live = (colmin < BIGF) & (colmin < btr)
                    # dead columns select no flatlet: fold the mask
                    # into the popped id so the one-hot stays a pure
                    # iota equality
                    pop = jnp.where(live, pop, F + 1)
                    ohT = (iota_fl == pop).astype(jnp.bfloat16)
                    comp = oh_fetch(gtab_ref, GR, ohT)
                    popf = pop.astype(f32)
                    for ci in range(TILE // 8):
                        def cc(j):
                            base = j * TILE + ci * 8
                            return comp[base:base + 8, :]

                        v0x, v0y, v0z = cc(0), cc(1), cc(2)
                        e1x, e1y, e1z = cc(3), cc(4), cc(5)
                        e2x, e2y, e2z = cc(6), cc(7), cc(8)
                        # Moller-Trumbore (compute:307-355): 8 triangle
                        # slots on sublanes x 128 rays on lanes
                        px = dy * e2z - dz * e2y
                        py = dz * e2x - dx * e2z
                        pz = dx * e2y - dy * e2x
                        det = px * e1x + py * e1y + pz * e1z
                        parallel = jnp.abs(det) < _DET_EPS
                        inv_det = 1.0 / jnp.where(parallel,
                                                  np.float32(1.0), det)
                        tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
                        uu = (tvx * px + tvy * py + tvz * pz) * inv_det
                        qx = tvy * e1z - tvz * e1y
                        qy = tvz * e1x - tvx * e1z
                        qz = tvx * e1y - tvy * e1x
                        vv = (dx * qx + dy * qy + dz * qz) * inv_det
                        th = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                        valid = (
                            (~parallel) & (uu >= 0.0) & (uu <= 1.0)
                            & (vv >= 0.0) & (uu + vv <= 1.0)
                            & (th > 0.0) & (th < pt8)
                        )
                        pt8 = jnp.where(valid, th, pt8)
                        pu8 = jnp.where(valid, uu, pu8)
                        pv8 = jnp.where(valid, vv, pv8)
                        ps8 = jnp.where(
                            valid, jnp.where(det >= 0.0, 1.0, -1.0), ps8)
                        pl8 = jnp.where(
                            valid, (iota_s8 + ci * 8).astype(f32), pl8)
                        pf8 = jnp.where(valid, popf, pf8)
                    btr = jnp.minimum(
                        btr, jnp.min(pt8, axis=0, keepdims=True))
                    emin = jnp.where(iota_fl == pop, BIGF, emin)
                    if any_hit_far is not None:
                        # occlusion query: a ray with any hit inside
                        # far is done — drop its remaining worklist
                        emin = jnp.where(btr < any_hit_far, BIGF, emin)
                    return (emin, pt8, pu8, pv8, ps8, pl8, pf8, btr)

                (_, pt8, pu8, pv8, ps8, pl8, pf8, _) = jax.lax.while_loop(
                    w_cond, w_body, carry0)

                # ---- winner reduction across the 8 slot sublanes
                # (first slot achieving the min t wins; within a
                # flatlet the slot order is the triangle order, and
                # flatlets are popped nearest-first, matching the
                # sequential first-min rule)
                t_row = jnp.min(pt8, axis=0, keepdims=True)  # (1,128)
                ws8 = jnp.min(
                    jnp.where(pt8 <= t_row, iota_s8, 8),
                    axis=0, keepdims=True)
                wsel = iota_s8 == ws8

                def pick(a):
                    return jnp.sum(jnp.where(wsel, a, 0.0), axis=0,
                                   keepdims=True)

                wu, wv, wsn = pick(pu8), pick(pv8), pick(ps8)
                wslot, wf = pick(pl8), pick(pf8)
                miss = wf < 0.0

                # ---- winner shade fetch: one bf16x3 gather for the
                # winner flatlet's shade tile, then a slot select across
                # its 128 sublane rows (fields n0 | n1-n0 | n2-n0 | mat).
                # Occlusion queries (want_shade=False) only need t.
                if want_shade:
                    ohw = (iota_fl == jnp.where(
                        miss, F + 1, wslot * 0.0 + wf).astype(i32)
                    ).astype(jnp.bfloat16)
                    shcomp = oh_fetch(stab_ref, SR, ohw)
                    ssel = (jax.lax.broadcasted_iota(
                        i32, (TILE, LANES), 0) == wslot.astype(i32))

                    def slot_val(j):
                        blk = shcomp[j * TILE:(j + 1) * TILE, :]
                        return jnp.sum(jnp.where(ssel, blk, 0.0),
                                       axis=0, keepdims=True)

                    nx = slot_val(0) + slot_val(3) * wu + slot_val(6) * wv
                    ny = slot_val(1) + slot_val(4) * wu + slot_val(7) * wv
                    nz = slot_val(2) + slot_val(5) * wu + slot_val(8) * wv
                    wm = slot_val(9)
                else:
                    z1 = jnp.zeros((1, LANES), f32)
                    nx, ny, nz, wm = z1, z1, z1, z1
                # miss marker is BIGF, not +inf: the compacted results
                # travel through a bf16x3 scatter matmul and inf splits
                # to inf + nan; BIGF (3e38) splits exactly and is
                # converted back to +inf once at the end.
                return (jnp.where(miss, BIGF, t_row), wsn,
                        nx, ny, nz, jnp.where(miss, 0.0, wm))

            def dead_row(_):
                one = jnp.ones((1, LANES), f32)
                return (one * BIGF, one, one * 0.0, one * 0.0,
                        one * 0.0, one * 0.0)

            outs = jax.lax.cond(
                jnp.any(rseed > 0.0), live_row, dead_row, 0)
            for j, val in enumerate(outs):
                dst_ref[pl.ds(r, 1), j:j + 1, :] = val[:, None, :]
            return acc

        # Default outputs (compact path only scatters live lanes back)
        os_ref[:, 0:1, :] = jnp.full((S, 1, LANES), BIGF)   # t: miss
        os_ref[:, 1:2, :] = jnp.ones((S, 1, LANES), f32)    # sign
        os_ref[:, 2:8, :] = jnp.zeros((S, 6, LANES), f32)   # n, mat

        @pl.when(jnp.logical_not(do_compact))
        def _direct():
            row_loop(rays_ref, os_ref)

        @pl.when(do_compact)
        def _compact():
            # ---- forward scatter: place each source row's live rays at
            # their absolute compacted lanes via one exact one-hot
            # matmul per row; a live row's ranks are consecutive, so its
            # rays land in at most two destination rows (RMW-masked).
            comp_ref[:, 0:3, :] = jnp.zeros((S, 3, LANES), f32)   # o
            comp_ref[:, 3:9, :] = jnp.ones((S, 6, LANES), f32)    # d, inv
            comp_ref[:, 9:10, :] = jnp.full((S, 1, LANES), -1.0)  # seed

            def fwd(s, c):
                n_s = jnp.max(cmeta_ref[3, pl.ds(s, 1), :]).astype(i32)

                @pl.when(n_s > 0)
                def _():
                    rank_i = cmeta_ref[0, pl.ds(s, 1), :].astype(i32)
                    live_row = cmeta_ref[1, pl.ds(s, 1), :] > 0.0
                    base_s = jnp.max(
                        cmeta_ref[2, pl.ds(s, 1), :]).astype(i32)
                    al = jnp.bitwise_and(rank_i, LANES - 1)
                    p2t = ((iota_sl128 == al) & live_row).astype(bf16)
                    x = jnp.reshape(rays_ref[pl.ds(s, 1)],
                                    (16, LANES))[0:10]
                    y = permute3(x, p2t, ((1,), (1,)))  # [10,128] at al
                    off = jnp.bitwise_and(base_s, LANES - 1)
                    r0 = jnp.right_shift(base_s, 7)
                    m0 = ((iota_lane >= off)
                          & (iota_lane < off + n_s))[:, None, :]
                    cur0 = comp_ref[pl.ds(r0, 1), 0:10, :]
                    comp_ref[pl.ds(r0, 1), 0:10, :] = jnp.where(
                        jnp.broadcast_to(m0, (1, 10, LANES)),
                        y[None], cur0)

                    @pl.when(off + n_s > LANES)
                    def _():
                        m1 = (iota_lane < off + n_s - LANES)[:, None, :]
                        cur1 = comp_ref[pl.ds(r0 + 1, 1), 0:10, :]
                        comp_ref[pl.ds(r0 + 1, 1), 0:10, :] = jnp.where(
                            jnp.broadcast_to(m1, (1, 10, LANES)),
                            y[None], cur1)
                return c

            jax.lax.fori_loop(0, S, fwd, 0)
            row_loop(comp_ref, res_ref)

            # ---- backward gather: each source row reads its (at most
            # two) destination result rows and un-permutes them with the
            # transposed selection matmuls; dead lanes keep os defaults.
            def bwd(s, c):
                n_s = jnp.max(cmeta_ref[3, pl.ds(s, 1), :]).astype(i32)

                @pl.when(n_s > 0)
                def _():
                    rank_i = cmeta_ref[0, pl.ds(s, 1), :].astype(i32)
                    live_row = cmeta_ref[1, pl.ds(s, 1), :] > 0.0
                    base_s = jnp.max(
                        cmeta_ref[2, pl.ds(s, 1), :]).astype(i32)
                    al = jnp.bitwise_and(rank_i, LANES - 1)
                    r0 = jnp.right_shift(base_s, 7)
                    in_r0 = jnp.right_shift(rank_i, 7) == r0
                    a0 = ((iota_sl128 == al) & live_row
                          & in_r0).astype(bf16)
                    a1 = ((iota_sl128 == al) & live_row
                          & jnp.logical_not(in_r0)).astype(bf16)
                    y0 = jnp.reshape(res_ref[pl.ds(r0, 1)],
                                     (8, LANES))[0:6]
                    r1 = jnp.minimum(r0 + 1, S - 1)
                    y1 = jnp.reshape(res_ref[pl.ds(r1, 1)],
                                     (8, LANES))[0:6]
                    xb = (permute3(y0, a0, ((1,), (0,)))
                          + permute3(y1, a1, ((1,), (0,))))  # [6,128]
                    lm = jnp.broadcast_to(live_row[:, None, :],
                                          (1, 6, LANES))
                    cur = os_ref[pl.ds(s, 1), 0:6, :]
                    os_ref[pl.ds(s, 1), 0:6, :] = jnp.where(
                        lm, xb[None], cur)
                return c

            jax.lax.fori_loop(0, S, bwd, 0)

        def out(j):
            return jnp.reshape(os_ref[:, j:j + 1, :], (S, LANES))

        tr_t = out(0)
        tr_t = jnp.where(tr_t >= BIGF, _INF, tr_t)
        return (tr_t, out(1), out(2), out(3), out(4), out(5))

    return tri_intersect


def _glossy_pdf_c(wx, wy, wz, mx, my, mz, a1, nx, ny, nz):
    """Component-tuple port of core.math.procedural_glossy_pdf (the
    closed-form solid-angle density of the reference's procedural glossy
    lobe) for the in-kernel NEE/MIS weights."""
    eps = np.float32(1e-6)
    b = (1.0 - a1) * (wx * mx + wy * my + wz * mz)
    c = (1.0 - a1) * (1.0 - a1) - a1 * a1
    disc = b * b - c
    exists = (a1 > eps) & (disc >= 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.maximum(a1, eps)
    total = jnp.zeros_like(b)
    for t in (b - sq, b + sq):
        valid = exists & (t > eps)
        ts = jnp.where(valid, t, np.float32(1.0))
        ddx = (wx * ts - (1.0 - a_safe) * mx) / a_safe
        ddy = (wy * ts - (1.0 - a_safe) * my) / a_safe
        ddz = (wz * ts - (1.0 - a_safe) * mz) / a_safe
        cos_dd = jnp.maximum(ddx * nx + ddy * ny + ddz * nz, 0.0)
        dens = (cos_dd * np.float32(1.0 / np.pi) * ts * ts
                / (a_safe * a_safe
                   * jnp.maximum(jnp.abs(wx * ddx + wy * ddy + wz * ddz),
                                 eps)))
        total = total + jnp.where(valid, dens, 0.0)
    return total


def _make_kernel(settings: RenderSettings, num_tris: int, num_spheres: int,
                 num_materials: int, any_transmissive: bool,
                 stack_depth: int = STACK_DEPTH,
                 treelet_k: int | None = None,
                 raylet_f: int | None = None,
                 env_nee: bool = False):
    """Build the fused path-trace kernel body for static scene sizes.

    treelet_k=None/raylet_f=None compiles the brute-force unrolled
    triangle loop (<=MAX_TRIS scenes, tables in SMEM); treelet_k=K the
    in-kernel skip-link traversal over K VMEM-resident treelets;
    raylet_f=F the in-kernel per-ray worklist traversal over F
    VMEM-resident flatlet tiles (the big-scene default — see
    _make_raylet_traversal)."""
    sobol = settings.sampler == SamplerKind.SOBOL
    max_bounces = settings.max_bounces
    lim_d = settings.max_diffuse_bounces
    lim_g = settings.max_glossy_bounces
    lim_t = settings.max_transmission_bounces
    use_rr = settings.russian_roulette

    from halogen_tpu.sampler import sobol as sob

    def s2(index, dim, seed):
        return (_sobol_2d if sobol else _prng_2d_impl)(index, dim, seed)

    def s1(index, dim, seed):
        return (_sobol_1d if sobol else _prng_1d_impl)(index, dim, seed)

    if raylet_f is not None:
        traverse = _make_raylet_traversal(*raylet_f)
    elif treelet_k is not None:
        traverse = _make_traversal(treelet_k)
    else:
        traverse = None

    def kernel(*refs):
        raylet_scratch = None
        if raylet_f is not None:
            raylet_scratch = refs[-5:]
            refs = refs[:-5]
            (far_ref, boxesT_ref, gtab_ref, stab_ref, sph_ref, mat_ref,
             *rest) = refs
            tri_ref = trin_ref = nodes_ref = tris_ref = shade_ref = None
        elif treelet_k is None:
            (far_ref, tri_ref, trin_ref, sph_ref, mat_ref, *rest) = refs
            nodes_ref = tris_ref = shade_ref = None
        else:
            (far_ref, nodes_ref, tris_ref, shade_ref, sph_ref, mat_ref,
             *rest) = refs
            tri_ref = trin_ref = None
        nee_ref = None
        if env_nee:
            nee_ref, *rest = rest
        mpc_ref = mne_ref = None
        if env_nee:
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
             sidx_ref, seed_ref,
             outr_ref, outg_ref, outb_ref,
             mar_ref, mag_ref, mab_ref, mrough_ref,
             odx_ref, ody_ref, odz_ref, mpc_ref, mne_ref) = rest
        else:
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
             sidx_ref, seed_ref,
             outr_ref, outg_ref, outb_ref,
             mar_ref, mag_ref, mab_ref, mrough_ref,
             odx_ref, ody_ref, odz_ref) = rest
        far = far_ref[0, 0]
        o = (ox_ref[:], oy_ref[:], oz_ref[:])
        d = (dx_ref[:], dy_ref[:], dz_ref[:])
        sidx = sidx_ref[:].astype(jnp.uint32)
        seed = seed_ref[:].astype(jnp.uint32)

        shape = o[0].shape
        f32 = jnp.float32
        color = [jnp.zeros(shape, f32) for _ in range(3)]
        atten = [jnp.ones(shape, f32) for _ in range(3)]
        counts = [jnp.zeros(shape, jnp.int32) for _ in range(3)]
        active = jnp.ones(shape, bool)
        acc_rough = jnp.zeros(shape, f32)
        # deferred-miss record: attenuation at the miss bounce (zero on
        # never-missed lanes), shaded outside as sample_env * matten
        matten = [jnp.zeros(shape, f32) for _ in range(3)]
        if any_transmissive:
            stack = _Stack.create(shape, stack_depth)
        else:
            stack = _Stack([], [], [], [], jnp.zeros(shape, jnp.int32))

        # The bounce loop is a fori_loop, not a Python unroll: the body
        # compiles ONCE, so Mosaic/XLA compile time is O(body) instead of
        # O(max_bounces * body) — with default bounces 12 and the
        # nested-dielectric stack in play, unrolling made compiles take
        # minutes. Runtime cost of the loop carry is nil (stays in VMEM).
        # Carry holds no bools (Mosaic's scf.for lowering rejects i1
        # vectors in iter_args): `active` travels as int32 0/1.
        def _flat(o, d, atten, color, counts, active, acc_rough, matten,
                  stack, nee4=None):
            base = (o, d, tuple(atten), tuple(color), tuple(counts),
                    active.astype(jnp.int32), acc_rough, tuple(matten))
            if env_nee:
                base += tuple(nee4)
            if any_transmissive:
                base += (tuple(stack.ior), tuple(stack.ab),
                         tuple(stack.prio), tuple(stack.mid), stack.size)
            return base

        def bounce_body(k, carry):
            (o, d, atten, color, counts, active, acc_rough,
             matten) = carry[:8]
            ci = 8
            if env_nee:
                # MIS continuation state from the PREVIOUS bounce plus
                # the deferred miss-MIS record (see trace._pool_bounce
                # prev_nee/prev_pcos and the sky_w weighting)
                prev_pcos_in, prev_nee_in, m_pcos, m_nee = carry[8:12]
                ci = 12
            active = active != 0
            atten = list(atten)
            color = list(color)
            counts = list(counts)
            matten = list(matten)
            if any_transmissive:
                st_ior, st_ab, st_prio, st_mid, st_size = carry[ci:]
                stack = _Stack(list(st_ior), list(st_ab), list(st_prio),
                               list(st_mid), st_size)
            else:
                stack = None  # unused; _flat drops it for opaque scenes
            # --- per-type termination (compute:869-871, `>` semantics)
            over = ((counts[0] > lim_d) | (counts[1] > lim_g)
                    | (counts[2] > lim_t))
            active = active & (~over)

            tiny = np.float32(1e-30)
            inv_d = tuple(
                1.0 / jnp.where(jnp.abs(c) < tiny, tiny, c) for c in d
            )

            # --- spheres: linear scan, AABB pre-test vs far, first-min
            # winner (get_ray_scene_intersection_sphere, compute:357-376)
            sp_t = jnp.full(shape, _INF)
            sp_orient = jnp.ones(shape, f32)
            sp_cx = jnp.zeros(shape, f32)
            sp_cy = jnp.zeros(shape, f32)
            sp_cz = jnp.zeros(shape, f32)
            sp_mat = jnp.zeros(shape, f32)
            for s in range(num_spheres):
                cx = sph_ref[s, 0]
                cy = sph_ref[s, 1]
                cz = sph_ref[s, 2]
                r = sph_ref[s, 3]
                m = sph_ref[s, 4]
                # slab test on the sphere AABB
                t1x = (cx - r - o[0]) * inv_d[0]
                t2x = (cx + r - o[0]) * inv_d[0]
                t1y = (cy - r - o[1]) * inv_d[1]
                t2y = (cy + r - o[1]) * inv_d[1]
                t1z = (cz - r - o[2]) * inv_d[2]
                t2z = (cz + r - o[2]) * inv_d[2]
                tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                               jnp.minimum(t1y, t2y)),
                                   jnp.minimum(t1z, t2z))
                tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                               jnp.maximum(t1y, t2y)),
                                   jnp.maximum(t1z, t2z))
                aabb_t = jnp.where(tmax > jnp.maximum(0.0, tmin), tmin, _INF)
                # quadratic (sphere_intersect_soa)
                ocx = o[0] - cx
                ocy = o[1] - cy
                ocz = o[2] - cz
                b = 2.0 * (ocx * d[0] + ocy * d[1] + ocz * d[2])
                cq = ocx * ocx + ocy * ocy + ocz * ocz - r * r
                disc = b * b - 4.0 * cq
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                t_near = (-b - sq) * 0.5
                t_far = (-b + sq) * 0.5
                inside = t_near < 0.0
                t = jnp.where(inside, t_far, t_near)
                orient = jnp.where(inside, np.float32(-1.0), np.float32(1.0))
                t = jnp.where(disc >= 0.0, t, _INF)
                t = jnp.where((aabb_t < far) & (t > _HIT_EPS), t, _INF)
                better = t < sp_t
                sp_t = jnp.where(better, t, sp_t)
                sp_orient = jnp.where(better, orient, sp_orient)
                sp_cx = jnp.where(better, cx, sp_cx)
                sp_cy = jnp.where(better, cy, sp_cy)
                sp_cz = jnp.where(better, cz, sp_cz)
                sp_mat = jnp.where(better, m, sp_mat)

            if traverse is not None:
                # --- triangles via the in-kernel traversal tier; best-t
                # is seeded with min(far, sphere hit - HIT_EPS) so the
                # walk prunes sphere-occluded space, and with -1 on dead
                # lanes so they idle out immediately.
                seed_t = jnp.minimum(
                    far, jnp.where(sp_t < _INF, sp_t - _HIT_EPS, _INF))
                seed_t = jnp.where(active, seed_t, np.float32(-1.0))
                if raylet_f is not None:
                    tr_t, tr_s, tr_nx, tr_ny, tr_nz, tr_mat = traverse(
                        boxesT_ref, gtab_ref, stab_ref, o, d, inv_d,
                        seed_t, *raylet_scratch)
                else:
                    tr_t, tr_s, tr_nx, tr_ny, tr_nz, tr_mat = traverse(
                        nodes_ref, tris_ref, shade_ref, o, d, inv_d,
                        seed_t)
                num_brute_tris = 0
            else:
                num_brute_tris = num_tris
            # --- triangles: unrolled Möller-Trumbore with inline winner
            # payload tracking (triangle_intersection_doublesided,
            # compute:307-355; winner normal interp compute:462-467)
            if traverse is None:
                tr_t = jnp.full(shape, _INF)
                tr_s = jnp.zeros(shape, f32)
                tr_nx = jnp.zeros(shape, f32)
                tr_ny = jnp.zeros(shape, f32)
                tr_nz = jnp.zeros(shape, f32)
                tr_mat = jnp.zeros(shape, f32)
            for ti in range(num_brute_tris):
                v0 = (tri_ref[ti, 0], tri_ref[ti, 1], tri_ref[ti, 2])
                e1 = (tri_ref[ti, 3], tri_ref[ti, 4], tri_ref[ti, 5])
                e2 = (tri_ref[ti, 6], tri_ref[ti, 7], tri_ref[ti, 8])
                pvec = _cross3(d, e2)
                det = _dot3(pvec, e1)
                parallel = jnp.abs(det) < _DET_EPS
                inv_det = 1.0 / jnp.where(parallel, np.float32(1.0), det)
                tvec = (o[0] - v0[0], o[1] - v0[1], o[2] - v0[2])
                u = _dot3(tvec, pvec) * inv_det
                qvec = _cross3(tvec, e1)
                v = _dot3(d, qvec) * inv_det
                t = _dot3(e2, qvec) * inv_det
                valid = ((~parallel) & (u >= 0.0) & (u <= 1.0)
                         & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0))
                ok = valid & (t > _HIT_EPS) & (t < tr_t)
                # shading normal for this triangle: n0 + d1*u + d2*v
                nx = trin_ref[ti, 0] + trin_ref[ti, 3] * u + trin_ref[ti, 6] * v
                ny = trin_ref[ti, 1] + trin_ref[ti, 4] * u + trin_ref[ti, 7] * v
                nz = trin_ref[ti, 2] + trin_ref[ti, 5] * u + trin_ref[ti, 8] * v
                tr_t = jnp.where(ok, t, tr_t)
                tr_s = jnp.where(ok, _sign(det), tr_s)
                tr_nx = jnp.where(ok, nx, tr_nx)
                tr_ny = jnp.where(ok, ny, tr_ny)
                tr_nz = jnp.where(ok, nz, tr_nz)
                tr_mat = jnp.where(ok, trin_ref[ti, 9], tr_mat)

            # --- resolve winner: mesh beats sphere by HIT_EPS and must be
            # inside far (compute:452)
            mesh_wins = (tr_t < sp_t - _HIT_EPS) & (tr_t < far)
            t = jnp.where(mesh_wins, tr_t, sp_t)
            is_hit = t < far
            t_safe = jnp.where(jnp.isfinite(t), t, 0.0)
            pos = (o[0] + d[0] * t_safe, o[1] + d[1] * t_safe,
                   o[2] + d[2] * t_safe)

            tri_n = _normalize3((tr_nx * tr_s, tr_ny * tr_s, tr_nz * tr_s))
            sph_n = _normalize3(((pos[0] - sp_cx) * sp_orient,
                                 (pos[1] - sp_cy) * sp_orient,
                                 (pos[2] - sp_cz) * sp_orient))
            normal = _where3(mesh_wins, tri_n, sph_n)
            orient = jnp.where(mesh_wins, tr_s, sp_orient)
            mat_id = jnp.where(mesh_wins, tr_mat, sp_mat)

            # --- material fetch: unrolled select over the SMEM table
            NF = 17
            mf = [jnp.zeros(shape, f32) for _ in range(NF)]
            for mi in range(num_materials):
                selm = mat_id == np.float32(mi)
                for j in range(NF):
                    mf[j] = jnp.where(selm, mat_ref[mi, j], mf[j])
            (al_r, al_g, al_b, alpha, sp_r, sp_g, sp_b, metallic,
             roughness, em_r, em_g, em_b, ior, ab_r, ab_g, ab_b,
             prio_f) = mf
            mat_i = mat_id.astype(jnp.int32)
            prio_i = prio_f.astype(jnp.int32)

            # --- emission before BRDF (compute:901-902)
            emw = active & is_hit
            color[0] = color[0] + jnp.where(emw, em_r * atten[0], 0.0)
            color[1] = color[1] + jnp.where(emw, em_g * atten[1], 0.0)
            color[2] = color[2] + jnp.where(emw, em_b * atten[2], 0.0)

            # --- sampler draws for this bounce (dims = base + 5k,
            # compute:921)
            stride = _U32(sob.BOUNCE_DIM_STRIDE) * k.astype(jnp.uint32)
            r1u, r1v = s2(sidx, _U32(sob.DIM_ROUGH_REFLECTION) + stride,
                          seed)
            p1u, p1v = s2(sidx, _U32(sob.DIM_MATERIAL_BRDF) + stride, seed)
            rr = s1(sidx, _U32(sob.DIM_RUSSIAN_ROULETTE) + stride, seed)

            shade = active & is_hit
            entering = orient > 0.0

            # --- interface tracking (evaluate_material_hit,
            # compute:743-817): general nested-dielectric path when any
            # material transmits, stack-free specialization otherwise
            # (identical outputs for opaque scenes — see
            # shade._evaluate_material_hit_opaque).
            if any_transmissive:
                internal = (ior, (ab_r, ab_g, ab_b), prio_i, mat_i)
                uses_tracking = prio_i >= 0  # compute:758
                # == where(uses_tracking, is_true_hit, True) without a
                # scalar bool constant (Mosaic rejects the i8->i1 trunc)
                true_hit = (~uses_tracking) | stack.is_true_hit(prio_i)
                top0 = stack.top()
                empty0 = stack.size == 0
                track_exit = shade & uses_tracking & (~entering)
                stack_ap = stack.pop_id(mat_i, track_exit)
                top_ap = stack_ap.top()
                cur = _sel_medium(
                    entering, top0,
                    _sel_medium(
                        uses_tracking,
                        _sel_medium(empty0, internal, top0),
                        internal))
                hitm = _sel_medium(
                    entering, internal,
                    _sel_medium(uses_tracking, top_ap, top0))
                track_enter = shade & uses_tracking & entering
                stack1 = stack_ap.push(internal, track_enter)
                cur_ior, hit_ior = cur[0], hitm[0]
            else:
                cur_ior = jnp.where(entering, np.float32(1.0), ior)
                hit_ior = jnp.where(entering, ior, np.float32(1.0))

            # uniform unit vector (HalogenRandom.hlsl:282-298)
            theta = r1u * _TWO_PI
            cos_phi = 2.0 * r1v - 1.0
            sin_phi = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_phi * cos_phi))
            rv = (sin_phi * jnp.cos(theta), sin_phi * jnp.sin(theta), cos_phi)

            # lambertian scatter (compute:491-501)
            sdir = (normal[0] + rv[0], normal[1] + rv[1], normal[2] + rv[2])
            tiny_s = _dot3(sdir, sdir) < np.float32(1e-16)
            sdir = _where3(tiny_s, normal, sdir)
            diffuse_dir = _normalize3(sdir, eps=np.float32(0.0))

            # fresnel specular probability (compute:519-540)
            r0 = (cur_ior - hit_ior) / (cur_ior + hit_ior)
            r0 = r0 * r0
            cos_x = -(normal[0] * d[0] + normal[1] * d[1] + normal[2] * d[2])
            nr = cur_ior / hit_ior
            sin_t2 = nr * nr * (1.0 - cos_x * cos_x)
            exiting = cur_ior > hit_ior
            tir = exiting & (sin_t2 > 1.0)
            cos_x = jnp.where(exiting,
                              jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t2)), cos_x)
            xs = 1.0 - cos_x
            fres = r0 + (1.0 - r0) * xs * xs * xs * xs * xs
            schlick = metallic + (1.0 - metallic) * fres
            schlick = jnp.where(tir, np.float32(1.0), schlick)
            spec_prob = jnp.where(metallic > 0.0, schlick, metallic)
            do_spec = p1v < spec_prob

            # reflect + roughness^2 lerp toward diffuse (compute:691-704)
            r2 = roughness * roughness
            dn = _dot3(d, normal)
            refl = (d[0] - 2.0 * dn * normal[0], d[1] - 2.0 * dn * normal[1],
                    d[2] - 2.0 * dn * normal[2])
            spec_dir = (refl[0] + (diffuse_dir[0] - refl[0]) * r2,
                        refl[1] + (diffuse_dir[1] - refl[1]) * r2,
                        refl[2] + (diffuse_dir[2] - refl[2]) * r2)
            refl_dir = _where3(do_spec, spec_dir, diffuse_dir)
            refl_at = _where3(do_spec, (sp_r, sp_g, sp_b), (al_r, al_g, al_b))
            refl_org = (pos[0] + normal[0] * _OFFSET_EPS,
                        pos[1] + normal[1] * _OFFSET_EPS,
                        pos[2] + normal[2] * _OFFSET_EPS)

            if any_transmissive:
                # --- refraction branch (material_BRDF, compute:711-734)
                do_refr = p1u > alpha
                cos_t = jnp.minimum(-dn, np.float32(1.0))
                sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
                eta = cur_ior / hit_ior
                tir_r = eta * sin_t > 1.0
                rp = (eta * (d[0] + cos_t * normal[0]),
                      eta * (d[1] + cos_t * normal[1]),
                      eta * (d[2] + cos_t * normal[2]))
                par = -jnp.sqrt(jnp.abs(1.0 - _dot3(rp, rp)))
                refr = (rp[0] + par * normal[0], rp[1] + par * normal[1],
                        rp[2] + par * normal[2])
                refr = _where3(tir_r, refl, refr)
                flip_n = _where3(tir_r, normal,
                                 (-normal[0], -normal[1], -normal[2]))
                sdir_r = (flip_n[0] + rv[0], flip_n[1] + rv[1],
                          flip_n[2] + rv[2])
                tiny_r = _dot3(sdir_r, sdir_r) < np.float32(1e-16)
                sdir_r = _where3(tiny_r, flip_n, sdir_r)
                diff_refr = _normalize3(sdir_r, eps=np.float32(0.0))
                refr_dir = (refr[0] + (diff_refr[0] - refr[0]) * r2,
                            refr[1] + (diff_refr[1] - refr[1]) * r2,
                            refr[2] + (diff_refr[2] - refr[2]) * r2)
                refr_org = (pos[0] - normal[0] * _OFFSET_EPS,
                            pos[1] - normal[1] * _OFFSET_EPS,
                            pos[2] - normal[2] * _OFFSET_EPS)
                one = np.float32(1.0)
                new_dir = _normalize3(_where3(do_refr, refr_dir, refl_dir),
                                      eps=np.float32(1e-20))
                new_org = _where3(do_refr, refr_org, refl_org)
                sc_at = _where3(do_refr, (jnp.full(shape, one),) * 3,
                                refl_at)
                bounce_type = jnp.where(do_refr, 2,
                                        jnp.where(do_spec, 1, 0))

                # false hit: pass through behind the surface, counts as
                # transmissive (compute:803-808)
                is_true = shade & true_hit
                new_org = _where3(is_true, new_org, refr_org)
                new_dir = _where3(is_true, new_dir, d)
                sc_at = _where3(is_true, sc_at, (jnp.full(shape, one),) * 3)
                bounce_type = jnp.where(is_true, bounce_type, 2)

                # bandaid pop (compute:799-802)
                bandaid = is_true & entering & (bounce_type != 2)
                stack = stack1.pop_id(mat_i, bandaid)

                # Beer-Lambert through the current medium (compute:810-813)
                absorbing = shade & (cur[3] != _NO_MEDIUM)
                sc_at = tuple(
                    jnp.where(absorbing,
                              sc_at[c] * jnp.exp(-cur[1][c] * t_safe),
                              sc_at[c])
                    for c in range(3))
            else:
                new_dir = _normalize3(refl_dir)
                new_org = refl_org
                sc_at = refl_at
                bounce_type = jnp.where(do_spec, 1, 0)  # opaque: never 2
                # Beer-Lambert on exiting lanes (compute:810-813)
                exit_m = shade & (~entering)
                sc_at = tuple(
                    jnp.where(exit_m,
                              sc_at[c] * jnp.exp(
                                  -(ab_r, ab_g, ab_b)[c] * t_safe),
                              sc_at[c])
                    for c in range(3))

            if env_nee:
                # --- environment-map next-event estimation + MIS,
                # op-for-op with trace._pool_bounce's use_nee block. The
                # (ldir, lpdf, radiance) draws are PRECOMPUTED outside
                # the kernel (same stateless sampler stream, dims
                # DIM_ENV_NEE_BASE + 5k) because the luminance-CDF
                # inversion and texel fetches are gather-shaped; the
                # kernel does the shadow ray, the closed-form pdfs and
                # the balance heuristic — all dense.
                ldx = nee_ref[0, k]
                ldy = nee_ref[1, k]
                ldz = nee_ref[2, k]
                lpdf = nee_ref[3, k]
                rad = (nee_ref[4, k], nee_ref[5, k], nee_ref[6, k])
                ps = spec_prob
                surf = shade & (alpha >= 1.0)
                cos_l = normal[0] * ldx + normal[1] * ldy + normal[2] * ldz
                cand = surf & (cos_l > 0.0) & (lpdf > np.float32(1e-12))
                shx = pos[0] + normal[0] * np.float32(1e-4)
                shy = pos[1] + normal[1] * np.float32(1e-4)
                shz = pos[2] + normal[2] * np.float32(1e-4)
                tiny = np.float32(1e-30)
                ilx = 1.0 / jnp.where(jnp.abs(ldx) < tiny, tiny, ldx)
                ily = 1.0 / jnp.where(jnp.abs(ldy) < tiny, tiny, ldy)
                ilz = 1.0 / jnp.where(jnp.abs(ldz) < tiny, tiny, ldz)
                # shadow spheres: closest t with the same AABB pre-test
                ssp_t = jnp.full(shape, _INF)
                for s in range(num_spheres):
                    cx = sph_ref[s, 0]
                    cy = sph_ref[s, 1]
                    cz = sph_ref[s, 2]
                    r = sph_ref[s, 3]
                    t1x = (cx - r - shx) * ilx
                    t2x = (cx + r - shx) * ilx
                    t1y = (cy - r - shy) * ily
                    t2y = (cy + r - shy) * ily
                    t1z = (cz - r - shz) * ilz
                    t2z = (cz + r - shz) * ilz
                    btmin = jnp.maximum(
                        jnp.maximum(jnp.minimum(t1x, t2x),
                                    jnp.minimum(t1y, t2y)),
                        jnp.minimum(t1z, t2z))
                    btmax = jnp.minimum(
                        jnp.minimum(jnp.maximum(t1x, t2x),
                                    jnp.maximum(t1y, t2y)),
                        jnp.maximum(t1z, t2z))
                    aabb_t = jnp.where(btmax > jnp.maximum(0.0, btmin),
                                       btmin, _INF)
                    ocx, ocy, ocz = shx - cx, shy - cy, shz - cz
                    bq = 2.0 * (ocx * ldx + ocy * ldy + ocz * ldz)
                    cq = ocx * ocx + ocy * ocy + ocz * ocz - r * r
                    disc = bq * bq - 4.0 * cq
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    t_near = (-bq - sq) * 0.5
                    t_far = (-bq + sq) * 0.5
                    t = jnp.where(t_near < 0.0, t_far, t_near)
                    t = jnp.where(disc >= 0.0, t, _INF)
                    t = jnp.where((aabb_t < far) & (t > _HIT_EPS), t, _INF)
                    ssp_t = jnp.minimum(ssp_t, t)
                # shadow triangles: brute tier tests the unrolled SMEM
                # table; the raylet tier runs the same in-kernel
                # worklist traversal as primary rays in occlusion mode
                # (no shade fetch, any-hit-inside-far early exit)
                if raylet_f is not None:
                    sh_seed = jnp.where(cand, far, np.float32(-1.0))
                    str_t, *_ = traverse(
                        boxesT_ref, gtab_ref, stab_ref,
                        (shx, shy, shz), (ldx, ldy, ldz),
                        (ilx, ily, ilz), sh_seed, *raylet_scratch,
                        want_shade=False, any_hit_far=far)
                    str_t = jnp.where(cand, str_t, _INF)
                else:
                    str_t = jnp.full(shape, _INF)
                for ti in range(num_tris if tri_ref is not None else 0):
                    v0 = (tri_ref[ti, 0], tri_ref[ti, 1], tri_ref[ti, 2])
                    e1 = (tri_ref[ti, 3], tri_ref[ti, 4], tri_ref[ti, 5])
                    e2 = (tri_ref[ti, 6], tri_ref[ti, 7], tri_ref[ti, 8])
                    ld = (ldx, ldy, ldz)
                    pvec = _cross3(ld, e2)
                    det = _dot3(pvec, e1)
                    parallel = jnp.abs(det) < _DET_EPS
                    inv_det = 1.0 / jnp.where(parallel, np.float32(1.0),
                                              det)
                    tvec = (shx - v0[0], shy - v0[1], shz - v0[2])
                    uu = _dot3(tvec, pvec) * inv_det
                    qvec = _cross3(tvec, e1)
                    vv = _dot3(ld, qvec) * inv_det
                    t = _dot3(e2, qvec) * inv_det
                    ok = ((~parallel) & (uu >= 0.0) & (uu <= 1.0)
                          & (vv >= 0.0) & (uu + vv <= 1.0)
                          & (t > _HIT_EPS) & (t < str_t))
                    str_t = jnp.where(ok, t, str_t)
                sh_t = jnp.where(
                    (str_t < ssp_t - _HIT_EPS) & (str_t < far),
                    str_t, ssp_t)
                visible = sh_t >= far
                p_gl_l = _glossy_pdf_c(ldx, ldy, ldz,
                                       refl[0], refl[1], refl[2], r2,
                                       normal[0], normal[1], normal[2])
                inv_pi = np.float32(1.0 / np.pi)
                p_mix_l = ((1.0 - ps) * jnp.maximum(cos_l, 0.0) * inv_pi
                           + ps * p_gl_l)
                w_fac = (lpdf / (lpdf + p_mix_l)
                         / jnp.maximum(lpdf, np.float32(1e-12)))
                dterm = (1.0 - ps) * cos_l * inv_pi
                gterm = ps * p_gl_l
                nee_on = cand & visible
                for c, (alc, spc) in enumerate(
                        (((al_r, sp_r)), (al_g, sp_g), (al_b, sp_b))):
                    contrib = (atten[c] * (alc * dterm + spc * gterm)
                               * rad[c] * w_fac)
                    color[c] = color[c] + jnp.where(nee_on, contrib, 0.0)
                # continuation-strategy pdf for the NEXT bounce's MIS
                cos_nd = (normal[0] * new_dir[0] + normal[1] * new_dir[1]
                          + normal[2] * new_dir[2])
                covered = (surf & (cos_nd > 0.0) & (bounce_type != 2)
                           & ~((bounce_type == 1)
                               & (r2 <= np.float32(1e-6))))
                p_gl_n = _glossy_pdf_c(new_dir[0], new_dir[1], new_dir[2],
                                       refl[0], refl[1], refl[2], r2,
                                       normal[0], normal[1], normal[2])
                p_mix_n = ((1.0 - ps) * jnp.maximum(cos_nd, 0.0) * inv_pi
                           + ps * p_gl_n)
                prev_pcos_out = jnp.where(covered, p_mix_n, 0.0)
                prev_nee_out = covered.astype(f32)

            o = _where3(shade, new_org, o)
            d = _where3(shade, new_dir, d)
            atten = list(_where3(
                shade,
                (atten[0] * sc_at[0], atten[1] * sc_at[1], atten[2] * sc_at[2]),
                tuple(atten),
            ))

            # bounce-type counts (compute:796,807)
            counts[0] = counts[0] + jnp.where(shade & (bounce_type == 0), 1, 0)
            counts[1] = counts[1] + jnp.where(shade & (bounce_type == 1), 1, 0)
            counts[2] = counts[2] + jnp.where(shade & (bounce_type == 2), 1, 0)

            # roughness accumulator quirk: scalar += roughness * atten.x
            # (compute:911 with HLSL float3->float truncation)
            acc_rough = acc_rough + jnp.where(shade, roughness * atten[0],
                                              0.0)

            # --- Russian roulette (compute:923-936)
            if use_rr:
                contribution = jnp.maximum(jnp.maximum(atten[0], atten[1]),
                                           atten[2])
                killed = shade & (rr > contribution)
                survive = shade & (~killed)
                safe_c = jnp.where(
                    survive, jnp.maximum(contribution, np.float32(1e-20)),
                    np.float32(1.0))
                inv_c = 1.0 / safe_c
                atten = [jnp.where(survive, a * inv_c, a) for a in atten]
            else:
                killed = jnp.zeros(shape, bool)

            # --- miss: record the deferred-sky attenuation (the host
            # wrapper multiplies by sample_env(direction, level)); on
            # envmap-free scenes the record stays zero-weighted outside.
            # Miss lanes were not shaded this bounce, so atten/d still
            # hold their at-miss values.
            miss = active & (~is_hit)
            for c in range(3):
                matten[c] = jnp.where(miss, atten[c], matten[c])
            nee4 = None
            if env_nee:
                # record the PREVIOUS bounce's continuation state at the
                # miss (the deferred sky shade MIS-weights against it,
                # exactly like trace's sky_w block)
                m_pcos = jnp.where(miss, prev_pcos_in, m_pcos)
                m_nee = jnp.where(miss, prev_nee_in, m_nee)
                nee4 = (prev_pcos_out, prev_nee_out, m_pcos, m_nee)
            active = active & is_hit & (~killed)
            return _flat(o, d, atten, color, counts, active, acc_rough,
                         matten, stack, nee4)

        nee0 = None
        if env_nee:
            nee0 = tuple(jnp.zeros(shape, f32) for _ in range(4))
        carry = jax.lax.fori_loop(
            0, max_bounces + 1, bounce_body,
            _flat(o, d, atten, color, counts, active, acc_rough, matten,
                  stack, nee0),
        )
        (o, d, atten, color, counts, active, acc_rough, matten) = carry[:8]
        if env_nee:
            mpc_ref[:] = carry[10]
            mne_ref[:] = carry[11]

        outr_ref[:] = color[0]
        outg_ref[:] = color[1]
        outb_ref[:] = color[2]
        mar_ref[:] = matten[0]
        mag_ref[:] = matten[1]
        mab_ref[:] = matten[2]
        mrough_ref[:] = acc_rough
        odx_ref[:] = d[0]
        ody_ref[:] = d[1]
        odz_ref[:] = d[2]

    return kernel


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------

def _fused_treelet_k(scene: SceneData) -> int | None:
    """Treelet count if the scene is eligible for the in-kernel
    traversal tier (needs the packed shading payload), else None."""
    tb = scene.tbvh
    if tb is None or getattr(tb, "shade", None) is None:
        return None
    return int(tb.num_treelets)


def _fused_raylet_f(scene: SceneData) -> tuple[int, int] | None:
    """(flatlet count, tile width) if the scene is eligible for the
    in-kernel raylet worklist tier (needs the transposed fused tables),
    else None."""
    rb = scene.rbvh
    if rb is None or getattr(rb, "gtab", None) is None:
        return None
    return int(rb.num_fused_flatlets), int(rb.fused_tile)


def fused_supported(scene: SceneData, settings: RenderSettings) -> bool:
    """Static eligibility for the fused megakernel path.

    Two tiers: <=MAX_TRIS scenes brute-force SMEM-resident triangle
    tables inside the kernel; larger scenes (up to the treelet packer's
    TREELET_MAX_TRIS cap) run the in-kernel skip-link treelet traversal
    over VMEM-resident tables. Transmissive scenes (in-kernel medium
    stack) and environment maps (deferred-miss shading) are in scope;
    NEE variants are not — they need per-bounce shadow rays, which fall
    back to the lockstep/wavefront schedulers."""
    # mirror trace._use_nee / _use_light_nee exactly: NEE only activates
    # when the flag AND its scene tables are present
    env_nee = (settings.use_envmap and settings.env_importance_sampling
               and scene.env_cdf is not None and bool(scene.env_mips))
    light_nee = (settings.light_importance_sampling
                 and scene.lights is not None)
    tris_ok = (scene.num_triangles <= MAX_TRIS
               or _fused_raylet_f(scene) is not None
               or _fused_treelet_k(scene) is not None)
    return (
        settings.debug_mode == DebugMode.NONE
        # env NEE runs fused on the brute tier (in-kernel shadow rays
        # against the unrolled SMEM tables) and on the raylet tier
        # (occlusion-mode worklist traversal); treelet-only big scenes
        # fall back to the lockstep scheduler
        and (not env_nee or scene.num_triangles <= MAX_TRIS
             or _fused_raylet_f(scene) is not None)
        and not light_nee
        and tris_ok
        and scene.num_spheres <= MAX_SPHERES
        and scene.materials.count <= MAX_MATERIALS
        and (scene.num_triangles + scene.num_spheres) > 0
        and settings.sampler in (SamplerKind.SOBOL, SamplerKind.PRNG)
    )


def _scene_tables(scene: SceneData, skip_tris: bool = False):
    """Pack the scene into the kernel's SMEM tables. `skip_tris` elides
    the per-triangle tables (traversal mode reads the treelet tiles
    instead; a >MAX_TRIS unrolled SMEM table would not fit anyway)."""
    mats = scene.materials
    mat_tab = jnp.concatenate(
        [
            mats.albedo,                                   # 0:3 rgb, 3 alpha
            mats.specular,                                 # 4:7
            mats.metallic[:, None],                        # 7
            mats.roughness[:, None],                       # 8
            mats.emissive[:, :3] * mats.emissive[:, 3:4],  # 9:12 premult
            mats.ior[:, None],                             # 12
            mats.absorption,                               # 13:16
            mats.priority.astype(jnp.float32)[:, None],    # 16 (small ints)
        ],
        axis=1,
    ).astype(jnp.float32)  # [K, 17]

    if scene.num_triangles and not skip_tris:
        tv = scene.tri_verts_world
        v0 = tv[:, 0]
        tri_tab = jnp.concatenate(
            [v0, tv[:, 1] - v0, tv[:, 2] - v0], axis=1
        ).astype(jnp.float32)  # [T, 9]
        tn = scene.tri_normals_world
        n0 = tn[:, 0]
        trin_tab = jnp.concatenate(
            [n0, tn[:, 1] - n0, tn[:, 2] - n0,
             scene.tri_material.astype(jnp.float32)[:, None]],
            axis=1,
        )  # [T, 10]
    else:
        tri_tab = jnp.zeros((1, 9), jnp.float32)
        trin_tab = jnp.zeros((1, 10), jnp.float32)

    if scene.num_spheres:
        sph_tab = jnp.concatenate(
            [scene.sphere_center, scene.sphere_radius[:, None],
             scene.sphere_material.astype(jnp.float32)[:, None]],
            axis=1,
        ).astype(jnp.float32)  # [S, 5]
    else:
        sph_tab = jnp.zeros((1, 5), jnp.float32)
    return tri_tab, trin_tab, sph_tab, mat_tab


def trace_color_fused(
    scene: SceneData,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    far: jnp.ndarray,
    sample_idx: jnp.ndarray,
    seed: jnp.ndarray,
    settings: RenderSettings,
    sublanes: int = DEFAULT_SUBLANES,
    interpret: bool | None = None,
    stack_depth: int = STACK_DEPTH,
) -> jnp.ndarray:
    """Fused megakernel forward: [N, 3] radiance (color only — the fast
    path has debug views off by eligibility). Forward-only; see
    `trace_color_fused_diff` for the differentiable wrapper."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    big = scene.num_triangles > MAX_TRIS
    raylet_f = _fused_raylet_f(scene) if big else None
    if raylet_f is not None and sublanes == DEFAULT_SUBLANES:
        sublanes = RAYLET_SUBLANES
    if big and raylet_f is None and _fused_treelet_k(scene) is not None:
        # treelet traversal tier: ray blocks must match the treelet
        # tiles' sublane broadcast (kernels/treelet_bvh.RAY_SUB)
        from halogen_tpu.kernels.treelet_bvh import RAY_SUB
        sublanes = RAY_SUB
    n = origin.shape[0]
    block = sublanes * LANES
    pad = (-n) % block
    npad = n + pad

    def prep_f(v):
        v = jnp.concatenate([v, jnp.zeros((pad,), v.dtype)]) if pad else v
        return v.reshape(npad // LANES, LANES)

    def prep_u(v):
        v = jnp.broadcast_to(v, (n,)).astype(jnp.uint32)
        v = jnp.concatenate([v, jnp.zeros((pad,), jnp.uint32)]) if pad else v
        return v.reshape(npad // LANES, LANES).view(jnp.int32) if hasattr(
            v, "view") else v.reshape(npad // LANES, LANES)

    ox, oy, oz = (prep_f(origin[:, i]) for i in range(3))
    # padded rays get direction +z so the math stays finite
    if pad:
        dpad = jnp.concatenate(
            [direction,
             jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (pad, 1))])
    else:
        dpad = direction
    dx = dpad[:, 0].reshape(npad // LANES, LANES)
    dy = dpad[:, 1].reshape(npad // LANES, LANES)
    dz = dpad[:, 2].reshape(npad // LANES, LANES)

    def prep_u32(v):
        v = jnp.broadcast_to(v, (n,)).astype(jnp.uint32)
        if pad:
            v = jnp.concatenate([v, jnp.zeros((pad,), jnp.uint32)])
        return v.reshape(npad // LANES, LANES)

    sidx = prep_u32(sample_idx)
    sd = prep_u32(seed)

    treelet_k = (None if (not big or raylet_f is not None)
                 else _fused_treelet_k(scene))
    tri_tab, trin_tab, sph_tab, mat_tab = _scene_tables(
        scene, skip_tris=treelet_k is not None or raylet_f is not None)
    far_arr = jnp.reshape(jnp.asarray(far, jnp.float32)[..., None][..., None],
                          (1, 1)) if jnp.ndim(far) == 0 else jnp.reshape(
        jnp.asarray(far, jnp.float32).reshape(-1)[0], (1, 1))

    env_nee = (settings.use_envmap and settings.env_importance_sampling
               and scene.env_cdf is not None and bool(scene.env_mips))
    # in-kernel shadow rays: brute SMEM table or raylet occlusion
    # traversal; fused_supported keeps treelet-only NEE off this path
    assert not (env_nee and treelet_k is not None)
    kernel = _make_kernel(
        settings, scene.num_triangles, scene.num_spheres,
        scene.materials.count, scene.any_transmissive,
        stack_depth=stack_depth, treelet_k=treelet_k, raylet_f=raylet_f,
        env_nee=env_nee,
    )

    rows = npad // LANES
    grid = rows // sublanes
    ray_spec = pl.BlockSpec((sublanes, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)

    vmem_full = lambda a: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=pltpu.VMEM)
    scratch_shapes = []
    if raylet_f is not None:
        rb = scene.rbvh
        # Full raylet tables resident in VMEM across the whole grid
        # (constant index_map -> fetched once, not per ray block), plus
        # the per-block ray staging scratch.
        scene_inputs = [rb.boxesT, rb.gtab, rb.stab]
        scene_specs = [vmem_full(rb.boxesT), vmem_full(rb.gtab),
                       vmem_full(rb.stab)]
        # rays / compacted rays / compacted results / final outputs /
        # compaction metadata (see _make_raylet_traversal)
        scratch_shapes = [pltpu.VMEM((sublanes, 16, LANES), jnp.float32),
                          pltpu.VMEM((sublanes, 16, LANES), jnp.float32),
                          pltpu.VMEM((sublanes, 8, LANES), jnp.float32),
                          pltpu.VMEM((sublanes, 8, LANES), jnp.float32),
                          pltpu.VMEM((4, sublanes, LANES), jnp.float32)]
        params = dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024))
    elif treelet_k is None:
        scene_inputs = [tri_tab, trin_tab]
        scene_specs = [smem(tri_tab), smem(trin_tab)]
        params = {}
    else:
        tb = scene.tbvh
        # Full treelet tables resident in VMEM across the whole grid
        # (constant index_map -> fetched once, not per ray block).
        scene_inputs = [tb.nodes, tb.tris, tb.shade]
        scene_specs = [vmem_full(tb.nodes), vmem_full(tb.tris),
                       vmem_full(tb.shade)]
        params = dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024))

    nee_inputs = []
    nee_specs = []
    n_outs = 10
    if env_nee:
        # Precomputed env-NEE draws per (ray, bounce): the stateless
        # sampler stream (dims DIM_ENV_NEE_BASE + 5k, SURVEY.md §3.4)
        # makes these computable outside the kernel; the luminance-CDF
        # inversion and texel reads are gather-shaped and XLA-batched
        # here instead of per-bounce inside the kernel.
        from halogen_tpu.sampler import sobol as sob
        from halogen_tpu.scene.envmap import sample_env_draw

        K = settings.max_bounces + 1
        s2 = (sob.prng_sample_2d if settings.sampler == SamplerKind.PRNG
              else sob.ld_sample_2d)
        dims = (jnp.uint32(sob.DIM_ENV_NEE_BASE)
                + jnp.uint32(sob.BOUNCE_DIM_STRIDE)
                * jnp.arange(K, dtype=jnp.uint32))
        sidx_f = sidx.reshape(-1)
        seed_f = sd.reshape(-1)
        nu, nv = s2(sidx_f[None, :], dims[:, None], seed_f[None, :])
        ldir, lpdf, rad = sample_env_draw(
            scene.env_cdf, scene.env_mips[0], nu, nv)
        nee_tab = jnp.stack(
            [ldir[..., 0], ldir[..., 1], ldir[..., 2], lpdf,
             rad[..., 0], rad[..., 1], rad[..., 2]], axis=0,
        ).reshape(7, K, npad // LANES, LANES)
        nee_inputs = [nee_tab]
        nee_specs = [pl.BlockSpec((7, K, sublanes, LANES),
                                  lambda i: (0, 0, i, 0),
                                  memory_space=pltpu.VMEM)]
        n_outs = 12

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[smem(far_arr), *scene_specs, smem(sph_tab), smem(mat_tab),
                  *nee_specs,
                  ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
                  ray_spec, ray_spec, ray_spec],
        out_specs=(ray_spec,) * n_outs,
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
            for _ in range(n_outs)
        ),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        **params,
    )(far_arr, *scene_inputs, sph_tab, mat_tab, *nee_inputs,
      ox, oy, oz, dx, dy, dz, sidx, sd)

    col = jnp.stack([outs[0].reshape(-1)[:n], outs[1].reshape(-1)[:n],
                     outs[2].reshape(-1)[:n]], axis=-1)

    # Deferred-miss sky shading (trace_ray compute:938-946): a ray misses
    # at most once — at its death — so one post-kernel XLA pass adds
    # sample_env(miss_dir, level) * miss_attenuation, with the
    # accumulated-roughness mip bias computed exactly like the lockstep
    # tracer's (trace._pool_bounce).
    if settings.use_envmap and scene.env_mips:
        matten = jnp.stack(
            [outs[3].reshape(-1)[:n], outs[4].reshape(-1)[:n],
             outs[5].reshape(-1)[:n]], axis=-1)
        m_rough = outs[6].reshape(-1)[:n]
        m_dir = jnp.stack(
            [outs[7].reshape(-1)[:n], outs[8].reshape(-1)[:n],
             outs[9].reshape(-1)[:n]], axis=-1)
        if settings.mip_importance_bias:
            level = (settings.env_mip_level
                     + m_rough * settings.mip_importance_range)
        else:
            level = jnp.full((n,), settings.env_mip_level, jnp.float32)
        sky = sample_env_packed(scene.env_mips, m_dir, level) * matten
        if env_nee:
            # sky MIS against the recorded continuation pdf (the
            # deferred analog of trace's sky_w block)
            from halogen_tpu.scene.envmap import env_pdf

            m_pcos = outs[10].reshape(-1)[:n]
            m_nee = outs[11].reshape(-1)[:n]
            pe = env_pdf(scene.env_cdf, m_dir)
            w = jnp.where(
                m_nee > 0.5,
                m_pcos / jnp.maximum(m_pcos + pe, np.float32(1e-12)),
                jnp.float32(1.0))
            sky = sky * w[:, None]
        col = col + sky
    return col


@functools.lru_cache(maxsize=None)
def _diff_fused(settings: RenderSettings):
    """custom_vjp keyed on settings: fused forward, lockstep path-replay
    backward (same decomposition as trace.trace_rays_wavefront_diff)."""
    from halogen_tpu.integrator import trace as tr

    @jax.custom_vjp
    def traced(scene, origin, direction, far, sample_idx, seed):
        return trace_color_fused(
            scene, origin, direction, far, sample_idx, seed, settings)

    def fwd(scene, origin, direction, far, sample_idx, seed):
        out = traced(scene, origin, direction, far, sample_idx, seed)
        return out, (scene, origin, direction, far, sample_idx, seed)

    def bwd(res, ct):
        scene, origin, direction, far, sample_idx, seed = res
        f0 = lambda x: np.zeros(np.shape(x), jax.dtypes.float0)

        from halogen_tpu.kernels import adjoint as adj

        if adj.adjoint_supported(scene, settings):
            # Fused backward: the whole path-replay adjoint runs as a
            # second Pallas kernel (kernels/adjoint.py) producing the
            # material-table cotangent directly. Geometry and
            # camera-ray cotangents are zero on this path — the
            # supported differentiable surface is the inverse-rendering
            # one (materials/emission/absorption; diff/grad.py); use
            # Fused.OFF to differentiate w.r.t. geometry or camera.
            import dataclasses

            dmat12 = adj.trace_grad_fused_materials(
                scene, origin, direction, far, sample_idx, seed, ct,
                settings)
            d_mats = adj.material_cotangents(scene, dmat12)

            def zl(x):
                if hasattr(x, "dtype") and jnp.issubdtype(
                        x.dtype, jnp.floating):
                    return jnp.zeros_like(x)
                return np.zeros(np.shape(x), jax.dtypes.float0)

            d_scene = dataclasses.replace(
                jax.tree.map(zl, scene), materials=d_mats)
            return (d_scene, jnp.zeros_like(origin),
                    jnp.zeros_like(direction),
                    jnp.zeros_like(jnp.asarray(far)),
                    f0(sample_idx), f0(seed))

        n = origin.shape[0]
        far_b = jnp.broadcast_to(jnp.asarray(far, jnp.float32), (n,))
        # The replay must stay differentiable end to end: on TPU the
        # AUTO intersector routes big scenes to standalone Pallas
        # traversal kernels (no vjp), and the lockstep BVH walk is a
        # lax.while_loop (no reverse mode either) — pin the dense BRUTE
        # intersector for the backward (identical radiance, proven by
        # the intersector parity tests; pure elementwise + reductions,
        # so reverse-mode is exact; only the backward pays the O(tris)
        # cost).
        from halogen_tpu.config import Intersector

        bwd_settings = settings
        if settings.intersector == Intersector.AUTO:
            bwd_settings = settings.replace(intersector=Intersector.BRUTE)
        _, vjp = jax.vjp(
            lambda sc, o, d: tr.trace_rays(
                sc, o, d, far_b, sample_idx, seed, bwd_settings).color,
            scene, origin, direction,
        )
        d_scene, d_o, d_d = vjp(ct)
        return (d_scene, d_o, d_d, jnp.zeros_like(jnp.asarray(far)),
                f0(sample_idx), f0(seed))

    traced.defvjp(fwd, bwd)
    return traced


def trace_color_fused_diff(
    scene: SceneData,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    far: jnp.ndarray,
    sample_idx: jnp.ndarray,
    seed: jnp.ndarray,
    settings: RenderSettings,
) -> jnp.ndarray:
    """Differentiable fused tracer: megakernel forward, lockstep replay
    backward. Primals match the lockstep tracer to float tolerance."""
    return _diff_fused(settings)(
        scene, origin, direction, far, sample_idx, seed)
