"""Pallas fused-bounce megakernel: the whole path loop in one TPU kernel.

The TPU answer to the reference's megakernel design
(`HalgoenCompute.compute:876-1063`): instead of the lockstep JAX
integrator's ~60 HBM-roundtrip fusions per bounce, every bounce of every
ray in a block runs inside ONE `pallas_call` — ray state lives in
registers/VMEM, the scene (triangles, spheres, materials) lives in SMEM
as broadcast scalars, and the only HBM traffic is the initial ray load
and the final color store. This is the single-chip speed-of-light path
for small (Cornell-class) scenes where the whole scene fits in SMEM.

Scope (static eligibility, `fused_supported`): opaque scenes
(`any_transmissive=False`, so the nested-dielectric stack is provably
empty), no environment map, no NEE, debug off, <=MAX_TRIS triangles and
<=MAX_SPHERES spheres. Everything else falls back to the lockstep /
wavefront schedulers in `integrator/trace.py`. Per-ray results mirror
`trace._pool_bounce` op-for-op (same formulas, same selection order), so
images match the lockstep tracer to float addition-order tolerance.

Semantics preserved (same reference citations as integrator/trace.py):
- brute-force closest-hit with first-min tie-breaking and the
  sphere-vs-mesh HIT_EPS rule (compute:357-376, 452)
- per-type bounce limits with `>` (compute:869-871), emission before
  BRDF (compute:901-902), Russian roulette with 1/p after the kill test
  (compute:923-936), sampler dims advancing 5 per bounce (compute:921)
- the opaque material path of evaluate_material_hit (compute:743-817
  with alpha=1: no refraction lane ever taken, Beer-Lambert only on
  exiting lanes)

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

# Static eligibility caps: the scene tables must fit in SMEM and the
# primitive loops are fully unrolled in the kernel body.
MAX_TRIS = 128
MAX_SPHERES = 32
MAX_MATERIALS = 64

LANES = 128
DEFAULT_SUBLANES = 32  # rays per program = SUBLANES * LANES

_HIT_EPS = np.float32(1e-4)
_OFFSET_EPS = np.float32(1e-4)
_DET_EPS = np.float32(1e-8)
_INF = np.float32(np.inf)
_TWO_PI = np.float32(2.0 * np.pi)
_INV_U32 = np.float32(1.0 / 4294967296.0)

_U32 = jnp.uint32


# ---------------------------------------------------------------------------
# numpy mirror of the PCG hash, for folding static dimension IDs into
# compile-time constants (sampler/sobol.u32_hash on python ints).
# ---------------------------------------------------------------------------

def _u32_hash_const(value: int) -> int:
    with np.errstate(over="ignore"):
        v = np.uint32(value)
        state = v * np.uint32(747796405) + np.uint32(2891336453)
        word = ((state >> np.uint32((state >> np.uint32(28)) + np.uint32(4)))
                ^ state) * np.uint32(277803737)
        return int((word >> np.uint32(22)) ^ word)


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


def _sobol_2d(index, dim: int, seed):
    """ld_sample_2d with the dimension hash folded to a constant."""
    sd = seed ^ _U32(_u32_hash_const(dim))
    shuffled = _owen_scramble(index, sd)
    x = _owen_scramble(_reverse_bits(shuffled), _hash_combine(sd, 0))
    y = _owen_scramble(_sobol_dim1(shuffled), _hash_combine(sd, 1))
    return _to_unit(x), _to_unit(y)


def _sobol_1d(index, dim: int, seed):
    """ld_sample_1d: scrambles the value, does NOT shuffle the index
    (reference quirk, HalogenRandom.hlsl:203-209)."""
    sd = seed ^ _U32(_u32_hash_const(dim))
    return _to_unit(_owen_scramble(_reverse_bits(index), _u32_hash(sd)))


def _prng_2d_impl(index, dim: int, seed):
    # mirror sampler/sobol.prng_sample_2d: hash_combine(hash_combine(seed,
    # index), dim) — index is per-ray, dim static.
    h = seed ^ (index + (seed << _U32(6)) + (seed >> _U32(2)))
    h0 = h ^ (_U32(dim) + (h << _U32(6)) + (h >> _U32(2)))
    return _to_unit(_u32_hash(h0)), _to_unit(_u32_hash(h0 ^ _U32(0x9E3779B9)))


def _prng_1d_impl(index, dim: int, seed):
    h = seed ^ (index + (seed << _U32(6)) + (seed >> _U32(2)))
    h0 = h ^ (_U32(dim) + (h << _U32(6)) + (h >> _U32(2)))
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
# Kernel body
# ---------------------------------------------------------------------------

def _make_kernel(settings: RenderSettings, num_tris: int, num_spheres: int,
                 num_materials: int):
    """Build the fused path-trace kernel body for static scene sizes."""
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

    def kernel(far_ref, tri_ref, trin_ref, sph_ref, mat_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               sidx_ref, seed_ref, outr_ref, outg_ref, outb_ref):
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

        for k in range(max_bounces + 1):
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

            # --- triangles: unrolled Möller-Trumbore with inline winner
            # payload tracking (triangle_intersection_doublesided,
            # compute:307-355; winner normal interp compute:462-467)
            tr_t = jnp.full(shape, _INF)
            tr_s = jnp.zeros(shape, f32)
            tr_nx = jnp.zeros(shape, f32)
            tr_ny = jnp.zeros(shape, f32)
            tr_nz = jnp.zeros(shape, f32)
            tr_mat = jnp.zeros(shape, f32)
            for ti in range(num_tris):
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
            NF = 16
            mf = [jnp.zeros(shape, f32) for _ in range(NF)]
            for mi in range(num_materials):
                selm = mat_id == np.float32(mi)
                for j in range(NF):
                    mf[j] = jnp.where(selm, mat_ref[mi, j], mf[j])
            (al_r, al_g, al_b, alpha, sp_r, sp_g, sp_b, metallic,
             roughness, em_r, em_g, em_b, ior, ab_r, ab_g, ab_b) = mf

            # --- emission before BRDF (compute:901-902)
            emw = active & is_hit
            color[0] = color[0] + jnp.where(emw, em_r * atten[0], 0.0)
            color[1] = color[1] + jnp.where(emw, em_g * atten[1], 0.0)
            color[2] = color[2] + jnp.where(emw, em_b * atten[2], 0.0)

            # --- sampler draws for this bounce (dims = base + 5k,
            # compute:921)
            stride = sob.BOUNCE_DIM_STRIDE * k
            r1u, r1v = s2(sidx, sob.DIM_ROUGH_REFLECTION + stride, seed)
            p1u, p1v = s2(sidx, sob.DIM_MATERIAL_BRDF + stride, seed)
            rr = s1(sidx, sob.DIM_RUSSIAN_ROULETTE + stride, seed)

            shade = active & is_hit

            # --- opaque material path (evaluate_material_hit opaque
            # specialization): cur/hit IOR by orientation, no stack
            entering = orient > 0.0
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
            new_dir = _normalize3(_where3(do_spec, spec_dir, diffuse_dir))
            sc_at = _where3(do_spec, (sp_r, sp_g, sp_b), (al_r, al_g, al_b))
            new_org = (pos[0] + normal[0] * _OFFSET_EPS,
                       pos[1] + normal[1] * _OFFSET_EPS,
                       pos[2] + normal[2] * _OFFSET_EPS)
            bounce_type = jnp.where(do_spec, 1, 0)  # opaque: never 2

            # Beer-Lambert on exiting lanes (compute:810-813)
            exit_m = shade & (~entering)
            sc_at = (jnp.where(exit_m, sc_at[0] * jnp.exp(-ab_r * t_safe), sc_at[0]),
                     jnp.where(exit_m, sc_at[1] * jnp.exp(-ab_g * t_safe), sc_at[1]),
                     jnp.where(exit_m, sc_at[2] * jnp.exp(-ab_b * t_safe), sc_at[2]))

            o = _where3(shade, new_org, o)
            d = _where3(shade, new_dir, d)
            atten = list(_where3(
                shade,
                (atten[0] * sc_at[0], atten[1] * sc_at[1], atten[2] * sc_at[2]),
                tuple(atten),
            ))

            # bounce-type counts
            counts[0] = counts[0] + jnp.where(shade & (bounce_type == 0), 1, 0)
            counts[1] = counts[1] + jnp.where(shade & (bounce_type == 1), 1, 0)

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

            # miss -> black sky (use_envmap False in this kernel's scope)
            active = active & is_hit & (~killed)

        outr_ref[:] = color[0]
        outg_ref[:] = color[1]
        outb_ref[:] = color[2]

    return kernel


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------

def fused_supported(scene: SceneData, settings: RenderSettings) -> bool:
    """Static eligibility for the fused megakernel path."""
    return (
        settings.debug_mode == DebugMode.NONE
        and not settings.use_envmap
        and not settings.env_importance_sampling
        and not settings.light_importance_sampling
        and not scene.any_transmissive
        and scene.num_triangles <= MAX_TRIS
        and scene.num_spheres <= MAX_SPHERES
        and scene.materials.count <= MAX_MATERIALS
        and (scene.num_triangles + scene.num_spheres) > 0
        and settings.sampler in (SamplerKind.SOBOL, SamplerKind.PRNG)
    )


def _scene_tables(scene: SceneData):
    """Pack the scene into the kernel's SMEM tables."""
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
        ],
        axis=1,
    ).astype(jnp.float32)  # [K, 16]

    if scene.num_triangles:
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
) -> jnp.ndarray:
    """Fused megakernel forward: [N, 3] radiance (color only — the fast
    path has debug views off by eligibility). Forward-only; see
    `trace_color_fused_diff` for the differentiable wrapper."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
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

    tri_tab, trin_tab, sph_tab, mat_tab = _scene_tables(scene)
    far_arr = jnp.reshape(jnp.asarray(far, jnp.float32)[..., None][..., None],
                          (1, 1)) if jnp.ndim(far) == 0 else jnp.reshape(
        jnp.asarray(far, jnp.float32).reshape(-1)[0], (1, 1))

    kernel = _make_kernel(
        settings, scene.num_triangles, scene.num_spheres,
        scene.materials.count,
    )

    rows = npad // LANES
    grid = rows // sublanes
    ray_spec = pl.BlockSpec((sublanes, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            smem(far_arr), smem(tri_tab), smem(trin_tab), smem(sph_tab),
            smem(mat_tab),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
            ray_spec, ray_spec,
        ],
        out_specs=(ray_spec, ray_spec, ray_spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
            for _ in range(3)
        ),
        interpret=interpret,
    )(far_arr, tri_tab, trin_tab, sph_tab, mat_tab,
      ox, oy, oz, dx, dy, dz, sidx, sd)

    col = jnp.stack([outs[0].reshape(-1)[:n], outs[1].reshape(-1)[:n],
                     outs[2].reshape(-1)[:n]], axis=-1)
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
        n = origin.shape[0]
        far_b = jnp.broadcast_to(jnp.asarray(far, jnp.float32), (n,))
        _, vjp = jax.vjp(
            lambda sc, o, d: tr.trace_rays(
                sc, o, d, far_b, sample_idx, seed, settings).color,
            scene, origin, direction,
        )
        d_scene, d_o, d_d = vjp(ct)
        f0 = lambda x: np.zeros(np.shape(x), jax.dtypes.float0)
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
