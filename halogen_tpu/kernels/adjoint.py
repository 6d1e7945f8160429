"""Pallas fused path-replay adjoint: material gradients in one kernel.

The differentiable fused path (`megakernel.trace_color_fused_diff`) runs
the Pallas megakernel forward and, before this module existed, the
lockstep tracer's AD replay backward — measured 25 Mrays/s fwd+bwd on
Cornell 256spp vs 200+ forward-only (VERDICT r4 item 2). This kernel
fuses the backward too: it re-traces every path inside one `pallas_call`
(same brute-tier formulas as the forward megakernel, SMEM scene tables),
records a compact per-bounce transcript in VMEM scratch, then runs the
reverse sweep in-kernel and accumulates per-material parameter
cotangents with one-hot bf16x3 MXU matmuls (exact — see
raylet._split_bf16x3 for the argument).

Scope (static, `adjoint_supported`): the detached-sampling material
gradient surface on OPAQUE brute-tier scenes with no envmap and no NEE —
exactly the BASELINE.json fwd+bwd ladder config (Cornell-class). The
gradient program mirrors `jax.vjp` of the lockstep tracer op-for-op:

- color = sum_k e_{m_k} (.) A_{k-1}; cotangent ct flows into each
  emission term and, through the attenuation products, into
  albedo/specular factors and Beer-Lambert absorption
  (trace._pool_bounce; reference formulas HalgoenCompute.compute:
  672-741, 810-813, 901-902).
- The Russian-roulette 1/max(atten) boost is NOT detached in the
  lockstep program (trace.py RR block), so the reverse sweep
  differentiates through the division: the max's cotangent spreads
  evenly over argmax ties (jnp.max vjp semantics) and is gated by the
  max(contribution, 1e-20) clamp.
- Sampling decisions, path geometry, and pdfs are detached
  (trace.py:504-510), so roughness/metallic/ior get zero gradient here
  — identical to the lockstep estimator on this scene class.

Anything outside the scope (transmissive media, envmap, NEE, debug,
non-brute scenes) falls back to the lockstep AD replay, unchanged.
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
from halogen_tpu.kernels import megakernel as mk

LANES = mk.LANES
_INF = mk._INF
_HIT_EPS = mk._HIT_EPS
_OFFSET_EPS = mk._OFFSET_EPS
_DET_EPS = mk._DET_EPS
_TWO_PI = mk._TWO_PI
_U32 = mk._U32

# per-bounce transcript rows in the records scratch (sublane-padded to 8)
_REC_ROWS = 8
# gradient fields routed to the material table per (ray, bounce):
# d_e rgb | d_albedo rgb | d_specular rgb | d_absorption rgb
_NGRAD = 12


def adjoint_supported(scene: SceneData, settings: RenderSettings) -> bool:
    """Static eligibility for the fused adjoint backward."""
    return (
        mk.fused_supported(scene, settings)
        and scene.num_triangles <= mk.MAX_TRIS
        and not (settings.use_envmap and bool(scene.env_mips))
        and not (settings.env_importance_sampling
                 and scene.env_cdf is not None and bool(scene.env_mips))
        and not (settings.light_importance_sampling
                 and scene.lights is not None)
        and settings.debug_mode == DebugMode.NONE
    )


def _make_adjoint_kernel(settings: RenderSettings, num_tris: int,
                         num_spheres: int, num_materials: int,
                         any_transmissive: bool = False,
                         stack_depth: int = mk.STACK_DEPTH):
    """Forward-replay + reverse-sweep kernel for static scene sizes.

    any_transmissive compiles the full nested-dielectric path (medium
    stack in the forward replay; Beer-Lambert absorption gradients
    route to the CURRENT medium's material via a second one-hot) —
    mirroring the forward megakernel's transmissive branch op-for-op."""
    sobol = settings.sampler == SamplerKind.SOBOL
    max_bounces = settings.max_bounces
    lim_d = settings.max_diffuse_bounces
    lim_g = settings.max_glossy_bounces
    lim_t = settings.max_transmission_bounces
    use_rr = settings.russian_roulette
    B = max_bounces + 1

    from halogen_tpu.sampler import sobol as sob

    def s2(index, dim, seed):
        return (mk._sobol_2d if sobol else mk._prng_2d_impl)(index, dim,
                                                            seed)

    def s1(index, dim, seed):
        return (mk._sobol_1d if sobol else mk._prng_1d_impl)(index, dim,
                                                             seed)

    def kernel(far_ref, tri_ref, trin_ref, sph_ref, mat_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               sidx_ref, seed_ref, ctr_ref, ctg_ref, ctb_ref,
               dmat_ref, rec_ref, gscr_ref, mscr_ref):
        f32 = jnp.float32
        i32 = jnp.int32
        far = far_ref[0, 0]
        o = (ox_ref[:], oy_ref[:], oz_ref[:])
        d = (dx_ref[:], dy_ref[:], dz_ref[:])
        sidx = sidx_ref[:].astype(jnp.uint32)
        seed = seed_ref[:].astype(jnp.uint32)
        ct = (ctr_ref[:], ctg_ref[:], ctb_ref[:])
        shape = o[0].shape
        S = shape[0]

        def mat_lookup(mat_id):
            NF = 17
            mf = [jnp.zeros(shape, f32) for _ in range(NF)]
            for mi in range(num_materials):
                selm = mat_id == np.float32(mi)
                for j in range(NF):
                    mf[j] = jnp.where(selm, mat_ref[mi, j], mf[j])
            return mf

        def intersect(o, d, active):
            """Brute closest-hit: op-for-op the fused forward's sphere
            scan + unrolled Möller-Trumbore (megakernel bounce body;
            reference compute:357-376, 307-355, 452)."""
            tiny = np.float32(1e-30)
            inv_d = tuple(
                1.0 / jnp.where(jnp.abs(c) < tiny, tiny, c) for c in d)
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
                aabb_t = jnp.where(tmax > jnp.maximum(0.0, tmin), tmin,
                                   _INF)
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
                orient = jnp.where(inside, np.float32(-1.0),
                                   np.float32(1.0))
                t = jnp.where(disc >= 0.0, t, _INF)
                t = jnp.where((aabb_t < far) & (t > _HIT_EPS), t, _INF)
                better = t < sp_t
                sp_t = jnp.where(better, t, sp_t)
                sp_orient = jnp.where(better, orient, sp_orient)
                sp_cx = jnp.where(better, cx, sp_cx)
                sp_cy = jnp.where(better, cy, sp_cy)
                sp_cz = jnp.where(better, cz, sp_cz)
                sp_mat = jnp.where(better, m, sp_mat)

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
                pvec = mk._cross3(d, e2)
                det = mk._dot3(pvec, e1)
                parallel = jnp.abs(det) < _DET_EPS
                inv_det = 1.0 / jnp.where(parallel, np.float32(1.0), det)
                tvec = (o[0] - v0[0], o[1] - v0[1], o[2] - v0[2])
                u = mk._dot3(tvec, pvec) * inv_det
                qvec = mk._cross3(tvec, e1)
                v = mk._dot3(d, qvec) * inv_det
                t = mk._dot3(e2, qvec) * inv_det
                valid = ((~parallel) & (u >= 0.0) & (u <= 1.0)
                         & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0))
                ok = valid & (t > _HIT_EPS) & (t < tr_t)
                nx = (trin_ref[ti, 0] + trin_ref[ti, 3] * u
                      + trin_ref[ti, 6] * v)
                ny = (trin_ref[ti, 1] + trin_ref[ti, 4] * u
                      + trin_ref[ti, 7] * v)
                nz = (trin_ref[ti, 2] + trin_ref[ti, 5] * u
                      + trin_ref[ti, 8] * v)
                tr_t = jnp.where(ok, t, tr_t)
                tr_s = jnp.where(ok, mk._sign(det), tr_s)
                tr_nx = jnp.where(ok, nx, tr_nx)
                tr_ny = jnp.where(ok, ny, tr_ny)
                tr_nz = jnp.where(ok, nz, tr_nz)
                tr_mat = jnp.where(ok, trin_ref[ti, 9], tr_mat)

            mesh_wins = (tr_t < sp_t - _HIT_EPS) & (tr_t < far)
            t = jnp.where(mesh_wins, tr_t, sp_t)
            is_hit = t < far
            t_safe = jnp.where(jnp.isfinite(t), t, 0.0)
            pos = (o[0] + d[0] * t_safe, o[1] + d[1] * t_safe,
                   o[2] + d[2] * t_safe)
            tri_n = mk._normalize3((tr_nx * tr_s, tr_ny * tr_s,
                                    tr_nz * tr_s))
            sph_n = mk._normalize3(((pos[0] - sp_cx) * sp_orient,
                                    (pos[1] - sp_cy) * sp_orient,
                                    (pos[2] - sp_cz) * sp_orient))
            normal = mk._where3(mesh_wins, tri_n, sph_n)
            orient = jnp.where(mesh_wins, tr_s, sp_orient)
            mat_id = jnp.where(mesh_wins, tr_mat, sp_mat)
            return t_safe, is_hit, pos, normal, orient, mat_id

        # ------------------------------------------------------------
        # forward replay, storing the per-bounce transcript
        # ------------------------------------------------------------
        def fwd_body(k, carry):
            (o, d, atten, counts, active) = carry[:5]
            if any_transmissive:
                st_ior, st_ab, st_prio, st_mid, st_size = carry[5:]
                stack = mk._Stack(list(st_ior), list(st_ab),
                                  list(st_prio), list(st_mid), st_size)
            active = active != 0
            atten = list(atten)
            counts = list(counts)
            over = ((counts[0] > lim_d) | (counts[1] > lim_g)
                    | (counts[2] > lim_t))
            active = active & (~over)

            t_safe, is_hit, pos, normal, orient, mat_id = intersect(
                o, d, active)
            (al_r, al_g, al_b, alpha, sp_r, sp_g, sp_b, metallic,
             roughness, em_r, em_g, em_b, ior, ab_r, ab_g, ab_b,
             prio_f) = mat_lookup(mat_id)
            mat_i = mat_id.astype(i32)
            prio_i = prio_f.astype(i32)

            shade = active & is_hit
            entering = orient > 0.0

            stride = _U32(sob.BOUNCE_DIM_STRIDE) * k.astype(jnp.uint32)
            r1u, r1v = s2(sidx, _U32(sob.DIM_ROUGH_REFLECTION) + stride,
                          seed)
            p1u, p1v = s2(sidx, _U32(sob.DIM_MATERIAL_BRDF) + stride,
                          seed)
            rr = s1(sidx, _U32(sob.DIM_RUSSIAN_ROULETTE) + stride, seed)

            if any_transmissive:
                # interface tracking (megakernel transmissive branch;
                # evaluate_material_hit, compute:743-817)
                internal = (ior, (ab_r, ab_g, ab_b), prio_i, mat_i)
                uses_tracking = prio_i >= 0
                true_hit = ((~uses_tracking)
                            | stack.is_true_hit(prio_i))
                top0 = stack.top()
                empty0 = stack.size == 0
                track_exit = shade & uses_tracking & (~entering)
                stack_ap = stack.pop_id(mat_i, track_exit)
                top_ap = stack_ap.top()
                cur = mk._sel_medium(
                    entering, top0,
                    mk._sel_medium(
                        uses_tracking,
                        mk._sel_medium(empty0, internal, top0),
                        internal))
                hitm = mk._sel_medium(
                    entering, internal,
                    mk._sel_medium(uses_tracking, top_ap, top0))
                track_enter = shade & uses_tracking & entering
                stack1 = stack_ap.push(internal, track_enter)
                cur_ior, hit_ior = cur[0], hitm[0]
            else:
                true_hit = jnp.ones(shape, bool)
                cur_ior = jnp.where(entering, np.float32(1.0), ior)
                hit_ior = jnp.where(entering, ior, np.float32(1.0))
            theta = r1u * _TWO_PI
            cos_phi = 2.0 * r1v - 1.0
            sin_phi = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_phi * cos_phi))
            rv = (sin_phi * jnp.cos(theta), sin_phi * jnp.sin(theta),
                  cos_phi)
            sdir = (normal[0] + rv[0], normal[1] + rv[1],
                    normal[2] + rv[2])
            tiny_s = mk._dot3(sdir, sdir) < np.float32(1e-16)
            sdir = mk._where3(tiny_s, normal, sdir)
            diffuse_dir = mk._normalize3(sdir, eps=np.float32(0.0))

            r0 = (cur_ior - hit_ior) / (cur_ior + hit_ior)
            r0 = r0 * r0
            cos_x = -(normal[0] * d[0] + normal[1] * d[1]
                      + normal[2] * d[2])
            nr = cur_ior / hit_ior
            sin_t2 = nr * nr * (1.0 - cos_x * cos_x)
            exiting = cur_ior > hit_ior
            tir = exiting & (sin_t2 > 1.0)
            cos_x = jnp.where(
                exiting, jnp.sqrt(jnp.maximum(0.0, 1.0 - sin_t2)), cos_x)
            xs = 1.0 - cos_x
            fres = r0 + (1.0 - r0) * xs * xs * xs * xs * xs
            schlick = metallic + (1.0 - metallic) * fres
            schlick = jnp.where(tir, np.float32(1.0), schlick)
            spec_prob = jnp.where(metallic > 0.0, schlick, metallic)
            do_spec = p1v < spec_prob

            r2 = roughness * roughness
            dn = mk._dot3(d, normal)
            refl = (d[0] - 2.0 * dn * normal[0],
                    d[1] - 2.0 * dn * normal[1],
                    d[2] - 2.0 * dn * normal[2])
            spec_dir = (refl[0] + (diffuse_dir[0] - refl[0]) * r2,
                        refl[1] + (diffuse_dir[1] - refl[1]) * r2,
                        refl[2] + (diffuse_dir[2] - refl[2]) * r2)
            refl_dir = mk._where3(do_spec, spec_dir, diffuse_dir)
            refl_org = (pos[0] + normal[0] * _OFFSET_EPS,
                        pos[1] + normal[1] * _OFFSET_EPS,
                        pos[2] + normal[2] * _OFFSET_EPS)
            refl = (refl[0], refl[1], refl[2])
            if any_transmissive:
                # refraction branch (material_BRDF, compute:711-734) —
                # detached path geometry, but the replay must follow it
                do_refr = p1u > alpha
                cos_t = jnp.minimum(-dn, np.float32(1.0))
                sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
                eta = cur_ior / hit_ior
                tir_r = eta * sin_t > 1.0
                rp = (eta * (d[0] + cos_t * normal[0]),
                      eta * (d[1] + cos_t * normal[1]),
                      eta * (d[2] + cos_t * normal[2]))
                par = -jnp.sqrt(jnp.abs(1.0 - mk._dot3(rp, rp)))
                refr = (rp[0] + par * normal[0],
                        rp[1] + par * normal[1],
                        rp[2] + par * normal[2])
                refr = mk._where3(tir_r, refl, refr)
                flip_n = mk._where3(
                    tir_r, normal, (-normal[0], -normal[1], -normal[2]))
                sdir_r = (flip_n[0] + rv[0], flip_n[1] + rv[1],
                          flip_n[2] + rv[2])
                tiny_r = mk._dot3(sdir_r, sdir_r) < np.float32(1e-16)
                sdir_r = mk._where3(tiny_r, flip_n, sdir_r)
                diff_refr = mk._normalize3(sdir_r, eps=np.float32(0.0))
                refr_dir = (refr[0] + (diff_refr[0] - refr[0]) * r2,
                            refr[1] + (diff_refr[1] - refr[1]) * r2,
                            refr[2] + (diff_refr[2] - refr[2]) * r2)
                refr_org = (pos[0] - normal[0] * _OFFSET_EPS,
                            pos[1] - normal[1] * _OFFSET_EPS,
                            pos[2] - normal[2] * _OFFSET_EPS)
                one = jnp.ones(shape, f32)
                new_dir = mk._normalize3(
                    mk._where3(do_refr, refr_dir, refl_dir),
                    eps=np.float32(1e-20))
                new_org = mk._where3(do_refr, refr_org, refl_org)
                base = mk._where3(
                    do_refr, (one, one, one),
                    mk._where3(do_spec, (sp_r, sp_g, sp_b),
                               (al_r, al_g, al_b)))
                bounce_type = jnp.where(do_refr, 2,
                                        jnp.where(do_spec, 1, 0))
                # false hit: pass through behind the surface
                # (compute:803-808)
                is_true = shade & true_hit
                new_org = mk._where3(is_true, new_org, refr_org)
                new_dir = mk._where3(is_true, new_dir, d)
                base = mk._where3(is_true, base, (one, one, one))
                bounce_type = jnp.where(is_true, bounce_type, 2)
                # bandaid pop (compute:799-802)
                bandaid = is_true & entering & (bounce_type != 2)
                stack = stack1.pop_id(mat_i, bandaid)
                # Beer-Lambert through the CURRENT medium
                # (compute:810-813): the absorption coefficients are
                # the medium material's table values, so the reverse
                # sweep recomputes them from the stored medium id
                absorbing = shade & (cur[3] != mk._NO_MEDIUM)
                beer = tuple(
                    jnp.where(absorbing,
                              jnp.exp(-cur[1][c] * t_safe), 1.0)
                    for c in range(3))
                ab_mat = jnp.where(absorbing, cur[3].astype(f32),
                                   np.float32(-1.0))
                do_spec_rec = do_spec & (~do_refr)
            else:
                new_dir = mk._normalize3(refl_dir)
                new_org = refl_org
                base = mk._where3(do_spec, (sp_r, sp_g, sp_b),
                                  (al_r, al_g, al_b))
                exit_m = shade & (~entering)
                absorbing = exit_m
                beer = tuple(
                    jnp.where(exit_m,
                              jnp.exp(-(ab_r, ab_g, ab_b)[c] * t_safe),
                              1.0)
                    for c in range(3))
                ab_mat = jnp.where(exit_m, mat_id, np.float32(-1.0))
                bounce_type = jnp.where(do_spec, 1, 0)
                is_true = shade
                do_spec_rec = do_spec
            sc_at = tuple(base[c] * beer[c] for c in range(3))

            a_prev = tuple(atten)
            atten = [jnp.where(shade, atten[c] * sc_at[c], atten[c])
                     for c in range(3)]

            counts[0] = counts[0] + jnp.where(
                shade & (bounce_type == 0), 1, 0)
            counts[1] = counts[1] + jnp.where(
                shade & (bounce_type == 1), 1, 0)
            counts[2] = counts[2] + jnp.where(
                shade & (bounce_type == 2), 1, 0)

            if use_rr:
                contribution = jnp.maximum(
                    jnp.maximum(atten[0], atten[1]), atten[2])
                killed = shade & (rr > contribution)
                survive = shade & (~killed)
                safe_c = jnp.where(
                    survive, jnp.maximum(contribution, np.float32(1e-20)),
                    np.float32(1.0))
                inv_c = 1.0 / safe_c
                atten = [jnp.where(survive, a * inv_c, a) for a in atten]
            else:
                killed = jnp.zeros(shape, bool)
                survive = shade

            # transcript: A_prev rgb | hit mat | code | t | medium mat
            # (code packs the masks the reverse sweep needs)
            code = (shade.astype(f32) + 2.0 * do_spec_rec.astype(f32)
                    + 4.0 * absorbing.astype(f32)
                    + 8.0 * survive.astype(f32)
                    + 16.0 * is_true.astype(f32)
                    + 32.0 * (shade & (bounce_type == 2)).astype(f32))
            for j, v in enumerate((a_prev[0], a_prev[1], a_prev[2],
                                   mat_id, code, t_safe, ab_mat)):
                rec_ref[:, pl.ds(k * _REC_ROWS + j, 1), :] = v[:, None, :]

            o = mk._where3(shade, new_org, o)
            d = mk._where3(shade, new_dir, d)
            active = active & is_hit & (~killed)
            out = (o, d, tuple(atten), tuple(counts), active.astype(i32))
            if any_transmissive:
                out += (tuple(stack.ior), tuple(stack.ab),
                        tuple(stack.prio), tuple(stack.mid), stack.size)
            return out

        atten0 = tuple(jnp.ones(shape, f32) for _ in range(3))
        counts0 = tuple(jnp.zeros(shape, i32) for _ in range(3))
        carry0 = (o, d, atten0, counts0, jnp.ones(shape, i32))
        if any_transmissive:
            stack0 = mk._Stack.create(shape, stack_depth)
            carry0 += (tuple(stack0.ior), tuple(stack0.ab),
                       tuple(stack0.prio), tuple(stack0.mid), stack0.size)
        jax.lax.fori_loop(0, B, fwd_body, carry0)

        # ------------------------------------------------------------
        # reverse sweep: propagate the attenuation cotangent gA through
        # RR and the throughput product, route parameter gradients
        # ------------------------------------------------------------
        def bwd_body(i, gA):
            k = B - 1 - i
            gA = list(gA)

            def rec(j):
                return rec_ref[:, pl.ds(k * _REC_ROWS + j, 1), :]

            a_prev = [jnp.reshape(rec(j), shape) for j in range(3)]
            mat_id = jnp.reshape(rec(3), shape)
            code = jnp.reshape(rec(4), shape).astype(i32)
            t_safe = jnp.reshape(rec(5), shape)
            ab_mat = jnp.reshape(rec(6), shape)
            shade = (code & 1) == 1
            spec = (code & 2) == 2
            absorbing = (code & 4) == 4
            survive = (code & 8) == 8
            is_true = (code & 16) == 16
            refr = (code & 32) == 32

            (al_r, al_g, al_b, alpha, sp_r, sp_g, sp_b, metallic,
             roughness, em_r, em_g, em_b, ior, _, _, _,
             prio_f) = mat_lookup(mat_id)
            # the Beer medium's absorption comes from ITS material row
            # (= the hit material for the opaque exit case; ab_mat = -1
            # selects nothing and beer stays 1)
            m_ab = [jnp.zeros(shape, f32) for _ in range(3)]
            for mi in range(num_materials):
                selm = ab_mat == np.float32(mi)
                for c in range(3):
                    m_ab[c] = jnp.where(selm, mat_ref[mi, 13 + c],
                                        m_ab[c])
            one = jnp.ones(shape, f32)
            base = mk._where3(
                is_true & (~refr),
                mk._where3(spec, (sp_r, sp_g, sp_b),
                           (al_r, al_g, al_b)),
                (one, one, one))
            beer = tuple(
                jnp.where(absorbing,
                          jnp.exp(-m_ab[c] * t_safe), 1.0)
                for c in range(3))
            sc = tuple(base[c] * beer[c] for c in range(3))
            a_post = tuple(
                jnp.where(shade, a_prev[c] * sc[c], a_prev[c])
                for c in range(3))

            if use_rr:
                contribution = jnp.maximum(
                    jnp.maximum(a_post[0], a_post[1]), a_post[2])
                safe_c = jnp.where(
                    survive, jnp.maximum(contribution, np.float32(1e-20)),
                    np.float32(1.0))
                inv_c = 1.0 / safe_c
                # ties share the max's cotangent evenly (jnp.max vjp)
                tie = [(a_post[c] == contribution).astype(f32)
                       for c in range(3)]
                n_tie = jnp.maximum(tie[0] + tie[1] + tie[2],
                                    np.float32(1.0))
                gate = (contribution > np.float32(1e-20)).astype(f32)
                dot_ga = (gA[0] * a_post[0] + gA[1] * a_post[1]
                          + gA[2] * a_post[2])
                gApost = [
                    jnp.where(
                        survive,
                        gA[c] * inv_c
                        - tie[c] / n_tie * gate * dot_ga * inv_c * inv_c,
                        gA[c])
                    for c in range(3)]
            else:
                gApost = gA

            ctv = ct
            g_sc = [jnp.where(shade, gApost[c] * a_prev[c], 0.0)
                    for c in range(3)]
            gA_prev = [
                jnp.where(shade,
                          gApost[c] * sc[c]
                          + ctv[c] * (em_r, em_g, em_b)[c],
                          gA[c] if not use_rr else gApost[c])
                for c in range(3)]
            # non-shade lanes never updated atten: cotangent passes
            # through (gApost equals gA there by the survive mask)

            g_base = [g_sc[c] * beer[c] for c in range(3)]
            g_beer = [g_sc[c] * base[c] for c in range(3)]
            d_e = [jnp.where(shade, ctv[c] * a_prev[c], 0.0)
                   for c in range(3)]
            surf = shade & is_true & (~refr)
            d_al = [jnp.where(surf & (~spec), g_base[c], 0.0)
                    for c in range(3)]
            d_sp = [jnp.where(surf & spec, g_base[c], 0.0)
                    for c in range(3)]
            d_ab = [jnp.where(absorbing,
                              -t_safe * beer[c] * g_beer[c], 0.0)
                    for c in range(3)]

            for j, v in enumerate(d_e + d_al + d_sp + d_ab):
                gscr_ref[:, j:j + 1, pl.ds(k * LANES, LANES)] = (
                    v[:, None, :])
            mscr_ref[:, 0:1, pl.ds(k * LANES, LANES)] = (
                mat_id[:, None, :])
            mscr_ref[:, 1:2, pl.ds(k * LANES, LANES)] = (
                ab_mat[:, None, :])
            return tuple(gA_prev)

        gA0 = tuple(jnp.zeros(shape, f32) for _ in range(3))
        jax.lax.fori_loop(0, B, bwd_body, gA0)

        # ------------------------------------------------------------
        # per-material scatter: one-hot over material ids (lanes =
        # bounce x ray), bf16x3 on the gradient operand for exactness
        # ------------------------------------------------------------
        iota_k = jax.lax.broadcasted_iota(i32, (num_materials, B * LANES),
                                          0)

        def row_scatter(r, accs):
            # two routing one-hots: e/albedo/specular follow the HIT
            # material, absorption follows the BEER MEDIUM's material
            # (ab_mat; -1 selects nothing)
            acc9, acc3 = accs
            g_r = jnp.reshape(gscr_ref[pl.ds(r, 1)], (_NGRAD, B * LANES))
            ms = jnp.reshape(mscr_ref[pl.ds(r, 1)], (2, B * LANES))
            hi = g_r.astype(jnp.bfloat16)
            r1 = g_r - hi.astype(f32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(f32)).astype(jnp.bfloat16)
            oh_m = (iota_k == ms[0:1].astype(i32)).astype(jnp.bfloat16)
            oh_a = (iota_k == ms[1:2].astype(i32)).astype(jnp.bfloat16)
            for part in (hi, mid, lo):
                acc9 = acc9 + jax.lax.dot_general(
                    oh_m, part[0:9], (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
                acc3 = acc3 + jax.lax.dot_general(
                    oh_a, part[9:12], (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
            return acc9, acc3

        dmat9, dmat3 = jax.lax.fori_loop(
            0, S, row_scatter,
            (jnp.zeros((num_materials, 9), f32),
             jnp.zeros((num_materials, 3), f32)))

        @pl.when(pl.program_id(0) == 0)
        def _():
            dmat_ref[:] = jnp.zeros((num_materials, LANES), f32)

        dmat_ref[:, 0:9] = dmat_ref[:, 0:9] + dmat9
        dmat_ref[:, 9:12] = dmat_ref[:, 9:12] + dmat3

    return kernel


def trace_grad_fused_materials(
    scene: SceneData,
    origin: jnp.ndarray,
    direction: jnp.ndarray,
    far,
    sample_idx: jnp.ndarray,
    seed: jnp.ndarray,
    ct: jnp.ndarray,
    settings: RenderSettings,
    sublanes: int = mk.DEFAULT_SUBLANES,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused backward: [K, 12] per-material cotangents
    (d_e_premult rgb | d_albedo rgb | d_specular rgb | d_absorption rgb)
    for cotangent `ct` [N, 3] on the traced color."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = origin.shape[0]
    block = sublanes * LANES
    pad = (-n) % block
    npad = n + pad

    def prep_f(v, fill=0.0):
        if pad:
            v = jnp.concatenate(
                [v, jnp.full((pad,), fill, v.dtype)])
        return v.reshape(npad // LANES, LANES)

    ox, oy, oz = (prep_f(origin[:, i]) for i in range(3))
    if pad:
        dpad = jnp.concatenate(
            [direction,
             jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32),
                      (pad, 1))])
        ctpad = jnp.concatenate([ct, jnp.zeros((pad, 3), jnp.float32)])
    else:
        dpad, ctpad = direction, ct
    dx = dpad[:, 0].reshape(npad // LANES, LANES)
    dy = dpad[:, 1].reshape(npad // LANES, LANES)
    dz = dpad[:, 2].reshape(npad // LANES, LANES)
    ctr = ctpad[:, 0].reshape(npad // LANES, LANES)
    ctg = ctpad[:, 1].reshape(npad // LANES, LANES)
    ctb = ctpad[:, 2].reshape(npad // LANES, LANES)

    def prep_u32(v):
        v = jnp.broadcast_to(v, (n,)).astype(jnp.uint32)
        if pad:
            v = jnp.concatenate([v, jnp.zeros((pad,), jnp.uint32)])
        return v.reshape(npad // LANES, LANES)

    sidx = prep_u32(sample_idx)
    sd = prep_u32(seed)

    tri_tab, trin_tab, sph_tab, mat_tab = mk._scene_tables(scene)
    far_arr = jnp.reshape(
        jnp.asarray(far, jnp.float32).reshape(-1)[0], (1, 1))

    K = scene.materials.count
    B = settings.max_bounces + 1
    kernel = _make_adjoint_kernel(settings, scene.num_triangles,
                                  scene.num_spheres, K,
                                  any_transmissive=scene.any_transmissive)

    rows = npad // LANES
    grid = rows // sublanes
    ray_spec = pl.BlockSpec((sublanes, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((K, LANES), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    dmat = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[smem(far_arr), smem(tri_tab), smem(trin_tab),
                  smem(sph_tab), smem(mat_tab),
                  ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
                  ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
                  ray_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((K, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((sublanes, B * _REC_ROWS, LANES), jnp.float32),
            pltpu.VMEM((sublanes, _NGRAD, B * LANES), jnp.float32),
            pltpu.VMEM((sublanes, 2, B * LANES), jnp.float32),
        ],
        interpret=interpret,
    )(far_arr, tri_tab, trin_tab, sph_tab, mat_tab,
      ox, oy, oz, dx, dy, dz, sidx, sd, ctr, ctg, ctb)
    return dmat[:, :_NGRAD]


def material_cotangents(scene: SceneData, dmat12: jnp.ndarray):
    """Map the kernel's [K, 12] rows onto a MaterialTable cotangent.

    Emission gradients arrive w.r.t. the premultiplied rgb*intensity
    packing (megakernel._scene_tables), so chain through the product
    to the table's rgb+intensity layout."""
    mats = scene.materials
    d_e_pre = dmat12[:, 0:3]
    d_al = dmat12[:, 3:6]
    d_sp = dmat12[:, 6:9]
    d_ab = dmat12[:, 9:12]
    z = jnp.zeros
    em_rgb = mats.emissive[:, :3]
    em_int = mats.emissive[:, 3:4]
    d_emissive = jnp.concatenate(
        [d_e_pre * em_int,
         jnp.sum(d_e_pre * em_rgb, axis=1, keepdims=True)], axis=1)
    import dataclasses

    def zl(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(np.shape(x), jax.dtypes.float0)

    base = jax.tree.map(zl, mats)
    return dataclasses.replace(
        base,
        albedo=jnp.concatenate(
            [d_al, z((mats.count, 1), jnp.float32)], axis=1),
        specular=d_sp,
        emissive=d_emissive,
        absorption=d_ab,
    )
