"""Emissive-geometry light table for next-event estimation.

Capability beyond the reference (which relies purely on BRDF sampling to
find its emitters — hence the heavy noise of its small-panel Cornell
renders and Glow Orbs scene). Emissive triangles AND spheres are tabulated
at scene build with one power-proportional selection CDF
(power ~ surface_area * luminance(E * intensity)); the integrator samples
one light per diffuse bounce and MIS-combines with the cosine-sampled
continuation (balance heuristic).

Sampling measures: triangles are sampled by area (pdf converted to solid
angle with d^2/cos at the light); spheres by uniform solid angle over the
subtended cone (pdf = 1 / (2 pi (1 - cos theta_max))).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from halogen_tpu.core.math import gather_rows

_LUM = np.asarray([0.2126, 0.7152, 0.0722], np.float32)


class LightTable(NamedTuple):
    kind: jnp.ndarray  # [L] int32: 0 = triangle, 1 = sphere
    idx: jnp.ndarray  # [L] int32 index into tris / spheres
    cdf: jnp.ndarray  # [L] selection CDF (power-proportional)
    sel: jnp.ndarray  # [L] selection probability
    pdf_area: jnp.ndarray  # [L] sel/area for tris (0 for spheres)


def build_light_table(tri_verts_world, tri_material, sphere_center,
                      sphere_radius, sphere_material, emissive):
    """Returns (LightTable | None, tri_light_pdf_area [T] f32,
    sphere_light_sel [S] f32)."""
    tv = np.asarray(tri_verts_world, np.float32)
    n_tri = tv.shape[0]
    n_sph = np.asarray(sphere_radius).shape[0]
    dense_tri = np.zeros((max(n_tri, 1),), np.float32)
    dense_sph = np.zeros((max(n_sph, 1),), np.float32)

    em = np.asarray(emissive, np.float32)
    power_per_mat = (em[:, :3] @ _LUM) * em[:, 3]

    kinds, idxs, powers, areas = [], [], [], []
    if n_tri:
        e1 = tv[:, 1] - tv[:, 0]
        e2 = tv[:, 2] - tv[:, 0]
        tri_area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
        tri_power = power_per_mat[np.asarray(tri_material)] * tri_area
        for i in np.nonzero(tri_power > 0)[0]:
            kinds.append(0)
            idxs.append(i)
            powers.append(tri_power[i])
            areas.append(tri_area[i])
    if n_sph:
        r = np.asarray(sphere_radius, np.float32)
        sph_area = 4.0 * np.pi * r * r
        sph_power = power_per_mat[np.asarray(sphere_material)] * sph_area
        for i in np.nonzero(sph_power > 0)[0]:
            kinds.append(1)
            idxs.append(i)
            powers.append(sph_power[i])
            areas.append(sph_area[i])

    if not kinds:
        return None, dense_tri, dense_sph
    p = np.asarray(powers, np.float32)
    p = p / p.sum()
    pdf_area = np.where(
        np.asarray(kinds) == 0,
        p / np.maximum(np.asarray(areas, np.float32), 1e-12), 0.0
    ).astype(np.float32)
    for k, i, sel_p, pa in zip(kinds, idxs, p, pdf_area):
        if k == 0:
            dense_tri[i] = pa
        else:
            dense_sph[i] = sel_p
    return (
        LightTable(
            kind=jnp.asarray(np.asarray(kinds, np.int32)),
            idx=jnp.asarray(np.asarray(idxs, np.int32)),
            cdf=jnp.asarray(np.cumsum(p).astype(np.float32)),
            sel=jnp.asarray(p),
            pdf_area=jnp.asarray(pdf_area),
        ),
        dense_tri,
        dense_sph,
    )


def sphere_cone_pdf(sel, center, radius, from_point):
    """Solid-angle pdf of cone-sampling sphere lights from `from_point`
    (0 when the point is inside the sphere — callers fall back to MIS
    weight 1 there)."""
    d = center - from_point
    d2 = jnp.sum(d * d, axis=-1)
    sin2 = radius * radius / jnp.maximum(d2, 1e-12)
    outside = sin2 < 1.0
    cos_max = jnp.sqrt(jnp.clip(1.0 - sin2, 0.0, 1.0))
    solid = 2.0 * np.pi * (1.0 - cos_max)
    return jnp.where(outside & (solid > 1e-12), sel / jnp.maximum(solid, 1e-12),
                     0.0)


def sample_light(lights: LightTable, scene, u_sel, u1, u2):
    """Pick a light by the power CDF and sample a direction-defining point.

    Returns a dict with per-ray:
      kind, idx, point [.,3] (on the light), pdf_sa_at(pos, wi, dist) data:
      for tris: gn (unnormalized normal), pdf_area;
      for spheres: center, radius, sel.
    The caller computes wi/dist and the solid-angle pdf (it depends on the
    shading point).
    """
    li = jnp.clip(jnp.searchsorted(lights.cdf, u_sel), 0,
                  lights.kind.shape[0] - 1)
    kind = gather_rows(lights.kind, li)
    idx = gather_rows(lights.idx, li)

    # --- triangle branch: uniform barycentric point
    tidx = jnp.where(kind == 0, idx, 0)
    v = gather_rows(scene.tri_verts_world, tidx) if scene.num_triangles \
        else jnp.zeros(u_sel.shape + (3, 3), jnp.float32)
    su = jnp.sqrt(jnp.clip(u1, 0.0, 1.0))
    b0 = 1.0 - su
    b1 = su * (1.0 - u2)
    b2 = su * u2
    tri_point = (v[..., 0, :] * b0[..., None] + v[..., 1, :] * b1[..., None]
                 + v[..., 2, :] * b2[..., None])
    gn = jnp.cross(v[..., 1, :] - v[..., 0, :], v[..., 2, :] - v[..., 0, :])

    # --- sphere branch: center/radius (cone direction sampled by caller,
    # which knows the shading point)
    sidx = jnp.where(kind == 1, idx, 0)
    if scene.num_spheres:
        center = gather_rows(scene.sphere_center, sidx)
        radius = gather_rows(scene.sphere_radius, sidx)
    else:
        center = jnp.zeros(u_sel.shape + (3,), jnp.float32)
        radius = jnp.zeros(u_sel.shape, jnp.float32)

    return dict(
        kind=kind, idx=idx,
        tri_point=tri_point, gn=gn,
        pdf_area=gather_rows(lights.pdf_area, li),
        center=center, radius=radius, sel=gather_rows(lights.sel, li),
    )
