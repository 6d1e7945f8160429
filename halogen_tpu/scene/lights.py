"""Emissive-triangle light table for area-light next-event estimation.

Capability beyond the reference (which relies purely on BRDF sampling to
find its emitters — hence the heavy noise of its small-panel Cornell
renders). Emissive triangles are tabulated at scene build with a power-
proportional selection CDF (power ~ area * luminance(E * intensity)); the
integrator samples one per diffuse bounce and MIS-combines with the
cosine-sampled continuation (balance heuristic). Sphere emitters are not
tabulated — they keep the plain BRDF path with MIS weight 1, which stays
unbiased.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class LightTable(NamedTuple):
    tri: jnp.ndarray  # [L] int32 global triangle indices
    cdf: jnp.ndarray  # [L] selection CDF (power-proportional)
    pdf_area: jnp.ndarray  # [L] selection_prob / area (area-measure pdf)


def build_light_table(tri_verts_world: np.ndarray, tri_material: np.ndarray,
                      emissive: np.ndarray):
    """Returns (LightTable | None, tri_light_pdf_area [T] f32).

    emissive: the material table's [K, 4] rgb+intensity array.
    """
    tv = np.asarray(tri_verts_world, np.float32)
    n = tv.shape[0]
    dense = np.zeros((max(n, 1),), np.float32)
    if n == 0:
        return None, dense
    em = np.asarray(emissive, np.float32)
    lum = (em[:, :3] @ np.asarray([0.2126, 0.7152, 0.0722], np.float32))
    power_per_mat = lum * em[:, 3]
    tri_power_rgb = power_per_mat[np.asarray(tri_material)]
    e1 = tv[:, 1] - tv[:, 0]
    e2 = tv[:, 2] - tv[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    power = tri_power_rgb * area
    sel = np.nonzero(power > 0)[0]
    if sel.size == 0:
        return None, dense
    p = power[sel] / power[sel].sum()
    pdf_area = (p / np.maximum(area[sel], 1e-12)).astype(np.float32)
    dense[sel] = pdf_area
    return (
        LightTable(
            tri=jnp.asarray(sel.astype(np.int32)),
            cdf=jnp.asarray(np.cumsum(p).astype(np.float32)),
            pdf_area=jnp.asarray(pdf_area),
        ),
        dense,
    )


def sample_light_point(lights: LightTable, tri_verts_world: jnp.ndarray,
                       u_sel, u1, u2):
    """Pick an emissive triangle by the power CDF and a uniform point on it.

    Returns (point [.,3], geometric normal (unnormalized) [.,3],
    pdf_area [.], tri_global [.] i32).
    """
    li = jnp.clip(jnp.searchsorted(lights.cdf, u_sel), 0,
                  lights.tri.shape[0] - 1)
    tri = lights.tri[li]
    v = tri_verts_world[tri]  # [., 3, 3]
    # uniform barycentric via sqrt warp
    su = jnp.sqrt(jnp.clip(u1, 0.0, 1.0))
    b0 = 1.0 - su
    b1 = su * (1.0 - u2)
    b2 = su * u2
    p = (v[..., 0, :] * b0[..., None] + v[..., 1, :] * b1[..., None]
         + v[..., 2, :] * b2[..., None])
    gn = jnp.cross(v[..., 1, :] - v[..., 0, :], v[..., 2, :] - v[..., 0, :])
    return p, gn, lights.pdf_area[li], tri
