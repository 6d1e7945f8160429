"""Camera ray generation: look-at frame orthonormality, FOV/aspect frustum
geometry, thin-lens focal plane, and filter-jitter bounds
(get_ray/get_ray_jitter, HalgoenCompute.compute:984-1013)."""

import numpy as np
import jax.numpy as jnp

import halogen_tpu as ht
from halogen_tpu.integrator.camera import generate_rays, look_at_matrix
from halogen_tpu.sampler import sobol as sob


def test_look_at_orthonormal_right_handed():
    m = look_at_matrix((1, 2, 3), (4, 0, -1), up=(0, 1, 0))
    r, u, f = m[:3, 0], m[:3, 1], m[:3, 2]
    for v in (r, u, f):
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.dot(r, u), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.dot(r, f), 0.0, atol=1e-6)
    # Unity-style left-handed camera basis (+z forward into the screen,
    # like the reference): screen-right x true-up = -forward
    np.testing.assert_allclose(np.cross(r, u), -f, atol=1e-6)
    # camera looks at the target
    to_target = np.asarray([4, 0, -1], float) - np.asarray([1, 2, 3], float)
    np.testing.assert_allclose(f, to_target / np.linalg.norm(to_target),
                               atol=1e-6)


def _rays(cam, w=9, h=9, filter_radius=0.0, aspect_pixels=None):
    n = w * h
    pix = jnp.arange(n, dtype=jnp.int32)
    o, d = generate_rays(
        cam, pix % w, pix // w, w, h, filter_radius,
        jnp.zeros((n,), jnp.uint32), sob.pixel_seed(pix.astype(jnp.uint32)),
        sob.ld_sample_2d,
    )
    return np.asarray(o).reshape(h, w, 3), np.asarray(d).reshape(h, w, 3)


def test_fov_controls_frustum():
    for fov in (30.0, 60.0, 90.0):
        cam = ht.make_camera(position=(0, 0, 0), target=(0, 0, -1),
                             fov_deg=fov)
        o, d = _rays(cam)
        center, top = d[4, 4], d[8, 4]
        # center ray straight ahead
        np.testing.assert_allclose(center, [0, 0, -1], atol=1e-5)
        # vertical half-angle of the outermost pixel center:
        # (h-0.5)/h of half-fov (pixel centers, 9 rows)
        cosang = np.dot(top, center)
        expect = np.arctan((8.0 / 9.0) * np.tan(np.deg2rad(fov) / 2))
        np.testing.assert_allclose(np.arccos(np.clip(cosang, -1, 1)),
                                   expect, atol=1e-3)


def test_pinhole_shares_origin():
    cam = ht.make_camera(position=(1, 2, 3), target=(0, 0, 0),
                         aperture_deg=0.0)
    o, _ = _rays(cam)
    np.testing.assert_allclose(o, np.broadcast_to([1, 2, 3], o.shape),
                               atol=1e-5)


def test_thin_lens_converges_at_focal_plane():
    """All rays through one pixel must intersect at the focal distance."""
    cam = ht.make_camera(position=(0, 0, 0), target=(0, 0, -1),
                         focal_distance=2.0, aperture_deg=20.0)
    n = 64
    pix = jnp.full((n,), 40, jnp.int32)  # same pixel, varied samples
    o, d = generate_rays(
        cam, pix % 9, pix // 9, 9, 9, 0.0,
        jnp.arange(n, dtype=jnp.uint32),
        jnp.full((n,), 123, jnp.uint32), sob.ld_sample_2d,
    )
    o, d = np.asarray(o), np.asarray(d)
    assert np.ptp(o, axis=0).max() > 1e-4  # aperture actually samples
    # march each ray to its focal-plane depth: points must coincide
    t = 2.0 / np.maximum(-d[:, 2], 1e-9)  # plane z = -2
    pts = o + d * t[:, None]
    assert np.ptp(pts, axis=0).max() < 1e-3


def test_filter_jitter_bounded_and_centered():
    cam = ht.make_camera(position=(0, 0, 0), target=(0, 0, -1))
    n = 512
    pix = jnp.full((n,), 40, jnp.int32)
    _, d = generate_rays(
        cam, pix % 9, pix // 9, 9, 9, 1.5,
        jnp.arange(n, dtype=jnp.uint32),
        jnp.full((n,), 7, jnp.uint32), sob.ld_sample_2d,
    )
    d = np.asarray(d)
    # jittered directions scatter around the pixel center direction
    center = d.mean(axis=0)
    center /= np.linalg.norm(center)
    _, d0 = _rays(cam)
    np.testing.assert_allclose(center, d0[4, 4], atol=2e-3)
    # bounded: all samples within ~filter_radius pixels of the center
    pixel_ang = np.deg2rad(60.0) / 9  # fov/resolution
    angles = np.arccos(np.clip(d @ d0[4, 4], -1, 1))
    assert angles.max() < 2.2 * 1.5 * pixel_ang
