"""Envmap next-event estimation + MIS (config.env_importance_sampling):
energy conservation, unbiasedness vs plain BRDF sampling, variance
reduction on a concentrated-light envmap, and occlusion correctness."""

import numpy as np
import pytest

import halogen_tpu as ht
from halogen_tpu.scene.envmap import Envmap
from halogen_tpu.scene.material import Material
from halogen_tpu.scene.scene import Scene

CAM = ht.make_camera(position=(0, 0, 3.2), target=(0, 0, 0), fov_deg=40)
# env_mip_level=0: NEE's pdf tables describe the finest mip, so tests
# compare both estimators against the same radiance field.
BASE = ht.RenderSettings(width=24, height=24, samples_per_pixel=8,
                         max_bounces=3, ray_chunk_size=576,
                         use_envmap=True, mip_importance_bias=False,
                         env_mip_level=0)


def _spot_sky(height=32, strength=60.0):
    """Dim sky with one very bright texel band — the NEE stress case."""
    img = np.full((height, 2 * height, 3), 0.02, np.float32)
    img[height // 4, height // 2] = strength
    return Envmap.from_equirect(img, num_mips=2)


@pytest.mark.slow
def test_furnace_with_nee():
    """White furnace must stay ~1 with NEE+MIS enabled (energy check)."""
    s = Scene()
    s.add_sphere((0, 0, 0), 1.0, Material.diffuse((1.0, 1.0, 1.0)))
    scene = s.build(envmap=Envmap.constant((1.0, 1.0, 1.0)))
    st = BASE.replace(env_importance_sampling=True, max_bounces=12,
                      max_diffuse_bounces=64, samples_per_pixel=16)
    img = np.asarray(ht.render_frame(scene, CAM, st, 1))
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img.mean(), 1.0, atol=0.03)


@pytest.mark.slow
def test_nee_unbiased_vs_brdf():
    """NEE on vs off must agree in expectation (many spp, smooth sky)."""
    s = Scene()
    s.add_sphere((0, -51, 0), 50.0, Material.diffuse((0.7, 0.7, 0.7)))
    scene = s.build(envmap=Envmap.gradient_sky())
    st = BASE.replace(samples_per_pixel=64, max_bounces=2)
    a = np.asarray(ht.render_frame(scene, CAM, st, 1))
    b = np.asarray(ht.render_frame(
        scene, CAM, st.replace(env_importance_sampling=True), 1))
    assert abs(a.mean() - b.mean()) / a.mean() < 0.08


@pytest.mark.slow
def test_nee_reduces_variance_on_spot_light():
    """With a tiny bright envmap texel, NEE at low spp must be closer to
    the converged value than BRDF sampling at the same spp."""
    s = Scene()
    s.add_sphere((0, -51, 0), 50.0, Material.diffuse((0.8, 0.8, 0.8)))
    scene = s.build(envmap=_spot_sky())
    st_lo = BASE.replace(samples_per_pixel=8, max_bounces=1)

    nee = np.asarray(ht.render_frame(
        scene, CAM, st_lo.replace(env_importance_sampling=True), 1))
    brdf = np.asarray(ht.render_frame(scene, CAM, st_lo, 1))
    # converged reference: NEE at high spp across several frames
    st_hi = st_lo.replace(samples_per_pixel=64, env_importance_sampling=True)
    ref = np.mean([np.asarray(ht.render_frame(scene, CAM, st_hi, f))
                   for f in range(1, 4)], axis=0)

    floor_rows = slice(0, 10)  # lower image rows see the lit floor
    err_nee = np.abs(nee[floor_rows] - ref[floor_rows]).mean()
    err_brdf = np.abs(brdf[floor_rows] - ref[floor_rows]).mean()
    assert np.isfinite(nee).all()
    assert err_nee < err_brdf * 0.7, (err_nee, err_brdf)


@pytest.mark.slow
def test_nee_respects_occlusion():
    """A blocker between surface and the bright texel must remove the NEE
    contribution (no light leaking through geometry)."""
    def make(with_blocker):
        s = Scene()
        s.add_sphere((0, -51, 0), 50.0, Material.diffuse((0.8, 0.8, 0.8)))
        if with_blocker:
            # shell blocking the whole sky above the floor patch
            s.add_sphere((0, -0.9, 0), 0.35, Material.diffuse((0, 0, 0)))
        return s.build(envmap=_spot_sky())
    st = BASE.replace(samples_per_pixel=16, max_bounces=1,
                      env_importance_sampling=True)
    open_img = np.asarray(ht.render_frame(make(False), CAM, st, 1))
    blocked = np.asarray(ht.render_frame(make(True), CAM, st, 1))
    # the floor directly under the blocker is darker
    assert blocked.mean() < open_img.mean()
    assert np.isfinite(blocked).all()
