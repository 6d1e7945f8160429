"""Area-light NEE + MIS (config.light_importance_sampling): unbiasedness
vs plain BRDF sampling on the Cornell fixture, variance reduction at low
spp, occlusion, and direct-visibility weighting."""

import numpy as np
import pytest

import halogen_tpu as ht
from halogen_tpu.scene import cornell
from halogen_tpu.scene.material import Material
from halogen_tpu.scene.scene import Scene

CAM = ht.make_camera(position=(0, 0, 3.2), target=(0, 0, 0), fov_deg=40)
BASE = ht.RenderSettings(width=24, height=24, samples_per_pixel=8,
                         max_bounces=4, ray_chunk_size=576)


def test_light_table_built():
    scene = cornell.cornell_box().build()
    assert scene.lights is not None
    # the panel's 2 triangles are the only emitters
    assert scene.lights.idx.shape[0] == 2
    assert (np.asarray(scene.lights.kind) == 0).all()
    assert float(scene.tri_light_pdf_area.max()) > 0


@pytest.mark.slow
def test_direct_view_unchanged():
    """A camera ray hitting the panel directly must show full emission
    (weight 1 — no previous diffuse bounce)."""
    s = Scene()
    v = np.array([(-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0)], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    s.add_mesh(v, f, Material.emissive((1.0, 0.5, 0.25), 2.0))
    scene = s.build()
    st = BASE.replace(max_bounces=0, samples_per_pixel=1)
    a = np.asarray(ht.render_frame(scene, CAM, st, 1))
    b = np.asarray(ht.render_frame(
        scene, CAM, st.replace(light_importance_sampling=True), 1))
    np.testing.assert_allclose(a[12, 12], [2.0, 1.0, 0.5], rtol=1e-4)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_nee_unbiased_on_cornell():
    """NEE on vs off must agree in expectation on the Cornell box."""
    scene = cornell.cornell_box().build()
    st = BASE.replace(samples_per_pixel=96, max_bounces=3)
    a = np.asarray(ht.render_frame(scene, CAM, st, 1))
    b = np.asarray(ht.render_frame(
        scene, CAM, st.replace(light_importance_sampling=True), 1))
    assert np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) / a.mean() < 0.06, (a.mean(), b.mean())


@pytest.mark.slow
def test_nee_reduces_cornell_noise():
    """At low spp, the NEE render must be closer to a converged reference
    than the BRDF-only render (the whole point: the panel is small)."""
    scene = cornell.cornell_box().build()
    lo = BASE.replace(samples_per_pixel=4, max_bounces=3)
    nee = np.asarray(ht.render_frame(
        scene, CAM, lo.replace(light_importance_sampling=True), 1))
    brdf = np.asarray(ht.render_frame(scene, CAM, lo, 1))
    hi = lo.replace(samples_per_pixel=64, light_importance_sampling=True)
    ref = np.mean([np.asarray(ht.render_frame(scene, CAM, hi, f))
                   for f in range(1, 4)], axis=0)
    err_nee = np.abs(nee - ref).mean()
    err_brdf = np.abs(brdf - ref).mean()
    assert err_nee < err_brdf * 0.75, (err_nee, err_brdf)


@pytest.mark.slow
def test_nee_respects_occlusion():
    """A plate between the floor and the panel must shadow the NEE term."""
    def make(with_blocker):
        s = cornell.cornell_box(with_spheres=False)
        if with_blocker:
            v = np.array([(-0.5, 0.2, -0.5), (0.5, 0.2, -0.5),
                          (0.5, 0.2, 0.5), (-0.5, 0.2, 0.5)], np.float32)
            f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
            s.add_mesh(v, f, Material.diffuse((0.1, 0.1, 0.1)))
        return s.build()
    st = BASE.replace(samples_per_pixel=16, max_bounces=2,
                      light_importance_sampling=True)
    open_img = np.asarray(ht.render_frame(make(False), CAM, st, 1))
    blocked = np.asarray(ht.render_frame(make(True), CAM, st, 1))
    # floor region (bottom rows) loses its direct panel light
    assert blocked[:8].mean() < open_img[:8].mean() * 0.7
    assert np.isfinite(blocked).all()


@pytest.mark.slow
def test_wavefront_parity_with_light_nee():
    scene = cornell.cornell_box().build()
    st = BASE.replace(light_importance_sampling=True, samples_per_pixel=4,
                      wavefront_block=256)
    a = np.asarray(ht.render_frame(scene, CAM, st, 1))
    b = np.asarray(ht.render_frame(scene, CAM, st.replace(wavefront=True), 1))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_sphere_emitter_nee():
    """Emissive SPHERE (the reference's Glow Orbs case): NEE on/off must
    agree in expectation, and NEE must cut low-spp error."""
    s = Scene()
    # dim box room lit by one small bright orb
    from halogen_tpu.scene.cornell import cornell_box
    sb = cornell_box(light_intensity=0.0, with_spheres=False)
    sb.add_sphere((0.0, 0.5, 0.0), 0.12, Material.emissive((1, 1, 1), 40.0))
    scene = sb.build()
    lo = BASE.replace(samples_per_pixel=4, max_bounces=3)
    nee = np.asarray(ht.render_frame(
        scene, CAM, lo.replace(light_importance_sampling=True), 1))
    brdf = np.asarray(ht.render_frame(scene, CAM, lo, 1))
    hi = lo.replace(samples_per_pixel=96, light_importance_sampling=True)
    ref = np.mean([np.asarray(ht.render_frame(scene, CAM, hi, f))
                   for f in range(1, 3)], axis=0)
    assert np.isfinite(nee).all()
    err_nee = np.abs(nee - ref).mean()
    err_brdf = np.abs(brdf - ref).mean()
    assert err_nee < err_brdf * 0.8, (err_nee, err_brdf)
    # unbiasedness at high spp
    hi_brdf = np.asarray(ht.render_frame(
        scene, CAM, lo.replace(samples_per_pixel=96), 1))
    assert abs(hi_brdf.mean() - ref.mean()) / ref.mean() < 0.1


@pytest.mark.slow
def test_mixed_tri_and_sphere_lights():
    """Panel + orb together: the power CDF covers both; image stays
    unbiased vs BRDF-only."""
    sb = cornell.cornell_box(light_intensity=5.0, with_spheres=False)
    sb.add_sphere((0.5, -0.5, 0.3), 0.15, Material.emissive((1, 0.3, 0.1), 20.0))
    scene = sb.build()
    assert scene.lights is not None and scene.lights.kind.shape[0] == 3
    st = BASE.replace(samples_per_pixel=64, max_bounces=3)
    a = np.asarray(ht.render_frame(scene, CAM, st, 1))
    b = np.asarray(ht.render_frame(
        scene, CAM, st.replace(light_importance_sampling=True), 1))
    assert np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) / a.mean() < 0.08, (a.mean(), b.mean())
