"""Integration tests for the full light-transport loop (SURVEY.md §4b):
furnace energy conservation, emission visibility, golden-statistics
regression on the Cornell fixture, debug views, and ablation flags."""

import numpy as np
import jax.numpy as jnp
import pytest

import halogen_tpu as ht
from halogen_tpu.config import DebugMode, Intersector, SamplerKind
from halogen_tpu.scene import cornell
from halogen_tpu.scene.envmap import Envmap
from halogen_tpu.scene.material import Material
from halogen_tpu.scene.scene import Scene


CAM = ht.make_camera(position=(0, 0, 3.2), target=(0, 0, 0))
BASE = ht.RenderSettings(width=32, height=32, samples_per_pixel=4,
                         max_bounces=4, ray_chunk_size=1024)


def _render(scene, st=BASE, cam=CAM, frame=1):
    return np.asarray(ht.render_frame(scene, cam, st, frame))


def test_white_furnace():
    """A perfectly white diffuse sphere inside a uniform L=1 environment
    must render to ~1 everywhere (energy conservation of the
    cosine-sampled lambertian scatter + RR compensation)."""
    s = Scene()
    s.add_sphere((0, 0, 0), 1.0, Material.diffuse((1.0, 1.0, 1.0)))
    scene = s.build(envmap=Envmap.constant((1.0, 1.0, 1.0)))
    st = BASE.replace(use_envmap=True, max_bounces=12,
                      max_diffuse_bounces=64, samples_per_pixel=16,
                      mip_importance_bias=False)
    img = _render(scene, st)
    assert not np.isnan(img).any()
    np.testing.assert_allclose(img.mean(), 1.0, atol=0.02)
    # per-pixel: also close (variance should be tiny in a furnace)
    assert np.abs(img - 1.0).max() < 0.2


def test_emissive_direct_visibility():
    """An emissive surface must show emission*intensity when seen directly."""
    s = Scene()
    s.add_sphere((0, 0, 0), 1.0, Material.emissive((0.5, 0.25, 0.125), 4.0))
    scene = s.build()
    img = _render(scene)
    center = img[16, 16]
    np.testing.assert_allclose(center, [2.0, 1.0, 0.5], rtol=1e-4)


def test_black_scene_is_black():
    s = Scene()
    s.add_sphere((0, 0, 0), 1.0, Material.diffuse((0.0, 0.0, 0.0)))
    img = _render(s.build())
    assert img.max() == 0.0


def test_cornell_golden_statistics():
    """Statistical golden for the Cornell fixture: mean brightness and
    left/right color split (red wall left, green wall right) must hold.
    Guards against sign/axis/material regressions without storing images.

    FOV 40 keeps the frustum inside the box opening (tan(20°)*2.2 < 1),
    so every primary ray lands inside the box and the ceiling light panel
    projects into the top image rows."""
    scene = cornell.cornell_box().build()
    cam = ht.make_camera(position=(0, 0, 3.2), target=(0, 0, 0), fov_deg=40)
    st = BASE.replace(samples_per_pixel=16, max_bounces=6)
    img = _render(scene, st, cam)
    assert not np.isnan(img).any()
    assert 0.1 < img.mean() < 0.6, img.mean()
    left = img[:, :10]
    right = img[:, -10:]
    # indirect bleeding: left half redder, right half greener
    assert left[..., 0].mean() > left[..., 1].mean()
    assert right[..., 1].mean() > right[..., 0].mean()
    # light panel at top is the brightest region
    assert img[-6:, 8:-8].mean() > img[8:16, 8:-8].mean()


@pytest.mark.slow
def test_brute_and_bvh_render_identically():
    scene = cornell.cornell_box().build()
    a = _render(scene, BASE.replace(intersector=Intersector.BRUTE))
    b = _render(scene, BASE.replace(intersector=Intersector.BVH))
    np.testing.assert_allclose(a, b, atol=5e-3, rtol=1e-3)


@pytest.mark.slow
def test_accumulation_matches_mean():
    """Progressive EMA accumulation must equal the arithmetic mean of the
    individual frames (AccumulationShader semantics)."""
    scene = cornell.cornell_box().build()
    st = BASE.replace(max_accumulated_frames=3, unlimited_sampling=False)
    r = ht.Renderer(scene, CAM, st)
    frames = [np.asarray(ht.render_frame(scene, CAM, st, k)) for k in (1, 2, 3)]
    img = r.render()
    np.testing.assert_allclose(img, np.mean(frames, axis=0), atol=1e-5)


@pytest.mark.slow
def test_transparency_alpha_blend():
    """opacity=0 sphere in front of an emissive wall: rays pass through
    (with IOR 1 nothing bends) and see the emitter."""
    s = Scene()
    s.add_sphere((0, 0, 1.0), 0.5,
                 Material(color=(1, 1, 1), opacity=0.0, roughness=0.0,
                          index_of_refraction=1.0, dielectric_priority=-1))
    s.add_sphere((0, 0, -2.0), 1.0, Material.emissive((1, 1, 1), 2.0))
    img = _render(s.build(), BASE.replace(max_transmission_bounces=12))
    center = img[16, 16]
    np.testing.assert_allclose(center, [2.0, 2.0, 2.0], rtol=0.05)


def test_absorption_darkens():
    """Beer-Lambert: higher absorption -> darker glass."""
    def make(absorb):
        s = Scene()
        s.add_sphere((0, 0, 1.0), 0.6,
                     Material.glass(ior=1.0, subsurface=(1, 1, 1),
                                    absorption=absorb))
        s.add_sphere((0, 0, -2.0), 1.0, Material.emissive((1, 1, 1), 2.0))
        return s.build()
    st = BASE.replace(max_transmission_bounces=12)
    clear = _render(make(0.0), st)[16, 16].mean()
    dark = _render(make(2.0), st)[16, 16].mean()
    assert dark < clear * 0.5
    assert clear > 1.0


@pytest.mark.slow
def test_nested_dielectric_priority_skips_interface():
    """A low-precedence (higher value) inner interface inside a
    high-precedence medium must be ignored (false hit): the render with
    the redundant inner shell must equal the render without it."""
    def make(with_inner):
        s = Scene()
        outer = Material.glass(ior=1.5, priority=0)
        s.add_sphere((0, 0, 0.5), 0.8, outer)
        if with_inner:
            # lower precedence: never a true hit while inside the outer
            inner = Material(color=(1, 0, 0), opacity=0.0, roughness=0.0,
                             index_of_refraction=3.0, dielectric_priority=5)
            s.add_sphere((0, 0, 0.5), 0.4, inner)
        s.add_sphere((0, 0, -2.5), 1.2, Material.emissive((1, 1, 1), 2.0))
        return s.build()
    st = BASE.replace(max_transmission_bounces=12, samples_per_pixel=4)
    a = _render(make(False), st)
    b = _render(make(True), st)
    np.testing.assert_allclose(a, b, atol=1e-4)


@pytest.mark.slow
def test_bounce_limits_cut_paths():
    """max_bounces=0 (first interaction only) must kill all indirect
    light: a diffuse box lit only by a panel shows just the panel."""
    scene = cornell.cornell_box().build()
    img0 = _render(scene, BASE.replace(max_bounces=0))
    imgN = _render(scene, BASE.replace(max_bounces=6, samples_per_pixel=8))
    assert img0.mean() < imgN.mean()
    # with 0 bounces only directly-visible emission remains
    assert img0[img0 > 0].size < imgN[imgN > 0].size


@pytest.mark.slow
def test_debug_views_shapes_and_ranges():
    scene = cornell.cornell_box().build()
    for mode in (DebugMode.ALBEDO, DebugMode.NORMAL,
                 DebugMode.RAY_TRIANGLE_TESTS, DebugMode.RAY_BOX_TESTS,
                 DebugMode.COMBINED):
        img = _render(scene, BASE.replace(debug_mode=mode,
                                          samples_per_pixel=1))
        assert img.shape == (32, 32, 3)
        assert np.isfinite(img).all()
        assert img.min() >= 0.0


@pytest.mark.slow
def test_sampler_ablation_agrees():
    """Sobol and PRNG must converge to the same image (unbiasedness A/B,
    the OVERRIDE_SAMPLING_TO_PRNG ablation)."""
    scene = cornell.cornell_box().build()
    st = BASE.replace(samples_per_pixel=64, max_bounces=3)
    a = _render(scene, st)
    b = _render(scene, st.replace(sampler=SamplerKind.PRNG))
    assert abs(a.mean() - b.mean()) / a.mean() < 0.1


@pytest.mark.slow
def test_rr_unbiased():
    """Russian roulette on vs off must agree in expectation."""
    scene = cornell.cornell_box().build()
    st = BASE.replace(samples_per_pixel=64, max_bounces=4)
    a = _render(scene, st)
    b = _render(scene, st.replace(russian_roulette=False))
    assert abs(a.mean() - b.mean()) / b.mean() < 0.15


def test_thin_lens_defocus():
    """Nonzero aperture must blur geometry away from the focal plane."""
    s = Scene()
    s.add_sphere((0, 0, 0), 0.4, Material.emissive((1, 1, 1), 5.0))
    scene = s.build()
    sharp_cam = ht.make_camera(position=(0, 0, 3.2), target=(0, 0, 0),
                               aperture_deg=0.0)
    blur_cam = ht.make_camera(position=(0, 0, 3.2), target=(0, 0, 0),
                              focal_distance=0.5, aperture_deg=10.0)
    st = BASE.replace(samples_per_pixel=32, max_bounces=0)
    sharp = _render(scene, st, sharp_cam)
    blur = _render(scene, st, blur_cam)
    # blur spreads energy: more nonzero pixels, lower peak
    assert (blur.mean(-1) > 0.01).sum() > (sharp.mean(-1) > 0.01).sum()


@pytest.mark.slow
def test_envmap_mip_bias_rough_vs_sharp():
    """The QUESTIONABLE_IMPORTANCE_SAMPLING mip trick: after a rough
    bounce the sky lookup should use a coarser mip than after a sharp
    one. Proxy check: rough-floor scene renders without error with and
    without the flag, and they differ."""
    s = Scene()
    s.add_sphere((0, -51, 0), 50.0, Material.diffuse((0.8, 0.8, 0.8)))
    env = Envmap.gradient_sky()
    scene = s.build(envmap=env)
    st = BASE.replace(use_envmap=True, samples_per_pixel=8)
    a = _render(scene, st)
    b = _render(scene, st.replace(mip_importance_bias=False))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert a.mean() > 0.05 and b.mean() > 0.05
