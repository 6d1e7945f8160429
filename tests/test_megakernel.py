"""Fused-bounce Pallas megakernel (interpret mode on CPU): primals must
match the lockstep tracer, gradients must match the lockstep replay, and
the render_pixels dispatch must route eligible scenes through it.

TPU-mode parity + throughput evidence is recorded separately by
scripts/tpu_evidence.py (committed as PERF.md / perf artifacts) since CI
here runs on the virtual CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import halogen_tpu as ht
from halogen_tpu.config import Fused, SamplerKind
from halogen_tpu.integrator.camera import generate_rays
from halogen_tpu.integrator.trace import render_pixels, trace_rays
from halogen_tpu.kernels.megakernel import (
    MAX_TRIS,
    fused_supported,
    trace_color_fused,
    trace_color_fused_diff,
)
from halogen_tpu.sampler import sobol as sob
from halogen_tpu.scene import cornell
from halogen_tpu.scene.envmap import Envmap

CAM = ht.make_camera(position=(0, 0, 3.2), target=(0, 0, 0), fov_deg=40)


def _rays(settings, w=16, frame=0):
    n = w * w
    pix = jnp.arange(n, dtype=jnp.int32)
    seed = sob.pixel_seed(pix.astype(jnp.uint32))
    sidx = sob.sample_index(jnp.uint32(frame), jnp.uint32(0),
                            settings.samples_per_pixel)
    o, d = generate_rays(CAM, pix % w, pix // w, w, w,
                         settings.filter_radius, sidx, seed,
                         sob.ld_sample_2d)
    far = jnp.broadcast_to(CAM.far, (n,))
    return o, d, far, sidx, seed


@pytest.mark.parametrize("sampler,rr", [
    (SamplerKind.SOBOL, True),
    (SamplerKind.SOBOL, False),
    (SamplerKind.PRNG, True),
])
@pytest.mark.slow
def test_fused_matches_lockstep(sampler, rr):
    scene = cornell.cornell_box(glossy=True).build()
    settings = ht.RenderSettings(width=16, height=16, max_bounces=4,
                                 sampler=sampler, russian_roulette=rr)
    assert fused_supported(scene, settings)
    o, d, far, sidx, seed = _rays(settings)
    ref = trace_rays(scene, o, d, far, sidx, seed, settings).color
    fus = trace_color_fused(scene, o, d, CAM.far, sidx, seed, settings)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fus),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_fused_bounce_limits():
    """Per-type bounce limits with `>` semantics must agree."""
    scene = cornell.cornell_box(glossy=True).build()
    settings = ht.RenderSettings(
        width=12, height=12, max_bounces=6, max_diffuse_bounces=1,
        max_glossy_bounces=2, russian_roulette=False)
    o, d, far, sidx, seed = _rays(settings, w=12)
    ref = trace_rays(scene, o, d, far, sidx, seed, settings).color
    fus = trace_color_fused(scene, o, d, CAM.far, sidx, seed, settings)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fus),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("rr,glass", [
    (False, False), (True, False), (True, True),
])
def test_fused_gradients_match_lockstep(rr, glass):
    """trace_color_fused_diff: fused forward, fused path-replay adjoint
    backward (kernels/adjoint.py) on eligible scenes. Material-parameter
    gradients must equal the lockstep tracer's vjp — including the
    un-detached Russian-roulette 1/max(atten) chain (rr=True) and the
    nested-dielectric path where Beer-Lambert absorption gradients route
    to the CURRENT medium's material (glass=True)."""
    import dataclasses

    from halogen_tpu.kernels import adjoint as adj

    scene = (cornell.glass_sphere_box() if glass
             else cornell.cornell_box(glossy=True)).build()
    settings = ht.RenderSettings(width=8, height=8, max_bounces=3,
                                 russian_roulette=rr)
    assert adj.adjoint_supported(scene, settings)
    o, d, far, sidx, seed = _rays(settings, w=8)

    def swap(mats):
        return dataclasses.replace(scene, materials=mats)

    def loss_fused(mats):
        col = trace_color_fused_diff(
            swap(mats), o, d, CAM.far, sidx, seed, settings)
        return jnp.sum(col ** 2)

    def loss_ref(mats):
        col = trace_rays(swap(mats), o, d, far, sidx, seed, settings).color
        return jnp.sum(col ** 2)

    g_f = jax.grad(loss_fused, allow_int=True)(scene.materials)
    g_r = jax.grad(loss_ref, allow_int=True)(scene.materials)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_r)):
        if a.dtype == jax.dtypes.float0:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_render_pixels_fused_dispatch_matches():
    """render_pixels with Fused.FORCE must match Fused.OFF on an eligible
    scene (the AUTO dispatch contract, minus the TPU-backend gate)."""
    scene = cornell.cornell_box(glossy=True).build()
    st = ht.RenderSettings(width=12, height=12, samples_per_pixel=2,
                           max_bounces=3)
    pix = jnp.arange(144, dtype=jnp.int32)
    a = render_pixels(scene, CAM, st.replace(fused=Fused.OFF),
                      jnp.uint32(1), pix)
    b = render_pixels(scene, CAM, st.replace(fused=Fused.FORCE),
                      jnp.uint32(1), pix)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


def test_fused_eligibility_gates():
    """NEE scenes and big scenes must be rejected statically; glass and
    plain envmap scenes are in scope."""
    st = ht.RenderSettings()
    glass = cornell.glass_sphere_box().build()
    assert fused_supported(glass, st)  # in-kernel medium stack
    env_scene = cornell.cornell_box().build(envmap=Envmap.gradient_sky())
    assert fused_supported(env_scene, st.replace(use_envmap=True))
    # envmap NEE runs fused on the brute tier (in-kernel shadow rays)
    # AND on the raylet tier (occlusion-mode worklist traversal)
    assert fused_supported(env_scene, st.replace(
        use_envmap=True, env_importance_sampling=True))
    from halogen_tpu.scene.meshes import dragons_hero_scene
    big = dragons_hero_scene(1, tris=1280).build(
        envmap=Envmap.gradient_sky())
    assert fused_supported(big, st.replace(use_envmap=True))
    assert fused_supported(big, st.replace(
        use_envmap=True, env_importance_sampling=True))
    # debug views -> lockstep only
    assert not fused_supported(glass, st.replace(
        debug_mode=ht.DebugMode.ALBEDO))
    ok = cornell.cornell_box(glossy=True).build()
    assert fused_supported(ok, st)
    assert ok.num_triangles <= MAX_TRIS


@pytest.mark.slow
def test_fused_glass_matches_lockstep():
    """Nested-dielectric path (in-kernel medium stack): bit-parity with
    the lockstep tracer on the glass-in-glass fixture. stack_depth=4 is
    exact here (nesting never exceeds 3) and keeps the interpret-mode
    compile small."""
    from halogen_tpu.kernels.megakernel import trace_color_fused as tcf

    scene = cornell.glass_sphere_box().build()
    settings = ht.RenderSettings(width=8, height=8, max_bounces=4)
    o, d, far, sidx, seed = _rays(settings, w=8)
    ref = trace_rays(scene, o, d, far, sidx, seed, settings).color
    fus = tcf(scene, o, d, CAM.far, sidx, seed, settings, stack_depth=4)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fus),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_fused_envmap_matches_lockstep():
    """Deferred-miss environment shading (incl. the accumulated-roughness
    mip bias) must match the lockstep tracer's in-loop sky sampling."""
    scene = cornell.cornell_box(glossy=True).build(
        envmap=Envmap.gradient_sky())
    settings = ht.RenderSettings(width=8, height=8, max_bounces=3,
                                 use_envmap=True, env_mip_level=1)
    o, d, far, sidx, seed = _rays(settings, w=8)
    ref = trace_rays(scene, o, d, far, sidx, seed, settings).color
    fus = trace_color_fused(scene, o, d, CAM.far, sidx, seed, settings)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fus),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_fused_raylet_env_nee_matches_lockstep():
    """Big scenes under a sky WITH envmap importance sampling stay on
    the fused path (VERDICT r4 item 4): the raylet tier's shadow rays
    run the same in-kernel worklist traversal in occlusion mode. The
    radiance must match the lockstep tracer's NEE+MIS to float
    tolerance (the reference's OutdoorsScene configuration: dragon +
    HDRI, Testing Scene.unity)."""
    from halogen_tpu.scene import meshes

    scene = meshes.dragons_hero_scene(1, tris=1280).build(
        envmap=Envmap.gradient_sky())
    cam = ht.make_camera(position=(0, 1.5, 5.0), target=(0, -0.3, 0),
                         fov_deg=45)
    settings = ht.RenderSettings(width=12, height=12, max_bounces=3,
                                 use_envmap=True,
                                 env_importance_sampling=True)
    assert fused_supported(scene, settings)
    n = 144
    pix = jnp.arange(n, dtype=jnp.int32)
    seed = sob.pixel_seed(pix.astype(jnp.uint32))
    sidx = sob.sample_index(jnp.uint32(1), jnp.uint32(0),
                            settings.samples_per_pixel)
    o, d = generate_rays(cam, pix % 12, pix // 12, 12, 12,
                         settings.filter_radius, sidx, seed,
                         sob.ld_sample_2d)
    far = jnp.broadcast_to(cam.far, (n,))
    ref = trace_rays(scene, o, d, far, sidx, seed, settings).color
    fus = trace_color_fused(scene, o, d, cam.far, sidx, seed, settings)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fus),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_fused_traversal_matches_lockstep():
    """>MAX_TRIS scenes take the in-kernel skip-link treelet traversal
    tier (VMEM-resident tables); radiance must match the lockstep tracer
    (which itself routes through intersect_bvh on CPU) to float
    tolerance. Matches the reference's in-megakernel BVH traversal
    (HalgoenCompute.compute:876-950 -> :378-472)."""
    from halogen_tpu.scene import meshes

    scene = meshes.dragons_hero_scene(1, tris=1280).build(
        envmap=Envmap.gradient_sky())
    assert scene.num_triangles > 128
    cam = ht.make_camera(position=(0, 1.5, 5.0), target=(0, -0.3, 0),
                         fov_deg=45)
    settings = ht.RenderSettings(width=12, height=12, max_bounces=3,
                                 use_envmap=True)
    assert fused_supported(scene, settings)
    n = 144
    pix = jnp.arange(n, dtype=jnp.int32)
    seed = sob.pixel_seed(pix.astype(jnp.uint32))
    sidx = sob.sample_index(jnp.uint32(1), jnp.uint32(0),
                            settings.samples_per_pixel)
    o, d = generate_rays(cam, pix % 12, pix // 12, 12, 12,
                         settings.filter_radius, sidx, seed,
                         sob.ld_sample_2d)
    far = jnp.broadcast_to(cam.far, (n,))
    ref = trace_rays(scene, o, d, far, sidx, seed, settings).color
    fus = trace_color_fused(scene, o, d, cam.far, sidx, seed, settings)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fus),
                               atol=1e-5, rtol=1e-5)
