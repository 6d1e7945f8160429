"""Multi-device tests on the 8-way virtual CPU mesh (SURVEY.md §4d):
sharded renders must be placement-invariant and match the single-device
image; the sharded train step must reduce gradients across the mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import halogen_tpu as ht
from halogen_tpu.scene import cornell
from halogen_tpu.parallel.sharding import (
    make_render_mesh,
    render_frame_sharded,
    train_step_sharded,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

CAM = ht.make_camera(position=(0, 0, 3.2), target=(0, 0, 0), fov_deg=40)
ST = ht.RenderSettings(width=24, height=24, samples_per_pixel=8,
                       max_bounces=3, ray_chunk_size=256)


@pytest.fixture(scope="module")
def scene():
    return cornell.cornell_box().build()


@pytest.fixture(scope="module")
def reference_img(scene):
    return np.asarray(ht.render_frame(scene, CAM, ST, 1))


@pytest.mark.parametrize("px,spp", [(8, 1), (4, 2), (2, 4), (1, 8)])
@pytest.mark.slow
def test_sharded_matches_single_device(scene, reference_img, px, spp):
    """The image must be identical (up to reduction order) for every mesh
    shape — pixel shards, spp shards, and mixes."""
    mesh = make_render_mesh(px, spp)
    img = np.asarray(render_frame_sharded(scene, CAM, ST, 1, mesh))
    np.testing.assert_allclose(img, reference_img, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_sharded_nondivisible_pixels(scene):
    """Pixel counts not divisible by the shard count must pad correctly."""
    st = ST.replace(width=17, height=9, ray_chunk_size=64)
    mesh = make_render_mesh(8, 1)
    a = np.asarray(render_frame_sharded(scene, CAM, st, 1, mesh))
    b = np.asarray(ht.render_frame(scene, CAM, st, 1))
    assert a.shape == (9, 17, 3)
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_train_step_sharded_reduces_loss(scene):
    """One sharded SGD step toward a black target must darken emissive
    materials and report a finite psum'd loss."""
    mesh = make_render_mesh(4, 2)
    target = jnp.zeros((ST.height, ST.width, 3), jnp.float32)
    mats = scene.materials
    new_mats, loss = train_step_sharded(
        mats, scene, CAM, ST.replace(samples_per_pixel=8), target, 1, mesh,
        lr=1e-1,
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    # emission should move down (toward the black target)
    assert float(jnp.sum(new_mats.emissive)) < float(jnp.sum(mats.emissive))
    # integer leaves untouched
    np.testing.assert_array_equal(np.asarray(new_mats.priority),
                                  np.asarray(mats.priority))


@pytest.mark.slow
def test_train_step_matches_unsharded_grads(scene):
    """psum'd sharded gradients == single-device gradients."""
    from halogen_tpu.parallel.sharding import _padded_pixels
    st = ST.replace(samples_per_pixel=4)
    target = jnp.zeros((st.height, st.width, 3), jnp.float32)

    mesh1 = make_render_mesh(1, 1, devices=jax.devices()[:1])
    mesh8 = make_render_mesh(4, 2)
    m1, l1 = train_step_sharded(scene.materials, scene, CAM, st, target, 1,
                                mesh1)
    m8, l8 = train_step_sharded(scene.materials, scene, CAM, st, target, 1,
                                mesh8)
    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    # px sharding is bitwise; spp sharding only reorders the per-lane grad
    # summation, so tolerances are fp-noise tight.
    for a, b in zip(jax.tree.leaves(m1), jax.tree.leaves(m8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


@pytest.mark.slow
def test_sharded_env_grads_match_unsharded():
    """Sharded envmap-texel gradients == single-device gradients: the
    replicated env texture's cotangents ride the same psum all-reduce as
    material grads (r4's sharded-fit NotImplementedError removed)."""
    from halogen_tpu.diff.grad import material_params, render_loss
    from halogen_tpu.parallel.sharding import loss_and_grads_sharded
    from halogen_tpu.scene.envmap import Envmap

    scene_env = cornell.cornell_box().build(envmap=Envmap.gradient_sky())
    st = ST.replace(samples_per_pixel=4, use_envmap=True)
    target = jnp.zeros((st.height, st.width, 3), jnp.float32)
    params = {
        "material_params": material_params(scene_env.materials),
        "env_mips": scene_env.env_mips,
    }

    def to_render_params(p):
        import dataclasses

        from halogen_tpu.diff.grad import with_material_params

        return {
            "materials": with_material_params(
                scene_env.materials, p["material_params"]),
            "env_mips": p["env_mips"],
        }

    l1, g1 = jax.value_and_grad(
        lambda p: render_loss(to_render_params(p), scene_env, CAM, st,
                              target, 1))(params)
    mesh8 = make_render_mesh(4, 2)
    l8, g8 = loss_and_grads_sharded(params, scene_env, CAM, st, target,
                                    1, mesh8)
    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    env1 = g1["env_mips"]
    env8 = g8["env_mips"]
    assert any(float(jnp.abs(m).sum()) > 0 for m in env1), \
        "env grads unexpectedly all-zero"
    for a, b in zip(jax.tree.leaves(env1), jax.tree.leaves(env8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-3)
    for a, b in zip(jax.tree.leaves(g1["material_params"]),
                    jax.tree.leaves(g8["material_params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)
