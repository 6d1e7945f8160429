"""Differentiable rendering (component #16 — absent in the reference).

The forward renderer is written so that reverse-mode AD yields the
detached-sampling path-gradient estimator: path geometry and discrete
sampling decisions (BRDF lobe choice, Russian-roulette survival, the
deterministic Sobol stream) are treated as fixed, and gradients flow
through the throughput product — emission, albedo/specular attenuation,
Beer-Lambert absorption, and environment radiance. The bounce scan is
`jax.checkpoint`-ed, so the backward pass re-traces each path segment
instead of storing it — path-replay backpropagation, with memory O(ray
batch) rather than O(ray batch x bounces).

Gradients are exact (match finite differences) for parameters that enter
the estimate smoothly — emission, albedo, specular, absorption, envmap
texels — given a fixed sample set; parameters that move discontinuity
boundaries (metallic/opacity thresholds, IOR through refraction
directions) get the standard detached-estimator bias.
"""

from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp

from halogen_tpu.config import RenderSettings
from halogen_tpu.core.types import MaterialTable, SceneData
from halogen_tpu.integrator.camera import Camera
from halogen_tpu.integrator.trace import render_frame


def render_with_materials(
    materials: MaterialTable,
    scene: SceneData,
    camera: Camera,
    settings: RenderSettings,
    frame=0,
) -> jnp.ndarray:
    """Forward render as a function of the differentiable material table."""
    scene = dataclasses.replace(scene, materials=materials)
    return render_frame(scene, camera, settings, frame)


def render_with_params(
    params: dict,
    scene: SceneData,
    camera: Camera,
    settings: RenderSettings,
    frame=0,
) -> jnp.ndarray:
    """Forward render over a param dict {"materials": MaterialTable,
    "env_mips": tuple} — the full differentiable surface."""
    scene = dataclasses.replace(
        scene,
        materials=params.get("materials", scene.materials),
        env_mips=params.get("env_mips", scene.env_mips),
    )
    return render_frame(scene, camera, settings, frame)


@partial(jax.jit, static_argnames=("settings",))
def render_loss(
    params: dict,
    scene: SceneData,
    camera: Camera,
    settings: RenderSettings,
    target: jnp.ndarray,
    frame=0,
) -> jnp.ndarray:
    """MSE image loss against a target render/photo."""
    img = render_with_params(params, scene, camera, settings, frame)
    return jnp.mean((img - target) ** 2)


@partial(jax.jit, static_argnames=("settings",))
def render_loss_grad(
    params: dict,
    scene: SceneData,
    camera: Camera,
    settings: RenderSettings,
    target: jnp.ndarray,
    frame=0,
):
    """(loss, grads) via path-replay backprop. allow_int: MaterialTable
    carries int32 id/priority leaves whose grads come back as float0."""
    return jax.value_and_grad(
        lambda p: render_loss(p, scene, camera, settings, target, frame),
        allow_int=True,
    )(params)


# Differentiable (float) fields of the material table; ids/priorities are
# structural int32 and excluded from the optimization surface.
FLOAT_MATERIAL_FIELDS = (
    "albedo", "specular", "metallic", "roughness", "emissive", "ior",
    "absorption",
)


def material_params(materials: MaterialTable) -> dict:
    """Float-only param dict for optimizers (optax-safe)."""
    return {f: getattr(materials, f) for f in FLOAT_MATERIAL_FIELDS}


def with_material_params(materials: MaterialTable, params: dict) -> MaterialTable:
    return dataclasses.replace(materials, **params)


def make_optimizer(lr: float = 5e-2):
    import optax

    return optax.adam(lr)


def project_material_params(params: dict) -> dict:
    """Clamp a float-material param dict to physical ranges (the inspector
    ranges of HalogenMaterial, RayTracingManager.cs:7-38). Keeps gradient
    descent from leaving the domain where the estimator is stable (negative
    albedo flips Russian-roulette weights into 1/p explosions)."""
    p = dict(params)
    if "albedo" in p:
        p["albedo"] = jnp.clip(p["albedo"], 0.0, 1.0)
    if "specular" in p:
        p["specular"] = jnp.clip(p["specular"], 0.0, 1.0)
    if "metallic" in p:
        p["metallic"] = jnp.clip(p["metallic"], 0.0, 1.0)
    if "roughness" in p:
        p["roughness"] = jnp.clip(p["roughness"], 0.0, 1.0)
    if "ior" in p:
        p["ior"] = jnp.clip(p["ior"], 1.0, 8.0)
    if "absorption" in p:
        p["absorption"] = jnp.maximum(p["absorption"], 0.0)
    if "emissive" in p:
        p["emissive"] = jnp.maximum(p["emissive"], 0.0)
    return p


def save_fit_state(path: str, params, opt_state, step: int):
    """Checkpoint an optimization run (SURVEY.md §5.4 applied to inverse
    rendering): flat leaves of (params, opt_state) + step counter, npz."""
    import numpy as np

    leaves = jax.tree.leaves((params, opt_state))
    np.savez(path, step=np.int64(step),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_fit_state(path: str, params_like, opt_state_like):
    """Restore (params, opt_state, step); the pytree structure comes from
    the 'like' templates (same scene + optimizer config)."""
    import numpy as np

    data = np.load(path)
    treedef = jax.tree.structure((params_like, opt_state_like))
    n = treedef.num_leaves
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    params, opt_state = jax.tree.unflatten(treedef, leaves)
    return params, opt_state, int(data["step"])


def fit_materials(
    scene: SceneData,
    camera: Camera,
    settings: RenderSettings,
    target: jnp.ndarray,
    steps: int = 100,
    lr: float = 5e-2,
    optimize_env: bool = False,
    callback=None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 25,
    mesh=None,
):
    """Inverse-rendering driver: fit material (and optionally envmap)
    parameters to a target image. Returns (params, losses). When
    `checkpoint_path` exists the run resumes from it; progress is saved
    every `checkpoint_every` steps.

    `mesh`: a (px, spp) device mesh from `parallel.sharding` — the
    gradient step then shards pixels/spp and psums grads across the mesh
    (same optimizer + projection as the single-device path; envmap
    optimization is single-device only for now)."""
    import optax

    # Optimize over the float-only material surface (optax-safe); int
    # id/priority leaves stay fixed on the base table.
    params = {"material_params": material_params(scene.materials)}
    if optimize_env:
        params["env_mips"] = scene.env_mips
    opt = make_optimizer(lr)
    opt_state = opt.init(params)

    def to_render_params(params):
        out = {
            "materials": with_material_params(
                scene.materials, params["material_params"]
            )
        }
        if "env_mips" in params:
            out["env_mips"] = params["env_mips"]
        return out

    @jax.jit
    def step(params, opt_state, frame):
        if mesh is not None:
            from halogen_tpu.parallel.sharding import loss_and_grads_sharded

            # Full fit surface (materials + optional envmap): the envmap
            # is replicated across the mesh and its texel cotangents ride
            # the same psum all-reduce as the material grads.
            loss, grads = loss_and_grads_sharded(
                params, scene, camera, settings, target, frame, mesh)
        else:
            loss, grads = jax.value_and_grad(
                lambda p: render_loss(to_render_params(p), scene, camera,
                                      settings, target, frame)
            )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # Projected gradient descent: stay inside the physical domain.
        params["material_params"] = project_material_params(
            params["material_params"])
        if "env_mips" in params:
            params["env_mips"] = tuple(
                jnp.maximum(m, 0.0) for m in params["env_mips"])
        return params, opt_state, loss

    start = 0
    if checkpoint_path:
        import os

        if os.path.exists(checkpoint_path):
            params, opt_state, start = load_fit_state(
                checkpoint_path, params, opt_state
            )

    losses = []
    for i in range(start, steps):
        # Vary the sample stream per step: stochastic gradient over frames
        params, opt_state, loss = step(params, opt_state, jnp.uint32(i))
        losses.append(float(loss))
        if callback is not None:
            callback(i, params, float(loss))
        if checkpoint_path and (i + 1) % checkpoint_every == 0:
            save_fit_state(checkpoint_path, params, opt_state, i + 1)
    if checkpoint_path and losses:
        save_fit_state(checkpoint_path, params, opt_state, steps)
    return to_render_params(params), losses
