"""Throughput benchmark: Mrays/s on the flagship Cornell scene.

Reproduces the reference's only performance metric — the MRays/s HUD
(`HalogenRenderFeature.cs:97`, `HalogenDebugUI.cs:59-76`: rays per frame =
SPP * W * H, i.e. primary rays dispatched) — as a timed harness on real
hardware. Baseline to beat: 100 Mrays/s/chip (BASELINE.json north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"};
`extra` carries the BASELINE.json fwd+bwd metric (Mrays/s through one
`render_loss_grad` step — forward render + path-replay backward — at
256spp on the Cornell box).
"""

import argparse
import json
import sys
import time


BASELINE_MRAYS = 100.0  # BASELINE.json north_star: >=100 Mrays/s/chip fwd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small config for smoke testing")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--bounces", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import halogen_tpu as ht
    from halogen_tpu.integrator.trace import render_frame
    from halogen_tpu.scene import cornell

    on_cpu = jax.default_backend() == "cpu"
    if args.quick or on_cpu:
        width = args.width or 128
        spp = args.spp or 4
        frames = args.frames or 2
        bounces = args.bounces if args.bounces is not None else 4
    else:
        width = args.width or 512
        spp = args.spp or 32
        frames = args.frames or 4
        bounces = args.bounces if args.bounces is not None else 6

    scene = cornell.cornell_box(glossy=True).build()
    camera = ht.make_camera(position=(0.0, 0.0, 3.2), target=(0.0, 0.0, 0.0),
                            fov_deg=40.0)
    settings = ht.RenderSettings(
        width=width, height=width, samples_per_pixel=spp,
        max_bounces=bounces,
        ray_chunk_size=min(width * width, 262144),
    )

    # Warm-up / compile
    render_frame(scene, camera, settings, jnp.uint32(0)).block_until_ready()

    t0 = time.perf_counter()
    for f in range(frames):
        img = render_frame(scene, camera, settings, jnp.uint32(f + 1))
    img.block_until_ready()
    dt = time.perf_counter() - t0

    rays = spp * width * width * frames  # HUD definition: primary rays
    mrays = rays / dt / 1e6

    # --- fwd+bwd: BASELINE.json metric "Mrays/s/chip (fwd+bwd) at 256spp
    # Cornell box" — one render_loss_grad step (forward render +
    # path-replay backward) timed per effective primary ray.
    from halogen_tpu.diff.grad import render_loss_grad

    if args.quick or on_cpu:
        bwd_w, bwd_spp = 64, 4
    else:
        bwd_w, bwd_spp = 256, 256
    bwd_settings = ht.RenderSettings(
        width=bwd_w, height=bwd_w, samples_per_pixel=bwd_spp,
        max_bounces=bounces, ray_chunk_size=min(bwd_w * bwd_w, 262144),
    )
    params = {"materials": scene.materials}
    target = jnp.zeros((bwd_w, bwd_w, 3), jnp.float32)
    loss, grads = render_loss_grad(
        params, scene, camera, bwd_settings, target, jnp.uint32(0))
    jax.block_until_ready((loss, grads))  # compile + warm-up
    bwd_frames = 1 if (args.quick or on_cpu) else 2
    t0 = time.perf_counter()
    for f in range(bwd_frames):
        loss, grads = render_loss_grad(
            params, scene, camera, bwd_settings, target, jnp.uint32(f + 1))
    jax.block_until_ready((loss, grads))
    dt_bwd = time.perf_counter() - t0
    mrays_bwd = bwd_spp * bwd_w * bwd_w * bwd_frames / dt_bwd / 1e6

    print(json.dumps({
        "metric": "fwd_throughput_cornell",
        "value": round(mrays, 3),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        "extra": {
            "fwd_bwd_throughput_cornell_256spp": round(mrays_bwd, 3),
            "fwd_bwd_unit": "Mrays/s/chip (fwd+bwd)",
            "fwd_bwd_config": f"{bwd_w}x{bwd_w}, {bwd_spp}spp, "
                              f"{bounces} bounces",
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
