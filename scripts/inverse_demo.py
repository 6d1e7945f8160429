"""Inverse-rendering demo: perturb the Cornell materials, recover them by
gradient descent on the image loss, and write before/target/after PNGs.

    python scripts/inverse_demo.py --out-dir /tmp/inverse [--steps 80]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="/tmp/inverse_demo")
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--lr", type=float, default=5e-2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import halogen_tpu as ht
    from halogen_tpu.cli.main import _save_png
    from halogen_tpu.diff.grad import fit_materials
    from halogen_tpu.scene import cornell

    os.makedirs(args.out_dir, exist_ok=True)
    scene = cornell.cornell_box().build()
    cam = ht.make_camera(position=(0, 0, 3.2), target=(0, 0, 0), fov_deg=40)
    st = ht.RenderSettings(width=args.width, height=args.width,
                           samples_per_pixel=args.spp, max_bounces=4,
                           light_importance_sampling=True,
                           ray_chunk_size=min(args.width ** 2, 65536))

    show = st.replace(samples_per_pixel=max(args.spp, 16))
    target = ht.render_frame(scene, cam, st, 0)
    _save_png(ht.render_frame(scene, cam, show, 0),
              os.path.join(args.out_dir, "target.png"))

    # Perturb: wash out every albedo and dim the light
    mats = scene.materials
    perturbed = dataclasses.replace(
        mats,
        albedo=jnp.clip(mats.albedo * 0.3 + 0.4, 0, 1),
        emissive=mats.emissive * 0.4,
    )
    scene_p = dataclasses.replace(scene, materials=perturbed)
    _save_png(ht.render_frame(scene_p, cam, show, 0),
              os.path.join(args.out_dir, "before.png"))

    params, losses = fit_materials(
        scene_p, cam, st, target, steps=args.steps, lr=args.lr,
        checkpoint_path=os.path.join(args.out_dir, "fit.npz"),
    )
    fitted = dataclasses.replace(scene, materials=params["materials"])
    _save_png(ht.render_frame(fitted, cam, show, 0),
              os.path.join(args.out_dir, "after.png"))
    print(json.dumps({
        "initial_loss": losses[0], "final_loss": losses[-1],
        "steps": len(losses), "out_dir": args.out_dir,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
