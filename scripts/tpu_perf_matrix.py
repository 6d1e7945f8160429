"""TPU performance matrix: intersector x scheduler x knobs on the ladder
scenes. Run on real hardware; prints one JSON line per cell.

    python scripts/tpu_perf_matrix.py [--quick]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def bench_one(scene, cam, st, frames=2):
    import jax.numpy as jnp
    from halogen_tpu.integrator.trace import render_frame

    img = render_frame(scene, cam, st, jnp.uint32(0))
    img.block_until_ready()
    t0 = time.perf_counter()
    for f in range(frames):
        img = render_frame(scene, cam, st, jnp.uint32(f + 1))
    img.block_until_ready()
    dt = time.perf_counter() - t0
    rays = st.samples_per_pixel * st.num_pixels * frames
    return rays / dt / 1e6, float(img.mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--frames", type=int, default=2)
    args = ap.parse_args()

    import halogen_tpu as ht
    from halogen_tpu.config import Intersector
    from halogen_tpu.scene import cornell
    from halogen_tpu.scene.envmap import Envmap
    from halogen_tpu.scene.meshes import dragons_hero_scene, glass_dragon_scene

    res = 256 if args.quick else 512
    spp = 4 if args.quick else 16

    cases = []
    # Cornell (brute-force territory)
    cornell_scene = cornell.cornell_box(glossy=True).build()
    cam_c = ht.make_camera(position=(0, 0, 3.2), target=(0, 0, 0), fov_deg=40)
    base_c = ht.RenderSettings(width=res, height=res, samples_per_pixel=spp,
                               max_bounces=6, ray_chunk_size=65536)
    cases += [
        ("cornell/brute", cornell_scene, cam_c,
         base_c.replace(intersector=Intersector.BRUTE)),
        ("cornell/brute+lightnee", cornell_scene, cam_c,
         base_c.replace(intersector=Intersector.BRUTE,
                        light_importance_sampling=True)),
        ("cornell/wavefront", cornell_scene, cam_c,
         base_c.replace(intersector=Intersector.BRUTE, wavefront=True)),
    ]

    # Dragons (BVH territory)
    dragons = dragons_hero_scene(3, tris=20480).build(
        envmap=Envmap.gradient_sky())
    cam_d = ht.make_camera(position=(0, 1.5, 5.0), target=(0, -0.3, 0),
                           fov_deg=45)
    base_d = ht.RenderSettings(width=res, height=res, samples_per_pixel=spp,
                               max_bounces=3, use_envmap=True,
                               ray_chunk_size=65536)
    cases += [
        ("dragons/pallas", dragons, cam_d,
         base_d.replace(intersector=Intersector.PALLAS)),
        ("dragons/pallas-nosort", dragons, cam_d,
         base_d.replace(intersector=Intersector.PALLAS)),  # sort toggle below
        ("dragons/wavefront+pallas", dragons, cam_d,
         base_d.replace(intersector=Intersector.PALLAS, wavefront=True)),
        ("dragons/bvh-lockstep", dragons, cam_d,
         base_d.replace(intersector=Intersector.BVH)),
    ]

    # Glass dragon (deep transmission + RR)
    glass = glass_dragon_scene(tris=20480).build()
    base_g = ht.RenderSettings(width=res, height=res, samples_per_pixel=spp,
                               max_bounces=12, max_transmission_bounces=12,
                               ray_chunk_size=65536)
    cases += [
        ("glass/pallas", glass, cam_c,
         base_g.replace(intersector=Intersector.PALLAS)),
        ("glass/wavefront+pallas", glass, cam_c,
         base_g.replace(intersector=Intersector.PALLAS, wavefront=True)),
    ]

    for name, scene, cam, st in cases:
        try:
            mrays, mean = bench_one(scene, cam, st, args.frames)
            print(json.dumps({"case": name, "mrays": round(mrays, 1),
                              "mean": round(mean, 4)}), flush=True)
        except Exception as e:  # keep the matrix going past one bad cell
            print(json.dumps({"case": name, "error": str(e)[:200]}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
