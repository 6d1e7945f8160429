"""Per-bounce ray-coherence diagnosis for the big-scene traversal redesign.

For each bounce of a glass_dragon render, captures the live ray pool and
measures — in numpy, against the flatlet box table — the quantities that
decide a dense-streaming traversal kernel's cost:

- live fraction (what compaction can reclaim)
- per-RAY flatlet candidates, both unpruned (entry < seed) and
  best-t-pruned (entry <= t_final): the lower bound a per-ray
  nearest-first traversal pays
- per-ROW (128 Morton-sorted rays) candidate-set union: what a
  row-granular worklist kernel pays
- per-BLOCK (1024 rays) union: what the round-3 flatlet kernel pays

Usage: python scripts/traversal_diag.py [--width 128] [--spp 2]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--bounces", type=int, default=12)
    ap.add_argument("--scene", default="glass_dragon")
    args = ap.parse_args()

    import halogen_tpu as ht
    from halogen_tpu.config import Intersector
    from halogen_tpu.scene import meshes
    from halogen_tpu.integrator import trace
    from halogen_tpu.integrator.intersect import (
        _sort_keys_with_dead_last, intersect_scene)
    from halogen_tpu.integrator.camera import generate_rays
    from halogen_tpu.sampler import sobol as sob

    scene = getattr(meshes, args.scene + "_scene")().build()
    cam = ht.make_camera(position=(0, 1.5, 5.0), target=(0, -0.3, 0),
                         fov_deg=45)
    st = ht.RenderSettings(
        width=args.width, height=args.width, samples_per_pixel=args.spp,
        max_bounces=args.bounces, intersector=Intersector.BRUTE,
        ray_chunk_size=1 << 30)

    w = h = args.width
    n = w * h * args.spp
    pix = np.arange(w * h, dtype=np.int32)
    px = jnp.asarray(np.tile(pix % w, args.spp))
    py = jnp.asarray(np.tile(pix // w, args.spp))
    seed = sob.pixel_seed(jnp.asarray(np.tile(pix, args.spp), jnp.uint32))
    lane = jnp.repeat(jnp.arange(args.spp, dtype=jnp.uint32), w * h)
    sidx = sob.sample_index(jnp.uint32(1), lane, args.spp)
    o, d = generate_rays(cam, px, py, w, h, st.filter_radius, sidx, seed,
                         trace._sampler_2d(st))
    far = jnp.broadcast_to(cam.far, (n,))
    pool = trace._make_pool(o, d, far, sidx, seed)

    # flatlet box table -> numpy [T, 6]
    fb = scene.fbvh
    assert fb is not None
    boxes = np.asarray(fb.boxes)[:, :, 0, :]  # [G, 6, 128]
    boxes = boxes.transpose(0, 2, 1).reshape(-1, 6)  # [G*128, 6]
    real = boxes[:, 0] < 1e29
    T = int(real.sum())
    boxes = boxes[real]
    print(f"scene={args.scene} tris={scene.num_triangles} flatlets={T} "
          f"leaf_tris={fb.leaf_tris} rays={n}", flush=True)

    step = jax.jit(
        lambda p, k: trace._pool_bounce(scene, st, p, k),
        static_argnums=())

    recs = []
    for k in range(args.bounces + 1):
        over = (
            (pool.counts[:, 0] > st.max_diffuse_bounces)
            | (pool.counts[:, 1] > st.max_glossy_bounces)
            | (pool.counts[:, 2] > st.max_transmission_bounces))
        active = np.asarray(pool.active & (~over))
        far_eff = np.where(active, np.asarray(pool.far), 0.0)
        o_np = np.asarray(pool.origin)
        d_np = np.asarray(pool.direction)

        # the actual closest hit (for the pruned lower bound)
        hit, _, _ = intersect_scene(
            scene, pool.origin, pool.direction,
            jnp.asarray(far_eff), st)
        t_fin = np.asarray(hit.t)

        live = active.sum()
        rec = dict(bounce=k, live=int(live), frac=round(live / n, 4))
        if live > 0:
            idx = np.where(active)[0]
            # Morton sort the live rays exactly as intersect_pallas does
            keys = np.asarray(_sort_keys_with_dead_last(
                scene, pool.origin, pool.direction, jnp.asarray(far_eff)))
            order = np.argsort(keys[idx], kind="stable")
            idx = idx[order]
            o_l, d_l = o_np[idx], d_np[idx]
            t_l = t_fin[idx]
            seed_l = far_eff[idx]

            inv = 1.0 / np.where(np.abs(d_l) < 1e-30, 1e-30, d_l)
            t1 = (boxes[None, :, 0:3] - o_l[:, None]) * inv[:, None]
            t2 = (boxes[None, :, 3:6] - o_l[:, None]) * inv[:, None]
            tmin = np.minimum(t1, t2).max(axis=2)
            tmax = np.maximum(t1, t2).min(axis=2)
            ent = np.maximum(tmin, 0.0)
            hit_un = (tmax > np.maximum(tmin, 0.0)) & (ent < seed_l[:, None])
            t_cap = np.where(np.isfinite(t_l), t_l, seed_l)
            hit_pr = hit_un & (ent <= t_cap[:, None] + 1e-6)

            def union_stats(hits, g):
                m = len(idx) // g
                if m == 0:
                    return None
                u = hits[: m * g].reshape(m, g, -1).any(axis=1).sum(axis=1)
                return dict(mean=round(float(u.mean()), 1),
                            p90=int(np.percentile(u, 90)),
                            max=int(u.max()))

            per_ray_un = hit_un.sum(axis=1)
            per_ray_pr = hit_pr.sum(axis=1)
            rec.update(
                ray_unpruned=dict(mean=round(float(per_ray_un.mean()), 1),
                                  p90=int(np.percentile(per_ray_un, 90))),
                ray_pruned=dict(mean=round(float(per_ray_pr.mean()), 1),
                                p90=int(np.percentile(per_ray_pr, 90))),
                row128_un=union_stats(hit_un, 128),
                row128_pr=union_stats(hit_pr, 128),
                blk1024_un=union_stats(hit_un, 1024),
                blk1024_pr=union_stats(hit_pr, 1024),
            )
        recs.append(rec)
        print(json.dumps(rec), flush=True)
        pool = step(pool, jnp.int32(k))

    tot = sum(r["frac"] for r in recs)
    print(f"sum live fractions over bounces: {tot:.2f} "
          f"(vs {args.bounces + 1} lockstep)", flush=True)


if __name__ == "__main__":
    main()
