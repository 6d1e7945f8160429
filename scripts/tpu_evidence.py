"""TPU-mode evidence runner: Pallas kernel parity + per-config throughput
measured on the real chip, recorded as committed artifacts.

Covers the two things CPU CI cannot: (a) proof that the Pallas kernels
(`kernels/megakernel.py` fused path, `kernels/bvh_pallas.py` traversal)
compile and match the lockstep integrator ON HARDWARE (not interpret
mode), and (b) the BASELINE.json ladder-config throughput matrix (the
reference's HUD metric, `HalogenRenderFeature.cs:97`: primary rays =
spp*W*H per frame).

Usage (on a TPU host):
    python scripts/tpu_evidence.py [--only KEY] [--out perf/tpu_evidence.jsonl]

Results append to a JSONL file (one record per check, so partial runs
survive); `PERF.md` is the human-readable summary regenerated from it.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _record(path, rec):
    rec = dict(rec)
    rec["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _existing(path):
    keys = set()
    if pathlib.Path(path).exists():
        for line in open(path):
            try:
                keys.add(json.loads(line)["key"])
            except Exception:
                pass
    return keys


def _time_frames(render, frames):
    import jax

    jax.block_until_ready(render(0))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for f in range(frames):
        out = render(f + 1)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="perf/tpu_evidence.jsonl")
    ap.add_argument("--only", default=None)
    ap.add_argument("--force", action="store_true",
                    help="re-record keys already present (appends a new "
                         "row; consumers read the latest ts per key)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import halogen_tpu as ht
    from halogen_tpu.config import Fused, Intersector
    from halogen_tpu.scene import cornell, meshes
    from halogen_tpu.scene.envmap import Envmap

    backend = jax.default_backend()
    dev = str(jax.devices()[0])
    pathlib.Path(args.out).parent.mkdir(exist_ok=True)
    done = _existing(args.out)

    def want(key):
        if args.only and args.only != key:
            return False
        return args.force or key not in done

    cam = ht.make_camera(position=(0, 0, 3.2), target=(0, 0, 0), fov_deg=40)

    # ------------------------------------------------------------------
    # 1. Fused megakernel parity ON TPU (compiled Mosaic, not interpret):
    #    opaque, glass (medium stack), and envmap (deferred miss) scenes.
    # ------------------------------------------------------------------
    parity_cases = {
        "parity_fused_cornell": (
            lambda: cornell.cornell_box(glossy=True).build(),
            dict()),
        "parity_fused_glass": (
            lambda: cornell.glass_sphere_box().build(),
            dict(max_bounces=8)),
        "parity_fused_envmap": (
            lambda: cornell.cornell_box(glossy=True).build(
                envmap=Envmap.gradient_sky()),
            dict(use_envmap=True)),
    }
    for key, (mk_scene, over) in parity_cases.items():
        if not want(key):
            continue
        scene = mk_scene()
        st = ht.RenderSettings(width=64, height=64, samples_per_pixel=2,
                               max_bounces=over.get("max_bounces", 5),
                               ray_chunk_size=4096, **{
                                   k: v for k, v in over.items()
                                   if k != "max_bounces"})
        a = np.asarray(ht.render_frame(scene, cam, st.replace(
            fused=Fused.OFF), 1))
        b = np.asarray(ht.render_frame(scene, cam, st.replace(
            fused=Fused.FORCE), 1))
        mad = float(np.abs(a - b).max())
        _record(args.out, {
            "key": key, "backend": backend, "device": dev,
            "max_abs_diff": mad, "mean": float(a.mean()),
            "ok": bool(mad < 1e-4 and np.isfinite(b).all()),
        })

    # ------------------------------------------------------------------
    # 2. Pallas shared-stack BVH traversal parity ON TPU for a
    #    >brute-threshold scene, vs the gather-free brute intersector.
    # ------------------------------------------------------------------
    if want("parity_pallas_traversal"):
        scene = meshes.dragons_hero_scene(2, tris=5120).build(
            envmap=Envmap.gradient_sky())
        dcam = ht.make_camera(position=(0, 1.5, 5.0), target=(0, -0.3, 0),
                              fov_deg=45)
        st = ht.RenderSettings(width=64, height=64, samples_per_pixel=2,
                               max_bounces=3, use_envmap=True,
                               ray_chunk_size=4096, fused=Fused.OFF)
        a = np.asarray(ht.render_frame(scene, dcam, st.replace(
            intersector=Intersector.BRUTE), 1))
        b = np.asarray(ht.render_frame(scene, dcam, st.replace(
            intersector=Intersector.PALLAS), 1))
        mad = float(np.abs(a - b).max())
        _record(args.out, {
            "key": "parity_pallas_traversal", "backend": backend,
            "device": dev, "tris": scene.num_triangles,
            "max_abs_diff": mad, "mean": float(a.mean()),
            "ok": bool(mad < 2e-3 and np.isfinite(b).all()),
        })

    # ------------------------------------------------------------------
    # 2b. Treelet (skip-link) traversal parity ON TPU — the kernel that
    #     Intersector.AUTO prefers for >brute-threshold scenes. Round-2
    #     verdict: this kernel had no hardware record; these rows are it.
    # ------------------------------------------------------------------
    if want("parity_treelet_traversal"):
        scene = meshes.dragons_hero_scene(2, tris=5120).build(
            envmap=Envmap.gradient_sky())
        dcam = ht.make_camera(position=(0, 1.5, 5.0), target=(0, -0.3, 0),
                              fov_deg=45)
        st = ht.RenderSettings(width=64, height=64, samples_per_pixel=2,
                               max_bounces=3, use_envmap=True,
                               ray_chunk_size=4096, fused=Fused.OFF)
        a = np.asarray(ht.render_frame(scene, dcam, st.replace(
            intersector=Intersector.BRUTE), 1))
        b = np.asarray(ht.render_frame(scene, dcam, st.replace(
            intersector=Intersector.TREELET), 1))
        mad = float(np.abs(a - b).max())
        _record(args.out, {
            "key": "parity_treelet_traversal", "backend": backend,
            "device": dev, "tris": scene.num_triangles,
            "max_abs_diff": mad, "mean": float(a.mean()),
            "ok": bool(mad < 2e-3 and np.isfinite(b).all()),
        })

    # ------------------------------------------------------------------
    # 2b'. Flatlet worklist traversal parity ON TPU (round-3) — the
    #      kernel Intersector.AUTO now prefers for big scenes.
    # ------------------------------------------------------------------
    if want("parity_flatlet_traversal"):
        scene = meshes.dragons_hero_scene(2, tris=5120).build(
            envmap=Envmap.gradient_sky())
        dcam = ht.make_camera(position=(0, 1.5, 5.0), target=(0, -0.3, 0),
                              fov_deg=45)
        st = ht.RenderSettings(width=64, height=64, samples_per_pixel=2,
                               max_bounces=3, use_envmap=True,
                               ray_chunk_size=4096, fused=Fused.OFF)
        a = np.asarray(ht.render_frame(scene, dcam, st.replace(
            intersector=Intersector.BRUTE), 1))
        b = np.asarray(ht.render_frame(scene, dcam, st.replace(
            intersector=Intersector.FLATLET), 1))
        mad = float(np.abs(a - b).max())
        _record(args.out, {
            "key": "parity_flatlet_traversal", "backend": backend,
            "device": dev, "tris": scene.num_triangles,
            "max_abs_diff": mad, "mean": float(a.mean()),
            "ok": bool(mad < 2e-3 and np.isfinite(b).all()),
        })

    # ------------------------------------------------------------------
    # 1b. Fused env-NEE parity ON TPU (round-4): envmap importance
    #     sampling through the megakernel (in-kernel shadow rays + MIS,
    #     alias-method draws) vs the lockstep NEE tracer.
    # ------------------------------------------------------------------
    if want("parity_fused_nee"):
        scene = cornell.material_demo_spheres().build(
            envmap=Envmap.gradient_sky())
        ncam = ht.make_camera(position=(0, 2.0, 6.0), target=(0, 0, -1),
                              fov_deg=45)
        st = ht.RenderSettings(width=64, height=64, samples_per_pixel=2,
                               max_bounces=4, use_envmap=True,
                               env_importance_sampling=True, env_mip_level=0,
                               ray_chunk_size=4096)
        a = np.asarray(ht.render_frame(scene, ncam, st.replace(
            fused=Fused.OFF), 1))
        b = np.asarray(ht.render_frame(scene, ncam, st.replace(
            fused=Fused.FORCE), 1))
        mad = float(np.abs(a - b).max())
        _record(args.out, {
            "key": "parity_fused_nee", "backend": backend, "device": dev,
            "max_abs_diff": mad, "mean": float(a.mean()),
            "ok": bool(mad < 1e-4 and np.isfinite(b).all()),
        })

    # ------------------------------------------------------------------
    # 1c. Fused RAYLET-tier parity ON TPU (round-5): a >brute-threshold
    #     scene through the megakernel's in-kernel worklist traversal
    #     (bf16x3 one-hot gathers + live-ray compaction) vs the
    #     lockstep scheduler — the missing jsonl key behind PERF.md's
    #     r4 'fused raylet tier (scripted)' row (ADVICE r4).
    # ------------------------------------------------------------------
    if want("parity_fused_raylet"):
        scene = meshes.glass_dragon_scene().build()
        dcam = ht.make_camera(position=(0, 1.5, 5.0), target=(0, -0.3, 0),
                              fov_deg=45)
        st = ht.RenderSettings(width=64, height=64, samples_per_pixel=2,
                               max_bounces=6, ray_chunk_size=4096)
        a = np.asarray(ht.render_frame(scene, dcam, st.replace(
            fused=Fused.OFF, intersector=Intersector.BRUTE), 1))
        b = np.asarray(ht.render_frame(scene, dcam, st.replace(
            fused=Fused.FORCE), 1))
        mad = float(np.abs(a - b).max())
        _record(args.out, {
            "key": "parity_fused_raylet", "backend": backend,
            "device": dev, "tris": scene.num_triangles,
            "max_abs_diff": mad, "mean": float(a.mean()),
            "ok": bool(mad < 1e-4 and np.isfinite(b).all()),
        })

    # ------------------------------------------------------------------
    # 1d. Fused raylet-tier env-NEE parity ON TPU (round-5): big scene
    #     under a sky WITH importance sampling — occlusion-mode shadow
    #     traversal in-kernel (the OutdoorsScene configuration).
    # ------------------------------------------------------------------
    if want("parity_fused_raylet_nee"):
        scene = meshes.dragons_hero_scene(2, tris=5120).build(
            envmap=Envmap.gradient_sky())
        dcam = ht.make_camera(position=(0, 1.5, 5.0), target=(0, -0.3, 0),
                              fov_deg=45)
        st = ht.RenderSettings(width=64, height=64, samples_per_pixel=2,
                               max_bounces=3, use_envmap=True,
                               env_importance_sampling=True,
                               ray_chunk_size=4096)
        a = np.asarray(ht.render_frame(scene, dcam, st.replace(
            fused=Fused.OFF, intersector=Intersector.BRUTE), 1))
        b = np.asarray(ht.render_frame(scene, dcam, st.replace(
            fused=Fused.FORCE), 1))
        mad = float(np.abs(a - b).max())
        _record(args.out, {
            "key": "parity_fused_raylet_nee", "backend": backend,
            "device": dev, "tris": scene.num_triangles,
            "max_abs_diff": mad, "mean": float(a.mean()),
            "ok": bool(mad < 1e-4 and np.isfinite(b).all()),
        })

    # ------------------------------------------------------------------
    # 2b''. Raylet per-ray worklist traversal parity ON TPU (round-4) —
    #       includes the one-hot MXU gather bit-exactness on hardware.
    # ------------------------------------------------------------------
    if want("parity_raylet_traversal"):
        scene = meshes.dragons_hero_scene(2, tris=5120).build(
            envmap=Envmap.gradient_sky())
        dcam = ht.make_camera(position=(0, 1.5, 5.0), target=(0, -0.3, 0),
                              fov_deg=45)
        st = ht.RenderSettings(width=64, height=64, samples_per_pixel=2,
                               max_bounces=3, use_envmap=True,
                               ray_chunk_size=4096, fused=Fused.OFF)
        a = np.asarray(ht.render_frame(scene, dcam, st.replace(
            intersector=Intersector.BRUTE), 1))
        b = np.asarray(ht.render_frame(scene, dcam, st.replace(
            intersector=Intersector.RAYLET), 1))
        mad = float(np.abs(a - b).max())
        _record(args.out, {
            "key": "parity_raylet_traversal", "backend": backend,
            "device": dev, "tris": scene.num_triangles,
            "max_abs_diff": mad, "mean": float(a.mean()),
            "ok": bool(mad < 2e-3 and np.isfinite(b).all()),
        })

    # ------------------------------------------------------------------
    # 2c. Fused megakernel WITH in-kernel treelet traversal (round-3):
    #     >MAX_TRIS scene through the resident bounce loop.
    # ------------------------------------------------------------------
    if want("parity_fused_traversal"):
        scene = meshes.dragons_hero_scene(2, tris=5120).build(
            envmap=Envmap.gradient_sky())
        dcam = ht.make_camera(position=(0, 1.5, 5.0), target=(0, -0.3, 0),
                              fov_deg=45)
        st = ht.RenderSettings(width=64, height=64, samples_per_pixel=2,
                               max_bounces=3, use_envmap=True,
                               ray_chunk_size=4096)
        a = np.asarray(ht.render_frame(scene, dcam, st.replace(
            fused=Fused.OFF, intersector=Intersector.TREELET), 1))
        b = np.asarray(ht.render_frame(scene, dcam, st.replace(
            fused=Fused.FORCE), 1))
        mad = float(np.abs(a - b).max())
        _record(args.out, {
            "key": "parity_fused_traversal", "backend": backend,
            "device": dev, "tris": scene.num_triangles,
            "max_abs_diff": mad, "mean": float(a.mean()),
            "ok": bool(mad < 2e-3 and np.isfinite(b).all()),
        })

    # ------------------------------------------------------------------
    # 3. Ladder-config throughput matrix (HUD Mrays/s, single chip).
    # ------------------------------------------------------------------
    big_chunk = 262144
    dragon_cam = ht.make_camera(position=(0, 1.5, 5.0),
                                target=(0, -0.3, 0), fov_deg=45)
    perf_cases = {
        # BASELINE ladder 1: Cornell diffuse 256^2 4spp 2 bounces
        "perf_cornell_256": (
            lambda: cornell.cornell_box().build(), cam,
            ht.RenderSettings(width=256, height=256, samples_per_pixel=4,
                              max_bounces=2, ray_chunk_size=65536), 16),
        # ladder 2: Cornell glossy/emissive 512^2 64spp (+DoF in CLI)
        "perf_cornell_glossy_512": (
            lambda: cornell.cornell_box(glossy=True).build(), cam,
            ht.RenderSettings(width=512, height=512, samples_per_pixel=64,
                              max_bounces=6, ray_chunk_size=big_chunk), 4),
        # ladder 3: envmap importance sampling 1024^2 (NEE -> lockstep path)
        "perf_envmap_1024": (
            lambda: cornell.material_demo_spheres().build(
                envmap=Envmap.gradient_sky()),
            ht.make_camera(position=(0, 2.0, 6.0), target=(0, 0, -1),
                           fov_deg=45),
            ht.RenderSettings(width=1024, height=1024, samples_per_pixel=16,
                              max_bounces=4, use_envmap=True,
                              env_importance_sampling=True, env_mip_level=0,
                              ray_chunk_size=big_chunk), 2),
        # ladder 3 variant: same scene on the fused path (BRDF-only MC)
        "perf_envmap_1024_fused": (
            lambda: cornell.material_demo_spheres().build(
                envmap=Envmap.gradient_sky()),
            ht.make_camera(position=(0, 2.0, 6.0), target=(0, 0, -1),
                           fov_deg=45),
            ht.RenderSettings(width=1024, height=1024, samples_per_pixel=16,
                              max_bounces=4, use_envmap=True,
                              ray_chunk_size=big_chunk), 2),
        # ladder 4: glass dragon (20480 tris, nested dielectrics, RR)
        "perf_glass_dragon": (
            lambda: meshes.glass_dragon_scene().build(), dragon_cam,
            ht.RenderSettings(width=512, height=512, samples_per_pixel=32,
                              max_bounces=12, ray_chunk_size=big_chunk), 2),
        # ladder 5 (single-chip slice): dragons hero 512^2 64spp
        "perf_dragons_hero": (
            lambda: meshes.dragons_hero_scene().build(
                envmap=Envmap.gradient_sky()), dragon_cam,
            ht.RenderSettings(width=512, height=512, samples_per_pixel=64,
                              max_bounces=8, use_envmap=True,
                              ray_chunk_size=big_chunk), 2),
        # treelet-vs-shared-stack A/B on the ladder-4/5 scenes (cites the
        # Intersector.AUTO preference for TREELET on TPU)
        "perf_glass_dragon_treelet": (
            lambda: meshes.glass_dragon_scene().build(), dragon_cam,
            ht.RenderSettings(width=512, height=512, samples_per_pixel=32,
                              max_bounces=12, ray_chunk_size=big_chunk,
                              intersector=Intersector.TREELET), 2),
        "perf_glass_dragon_sharedstack": (
            lambda: meshes.glass_dragon_scene().build(), dragon_cam,
            ht.RenderSettings(width=512, height=512, samples_per_pixel=32,
                              max_bounces=12, ray_chunk_size=big_chunk,
                              intersector=Intersector.PALLAS), 2),
        # round-3: flatlet worklist kernel A/B on the ladder-4/5 scenes
        # (the Intersector.AUTO default for big scenes on TPU)
        "perf_glass_dragon_flatlet": (
            lambda: meshes.glass_dragon_scene().build(), dragon_cam,
            ht.RenderSettings(width=512, height=512, samples_per_pixel=32,
                              max_bounces=12, ray_chunk_size=big_chunk,
                              intersector=Intersector.FLATLET), 2),
        "perf_dragons_hero_flatlet": (
            lambda: meshes.dragons_hero_scene().build(
                envmap=Envmap.gradient_sky()), dragon_cam,
            ht.RenderSettings(width=512, height=512, samples_per_pixel=64,
                              max_bounces=8, use_envmap=True,
                              ray_chunk_size=big_chunk,
                              intersector=Intersector.FLATLET), 2),
        # round-4: raylet per-ray worklist kernel A/B on the ladder-4/5
        # scenes (candidate for the Intersector.AUTO big-scene default)
        "perf_glass_dragon_raylet": (
            lambda: meshes.glass_dragon_scene().build(), dragon_cam,
            ht.RenderSettings(width=512, height=512, samples_per_pixel=32,
                              max_bounces=12, ray_chunk_size=big_chunk,
                              intersector=Intersector.RAYLET), 2),
        "perf_dragons_hero_raylet": (
            lambda: meshes.dragons_hero_scene().build(
                envmap=Envmap.gradient_sky()), dragon_cam,
            ht.RenderSettings(width=512, height=512, samples_per_pixel=64,
                              max_bounces=8, use_envmap=True,
                              ray_chunk_size=big_chunk,
                              intersector=Intersector.RAYLET), 2),
        # round-3: big scenes through the fused megakernel (in-kernel
        # treelet traversal, whole path loop resident)
        "perf_glass_dragon_fusedtrav": (
            lambda: meshes.glass_dragon_scene().build(), dragon_cam,
            ht.RenderSettings(width=512, height=512, samples_per_pixel=32,
                              max_bounces=12, ray_chunk_size=big_chunk,
                              fused=Fused.FORCE), 2),
        "perf_dragons_hero_fusedtrav": (
            lambda: meshes.dragons_hero_scene().build(
                envmap=Envmap.gradient_sky()), dragon_cam,
            ht.RenderSettings(width=512, height=512, samples_per_pixel=64,
                              max_bounces=8, use_envmap=True,
                              ray_chunk_size=big_chunk,
                              fused=Fused.FORCE), 2),
    }
    # round-4 (verdict item 7): ladder 3 from a real >=2048-px EXR file
    # on disk, like the reference's resting_place_4k.exr (meta:
    # Assets/Environments/resting_place_4k.exr.meta; the EXR itself is a
    # missing large blob, so a procedural stand-in is written first).
    if want("perf_envmap_exr_2048"):
        import tempfile

        from halogen_tpu.scene.hdr_io import load_envmap, procedural_hdri
        from halogen_tpu.scene.hdr_io import write_exr

        with tempfile.TemporaryDirectory() as td:
            p = pathlib.Path(td) / "resting_stand_in_2k.exr"
            write_exr(str(p), procedural_hdri(2048))
            env = load_envmap(str(p))
        scene = cornell.material_demo_spheres().build(envmap=env)
        ncam = ht.make_camera(position=(0, 2.0, 6.0), target=(0, 0, -1),
                              fov_deg=45)
        st = ht.RenderSettings(width=1024, height=1024,
                               samples_per_pixel=16, max_bounces=4,
                               use_envmap=True,
                               env_importance_sampling=True,
                               env_mip_level=0, ray_chunk_size=big_chunk)
        t0 = time.perf_counter()

        def render(f, scene=scene, st=st):
            return ht.render_frame(scene, ncam, st, jnp.uint32(f))

        dt = _time_frames(render, 2)
        compile_s = time.perf_counter() - t0 - dt
        rays = st.samples_per_pixel * st.width * st.height * 2
        _record(args.out, {
            "key": "perf_envmap_exr_2048", "backend": backend,
            "device": dev, "source": "exr",
            "env_res": [int(x) for x in np.asarray(
                scene.env_mips[0]).shape[:2]],
            "width": st.width, "spp": st.samples_per_pixel,
            "bounces": st.max_bounces, "frames": 2,
            "mrays_per_s": round(rays / dt / 1e6, 2),
            "compile_s": round(compile_s, 1),
        })

    for key, (mk_scene, kcam, st, frames) in perf_cases.items():
        if not want(key):
            continue
        scene = mk_scene()
        t0 = time.perf_counter()

        def render(f, scene=scene, kcam=kcam, st=st):
            return ht.render_frame(scene, kcam, st, jnp.uint32(f))

        dt = _time_frames(render, frames)
        compile_s = time.perf_counter() - t0 - dt
        rays = st.samples_per_pixel * st.width * st.height * frames
        _record(args.out, {
            "key": key, "backend": backend, "device": dev,
            "tris": scene.num_triangles, "spheres": scene.num_spheres,
            "width": st.width, "spp": st.samples_per_pixel,
            "bounces": st.max_bounces, "frames": frames,
            "mrays_per_s": round(rays / dt / 1e6, 2),
            "compile_s": round(compile_s, 1),
        })

    print("done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
