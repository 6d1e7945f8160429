"""Microbenchmarks for the XLA:TPU primitives the binned intersector
design depends on. Each benchmark chains iterations through a data
dependency so nothing can be elided, and fetches a scalar at the end.

    python scripts/xla_micro.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=8):
    """fn(seed_scalar, *args) -> scalar-ish; chained through seed."""
    seed = jnp.float32(0)
    out = fn(seed, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out, *args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def report(name, secs, elems, note=""):
    print(json.dumps({
        "name": name, "ms": round(secs * 1e3, 3),
        "gelems_per_s": round(elems / secs / 1e9, 3), "note": note,
    }), flush=True)


def main():
    rng = np.random.default_rng(0)
    N = 1 << 23  # 8.4M rays
    T = 137
    K = 32
    P = N * 8  # 67M pairs

    idx = jnp.asarray(rng.permutation(P).astype(np.int32))
    vals = jnp.asarray(rng.random(P, dtype=np.float32))

    @jax.jit
    def scat_unique(s, idx, vals):
        buf = jnp.zeros((P,), jnp.float32)
        buf = buf.at[idx].set(vals + s, mode="drop", unique_indices=True)
        return buf[::65537].sum()
    report("scatter_unique_67M", timeit(scat_unique, idx, vals), P)

    ridx = jnp.asarray(rng.integers(0, N, P).astype(np.int32))

    @jax.jit
    def scat_min(s, ridx, vals):
        buf = jnp.full((N,), jnp.inf, jnp.float32)
        buf = buf.at[ridx].min(vals + s, mode="drop")
        return buf[::65537].sum()
    report("scatter_min_dup_67M", timeit(scat_min, ridx, vals), P)

    M = jnp.asarray(rng.integers(0, 1 << 20, (N, T)).astype(np.int32))

    @jax.jit
    def rowsort(s, M):
        out = jnp.sort(M + s.astype(jnp.int32), axis=1)
        return (out[::65537, 0]).sum().astype(jnp.float32)
    report("rowsort_8M_x137", timeit(rowsort, M), N * T)

    H = jnp.asarray(rng.integers(0, 2, (N, T)).astype(np.int8))

    @jax.jit
    def cs_hier(s, H):
        Hi = H.astype(jnp.int32) + s.astype(jnp.int32) * 0
        CH = 1024
        nc = Hi.shape[0] // CH
        c = Hi.reshape(nc, CH, T)
        sm = c.sum(axis=1)
        base = jnp.cumsum(sm, axis=0) - sm
        local = jnp.cumsum(c, axis=1) - c
        r = base[:, None, :] + local
        return r[::127, 0, 0].sum().astype(jnp.float32)
    report("cumsum_hier_8M_x137", timeit(cs_hier, H), N * T)

    @jax.jit
    def cs1(s, H):
        r = jnp.cumsum(H.astype(jnp.int32) + s.astype(jnp.int32) * 0, axis=1)
        return r[::65537, T - 1].sum().astype(jnp.float32)
    report("cumsum_ax1_8M_x137", timeit(cs1, H), N * T)

    src = jnp.asarray(rng.random((N, 8), dtype=np.float32))
    G = P // 4  # 17M
    gidx_s = jnp.asarray(np.sort(rng.integers(0, N, G)).astype(np.int32))
    gidx_r = jnp.asarray(rng.integers(0, N, G).astype(np.int32))

    @jax.jit
    def rowgather(s, src, gi):
        out = src[gi] + s
        return out[::65537].sum()
    report("gather_rows8_17M_sorted", timeit(rowgather, src, gidx_s), G * 8)
    report("gather_rows8_17M_random", timeit(rowgather, src, gidx_r), G * 8)

    sl = jnp.asarray(rng.integers(0, T, (N, K)).astype(np.int32))

    @jax.jit
    def taa(s, M, sl):
        out = jnp.take_along_axis(M + s.astype(jnp.int32), sl, axis=1)
        return out[::65537, 0].sum().astype(jnp.float32)
    report("take_along_8M_137to32", timeit(taa, M, sl), N * K)

    o = jnp.asarray(rng.random((N, 3), dtype=np.float32))
    lo = jnp.asarray(rng.random((T, 3), dtype=np.float32))
    hi = lo + 0.3

    @jax.jit
    def slab(s, o, lo, hi):
        inv = 1.0 / (o + 0.5)
        tmin = None
        tmax = None
        for k in range(3):
            t1 = (lo[None, :, k] - o[:, None, k] - s) * inv[:, None, k]
            t2 = (hi[None, :, k] - o[:, None, k] - s) * inv[:, None, k]
            a = jnp.minimum(t1, t2)
            b = jnp.maximum(t1, t2)
            tmin = a if tmin is None else jnp.maximum(tmin, a)
            tmax = b if tmax is None else jnp.minimum(tmax, b)
        hit = tmax >= jnp.maximum(tmin, 0.0)
        return hit.sum(axis=1)[::65537].sum().astype(jnp.float32)
    secs = timeit(slab, o, lo, hi)
    report("slab_8M_x137", secs, N * T, f"~{25*N*T/secs/1e12:.2f} Tflop/s")

    X = jnp.asarray(rng.random((8192, 1024), dtype=np.float32))

    @jax.jit
    def dynloop(s, X, n):
        def body(c):
            i, acc = c
            blk = jax.lax.dynamic_slice(X, (i * 32, 0), (32, 1024))
            return (i + 1, acc + blk.sum())
        _, acc = jax.lax.while_loop(lambda c: c[0] < n, body,
                                    (jnp.int32(0), s))
        return acc
    secs = timeit(dynloop, X, jnp.int32(256))
    report("whileloop_256iters_dynslice", secs, 256,
           f"{secs*1e6/256:.1f} us/iter")

    # MT-like dense elementwise+reduce over pair-blocks with per-block
    # gathered tri tiles: [PB/1024 blocks] x 1024 pairs x L tris
    PB = 1 << 21
    L = 64
    NB = PB // 1024
    pod = jnp.asarray(rng.random((PB, 8), dtype=np.float32))
    tiles = jnp.asarray(rng.random((137, 9, L), dtype=np.float32))
    btid = jnp.asarray(rng.integers(0, 137, NB).astype(np.int32))

    @jax.jit
    def mtblocks(s, pod, tiles, btid):
        tb = tiles[btid]  # [NB, 9, L]
        p = pod.reshape(NB, 1024, 8) + s
        ox, oy, oz = p[..., 0:1], p[..., 1:2], p[..., 2:3]
        dx, dy, dz = p[..., 3:4], p[..., 4:5], p[..., 5:6]
        v = lambda k: tb[:, None, k, :]  # [NB, 1, L]
        e1x, e1y, e1z = v(3), v(4), v(5)
        e2x, e2y, e2z = v(6), v(7), v(8)
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = px * e1x + py * e1y + pz * e1z
        inv = 1.0 / jnp.where(jnp.abs(det) < 1e-8, 1.0, det)
        tvx, tvy, tvz = ox - v(0), oy - v(1), oz - v(2)
        u = (tvx * px + tvy * py + tvz * pz) * inv
        qx = tvy * e1z - tvz * e1y
        qy = tvz * e1x - tvx * e1z
        qz = tvx * e1y - tvy * e1x
        w = (dx * qx + dy * qy + dz * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
        ok = (u >= 0) & (u <= 1) & (w >= 0) & (u + w <= 1) & (t > 0)
        t = jnp.where(ok, t, jnp.inf)
        best = t.min(axis=2)
        return best[::257, 0].sum()
    secs = timeit(mtblocks, pod, tiles, btid)
    report("mt_blocks_2Mx64", secs, PB * L,
           f"~{45*PB*L/secs/1e12:.2f} Tflop/s-equiv")


if __name__ == "__main__":
    main()
