"""Microbenchmarks for round-4 traversal design: measure dense
Moller-Trumbore (VPU) vs Woop-transform matmul (MXU) ray-triangle
intersection throughput on this chip, at the block shapes the flatlet
design uses.

    python scripts/mxu_micro.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=16):
    out = fn(jnp.float32(0), *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out * 0, *args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def report(name, secs, pairs, note=""):
    print(json.dumps({
        "name": name, "ms": round(secs * 1e3, 4),
        "gpairs_per_s": round(pairs / secs / 1e9, 2), "note": note,
    }), flush=True)


def main():
    rng = np.random.default_rng(0)

    # Workload shape: N rays x L tris dense pass, repeated C times
    # (standing in for C candidate flatlets per block).
    N = 1 << 20   # 1M rays
    L = 128       # tris per flatlet
    C = 8         # candidate flatlets per ray block (amortized)

    o = jnp.asarray(rng.random((N, 3), dtype=np.float32))
    d_ = rng.standard_normal((N, 3)).astype(np.float32)
    d_ /= np.linalg.norm(d_, axis=1, keepdims=True)
    d = jnp.asarray(d_)

    v0 = rng.random((C, L, 3)).astype(np.float32)
    e1 = (rng.random((C, L, 3)).astype(np.float32) - 0.5) * 0.1
    e2 = (rng.random((C, L, 3)).astype(np.float32) - 0.5) * 0.1

    tiles = jnp.asarray(np.concatenate(
        [v0.transpose(0, 2, 1), e1.transpose(0, 2, 1),
         e2.transpose(0, 2, 1)], axis=1))  # [C, 9, L]

    @jax.jit
    def mt_dense(s, o, d, tiles):
        """Classic MT, all-VPU elementwise: N x (C*L) pairs."""
        best = jnp.full((N,), jnp.inf)
        ox, oy, oz = o[:, 0:1] + s, o[:, 1:2], o[:, 2:3]
        dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
        for c in range(C):
            tb = tiles[c]
            v = lambda k: tb[None, k, :]
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
            best = jnp.minimum(best, jnp.where(ok, t, jnp.inf).min(axis=1))
        return best.sum()

    secs = timeit(mt_dense, o, d, tiles)
    report("mt_dense_vpu", secs, N * C * L)

    # --- Woop-transform MXU formulation -------------------------------
    # Per triangle precompute affine A (3x3) and b (3,) mapping world ->
    # unit-triangle space: z' = signed distance along normal axis, then
    #   o' = A o + b ; d' = A d
    #   t = -o'z / d'z ; u = o'x + t d'x ; v = o'y + t d'y
    # Pack per tri 8 columns? No: one matmul [N, 4] @ [4, 6L]:
    #   rays as [o, 1] gives o' rows (cols 0:3L)
    #   rays as [d, 0] gives d' rows -> fold into single [N,8]@[8,6L]
    def woop_pack(v0, e1, e2):
        # A = inverse of [e1 e2 n] columns; b = -A v0
        C_, L_, _ = v0.shape
        n = np.cross(e1, e2)
        M = np.stack([e1, e2, n], axis=-1)  # [C, L, 3, 3]
        Ainv = np.linalg.inv(M)             # [C, L, 3, 3] world->bary
        b = -np.einsum('clij,clj->cli', Ainv, v0)
        # Build [C, 8, 6L]: for each tri l, cols 6l:6l+3 = o'(x,y,z),
        # cols 6l+3:6l+6 = d'(x,y,z)
        W = np.zeros((C_, 8, 6 * L_), np.float32)
        for a in range(3):  # output coordinate
            # o' rows: A[a,:] dot o + b[a]
            W[:, 0:3, a::6] = Ainv[:, :, a, :].transpose(0, 2, 1)
            W[:, 3, a::6] = b[:, :, a]
            W[:, 4:7, 3 + a::6] = Ainv[:, :, a, :].transpose(0, 2, 1)
        return jnp.asarray(W)

    Wt = woop_pack(v0, e1, e2)  # [C, 8, 6L]
    rays8 = jnp.concatenate([o, jnp.ones((N, 1)), d, jnp.zeros((N, 1))],
                            axis=1)  # [N, 8]

    def woop_body(s, rays8, Wt, prec):
        best = jnp.full((N,), jnp.inf)
        r = rays8.at[:, 0].add(s)
        for c in range(C):
            P = jnp.dot(r, Wt[c], precision=prec)  # [N, 6L]
            P = P.reshape(N, L, 6)
            opx, opy, opz = P[..., 0], P[..., 1], P[..., 2]
            dpx, dpy, dpz = P[..., 3], P[..., 4], P[..., 5]
            t = -opz / jnp.where(jnp.abs(dpz) < 1e-12, 1e-12, dpz)
            u = opx + t * dpx
            v = opy + t * dpy
            ok = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
            best = jnp.minimum(best, jnp.where(ok, t, jnp.inf).min(axis=1))
        return best.sum()

    for prec in ("default", "float32"):
        f = jax.jit(lambda s, r, W, p=prec: woop_body(s, r, W, p))
        secs = timeit(f, rays8, Wt)
        report(f"woop_mxu_{prec}", secs, N * C * L)

    # --- slab box test throughput (dense box pass cost) ----------------
    T = 128
    lo = jnp.asarray(rng.random((T, 3), dtype=np.float32))
    hi = lo + 0.3

    @jax.jit
    def slab(s, o, d, lo, hi):
        inv = 1.0 / d
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
        entry = jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)
        return entry.min(axis=1).sum()
    secs = timeit(slab, o, d, lo, hi)
    report("slab_1M_x128", secs, N * T)

    # --- MXU box test: slab as matmul? boxes: lo/hi per axis -> the
    # per-axis products (lo-o)*inv are rank-1-ish; compute via matmul of
    # [N, 6] ray features x [6, 2T]? t1 = lo*inv - o*inv: needs
    # per-axis products lo_k * inv_k summed? Not separable per axis; box
    # test stays VPU. Skip.

    # --- gather of tri tiles by block id (the flatlet gather cost) -----
    NB = N // 1024
    tilesT = jnp.asarray(rng.random((69, 9, L), dtype=np.float32))
    btid = jnp.asarray(rng.integers(0, 69, NB).astype(np.int32))

    @jax.jit
    def tilegather(s, tilesT, btid):
        tb = tilesT[btid] + s
        return tb.sum()
    secs = timeit(tilegather, tilesT, btid)
    report("tile_gather_perblock", secs, NB * 9 * L,
           f"{NB} blocks x {9*L*4}B")


if __name__ == "__main__":
    main()
