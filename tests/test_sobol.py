"""Sampler unit tests: uint32 bit-exactness against an independent numpy
mirror of the reference algorithms (HalogenRandom.hlsl), plus
low-discrepancy distribution properties."""

import numpy as np
import jax.numpy as jnp
import pytest

from halogen_tpu.sampler import sobol as S


# --- independent numpy mirror (uint64 arithmetic, masked to 32 bits) -----
M32 = 0xFFFFFFFF


def np_u32_hash(v):
    state = (v * 747796405 + 2891336453) & M32
    word = (((state >> ((state >> 28) + 4)) ^ state) * 277803737) & M32
    return ((word >> 22) ^ word) & M32


def np_reverse(v):
    return int(f"{v:032b}"[::-1], 2)


def np_owen(value, seed):
    x = np_reverse(value)
    x ^= (x * 0x3D20ADEA) & M32
    x = (x + seed) & M32
    x = (x * (((seed >> 16) | 1))) & M32
    x ^= (x * 0x05526C56) & M32
    x = x & M32
    x ^= (x * 0x53A22864) & M32
    return np_reverse(x & M32)


def np_sobol1d(index, dim):
    table = np.asarray(S._SOBOL_DIRECTIONS[dim], dtype=np.uint64)
    x = 0
    for bit in range(32):
        if (index >> bit) & 1:
            x ^= int(table[bit])
    return x & M32


def np_hash_combine(seed, v):
    return (seed ^ ((v + ((seed << 6) & M32) + (seed >> 2)) & M32)) & M32


def test_u32_hash_matches_model():
    vals = np.array([0, 1, 2, 12345, 0xDEADBEEF, M32], dtype=np.uint32)
    got = np.asarray(S.u32_hash(jnp.asarray(vals)))
    want = np.array([np_u32_hash(int(v)) for v in vals], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_reverse_bits():
    vals = np.array([0, 1, 0x80000000, 0x12345678, M32], dtype=np.uint32)
    got = np.asarray(S.reverse_bits_u32(jnp.asarray(vals)))
    want = np.array([np_reverse(int(v)) for v in vals], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_owen_scramble_matches_model():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 2**32, size=32, dtype=np.uint32)
    seeds = rng.integers(0, 2**32, size=32, dtype=np.uint32)
    got = np.asarray(S.owen_scramble(jnp.asarray(vals), jnp.asarray(seeds)))
    want = np.array(
        [np_owen(int(v), int(s)) for v, s in zip(vals, seeds)], dtype=np.uint32
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("dim", [0, 1, 2, 3])
def test_sobol1d_matches_model(dim):
    idx = np.array([0, 1, 2, 3, 7, 255, 1 << 20, M32], dtype=np.uint32)
    got = np.asarray(S.sobol1d(jnp.asarray(idx), dim))
    want = np.array([np_sobol1d(int(i), dim) for i in idx], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_sobol_first_dim_is_van_der_corput():
    # Dim 0 of an unscrambled Sobol sequence is the van der Corput radical
    # inverse: index 1 -> 0.5, 2 -> 0.25, 3 -> 0.75 ...
    idx = jnp.asarray(np.arange(8, dtype=np.uint32))
    x = np.asarray(S.sobol1d(idx, 0)).astype(np.float64) / 2**32
    np.testing.assert_allclose(
        x, [0.0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875]
    )


def test_2d_pipeline_matches_model():
    idx, dim, seed = 37, 11, 12345
    gx, gy = S.u32_owen_scrambled_sobol_2d(
        jnp.uint32(idx), jnp.uint32(dim), jnp.uint32(seed)
    )
    s = seed ^ np_u32_hash(dim)
    shuffled = np_owen(idx, s)
    wx = np_owen(np_sobol1d(shuffled, 0), np_hash_combine(s, 0))
    wy = np_owen(np_sobol1d(shuffled, 1), np_hash_combine(s, 1))
    assert int(np.asarray(gx)) == wx
    assert int(np.asarray(gy)) == wy


def test_samples_in_unit_interval():
    idx = jnp.asarray(np.arange(4096, dtype=np.uint32))
    x, y = S.ld_sample_2d(idx, jnp.uint32(3), jnp.uint32(99))
    for arr in (x, y):
        a = np.asarray(arr)
        assert a.min() >= 0.0 and a.max() < 1.0


def test_stratification_better_than_random():
    """Owen-scrambled Sobol should stratify: counts in a 16x16 grid over
    256*k samples should be nearly equal (far tighter than iid uniform)."""
    n = 4096
    idx = jnp.asarray(np.arange(n, dtype=np.uint32))
    x, y = S.ld_sample_2d(idx, jnp.uint32(0), jnp.uint32(777))
    gx = (np.asarray(x) * 16).astype(int)
    gy = (np.asarray(y) * 16).astype(int)
    counts = np.bincount(gx * 16 + gy, minlength=256)
    # perfect stratification = 16 per cell; allow small slack
    assert counts.min() >= 8 and counts.max() <= 24, counts


def test_mean_near_half():
    n = 8192
    idx = jnp.asarray(np.arange(n, dtype=np.uint32))
    x = S.ld_sample_1d(idx, jnp.uint32(5), jnp.uint32(1))
    assert abs(float(jnp.mean(x)) - 0.5) < 0.01


def test_decorrelation_across_seeds():
    n = 2048
    idx = jnp.asarray(np.arange(n, dtype=np.uint32))
    x1, _ = S.ld_sample_2d(idx, jnp.uint32(0), jnp.uint32(1))
    x2, _ = S.ld_sample_2d(idx, jnp.uint32(0), jnp.uint32(2))
    c = np.corrcoef(np.asarray(x1), np.asarray(x2))[0, 1]
    assert abs(c) < 0.08


def test_prng_uniform():
    n = 8192
    idx = jnp.asarray(np.arange(n, dtype=np.uint32))
    x = S.prng_sample_1d(idx, jnp.uint32(0), jnp.uint32(3))
    a = np.asarray(x)
    assert 0.0 <= a.min() and a.max() < 1.0
    assert abs(a.mean() - 0.5) < 0.02
