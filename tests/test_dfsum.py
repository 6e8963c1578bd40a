"""Compensated prefix sums (ops/dfsum.py): precision vs f64 ground truth.

The adversarial case mirrors the surfel second-moment channels: 64k values of
magnitude ~0.25 (anchored q^2), global total ~1.6e4, and a small 20-point
segment at the very end. A plain f32 prefix stores each prefix rounded to
~eps * total ~ 1e-3, which the late segment's range difference inherits; both
compensated schemes must confine the error to ~1e-6 or better.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wildcat_slam_tpu.ops.dfsum import df_cumsum, df_prefix, df_range_sum


def test_df_cumsum_matches_f64():
    rng = np.random.default_rng(0)
    x64 = rng.uniform(0.0, 0.5, size=(65536, 4))
    x = jnp.asarray(x64, jnp.float32)
    hi, lo = jax.jit(df_cumsum)(x)
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    want = np.cumsum(np.asarray(x, np.float64), axis=0)  # f64 sum of the f32 values
    err = np.max(np.abs(got - want))
    # double-float carries ~2^-46 relative precision of the ~1.6e4 totals
    assert err < 1e-6, err


def test_df_range_sum_beats_plain_f32_on_late_small_segment():
    rng = np.random.default_rng(1)
    n = 65536
    x64 = rng.uniform(0.0, 0.5, size=(n, 1))
    x = jnp.asarray(x64, jnp.float32)

    s, e = n - 20, n  # tiny segment at the end of the sweep
    exact = float(np.sum(np.asarray(x, np.float64)[s:e]))

    # plain f32 running sum (the round-2 code path)
    plain = np.concatenate([[0.0], np.cumsum(np.asarray(x)[:, 0], axis=0)]).astype(np.float32)
    plain_err = abs(float(plain[e] - plain[s]) - exact)

    pfx = jax.jit(df_prefix, static_argnames="block")(x)
    df = float(df_range_sum(pfx, jnp.asarray(s), jnp.asarray(e))[0])
    df_err = abs(df - exact)

    assert df_err < 2e-5, (df_err, plain_err)
    # the plain path really is orders worse on this input — guards against
    # the compiler folding the compensation away
    assert plain_err > 20 * max(df_err, 5e-8), (df_err, plain_err)


@pytest.mark.parametrize("n,block", [(4096, 1024), (4096, 512), (100, 1024), (65536, 1024)])
def test_df_range_sum_batched_rows(n, block):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(n, 11)), jnp.float32)
    pfx = df_prefix(x, block=block)
    starts = jnp.asarray([0, n // 3, n - 5, 0, n], jnp.int32)
    ends = jnp.asarray([n, n // 3 + 7, n, 1, n], jnp.int32)
    got = np.asarray(df_range_sum(pfx, starts, ends), np.float64)
    xf = np.asarray(x, np.float64)
    want = np.stack([xf[int(s):int(e)].sum(axis=0) for s, e in zip(starts, ends)])
    assert np.max(np.abs(got - want)) < 1e-4


def test_df_prefix_block_boundaries_exact():
    # ranges that start/end exactly on block boundaries
    n, block = 8192, 1024
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, size=(n, 2)), jnp.float32)
    pfx = df_prefix(x, block=block)
    xf = np.asarray(x, np.float64)
    for s, e in [(0, block), (block, 2 * block), (0, n), (3 * block, 3 * block),
                 (2 * block - 1, 2 * block + 1), (n - 1, n)]:
        got = np.asarray(df_range_sum(pfx, jnp.asarray(s), jnp.asarray(e)), np.float64)
        want = xf[s:e].sum(axis=0)
        assert np.max(np.abs(got - want)) < 1e-4, (s, e)
