"""Double-float prefix sums (ops/dfsum.py): precision vs f64 ground truth.

The adversarial case mirrors the surfel second-moment channels: 64k values of
magnitude ~0.25 (anchored q^2), global total ~1.6e4, and a small 20-point
segment at the very end. A plain f32 prefix stores each prefix rounded to
~eps * total ~ 1e-3, which the late segment's range difference inherits; the
double-float pair must confine the error to ~eps * |segment sum| ~ 1e-7.
"""

import jax
import jax.numpy as jnp
import numpy as np

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
    x64 = rng.uniform(0.0, 0.5, size=(n,))
    x = jnp.asarray(x64, jnp.float32)

    s, e = n - 20, n  # tiny segment at the end of the sweep
    exact = float(np.sum(np.asarray(x, np.float64)[s:e]))

    # plain f32 running sum (the round-2 code path)
    plain = np.concatenate([[0.0], np.cumsum(np.asarray(x), axis=0)]).astype(np.float32)
    plain_err = abs(float(plain[e] - plain[s]) - exact)

    hi, lo = jax.jit(df_prefix)(x)
    df = float(df_range_sum(hi, lo, jnp.asarray(s), jnp.asarray(e)))
    df_err = abs(df - exact)

    assert df_err < 1e-6, (df_err, plain_err)
    # the plain path really is ~4 orders worse on this input — guards against
    # the compiler folding the compensation away
    assert plain_err > 50 * max(df_err, 1e-9), (df_err, plain_err)


def test_df_range_sum_batched_rows():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4096, 11)), jnp.float32)
    hi, lo = df_prefix(x)
    starts = jnp.asarray([0, 100, 4000], jnp.int32)
    ends = jnp.asarray([4096, 120, 4096], jnp.int32)
    got = np.asarray(df_range_sum(hi, lo, starts, ends), np.float64)
    xf = np.asarray(x, np.float64)
    want = np.stack([xf[int(s):int(e)].sum(axis=0) for s, e in zip(starts, ends)])
    assert np.max(np.abs(got - want)) < 1e-5
