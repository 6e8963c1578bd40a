"""Double-float (compensated) prefix sums for range-reduction numerics.

The extraction pipeline reduces per-segment moments as range differences of one
running sum over the whole sweep (surfel.py). In plain f32 the stored prefix is
rounded to ~eps * |global prefix| — for 64k-point sweeps the second-moment
channels reach 1e3-1e4, so a small late segment inherits ~1e-3 absolute noise,
which lands on the smallest eigenvalue that drives plane gating and surfel std.

Upcasting to f64 is not an option on the target: TPU has no native f64 and the
channel stays f32 when x64 is disabled. Instead each prefix is carried as an
unevaluated pair (hi, lo) of f32 values ("double-float"), computed with an
error-free two-sum inside an associative scan. The pair represents the prefix
to ~2^-46 relative, so a range sum

    (hi[e] - hi[s]) + (lo[e] - lo[s])

has error ~eps * |range sum| + 2^-46 * |prefix| — i.e. rounding is confined to
the segment's own magnitude, matching what a per-segment reduction would give,
while keeping the O(P log P)-free running-sum data path (no scatter-adds).

This is the classic Dekker/Knuth two-sum; IEEE f32 add/sub on the TPU VPU is
exactly rounded and XLA does not reassociate user-level float ops, so the
error-extraction identities hold (verified against f64 in tests/test_dfsum.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _two_sum(a, b):
    """Error-free transformation: a + b = s + err exactly (Knuth two-sum)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def df_cumsum(x: jnp.ndarray, axis: int = 0):
    """Cumulative sum of ``x`` along ``axis`` in double-float precision.

    Returns ``(hi, lo)`` with the same shape/dtype as ``x``; ``hi + lo`` is the
    prefix sum carried at ~twice the working precision.
    """

    def combine(p, q):
        ph, pl = p
        qh, ql = q
        s, e = _two_sum(ph, qh)
        e = e + pl + ql
        # quick_two_sum renormalisation (|s| >= |e| holds by construction)
        hi = s + e
        lo = e - (hi - s)
        return hi, lo

    return jax.lax.associative_scan(combine, (x, jnp.zeros_like(x)), axis=axis)


def df_prefix(x: jnp.ndarray, axis: int = 0):
    """Exclusive-prefix variant: returns ``(hi, lo)`` of shape ``x.shape`` with
    one extra leading row of zeros along ``axis`` (length N+1), so that the sum
    over ``x[s:e]`` is ``df_range_sum(hi, lo, s, e)``."""
    hi, lo = df_cumsum(x, axis=axis)
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    return jnp.pad(hi, pad), jnp.pad(lo, pad)


def df_range_sum(hi: jnp.ndarray, lo: jnp.ndarray, start, end):
    """Range sum over [start, end) given ``df_prefix`` outputs; ``start``/``end``
    may be integer index arrays (rows are gathered along axis 0)."""
    return (hi[end] - hi[start]) + (lo[end] - lo[start])
