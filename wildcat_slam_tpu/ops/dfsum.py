"""Compensated prefix sums for range-reduction numerics.

The extraction pipeline reduces per-segment moments as range differences of one
running sum over the whole sweep (surfel.py). In plain f32 the stored prefix is
rounded to ~eps * |global prefix| — for 64k-point sweeps the second-moment
channels reach 1e3-1e4, so a small late segment inherits ~1e-3 absolute noise,
which lands on the smallest eigenvalue that drives plane gating and surfel std.

Upcasting to f64 is not an option on the target: TPU has no native f64 and the
channel stays f32 when x64 is disabled. Two schemes are provided:

``df_cumsum``
    Full double-float scan: each prefix is an unevaluated (hi, lo) f32 pair
    computed with error-free two-sums inside ``lax.associative_scan``
    (~2^-46 relative). Gold standard, but the scan's log-depth slice/pad
    traffic costs several ms at (65536, 11) on TPU.

``df_prefix`` / ``df_range_sum``
    Blocked two-level layout — the production path. Points are split into
    blocks of ``block`` (default 128 = one MXU tile); each block keeps an f32
    *exclusive in-block* cumsum computed as a strictly-lower-triangular ones
    matmul at HIGHEST precision (rounding confined to eps * |block total|),
    and block totals are chained with the double-float scan (B+1 tiny pairs,
    ~2^-46 of the global total). A range sum

        (bp_hi[e//K] - bp_hi[s//K]) + (bp_lo[e//K] - bp_lo[s//K])
        + (inb[e] - inb[s])

    then carries error ~eps * |block total| + 2^-46 * |global| — for the
    moment channels that is ~5e-5 absolute instead of the ~1e-3 of a global
    f32 cumsum, at essentially plain-cumsum cost (one in-block scan + one
    tiny compensated scan; no log-depth full-array passes).

IEEE f32 add/sub on the TPU VPU is exactly rounded and XLA does not
reassociate user-level float ops, so the two-sum identities hold (verified
against f64 in tests/test_dfsum.py).
"""

from __future__ import annotations

from typing import NamedTuple

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


class DfPrefix(NamedTuple):
    """Blocked compensated prefix over axis 0 (see module doc)."""

    bp_hi: jnp.ndarray   # (B+1, C) double-float block-prefix high words
    bp_lo: jnp.ndarray   # (B+1, C) low words
    inb: jnp.ndarray     # (N, C) exclusive in-block f32 cumsum
    block: int


def df_prefix(x: jnp.ndarray, block: int = 128) -> DfPrefix:
    """Build the blocked prefix structure for range sums over ``x[s:e]``.

    ``x``: (N, C); ``block`` is reduced to the largest power-of-two divisor of
    N, capped at 128 so the in-block operand is one MXU tile. Query with
    :func:`df_range_sum`.
    """
    n, c = x.shape
    while n % block:
        block //= 2  # largest power-of-two divisor; block=1 degrades to the
        # full double-float scan over N rows (correct, just slower)
    block = min(block, 128)
    b = n // block
    xb = x.reshape(b, block, c)
    # Exclusive in-block cumsum as a strictly-lower-triangular ones matmul on
    # the MXU (HIGHEST = true f32 products with f32 accumulation, same error
    # class as a sequential f32 cumsum). A jnp.cumsum here lowers to a
    # multi-pass reduce-window plus layout copies (~0.43 ms/level traced at
    # (65536, 11)); one matmul pass also yields the exclusive form directly,
    # killing the shift-row concat copy.
    sl = jnp.tril(jnp.ones((block, block), x.dtype), -1)
    inb = jnp.einsum("ij,bjc->bic", sl, xb,
                     precision=jax.lax.Precision.HIGHEST).reshape(n, c)
    totals = jnp.sum(xb, axis=1)                         # (B, C) block totals
    hi, lo = df_cumsum(totals, axis=0)                   # tiny: B rows
    bp_hi = jnp.concatenate([jnp.zeros((1, c), x.dtype), hi])
    bp_lo = jnp.concatenate([jnp.zeros((1, c), x.dtype), lo])
    return DfPrefix(bp_hi, bp_lo, inb, block)


def df_range_sum(pfx: DfPrefix, start, end):
    """Sum of rows [start, end) of the prefixed array; ``start``/``end`` may be
    integer arrays (broadcast along axis 0) in [0, N] — index N is the
    open-ended sentinel (zero in-block contribution, all blocks prefixed).
    Error ~eps * |block total| + 2^-46 * |global total| per channel."""
    n = pfx.inb.shape[0]
    sb = start // pfx.block
    eb = end // pfx.block

    def inb_at(i):
        # sentinel i == N contributes zero (i // block == B picks the full
        # bp prefix); clamp the gather and mask instead of storing an N+1 row,
        # whose concat forced a full-table copy
        v = pfx.inb[jnp.minimum(i, n - 1)]
        return v * (i < n).astype(v.dtype)[..., None]

    return ((pfx.bp_hi[eb] - pfx.bp_hi[sb]) + (pfx.bp_lo[eb] - pfx.bp_lo[sb])
            + (inb_at(end) - inb_at(start)))
