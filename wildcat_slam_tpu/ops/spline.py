"""Cubic spline kernels: uniform B-spline approximation, Hermite interpolation,
and the least-squares B-spline control-point fit/eval.

Covers the reference's ``src/odometry/spline_interpolation.h``:
- ``cubic_bspline_approx``   <- CubicBSplineApprox (spline_interpolation.h:9-20)
- ``cubic_hermite``          <- CubicSplineInterpolate (spline_interpolation.h:22-40)
- ``fit_control_points`` / ``eval_bspline`` <- CubicBSplineInterpolator::{Init,Interp}
  (spline_interpolation.h:42-113): control points Q = (N^T N)^-1 N^T p, evaluation
  p(t) = tv^T M Q4 / 6 with clamped index windows.

TPU-first notes: the fit is a small dense normal-equations solve — one matmul chain
that XLA maps onto the MXU; evaluation over many query times is a batched gather +
(4,) x (4,4) x (4,3) contraction, fully vectorized (the reference loops per query).
The basis matrix N depends only on the number of samples, so for the fixed window
sizes used by the odometry pipeline it constant-folds under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Uniform cubic B-spline basis matrix (spline_interpolation.h:83).
# Kept as a host numpy constant on purpose: a module-level jnp.asarray would
# eagerly initialise the JAX backend at import time, which breaks importing
# this package in a process whose default backend is unusable (the driver's
# multichip dry run imports us before pinning a CPU subprocess).
_M = np.asarray(
    [
        [-1.0, 3.0, -3.0, 1.0],
        [3.0, -6.0, 3.0, 0.0],
        [-3.0, 0.0, 3.0, 0.0],
        [1.0, 4.0, 1.0, 0.0],
    ]
)


def cubic_bspline_approx(p_1, p0, p1, p2, s):
    """Uniform cubic B-spline blend of 4 control points at parameter s in [0,1].

    spline_interpolation.h:9-20. All args broadcast; s may be batched.
    """
    s = jnp.asarray(s)
    s2 = s * s
    s3 = s2 * s
    w_1 = (1.0 - s) ** 3
    w0 = 3.0 * s3 - 6.0 * s2 + 4.0
    w1 = -3.0 * s3 + 3.0 * s2 + 3.0 * s + 1.0
    w2 = s3
    return (
        p_1 * w_1[..., None] + p0 * w0[..., None] + p1 * w1[..., None] + p2 * w2[..., None]
    ) / 6.0


def cubic_hermite(s_1, p_1, s0, p0, s1, p1, s2, p2, s):
    """Catmull-Rom-style cubic Hermite interpolation with 3-point slope estimates.

    spline_interpolation.h:22-40.
    """
    m0 = 0.5 * ((p0 - p_1) / (s0 - s_1) + (p1 - p0) / (s1 - s0))
    m1 = 0.5 * ((p1 - p0) / (s1 - s0) + (p2 - p1) / (s2 - s1))
    t = (s - s0) / (s1 - s0)
    t = jnp.asarray(t)
    t2 = t * t
    t3 = t2 * t
    h00 = 2 * t3 - 3 * t2 + 1
    h10 = t3 - 2 * t2 + t
    h01 = -2 * t3 + 3 * t2
    h11 = t3 - t2
    dt = s1 - s0
    return (
        h00[..., None] * p0
        + (h10 * dt)[..., None] * m0
        + h01[..., None] * p1
        + (h11 * dt)[..., None] * m1
    )


def bspline_basis_matrix(n: int, dtype=jnp.float64) -> jnp.ndarray:
    """The (n, n) collocation matrix N with N @ Q evaluating the spline at the n
    sample knots (spline_interpolation.h:86-99). Static in n -> constant under jit.
    """
    import numpy as np

    m = np.asarray(_M, dtype=np.float64)
    tv = np.array([0.0, 0.0, 0.0, 1.0])
    temp = tv @ m / 6.0  # row weights for the 4 neighboring control points
    N = np.zeros((n, n))
    for i in range(n):
        idx = np.clip(np.arange(i - 1, i + 3), 0, n - 1)
        for j in range(4):
            N[i, idx[j]] += temp[j]
    return jnp.asarray(N, dtype=dtype)


def fit_control_points(points: jnp.ndarray) -> jnp.ndarray:
    """Least-squares control points Q = (N^T N)^-1 N^T p for samples at uniform knots.

    ``points``: (n, d). Returns (n, d). spline_interpolation.h:74-104.
    """
    n = points.shape[0]
    N = bspline_basis_matrix(n, dtype=points.dtype)
    hp = jax.lax.Precision.HIGHEST  # true f32 (TPU matmul defaults to bf16)
    NtN = jnp.matmul(N.T, N, precision=hp)
    Ntp = jnp.matmul(N.T, points, precision=hp)
    return jnp.linalg.solve(NtN, Ntp)


def eval_bspline(
    control_points: jnp.ndarray,
    t_front: jnp.ndarray,
    t_back: jnp.ndarray,
    query_t: jnp.ndarray,
):
    """Evaluate the fitted uniform B-spline at (possibly batched) query times.

    Mirrors CubicBSplineInterpolator::Interp (spline_interpolation.h:51-71):
    index_f = (t - t0)/(t1 - t0) * (n-1) + 1; gathers the 4 clamped control points;
    p = tv^T M Q4 / 6.

    Returns ``(values, in_range)`` where ``in_range`` flags queries inside
    [t_front, t_back] (the reference returns nullptr outside; callers mask).
    """
    q = control_points
    n = q.shape[0]
    dtype = q.dtype
    query_t = jnp.asarray(query_t, dtype=dtype)
    in_range = (query_t >= t_front) & (query_t <= t_back)

    index_f = (query_t - t_front) / (t_back - t_front) * (n - 1) + 1.0
    index_int = jnp.floor(index_f).astype(jnp.int32)
    t = index_f - index_int.astype(dtype)

    offsets = jnp.arange(-2, 2, dtype=jnp.int32)
    idx = jnp.clip(index_int[..., None] + offsets, 0, n - 1)  # (..., 4)
    q4 = q[idx]  # (..., 4, d)

    tv = jnp.stack([t * t * t, t * t, t, jnp.ones_like(t)], axis=-1)  # (..., 4)
    w = jnp.einsum("...i,ij->...j", tv, _M.astype(dtype)) / 6.0       # (..., 4)
    vals = jnp.einsum("...j,...jd->...d", w, q4)
    return vals, in_range


def fit_and_eval(sample_t, sample_p, query_t):
    """Fit a uniform cubic B-spline through (sample_t, sample_p) and evaluate at
    query_t. sample_t must be uniformly spaced (the reference assumes this: Interp
    maps time linearly to knot index, spline_interpolation.h:56).
    """
    q = fit_control_points(sample_p)
    return eval_bspline(q, sample_t[0], sample_t[-1], query_t)
