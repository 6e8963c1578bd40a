"""Batched SO(3) Lie-group primitives in pure JAX.

Covers the math surface of the reference's ``src/common/utils.h:15-67`` (Hat, Exp, Log,
Jl, Jr, Jl_inv, Jr_inv — which wrap Sophus ``so3.hpp``) plus the quaternion utilities
the reference gets from Eigen (multiply, conjugate, rotate, slerp,
``lidar_odometry.cc:153``).

Design notes (TPU-first):
- Everything is batched over arbitrary leading axes and dtype-polymorphic: float32 on
  TPU for speed, float64 on CPU for verification tests. No Python branching on values —
  small-angle handling uses Taylor series selected with ``jnp.where`` over "safe"
  denominators, so the functions are jit/vmap/grad-safe (no NaN gradients from the
  untaken branch).
- Quaternions are stored as ``(..., 4)`` arrays in **wxyz** order, scalar first.
"""

from __future__ import annotations

import jax.numpy as jnp

# Small-angle guards. Two regimes:
# - _eps: "essentially zero" threshold guarding 0/0 (the reference's analog is
#   utils.h:8-13, 1e-5 f32 / 1e-10 f64).
# - _taylor_switch: where cancellation-prone coefficients like (1 - sin(t)/t)/t^2
#   swap from the closed form to a 3-term Taylor series. Chosen so both branches
#   agree to ~machine epsilon at the switch point.
def _eps(dtype) -> float:
    return 1e-4 if jnp.dtype(dtype) == jnp.float32 else 1e-8


def _taylor_switch(dtype) -> float:
    return 0.2 if jnp.dtype(dtype) == jnp.float32 else 0.01


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of ``v``: (..., 3) -> (..., 3, 3). utils.h:15-22."""
    zeros = jnp.zeros_like(v[..., 0])
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    rows = [
        jnp.stack([zeros, -vz, vy], axis=-1),
        jnp.stack([vz, zeros, -vx], axis=-1),
        jnp.stack([-vy, vx, zeros], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def mat3_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 matrix product on the VPU: (..., 3, 3) x (..., 3, 3).

    XLA lowers batched tiny-dot ``a @ b`` to MXU convolutions at the default
    one-pass-bf16 precision with (2,1)-packed layout-change copies between
    them — measured 2.4 ms/sweep of pure copies at batch 16384. 27 fused
    f32 FMAs per row are strictly cheaper and exact."""
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def vec_mat3(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Batched row-vector times 3x3: (..., 3) x (..., 3, 3) -> (..., 3).
    Same VPU rationale as :func:`mat3_mul`."""
    return jnp.sum(v[..., :, None] * m, axis=-2)


def _safe(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Replace near-zero values by 1 so the non-Taylor branch never divides by ~0."""
    return jnp.where(x < eps, jnp.ones_like(x), x)


def exp_quat(v: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector -> unit quaternion (wxyz). Matches Sophus ``SO3::exp``
    (utils.h:24-26): q = [cos(t/2), sin(t/2)/t * v].
    """
    t2 = jnp.sum(v * v, axis=-1)
    t = jnp.sqrt(t2)
    eps = _eps(v.dtype)
    small = t < eps
    t_safe = _safe(t, eps)
    # sin(t/2)/t, Taylor: 1/2 - t^2/48 + t^4/3840
    k = jnp.where(small, 0.5 - t2 / 48.0, jnp.sin(t_safe / 2.0) / t_safe)
    w = jnp.where(small, 1.0 - t2 / 8.0, jnp.cos(t_safe / 2.0))
    q = jnp.concatenate([w[..., None], k[..., None] * v], axis=-1)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def log_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (wxyz) -> rotation vector. Matches Sophus ``SO3::log``
    (utils.h:28-30): uses atan(n/w) semantics, so the result has angle in (-pi, pi]
    when w > 0 and reflects Sophus behavior for w < 0.
    """
    w = q[..., 0]
    vec = q[..., 1:]
    n2 = jnp.sum(vec * vec, axis=-1)
    n = jnp.sqrt(n2)
    eps = _eps(q.dtype)

    small_n = n < eps
    small_w = jnp.abs(w) < eps
    n_safe = _safe(n, eps)
    w_safe = jnp.where(small_w, jnp.ones_like(w), w)

    # Branch 1: n tiny -> 2/w - 2/3 n^2 / w^3 (Sophus so3.hpp)
    k_small_n = 2.0 / w_safe - (2.0 / 3.0) * n2 / (w_safe**3)
    # Branch 2: w tiny -> +-pi/n
    k_small_w = jnp.where(w >= 0, jnp.pi, -jnp.pi) / n_safe
    # Branch 3: general -> 2*atan(n/w)/n
    k_general = 2.0 * jnp.arctan(n_safe / w_safe) / n_safe

    k = jnp.where(small_n, k_small_n, jnp.where(small_w, k_small_w, k_general))
    return k[..., None] * vec


def jl(v: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian of SO(3) (utils.h:44-56):
    sin(t)/t I + (1 - sin(t)/t) a a^T + (1-cos(t))/t hat(a),  a = v/t.
    """
    t2 = jnp.sum(v * v, axis=-1)
    t = jnp.sqrt(t2)
    eps = _eps(v.dtype)
    tiny = t < eps
    t_safe = _safe(t, eps)
    t2_safe = t_safe * t_safe

    # sin(t)/t: numerically stable directly (no cancellation); Taylor only near 0/0.
    sinc = jnp.where(tiny, 1.0 - t2 / 6.0, jnp.sin(t_safe) / t_safe)
    # (1-cos t)/t^2 = 0.5*(sin(t/2)/(t/2))^2: cancellation-free half-angle form.
    half_sinc = jnp.where(tiny, 1.0 - t2 / 24.0, jnp.sin(t_safe / 2.0) / (t_safe / 2.0))
    cosc = 0.5 * half_sinc * half_sinc
    # (1 - sin(t)/t)/t^2 cancels badly for small t: 3-term Taylor below the switch.
    small = t < _taylor_switch(v.dtype)
    one_m_sinc = jnp.where(
        small,
        1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0,
        (1.0 - sinc) / t2_safe,
    )

    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), v.shape[:-1] + (3, 3))
    vvt = v[..., :, None] * v[..., None, :]
    return (
        sinc[..., None, None] * eye
        + one_m_sinc[..., None, None] * vvt
        + cosc[..., None, None] * hat(v)
    )


def jr(v: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian: Jr(v) = Jl(-v). utils.h:58-62."""
    return jl(-v)


def jl_inv(v: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian (utils.h:32-42):
    I - 1/2 hat(v) + (1 - (t/2) cot(t/2)) / t^2 * hat(v)^2.
    """
    t2 = jnp.sum(v * v, axis=-1)
    t = jnp.sqrt(t2)
    small = t < _taylor_switch(v.dtype)
    t_safe = jnp.where(small, jnp.ones_like(t), t)

    half = t_safe / 2.0
    # (1 - (t/2) cot(t/2)) / t^2 cancels for small t: Taylor 1/12 + t^2/720 + t^4/30240.
    coef = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0 + t2 * t2 / 30240.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / (t_safe * t_safe),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), v.shape[:-1] + (3, 3))
    h = hat(v)
    # hat(v)^2 = v v^T - (v.v) I exactly — avoids a batched 3x3 matmul, which
    # XLA lowers to a bf16 MXU op with layout-copy overhead at large batch
    hh = v[..., :, None] * v[..., None, :] - t2[..., None, None] * eye
    return eye - 0.5 * h + coef[..., None, None] * hh


def jr_inv(v: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian: Jr_inv(v) = Jl_inv(-v). utils.h:64-67."""
    return jl_inv(-v)


# ---------------------------------------------------------------------------
# Quaternion utilities (wxyz). The reference uses Eigen::Quaterniond for these.
# ---------------------------------------------------------------------------

def quat_identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    q = jnp.zeros(tuple(shape) + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, both (..., 4) wxyz."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by unit quaternion(s) q: R(q) v, via the two-cross form."""
    qv = q[..., 1:]
    w = q[..., 0:1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation matrix (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    rows = [
        jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
        jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
        jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Spherical interpolation matching Eigen's ``Quaternion::slerp``
    (used at lidar_odometry.cc:153,448): shortest path, lerp fallback when nearly
    parallel; result renormalized.
    """
    d = jnp.sum(q0 * q1, axis=-1)
    abs_d = jnp.abs(d)
    eps = _eps(q0.dtype)
    close = abs_d >= 1.0 - eps

    abs_d_c = jnp.clip(abs_d, 0.0, 1.0)
    theta = jnp.arccos(jnp.where(close, jnp.zeros_like(abs_d_c), abs_d_c))
    sin_theta = jnp.sin(theta)
    sin_safe = jnp.where(close, jnp.ones_like(sin_theta), sin_theta)

    scale0 = jnp.where(close, 1.0 - t, jnp.sin((1.0 - t) * theta) / sin_safe)
    scale1 = jnp.where(close, t, jnp.sin(t * theta) / sin_safe)
    scale1 = jnp.where(d < 0, -scale1, scale1)

    out = scale0[..., None] * q0 + scale1[..., None] * q1
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_angular_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Angle of a^-1 * b, like Eigen's ``angularDistance``."""
    d = quat_mul(quat_conj(a), b)
    return jnp.linalg.norm(log_quat(d), axis=-1)


def exp_matrix(v: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector -> rotation matrix (Rodrigues), batched."""
    return quat_to_matrix(exp_quat(v))
