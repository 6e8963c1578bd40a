"""Batched closed-form eigendecomposition of symmetric 3x3 matrices.

Replaces the reference's per-node ``Eigen::SelfAdjointEigenSolver<Matrix3d>`` calls
(surfel_extraction.cc:49,98; cost_functor.h:23,111; plane fitting and match weights)
with a fully vectorized, branch-free closed form that XLA fuses into the surrounding
segment reductions — no LAPACK-style iteration, no dynamic shapes.

Algorithm (per matrix, all in jnp.where-selected straight-line code):
1. Eigenvalues by the trigonometric method (Smith 1961): roots of the characteristic
   cubic of the deviatoric part, returned ascending like Eigen's solver.
2. The most *isolated* eigenvalue's eigenvector via the largest cross product of rows
   of (A - lambda I) (rank-2 unless the spectrum is fully degenerate).
3. The remaining pair by diagonalizing the 2x2 projection of A onto the orthogonal
   complement — exactly orthonormal by construction and robust to a repeated pair.

Returns eigenvalues ascending and column eigenvectors, matching the convention of
``Eigen::SelfAdjointEigenSolver`` (eigenvectors().col(0) pairs with the min value).
"""

from __future__ import annotations

import jax.numpy as jnp


def _eigvals3_sym(a: jnp.ndarray):
    """Ascending eigenvalues of symmetric (..., 3, 3) via the trigonometric method."""
    a00, a11, a22 = a[..., 0, 0], a[..., 1, 1], a[..., 2, 2]
    a01, a02, a12 = a[..., 0, 1], a[..., 0, 2], a[..., 1, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))

    # Floor p at noise level (relative to trace scale) so p_safe**3 cannot
    # underflow to 0 and the degenerate case stays NaN-free; below this floor the
    # deviatoric part is numerically zero and r is irrelevant (eigvals == q).
    eps = jnp.finfo(a.dtype).eps
    p_safe = jnp.maximum(p, 100.0 * eps * (jnp.abs(q) + 1.0))

    # det(B)/2 with B = (A - qI)/p
    det_b = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    ) / (p_safe * p_safe * p_safe)
    r = jnp.clip(det_b / 2.0, -1.0, 1.0)

    phi = jnp.arccos(r) / 3.0
    w2 = q + 2.0 * p * jnp.cos(phi)                       # max
    w0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # min
    w1 = 3.0 * q - w2 - w0
    return w0, w1, w2


def _largest_cross_of_rows(m: jnp.ndarray):
    """Best (largest-norm) cross product of row pairs of (..., 3, 3). Returns the
    unnormalized vector and its squared norm."""
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c0 = jnp.cross(r1, r2)
    c1 = jnp.cross(r2, r0)
    c2 = jnp.cross(r0, r1)
    n0 = jnp.sum(c0 * c0, axis=-1)
    n1 = jnp.sum(c1 * c1, axis=-1)
    n2 = jnp.sum(c2 * c2, axis=-1)
    best01 = jnp.where((n0 >= n1)[..., None], c0, c1)
    nbest01 = jnp.maximum(n0, n1)
    best = jnp.where((nbest01 >= n2)[..., None], best01, c2)
    return best, jnp.maximum(nbest01, n2)


def _orthonormal_complement(v: jnp.ndarray):
    """Two unit vectors orthogonal to unit v, branch-free."""
    ex = jnp.zeros_like(v).at[..., 0].set(1.0)
    ey = jnp.zeros_like(v).at[..., 1].set(1.0)
    e = jnp.where((jnp.abs(v[..., 0]) > 0.9)[..., None], ey, ex)
    u = jnp.cross(v, e)
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    w = jnp.cross(v, u)
    return u, w


def eigh3(a: jnp.ndarray):
    """Eigendecomposition of symmetric (..., 3, 3).

    Returns ``(eigvals, eigvecs)``: eigvals (..., 3) ascending; eigvecs (..., 3, 3)
    with ``eigvecs[..., :, k]`` the unit eigenvector of ``eigvals[..., k]``.
    """
    dtype = a.dtype
    w0, w1, w2 = _eigvals3_sym(a)
    eye = jnp.eye(3, dtype=dtype)

    # Most isolated extreme eigenvalue: min if the low gap is bigger, else max.
    iso_is_min = (w1 - w0) >= (w2 - w1)
    lam_iso = jnp.where(iso_is_min, w0, w2)

    m = a - lam_iso[..., None, None] * eye
    v_iso, n2 = _largest_cross_of_rows(m)

    # Fully degenerate spectrum (sphere): any basis works; pick e_x.
    scale = jnp.maximum(jnp.abs(w0), jnp.abs(w2))
    eps2 = (jnp.finfo(dtype).eps * (scale + 1.0)) ** 2 * 1e2
    degen = n2 <= eps2
    ex = jnp.zeros_like(v_iso).at[..., 0].set(1.0)
    v_iso = jnp.where(degen[..., None], ex, v_iso)
    v_iso = v_iso / jnp.linalg.norm(v_iso, axis=-1, keepdims=True)

    # Diagonalize A projected onto the complement of v_iso.
    u, w = _orthonormal_complement(v_iso)
    au = jnp.einsum("...ij,...j->...i", a, u)
    aw = jnp.einsum("...ij,...j->...i", a, w)
    puu = jnp.sum(u * au, axis=-1)
    pww = jnp.sum(w * aw, axis=-1)
    puw = jnp.sum(u * aw, axis=-1)

    # 2x2 symmetric eigen: rotation angle th, eigvals mu_lo <= mu_hi.
    th = 0.5 * jnp.arctan2(2.0 * puw, puu - pww)
    c, s = jnp.cos(th), jnp.sin(th)
    mu_a = c * c * puu + 2.0 * c * s * puw + s * s * pww
    mu_b = s * s * puu - 2.0 * c * s * puw + c * c * pww
    va = c[..., None] * u + s[..., None] * w
    vb = -s[..., None] * u + c[..., None] * w

    swap = mu_a > mu_b
    mu_lo = jnp.where(swap, mu_b, mu_a)
    mu_hi = jnp.where(swap, mu_a, mu_b)
    v_lo = jnp.where(swap[..., None], vb, va)
    v_hi = jnp.where(swap[..., None], va, vb)

    # Assemble ascending (val, vec) triplets depending on which extreme was isolated.
    l0 = jnp.where(iso_is_min, lam_iso, mu_lo)
    l1 = jnp.where(iso_is_min, mu_lo, mu_hi)
    l2 = jnp.where(iso_is_min, mu_hi, lam_iso)
    v0 = jnp.where(iso_is_min[..., None], v_iso, v_lo)
    v1 = jnp.where(iso_is_min[..., None], v_lo, v_hi)
    v2 = jnp.where(iso_is_min[..., None], v_hi, v_iso)

    vals = jnp.stack([l0, l1, l2], axis=-1)
    vecs = jnp.stack([v0, v1, v2], axis=-1)  # columns
    return vals, vecs


def min_eigpair3(a: jnp.ndarray):
    """(lambda_min, v_min) of symmetric (..., 3, 3) — the plane-fit fast path."""
    vals, vecs = eigh3(a)
    return vals[..., 0], vecs[..., :, 0]
