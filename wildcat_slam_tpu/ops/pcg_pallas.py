"""Fused block-Jacobi PCG solve as a single Pallas TPU kernel.

The LM inner solve works on H of size (S*12, S*12) — 1152x1152 f32 = 5.3 MB at
the shipped capacity, comfortably VMEM-resident. The XLA `lax.while_loop` PCG
(solver.py:_pcg_solve) re-reads H from HBM every iteration and pays loop
dispatch overhead per step (~1.8 ms/sweep at 24 iterations). This kernel keeps
H, the dense block-Jacobi preconditioner, and all CG vectors in VMEM for the
whole solve: per iteration two VMEM matvecs + elementwise work, nothing touches
HBM.

Damping is folded into the matvec (`H p + lam*d ∘ p`) so the damped matrix is
never materialized. The preconditioner must be the inverse of the DAMPED
diagonal blocks; the caller builds it (96 tiny 12x12 inverses + one
unique-index scatter into a dense block-diagonal).

Numerics match solver.py:_pcg_solve: same recurrence, same early-exit test
(|r|^2 <= tol^2 |b|^2), f32 throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wildcat_slam_tpu.utils.vma import out_struct


def _pcg_kernel(iters: int, tol: float, s_cap: int, precision, h_ref, dlam_ref,
                minv_ref, b_ref, x_ref):
    h = h_ref[:]
    minv = minv_ref[:]      # (S, 12, 12) damped block inverses
    dlam = dlam_ref[:]      # (N, 1) lam * diag(H) (clipped), the LM damping
    b = b_ref[:]            # (N, 1)
    f32 = jnp.float32
    b2 = jnp.sum(b * b)
    tiny = jnp.asarray(1e-30, f32)

    def mv(p):
        # MXU dot at HIGHEST (6-pass bf16 = true f32) — never the one-pass
        # bf16 default: its element noise perturbs every CG iterate on
        # ill-conditioned windows (same hazard as solver.py's H Gram —
        # MEASUREMENTS.md round 2). A VPU matvec (elementwise h * p with a
        # reduce) was attempted to dodge the 1-wide-rhs MXU inefficiency and
        # is NOT lowerable: Mosaic hangs compiling the lane-axis reduce for
        # n >= 384 (3 s at n = 96) and rejects the sublane-axis/row-state
        # variants with "unsupported shape cast" — see MEASUREMENTS.md
        # round 4 "fused-PCG VPU matvec: attempted, not lowerable".
        return jnp.dot(h, p, precision=precision,
                       preferred_element_type=f32) + dlam * p

    def prec(r):
        # block-Jacobi apply without materializing the dense block diagonal
        # (a dense (N, N) copy would blow the 16 MB VMEM budget next to H):
        # broadcast-multiply-reduce over the 12-wide block axis, VPU-only
        r2 = r.reshape(s_cap, 1, 12)
        return jnp.sum(minv * r2, axis=2).reshape(s_cap * 12, 1)

    r0 = b
    z0 = prec(r0)
    rz0 = jnp.sum(r0 * z0)

    def body(state):
        x, r, p, rz, k = state
        hp = mv(p)
        alpha = rz / jnp.maximum(jnp.sum(p * hp), tiny)
        x = x + alpha * p
        r = r - alpha * hp
        z = prec(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, tiny)
        return x, r, z + beta * p, rz_new, k + 1

    def cond(state):
        _, r, _, _, k = state
        return (k < iters) & (jnp.sum(r * r) > tol * tol * b2)

    x0 = jnp.zeros_like(b)
    x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, r0, z0, rz0, jnp.asarray(0, jnp.int32)))
    x_ref[:] = x


def fits_vmem(s_cap: int) -> bool:
    """True when the whole-solve kernel fits the 64 MB scoped-VMEM ceiling.

    The dominant resident is H ((S*12)^2 f32) and the compiler keeps a second
    stack copy of it through the while-loop body (measured: S=256 -> 68.6 MB
    scoped allocation, i.e. ~2x H, against a 64 MB limit -> compile error).
    Budget 2x H + preconditioner + CG vectors against 56 MB so oversized
    sample-state capacities (e.g. sample_dt=0.04 with max_sample_states=256)
    fall back to the HBM-streaming XLA PCG instead of failing to compile.
    """
    n = s_cap * 12
    est = 2 * n * n * 4 + s_cap * 144 * 4 + 16 * n * 4
    return est <= 56 * 1024 * 1024


def pcg_solve_fused(h, dlam, minv, b, *, iters: int, tol: float,
                    interpret: bool = False, precision=None):
    """x ≈ (H + diag(dlam))^-1 b via block-Jacobi PCG, one kernel launch.

    h: (N, N) f32 undamped normal matrix; dlam: (N,) damping diagonal;
    minv: (S, 12, 12) f32 inverses of the damped diagonal blocks; b: (N,) rhs.
    precision: matvec MXU precision; default HIGHEST (6-pass bf16 = true f32).
    In-kernel the only usable values are HIGHEST and DEFAULT — Mosaic raises
    NotImplementedError lowering Precision.HIGH inside a kernel, and DEFAULT
    (one-pass bf16) is excluded by the round-2 corridor hazard (see mv()).
    """
    n = h.shape[0]
    s_cap = n // 12
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    kern = functools.partial(_pcg_kernel, iters, tol, s_cap, precision)
    x = pl.pallas_call(
        kern,
        # out_struct: propagate shard_map varying-manual-axes (check_vma)
        out_shape=out_struct((n, 1), h.dtype, h, dlam, minv, b),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        # H (5.3 MB at the shipped capacity) + its in-kernel value copy push
        # the scoped window past the 16 MB default; v5e has headroom above it
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(h, dlam.reshape(n, 1), minv, b.reshape(n, 1))
    return x.reshape(n)


def batched_small_inverse(a: jnp.ndarray) -> jnp.ndarray:
    """Batched (B, n, n) inverse by unrolled Gauss-Jordan, no pivoting.

    Valid for SPD inputs (the damped normal-equation diagonal blocks), where
    pivots stay positive — the same regime where Cholesky needs no pivoting.
    ``jnp.linalg.inv`` lowers to an LuDecompositionBlock custom call plus
    (n, n)-minor layout-change copies (~1.9 ms/sweep traced at B=96, n=12);
    n unrolled elimination steps of elementwise VPU work fuse to ~nothing."""
    n = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    aug = jnp.concatenate([a, eye], axis=-1)                  # (B, n, 2n)
    for k in range(n):
        piv = aug[:, k, :] / aug[:, k, k:k + 1]               # (B, 2n)
        aug = aug - aug[:, :, k:k + 1] * piv[:, None, :]
        aug = aug.at[:, k, :].set(piv)
    return aug[:, :, n:]


def extract_diag_blocks(h, s_cap: int):
    """(S, 12, 12) diagonal 12x12 blocks of (S*12, S*12) H by mask-multiply +
    reduce. The natural formulation — ``h.reshape(S,12,S,12)[ar,:,ar,:]`` — is
    a gather whose index-friendly layout costs a full (S*12, S*12) transpose
    copy on TPU (~0.6 ms/sweep traced); the masked reduction reads H once in
    whatever layout it already has and fuses."""
    bi = jnp.arange(s_cap * 12) // 12
    mask = (bi[:, None] == bi[None, :]).astype(h.dtype)
    return (h * mask).reshape(s_cap, 12, s_cap, 12).sum(axis=2)


def block_diag_inverse(h, dlam, s_cap: int, diag_blocks=None):
    """(S, 12, 12) inverses of the damped 12x12 diagonal blocks of H — the
    block-Jacobi preconditioner, applied blockwise inside the kernel.
    ``diag_blocks``: optional precomputed UNDAMPED diagonal blocks (the solver
    extracts them once per re-linearization and re-damps per LM iteration)."""
    if diag_blocks is None:
        diag_blocks = extract_diag_blocks(h, s_cap)
    return batched_small_inverse(
        diag_blocks + jax.vmap(jnp.diag)(dlam.reshape(s_cap, 12)))
