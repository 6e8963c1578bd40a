"""Fused KNN candidate search as a single Pallas TPU kernel.

The matcher's brute-force top-k (match.py:knn_search) materializes the full
(Q, T) squared-distance matrix in HBM before ``lax.approx_max_k`` reads it
back — at the shipped shapes (8192 x 24576 across the two per-sweep matches)
that is ~1.6 GB of pure HBM streaming, the single largest op family left in
the round-3 device profile (~2.2 ms/sweep).

This kernel fuses the distance computation with the same bin-reduction that
``approx_max_k`` performs (Chern et al. 2022, PartialReduce): targets are
binned by ``index mod n_bins``; for each query row the kernel keeps the
running per-bin minimum distance and its target index while streaming T in
n_bins-wide chunks. The (Q, T) matrix never exists — per grid step only a
(block_q, n_bins) tile lives in VMEM. The caller finishes with an exact
``lax.top_k`` over the (Q, n_bins) reduction (48x smaller than (Q, T)).

Two scoring modes (static ``mode``):

- ``"vpu"`` (default): per-dimension broadcast subtract+FMA — exact f32
  true distance with no expand-the-square cancellation and no padding
  waste; the depth is only 6-8 real dims.
- ``"mxu"``: one augmented matmul per tile. Descriptors are embedded as
  ``dq' = [-2 dq, 1, 0...]`` and ``dt' = [dt; |t|^2; 0...]`` in a 128-deep
  contraction, so ``s = dq' @ dt' = |t|^2 - 2 q.t`` — the true squared
  distance minus the per-query constant ``|q|^2`` (rankings identical; the
  wrapper adds ``|q|^2`` back). ``precision=HIGHEST`` keeps the f32
  semantics the matcher requires (MEASUREMENTS.md: the default one-pass
  bf16 Gram reorders near-equal neighbours structurally) but costs a
  6-pass product over a 94%-padding contraction. Kept for A/B.

Measured A/B vs the unfused Gram + ``approx_max_k`` path (TPU v5e, round 3):
at the shipped window shapes (Q=8192, T=8192/16384) the UNFUSED path wins
(2.9 ms vs 3.3-4.5 ms) — XLA already streams the Gram at near-bandwidth and
the fused kernel's recompute exceeds the saved HBM round-trip. The fused
VPU kernel wins once Q*T >= ~2^30 (Q=16384, T=65536: 14.5 vs 17.2 ms;
T=131072: 21.7 vs 26.7 ms), where the (Q, T) materialization no longer
fits cache-friendly tiles. ``match.knn_search`` auto-gates on that measured
crossover; at shipped shapes this kernel is the documented roofline
evidence that the matcher bucket is already at its memory bound.

Recall: the exact k-NN of a query survives unless two of its true top-k
collide in one bin with a better candidate. For k=10 uniformly hashed into
n_bins=512 the expected per-candidate loss is (k-1)/n_bins ~ 1.8%, i.e.
~98% recall — above the 0.95 recall_target the shipped approx_max_k path
requests (match.py), and measured ~0.99 on realistic descriptor clouds
(tests/test_knn_pallas.py, real-TPU run in MEASUREMENTS.md round 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wildcat_slam_tpu.utils.vma import out_struct


def _fold_chunk(s, j, base_cols, vals_ref, idx_ref):
    """Fold an (block_q, chunk_t) score tile into the persistent per-bin
    running minima. Static n_bins-aligned lane slices (no reshape — Mosaic
    keeps these free)."""
    chunk_t = s.shape[1]
    n_bins = vals_ref.shape[1]
    for g in range(chunk_t // n_bins):
        sv = s[:, g * n_bins:(g + 1) * n_bins]
        gidx = base_cols + g * n_bins + jax.lax.broadcasted_iota(
            jnp.int32, sv.shape, 1)
        if g == 0:
            @pl.when(j == 0)
            def _init():
                vals_ref[:] = sv
                idx_ref[:] = gidx

            @pl.when(j != 0)
            def _update():
                old = vals_ref[:]
                better = sv < old  # strict: ties keep the earlier target
                vals_ref[:] = jnp.where(better, sv, old)
                idx_ref[:] = jnp.where(better, gidx, idx_ref[:])
        else:
            old = vals_ref[:]
            better = sv < old
            vals_ref[:] = jnp.where(better, sv, old)
            idx_ref[:] = jnp.where(better, gidx, idx_ref[:])


def _knn_vpu_kernel(n_dims, dq_ref, dtt_ref, vals_ref, idx_ref):
    j = pl.program_id(1)
    dq = dq_ref[:]            # (block_q, D)
    dtt = dtt_ref[:]          # (D, chunk_t)
    # true squared distance on the VPU, one broadcast sub+FMA per descriptor
    # dim — exact f32, no |q|^2/|t|^2 terms ever form
    d = dq[:, 0:1] - dtt[0:1, :]
    s = d * d
    for dim in range(1, n_dims):
        d = dq[:, dim:dim + 1] - dtt[dim:dim + 1, :]
        s = s + d * d
    _fold_chunk(s, j, j * s.shape[1], vals_ref, idx_ref)


def _knn_mxu_kernel(dq_ref, dtt_ref, vals_ref, idx_ref):
    j = pl.program_id(1)
    # one (block_q, 128) @ (128, chunk_t) product: rows 0..D-1 of dtt are the
    # target descriptors, row D is |t|^2, the rest zero; dq is [-2 q, 1, 0..]
    s = jax.lax.dot_general(
        dq_ref[:], dtt_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    _fold_chunk(s, j, j * s.shape[1], vals_ref, idx_ref)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "n_dims", "n_bins", "block_q", "chunk_t",
                     "interpret"))
def _knn_bins(dq, dtt, *, mode: str, n_dims: int, n_bins: int, block_q: int,
              chunk_t: int, interpret: bool):
    q, d = dq.shape
    t = dtt.shape[1]
    grid = (q // block_q, t // chunk_t)
    kernel = (functools.partial(_knn_vpu_kernel, n_dims)
              if mode == "vpu" else _knn_mxu_kernel)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, chunk_t), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((block_q, n_bins), lambda i, j: (i, 0)),
            pl.BlockSpec((block_q, n_bins), lambda i, j: (i, 0)),
        ],
        out_shape=[
            # out_struct: propagate shard_map varying-manual-axes (check_vma)
            out_struct((q, n_bins), jnp.float32, dq, dtt),
            out_struct((q, n_bins), jnp.int32, dq, dtt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(dq, dtt)
    return vals, idx


def _pad_rows(x, mult, fill):
    n = x.shape[0]
    pad = (-n) % mult
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0)


def knn_topk_fused(dq, dt_, k: int, *, mode: str = "vpu", n_bins: int = 512,
                   block_q: int = 1024, chunk_t: int = 2048,
                   interpret: bool = False):
    """k nearest targets per query row by squared L2 distance, fused.

    dq: (Q, D) f32 query descriptors; dt_: (T, D) f32 target descriptors
    (rows the caller wants excluded must be pre-masked to a far value, as in
    match.py:knn_search). Returns (indices (Q, k) int32, squared distances
    (Q, k) f32) — same contract as the lax.approx_max_k path.
    """
    q_orig, d = dq.shape
    t_orig = dt_.shape[0]
    nb = min(n_bins, max(128, -(-t_orig // 128) * 128))
    bq = min(block_q, max(8, -(-q_orig // 8) * 8))
    tc = max(nb, min(chunk_t, -(-t_orig // nb) * nb))
    tc -= tc % nb
    # pad T with far rows (never win a bin), Q to the block grid
    far = jnp.asarray(1e6, jnp.float32)
    dq = dq.astype(jnp.float32)
    dt_ = dt_.astype(jnp.float32)
    dqp = _pad_rows(dq, bq, 0.0)
    dtp = _pad_rows(dt_, tc, far)
    if mode == "mxu":
        # augmented embedding in a 128-deep contraction (see module doc)
        qn = dqp.shape[0]
        tn = dtp.shape[0]
        dq_aug = jnp.concatenate(
            [-2.0 * dqp, jnp.ones((qn, 1), jnp.float32),
             jnp.zeros((qn, 128 - d - 1), jnp.float32)], axis=1)
        t2 = jnp.sum(dtp * dtp, axis=1, keepdims=True)
        dtt = jnp.concatenate(
            [dtp, t2, jnp.zeros((tn, 128 - d - 1), jnp.float32)], axis=1).T
        vals, idx = _knn_bins(dq_aug, dtt, mode=mode, n_dims=d, n_bins=nb,
                              block_q=bq, chunk_t=tc, interpret=interpret)
        # scores are |t|^2 - 2 q.t: restore true squared distances
        vals = vals[:q_orig] + jnp.sum(dq * dq, axis=1, keepdims=True)
    else:
        dtt = dtp.T  # (D, T): target-major lanes for the VPU row broadcasts
        vals, idx = _knn_bins(dqp, dtt, mode=mode, n_dims=d, n_bins=nb,
                              block_q=bq, chunk_t=tc, interpret=interpret)
        vals = vals[:q_orig]
    idx = idx[:q_orig]
    kk = min(k, vals.shape[1])
    neg, pos = jax.lax.top_k(-vals, kk)
    knn = jnp.take_along_axis(idx, pos, axis=1)
    d2 = -neg
    if kk < k:  # degenerate tiny-T case: repeat the last column
        knn = jnp.concatenate([knn] + [knn[:, -1:]] * (k - kk), axis=1)
        d2 = jnp.concatenate([d2] + [d2[:, -1:]] * (k - kk), axis=1)
    return knn.astype(jnp.int32), d2
