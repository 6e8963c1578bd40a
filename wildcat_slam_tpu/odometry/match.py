"""Surfel correspondence search.

TPU-native replacement for ``KnnSurfelMatcher`` (knn_surfel_matcher.{h,cc}): the
FLANN KD-tree over 6-D descriptors becomes one dense masked distance computation
(a (Q, T) matmul on the MXU — window surfel counts are 10^2..10^4, where a
brute-force tile beats tree construction) followed by ``lax.approx_max_k``
(exact ``lax.top_k`` available via ``approx=False``); the reference's
sequential accept loop becomes k parallel acceptance rounds.

Descriptor (knn_surfel_matcher.cc:91-98): center / kCenterDistThreshold (1 m)
concatenated with world normal / kAngularDistThreshold (5 deg).

Acceptance filters per candidate, in rank order (knn_surfel_matcher.cc:25-47):
1. |t_q - t_c| >= 0.06 s,
2. angular distance of world normals <= 5 deg,
3. |n_q . (c_q - c_c)| <= 0.1 m,
4. the unordered pair not accepted already; first passing candidate wins.

Sequential-equivalence proof (self-match): the reference walks queries in
storage order; query q accepts its first candidate c passing the filters whose
unordered pair {q, c} is not already in the accepted set
(knn_surfel_matcher.cc:16-49). Since q contributes exactly one pair and is
processed once, {q, c} can pre-exist only as c's own acceptance with c < q.
Hence the accepted partner satisfies the recurrence

    partner[q] = knn[q, r*],  r* = first rank r with ok[q, r]
                 and NOT (knn[q, r] < q  and  partner[knn[q, r]] == q)

whose right side reads partner[] only at indices < q — by strong induction
over q it has a UNIQUE solution, which is exactly the sequential result. The
implementation iterates the parallel update F(partner) to a fixed point:
after t sweeps partner is correct for every query whose dedup-dependency
chain is shorter than t, so F converges in max-chain-depth steps (measured
2-4; capped at Q), and any fixed point of F is the unique solution. At the
fixed point no pair can be recorded from both sides (if partner[i] = j, i < j,
then j's dup test sees partner[i] == j and skips i), so emission is simply
every matched query. Pairs are emitted time-ordered by the factor builder
(s1.t < s2.t, knn_surfel_matcher.cc:41-45).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from wildcat_slam_tpu.ops.knn_pallas import knn_topk_fused
from wildcat_slam_tpu.utils.vma import is_varying as vma_is_varying, vary

# MXU precision of the (Q, 6) x (6, T) distance Gram. The contraction depth is
# 6 (padded to 128 on the MXU), so redundant lane work x pass count IS the
# cost of this op: 3-pass HIGH measured recall@10 = 0.9800 vs HIGHEST's 0.9802
# against an f64-exact ranking at shipped shapes, at 70% of the time (4.01 ->
# 2.83 ms/search incl. top-k), with regime ATEs identical to noise; one-pass
# DEFAULT drops recall to 0.9351 — below the 0.95 target (the round-2 ranking
# hazard, re-measured). benchmarks/ab_match_precision.py, MEASUREMENTS round 4.
GRAM_PRECISION = jax.lax.Precision.HIGH


@partial(jax.jit, static_argnames=("k", "approx", "fused"))
def knn_search(
    cq: jnp.ndarray, nq: jnp.ndarray, vq: jnp.ndarray,
    ct: jnp.ndarray, nt: jnp.ndarray, vt: jnp.ndarray,
    *,
    center_dist: float = 1.0,
    angular_dist: float = 5.0 * jnp.pi / 180.0,
    k: int = 10,
    approx: bool = True,
    fused: bool | None = None,
):
    """k nearest targets per query in the 6-D scaled descriptor space
    (KnnSurfelMatcher::KNearestSearch, knn_surfel_matcher.cc:51-89).
    Returns (indices (Q, k), squared distances (Q, k)).

    ``approx=True`` selects :func:`jax.lax.approx_max_k` — the TPU-native
    partial-reduce top-k (Chern et al. 2022) — instead of the exact TopK custom
    call, which dominated the match cost (~6 ms/sweep at Q=4k, T=4k+8k; the
    approx kernel is ~5x faster). A >=95% per-candidate recall is more faithful
    to the reference than exactness is: its FLANN index is built with
    ``flann::KDTreeSingleIndexParams`` + finite ``checks`` (approximate search,
    knn_surfel_matcher.cc:61-66), and the downstream Cauchy-robust factors are
    insensitive to an occasional rank-swapped neighbour."""
    dtype = cq.dtype
    # re-center about the valid-query centroid: the expand-the-square distance
    # below cancels catastrophically in f32 once |c|^2 dwarfs the separations
    # (at 450 m from the world origin the noise reaches the real inter-surfel
    # descriptor distances, scrambling the ranking); distances are translation-
    # invariant, so subtract a common offset first
    wsum = jnp.maximum(jnp.sum(vq.astype(dtype)), 1.0)
    c0 = jnp.sum(jnp.where(vq[:, None], cq, 0.0), axis=0) / wsum
    dq = jnp.concatenate([(cq - c0) / center_dist, nq / angular_dist], axis=1)
    dt_ = jnp.concatenate([(ct - c0) / center_dist, nt / angular_dist], axis=1)
    far = jnp.asarray(1e6, dtype)
    dt_ = jnp.where(vt[:, None], dt_, far)
    dq = jnp.where(vq[:, None], dq, -far)
    if approx and fused is None:
        # the fused Pallas path is TPU-only (same gate as solver.use_fused_pcg)
        # and size-gated: at the shipped window shapes (Q=8192, T<=16384) the
        # unfused XLA Gram + approx_max_k is FASTER (2.9 ms vs 3.3-4.5 ms —
        # MEASUREMENTS.md round 3); the fused kernel's HBM savings only beat
        # its extra VPU work once the (Q, T) product reaches ~2^30 (measured
        # crossover: Q=16384, T=65536 -> 14.5 ms fused vs 17.2 ms unfused,
        # widening with T). CPU tests and f64 always take the portable paths.
        fused = (dtype == jnp.float32
                 and dq.shape[0] * dt_.shape[0] >= (1 << 30)
                 and jax.devices()[0].platform == "tpu"
                 # pallas_call can't trace under shard_map check_vma
                 # (utils/vma.py is_varying; docs/ISSUES.md)
                 and not vma_is_varying(dq))
    if approx and fused:
        # single-kernel distance + per-bin reduction: the (Q, T) matrix never
        # touches HBM (ops/knn_pallas.py; ~98% realized recall vs the 0.95
        # recall_target requested below)
        return knn_topk_fused(dq, dt_, k)
    # near-f32 Gram: TPU matmuls default to one-pass bf16, whose ~0.4% noise
    # on d^2 reorders near-equal neighbours — the candidate sets then differ
    # structurally from the exact ranking (measured 70% pair-set divergence
    # CPU vs TPU on corridor scenes; re-measured round 4 as recall@10 0.935 <
    # the 0.95 target). GRAM_PRECISION (module constant above) picks 3-pass
    # HIGH: ranking-identical to 6-pass HIGHEST at 2/3 the passes.
    d2 = (
        jnp.sum(dq * dq, axis=1)[:, None]
        - 2.0 * jnp.matmul(dq, dt_.T, precision=GRAM_PRECISION)
        + jnp.sum(dt_ * dt_, axis=1)[None, :]
    )
    if approx:
        neg, knn = jax.lax.approx_max_k(-d2, k, recall_target=0.95)
    else:
        neg, knn = jax.lax.top_k(-d2, k)
    return knn.astype(jnp.int32), -neg


@partial(jax.jit, static_argnames=("k", "max_pairs", "self_match", "approx"))
def match_surfels(
    cq: jnp.ndarray, nq: jnp.ndarray, tq: jnp.ndarray, vq: jnp.ndarray,
    ct: jnp.ndarray, nt: jnp.ndarray, tt: jnp.ndarray, vt: jnp.ndarray,
    *,
    center_dist: float = 1.0,
    angular_dist: float = 5.0 * jnp.pi / 180.0,
    surfel_dist: float = 0.1,
    time_diff: float = 0.06,
    k: int = 10,
    max_pairs: int = 8192,
    self_match: bool = False,
    approx: bool = True,
):
    """Match query surfels (cq centers, nq world normals, tq times, vq valid)
    against targets. For ``self_match=True`` query and target must be the same
    arrays (the sliding-window self-match, lidar_odometry.cc:532-534).

    Returns (iq, it, valid, n_dropped): (max_pairs,) index arrays into
    query/target with a validity mask, plus a scalar int32 count of accepted
    pairs that did NOT fit into max_pairs (overflow telemetry — the reference's
    pair deque is unbounded, so capacity loss must never be silent). Pairs are
    ordered so query time < target time is NOT implied — instead (iq, it)
    preserve roles and ``swap`` is applied by the caller via times. (The
    emitted pair always has t[s1] < t[s2] when consumed by factors.)
    """
    q_cap = cq.shape[0]

    # (measured: the TopK custom call beats a two-stage tiled top-k, which XLA
    # lowers to a slower variadic sort; approx_max_k beats both — see knn_search)
    knn, _ = knn_search(cq, nq, vq, ct, nt, vt,
                        center_dist=center_dist, angular_dist=angular_dist, k=k,
                        approx=approx)

    # Per-candidate filter mask (vectorized once for all ranks). One packed
    # (T, 8) gather instead of four narrow ones — TPU random row gathers are
    # bandwidth-miserable on 4-byte rows, so width is everything.
    dtype = cq.dtype
    tgt = jnp.concatenate(
        [tt[:, None], ct, nt, vt.astype(dtype)[:, None]], axis=1)  # (T, 8)
    g = tgt[knn]                                # (Q, k, 8)
    cand_t = g[..., 0]
    cand_c = g[..., 1:4]
    cand_n = g[..., 4:7]
    cand_v = g[..., 7] > 0.5
    dt_abs = jnp.abs(cand_t - tq[:, None])
    # angular gate in cosine space: arccos(f32) near 1 loses ~half its
    # precision (and TPU transcendentals differ from CPU's); the comparison
    # cos(ang) >= cos(thr) is exact and monotone-equivalent
    cosang = jnp.clip(jnp.sum(nq[:, None, :] * cand_n, axis=-1), -1.0, 1.0)
    pp = jnp.abs(jnp.sum(nq[:, None, :] * (cq[:, None, :] - cand_c), axis=-1))
    ok = (
        cand_v
        & vq[:, None]
        & (dt_abs >= time_diff)
        & (cosang >= jnp.cos(jnp.asarray(angular_dist, dtype)))
        & (pp <= surfel_dist)
    )

    qidx = jnp.arange(q_cap, dtype=jnp.int32)
    no_partner = jnp.int32(-1)

    if self_match:
        # fixed-point iteration of the sequential recurrence (module doc):
        # each sweep recomputes every query's first acceptable candidate given
        # the current partners; converges in max dedup-chain-depth sweeps
        # (measured 2-4) to the unique sequential solution
        cand = knn.astype(jnp.int32)             # (Q, k)

        def fp_body(state):
            partner, _, it = state
            # dup[q, r] = cand[q, r] < q  AND  partner[cand[q, r]] == q.
            # Computed from the candidate's side: each matched c with
            # p = partner[c] > c blocks exactly the ranks r of p where
            # cand[p, r] == c. That is one k-wide row gather (cand[p])
            # plus one k-wide row scatter — Q rows each — instead of the
            # direct partner[cand] gather of Q*k width-1 rows (TPU
            # gathers fetch whole tiled rows, so width-1 rows waste the
            # lane dimension; measured 3.1 ms/sweep at Q=8192, k=10).
            blocks = partner > qidx                  # c matched, p > c
            pc = jnp.where(blocks, partner, 0)
            contrib = (cand[pc] == qidx[:, None]) & blocks[:, None]
            # distinct sources c never collide on one (p, r): the slot
            # receives only from c == cand[p, r]
            dup = jnp.zeros(ok.shape, jnp.int32).at[pc].add(
                contrib.astype(jnp.int32)) > 0
            okr = ok & ~dup
            has = jnp.any(okr, axis=1)
            first = jnp.argmax(okr, axis=1)
            new = jnp.where(has, cand[qidx, first], no_partner)
            return new, jnp.any(new != partner), it + 1

        def fp_cond(state):
            return state[1] & (state[2] < q_cap)

        partner0 = jnp.full((q_cap,), no_partner, jnp.int32)
        # vary(): literal inits must be marked axis-varying under shard_map
        # check_vma (identity unsharded) — see utils/vma.py
        partner, _, _ = jax.lax.while_loop(
            fp_cond, fp_body,
            vary(partner0, jnp.asarray(True), jnp.asarray(0, jnp.int32)))
        matched = partner != no_partner
    else:
        # disjoint query/target sets: the dedup can never trigger (each query
        # contributes a distinct pair), so the sequential fall-through is just
        # "first passing rank wins" — closed form (argmax on bool = first True)
        matched = jnp.any(ok, axis=1)
        first = jnp.argmax(ok, axis=1)
        partner = jnp.where(
            matched, knn[qidx, first].astype(jnp.int32), no_partner)

    # at the self-match fixed point both-sided pairs are impossible (module
    # doc), so every matched query emits exactly once
    emit = matched

    # compact to max_pairs: valid pairs first, stable
    n_emit = jnp.sum(emit.astype(jnp.int32))
    n_dropped = jnp.maximum(0, n_emit - max_pairs)
    order = jnp.argsort(~emit, stable=True)[:max_pairs]
    iq = qidx[order]
    it = jnp.where(emit[order], partner[order], 0).astype(jnp.int32)
    valid = emit[order]
    return iq, it, valid, n_dropped
