"""On-device sliding-window solver: Levenberg-Marquardt with Cauchy IRLS.

Replaces the reference's Ceres solve (lidar_odometry.cc:540-562: SPARSE_NORMAL_
CHOLESKY, <=100 iterations, CauchyLoss(0.4) on surfel factors, TrivialLoss on IMU
factors, first-ever sample state's position frozen via SubsetParameterization).

TPU-first design: instead of Ceres's sparse CHOLMOD path, the normal equations
H = J^T J, g = J^T r are assembled directly on device — surfel factors as dense
per-factor rows contracted on the MXU (at S ~ 80 the full H is only ~1k x 1k,
far below the crossover where sparsity wins), IMU factors via a banded
reduction (their blocks always span a contiguous 3-block window, see
``_imu_banded_normal_eqs``). Robustification is IRLS: rows are scaled by
sqrt(rho'(r^2)) with rho the Cauchy loss (the first-order Triggs correction;
Ceres additionally applies a rank-1 curvature correction which vanishes as
residuals shrink). Gauge handling masks frozen parameters to identity rows/cols.

The LM loop is a ``lax.while_loop`` with Nielsen's gain-ratio damping schedule;
(H, g) are rebuilt only after accepted steps, candidate costs use a
residual-only evaluation, and the linear solve is dense Cholesky or
block-Jacobi PCG (configurable).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from wildcat_slam_tpu.odometry import factors as fmod
from wildcat_slam_tpu.odometry.states import SampleStates
from wildcat_slam_tpu.ops import pcg_pallas
from wildcat_slam_tpu.utils.vma import is_varying, vary


def _shift_down(a, d):
    """a[r - d] along axis 0 with zeros for r < d (static small d)."""
    if d == 0:
        return a
    return jnp.concatenate([jnp.zeros_like(a[:d]), a[:-d]], axis=0)


def _place_block_bands(bands, s_cap: int, dtype):
    """Dense (S*12, S*12) H from per-delta block bands.

    ``bands`` maps a block-diagonal offset ``delta`` to a (S, 12, 12) array B
    with B[r] the 12x12 block at block-row r, block-col r + delta. The
    placement is a mask-multiply — ``H[r*12+i, c*12+j] = sum_delta
    B_d[r, i, j] * (c == r + delta)`` — which XLA fuses into ONE output fusion
    writing the 5.3 MB H directly in its consumer layout. The previous
    formulation (scatter-adds into a (S+2)-padded buffer, then crop) paid
    ~1.5 ms/sweep of pad/slice/layout copies around the scatters, re-paid
    inside the LM loop's re-linearization conditional.

    Shapes are arranged so every reshape only merges ADJACENT dims — (S, 12,
    S) -> (S*12, S) and (n, S, 12) -> (n, S*12) are layout bitcasts. The
    earlier 4-D formulation ((S, 12, S, 12) then one final reshape) made XLA
    reshape the cross matrix D INTO the 4-D tiled layout (minor dim 12 padded
    to the 128 lane tile) to do the add there and reshape the sum back:
    ~0.36 ms/sweep of pure data formatting around the adds (trace round 4,
    reshape.60/.32/.4267 + add_add_fusion).
    """
    ar = jnp.arange(s_cap)
    n = s_cap * 12
    h2 = jnp.zeros((n, n), dtype)
    for delta, blk in sorted(bands.items()):
        oh = (ar[:, None] + delta == ar[None, :]).astype(dtype)       # (S, S)
        ohr = jnp.broadcast_to(oh[:, None, :], (s_cap, 12, s_cap)).reshape(n, s_cap)
        h2 = h2 + (ohr[:, :, None] * blk.reshape(n, 12)[:, None, :]).reshape(n, n)
    return h2


def _add_band(bands, delta, blk):
    bands[delta] = blk if delta not in bands else bands[delta] + blk


def _imu_banded_normal_eqs(jac, idx, ri, s_cap):
    """IMU-factor contribution to (H, g): per-delta block bands plus g.

    An IMU factor's three interpolation times span two ticks — far less than the
    sample spacing — so all six touched blocks lie in a contiguous 3-block band
    starting at ``base = min(idx)``. Instead of scattering (Mi*12, S*12) dense
    rows (tens of MB, the dominant assembly cost), each factor reduces to a
    (12, 36) band; band outer products segment-sum over base into (S, 36, 36),
    whose 3x3 block grid reads off as five block-diagonal bands
    (delta = dj - di in [-2, 2]) for :func:`_place_block_bands`.
    """
    dtype = jac.dtype
    base = jnp.min(idx, axis=1)                     # (Mi,)
    rel = idx - base[:, None]                       # values in {0, 1, 2}

    band = jnp.concatenate(
        [
            sum(jnp.where((rel[:, k] == d)[:, None, None], jac[:, k], 0.0) for k in range(6))
            for d in range(3)
        ],
        axis=2,
    )                                               # (Mi, 12, 36)

    hp = jax.lax.Precision.HIGHEST  # true f32: TPU einsum defaults to bf16
    hb = jnp.einsum("mri,mrj->mij", band, band, precision=hp)   # (Mi, 36, 36)
    gb = jnp.einsum("mri,mr->mi", band, ri, precision=hp)       # (Mi, 36)
    # per-base accumulation as a one-hot contraction (MXU) rather than a
    # duplicate-index scatter-add (serialized on TPU)
    oh = (base[:, None] == jnp.arange(s_cap)[None, :]).astype(dtype)  # (Mi, S)
    hseg = jnp.einsum("ms,mij->sij", oh, hb, precision=hp)     # (S, 36, 36)
    gseg = jnp.einsum("ms,mi->si", oh, gb, precision=hp)        # (S, 36)

    # block (di, dj) of a band based at r lands at (r + di, r + dj): fold the
    # base shift into per-delta bands B[rr] = sum_di hseg[rr - di][di, di+delta]
    hseg_blocks = hseg.reshape(s_cap, 3, 12, 3, 12)             # (S, di, i, dj, j)
    bands = {}
    for di in range(3):
        for dj in range(3):
            _add_band(bands, dj - di, _shift_down(hseg_blocks[:, di, :, dj, :], di))
    gseg_blocks = gseg.reshape(s_cap, 3, 12)
    g = sum(_shift_down(gseg_blocks[:, di], di) for di in range(3)).reshape(s_cap * 12)
    return bands, g


def _surfel_normal_eqs(j1v, j2v, rs_w, fac, w1, w2, s_cap, nb):
    """Surfel-factor contribution to (H, g) without the full dense Gram.
    Returns (bands, d, g): block bands for :func:`_place_block_bands`, the
    dense cross matrix D (added as D + D^T), and the gradient.

    Each factor row has at most four nonzero 12-blocks — the lerp brackets
    (b1, b1+1) and (b2, b2+1) — so its J^T J contribution decomposes into
      * A11 = j1 j1^T on the 2x2 block square at (b1, b1)  [binary rows only]
      * A22 = j2 j2^T on the 2x2 block square at (b2, b2)
      * A12 = j1 j2^T on the 2x2 block square at (b1, b2), plus its transpose.
    The dense formulation (J = W1 (x) j1 + W2 (x) j2 then J^T J on the MXU)
    squares the M x S*12 J — measured 4.4 ms/sweep of Gram plus ~1.1 ms of J
    materialization at M=16384, S=96, ~24x of it structural zeros. Here the
    two diagonal families (which need no cross-block structure) reduce by
    one-hot MXU contractions over their base block — the
    ``_imu_banded_normal_eqs`` pattern, O(M * 144) — and only the cross
    family, whose (b1, b2) support is genuinely unstructured, pays an MXU
    product: D = B1^T B2 over the nb binary rows alone, half the FLOPs of
    one full-width Gram and a quarter of the original two. (A fully
    block-sparse cross assembly — sort by bracket pair + running-sum range
    reduction — was measured SLOWER than this matmul: the (S, S, 2, 2, 12,
    12) grid rearrangement costs ~4.5 ms of layout copies on TPU.)

    ``j1v``/``j2v``: (M, 12) raw side Jacobians with IRLS sqrt-weight applied;
    ``rs_w``: weighted residuals; ``w1``/``w2``: the (M, S) bracket-lerp
    matrices (:func:`factors.interp_weights`); rows [0:nb] are the binary
    factors (unary rows have j1 = 0 and contribute only to A22).
    """
    dtype = j1v.dtype
    hp = jax.lax.Precision.HIGHEST  # true f32 (TPU matmul defaults to bf16)
    S = s_cap

    g = (jnp.einsum("ms,mi->si", w1, j1v * rs_w[:, None], precision=hp)
         + jnp.einsum("ms,mi->si", w2, j2v * rs_w[:, None], precision=hp)
         ).reshape(S * 12)

    ar = jnp.arange(S, dtype=jnp.int32)

    def diag_payload(jv, f):
        # combo c = di + dj: (1-f)^2 at (b, b), (1-f) f at (b, b+1)/(b+1, b),
        # f^2 at (b+1, b+1); the outer product is symmetric so one payload
        # serves both off-diagonal positions
        a = (jv[:, :, None] * jv[:, None, :]).reshape(jv.shape[0], 144)
        c = jnp.stack([(1.0 - f) * (1.0 - f), (1.0 - f) * f, f * f], axis=1)
        return (c[:, :, None] * a[:, None, :]).reshape(jv.shape[0], 3 * 144)

    oh1 = (fac.i1l[:nb, None] == ar).astype(dtype)
    oh2 = (fac.i2l[:, None] == ar).astype(dtype)
    t11 = jnp.einsum("ms,mx->sx", oh1, diag_payload(j1v[:nb], fac.f1[:nb]),
                     precision=hp).reshape(S, 3, 12, 12)
    t22 = jnp.einsum("ms,mx->sx", oh2, diag_payload(j2v, fac.f2),
                     precision=hp).reshape(S, 3, 12, 12)
    tdiag = t11 + t22

    # combo c = di + dj at (r + di, r + dj) reads off as three bands:
    # delta 0 gets c=0 at r and c=2 at r+1; delta +/-1 both get c=1
    bands = {}
    _add_band(bands, 0, tdiag[:, 0] + _shift_down(tdiag[:, 2], 1))
    _add_band(bands, 1, tdiag[:, 1])
    _add_band(bands, -1, _shift_down(tdiag[:, 1], 1))

    # cross term over the binary rows: expand each side once, one MXU product.
    # Precision HIGH (3-pass bf16), not HIGHEST (6-pass): the 3-pass product
    # error (~2^-22 relative) sits BELOW the f32 accumulation noise of this
    # 8192-term contraction (~sqrt(N) * 2^-24 ~ 5e-6 relative), so HIGH is
    # statistically indistinguishable from HIGHEST here at half the MXU cost.
    # The round-2 corridor hazard (MEASUREMENTS.md) was the one-pass bf16
    # DEFAULT, 4000x coarser; validated on the weak-observability TPU regimes
    # (doored ramp corridor, cylinder — ATE unchanged within jitter).
    b1 = jnp.einsum("ms,mj->msj", w1[:nb], j1v[:nb],
                    precision=hp).reshape(nb, S * 12)
    b2 = jnp.einsum("ms,mj->msj", w2[:nb], j2v[:nb],
                    precision=hp).reshape(nb, S * 12)
    d = jnp.dot(b1.T, b2, precision=jax.lax.Precision.HIGH,
                preferred_element_type=dtype)

    return bands, d, g


class SolveStats(NamedTuple):
    iterations: jnp.ndarray
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    # final LM damping: lambda that keeps growing across iterations means the
    # quadratic model is untrustworthy — a cheap ill-conditioning symptom that
    # complements factors.direction_coverage (part of the degeneracy health
    # signal; the reference exposes nothing comparable)
    lambda_final: jnp.ndarray


def _pcg_solve(h: jnp.ndarray, b: jnp.ndarray, s_cap: int, iters: int, tol: float):
    """Solve h x = b by preconditioned CG with a block-Jacobi (12x12)
    preconditioner. TPU-friendly alternative to dense Cholesky: each iteration
    is one (N, N) matvec + elementwise work, which XLA fuses far better than the
    sequential panel updates of a factorization."""
    diag_blocks = pcg_pallas.extract_diag_blocks(h, s_cap)  # (S, 12, 12)
    minv = pcg_pallas.batched_small_inverse(diag_blocks)

    def prec(r):
        return jnp.einsum("sij,sj->si", minv, r.reshape(s_cap, 12)).reshape(-1)

    b2 = jnp.sum(b * b)
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = prec(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)

    def body(state):
        x, r, p, rz, k = state
        # true-f32 matvec: the TPU f32 dot default is one-pass bf16, whose
        # ~0.4% noise perturbs every CG iterate exactly when curvature is
        # weakest (see MEASUREMENTS.md round 2, corridor divergence)
        hp = jnp.matmul(h, p, precision=jax.lax.Precision.HIGHEST)
        alpha = rz / jnp.maximum(jnp.sum(p * hp), jnp.finfo(h.dtype).tiny)
        x = x + alpha * p
        r = r - alpha * hp
        z = prec(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, jnp.finfo(h.dtype).tiny)
        p = z + beta * p
        return x, r, p, rz_new, k + 1

    def cond(state):
        _, r, _, _, k = state
        return (k < iters) & (jnp.sum(r * r) > tol * tol * b2)

    # vary(): the zero x0 and counter are literal inits; under shard_map
    # check_vma they must be marked axis-varying (identity unsharded)
    x, _, _, _, _ = jax.lax.while_loop(
        cond, body, vary(x0, r0, p0, rz0, jnp.asarray(0, jnp.int32)))
    return x


@partial(jax.jit, static_argnames=("max_iterations", "dt", "linear_solver", "pcg_iters",
                                   "pcg_tol", "n_binary"))
def solve_window(
    sample: SampleStates,
    sfac: fmod.SurfelFactors,
    ifac: fmod.ImuFactors,
    weights: tuple,          # (w_g, w_a, w_bg, w_ba) traced or python floats
    dt: float,
    grav: jnp.ndarray,
    fix_first_pos: jnp.ndarray,  # () bool — freeze pos of state 0 (cc:556-560)
    cauchy_scale: float = 0.4,
    max_iterations: int = 100,
    init_lambda: float = 1e-4,
    function_tolerance: float = 1e-6,
    linear_solver: str = "pcg",
    pcg_iters: int = 96,
    pcg_tol: float = 1e-6,
    n_binary: int | None = None,
    remap_proj: tuple | None = None,
):
    """Optimize the correction state of the sliding window in place.

    ``remap_proj`` (optional): ``(W_t, W_r)`` weak-subspace projectors from
    :func:`factors.degeneracy_projectors` — every LM step's common-mode
    translation/rotation component along the collapsed directions is removed
    before the candidate evaluation (degeneracy solution remapping; exact
    no-op when both W are zero, i.e. on healthy scenes).

    Returns (sample with updated cor, SolveStats).
    """
    s_cap = sample.capacity
    n_par = s_cap * 12
    dtype = sample.cor.dtype
    a2 = jnp.asarray(cauchy_scale**2, dtype)

    # free-parameter mask: valid states only; optionally freeze state-0 position
    par_state = jnp.arange(n_par) // 12
    par_slot = jnp.arange(n_par) % 12
    free = par_state < sample.count
    frozen_pos0 = (par_state == 0) & (par_slot >= 3) & (par_slot < 6) & fix_first_pos
    free = free & ~frozen_pos0

    # rows [0:n_binary] are the binary factors; unary rows have j1 = 0, so
    # the cross/diag-1 terms of the normal equations run on this slice only
    nb = sfac.valid.shape[0] if n_binary is None else n_binary

    # bracket-lerp weight matrices: constant through the solve, shared by the
    # interpolation (MXU matmul instead of row gathers) and the gradient /
    # cross-term contractions
    w_interp = fmod.interp_weights(sfac, s_cap, dtype)

    # degeneracy solution remapping (Zhang & Singh ICRA'16 §V adapted to the
    # joint solve): remove the common-mode step along the weak axes — the
    # differential components (IMU-observable) pass through untouched, and
    # the dead-reckoned prediction stands in along the collapsed directions.
    # Applied to the candidate BEFORE its cost evaluation so acceptance and
    # the gain ratio see the step that is actually taken.
    if remap_proj is not None:
        w_t_proj, w_r_proj = remap_proj
        smask = (jnp.arange(s_cap) < sample.count).astype(dtype)   # (S,)
        s_count = jnp.maximum(jnp.sum(smask), 1.0)

        def remap_step(delta):
            d2 = delta.reshape(s_cap, 12)
            mean_rot = jnp.einsum("s,si->i", smask, d2[:, 0:3]) / s_count
            mean_pos = jnp.einsum("s,si->i", smask, d2[:, 3:6]) / s_count
            sub_rot = w_r_proj @ mean_rot     # weak-subspace common mode
            sub_pos = w_t_proj @ mean_pos
            d2 = d2.at[:, 0:3].add(-smask[:, None] * sub_rot[None, :])
            d2 = d2.at[:, 3:6].add(-smask[:, None] * sub_pos[None, :])
            return d2.reshape(-1)
    else:
        def remap_step(delta):
            return delta

    # the fused Pallas PCG runs on real TPU backends only ("pcg_xla" forces the
    # portable lax.while_loop path; CPU tests and f64 always use it), and only
    # when the whole solve fits scoped VMEM (oversized sample capacities fall
    # back to the HBM-streaming XLA PCG instead of failing to compile). Under
    # shard_map (the batched-windows path) pallas_call cannot trace with
    # check_vma=True (utils/vma.py is_varying; docs/ISSUES.md) — the sharded
    # program takes the XLA PCG instead.
    use_fused_pcg = (
        linear_solver == "pcg"
        and dtype == jnp.float32
        and jax.devices()[0].platform == "tpu"
        and pcg_pallas.fits_vmem(s_cap)
        and not is_varying(sample.cor)
    )

    def eval_cost(cor_flat):
        # residual-only fast path: no Jacobians on the candidate evaluation
        cor = cor_flat.reshape(s_cap, 12)
        rs, _, _ = fmod.surfel_residuals(sfac, cor, with_jac=False, w_interp=w_interp)
        ri, _, _ = fmod.imu_residuals(ifac, cor, weights, dt, grav, with_jac=False)
        robust = a2 * jnp.log1p(rs * rs / a2)
        return 0.5 * (jnp.sum(robust) + jnp.sum(ri * ri))

    def build_normal_eqs(cor_flat):
        cor = cor_flat.reshape(s_cap, 12)
        rs, jac_s, idx_s = fmod.surfel_residuals(sfac, cor, w_interp=w_interp)
        ri, jac_i, idx_i = fmod.imu_residuals(ifac, cor, weights, dt, grav)

        # Cauchy IRLS scaling: sqrt(rho'(s)), rho'(s) = 1/(1 + s/a^2)
        sw = 1.0 / jnp.sqrt(1.0 + rs * rs / a2)
        # raw side Jacobians: the lerp factors in jac_s blocks (0+1) and
        # (2+3) cancel; IRLS weight folded in so outer products carry sw^2
        j1v = (jac_s[:, 0] + jac_s[:, 1]) * sw[:, None]
        j2v = (jac_s[:, 2] + jac_s[:, 3]) * sw[:, None]
        rs_w = rs * sw
        w1, w2 = w_interp
        bands_i, gi = _imu_banded_normal_eqs(jac_i, idx_i, ri, s_cap)

        # H and g in true f32 (a bf16 Gram destabilizes weak-mode curvature —
        # MEASUREMENTS.md round 2), assembled block-sparse: the dense
        # J^T J Gram burned ~24x redundant FLOPs on structural zeros. Both
        # factor families' banded parts merge into ONE fused placement.
        bands_s, d, gs = _surfel_normal_eqs(
            j1v, j2v, rs_w, sfac, w1, w2, s_cap, nb)
        for delta, blk in bands_s.items():
            _add_band(bands_i, delta, blk)
        # (d + d.T) first: the banded part is exactly symmetric (symmetric
        # per-factor payloads), and a + a^T is exactly symmetric elementwise,
        # so this order makes H bit-exactly symmetric — which lets the PCG
        # matvec consume H^T (a free layout bitcast) instead of paying a
        # 5.3 MB transpose copy per LM iteration to feed the Pallas kernel
        h = _place_block_bands(bands_i, s_cap, dtype) + (d + d.T)
        g = gs + gi

        # gauge/padding masking -> identity rows/cols, zero gradient
        fm = free.astype(dtype)
        h = h * fm[:, None] * fm[None, :] + jnp.diag(1.0 - fm)
        g = g * fm
        # undamped diagonal 12x12 blocks, extracted once per re-linearization
        # (the damped preconditioner inverse is rebuilt per LM iteration from
        # these — tiny VPU work — instead of re-reading H each iteration).
        # Only the fused-PCG path consumes them; the portable paths extract
        # their own damped blocks and must not pay the O(N^2) reduce here.
        # vary(): the empty placeholder is a literal; as a lax.cond output it
        # must match the varying carry under shard_map check_vma (vma.py)
        db = (pcg_pallas.extract_diag_blocks(h, s_cap) if use_fused_pcg
              else vary(jnp.zeros((0,), dtype)))
        return h, g, db

    def lm_step(state):
        # LM with Nielsen's gain-ratio schedule (Madsen/Nielsen/Tingleff):
        # (H, g) belong to the current accepted point; rejected steps only
        # regrow lambda and re-solve — no re-linearization
        cor_flat, lam, nu, cost, h, g, db, k, done = state
        d = jnp.clip(jnp.diag(h), 1e-6, 1e32)
        if use_fused_pcg:
            # single Pallas kernel: H + preconditioner stay VMEM-resident for
            # all iterations (ops/pcg_pallas.py); damping folded into the
            # matvec. H is bit-exactly symmetric (build_normal_eqs), so the
            # kernel gets H^T — with H carried column-major that transpose is
            # a layout bitcast, not a copy
            dlam = lam * d
            minv = pcg_pallas.block_diag_inverse(h, dlam, s_cap, diag_blocks=db)
            delta = pcg_pallas.pcg_solve_fused(jnp.swapaxes(h, 0, 1), dlam, minv, -g,
                                               iters=pcg_iters, tol=pcg_tol)
        elif linear_solver in ("pcg", "pcg_xla"):
            h_damped = h + lam * jnp.diag(d)
            delta = _pcg_solve(h_damped, -g, s_cap, pcg_iters, pcg_tol)
        else:
            h_damped = h + lam * jnp.diag(d)
            delta = -jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(h_damped), g)
        delta = remap_step(delta)
        new_flat = cor_flat + delta
        new_cost = eval_cost(new_flat)
        # gain ratio: actual / predicted decrease of the quadratic model
        pred = 0.5 * (jnp.sum(delta * (lam * d * delta)) - jnp.sum(delta * g))
        rho = (cost - new_cost) / jnp.maximum(pred, jnp.finfo(dtype).tiny)
        accept = (new_cost < cost) & jnp.isfinite(new_cost) & (pred > 0)

        rel_decrease = (cost - new_cost) / jnp.maximum(cost, jnp.finfo(dtype).tiny)
        new_done = accept & (rel_decrease < function_tolerance)

        cor_out = jnp.where(accept, new_flat, cor_flat)
        cost_out = jnp.where(accept, new_cost, cost)
        shrink = jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        lam_out = jnp.where(accept, lam * shrink, lam * nu)
        nu_out = jnp.where(accept, jnp.asarray(2.0, dtype), nu * 2.0)
        lam_out = jnp.clip(lam_out, 1e-12, 1e10)
        # re-linearize only after an accepted, non-final step
        h_out, g_out, db_out = jax.lax.cond(
            accept & ~new_done, build_normal_eqs, lambda _: (h, g, db), cor_out
        )
        return cor_out, lam_out, nu_out, cost_out, h_out, g_out, db_out, k + 1, done | new_done

    def cond(state):
        return (state[7] < max_iterations) & ~state[8]

    cor0 = sample.cor.reshape(-1)
    cost0 = eval_cost(cor0)
    h0, g0, db0 = build_normal_eqs(cor0)
    # vary(): lambda/nu/counter/done are literal inits — axis-varying under
    # shard_map check_vma, identity unsharded (utils/vma.py)
    init = vary(cor0, jnp.asarray(init_lambda, dtype), jnp.asarray(2.0, dtype), cost0,
                h0, g0, db0, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    cor_fin, lam_fin, _, cost_fin, _, _, _, iters, _ = jax.lax.while_loop(cond, lm_step, init)

    out = sample.replace(cor=cor_fin.reshape(s_cap, 12))
    return out, SolveStats(iterations=iters, initial_cost=cost0, final_cost=cost_fin,
                           lambda_final=lam_fin)


def residual_snapshot(sample, sfac, ifac, weights, dt, grav):
    """Raw residual vectors for diagnostics — the on-demand analog of the
    reference's pre/post-solve histogram reports (PrintSurfelResiduals /
    PrintImuResiduals, lidar_odometry.cc:56-100,547-549,568-571). Returns
    (surfel_residuals (M,), imu_residuals (Mi, 12), valid masks)."""
    rs, _, _ = fmod.surfel_residuals(sfac, sample.cor, with_jac=False)
    ri, _, _ = fmod.imu_residuals(ifac, sample.cor, weights, dt, grav, with_jac=False)
    return rs, sfac.valid, ri, ifac.valid
