"""On-device sliding-window solver: Levenberg-Marquardt with Cauchy IRLS.

Replaces the reference's Ceres solve (lidar_odometry.cc:540-562: SPARSE_NORMAL_
CHOLESKY, <=100 iterations, CauchyLoss(0.4) on surfel factors, TrivialLoss on IMU
factors, first-ever sample state's position frozen via SubsetParameterization).

TPU-first design: instead of Ceres's sparse CHOLMOD path, each factor's Jacobian
blocks are scattered into dense per-factor rows over the (S x 12) parameter
vector and the normal equations H = J^T J, g = J^T r are two dense matmuls on
the MXU — at S ~ 80 the full H is only (960, 960), far below the crossover where
sparsity wins. Robustification is IRLS: rows are scaled by sqrt(rho'(r^2)) with
rho the Cauchy loss (the first-order Triggs correction; Ceres additionally
applies a rank-1 curvature correction which vanishes as residuals shrink).
Gauge handling masks frozen parameters to identity rows/cols.

The LM loop is a ``lax.while_loop``: accept/reject on true robust cost, lambda
up/down, early exit on relative function decrease < function_tolerance.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from wildcat_slam_tpu.odometry import factors as fmod
from wildcat_slam_tpu.odometry.states import SampleStates


def _scatter_surfel_rows(jac, idx, s_cap):
    """(M, 4, 12) blocks at (M, 4) sample indices -> dense rows (M, S*12)."""
    m = jac.shape[0]
    rows = jnp.zeros((m, s_cap, 12), jac.dtype)
    rows = rows.at[jnp.arange(m)[:, None], idx].add(jac)
    return rows.reshape(m, s_cap * 12)


def _scatter_imu_rows(jac, idx, s_cap):
    """(Mi, 6, 12, 12) blocks at (Mi, 6) indices -> dense rows (Mi*12, S*12)."""
    mi = jac.shape[0]
    blocks = jnp.zeros((mi, s_cap, 12, 12), jac.dtype)
    blocks = blocks.at[jnp.arange(mi)[:, None], idx].add(jac)
    rows = jnp.transpose(blocks, (0, 2, 1, 3)).reshape(mi * 12, s_cap * 12)
    return rows


class SolveStats(NamedTuple):
    iterations: jnp.ndarray
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray


@partial(jax.jit, static_argnames=("max_iterations", "dt"))
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
    lambda_up: float = 4.0,
    lambda_down: float = 2.0,
    function_tolerance: float = 1e-6,
):
    """Optimize the correction state of the sliding window in place.

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

    def eval_cost(cor_flat):
        # residual-only fast path: no Jacobians on the candidate evaluation
        cor = cor_flat.reshape(s_cap, 12)
        rs, _, _ = fmod.surfel_residuals(sfac, cor, with_jac=False)
        ri, _, _ = fmod.imu_residuals(ifac, cor, weights, dt, grav, with_jac=False)
        robust = a2 * jnp.log1p(rs * rs / a2)
        return 0.5 * (jnp.sum(robust) + jnp.sum(ri * ri))

    def build_normal_eqs(cor_flat):
        cor = cor_flat.reshape(s_cap, 12)
        rs, jac_s, idx_s = fmod.surfel_residuals(sfac, cor)
        ri, jac_i, idx_i = fmod.imu_residuals(ifac, cor, weights, dt, grav)

        # Cauchy IRLS scaling: sqrt(rho'(s)), rho'(s) = 1/(1 + s/a^2)
        sw = 1.0 / jnp.sqrt(1.0 + rs * rs / a2)
        js = _scatter_surfel_rows(jac_s, idx_s, s_cap) * sw[:, None]
        rs_w = rs * sw
        ji = _scatter_imu_rows(jac_i, idx_i, s_cap)
        ri_flat = ri.reshape(-1)

        h = js.T @ js + ji.T @ ji
        g = js.T @ rs_w + ji.T @ ri_flat

        # gauge/padding masking -> identity rows/cols, zero gradient
        fm = free.astype(dtype)
        h = h * fm[:, None] * fm[None, :] + jnp.diag(1.0 - fm)
        g = g * fm
        return h, g

    def lm_step(state):
        # classic LM bookkeeping: (H, g) belong to the current accepted point;
        # rejected steps only regrow lambda and re-solve — no re-linearization
        cor_flat, lam, cost, h, g, k, done = state
        d = jnp.clip(jnp.diag(h), 1e-6, 1e32)
        h_damped = h + lam * jnp.diag(d)
        delta = -jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(h_damped), g)
        new_flat = cor_flat + delta
        new_cost = eval_cost(new_flat)
        accept = (new_cost < cost) & jnp.isfinite(new_cost)

        rel_decrease = (cost - new_cost) / jnp.maximum(cost, jnp.finfo(dtype).tiny)
        new_done = accept & (rel_decrease < function_tolerance)

        cor_out = jnp.where(accept, new_flat, cor_flat)
        cost_out = jnp.where(accept, new_cost, cost)
        lam_out = jnp.where(accept, lam / lambda_down, lam * lambda_up)
        lam_out = jnp.clip(lam_out, 1e-12, 1e10)
        # re-linearize only after an accepted, non-final step
        h_out, g_out = jax.lax.cond(
            accept & ~new_done, build_normal_eqs, lambda _: (h, g), cor_out
        )
        return cor_out, lam_out, cost_out, h_out, g_out, k + 1, done | new_done

    def cond(state):
        return (state[5] < max_iterations) & ~state[6]

    cor0 = sample.cor.reshape(-1)
    cost0 = eval_cost(cor0)
    h0, g0 = build_normal_eqs(cor0)
    init = (cor0, jnp.asarray(init_lambda, dtype), cost0, h0, g0,
            jnp.asarray(0, jnp.int32), jnp.asarray(False))
    cor_fin, _, cost_fin, _, _, iters, _ = jax.lax.while_loop(cond, lm_step, init)

    out = sample.replace(cor=cor_fin.reshape(s_cap, 12))
    return out, SolveStats(iterations=iters, initial_cost=cost0, final_cost=cost_fin)
