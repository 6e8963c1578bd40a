"""Fused Pallas PCG kernel vs the portable XLA while-loop implementation.

The kernel (ops/pcg_pallas.py) must reproduce solver._pcg_solve on the same
damped system; run here in Pallas interpret mode (tests pin the CPU platform).
"""

import numpy as np
import jax
import jax.numpy as jnp

from wildcat_slam_tpu.odometry.solver import _pcg_solve
from wildcat_slam_tpu.ops import pcg_pallas


def _random_system(s_cap, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    n = s_cap * 12
    a = rng.normal(size=(n, n + 24))
    h = (a @ a.T / n).astype(np.float32)  # SPD, moderately conditioned
    g = rng.normal(size=(n,)).astype(np.float32)
    return jnp.asarray(h, dtype), jnp.asarray(g, dtype)


class TestFusedPcg:
    def test_matches_xla_pcg(self):
        s_cap = 8
        h, g = _random_system(s_cap)
        lam = jnp.asarray(1e-3, jnp.float32)
        d = jnp.clip(jnp.diag(h), 1e-6, 1e32)
        dlam = lam * d
        h_damped = h + jnp.diag(dlam)
        ref = _pcg_solve(h_damped, g, s_cap, iters=24, tol=1e-6)
        minv = pcg_pallas.block_diag_inverse(h, dlam, s_cap)
        got = pcg_pallas.pcg_solve_fused(h, dlam, minv, g, iters=24, tol=1e-6,
                                         interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_solves_the_system(self):
        s_cap = 4
        h, g = _random_system(s_cap, seed=3)
        dlam = 1e-2 * jnp.clip(jnp.diag(h), 1e-6, 1e32)
        minv = pcg_pallas.block_diag_inverse(h, dlam, s_cap)
        x = pcg_pallas.pcg_solve_fused(h, dlam, minv, g, iters=200, tol=1e-7,
                                       interpret=True)
        lhs = (h + jnp.diag(dlam)) @ x
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(g), rtol=1e-3, atol=1e-3)

    def test_early_exit_on_converged(self):
        # b = 0 -> x = 0 immediately regardless of iteration budget
        s_cap = 4
        h, _ = _random_system(s_cap, seed=5)
        dlam = 1e-3 * jnp.clip(jnp.diag(h), 1e-6, 1e32)
        minv = pcg_pallas.block_diag_inverse(h, dlam, s_cap)
        x = pcg_pallas.pcg_solve_fused(h, dlam, minv,
                                       jnp.zeros(s_cap * 12, jnp.float32),
                                       iters=24, tol=1e-6, interpret=True)
        np.testing.assert_array_equal(np.asarray(x), 0.0)


class TestVmemGate:
    def test_shipped_capacity_fits(self):
        assert pcg_pallas.fits_vmem(96)

    def test_oversized_capacity_falls_back(self):
        # S=256 (N=3072) measured 68.6 MB scoped VMEM on v5e against the 64 MB
        # limit -> TPU compile error without the gate (sample_dt=0.04 configs)
        assert not pcg_pallas.fits_vmem(256)

    def test_gate_is_monotone(self):
        fits = [pcg_pallas.fits_vmem(s) for s in range(8, 512, 8)]
        assert fits[0] and not fits[-1]
        # once it stops fitting it never fits again
        first_no = fits.index(False)
        assert not any(fits[first_no:])
