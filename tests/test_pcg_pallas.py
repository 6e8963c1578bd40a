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


class TestUnderShardMap:
    """Round-4 regression: parallel.mesh runs shard_map with check_vma=True,
    and a pallas_call kernel jaxpr is traced OUTSIDE the manual-axes context —
    ref-loads of sharded operands come back varying while in-kernel op results
    are invariant, so the kernel is rejected at trace time. This broke the
    real-TPU batched path silently (CPU tests never trace the TPU-gated
    kernel). The fix gates the fused kernels off when operands are varying
    (utils/vma.py is_varying); these tests pin the gate AND the underlying
    JAX limitation, so if a JAX upgrade lifts it we notice and can re-enable
    the kernels under shard_map."""

    def _sharded_args(self, s_cap, n_dev):
        h, g = _random_system(s_cap)
        lam = jnp.asarray(1e-3, jnp.float32)
        dlam = lam * jnp.clip(jnp.diag(h), 1e-6, 1e32)
        minv = pcg_pallas.block_diag_inverse(h, dlam, s_cap)
        return tuple(jnp.stack([x] * n_dev) for x in (h, dlam, minv, g))

    def test_is_varying_detects_shard_map_operands(self):
        from functools import partial

        from jax.sharding import Mesh, PartitionSpec as P

        from wildcat_slam_tpu.utils.vma import is_varying

        n_dev = min(2, jax.device_count())
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("w",))
        seen = {}

        @partial(jax.shard_map, mesh=mesh, in_specs=P("w"), out_specs=P("w"),
                 check_vma=True)
        def f(xb):
            seen["inside"] = is_varying(xb)
            return xb * 2.0

        x = jnp.ones((n_dev, 8), jnp.float32)
        seen["outside"] = is_varying(x)
        jax.jit(f)(x)
        assert seen["inside"] is True
        assert seen["outside"] is False

    def test_pallas_under_check_vma_still_unsupported(self):
        # The reason for the gate. JAX 0.9 rejects the kernel trace with a
        # carry/op vma mismatch (its own error suggests check_vma=False as
        # the workaround). If this test FAILS, JAX learned to trace pallas
        # under check_vma: delete the is_varying gates in solver.py/match.py
        # and re-measure the batched path with the fused kernels on.
        import pytest

        from functools import partial

        from jax.sharding import Mesh, PartitionSpec as P

        s_cap = 4
        n_dev = min(2, jax.device_count())
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("w",))
        hb, dlamb, minvb, gb = self._sharded_args(s_cap, n_dev)

        @partial(jax.shard_map, mesh=mesh, in_specs=P("w"), out_specs=P("w"),
                 check_vma=True)
        def solve(hb, dlamb, minvb, gb):
            x = pcg_pallas.pcg_solve_fused(
                hb[0], dlamb[0], minvb[0], gb[0], iters=24, tol=1e-6,
                interpret=True)
            return x[None]

        with pytest.raises(Exception, match="varying manual axes|check_vma"):
            jax.jit(solve)(hb, dlamb, minvb, gb)

    def test_xla_pcg_traces_under_check_vma(self):
        # the fallback the gate selects must actually work sharded
        from functools import partial

        from jax.sharding import Mesh, PartitionSpec as P

        s_cap = 4
        n_dev = min(2, jax.device_count())
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("w",))
        hb, dlamb, minvb, gb = self._sharded_args(s_cap, n_dev)

        @partial(jax.shard_map, mesh=mesh, in_specs=P("w"), out_specs=P("w"),
                 check_vma=True)
        def solve(hb, dlamb, minvb, gb):
            hd = hb[0] + jnp.diag(dlamb[0])
            return _pcg_solve(hd, gb[0], s_cap, iters=96, tol=1e-7)[None]

        got = jax.jit(solve)(hb, dlamb, minvb, gb)
        # sharded and unsharded programs fuse differently and CG amplifies
        # the f32 noise, so assert solution QUALITY, not bitwise closeness
        hd = np.asarray(hb[0], np.float64) + np.diag(np.asarray(dlamb[0], np.float64))
        g = np.asarray(gb[0], np.float64)
        for i in range(n_dev):
            res = np.linalg.norm(hd @ np.asarray(got[i], np.float64) - g)
            assert res <= 1e-3 * np.linalg.norm(g), f"shard {i} residual {res}"
