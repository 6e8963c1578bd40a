"""Factor residual/Jacobian verification.

The reference has NO Jacobian tests (SURVEY.md §4); here every analytic block is
checked against jax autodiff of the residual function itself.
"""

import numpy as np
import jax
import jax.numpy as jnp

from wildcat_slam_tpu.odometry import factors as fmod
from wildcat_slam_tpu.odometry.states import ImuStates, SampleStates, Surfels
from wildcat_slam_tpu.ops import lie


def _rand_sample_states(s_cap=12, n=10, dt=0.08, seed=0):
    rng = np.random.default_rng(seed)
    ss = SampleStates.empty(s_cap, dtype=jnp.float64)
    t = np.arange(s_cap) * dt
    ss = ss.replace(
        t=jnp.asarray(t),
        rot=lie.exp_quat(jnp.asarray(rng.normal(size=(s_cap, 3)) * 0.3)),
        pos=jnp.asarray(rng.normal(size=(s_cap, 3))),
        cor=jnp.asarray(rng.normal(size=(s_cap, 12)) * 0.05),
        count=jnp.asarray(n, jnp.int32),
        grav=jnp.asarray([0.0, 0.0, -9.81]),
    )
    return ss


def _rand_surfels(cap, n, t_range, seed):
    rng = np.random.default_rng(seed)
    s = Surfels.empty(cap, dtype=jnp.float64)
    cov = rng.normal(size=(cap, 3, 3)) * 0.05
    cov = cov @ cov.transpose(0, 2, 1) + np.eye(3) * 1e-4
    return s.replace(
        t=jnp.asarray(rng.uniform(*t_range, cap)),
        center=jnp.asarray(rng.normal(size=(cap, 3))),
        cov=jnp.asarray(cov),
        norm=jnp.asarray(rng.normal(size=(cap, 3))),
        rot=lie.exp_quat(jnp.asarray(rng.normal(size=(cap, 3)) * 0.2)),
        pos=jnp.asarray(rng.normal(size=(cap, 3))),
        resolution=jnp.full((cap,), 0.4),
        std=jnp.full((cap,), 0.01),
        valid=jnp.ones((cap,), bool).at[n:].set(False),
    )


def _dense_jac(jac, idx, s_cap):
    """Scatter per-factor blocks to dense (M, S, 12) for comparison."""
    m = jac.shape[0]
    out = np.zeros((m, s_cap, 12))
    for i in range(m):
        for k in range(idx.shape[1]):
            out[i, idx[i, k]] += np.asarray(jac[i, k])
    return out


class TestSurfelFactor:
    def _build(self, target_optimized, seed=1):
        ss = _rand_sample_states()
        sq = _rand_surfels(16, 12, (0.01, 0.7), seed)
        st = _rand_surfels(16, 12, (0.01, 0.7), seed + 100)
        iq = jnp.arange(16, dtype=jnp.int32) % 12
        it = (jnp.arange(16, dtype=jnp.int32) * 7 + 3) % 12
        pv = jnp.ones((16,), bool)
        fac = fmod.build_surfel_factors(sq, st, iq, it, pv, ss, 0.05 / 6, target_optimized)
        return ss, fac

    def test_binary_jacobian_matches_autodiff(self):
        ss, fac = self._build(True)
        r, jac, idx = fmod.surfel_residuals(fac, ss.cor)
        auto = jax.jacrev(lambda c: fmod.surfel_residuals(fac, c)[0])(ss.cor)
        dense = _dense_jac(jac, np.asarray(idx), ss.capacity)
        np.testing.assert_allclose(dense, np.asarray(auto), atol=1e-9)

    def test_unary_jacobian_matches_autodiff(self):
        ss, fac = self._build(False)
        r, jac, idx = fmod.surfel_residuals(fac, ss.cor)
        auto = jax.jacrev(lambda c: fmod.surfel_residuals(fac, c)[0])(ss.cor)
        dense = _dense_jac(jac, np.asarray(idx), ss.capacity)
        np.testing.assert_allclose(dense, np.asarray(auto), atol=1e-9)
        # unary factors must not touch the (fixed) s1 bracket: rows depend only on
        # the s2 side, checked implicitly by the autodiff match

    def test_residual_value_binary(self):
        # zero corrections: r = w n . (c1w - c2w)
        ss, fac = self._build(True)
        cor0 = jnp.zeros_like(ss.cor)
        r, _, _ = fmod.surfel_residuals(fac, cor0)
        t1 = np.asarray(fac.v1 + fac.p1)
        t2 = np.asarray(fac.v2 + fac.p2)
        expect = np.asarray(fac.w) * np.einsum("mi,mi->m", np.asarray(fac.n), t1 - t2)
        np.testing.assert_allclose(np.asarray(r), np.where(np.asarray(fac.valid), expect, 0.0), atol=1e-12)

    def test_time_ordering(self):
        ss, fac = self._build(True)
        t1 = np.asarray(ss.t)  # not used; check factor invariant via brackets
        # s1 bracket left time <= s2 bracket left time for valid factors
        l1 = np.asarray(ss.t)[np.asarray(fac.i1l)]
        l2 = np.asarray(ss.t)[np.asarray(fac.i2l)]
        v = np.asarray(fac.valid)
        assert np.all(l1[v] <= l2[v] + 1e-12)


class TestImuFactor:
    def _build(self, seed=2):
        rng = np.random.default_rng(seed)
        ss = _rand_sample_states(s_cap=8, n=6, dt=0.08)
        n_imu = 24
        imu = ImuStates.empty(32, dtype=jnp.float64)
        imu = imu.replace(
            t=imu.t.at[:n_imu].set(jnp.arange(n_imu) * 0.02),
            rot=imu.rot.at[:n_imu].set(lie.exp_quat(jnp.asarray(rng.normal(size=(n_imu, 3)) * 0.2))),
            pos=imu.pos.at[:n_imu].set(jnp.asarray(rng.normal(size=(n_imu, 3)))),
            acc=imu.acc.at[:n_imu].set(jnp.asarray(rng.normal(size=(n_imu, 3)))),
            gyr=imu.gyr.at[:n_imu].set(jnp.asarray(rng.normal(size=(n_imu, 3)))),
            count=jnp.asarray(n_imu, jnp.int32),
        )
        fac = fmod.build_imu_factors(imu, ss, max_factors=32)
        return ss, imu, fac

    def test_jacobian_matches_autodiff(self):
        ss, imu, fac = self._build()
        weights = (2.0, 3.0, 5.0, 7.0)
        grav = jnp.asarray([0.0, 0.0, -9.81])
        r, jac, idx = fmod.imu_residuals(fac, ss.cor, weights, 0.02, grav)
        auto = jax.jacrev(lambda c: fmod.imu_residuals(fac, c, weights, 0.02, grav)[0])(ss.cor)
        # auto: (Mi, 12, S, 12); dense scatter of jac: (Mi, 6, 12, 12) at idx
        mi = jac.shape[0]
        dense = np.zeros((mi, 12, ss.capacity, 12))
        for i in range(mi):
            for k in range(6):
                dense[i, :, np.asarray(idx)[i, k], :] += np.asarray(jac)[i, k]
        np.testing.assert_allclose(dense, np.asarray(auto), atol=1e-9)

    def test_factor_count_and_window(self):
        ss, imu, fac = self._build()
        # i3 <= sample back (0.4), i1 >= front (0): triplets i=0..n with t[i+2] <= 0.4
        n_valid = int(np.asarray(fac.valid).sum())
        t = np.asarray(imu.t[:24])
        back = float(np.asarray(ss.t[5]))
        expect = sum(1 for i in range(22) if t[i] >= 0.0 and t[i + 2] <= back)
        assert n_valid == expect

    def test_zero_residual_for_consistent_states(self):
        # states generated exactly by the recurrence with zero bias and gravity
        # removed -> residual zero at cor=0
        from wildcat_slam_tpu.odometry import imu as imu_mod

        rng = np.random.default_rng(5)
        n, dt = 24, 0.02
        t = np.arange(n) * dt
        gyr = rng.normal(size=(n, 3)) * 0.3
        acc_body = np.zeros((n, 3))
        grav = np.array([0.0, 0.0, -9.81])

        imu = ImuStates.empty(32, dtype=jnp.float64)
        imu = imu_mod.init_from_first_two(imu, jnp.asarray(t[:2]), jnp.asarray(acc_body[:2]), jnp.asarray(gyr[:2]), dt)
        imu = imu_mod.propagate(
            imu, jnp.asarray(t[2:]), jnp.asarray(acc_body[2:]), jnp.asarray(gyr[2:]),
            jnp.asarray(n - 2, jnp.int32), jnp.zeros(3), jnp.zeros(3), jnp.asarray(grav), dt,
        )
        ss = SampleStates.empty(8, dtype=jnp.float64)
        ss = ss.replace(t=jnp.arange(8) * 0.08, count=jnp.asarray(6, jnp.int32), grav=jnp.asarray(grav))
        fac = fmod.build_imu_factors(imu, ss, max_factors=32)
        weights = (1.0, 1.0, 1.0, 1.0)
        r, _, _ = fmod.imu_residuals(fac, ss.cor, weights, dt, -jnp.asarray(grav))
        # gyro residual: measurements ARE the midpoint average by construction;
        # acc residual: acc_world - acc_est + (-grav)... propagate uses +grav so
        # residual gravity must cancel: r_acc = R1 a1 - ((p3+p1-2p2)/dt^2) + g_res
        # with p-recurrence = (R1 a1 + grav) dt^2 => r_acc = -grav + g_res
        # choosing g_res = +grav makes it zero; we passed -grav, so check gyro only
        r = np.asarray(r)[np.asarray(fac.valid)]
        np.testing.assert_allclose(r[:, 0:3], 0.0, atol=1e-9)
        np.testing.assert_allclose(r[:, 6:12], 0.0, atol=1e-12)

    def test_zero_acc_residual_with_gravity(self):
        from wildcat_slam_tpu.odometry import imu as imu_mod

        rng = np.random.default_rng(6)
        n, dt = 24, 0.02
        t = np.arange(n) * dt
        gyr = rng.normal(size=(n, 3)) * 0.3
        acc_body = rng.normal(size=(n, 3))
        grav = np.array([0.0, 0.0, -9.81])

        imu = ImuStates.empty(32, dtype=jnp.float64)
        imu = imu_mod.init_from_first_two(imu, jnp.asarray(t[:2]), jnp.asarray(acc_body[:2]), jnp.asarray(gyr[:2]), dt)
        imu = imu_mod.propagate(
            imu, jnp.asarray(t[2:]), jnp.asarray(acc_body[2:]), jnp.asarray(gyr[2:]),
            jnp.asarray(n - 2, jnp.int32), jnp.zeros(3), jnp.zeros(3), jnp.asarray(grav), dt,
        )
        ss = SampleStates.empty(8, dtype=jnp.float64)
        ss = ss.replace(t=jnp.arange(8) * 0.08, count=jnp.asarray(6, jnp.int32))
        fac = fmod.build_imu_factors(imu, ss, max_factors=32)
        r, _, _ = fmod.imu_residuals(fac, ss.cor, (1.0, 1.0, 1.0, 1.0), dt, jnp.asarray(grav))
        # residual acc_est includes the gravity the propagation injected; passing
        # grav as the factor's gravity reproduces the reference's cancellation
        # (acc_world - acc_est + grav = 0 when states follow the recurrence)
        r = np.asarray(r)[np.asarray(fac.valid)]
        np.testing.assert_allclose(r[:, 3:6], 0.0, atol=1e-9)


class TestSampleBracket:
    def test_matches_searchsorted_including_exact_ticks(self):
        # the O(1) uniform-grid bracket must reproduce std::upper_bound exactly,
        # including queries landing exactly on sample ticks (every 16th IMU
        # state time coincides with a tick) and f32 grids
        for dtype in (jnp.float32, jnp.float64):
            ss = _rand_sample_states(s_cap=48, n=40)
            ss = ss.replace(t=ss.t.astype(dtype))
            t = np.asarray(ss.t)[:40]
            rng = np.random.default_rng(7)
            q = np.concatenate([
                t,                                   # exact ticks
                t[:-1] + np.diff(t) * rng.uniform(0.01, 0.99, 39),  # interior
                [t[0] - 0.05, t[-1] + 0.05],         # out of range
            ]).astype(np.float64 if dtype == jnp.float64 else np.float32)
            il, ir, f = fmod.sample_bracket(ss, jnp.asarray(q, dtype))
            ref_ir = np.clip(np.searchsorted(t, q, side="right"), 1, 40 - 1)
            np.testing.assert_array_equal(np.asarray(ir), ref_ir)
            np.testing.assert_array_equal(np.asarray(il), ref_ir - 1)
            ref_f = np.clip((q - t[ref_ir - 1]) / (t[ref_ir] - t[ref_ir - 1]), 0, 1)
            np.testing.assert_allclose(np.asarray(f), ref_f, atol=1e-6)
