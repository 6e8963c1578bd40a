"""LM solver tests on synthetic problems (BASELINE.json config 3 regime:
IMU-only optimization over sample-state corrections)."""

import numpy as np
import jax.numpy as jnp

from wildcat_slam_tpu.config import WildcatConfig
from wildcat_slam_tpu.odometry import factors as fmod
from wildcat_slam_tpu.odometry import imu as imu_mod
from wildcat_slam_tpu.odometry.solver import solve_window
from wildcat_slam_tpu.odometry.states import ImuStates, SampleStates, Surfels


def _consistent_problem(bias_gyr=np.zeros(3), n=161, dt=0.005, seed=0):
    """States propagated from measurements that carry a constant gyro bias.
    With zero assumed bias the propagation is 'wrong'; the factors can explain
    the data by estimating bg ~ bias_gyr."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) * dt
    gyr_true = np.cumsum(rng.normal(size=(n, 3)) * 0.01, axis=0) + np.array([0.1, -0.2, 0.3])
    acc_body = rng.normal(size=(n, 3)) * 0.5
    grav = np.array([0.0, 0.0, -9.81])
    gyr_meas = gyr_true + bias_gyr

    imu = ImuStates.empty(256, dtype=jnp.float64)
    imu = imu_mod.init_from_first_two(imu, jnp.asarray(t[:2]), jnp.asarray(acc_body[:2]), jnp.asarray(gyr_meas[:2]), dt)
    imu = imu_mod.propagate(
        imu, jnp.asarray(t[2:]), jnp.asarray(acc_body[2:]), jnp.asarray(gyr_meas[2:]),
        jnp.asarray(n - 2, jnp.int32), jnp.zeros(3), jnp.zeros(3), jnp.asarray(grav), dt,
    )

    n_samples = 11  # every 16 ticks = 0.08 s
    ss = SampleStates.empty(16, dtype=jnp.float64)
    ss = ss.replace(
        t=ss.t.at[:n_samples].set(jnp.asarray(t[::16][:n_samples])),
        count=jnp.asarray(n_samples, jnp.int32),
        grav=jnp.asarray(grav),
    )
    return imu, ss, t


def _empty_surfel_factors(ss):
    s = Surfels.empty(4, dtype=jnp.float64)
    iq = jnp.zeros(4, jnp.int32)
    return fmod.build_surfel_factors(s, s, iq, iq, jnp.zeros(4, bool), ss, 0.05 / 6, True)


class TestImuOnlySolve:
    def test_consistent_data_stays_put(self):
        imu, ss, _ = _consistent_problem()
        sfac = _empty_surfel_factors(ss)
        ifac = fmod.build_imu_factors(imu, ss, max_factors=256)
        cfg = WildcatConfig()
        w = (cfg.weight_gyr, cfg.weight_acc, cfg.weight_bg, cfg.weight_ba)
        out, stats = solve_window(
            ss, sfac, ifac, w, cfg.imu_dt, ss.grav, jnp.asarray(True), max_iterations=30,
        )
        assert float(stats.initial_cost) < 1e-10
        assert float(stats.final_cost) <= float(stats.initial_cost)
        np.testing.assert_allclose(np.asarray(out.cor[:11]), 0.0, atol=1e-8)

    def test_gyro_bias_recovery(self):
        # States propagated from biased measurements are self-consistent (zero
        # residual — the recurrence and the factor share the same model), so for
        # observability we anchor the states at ground truth (propagated from
        # unbiased gyr) and hand the factors the *biased* measurements: then
        # r_gyr = w (bias - bg) and the solver must put the bias into bg rather
        # than into rotation corrections (which would also perturb r_acc).
        bias = np.array([0.004, -0.003, 0.002])
        imu, ss, _ = _consistent_problem(bias_gyr=np.zeros(3))
        gyr_biased = imu.gyr + jnp.asarray(bias)
        imu = imu.replace(gyr=gyr_biased)
        sfac = _empty_surfel_factors(ss)
        ifac = fmod.build_imu_factors(imu, ss, max_factors=256)
        cfg = WildcatConfig()
        w = (cfg.weight_gyr, cfg.weight_acc, cfg.weight_bg, cfg.weight_ba)
        out, stats = solve_window(
            ss, sfac, ifac, w, cfg.imu_dt, ss.grav, jnp.asarray(True), max_iterations=60,
        )
        assert float(stats.final_cost) < float(stats.initial_cost) * 1e-2, (
            float(stats.initial_cost), float(stats.final_cost), int(stats.iterations))
        bg_est = np.asarray(out.cor[:11, 6:9]).mean(axis=0)
        np.testing.assert_allclose(bg_est, bias, atol=1e-3)

    def test_fix_first_pos_respected(self):
        bias = np.array([0.004, -0.003, 0.002])
        imu, ss, _ = _consistent_problem(bias_gyr=bias)
        sfac = _empty_surfel_factors(ss)
        ifac = fmod.build_imu_factors(imu, ss, max_factors=256)
        cfg = WildcatConfig()
        w = (cfg.weight_gyr, cfg.weight_acc, cfg.weight_bg, cfg.weight_ba)
        out, _ = solve_window(ss, sfac, ifac, w, cfg.imu_dt, ss.grav, jnp.asarray(True), max_iterations=20)
        np.testing.assert_allclose(np.asarray(out.cor[0, 3:6]), 0.0, atol=1e-12)

    def test_padding_untouched(self):
        imu, ss, _ = _consistent_problem(bias_gyr=np.array([0.01, 0, 0]))
        sfac = _empty_surfel_factors(ss)
        ifac = fmod.build_imu_factors(imu, ss, max_factors=256)
        cfg = WildcatConfig()
        w = (cfg.weight_gyr, cfg.weight_acc, cfg.weight_bg, cfg.weight_ba)
        out, _ = solve_window(ss, sfac, ifac, w, cfg.imu_dt, ss.grav, jnp.asarray(False), max_iterations=10)
        np.testing.assert_allclose(np.asarray(out.cor[11:]), 0.0, atol=0)


class TestSurfelSolve:
    def test_plane_alignment(self):
        """Two surfel clouds of the same planes, second shifted by a small pose
        error; binary factors must pull the corrections toward the true offset."""
        rng = np.random.default_rng(4)
        n_planes = 40
        ss = SampleStates.empty(8, dtype=jnp.float64)
        ss = ss.replace(
            t=ss.t.at[:4].set(jnp.asarray([0.0, 0.08, 0.16, 0.24])),
            count=jnp.asarray(4, jnp.int32),
            grav=jnp.asarray([0.0, 0.0, -9.81]),
        )

        offset = np.array([0.05, -0.03, 0.02])
        cap = 128
        s1 = Surfels.empty(cap, dtype=jnp.float64)
        s2 = Surfels.empty(cap, dtype=jnp.float64)
        centers = rng.uniform(-3, 3, (n_planes, 3))
        norms = rng.normal(size=(n_planes, 3))
        norms /= np.linalg.norm(norms, axis=1, keepdims=True)
        cov = np.zeros((n_planes, 3, 3))
        for i in range(n_planes):
            u = np.cross(norms[i], [1, 0.1, 0.2]); u /= np.linalg.norm(u)
            v = np.cross(norms[i], u)
            cov[i] = 0.02 * (np.outer(u, u) + np.outer(v, v)) + 1e-6 * np.outer(norms[i], norms[i])

        def fill(s, t_val, shift):
            return s.replace(
                t=s.t.at[:n_planes].set(t_val),
                center=s.center.at[:n_planes].set(jnp.asarray(centers + shift)),
                cov=s.cov.at[:n_planes].set(jnp.asarray(cov)),
                norm=s.norm.at[:n_planes].set(jnp.asarray(norms)),
                valid=s.valid.at[:n_planes].set(True),
            )

        s1 = fill(s1, 0.04, np.zeros(3))   # rot=identity, pos=0: centers in body == world
        s2 = fill(s2, 0.20, offset)        # second observation displaced by pose error

        iq = jnp.arange(cap, dtype=jnp.int32) % n_planes
        it = iq
        pv = jnp.arange(cap) < n_planes
        sfac = fmod.build_surfel_factors(s1, s2, iq, it, pv, ss, 0.05 / 6, True)

        imu = ImuStates.empty(8, dtype=jnp.float64)
        ifac = fmod.build_imu_factors(imu.replace(count=jnp.asarray(0, jnp.int32)), ss, max_factors=8)

        out, stats = solve_window(
            ss, sfac, ifac, (1.0, 1.0, 1.0, 1.0), 0.005, ss.grav, jnp.asarray(False), max_iterations=50,
        )
        assert float(stats.final_cost) < float(stats.initial_cost) * 1e-3
        # the solve shifts s2's bracket states so that s2's centers move by
        # -offset along each normal; the component of (cor pos) along normals
        # must account for the offset (full recovery is not identifiable from
        # plane-to-plane distances alone, but the cost must vanish)
        r, _, _ = fmod.surfel_residuals(sfac, out.cor)
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-4)
