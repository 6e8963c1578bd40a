"""IMU resampler, propagation, and pose-interpolation tests.

Ports imu_resampler_test.cc and adds integration checks the reference lacks:
the second-difference recurrence must track a known analytic trajectory.
"""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from wildcat_slam_tpu.odometry import imu as imu_mod
from wildcat_slam_tpu.odometry.states import ImuStates
from wildcat_slam_tpu.ops import lie


class TestResampler:
    def test_reference_case(self):
        # imu_resampler_test.cc:7-31 (rate 10, two samples at t=0,1)
        rs = imu_mod.ImuResampler(10)
        acc1, gyr1 = np.array([1.0, 2, 3]), np.array([435.0, 342, 434])
        acc2, gyr2 = np.array([11.0, 234, 453]), np.array([234.0, 46, 32])
        out1 = rs.add(0.0, acc1, gyr1)
        assert len(out1) == 1 and out1[0][0] == 0.0
        out2 = rs.add(1.0, acc2, gyr2)
        # grid targets 0.1 .. 1.0 are all bracketed by (0, 1)
        assert [round(o[0], 10) for o in out2] == [round(0.1 * k, 10) for k in range(1, 11)]
        t, acc, gyr = out2[1]
        np.testing.assert_allclose(acc, 0.8 * acc1 + 0.2 * acc2)
        np.testing.assert_allclose(gyr, 0.8 * gyr1 + 0.2 * gyr2)

    def test_uniform_grid_exact(self):
        rs = imu_mod.ImuResampler(200)
        rng = np.random.default_rng(0)
        t0 = 1234.567
        out = []
        for i in range(400):
            out += rs.add(t0 + i * 0.004 + rng.uniform(-1e-4, 1e-4), rng.normal(3), rng.normal(3))
        ts = np.array([o[0] for o in out])
        np.testing.assert_allclose(np.diff(ts), 1.0 / 200, atol=1e-12)

    def test_constant_signal(self):
        rs = imu_mod.ImuResampler(100)
        for i in range(50):
            out = rs.add(i * 0.007, np.ones(3), 2 * np.ones(3))
            for _, a, g in out:
                np.testing.assert_allclose(a, 1.0)
                np.testing.assert_allclose(g, 2.0)


def _integrate_reference(t, acc, gyr, bg, ba, grav, dt):
    """Numpy mirror of the second-difference recurrence for checking."""
    n = len(t)
    pos = np.zeros((n, 3))
    rot = [np.array([1.0, 0, 0, 0])]
    rot.append(
        np.asarray(lie.exp_quat(jnp.asarray(((gyr[0] + gyr[1]) / 2) * dt, dtype=jnp.float64)))
    )
    rot[1] = np.asarray(lie.quat_mul(jnp.asarray(rot[0]), jnp.asarray(rot[1])))
    for i in range(2, n):
        r = lie.quat_mul(
            jnp.asarray(rot[i - 1]),
            lie.exp_quat(jnp.asarray(((gyr[i - 1] + gyr[i]) / 2 - bg) * dt)),
        )
        rot.append(np.asarray(r))
        a_world = np.asarray(lie.quat_rotate(jnp.asarray(rot[i - 2]), jnp.asarray(acc[i - 2] - ba)))
        pos[i] = (a_world + grav) * dt * dt + 2 * pos[i - 1] - pos[i - 2]
    return pos, np.stack(rot)


class TestPropagation:
    def test_matches_sequential_reference(self):
        rng = np.random.default_rng(1)
        n, dt = 50, 0.005
        t = np.arange(n) * dt
        acc = rng.normal(size=(n, 3))
        gyr = rng.normal(size=(n, 3)) * 0.5
        bg = rng.normal(3) * 0.01
        ba = rng.normal(3) * 0.01
        grav = np.array([0.0, 0, -9.81])

        imu = ImuStates.empty(64, dtype=jnp.float64)
        imu = imu_mod.init_from_first_two(
            imu, jnp.asarray(t[:2]), jnp.asarray(acc[:2]), jnp.asarray(gyr[:2]), dt
        )
        imu = imu_mod.propagate(
            imu,
            jnp.asarray(t[2:]), jnp.asarray(acc[2:]), jnp.asarray(gyr[2:]),
            jnp.asarray(n - 2, jnp.int32),
            jnp.asarray(bg), jnp.asarray(ba), jnp.asarray(grav), dt,
        )
        assert int(imu.count) == n
        ref_pos, ref_rot = _integrate_reference(t, acc, gyr, bg, ba, grav, dt)
        np.testing.assert_allclose(np.asarray(imu.pos[:n]), ref_pos, atol=1e-9)
        for i in range(n):
            d = np.abs(np.dot(np.asarray(imu.rot[i]), ref_rot[i]))
            np.testing.assert_allclose(d, 1.0, atol=1e-10)

    def test_padding_is_inert(self):
        # feeding K slots with count < K must give identical valid prefix
        rng = np.random.default_rng(2)
        n, dt = 20, 0.005
        t = np.arange(n + 8) * dt
        acc = rng.normal(size=(n + 8, 3))
        gyr = rng.normal(size=(n + 8, 3))
        z3 = jnp.zeros(3)
        grav = jnp.asarray([0.0, 0, -9.81])

        def run(k_pad):
            imu = ImuStates.empty(64, dtype=jnp.float64)
            imu = imu_mod.init_from_first_two(
                imu, jnp.asarray(t[:2]), jnp.asarray(acc[:2]), jnp.asarray(gyr[:2]), dt
            )
            return imu_mod.propagate(
                imu,
                jnp.asarray(t[2 : 2 + k_pad]), jnp.asarray(acc[2 : 2 + k_pad]),
                jnp.asarray(gyr[2 : 2 + k_pad]), jnp.asarray(n - 2, jnp.int32),
                z3, z3, grav, dt,
            )

        a = run(n - 2)
        b = run(n + 4)  # extra padded rows beyond new_count
        np.testing.assert_allclose(np.asarray(a.pos[:n]), np.asarray(b.pos[:n]), atol=1e-12)
        assert int(a.count) == int(b.count) == n

    def test_gravity_free_fall(self):
        # zero acc measurements, identity rotation -> pure gravity parabola
        n, dt = 40, 0.01
        t = np.arange(n) * dt
        acc = np.zeros((n, 3))
        gyr = np.zeros((n, 3))
        grav = np.array([0.0, 0, -9.81])
        imu = ImuStates.empty(64, dtype=jnp.float64)
        imu = imu_mod.init_from_first_two(imu, jnp.asarray(t[:2]), jnp.asarray(acc[:2]), jnp.asarray(gyr[:2]), dt)
        imu = imu_mod.propagate(
            imu, jnp.asarray(t[2:]), jnp.asarray(acc[2:]), jnp.asarray(gyr[2:]),
            jnp.asarray(n - 2, jnp.int32), jnp.zeros(3), jnp.zeros(3), jnp.asarray(grav), dt,
        )
        # second difference of pos == grav * dt^2 exactly
        p = np.asarray(imu.pos[:n])
        dd = p[2:] - 2 * p[1:-1] + p[:-2]
        np.testing.assert_allclose(dd, np.broadcast_to(grav * dt * dt, dd.shape), atol=1e-12)


class TestInterpPose:
    def _make_imu(self, n=30, dt=0.01, seed=3):
        rng = np.random.default_rng(seed)
        t = np.arange(n) * dt
        pos = rng.normal(size=(n, 3))
        rotvec = rng.normal(size=(n, 3)) * 0.2
        imu = ImuStates.empty(64, dtype=jnp.float64)
        imu = imu.replace(
            t=imu.t.at[:n].set(jnp.asarray(t)),
            pos=imu.pos.at[:n].set(jnp.asarray(pos)),
            rot=imu.rot.at[:n].set(lie.exp_quat(jnp.asarray(rotvec))),
            count=jnp.asarray(n, jnp.int32),
        )
        return imu, t, pos, rotvec

    def test_lerp_slerp_against_scipy(self):
        from scipy.spatial.transform import Slerp

        imu, t, pos, rotvec = self._make_imu()
        q = np.linspace(t[0] + 1e-6, t[-1] - 1e-6, 57)
        got_pos, got_rot = imu_mod.interp_pose(imu, jnp.asarray(q))
        idx = np.searchsorted(t, q, side="left")
        f = (q - t[idx - 1]) / (t[idx] - t[idx - 1])
        ref_pos = pos[idx - 1] * (1 - f)[:, None] + pos[idx] * f[:, None]
        np.testing.assert_allclose(np.asarray(got_pos), ref_pos, atol=1e-12)
        rots = R.from_rotvec(rotvec)
        for i in range(len(q)):
            s = Slerp([0, 1], R.concatenate([rots[idx[i] - 1], rots[idx[i]]]))
            ref = s([f[i]]).as_quat()[0]
            ref = np.array([ref[3], ref[0], ref[1], ref[2]])
            d = abs(np.dot(np.asarray(got_rot[i]), ref))
            np.testing.assert_allclose(d, 1.0, atol=1e-9)

    def test_exact_knot_query(self):
        imu, t, pos, rotvec = self._make_imu()
        got_pos, got_rot = imu_mod.interp_pose(imu, jnp.asarray(t[:30]))
        np.testing.assert_allclose(np.asarray(got_pos), pos, atol=1e-12)

    def test_undistort_identity(self):
        # identity poses -> points unchanged
        n = 10
        imu = ImuStates.empty(16, dtype=jnp.float64)
        imu = imu.replace(
            t=imu.t.at[:n].set(jnp.arange(n, dtype=jnp.float64) * 0.1),
            count=jnp.asarray(n, jnp.int32),
        )
        pts = jnp.asarray(np.random.default_rng(4).normal(size=(100, 3)))
        pt_t = jnp.asarray(np.random.default_rng(5).uniform(0.05, 0.85, 100))
        out = imu_mod.undistort_points(imu, pt_t, pts)
        np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-12)


class TestSortedUndistortFastPath:
    def _make_imu(self, n=40, dtype=jnp.float64):
        rng = np.random.default_rng(11)
        t = np.arange(n) * 0.005
        pos = np.cumsum(rng.normal(scale=0.01, size=(n, 3)), axis=0)
        rotvec = np.cumsum(rng.normal(scale=0.02, size=(n, 3)), axis=0)
        imu = ImuStates.empty(64, dtype=dtype)
        imu = imu.replace(
            t=imu.t.at[:n].set(jnp.asarray(t)),
            pos=imu.pos.at[:n].set(jnp.asarray(pos)),
            rot=imu.rot.at[:n].set(lie.exp_quat(jnp.asarray(rotvec))),
            count=jnp.asarray(n, jnp.int32),
        )
        return imu, t

    def test_matches_gather_path_with_padding(self):
        # the sorted fast path (tick-side diff scatter + running sum,
        # imu.py:_interp_pose_sorted) must agree with the per-point gather
        # path, including grid-exact stamps and a zero-padded tail
        imu, t = self._make_imu()
        rng = np.random.default_rng(12)
        q = np.sort(rng.uniform(t[1] + 1e-9, t[-1] - 1e-9, 500))
        q[100:110] = t[7]  # exact knot ties
        q = np.sort(q)
        qpad = np.concatenate([q, np.zeros(37)])  # padding tail like a sweep
        pts = rng.normal(size=(len(qpad), 3))
        ref = imu_mod.undistort_points(imu, jnp.asarray(q), jnp.asarray(pts[: len(q)]))
        got = imu_mod.undistort_points(
            imu, jnp.asarray(qpad), jnp.asarray(pts), sorted_t=True)
        np.testing.assert_allclose(np.asarray(got)[: len(q)], np.asarray(ref), atol=1e-9)

    def test_all_points_after_last_state(self):
        imu, t = self._make_imu()
        q = np.sort(np.random.default_rng(13).uniform(t[-1], t[-1] + 0.1, 64))
        pts = np.random.default_rng(14).normal(size=(64, 3))
        ref = imu_mod.undistort_points(imu, jnp.asarray(q), jnp.asarray(pts))
        got = imu_mod.undistort_points(imu, jnp.asarray(q), jnp.asarray(pts), sorted_t=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-9)
