"""Window management unit tests: merging, overflow migration, rebasing."""

import numpy as np
import jax
import jax.numpy as jnp

from wildcat_slam_tpu.odometry import window as win_mod
from wildcat_slam_tpu.odometry.states import Surfels


def _surfels(cap, times, dtype=jnp.float64):
    s = Surfels.empty(cap, dtype)
    n = len(times)
    return s.replace(
        t=s.t.at[:n].set(jnp.asarray(times, dtype)),
        center=s.center.at[:n].set(jnp.arange(n * 3, dtype=dtype).reshape(n, 3)),
        valid=s.valid.at[:n].set(True),
    )


class TestInsertSurfels:
    def test_insert_into_free_slots(self):
        win = _surfels(8, [1.0, 2.0])
        new = _surfels(4, [3.0, 4.0])
        out, evicted = win_mod.insert_surfels(win, new)
        t = np.sort(np.asarray(out.t)[np.asarray(out.valid)])
        np.testing.assert_allclose(t, [1, 2, 3, 4])
        assert int(out.count) == 4
        assert int(evicted.count) == 0

    def test_payload_travels_with_insert(self):
        win = _surfels(8, [1.0, 3.0])
        new = _surfels(4, [2.0, 4.0])
        out, _ = win_mod.insert_surfels(win, new)
        ov = np.asarray(out.valid)
        t = np.asarray(out.t)[ov]
        c = np.asarray(out.center)[ov]
        # each surviving entry keeps its own center row (first coord = 3*rank)
        for ti, ci in zip(t, c):
            expect_rank = {1.0: 0, 3.0: 1, 2.0: 0, 4.0: 1}[float(ti)]
            np.testing.assert_allclose(ci, np.arange(3) + 3 * expect_rank)

    def test_eviction_oldest_and_reported(self):
        win = _surfels(4, [1.0, 2.0, 3.0, 4.0])
        new = _surfels(2, [5.0, 6.0])
        out, evicted = win_mod.insert_surfels(win, new)
        kept = np.sort(np.asarray(out.t)[np.asarray(out.valid)])
        np.testing.assert_allclose(kept, [3, 4, 5, 6])
        ev = np.sort(np.asarray(evicted.t)[np.asarray(evicted.valid)])
        np.testing.assert_allclose(ev, [1, 2])

    def test_eviction_preserves_payload(self):
        win = _surfels(2, [1.0, 2.0])
        new = _surfels(2, [3.0, 4.0])
        out, evicted = win_mod.insert_surfels(win, new)
        ev_valid = np.asarray(evicted.valid)
        ev_t = np.asarray(evicted.t)[ev_valid]
        ev_c = np.asarray(evicted.center)[ev_valid]
        np.testing.assert_allclose(np.sort(ev_t), [1, 2])
        np.testing.assert_allclose(ev_c[np.argsort(ev_t)][0], [0, 1, 2])

    def test_aux_payload_follows_insert(self):
        # derived-row caches ride the insert (the pipeline's fix_geo table):
        # aux rows tagged 10*t must land wherever their surfel lands, and
        # untouched slots must keep their old aux rows
        win = _surfels(6, [1.0, 2.0, 3.0, 4.0])
        new = _surfels(4, [5.0, 6.0, 7.0])
        win_aux = jnp.stack([10.0 * win.t, jnp.arange(6.0)], axis=1)
        new_aux = jnp.stack([10.0 * new.t, 100.0 + jnp.arange(4.0)], axis=1)
        out, evicted, out_aux = win_mod.insert_surfels(win, new, win_aux=win_aux,
                                                       new_aux=new_aux)
        ov = np.asarray(out.valid)
        np.testing.assert_allclose(np.asarray(out_aux)[ov, 0],
                                   10.0 * np.asarray(out.t)[ov])
        # slots not written this insert keep their original aux rows
        kept_old = ov & (np.asarray(out.t) <= 4.0)
        np.testing.assert_allclose(np.asarray(out_aux)[kept_old],
                                   np.asarray(win_aux)[kept_old])

    def test_aux_payload_on_eviction(self):
        # a full window: the 2 oldest are evicted, their slots' aux rows are
        # replaced by the incoming surfels' aux rows
        win = _surfels(2, [1.0, 2.0])
        new = _surfels(2, [3.0, 4.0])
        win_aux = (10.0 * win.t)[:, None]
        new_aux = (10.0 * new.t)[:, None]
        out, evicted, out_aux = win_mod.insert_surfels(win, new, win_aux=win_aux,
                                                       new_aux=new_aux)
        ov = np.asarray(out.valid)
        assert ov.all()
        np.testing.assert_allclose(np.asarray(out_aux)[:, 0],
                                   10.0 * np.asarray(out.t))

    def test_extract_moved(self):
        win = _surfels(8, [1.0, 2.0, 3.0, 4.0, 5.0])
        out, moved = win_mod.extract_moved(win, jnp.asarray(3.5), 4)
        np.testing.assert_allclose(np.sort(np.asarray(moved.t)[np.asarray(moved.valid)]), [1, 2, 3])
        np.testing.assert_allclose(np.sort(np.asarray(out.t)[np.asarray(out.valid)]), [4, 5])

    def test_extract_moved_capacity_limited(self):
        win = _surfels(8, [1.0, 2.0, 3.0, 4.0])
        out, moved = win_mod.extract_moved(win, jnp.asarray(10.0), 2)
        # only the 2 oldest move; the rest stay for a later sweep
        np.testing.assert_allclose(np.sort(np.asarray(moved.t)[np.asarray(moved.valid)]), [1, 2])
        np.testing.assert_allclose(np.sort(np.asarray(out.t)[np.asarray(out.valid)]), [3, 4])


class TestRebase:
    def test_rebase_shifts_all_windows(self):
        from wildcat_slam_tpu.odometry.states import ImuStates, SampleStates

        ss = SampleStates.empty(8, jnp.float64).replace(
            t=jnp.asarray([5.0, 6.0, 7.0, 0, 0, 0, 0, 0]), count=jnp.asarray(3, jnp.int32))
        imu = ImuStates.empty(8, jnp.float64).replace(
            t=jnp.asarray([5.0, 5.5, 6.0, 6.5, 7.0, 0, 0, 0]), count=jnp.asarray(5, jnp.int32))
        sld = _surfels(4, [5.5, 6.5])
        fix = _surfels(4, [4.5])
        ss2, imu2, sld2, fix2, shift = win_mod.rebase_times(ss, imu, sld, fix)
        assert float(shift) == 5.0
        assert float(ss2.t[0]) == 0.0
        np.testing.assert_allclose(np.asarray(imu2.t[:5]), [0, 0.5, 1.0, 1.5, 2.0])
        np.testing.assert_allclose(np.asarray(sld2.t)[np.asarray(sld2.valid)], [0.5, 1.5])
        np.testing.assert_allclose(np.asarray(fix2.t)[np.asarray(fix2.valid)], [-0.5])


class TestTiltedStart:
    def test_gravity_init_from_tilted_imu(self):
        # bootstrap with the rig tilted 20 deg: gravity must align with the
        # measured accelerometer direction (lidar_odometry.cc:392)
        from wildcat_slam_tpu.config import WildcatConfig
        from wildcat_slam_tpu.odometry.pipeline import WindowState, init_window
        from scipy.spatial.transform import Rotation as R

        cfg = WildcatConfig(max_sample_states=16, max_imu_states=64,
                            max_surfels_sliding=16, max_surfels_fixed=16)
        st = WindowState.empty(cfg, jnp.float64)
        tilt = R.from_euler("x", 20, degrees=True)
        acc_body = tilt.inv().apply([0, 0, 9.81])
        st = init_window(
            st,
            jnp.asarray([0.0, 0.005]),
            jnp.asarray(np.stack([acc_body, acc_body])),
            jnp.zeros((2, 3)),
            cfg,
        )
        grav = np.asarray(st.sample.grav)
        np.testing.assert_allclose(np.linalg.norm(grav), 9.81, atol=1e-9)
        # gravity in the odometry world frame (= initial body frame) is the
        # negated accelerometer direction
        np.testing.assert_allclose(grav, -9.81 * acc_body / np.linalg.norm(acc_body), atol=1e-9)
