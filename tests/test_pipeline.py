"""End-to-end odometry on synthetic sequences — the integration tests the
reference never had (its de-facto integration test was eyeballing rviz on Hilti
bags, SURVEY.md §4). Ground truth is exact, so tight ATE bounds apply."""

import numpy as np
import jax.numpy as jnp
import pytest

from wildcat_slam_tpu.config import WildcatConfig
from wildcat_slam_tpu.io.synthetic import SyntheticSequence, ate_rmse
from wildcat_slam_tpu.io.trajectory import load_tum, save_tum
from wildcat_slam_tpu.odometry.pipeline import LidarOdometry


def _run(seq, cfg):
    lo = LidarOdometry(cfg)
    imu_iter = iter(seq.imu)
    pending = next(imu_iter, None)
    for ts, pl in seq.scans:
        while pending is not None and pending[0] <= ts[-1] + 0.01:
            lo.add_imu(*pending)
            pending = next(imu_iter, None)
        lo.add_scan(ts, pl)
    return lo


def _small_cfg(**kw):
    base = dict(
        max_points_per_sweep=16384,
        max_surfels_per_sweep=512,
        max_surfels_sliding=2048,
        max_surfels_fixed=2048,
        max_correspondences=2048,
        max_leaves_per_sweep=4096,
        max_imu_states=640,
        max_sample_states=48,
        inner_iter_num_max=25,
    )
    base.update(kw)
    return WildcatConfig(**base)


class TestEndToEnd:
    def test_short_sequence_ate(self):
        seq = SyntheticSequence(duration=1.6, points_per_scan=4000, room_half=4.0, seed=0)
        lo = _run(seq, _small_cfg())
        assert lo.sweep_id >= 3
        err = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=False)
        # exact-consistency IMU + mm-noise lidar: expect mm-level tracking
        assert err < 0.02, f"ATE {err}"
        # solver must actually converge, not just run out of iterations
        assert all(np.isfinite(float(s["final_cost"])) for s in lo.stats)
        assert all(int(s["n_new_surfels"]) > 50 for s in lo.stats)

    def test_chunked_dispatch_matches_per_sweep(self):
        """chunk_sweeps=k (process_sweeps_chained: lax.scan over the sweep
        body, ONE dispatch + ONE fetch per k sweeps — the offline-replay
        wall-clock attack, VERDICT r4 item 2) must reproduce the per-sweep
        path: same sweep boundaries, same per-sweep stats, same trajectory to
        float noise. 4 sweeps at chunk=3 also exercises the noop-padded
        partial tail chunk."""
        seq = SyntheticSequence(duration=2.5, points_per_scan=3000, room_half=5.0, seed=0)
        cfg = _small_cfg()
        lo1 = _run(seq, cfg)
        tr1, st1 = lo1.trajectory, lo1.stats

        lo3 = LidarOdometry(cfg, chunk_sweeps=3)
        imu_iter = iter(seq.imu)
        pending = next(imu_iter, None)
        for ts, pl in seq.scans:
            while pending is not None and pending[0] <= ts[-1] + 0.01:
                lo3.add_imu(*pending)
                pending = next(imu_iter, None)
            lo3.add_scan(ts, pl)
        tr3, st3 = lo3.trajectory, lo3.stats  # flushes the partial tail

        assert len(tr3) == len(tr1) >= 4
        for (t1, p1, q1), (t3, p3, q3) in zip(tr1, tr3):
            assert abs(t1 - t3) < 1e-9
            np.testing.assert_allclose(np.asarray(p3), np.asarray(p1), atol=1e-5)
            np.testing.assert_allclose(np.asarray(q3), np.asarray(q1), atol=1e-5)
        for a, b in zip(st1, st3):
            assert int(a["n_new_surfels"]) == int(b["n_new_surfels"])
            assert int(a["n_pairs_sld"]) == int(b["n_pairs_sld"])

    def test_chunked_rejects_per_sweep_outputs(self):
        with pytest.raises(ValueError, match="chunk_sweeps"):
            LidarOdometry(_small_cfg(), collect_clouds=True, chunk_sweeps=2)
        with pytest.raises(ValueError, match="chunk_sweeps"):
            LidarOdometry(_small_cfg(debug_residuals=True), chunk_sweeps=2)

    def test_trajectory_export_roundtrip(self, tmp_path):
        seq = SyntheticSequence(duration=1.6, points_per_scan=4000, room_half=4.0, seed=1)
        lo = _run(seq, _small_cfg())
        path = str(tmp_path / "traj.tum")
        save_tum(path, lo.trajectory)
        loaded = load_tum(path)
        assert len(loaded) == len(lo.trajectory)
        np.testing.assert_allclose(loaded[0][1], lo.trajectory[0][1], atol=1e-8)
        np.testing.assert_allclose(loaded[-1][2], lo.trajectory[-1][2], atol=1e-8)

    def test_imu_gap_before_points_is_handled(self):
        # sync must drop IMU samples arriving before the first lidar point
        seq = SyntheticSequence(duration=1.6, points_per_scan=4000, room_half=4.0, seed=2)
        cfg = _small_cfg()
        lo = LidarOdometry(cfg)
        imu_iter = iter(seq.imu)
        pending = next(imu_iter, None)
        scans = seq.scans[3:]  # points start at 0.3 s: early IMU must be dropped
        for ts, pl in scans:
            while pending is not None and pending[0] <= ts[-1] + 0.01:
                lo.add_imu(*pending)
                pending = next(imu_iter, None)
            lo.add_scan(ts, pl)
        assert lo.sweep_id >= 2
        # trajectory positions must stay bounded (the room is 8 m wide)
        for _, p, _ in lo.trajectory:
            assert np.linalg.norm(p) < 10


class TestWindowBehavior:
    def test_sliding_window_trims(self):
        # after > 6 s the sample window must stop growing and fix_first unlatches
        seq = SyntheticSequence(duration=7.5, points_per_scan=1500, room_half=4.0, seed=3)
        lo = _run(seq, _small_cfg(max_sample_states=112, max_imu_states=1792, inner_iter_num_max=8))
        assert lo.sweep_id >= 14
        assert not lo.fix_first
        span = lo.sample_times[-1] - lo.sample_times[0]
        assert span <= 6.0 + 0.081
        assert int(lo.state.sample.count) == len(lo.sample_times)
        # surfels migrated into the fixed window
        assert int(lo.state.fix.count) > 0
        # matching against the fixed window kicked in
        assert any(int(s["n_pairs_fix"]) > 0 for s in lo.stats)

    def test_fix_geo_cache_matches_recompute(self):
        # the incrementally-maintained fixed-window derived table (WindowState.
        # fix_geo, refreshed only for inserted rows) must equal a full
        # pack_geo_rows recompute after many sweeps of insert/trim/rebase
        from wildcat_slam_tpu.odometry import factors as fmod

        seq = SyntheticSequence(duration=4.0, points_per_scan=1500, room_half=4.0, seed=3)
        lo = _run(seq, _small_cfg(sliding_window_duration=2.0, max_sample_states=112,
                                  max_imu_states=1792, inner_iter_num_max=8))
        assert int(lo.state.fix.count) > 0
        v = np.asarray(lo.state.fix.valid)
        cached = np.asarray(lo.state.fix_geo)[v]
        recomputed = np.asarray(fmod.pack_geo_rows(lo.state.fix))[v]
        # center_world/norm_world (cols 6:12) are row-local elementwise ops,
        # but XLA fuses them differently at the insert-block batch size than
        # at the full window (e.g. rsqrt folding), so they too are equal only
        # to f32 ULP roundoff (observed max |diff| 4.8e-7), same as
        # cov_world's 3-wide matmul in cols 0:6.
        np.testing.assert_allclose(cached[:, 6:12], recomputed[:, 6:12],
                                   rtol=0, atol=2e-6)
        np.testing.assert_allclose(cached[:, 0:6], recomputed[:, 0:6],
                                   rtol=0, atol=2e-6)
        # and the pack assembled from the cache matches the direct pack under
        # the same split (cols 0:12 raw fields exact, 12:18 cached cov6)
        pk_c = np.asarray(fmod.pack_factor_rows_from_geo(lo.state.fix, lo.state.fix_geo))[v]
        pk_d = np.asarray(fmod.pack_factor_rows(lo.state.fix))[v]
        np.testing.assert_array_equal(pk_c[:, 0:12], pk_d[:, 0:12])
        np.testing.assert_allclose(pk_c[:, 12:18], pk_d[:, 12:18], rtol=0, atol=2e-6)


class TestInputValidation:
    def test_unsorted_scan_times_rejected(self):
        lo = LidarOdometry(_small_cfg())
        with pytest.raises(ValueError, match="non-decreasing"):
            lo.add_scan(np.array([1.0, 0.5]), np.zeros((2, 3)))

    def test_out_of_order_scans_rejected(self):
        # the reference CHECK-aborts on disordered scans (lidar_odometry.cc:491)
        lo = LidarOdometry(_small_cfg())
        lo.add_scan(np.array([1.0, 1.1]), np.full((2, 3), 5.0))
        with pytest.raises(ValueError, match="time order"):
            lo.add_scan(np.array([0.9, 1.2]), np.full((2, 3), 5.0))

    def test_out_of_order_imu_rejected(self):
        # a silent negative lerp factor in the resampler would extrapolate
        # garbage; the pipeline must reject disordered IMU like it rejects
        # disordered scans
        lo = LidarOdometry(_small_cfg())
        lo.add_imu(1.0, [0, 0, 9.81], [0, 0, 0])
        lo.add_imu(1.005, [0, 0, 9.81], [0, 0, 0])
        with pytest.raises(ValueError, match="time-ordered"):
            lo.add_imu(0.99, [0, 0, 9.81], [0, 0, 0])
        # equal timestamps are tolerated (duplicate messages happen in bags)
        lo.add_imu(1.005, [0, 0, 9.81], [0, 0, 0])

    def test_out_of_order_imu_rejected_by_resampler(self):
        from wildcat_slam_tpu.odometry.imu import ImuResampler
        rs = ImuResampler(200.0)
        rs.add(1.0, np.zeros(3), np.zeros(3))
        with pytest.raises(ValueError, match="time-ordered"):
            rs.add(0.99, np.zeros(3), np.zeros(3))


class TestResidualSnapshots:
    def test_pre_and_post_solve_residuals(self):
        # the reference prints residual histograms before AND after each solve
        # (lidar_odometry.cc:547-549,568-571); both snapshots must be captured
        # and the solve must not increase the robust surfel residual mass
        seq = SyntheticSequence(duration=1.6, points_per_scan=4000, room_half=4.0, seed=7)
        cfg = _small_cfg(debug_residuals=True)
        lo = _run(seq, cfg)
        assert lo.sweep_id >= 3
        assert len(lo.residuals) == lo.sweep_id
        for r in lo.residuals:
            assert {"surfel", "imu", "surfel_pre", "imu_pre"} <= set(r)
            assert r["surfel_pre"].shape == r["surfel"].shape
            assert r["imu_pre"].shape == r["imu"].shape
        # past the bootstrap sweeps the IMU prediction already has error that
        # the solve reduces; compare robust (Cauchy) surfel costs
        a2 = cfg.cauchy_loss_scale**2
        rob = lambda x: float(np.sum(a2 * np.log1p(x * x / a2)))
        post = sum(rob(r["surfel"]) for r in lo.residuals[1:])
        pre = sum(rob(r["surfel_pre"]) for r in lo.residuals[1:])
        assert post <= pre + 1e-6


class TestCapacityOverflow:
    """The reference processes unbounded input (lidar_odometry.cc:134-141);
    here static capacities bound every array, so overflow must be counted,
    mitigated (voxel decimation), and surfaced — never silent."""

    def test_overfull_sweep_decimated_and_counted(self):
        seq = SyntheticSequence(duration=1.6, points_per_scan=4000, room_half=4.0, seed=0)
        # a sweep carries ~2x this capacity -> every sweep overflows
        cfg = _small_cfg(max_points_per_sweep=8192)
        with pytest.warns(UserWarning, match="max_points_per_sweep"):
            lo = _run(seq, cfg)
        assert lo.sweep_id >= 3
        st = lo.stats
        assert any(s["n_points_dropped"] > 0 for s in st)
        assert all(s["n_points_fed"] <= 8192 for s in st)
        assert all(s["n_points_in"] == s["n_points_fed"] + s["n_points_dropped"] for s in st)
        # decimation keeps the sweep spatially uniform: accuracy degrades
        # boundedly, not catastrophically (full-capacity run is ~mm)
        err = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=False)
        assert err < 0.05, f"ATE with decimated sweeps {err}"

    def test_overflow_truncate_policy(self):
        seq = SyntheticSequence(duration=1.6, points_per_scan=4000, room_half=4.0, seed=1)
        cfg = _small_cfg(max_points_per_sweep=8192, overflow_decimate=False)
        with pytest.warns(UserWarning, match="truncated"):
            lo = _run(seq, cfg)
        assert any(s["n_points_dropped"] > 0 for s in lo.stats)
        assert all(s["n_points_fed"] <= 8192 for s in lo.stats)

    def test_surfel_and_pair_overflow_counters(self):
        seq = SyntheticSequence(duration=1.6, points_per_scan=4000, room_half=4.0, seed=2)
        cfg = _small_cfg(max_surfels_per_sweep=64, max_correspondences=128)
        lo = _run(seq, cfg)
        st = lo.stats
        # real sweeps produce hundreds of surfels -> the device-side counters
        # must report the capacity loss
        assert any(s["n_surfels_dropped"] > 0 for s in st), st
        assert all(s["n_surfels_dropped"] >= 0 and s["n_pairs_dropped"] >= 0 for s in st)
        err = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=False)
        assert np.isfinite(err)

    def test_no_overflow_counters_stay_zero(self):
        seq = SyntheticSequence(duration=1.1, points_per_scan=3000, room_half=4.0, seed=3)
        lo = _run(seq, _small_cfg())
        for s in lo.stats:
            assert s["n_points_dropped"] == 0
            assert s["n_surfels_dropped"] == 0
            assert s["n_pairs_dropped"] == 0


class TestOutlierRobustness:
    def test_clutter_does_not_break_tracking(self):
        # 15% of returns are floating clutter: the Cauchy loss (and the plane
        # tests in extraction) must keep the trajectory at mm-cm level
        seq = SyntheticSequence(duration=1.6, points_per_scan=4000, room_half=4.0,
                                seed=0, outlier_fraction=0.15)
        lo = _run(seq, _small_cfg())
        assert lo.sweep_id >= 3
        err = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=False)
        assert err < 0.05, f"ATE with outliers {err}"


class TestDegenerateGeometry:
    def test_single_plane_scene_stays_finite(self):
        """Only a floor in view: yaw/xy are lidar-unobservable. The solver must
        stay finite and bounded (IMU holds the unobservable directions)."""
        import numpy as np
        from wildcat_slam_tpu.io.synthetic import SyntheticSequence

        seq = SyntheticSequence(duration=1.6, points_per_scan=4000, room_half=4.0, seed=5)
        # crush every return onto the floor plane z = -1 (world), preserving
        # the ray geometry roughly: re-project points to z=-1 in lidar frame is
        # involved; instead just replace each scan with floor-only points
        rng = np.random.default_rng(0)
        ext_rot = np.asarray(WildcatConfig().ext_lidar2imu_rot).reshape(3, 3)
        ext_pos = np.asarray(WildcatConfig().ext_lidar2imu_pos)
        floor_scans = []
        for ts, _ in seq.scans:
            n = len(ts)
            pos, rot = seq.gt_pose(ts)
            xy = rng.uniform(-3, 3, (n, 2))
            pw = np.stack([xy[:, 0], xy[:, 1], np.full(n, -1.0)], axis=1)
            pw += rng.normal(scale=0.003, size=pw.shape)
            # world -> body -> lidar
            from scipy.spatial.transform import Rotation as R
            rm = R.from_quat(np.concatenate([rot[:, 1:], rot[:, :1]], axis=1)).as_matrix()
            pb = np.einsum("nij,nj->ni", rm.transpose(0, 2, 1), pw - pos)
            pl = (pb - ext_pos) @ ext_rot  # inverse extrinsic
            floor_scans.append((ts, pl))

        lo = LidarOdometry(_small_cfg())
        it = iter(seq.imu)
        pending = next(it, None)
        for ts, pl in floor_scans:
            while pending is not None and pending[0] <= ts[-1] + 0.01:
                lo.add_imu(*pending)
                pending = next(it, None)
            lo.add_scan(ts, pl)
        assert lo.sweep_id >= 3
        for _, p, q in lo.trajectory:
            assert np.all(np.isfinite(p)) and np.all(np.isfinite(q))
            assert np.linalg.norm(p) < 20  # bounded, not exploded
        # z is observable from the floor: must track well even if xy drifts
        g = seq.gt_pose(lo.trajectory[-1][0])[0]
        assert abs(lo.trajectory[-1][1][2] - g[2]) < 0.05


class TestOuterIterations:
    def test_two_outer_iterations(self):
        # reference outer_iter_num_max is configurable (lio_config.h:40)
        seq = SyntheticSequence(duration=1.1, points_per_scan=3000, room_half=4.0, seed=6)
        lo = _run(seq, _small_cfg(outer_iter_num_max=2, inner_iter_num_max=10))
        assert lo.sweep_id >= 2
        err = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=False)
        assert err < 0.02


class TestImuStreamRobustness:
    def test_imu_gap_is_bridged(self):
        """A 0.25 s sensor dropout mid-sequence: the resampler linearly
        interpolates across the gap (imu_resampler.h:23-46 does the same) and
        the pipeline must keep producing finite, reasonable poses."""
        seq = SyntheticSequence(duration=1.6, points_per_scan=4000, room_half=4.0, seed=0)
        imu = [(t, a, g) for (t, a, g) in seq.imu if not (0.62 < t < 0.87)]
        lo = LidarOdometry(_small_cfg())
        it = iter(imu)
        pending = next(it, None)
        for ts, pl in seq.scans:
            while pending is not None and pending[0] <= ts[-1] + 0.01:
                lo.add_imu(*pending)
                pending = next(it, None)
            lo.add_scan(ts, pl)
        assert lo.sweep_id >= 3
        err = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=False)
        assert np.isfinite(err) and err < 0.05  # degraded but sane

    def test_duplicate_and_jittered_imu_stamps(self):
        """Duplicate timestamps and +-1 ms jitter (common in real bags) must
        not corrupt the resampled grid."""
        rng = np.random.default_rng(3)
        seq = SyntheticSequence(duration=1.2, points_per_scan=4000, room_half=4.0, seed=1)
        imu = []
        for (t, a, g) in seq.imu:
            tj = t + rng.uniform(-1e-3, 1e-3)
            imu.append((tj, a, g))
            if rng.random() < 0.02:
                imu.append((tj, a, g))  # exact duplicate
        imu.sort(key=lambda e: e[0])
        lo = LidarOdometry(_small_cfg())
        it = iter(imu)
        pending = next(it, None)
        for ts, pl in seq.scans:
            while pending is not None and pending[0] <= ts[-1] + 0.01:
                lo.add_imu(*pending)
                pending = next(it, None)
            lo.add_scan(ts, pl)
        assert lo.sweep_id >= 2
        err = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=False)
        assert np.isfinite(err) and err < 0.05
