"""Native C++ feeder vs the pure-Python host path (exact equivalence)."""

import os

import numpy as np
import pytest

from wildcat_slam_tpu.config import WildcatConfig
from wildcat_slam_tpu.io import native
from wildcat_slam_tpu.io.dataset import save_scan
from wildcat_slam_tpu.odometry.imu import ImuResampler

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def _cfg():
    return WildcatConfig()


def _feeder(cfg):
    return native.NativeFeeder(
        np.asarray(cfg.ext_lidar2imu_rot).reshape(3, 3), cfg.ext_lidar2imu_pos,
        cfg.min_range, cfg.max_range, cfg.blind_box_min, cfg.blind_box_max)


def _python_filter(cfg, times, pts):
    p = pts @ np.asarray(cfg.ext_lidar2imu_rot).reshape(3, 3).T + np.asarray(cfg.ext_lidar2imu_pos)
    rng = np.linalg.norm(p, axis=1)
    in_box = np.all((p >= np.asarray(cfg.blind_box_min)) & (p <= np.asarray(cfg.blind_box_max)), axis=1)
    keep = (rng >= cfg.min_range) & (rng <= cfg.max_range) & ~in_box
    return times[keep], p[keep]


class TestFeeder:
    def test_filter_matches_python(self):
        cfg = _cfg()
        rng = np.random.default_rng(0)
        pts = rng.uniform(-10, 10, (5000, 3))
        pts[:100] *= 0.02   # some inside min range / blind box
        pts[100:120] *= 30  # some beyond max range
        times = np.sort(rng.uniform(0, 1, 5000))

        f = _feeder(cfg)
        kept = f.add_points(times, pts.astype(np.float32))
        ref_t, ref_p = _python_filter(cfg, times, pts.astype(np.float32).astype(np.float64))
        assert kept == len(ref_t) == len(f)

        out_t = np.zeros(8192, np.float32)
        out_p = np.zeros((8192, 3), np.float32)
        n = f.pop_sweep(2.0, 0.0, out_t, out_p)
        assert n == len(ref_t)
        np.testing.assert_allclose(out_t[:n], ref_t, atol=1e-6)
        np.testing.assert_allclose(out_p[:n], ref_p, atol=1e-5)
        assert len(f) == 0

    def test_scan_file_roundtrip(self, tmp_path):
        cfg = _cfg()
        rng = np.random.default_rng(1)
        pts = rng.uniform(-10, 10, (1000, 3)).astype(np.float32)
        times = 1000.0 + np.sort(rng.uniform(0, 0.1, 1000))
        path = str(tmp_path / "s.wcs")
        save_scan(path, times, pts)

        f = _feeder(cfg)
        kept = f.load_scan(path)
        ref_t, ref_p = _python_filter(cfg, times, pts.astype(np.float64))
        assert kept == len(ref_t)
        out_t = np.zeros(4096, np.float32)
        out_p = np.zeros((4096, 3), np.float32)
        n = f.pop_sweep(2000.0, 1000.0, out_t, out_p)
        assert n == kept
        np.testing.assert_allclose(out_t[:n], ref_t - 1000.0, atol=1e-4)

    def test_drop_before(self):
        cfg = _cfg()
        f = _feeder(cfg)
        times = np.linspace(0, 1, 100)
        pts = np.full((100, 3), 5.0, np.float32)
        f.add_points(times, pts)
        dropped = f.drop_before(0.5)
        assert dropped == 50
        assert abs(f.front_time - times[50]) < 1e-12


class TestResampler:
    def test_matches_python_resampler(self):
        rate = 200.0
        py = ImuResampler(rate)
        nat = native.NativeResampler(rate)
        rng = np.random.default_rng(2)
        t = 0.0
        for _ in range(500):
            t += rng.uniform(0.002, 0.008)
            acc, gyr = rng.normal(size=3), rng.normal(size=3)
            out_py = py.add(t, acc, gyr)
            out_nat = nat.add(t, acc, gyr)
            assert len(out_py) == len(out_nat)
            for (tp, ap, gp), (tn, an, gn) in zip(out_py, out_nat):
                assert tp == tn  # identical grid expression -> bitwise equal
                np.testing.assert_allclose(ap, an, atol=0)
                np.testing.assert_allclose(gp, gn, atol=0)
        assert py._t0 == nat._t0


class TestNativePipeline:
    def test_native_feeder_end_to_end_equivalence(self):
        """The full pipeline with the C++ feeder must match the numpy path."""
        import jax
        from wildcat_slam_tpu.io.synthetic import SyntheticSequence
        from wildcat_slam_tpu.odometry.pipeline import LidarOdometry

        seq = SyntheticSequence(duration=1.6, points_per_scan=3000, room_half=4.0, seed=0)
        cfg = WildcatConfig(
            max_points_per_sweep=16384, max_surfels_per_sweep=512,
            max_surfels_sliding=2048, max_surfels_fixed=2048,
            max_correspondences=2048, max_leaves_per_sweep=4096,
            max_imu_states=640, max_sample_states=48, inner_iter_num_max=15,
        )

        def run(use_native):
            lo = LidarOdometry(cfg, use_native=use_native)
            it = iter(seq.imu)
            pending = next(it, None)
            for ts, pl in seq.scans:
                while pending is not None and pending[0] <= ts[-1] + 0.01:
                    lo.add_imu(*pending)
                    pending = next(it, None)
                lo.add_scan(ts, pl)
            return lo

        a = run(False)
        b = run(True)
        assert a.sweep_id == b.sweep_id >= 3
        for (t1, p1, q1), (t2, p2, q2) in zip(a.trajectory, b.trajectory):
            assert t1 == t2
            # the native path feeds f32 points (numpy feeds f64->f32 at the
            # device boundary); identical up to that rounding
            np.testing.assert_allclose(p1, p2, atol=2e-4)


class TestNanPointFiltering:
    def test_nan_and_inf_points_dropped_on_both_paths(self):
        # real lidars emit NaN returns for no-echo beams; both the NumPy and the
        # C++ feeder must drop them (NaN compares false against every bound, so
        # the filters are written as accept-conditions)
        from wildcat_slam_tpu.odometry.pipeline import _NumpyPointBuffer

        cfg = _cfg()
        rng = np.random.default_rng(0)
        n = 500
        pts = rng.uniform(-5, 5, (n, 3))
        pts[::50] = np.nan
        pts[1::50] = np.inf
        pts[2::50] = -np.inf
        times = np.sort(rng.uniform(0, 0.1, n))

        py = _NumpyPointBuffer(cfg)
        n_py = py.add_points(times, pts.copy())
        tp, xp = py.dump()
        assert np.all(np.isfinite(xp))

        if not native.available():
            pytest.skip("native library not built")
        nat = _feeder(cfg)
        n_nat = nat.add_points(times, pts.copy())
        assert n_nat == n_py
        tn, xn = nat.dump()
        np.testing.assert_allclose(np.asarray(tn), tp, atol=0)
        np.testing.assert_allclose(np.asarray(xn), xp, rtol=0, atol=1e-6)
