"""Tests for diagnostics, dataset replay, viz export, and the CLI driver."""

import json
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp

from wildcat_slam_tpu.io import dataset as ds
from wildcat_slam_tpu.odometry.states import Surfels
from wildcat_slam_tpu.utils.histogram import Histogram, residual_report
from wildcat_slam_tpu.utils.profiling import StageTimer
from wildcat_slam_tpu.viz.surfel_export import save_cloud_ply, save_surfels_ply, surfel_ellipsoids


class TestHistogram:
    def test_basic_stats(self):
        h = Histogram().add([1.0, 2.0, 3.0, 4.0])
        s = h.to_string(4)
        assert "Count: 4" in s and "Min: 1" in s and "Max: 4" in s

    def test_empty(self):
        assert Histogram().to_string() == "Count: 0"

    def test_constant(self):
        s = Histogram().add(np.full(10, 2.5)).to_string()
        assert "Count: 10" in s

    def test_nan_filtered(self):
        h = Histogram().add([1.0, np.nan, np.inf, 2.0])
        assert h.values.size == 2

    def test_report(self):
        assert "surfel residuals" in residual_report("surfel", np.random.randn(100))


class TestStageTimer:
    def test_accumulates(self):
        t = StageTimer()
        with t.stage("a"):
            pass
        with t.stage("a"):
            pass
        assert t.counts["a"] == 2
        assert "a" in t.report()


class TestDataset:
    def test_scan_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        times = 1234.5 + np.sort(rng.uniform(0, 0.1, 500))
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        p = str(tmp_path / "scan.wcs")
        ds.save_scan(p, times, pts)
        t2, p2 = ds.load_scan(p)
        np.testing.assert_allclose(t2, times, atol=1e-5)
        np.testing.assert_allclose(p2, pts, atol=1e-6)

    def test_sequence_replay_order(self, tmp_path):
        rng = np.random.default_rng(1)
        imu = [(i * 0.01, rng.normal(size=3), rng.normal(size=3)) for i in range(50)]
        scans = [
            (np.sort(rng.uniform(k * 0.1, (k + 1) * 0.1, 20)), rng.normal(size=(20, 3)))
            for k in range(4)
        ]
        d = str(tmp_path / "seq")
        ds.save_sequence(d, imu, scans)
        events = list(ds.Dataset(d))
        kinds = [e[0] for e in events]
        assert kinds.count("scan") == 4
        assert kinds.count("imu") == 50
        # imu events before each scan cover the scan's span
        t_seen = -1.0
        for e in events:
            if e[0] == "imu":
                assert e[1] >= t_seen - 1e-9
                t_seen = e[1]


class TestViz:
    def _surfels(self, n=5):
        rng = np.random.default_rng(2)
        s = Surfels.empty(8, dtype=jnp.float64)
        cov = rng.normal(size=(8, 3, 3)) * 0.05
        cov = cov @ cov.transpose(0, 2, 1) + np.eye(3) * 1e-5
        return s.replace(
            t=jnp.asarray(rng.uniform(0, 1, 8)),
            center=jnp.asarray(rng.normal(size=(8, 3))),
            cov=jnp.asarray(cov),
            norm=jnp.asarray(
                (lambda v: v / np.linalg.norm(v, axis=1, keepdims=True))(rng.normal(size=(8, 3)))
            ),
            valid=jnp.arange(8) < n,
        )

    def test_ellipsoids(self):
        e = surfel_ellipsoids(self._surfels())
        assert e["center"].shape == (5, 3)
        assert np.all(e["radii"] >= 0)
        assert np.all((e["rgb"] >= 0.0) & (e["rgb"] <= 1.0))

    def test_ply_export(self, tmp_path):
        p = str(tmp_path / "s.ply")
        n = save_surfels_ply(p, self._surfels())
        assert n == 5
        head = open(p).read(200)
        assert head.startswith("ply")
        save_cloud_ply(str(tmp_path / "c.ply"), np.random.randn(10, 3))


class TestCli:
    def test_synthetic_smoke(self, tmp_path):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = ""  # let cli --device cpu handle it
        traj = str(tmp_path / "t.tum")
        r = subprocess.run(
            [sys.executable, "-m", "wildcat_slam_tpu.cli", "--synthetic", "1.2",
             "--device", "cpu", "--traj-out", traj, "--max-sweeps", "2"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=560, env=env,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.path.exists(traj)
        assert "sweeps" in r.stderr
