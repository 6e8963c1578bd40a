"""ROS1 bag reader/writer round-trips and end-to-end bag replay."""

import bz2
import struct

import numpy as np
import pytest

from wildcat_slam_tpu.io import rosbag


def _events(seed=0, n_imu=40, n_scans=3):
    rng = np.random.default_rng(seed)
    evs = []
    for i in range(n_imu):
        evs.append(("imu", 1000.0 + i * 0.005, rng.normal(size=3), rng.normal(size=3)))
    for k in range(n_scans):
        t0 = 1000.0 + k * 0.06
        times = t0 + np.sort(rng.uniform(0, 0.05, 50))
        pts = rng.normal(size=(50, 3)) * 5
        evs.append(("scan", times, pts))
    return evs


class TestRoundTrip:
    def test_write_read(self, tmp_path):
        evs = _events()
        path = str(tmp_path / "seq.bag")
        rosbag.write_bag(path, evs)
        got = list(rosbag.read_bag(path))
        assert len(got) == len(evs)
        for ref, out in zip(evs, got):
            assert ref[0] == out[0]
            if ref[0] == "imu":
                assert abs(ref[1] - out[1]) < 1e-6  # stamp quantized to ns
                np.testing.assert_allclose(out[2], ref[2], atol=1e-12)
                np.testing.assert_allclose(out[3], ref[3], atol=1e-12)
            else:
                np.testing.assert_allclose(out[1], ref[1], atol=1e-9)   # f64 time field
                np.testing.assert_allclose(out[2], ref[2], atol=1e-6)   # f32 points

    def test_topic_filter(self, tmp_path):
        path = str(tmp_path / "seq.bag")
        rosbag.write_bag(path, _events())
        only_imu = [e for e in rosbag.read_bag(path, lidar_topic="/nonexistent")]
        assert all(e[0] == "imu" for e in only_imu)

    def test_bz2_chunk(self, tmp_path):
        # rewrite the single chunk bz2-compressed and re-read
        path = str(tmp_path / "plain.bag")
        rosbag.write_bag(path, _events(n_imu=10, n_scans=1))
        blob = open(path, "rb").read()
        magic_end = blob.index(b"\n") + 1
        recs = list(rosbag._records(blob[magic_end:]))
        out = blob[:magic_end]
        for header, data in recs:
            if header["op"][0] == rosbag._OP_CHUNK:
                comp = bz2.compress(data)
                out += rosbag._record(
                    {"op": header["op"], "compression": b"bz2",
                     "size": struct.pack("<I", len(data))}, comp)
            else:
                out += rosbag._record(header, data)
        p2 = str(tmp_path / "bz2.bag")
        open(p2, "wb").write(out)
        assert len(list(rosbag.read_bag(p2))) == 11

    def test_bad_magic(self, tmp_path):
        p = tmp_path / "x.bag"
        p.write_bytes(b"not a bag")
        with pytest.raises(ValueError):
            list(rosbag.read_bag(str(p)))

    def test_convert_to_dataset(self, tmp_path):
        path = str(tmp_path / "seq.bag")
        rosbag.write_bag(path, _events())
        stats = rosbag.convert_bag(path, str(tmp_path / "out"))
        assert stats == {"imu": 40, "scans": 3}
        from wildcat_slam_tpu.io.dataset import Dataset

        evs = list(Dataset(str(tmp_path / "out")))
        assert sum(1 for e in evs if e[0] == "scan") == 3


class TestEndToEndBag:
    def test_pipeline_runs_from_bag(self, tmp_path):
        # package a synthetic sequence as a rosbag, replay it through the CLI path
        from wildcat_slam_tpu.config import WildcatConfig
        from wildcat_slam_tpu.io.synthetic import SyntheticSequence, ate_rmse
        from wildcat_slam_tpu.odometry.pipeline import LidarOdometry

        seq = SyntheticSequence(duration=1.6, points_per_scan=4000, room_half=4.0, seed=0)
        base = 1700000000.0  # exercise absolute-epoch handling
        evs = []
        i_imu = 0
        for times, pts in seq.scans:
            while i_imu < len(seq.imu) and seq.imu[i_imu][0] <= times[-1] + 0.01:
                t, acc, gyr = seq.imu[i_imu]
                evs.append(("imu", base + t, acc, gyr))
                i_imu += 1
            evs.append(("scan", base + times, pts))
        path = str(tmp_path / "synthetic.bag")
        rosbag.write_bag(path, evs)

        cfg = WildcatConfig(
            max_points_per_sweep=16384, max_surfels_per_sweep=512,
            max_surfels_sliding=2048, max_surfels_fixed=2048,
            max_correspondences=2048, max_leaves_per_sweep=4096,
            max_imu_states=640, max_sample_states=48, inner_iter_num_max=20,
        )
        lo = LidarOdometry(cfg)
        for ev in rosbag.read_bag(path):
            if ev[0] == "imu":
                lo.add_imu(ev[1], ev[2], ev[3])
            else:
                lo.add_scan(ev[1], ev[2])
        assert lo.sweep_id >= 3
        err = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(np.asarray(t) - base)[0], align=False)
        assert err < 0.02, err


class TestHostileInput:
    """Edge cases a real-world bag can throw at the streaming reader."""

    def test_writer_bz2_multichunk(self, tmp_path):
        evs = _events(n_imu=30, n_scans=2)
        path = str(tmp_path / "c.bag")
        rosbag.write_bag(path, evs, compression="bz2", messages_per_chunk=7)
        got = list(rosbag.read_bag(path))
        assert len(got) == len(evs)
        scans = [e for e in got if e[0] == "scan"]
        np.testing.assert_allclose(scans[0][1], evs[30][1], atol=1e-9)

    def test_permuted_fields_with_unknown_extras(self, tmp_path):
        evs = _events(n_imu=5, n_scans=2)
        path = str(tmp_path / "p.bag")
        rosbag.write_bag(path, evs, layout="permuted")
        got = [e for e in rosbag.read_bag(path) if e[0] == "scan"]
        ref = [e for e in evs if e[0] == "scan"]
        for r, g in zip(ref, got):
            np.testing.assert_allclose(g[1], r[1], atol=1e-9)
            np.testing.assert_allclose(g[2], r[2], atol=1e-6)

    def test_relative_f32_time_field(self, tmp_path):
        evs = _events(n_imu=5, n_scans=2)
        path = str(tmp_path / "r.bag")
        rosbag.write_bag(path, evs, layout="relative_f32")
        got = [e for e in rosbag.read_bag(path) if e[0] == "scan"]
        ref = [e for e in evs if e[0] == "scan"]
        for r, g in zip(ref, got):
            # relative f32 offsets from the header stamp: ~us quantization
            np.testing.assert_allclose(g[1], r[1], atol=1e-4)
            np.testing.assert_allclose(g[2], r[2], atol=1e-6)

    def test_truncated_bag_yields_prefix_then_raises(self, tmp_path):
        evs = _events(n_imu=30, n_scans=2)
        path = str(tmp_path / "full.bag")
        rosbag.write_bag(path, evs, messages_per_chunk=8)
        blob = open(path, "rb").read()
        cut = str(tmp_path / "cut.bag")
        open(cut, "wb").write(blob[: int(len(blob) * 0.6)])
        got = []
        with pytest.raises(ValueError, match="truncated"):
            for ev in rosbag.read_bag(cut):
                got.append(ev)
        assert 0 < len(got) < len(evs)  # complete chunks still delivered

    def test_streaming_does_not_slurp(self, tmp_path, monkeypatch):
        # the reader must never call f.read() with no size (whole-file slurp)
        evs = _events(n_imu=20, n_scans=2)
        path = str(tmp_path / "s.bag")
        rosbag.write_bag(path, evs, messages_per_chunk=5)
        import builtins
        real_open = builtins.open
        max_read = 0

        class Guard:
            def __init__(self, f):
                self._f = f
            def read(self, n=None):
                nonlocal max_read
                assert n is not None, "unbounded read() — reader must stream"
                max_read = max(max_read, n)
                return self._f.read(n)
            def __getattr__(self, a):
                return getattr(self._f, a)
            def __enter__(self):
                return self
            def __exit__(self, *a):
                return self._f.__exit__(*a)

        def guarded_open(p, *a, **k):
            f = real_open(p, *a, **k)
            return Guard(f) if str(p).endswith(".bag") else f

        monkeypatch.setattr(builtins, "open", guarded_open)
        got = list(rosbag.read_bag(path))
        assert len(got) == len(evs)
        import os
        assert max_read < os.path.getsize(path)  # no read covers the whole file
