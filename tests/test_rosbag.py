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
