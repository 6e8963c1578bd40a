"""Live streaming: protocol round-trip + an actual piped live run."""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from wildcat_slam_tpu.io import stream as ws


class TestProtocol:
    def test_roundtrip(self):
        buf = io.BytesIO()
        rng = np.random.default_rng(0)
        ws.write_imu(buf, 1.25, [0.1, 0.2, 9.8], [0.01, -0.02, 0.03])
        ts = np.sort(rng.uniform(1.2, 1.3, 50))
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        ws.write_scan(buf, ts, pts)
        ws.write_end(buf)
        buf.seek(0)
        evs = list(ws.read_stream(buf))
        assert len(evs) == 2
        kind, t, acc, gyr = evs[0]
        assert kind == "imu" and t == 1.25
        np.testing.assert_allclose(acc, [0.1, 0.2, 9.8])
        np.testing.assert_allclose(gyr, [0.01, -0.02, 0.03])
        kind, ts2, pts2 = evs[1]
        assert kind == "scan"
        np.testing.assert_allclose(ts2, ts, atol=1e-6)  # f32 offset precision
        np.testing.assert_allclose(pts2, pts)

    def test_truncated_stream_raises(self):
        buf = io.BytesIO()
        ws.write_imu(buf, 0.0, [0, 0, 9.8], [0, 0, 0])
        data = buf.getvalue()[:-4]
        with pytest.raises(EOFError):
            list(ws.read_stream(io.BytesIO(data)))

    def test_bad_magic_raises(self):
        with pytest.raises(ValueError, match="magic"):
            list(ws.read_stream(io.BytesIO(b"XXXX" + b"\0" * 16)))

    def test_eof_without_end_frame_terminates(self):
        buf = io.BytesIO()
        ws.write_imu(buf, 0.0, [0, 0, 9.8], [0, 0, 0])
        buf.seek(0)
        assert len(list(ws.read_stream(buf))) == 1

    def test_synthetic_producer_stream_matches_sequence(self):
        from wildcat_slam_tpu.io.synthetic import SyntheticSequence

        buf = io.BytesIO()
        ws.stream_synthetic(buf, duration=1.0, points_per_scan=500, seed=3,
                            realtime=False)
        buf.seek(0)
        evs = list(ws.read_stream(buf))
        seq = SyntheticSequence(duration=1.0, points_per_scan=500, room_half=5.0, seed=3)
        assert sum(1 for e in evs if e[0] == "imu") == len(seq.imu)
        assert sum(1 for e in evs if e[0] == "scan") == len(seq.scans)
        # events are interleaved in sensor-time order
        times = [e[1] if e[0] == "imu" else e[1][-1] for e in evs]
        assert all(a <= b + 1e-9 for a, b in zip(times, times[1:]))


class TestBoundedQueueReader:
    """Explicit overload policy (VERDICT round-3 item 4): drop-oldest per type,
    counted, producer order preserved — mirroring the reference's bounded ROS
    subscriber queues (wildcat_slam_node.cc:71-72)."""

    @staticmethod
    def _make_stream(n_imu=10, n_scan=4):
        buf = io.BytesIO()
        k = 0
        for i in range(max(n_imu, n_scan)):
            if i < n_imu:
                ws.write_imu(buf, 10.0 + k * 0.01, [float(i), 0, 9.8], [0, 0, 0])
                k += 1
            if i < n_scan:
                ts = 10.0 + k * 0.01 + np.arange(3) * 1e-4
                ws.write_scan(buf, ts, np.full((3, 3), float(i), np.float32))
                k += 1
        ws.write_end(buf)
        buf.seek(0)
        return buf

    def test_no_drops_under_capacity(self):
        buf = self._make_stream()
        expect = list(ws.read_stream(self._make_stream()))
        r = ws.BoundedQueueReader(buf, imu_queue=100, scan_queue=100)
        r.join(30)
        got = list(r)
        assert r.dropped == {"imu": 0, "scan": 0}
        assert len(got) == len(expect)
        # same events, same producer interleave
        for g, e in zip(got, expect):
            assert g[0] == e[0]
            np.testing.assert_allclose(np.atleast_1d(g[1]), np.atleast_1d(e[1]))

    def test_drop_oldest_counted(self):
        # reader drains fully before the consumer touches the queues (join):
        # with bounds 4/2 the oldest 6 IMU and 2 scans must be evicted
        r = ws.BoundedQueueReader(self._make_stream(n_imu=10, n_scan=4),
                                  imu_queue=4, scan_queue=2)
        r.join(30)
        got = list(r)
        assert r.dropped == {"imu": 6, "scan": 2}
        imus = [e for e in got if e[0] == "imu"]
        scans = [e for e in got if e[0] == "scan"]
        # the NEWEST survive
        assert [e[2][0] for e in imus] == [6.0, 7.0, 8.0, 9.0]
        assert [float(e[2][0, 0]) for e in scans] == [2.0, 3.0]
        # and the merged output is still time-ordered (drop-oldest never
        # reorders a time-ordered stream)
        times = [e[1] if e[0] == "imu" else e[1][0] for e in got]
        assert times == sorted(times)

    def test_zero_bound_is_unbounded_for_that_type(self):
        # a 0 bound disables the drop check for that queue only: with a tiny
        # IMU bound and scan_queue=0 every scan must survive any backlog while
        # IMU still drops oldest (the CLI passes the 0 through unchanged)
        r = ws.BoundedQueueReader(self._make_stream(n_imu=10, n_scan=4),
                                  imu_queue=4, scan_queue=0)
        r.join(30)
        got = list(r)
        assert r.dropped == {"imu": 6, "scan": 0}
        assert sum(1 for e in got if e[0] == "scan") == 4

    def test_truncated_source_error_surfaces_on_consumer(self):
        buf = io.BytesIO()
        ws.write_imu(buf, 1.0, [0, 0, 9.8], [0, 0, 0])
        raw = buf.getvalue()[:-3]  # cut mid-frame
        r = ws.BoundedQueueReader(io.BytesIO(raw), imu_queue=10, scan_queue=10)
        r.join(30)
        with pytest.raises(EOFError):
            list(r)


class TestLivePipe:
    def test_live_stream_end_to_end(self, tmp_path):
        """Producer paced at 4x | CLI --stream -: the real live deployment
        shape (the reference's online mode, wildcat_slam_node.cc:69-79)."""
        env = dict(os.environ)
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env["JAX_PLATFORMS"] = "cpu"
        traj = str(tmp_path / "live.tum")
        surf = str(tmp_path / "live.ply")
        prod = subprocess.Popen(
            [sys.executable, "-m", "wildcat_slam_tpu.io.stream",
             "--duration", "2.0", "--speed", "4", "--points-per-scan", "2500"],
            stdout=subprocess.PIPE, env=env)
        cons = subprocess.run(
            [sys.executable, "-m", "wildcat_slam_tpu.cli", "--stream", "-",
             "--device", "cpu", "--traj-out", traj,
             "--surfels-out", surf, "--snapshot-every", "2"],
            stdin=prod.stdout, capture_output=True, text=True, env=env,
            timeout=300)
        prod.wait(timeout=60)
        assert cons.returncode == 0, cons.stderr[-2000:]
        assert "live latency" in cons.stderr
        assert os.path.exists(traj)
        with open(traj) as f:
            n_poses = sum(1 for _ in f)
        assert n_poses >= 3
        snaps = [p for p in os.listdir(tmp_path) if p.startswith("live_")]
        assert snaps, "incremental surfel snapshots missing"
