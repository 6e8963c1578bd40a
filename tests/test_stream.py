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
