"""Multi-window batch driver (parallel/batch.py): per-window results must
match independent single-window runs, tails must drain via no-op lockstep
feeds, and the CLI --batch surface must work end to end."""

import os
import subprocess
import sys

import numpy as np
import pytest

from wildcat_slam_tpu.config import WildcatConfig
from wildcat_slam_tpu.odometry.pipeline import LidarOdometry
from wildcat_slam_tpu.io.synthetic import SyntheticSequence


def _small_cfg():
    # the small-capacity config used across pipeline tests: fast to compile
    return WildcatConfig(
        max_points_per_sweep=16384, max_surfels_per_sweep=512,
        max_surfels_sliding=2048, max_surfels_fixed=2048,
        max_correspondences=2048, max_leaves_per_sweep=4096,
        # sliding_window_duration is 6 s: nothing trims within these short
        # sequences, so the IMU window must hold the whole segment
        max_imu_states=1024, max_sample_states=64,
        inner_iter_num_max=25,
    )


def _feed_single(cfg, seq):
    lo = LidarOdometry(cfg)
    i_imu = 0
    for times, pts in seq.scans:
        while i_imu < len(seq.imu) and seq.imu[i_imu][0] <= times[-1] + 0.01:
            lo.add_imu(*seq.imu[i_imu])
            i_imu += 1
        lo.add_scan(times, pts)
    return lo


@pytest.mark.full
def test_batched_matches_single_windows_and_drains_tails():
    from wildcat_slam_tpu.parallel.batch import BatchedOdometry

    cfg = _small_cfg()
    # different seeds AND different lengths: window 0 exhausts first, so the
    # final rounds feed it no-ops while window 1 keeps solving real sweeps
    seqs = [SyntheticSequence(duration=2.5, points_per_scan=1500, room_half=5.0, seed=0),
            SyntheticSequence(duration=3.5, points_per_scan=1500, room_half=5.0, seed=1)]

    singles = [_feed_single(cfg, s) for s in seqs]
    refs = [lo.trajectory for lo in singles]
    assert len(refs[0]) >= 4 and len(refs[1]) > len(refs[0])

    bo = BatchedOdometry(cfg, batch=2)
    assert bo.mesh.devices.size == 2  # auto mesh: largest divisor of batch
    for i, s in enumerate(seqs):
        i_imu = 0
        for times, pts in s.scans:
            while i_imu < len(s.imu) and s.imu[i_imu][0] <= times[-1] + 0.01:
                bo.add_imu(i, *s.imu[i_imu])
                i_imu += 1
            bo.add_scan(i, times, pts)
        # interleaved pump: steps happen while both windows are ready
        bo.pump()
    bo.finish()

    for ref, got in zip(refs, bo.trajectories):
        assert len(got) == len(ref)
        for (tr, pr, qr), (tg, pg, qg) in zip(ref, got):
            assert abs(tr - tg) < 1e-9
            # same program per window (shard_map runs the unbatched step), so
            # results agree to float noise from layout/fusion differences
            np.testing.assert_allclose(pg, pr, atol=1e-4)
            np.testing.assert_allclose(qg, qr, atol=1e-4)

    # no-op drain rounds must not fabricate sweeps for the exhausted window
    assert bo.windows[0].sweep_id == len(refs[0])
    assert bo.windows[1].sweep_id == len(refs[1])
    # per-window stats flow through the shared commit path
    assert all(len(s) == w.sweep_id for s, w in zip(bo.stats, bo.windows))


@pytest.mark.full
def test_cli_batch_end_to_end(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    traj = str(tmp_path / "b.tum")
    r = subprocess.run(
        [sys.executable, "-m", "wildcat_slam_tpu.cli",
         "--batch", "synthetic:2.2:room:0,synthetic:2.2:room:1",
         "--device", "cpu", "--traj-out", traj, "--max-sweeps", "2"],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "batch: 2 windows over a 2-device mesh" in r.stderr
    for i in range(2):
        p = str(tmp_path / f"b_w{i}.tum")
        assert os.path.exists(p), r.stderr[-1000:]
        assert sum(1 for _ in open(p)) >= 2


@pytest.mark.full
def test_cli_batch_dataset_dir_sources(tmp_path):
    # directory sources are iterABLES whose __iter__ restarts from scan 0;
    # the batch driver must hold a persistent iterator per source or the
    # second feed round re-feeds scan 0 and trips the time-order contract
    # (round-4 advisor finding)
    from wildcat_slam_tpu.io.dataset import from_synthetic

    dirs = []
    for seed in (0, 1):
        seq = SyntheticSequence(duration=2.2, points_per_scan=1500,
                                room_half=5.0, seed=seed)
        d = str(tmp_path / f"seq{seed}")
        from_synthetic(seq, d)
        dirs.append(d)

    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    traj = str(tmp_path / "d.tum")
    r = subprocess.run(
        [sys.executable, "-m", "wildcat_slam_tpu.cli",
         "--batch", ",".join(dirs),
         "--device", "cpu", "--traj-out", traj, "--max-sweeps", "2"],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    for i in range(2):
        p = str(tmp_path / f"d_w{i}.tum")
        assert os.path.exists(p), r.stderr[-1000:]
        assert sum(1 for _ in open(p)) >= 2


def test_batch_size_must_divide_mesh():
    from wildcat_slam_tpu.parallel.batch import BatchedOdometry

    with pytest.raises(ValueError, match="multiple of the mesh size"):
        BatchedOdometry(_small_cfg(), batch=3, n_devices=2)
