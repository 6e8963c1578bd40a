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


def _events(seq):
    evs, i_imu = [], 0
    for times, pts in seq.scans:
        while i_imu < len(seq.imu) and seq.imu[i_imu][0] <= times[-1] + 0.01:
            evs.append(("imu", *seq.imu[i_imu]))
            i_imu += 1
        evs.append(("scan", times, pts))
    return evs


def _feed(bo, i, evs):
    for ev in evs:
        if ev[0] == "imu":
            bo.add_imu(i, ev[1], ev[2], ev[3])
        else:
            bo.add_scan(i, ev[1], ev[2])


@pytest.mark.full
def test_batch_checkpoint_resume(tmp_path):
    # save mid-run -> load -> continue must equal the uninterrupted batch run
    # (VERDICT r4 item 7: per-window checkpoint/resume for BatchedOdometry)
    from wildcat_slam_tpu.odometry import checkpoint
    from wildcat_slam_tpu.parallel.batch import BatchedOdometry

    cfg = _small_cfg()
    seqs = [SyntheticSequence(duration=3.0, points_per_scan=1500, room_half=5.0, seed=0),
            SyntheticSequence(duration=3.0, points_per_scan=1500, room_half=5.0, seed=1)]
    evs = [_events(s) for s in seqs]

    ref = BatchedOdometry(cfg, batch=2)
    for i, e in enumerate(evs):
        _feed(ref, i, e)
        ref.pump()
    ref.finish()
    assert all(len(t) >= 4 for t in ref.trajectories)

    cut = [int(len(e) * 0.6) for e in evs]
    bo1 = BatchedOdometry(cfg, batch=2)
    for i, e in enumerate(evs):
        _feed(bo1, i, e[:cut[i]])
    bo1.pump()
    assert all(w.sweep_id >= 1 for w in bo1.windows)  # mid-run, not trivial
    paths = checkpoint.save_batch(str(tmp_path / "bk.npz"), bo1)
    assert paths == [str(tmp_path / f"bk.w{i}.npz") for i in range(2)]

    bo2 = checkpoint.load_batch(paths)
    assert bo2._initialized
    assert [w.sweep_id for w in bo2.windows] == [w.sweep_id for w in bo1.windows]
    for i, e in enumerate(evs):
        _feed(bo2, i, e[cut[i]:])
        bo2.pump()
    bo2.finish()

    for tr_ref, tr_got in zip(ref.trajectories, bo2.trajectories):
        assert len(tr_got) == len(tr_ref)
        for (t1, p1, q1), (t2, p2, q2) in zip(tr_ref, tr_got):
            assert abs(t1 - t2) < 1e-9
            np.testing.assert_allclose(p2, p1, atol=1e-4)
            np.testing.assert_allclose(q2, q1, atol=1e-4)

    # each per-window file is ALSO a valid single-window checkpoint
    lo = checkpoint.load(paths[1])
    assert lo.sweep_id == bo1.windows[1].sweep_id


def test_load_batch_rejects_mixed_init(tmp_path):
    from wildcat_slam_tpu.odometry import checkpoint
    from wildcat_slam_tpu.parallel.batch import BatchedOdometry

    cfg = _small_cfg()
    seq = SyntheticSequence(duration=1.8, points_per_scan=1200, room_half=5.0, seed=0)
    bo = BatchedOdometry(cfg, batch=2)
    _feed(bo, 0, _events(seq))
    # window 1 never gets data: pump can't init (lockstep), both stay host-only
    assert bo.pump() == 0
    p_cold = str(tmp_path / "cold.npz")
    checkpoint.save(p_cold, bo.windows[1])

    _feed(bo, 1, _events(SyntheticSequence(duration=1.8, points_per_scan=1200,
                                           room_half=5.0, seed=1)))
    bo.pump()
    assert bo.windows[0].sweep_id >= 1
    import jax

    p_warm = str(tmp_path / "warm.npz")
    ws = jax.device_get(bo.state)
    bo.windows[0].state = jax.tree_util.tree_map(lambda x: x[0], ws)
    checkpoint.save(p_warm, bo.windows[0])

    with pytest.raises(ValueError, match="mixed window init"):
        checkpoint.load_batch([p_warm, p_cold])


@pytest.mark.full
def test_cli_batch_checkpoint_resume_roundtrip(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    srcs = "synthetic:2.6:room:0,synthetic:2.6:room:1"
    ck = str(tmp_path / "ck.npz")
    r1 = subprocess.run(
        [sys.executable, "-m", "wildcat_slam_tpu.cli", "--batch", srcs,
         "--device", "cpu", "--max-sweeps", "2", "--checkpoint-out", ck],
        capture_output=True, text=True, env=env, timeout=900)
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "state checkpoints ->" in r1.stderr
    for i in range(2):
        assert os.path.exists(str(tmp_path / f"ck.w{i}.npz"))

    # resume from the same sources: consumed events drop-and-count, the run
    # continues past sweep 2; --verbose exercises the per-window stats lines
    traj = str(tmp_path / "r.tum")
    r2 = subprocess.run(
        [sys.executable, "-m", "wildcat_slam_tpu.cli", "--batch", srcs,
         "--device", "cpu", "--resume", ck, "--traj-out", traj, "--verbose"],
        capture_output=True, text=True, env=env, timeout=900)
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "this run" in r2.stderr
    assert "dropped out-of-order" in r2.stderr
    assert "w0 sweep 3:" in r2.stderr  # verbose numbering continues post-resume
    for i in range(2):
        p = str(tmp_path / f"r_w{i}.tum")
        assert os.path.exists(p), r2.stderr[-1000:]
        assert sum(1 for _ in open(p)) >= 3  # past the pre-checkpoint 2 sweeps


def test_batch_size_must_divide_mesh():
    from wildcat_slam_tpu.parallel.batch import BatchedOdometry

    with pytest.raises(ValueError, match="multiple of the mesh size"):
        BatchedOdometry(_small_cfg(), batch=3, n_devices=2)
