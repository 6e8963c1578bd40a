"""Rigid3 SE(3) type, checkpoint/resume, and batched-mesh parallel tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from wildcat_slam_tpu.ops import lie
from wildcat_slam_tpu.ops.se3 import Rigid3


class TestRigid3:
    def _rand(self, n=64, seed=0):
        rng = np.random.default_rng(seed)
        q = lie.exp_quat(jnp.asarray(rng.normal(size=(n, 3))))
        t = jnp.asarray(rng.normal(size=(n, 3)))
        return Rigid3(q, t)

    def test_compose_matches_matrix(self):
        a, b = self._rand(seed=1), self._rand(seed=2)
        c = a * b
        ma = np.asarray(a.matrix())
        mb = np.asarray(b.matrix())
        np.testing.assert_allclose(np.asarray(c.matrix()), ma @ mb, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(c.t), np.einsum("nij,nj->ni", ma, np.asarray(b.t)) + np.asarray(a.t), atol=1e-12)

    def test_inverse(self):
        a = self._rand(seed=3)
        e = a * a.inverse()
        np.testing.assert_allclose(np.asarray(e.t), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.abs(np.asarray(e.q[:, 0])), 1.0, atol=1e-12)

    def test_apply_roundtrip(self):
        a = self._rand(seed=4)
        p = jnp.asarray(np.random.default_rng(5).normal(size=(64, 3)))
        np.testing.assert_allclose(np.asarray(a.inverse().apply(a.apply(p))), np.asarray(p), atol=1e-12)

    def test_from_matrix(self):
        rng = np.random.default_rng(6)
        rv = rng.normal(size=(32, 3))
        m = R.from_rotvec(rv).as_matrix()
        t = rng.normal(size=(32, 3))
        a = Rigid3.from_matrix(jnp.asarray(m), jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(a.matrix()), m, atol=1e-9)

    def test_identity_translation_rotation(self):
        e = Rigid3.identity((4,), jnp.float64)
        p = jnp.ones((4, 3), jnp.float64)
        np.testing.assert_allclose(np.asarray(e.apply(p)), 1.0)
        tr = Rigid3.translation(p)
        np.testing.assert_allclose(np.asarray(tr.apply(p)), 2.0)


class TestCheckpoint:
    def test_save_load_resume(self, tmp_path):
        from wildcat_slam_tpu.config import WildcatConfig
        from wildcat_slam_tpu.io.synthetic import SyntheticSequence, ate_rmse
        from wildcat_slam_tpu.odometry import checkpoint
        from wildcat_slam_tpu.odometry.pipeline import LidarOdometry

        seq = SyntheticSequence(duration=2.2, points_per_scan=3000, room_half=4.0, seed=0)
        cfg = WildcatConfig(
            max_points_per_sweep=16384, max_surfels_per_sweep=512,
            max_surfels_sliding=2048, max_surfels_fixed=2048,
            max_correspondences=2048, max_leaves_per_sweep=4096,
            max_imu_states=640, max_sample_states=48, inner_iter_num_max=15,
        )

        def feed(lo, scans, imu_iter, pending):
            for ts, pl in scans:
                while pending is not None and pending[0] <= ts[-1] + 0.01:
                    lo.add_imu(*pending)
                    pending = next(imu_iter, None)
                lo.add_scan(ts, pl)
            return pending

        # run A: all scans straight through
        lo_full = LidarOdometry(cfg)
        it_full = iter(seq.imu)
        feed(lo_full, seq.scans, it_full, next(it_full, None))

        # run B: first half, checkpoint, resume, second half
        lo = LidarOdometry(cfg)
        it_b = iter(seq.imu)
        pending = feed(lo, seq.scans[:11], it_b, next(it_b, None))
        path = str(tmp_path / "ckpt.npz")
        checkpoint.save(path, lo)
        lo2 = checkpoint.load(path)
        assert lo2.sweep_id == lo.sweep_id
        feed(lo2, seq.scans[11:], it_b, pending)

        assert lo2.sweep_id == lo_full.sweep_id
        # resumed run must track the same trajectory as the uninterrupted one
        for (t1, p1, _), (t2, p2, _) in zip(lo_full.trajectory, lo2.trajectory):
            assert abs(t1 - t2) < 1e-9
            np.testing.assert_allclose(p1, p2, atol=1e-4)

    def test_load_migrates_pre_fix_geo_checkpoint(self, tmp_path):
        # checkpoints written before WindowState gained the fix_geo cache leaf
        # have one fewer state leaf; load() must migrate (recompute the derived
        # cache) instead of dying in tree_unflatten with a leaf-count error
        import json

        from wildcat_slam_tpu.config import WildcatConfig
        from wildcat_slam_tpu.io.synthetic import SyntheticSequence
        from wildcat_slam_tpu.odometry import checkpoint
        from wildcat_slam_tpu.odometry import factors as fmod
        from wildcat_slam_tpu.odometry.pipeline import LidarOdometry

        cfg = WildcatConfig(
            max_points_per_sweep=16384, max_surfels_per_sweep=512,
            max_surfels_sliding=2048, max_surfels_fixed=2048,
            max_correspondences=2048, max_leaves_per_sweep=4096,
            max_imu_states=640, max_sample_states=48, inner_iter_num_max=10,
        )
        seq = SyntheticSequence(duration=1.5, points_per_scan=2000, room_half=4.0)
        lo = LidarOdometry(cfg)
        i_imu = 0
        for ts, pl in seq.scans:
            while i_imu < len(seq.imu) and seq.imu[i_imu][0] <= ts[-1] + 0.01:
                lo.add_imu(*seq.imu[i_imu])
                i_imu += 1
            lo.add_scan(ts, pl)
        assert lo.sweep_id >= 1
        path = str(tmp_path / "new.npz")
        checkpoint.save(path, lo)

        # rewrite as the old format: drop the trailing fix_geo leaf
        d = dict(np.load(path, allow_pickle=False))
        meta = json.loads(str(d["__meta__"]))
        old_n = meta["n_leaves"] - 1
        del d[f"leaf_{old_n}"]
        meta["n_leaves"] = old_n
        d["__meta__"] = json.dumps(meta)
        old_path = str(tmp_path / "old.npz")
        np.savez_compressed(old_path, **d)

        lo2 = checkpoint.load(old_path)
        assert lo2.sweep_id == lo.sweep_id
        # the derived cache must be recomputed from the restored fixed window
        expect = fmod.pack_geo_rows(lo2.state.fix)
        np.testing.assert_allclose(np.asarray(lo2.state.fix_geo),
                                   np.asarray(expect), atol=0)

        # a genuinely wrong leaf count still fails loudly
        meta["n_leaves"] = old_n - 1
        del d[f"leaf_{old_n - 1}"]
        d["__meta__"] = json.dumps(meta)
        bad_path = str(tmp_path / "bad.npz")
        np.savez_compressed(bad_path, **d)
        with pytest.raises(ValueError, match="checkpoint format mismatch"):
            checkpoint.load(bad_path)

    def test_load_restores_feeder_kind(self, tmp_path):
        # a checkpoint written by a --native run must restore the native feeder
        # (round-1 weakness: load() silently downgraded to the numpy path)
        import pytest
        from wildcat_slam_tpu.config import WildcatConfig
        from wildcat_slam_tpu.odometry import checkpoint
        from wildcat_slam_tpu.odometry.pipeline import LidarOdometry, _NumpyPointBuffer

        cfg = WildcatConfig(max_points_per_sweep=2048, max_surfels_per_sweep=128,
                            max_surfels_sliding=256, max_surfels_fixed=256,
                            max_correspondences=256, max_leaves_per_sweep=512,
                            max_imu_states=256, max_sample_states=16)
        try:
            lo = LidarOdometry(cfg, use_native=True)
        except OSError:
            pytest.skip("native feeder library not built")
        lo.add_imu(0.0, [0, 0, 9.81], [0, 0, 0])
        path = str(tmp_path / "native.npz")
        checkpoint.save(path, lo)
        lo2 = checkpoint.load(path)
        assert lo2.use_native
        assert not isinstance(lo2.points, _NumpyPointBuffer)
        # explicit override wins
        lo3 = checkpoint.load(path, use_native=False)
        assert isinstance(lo3.points, _NumpyPointBuffer)


class TestParallelMesh:
    def test_batched_step_on_virtual_mesh(self):
        # exercised again by the driver via __graft_entry__.dryrun_multichip
        import __graft_entry__

        n = min(8, len(jax.devices()))
        __graft_entry__.dryrun_multichip(n)
