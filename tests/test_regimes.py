"""Validation regimes beyond the nominal room: non-planar / non-axis-aligned
geometry, aggressive rotation, large world coordinates, and sustained travel.

The reference was only ever demonstrated on nominal indoor Hilti sequences
(SURVEY.md §4); these regimes probe the failure modes a fixed-capacity,
f32-device, voxel-keyed rebuild could add — curved walls vs plane fitting,
inclined planes vs axis-aligned voxel grids, high angular rate vs the 12.5 Hz
sample spline, and far-from-origin coordinates vs the 20-bit packed voxel keys
(ops/voxel.py:16-18). Empirical bounds are asserted at ~3x the measured values
(MEASUREMENTS.md, round 2); a regression past one of these is a real behavior
change, not noise.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from wildcat_slam_tpu.config import WildcatConfig
from wildcat_slam_tpu.io.synthetic import SyntheticSequence, ate_rmse
from wildcat_slam_tpu.odometry.pipeline import LidarOdometry
from wildcat_slam_tpu.ops import voxel


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


def _run(seq, cfg):
    lo = LidarOdometry(cfg)
    it = iter(seq.imu)
    pending = next(it, None)
    for ts, pl in seq.scans:
        while pending is not None and pending[0] <= ts[-1] + 0.01:
            lo.add_imu(*pending)
            pending = next(it, None)
        lo.add_scan(ts, pl)
    return lo


class TestVoxelKeysFarFromOrigin:
    """voxel.py:16-18 claims ±104 km at the finest 0.2 m cells — verify the
    packing really is collision-free and order-preserving at extreme coords."""

    def test_extreme_coords_unique(self):
        # cells at ±520 m (the sliding-window claim), ±100 km, and the packing
        # limits; neighbors along each axis must map to distinct (hi, lo) keys
        rng = np.random.default_rng(0)
        bases = np.array(
            [
                [0, 0, 0],
                [2600, -2600, 2600],        # ±520 m at 0.2 m cells
                [500_000, -500_000, 1],     # ±100 km
                [(1 << 19) - 3, -(1 << 19) + 2, (1 << 19) - 3],  # packing limit
            ],
            np.int32,
        )
        offs = rng.integers(-1, 2, size=(64, 3)).astype(np.int32)
        cells = (bases[:, None, :] + offs[None, :, :]).reshape(-1, 3)
        cells = np.clip(cells, -(1 << 19), (1 << 19) - 1)
        hi, lo = voxel.split_keys(jnp.asarray(cells))
        packed = set(zip(np.asarray(hi).tolist(), np.asarray(lo).tolist()))
        uniq = {tuple(c) for c in cells.tolist()}
        assert len(packed) == len(uniq)

    def test_lexicographic_order_preserved(self):
        # sorting by (hi, lo) must equal sorting by (x, y, z) — the extraction
        # relies on equal cells being contiguous after the two-key sort
        rng = np.random.default_rng(1)
        cells = rng.integers(-(1 << 19), 1 << 19, size=(512, 3)).astype(np.int32)
        hi, lo = voxel.split_keys(jnp.asarray(cells))
        hi, lo = np.asarray(hi).astype(np.int64), np.asarray(lo).astype(np.int64)
        key64 = (hi << 30) | lo
        order_keys = np.argsort(key64, kind="stable")
        c = cells.astype(np.int64) + (1 << 19)
        order_cells = np.argsort((c[:, 0] << 40) | (c[:, 1] << 20) | c[:, 2], kind="stable")
        np.testing.assert_array_equal(order_keys, order_cells)


class TestGeometryRegimes:
    def test_cylinder_room(self):
        # curved walls: surfel planes are only locally valid — plane-likeness
        # gating must keep enough good patches to track (measured ~4 mm)
        seq = SyntheticSequence(
            duration=2.5, points_per_scan=3000, room_half=5.0, seed=0, geometry="cylinder"
        )
        lo = _run(seq, _small_cfg())
        err = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=False)
        assert err < 0.03, f"cylinder ATE {err}"
        assert int(lo.stats[-1]["n_new_surfels"]) > 30

    def test_ramp_corridor_with_doors(self):
        # corridor with a 15% inclined floor and doorway bulkheads:
        # non-axis-aligned planes, full observability (the door cross-walls
        # break the corridor's translational symmetry)
        seq = SyntheticSequence(
            duration=2.5, points_per_scan=3000, room_half=8.0, seed=0,
            geometry="ramp", door_spacing=10.0,
        )
        lo = _run(seq, _small_cfg())
        err = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=False)
        assert err < 0.08, f"ramp ATE {err}"
        assert all(np.isfinite(float(s["final_cost"])) for s in lo.stats)

    def test_bare_ramp_drift_is_pure_gauge(self):
        # the bare corridor has a continuous translational symmetry along the
        # slope direction d=(1,0,0.15)/|.|: every plane normal is orthogonal to
        # d, so lidar fundamentally cannot observe motion along it (classic
        # corridor degeneracy — the reference would drift identically). The
        # validation: error ALONG d may drift, error PERPENDICULAR to d must
        # stay at nominal-room levels.
        seq = SyntheticSequence(
            duration=2.5, points_per_scan=3000, room_half=8.0, seed=0, geometry="ramp"
        )
        lo = _run(seq, _small_cfg())
        d = np.array([1.0, 0.0, 0.15])
        d /= np.linalg.norm(d)
        errs = [np.asarray(p) - seq.gt_pose(t)[0] for t, p, _ in lo.trajectory]
        perp = [np.linalg.norm(e - (e @ d) * d) for e in errs]
        assert max(perp) < 0.03, f"perpendicular error {max(perp)} — not pure gauge drift"

    def test_degeneracy_signal_fires_on_weak_geometry(self):
        """The health signal (factors.direction_coverage; VERDICT round-3 item
        1) must FIRE on the known-weak scenes and stay quiet on nominal rooms.

        Measured separation (MEASUREMENTS.md round 4, CPU x64 and TPU agree):
        nominal rooms hold min(deg_t, deg_r) >= 0.40 on every sweep; the
        doored corridor opens at deg_trans_ratio ~ 1e-4 (no cross-wall in view
        yet); the cylinder opens at deg_rot_ratio ~ 8e-4 (yaw about the
        symmetry axis unobserved). The default warn threshold 0.02 sits two
        orders under nominal and above the weak scenes' openings."""
        cfg = _small_cfg()
        warn = cfg.degeneracy_warn_ratio
        assert warn > 0

        # nominal room: quiet on every sweep, with margin over the threshold
        seq = SyntheticSequence(duration=2.5, points_per_scan=3000, room_half=5.0, seed=0)
        lo = _run(seq, cfg)
        assert len(lo.stats) >= 4
        for s in lo.stats:
            assert not s["degenerate"]
            assert min(s["deg_trans_ratio"], s["deg_rot_ratio"]) > 0.15, s

        # sparse-door corridor: the translation ratio collapses along the
        # corridor axis before the first door comes into view
        seq = SyntheticSequence(duration=2.5, points_per_scan=3000, room_half=8.0,
                                seed=0, geometry="ramp", door_spacing=10.0)
        lo = _run(seq, cfg)
        ratios_t = [s["deg_trans_ratio"] for s in lo.stats]
        assert min(ratios_t) < warn, ratios_t
        assert any(s["degenerate"] for s in lo.stats)

        # cylinder (seed 2 — the ~100 mm observability-floor scene from the
        # precision study): rotation about the symmetry axis is unobserved
        seq = SyntheticSequence(duration=2.5, points_per_scan=3000, room_half=5.0,
                                seed=2, geometry="cylinder")
        lo = _run(seq, cfg)
        ratios_r = [s["deg_rot_ratio"] for s in lo.stats]
        assert min(ratios_r) < warn, ratios_r
        assert any(s["degenerate"] for s in lo.stats)

    def test_degeneracy_remap_acts_on_weak_geometry(self):
        """Round-5: ACT on the health signal (factors.degeneracy_projectors +
        solver remap_step), not just report it. A/B contract (VERDICT r4
        item 1):

        - nominal room: remap on == remap off BIT-FOR-BIT (the projectors are
          exact zeros when no direction is weak);
        - cylinder seed 2 (the ~100 mm observability-floor scene): suppressing
          the common-mode yaw random-walk about the symmetry axis must cut the
          unaligned ATE well below the floor (measured 39.3 -> 3.8 mm on CPU
          x64; asserted at 3x margin);
        - bare ramp: perpendicular error unchanged, along-axis drift no worse
          (the along-axis estimate dead-reckons on IMU either way; measured
          104.13 vs 104.14 mm)."""
        cfg_off = _small_cfg()
        cfg_on = _small_cfg(degeneracy_remap=True)

        # nominal room: bit-for-bit inert
        seq = SyntheticSequence(duration=2.5, points_per_scan=3000, room_half=5.0, seed=0)
        tr_off = _run(seq, cfg_off).trajectory
        tr_on = _run(seq, cfg_on).trajectory
        assert len(tr_on) == len(tr_off) >= 4
        for (t1, p1, q1), (t2, p2, q2) in zip(tr_off, tr_on):
            np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
            np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))

        # cylinder seed 2: the remap must beat the observability floor
        seq = SyntheticSequence(duration=2.5, points_per_scan=3000, room_half=5.0,
                                seed=2, geometry="cylinder")
        ate_off = ate_rmse(_run(seq, cfg_off).trajectory,
                           lambda t: seq.gt_pose(t)[0], align=False)
        ate_on = ate_rmse(_run(seq, cfg_on).trajectory,
                          lambda t: seq.gt_pose(t)[0], align=False)
        assert ate_on < 0.012, f"cylinder remap ATE {ate_on} (off: {ate_off})"
        assert ate_on < 0.5 * ate_off, f"remap did not help: {ate_on} vs {ate_off}"

        # bare ramp: perpendicular unchanged, along-axis no worse
        seq = SyntheticSequence(duration=2.5, points_per_scan=3000, room_half=8.0,
                                seed=0, geometry="ramp")
        lo_off, lo_on = _run(seq, cfg_off), _run(seq, cfg_on)
        d = np.array([1.0, 0.0, 0.15])
        d /= np.linalg.norm(d)

        def split_err(lo):
            errs = [np.asarray(p) - seq.gt_pose(t)[0] for t, p, _ in lo.trajectory]
            perp = max(np.linalg.norm(e - (e @ d) * d) for e in errs)
            along = max(abs(e @ d) for e in errs)
            return perp, along

        perp_off, along_off = split_err(lo_off)
        perp_on, along_on = split_err(lo_on)
        assert perp_on < 0.03, f"remap broke perpendicular tracking: {perp_on}"
        assert perp_on < perp_off + 0.003
        assert along_on < along_off * 1.1 + 0.003, (along_on, along_off)

    def test_fast_rotation(self):
        # rot_scale=3: peak body rate ~110 deg/s — undistortion + the 12.5 Hz
        # sample spline must keep up (measured ~10 mm)
        seq = SyntheticSequence(
            duration=2.5, points_per_scan=3000, room_half=4.0, seed=0, rot_scale=3.0
        )
        lo = _run(seq, _small_cfg())
        err = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=False)
        assert err < 0.05, f"fast-rotation ATE {err}"

    def test_world_offset_origin(self):
        # ground truth offset hundreds of meters: the pipeline anchors its own
        # world frame at the initial pose, so the aligned ATE must be unchanged
        seq = SyntheticSequence(
            duration=2.0, points_per_scan=3000, room_half=4.0, seed=0,
            origin=(400.0, -380.0, 60.0),
        )
        lo = _run(seq, _small_cfg())
        err = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=True)
        assert err < 0.02, f"offset-origin aligned ATE {err}"

    def test_travel_covers_distance(self):
        # sustained 1.5 m/s travel up the doored ramp: world coordinates
        # move away from the voxel origin while tracking continues
        seq = SyntheticSequence(
            duration=4.0, points_per_scan=3000, room_half=8.0, seed=0,
            geometry="ramp", travel=1.5, door_spacing=10.0,
        )
        # 4 s of growing window needs 800+ IMU states (200 Hz)
        lo = _run(seq, _small_cfg(max_imu_states=1024, max_sample_states=64))
        t_end, p_end, _ = lo.trajectory[-1]
        gt_end = seq.gt_pose(t_end)[0]
        assert gt_end[0] > 3.0  # actually traveled
        assert np.linalg.norm(p_end - gt_end) < 0.1, f"travel end error {p_end - gt_end}"
