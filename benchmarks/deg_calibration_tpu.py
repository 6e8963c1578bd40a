"""Degeneracy-signal calibration at the SHIPPED config on real TPU (VERDICT
r4 item 5) + remap A/B at the same regime.

The round-4 threshold table was CPU-x64 at a small config over 5 sweeps per
scene; this reruns the three calibration scenes at the shipped 64k config on
the chip and prints, per scene: per-sweep min/median of deg_trans_ratio /
deg_rot_ratio, the degenerate-flag count, and unaligned ATE with
degeneracy_remap off vs on.

Scenes (same as tests/test_regimes.py::test_degeneracy_signal_fires_on_weak_geometry):
  nominal   room seed 0        — must stay quiet (min ratio >= 0.15)
  corridor  ramp+doors 10 m    — deg_trans_ratio must collapse (< warn)
  cylinder  seed 2             — deg_rot_ratio must collapse (< warn)

Usage: python benchmarks/deg_calibration_tpu.py [duration=6.0]
"""
import sys

import numpy as np

from wildcat_slam_tpu.config import WildcatConfig
from wildcat_slam_tpu.io.synthetic import SyntheticSequence, ate_rmse
from wildcat_slam_tpu.odometry.pipeline import LidarOdometry


def _run(seq, cfg):
    lo = LidarOdometry(cfg)
    i_imu = 0
    for times, pts in seq.scans:
        while i_imu < len(seq.imu) and seq.imu[i_imu][0] <= times[-1] + 0.01:
            lo.add_imu(*seq.imu[i_imu])
            i_imu += 1
        lo.add_scan(times, pts)
    _ = lo.trajectory
    return lo


def main():
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    floors = {}  # scene -> (min deg_t, min deg_r), asserted below
    scenes = {
        "nominal room s0": dict(duration=dur, points_per_scan=12800, room_half=5.0,
                                seed=0),
        "doored corridor": dict(duration=dur, points_per_scan=12800, room_half=8.0,
                                seed=0, geometry="ramp", door_spacing=10.0),
        "cylinder s2": dict(duration=dur, points_per_scan=12800, room_half=5.0,
                            seed=2, geometry="cylinder"),
    }
    for name, kw in scenes.items():
        seq = SyntheticSequence(**kw)
        row = {}
        for remap in (False, True):
            cfg = WildcatConfig(degeneracy_remap=remap)
            lo = _run(seq, cfg)
            ate = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=False)
            row[remap] = (lo, ate)
        lo, ate_off = row[False]
        _, ate_on = row[True]
        rt = [s["deg_trans_ratio"] for s in lo.stats]
        rr = [s["deg_rot_ratio"] for s in lo.stats]
        ndeg = sum(1 for s in lo.stats if s["degenerate"])
        print(f"{name:16s}: sweeps={len(lo.stats)} "
              f"deg_t min/med {min(rt):.2e}/{np.median(rt):.3f} "
              f"deg_r min/med {min(rr):.2e}/{np.median(rr):.3f} "
              f"flagged={ndeg} ATE off/on {ate_off*1e3:.2f}/{ate_on*1e3:.2f} mm",
              flush=True)
        floors[name] = (min(rt), min(rr))

    # TPU-regime assertions (VERDICT r4 item 5): the shipped warn threshold
    # separates nominal from the physically weak axes AT THE SHIPPED CONFIG
    # on the chip, not just in the CPU small-config table (MEASUREMENTS r4).
    assert min(floors["nominal room s0"]) >= 0.15, floors
    assert floors["doored corridor"][0] < 0.15, floors   # translation opens
    assert floors["cylinder s2"][1] < 0.02, floors       # rotation collapses below warn
    print("assertions OK: nominal floor >= 0.15; corridor deg_t and "
          "cylinder deg_r open on the degenerate axes", flush=True)


if __name__ == "__main__":
    main()
