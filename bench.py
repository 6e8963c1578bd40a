"""End-of-round benchmark: real-time factor of the full odometry pipeline.

Runs the complete per-sweep window solve (IMU propagation, undistortion, surfel
extraction, matching, LM solve, state update, window trims — one jitted step)
on a synthetic lidar-inertial sequence at realistic density, on whatever device
JAX selects (the driver provides the TPU).

Metric: real-time factor = sweep duration (0.5 s of sensor data) / mean wall
time per sweep, excluding the first (compile) sweep. The reference publishes no
numbers (BASELINE.md); its implied bar is 1.0x (online mode exists,
wildcat_slam_node.cc:69-79), so vs_baseline is the factor itself. Accuracy is
reported alongside: ATE RMSE (m, unaligned) against the exact synthetic ground
truth.

Prints exactly one JSON line.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from wildcat_slam_tpu.config import WildcatConfig
    from wildcat_slam_tpu.io.synthetic import SyntheticSequence, ate_rmse
    from wildcat_slam_tpu.odometry.pipeline import LidarOdometry

    seq = SyntheticSequence(duration=8.0, points_per_scan=6000, room_half=5.0, seed=0)
    cfg = WildcatConfig(
        max_points_per_sweep=32768,
        max_surfels_per_sweep=1024,
        max_surfels_sliding=4096,
        max_surfels_fixed=8192,
        max_correspondences=4096,
        max_leaves_per_sweep=8192,
        inner_iter_num_max=30,
    )
    lo = LidarOdometry(cfg)

    imu_iter = iter(seq.imu)
    pending = next(imu_iter, None)
    t_start = None
    for ts, pl in seq.scans:
        while pending is not None and pending[0] <= ts[-1] + 0.01:
            lo.add_imu(*pending)
            pending = next(imu_iter, None)
        lo.add_scan(ts, pl)
        if lo.sweep_id == 1 and t_start is None:
            _ = lo.trajectory  # flush so the compile sweep is excluded
            t_start = time.perf_counter()
    _ = lo.trajectory  # final flush blocks on all queued device work

    if lo.sweep_id < 4 or t_start is None:
        print(json.dumps({"metric": "realtime_factor", "value": 0.0, "unit": "x", "vs_baseline": 0.0,
                          "error": "too few sweeps"}))
        return 1

    n_steady = lo.sweep_id - 1
    per_sweep = (time.perf_counter() - t_start) / n_steady
    rtf = cfg.sweep_duration / per_sweep
    ate = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=False)

    print(json.dumps({
        "metric": "realtime_factor",
        "value": round(rtf, 3),
        "unit": "x",
        "vs_baseline": round(rtf, 3),
        "per_sweep_ms": round(per_sweep * 1000, 1),
        "sweeps": lo.sweep_id,
        "ate_rmse_m": round(ate, 5),
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
