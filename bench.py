"""End-of-round benchmark: real-time factor of the full odometry pipeline.

Runs the complete per-sweep window solve (IMU propagation, undistortion, surfel
extraction, matching, LM solve, state update, window trims — one jitted step)
at the SHIPPED DEFAULT config (65,536-point sweeps, 16k fixed / 8k sliding
surfel map, config.py defaults) on a synthetic sequence dense enough to fill it
(~64k points per 0.5 s sweep — Hesai-Pandar-class density), long enough (26 s)
to reach the fixed-window steady state (fixed_window_duration = 20 s, the
heaviest matching regime). Device: whatever JAX selects (driver provides TPU).

Metric: real-time factor = sweep duration (0.5 s of sensor data) / mean wall
time per sweep over the steady-state tail (t > 20.5 s), excluding compile. The
reference publishes no numbers (BASELINE.md); its implied bar is 1.0x (online
mode exists, wildcat_slam_node.cc:69-79), so vs_baseline is the factor itself.
Accuracy is reported alongside: ATE RMSE (m, unaligned) against the exact
synthetic ground truth. The warm-up factor (sweeps 2..n before steady state)
is reported as realtime_factor_rampup.

Prints exactly one JSON line.
"""

import json
import sys
import time


def main():
    import jax

    from wildcat_slam_tpu.config import WildcatConfig
    from wildcat_slam_tpu.io.synthetic import SyntheticSequence, ate_rmse
    from wildcat_slam_tpu.odometry.pipeline import LidarOdometry

    cfg = WildcatConfig()  # shipped defaults — production shapes
    seq = SyntheticSequence(duration=26.0, points_per_scan=12800, room_half=5.0, seed=0)
    lo = LidarOdometry(cfg)

    imu_iter = iter(seq.imu)
    pending = next(imu_iter, None)
    t_start = t_steady = None
    n_pre = 0
    steady_from = cfg.fixed_window_duration + cfg.sweep_duration
    for ts, pl in seq.scans:
        while pending is not None and pending[0] <= ts[-1] + 0.01:
            lo.add_imu(*pending)
            pending = next(imu_iter, None)
        lo.add_scan(ts, pl)
        if lo.sweep_id == 1 and t_start is None:
            _ = lo.trajectory  # flush so the compile sweep is excluded
            t_start = time.perf_counter()
        if t_steady is None and ts[-1] > steady_from:
            _ = lo.trajectory  # flush the ramp-up tail
            t_steady = time.perf_counter()
            n_pre = lo.sweep_id
    _ = lo.trajectory  # final flush blocks on all queued device work
    t_end = time.perf_counter()

    if t_steady is None or lo.sweep_id - n_pre < 4:
        print(json.dumps({"metric": "realtime_factor", "value": 0.0, "unit": "x",
                          "vs_baseline": 0.0, "error": "too few steady-state sweeps"}))
        return 1

    per_sweep = (t_end - t_steady) / (lo.sweep_id - n_pre)
    rtf = cfg.sweep_duration / per_sweep
    per_ramp = (t_steady - t_start) / max(n_pre - 1, 1)
    ate = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=False)

    print(json.dumps({
        "metric": "realtime_factor",
        "value": round(rtf, 3),
        "unit": "x",
        "vs_baseline": round(rtf, 3),
        "per_sweep_ms": round(per_sweep * 1000, 1),
        "sweeps": lo.sweep_id,
        "steady_sweeps": lo.sweep_id - n_pre,
        "realtime_factor_rampup": round(cfg.sweep_duration / per_ramp, 3),
        "points_per_sweep": 64000,
        "ate_rmse_m": round(ate, 5),
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
