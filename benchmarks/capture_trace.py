"""Capture a steady-state jax.profiler trace of the shipped-config pipeline.

Standalone companion to trace_budget.py / trace_ops.py (rounds 3-4 captured
through bench.py's embedded trace window; this decouples capture from the
bench so device-arc work can iterate without re-running the wall phases).

Usage: python benchmarks/capture_trace.py OUTDIR [n_sweeps=12] [duration=32]
Prints the path of the .trace.json.gz inside OUTDIR when done.
"""
import glob
import os
import sys
import time


def main():
    import jax

    from wildcat_slam_tpu.config import WildcatConfig
    from wildcat_slam_tpu.io.synthetic import SyntheticSequence
    from wildcat_slam_tpu.odometry.pipeline import LidarOdometry

    outdir = sys.argv[1]
    n_trace = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    duration = float(sys.argv[3]) if len(sys.argv) > 3 else 32.0
    os.makedirs(outdir, exist_ok=True)

    cfg = WildcatConfig()
    seq = SyntheticSequence(duration=duration, points_per_scan=12800,
                            room_half=5.0, seed=0)
    lo = LidarOdometry(cfg)
    imu_iter = iter(seq.imu)
    pending = next(imu_iter, None)
    steady_from = cfg.fixed_window_duration + cfg.sweep_duration
    tracing = done = False
    n0 = 0
    t0 = time.perf_counter()
    for ts, pl in seq.scans:
        while pending is not None and pending[0] <= ts[-1] + 0.01:
            lo.add_imu(*pending)
            pending = next(imu_iter, None)
        lo.add_scan(ts, pl)
        if not tracing and not done and ts[-1] > steady_from:
            _ = lo.trajectory  # flush ramp before opening the trace window
            jax.profiler.start_trace(outdir)
            tracing, n0 = True, lo.sweep_id
        if tracing and lo.sweep_id - n0 >= n_trace:
            _ = lo.trajectory
            jax.profiler.stop_trace()
            tracing, done = False, True
            break
    if tracing:
        _ = lo.trajectory
        jax.profiler.stop_trace()
    paths = glob.glob(os.path.join(outdir, "plugins/profile/*/*.trace.json.gz"))
    print(f"captured {lo.sweep_id - n0 if done else 0} sweeps in "
          f"{time.perf_counter() - t0:.0f}s -> {paths[0] if paths else 'NO TRACE'}")


if __name__ == "__main__":
    main()
