"""Steady-state wall/device attribution for the shipped-config pipeline.

Reports per-sweep: total wall, host prep / dispatch / post (from
LidarOdometry.timing), and the residual (device wait + scan feeding). Optionally
captures a jax.profiler device trace over a few steady-state sweeps.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/host_gap.py [trace_dir]
"""

import sys
import time


def main():
    import jax

    from wildcat_slam_tpu.config import WildcatConfig
    from wildcat_slam_tpu.io.synthetic import SyntheticSequence
    from wildcat_slam_tpu.odometry.pipeline import LidarOdometry

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else None

    cfg = WildcatConfig()
    seq = SyntheticSequence(duration=26.0, points_per_scan=12800, room_half=5.0, seed=0)
    lo = LidarOdometry(cfg)

    imu_iter = iter(seq.imu)
    pending = next(imu_iter, None)
    steady_from = cfg.fixed_window_duration + cfg.sweep_duration
    t_steady = None
    base = None
    tracing = False
    feed_t = 0.0
    for ts, pl in seq.scans:
        tf0 = time.perf_counter()
        while pending is not None and pending[0] <= ts[-1] + 0.01:
            lo.add_imu(*pending)
            pending = next(imu_iter, None)
        feed_t += time.perf_counter() - tf0
        lo.add_scan(ts, pl)
        if t_steady is None and ts[-1] > steady_from:
            _ = lo.trajectory
            t_steady = time.perf_counter()
            base = dict(lo.timing)
            base["feed"] = feed_t
            if trace_dir:
                jax.profiler.start_trace(trace_dir)
                tracing = True
    if tracing:
        _ = lo.trajectory
        jax.profiler.stop_trace()
    _ = lo.trajectory
    t_end = time.perf_counter()

    n = lo.timing["sweeps"] - base["sweeps"]
    wall = (t_end - t_steady) / n * 1e3
    prep = (lo.timing["prep"] - base["prep"]) / n * 1e3
    disp = (lo.timing["dispatch"] - base["dispatch"]) / n * 1e3
    post = (lo.timing["post"] - base["post"]) / n * 1e3
    feed = (feed_t - base["feed"]) / n * 1e3
    print(f"steady sweeps        : {n}")
    print(f"wall/sweep           : {wall:7.2f} ms")
    print(f"  host prep          : {prep:7.2f} ms")
    print(f"  dispatch (async)   : {disp:7.2f} ms")
    print(f"  post bookkeeping   : {post:7.2f} ms")
    print(f"  imu feed           : {feed:7.2f} ms")
    print(f"  residual (device wait + scan filter): {wall - prep - disp - post - feed:7.2f} ms")


if __name__ == "__main__":
    main()
