"""Wall-basis A/B of the k-sweep chained dispatch (VERDICT r4 item 2).

Runs the shipped default config on the synthetic room at chunk_sweeps in
{1, K...} and reports steady-state WALL ms/sweep for each — the number a
user of this tunnel-attached environment actually gets for offline replay.
The chained path stages k host feeds and runs one lax.scan dispatch + one
packed fetch per k sweeps, so the per-dispatch RPC floor (~30 ms here,
MEASUREMENTS.md round 4) amortizes k-fold.

Usage: python benchmarks/chunked_bench.py [K ...]   (default: 1 4 8)
"""
import sys
import time

from wildcat_slam_tpu.config import WildcatConfig
from wildcat_slam_tpu.io.synthetic import SyntheticSequence, ate_rmse
from wildcat_slam_tpu.odometry.pipeline import LidarOdometry


def run(chunk: int, duration: float = 30.0):
    cfg = WildcatConfig()
    seq = SyntheticSequence(duration=duration, points_per_scan=12800,
                            room_half=5.0, seed=0)
    lo = LidarOdometry(cfg, chunk_sweeps=chunk)
    imu_iter = iter(seq.imu)
    pending = next(imu_iter, None)
    steady_from = cfg.fixed_window_duration + cfg.sweep_duration
    t_steady = None
    n_pre = 0
    for ts, pl in seq.scans:
        while pending is not None and pending[0] <= ts[-1] + 0.01:
            lo.add_imu(*pending)
            pending = next(imu_iter, None)
        lo.add_scan(ts, pl)
        if t_steady is None and ts[-1] > steady_from:
            _ = lo.trajectory  # flush ramp (and any partial chunk)
            t_steady = time.perf_counter()
            n_pre = lo.sweep_id
    _ = lo.trajectory  # full flush: all chunks dispatched + fetched
    t_end = time.perf_counter()
    n = lo.sweep_id - n_pre
    ate = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=False)
    wall_ms = (t_end - t_steady) / n * 1e3
    return wall_ms, n, ate, lo.timing


if __name__ == "__main__":
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 8]
    cfg = WildcatConfig()
    for k in ks:
        wall_ms, n, ate, timing = run(k)
        rtf = cfg.sweep_duration * 1e3 / wall_ms
        print(f"chunk={k:2d}: wall {wall_ms:6.1f} ms/sweep = {rtf:5.1f}x "
              f"({n} steady sweeps, ATE {ate*1e3:.2f} mm) "
              f"timing prep={timing['prep']:.1f}s dispatch={timing['dispatch']:.1f}s "
              f"post={timing['post']:.1f}s", flush=True)
