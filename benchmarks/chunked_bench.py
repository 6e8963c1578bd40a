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


def run(chunk: int, duration: float = 60.0):
    cfg = WildcatConfig()
    seq = SyntheticSequence(duration=duration, points_per_scan=12800,
                            room_half=5.0, seed=0)
    lo = LidarOdometry(cfg, chunk_sweeps=chunk)
    imu_iter = iter(seq.imu)
    pending = next(imu_iter, None)
    steady_from = cfg.fixed_window_duration + cfg.sweep_duration
    # time only WHOLE-chunk intervals in the steady state: a flush mid-chunk
    # pads with up to k-1 noop solves, which a 20-sweep window cannot amortize
    # at k >= 16 (a real replay pays that padding exactly once, at the tail)
    t0 = t_last = None
    n0 = 0
    mark = None  # sweep_id at the last boundary stamp
    steady = False
    for ts, pl in seq.scans:
        while pending is not None and pending[0] <= ts[-1] + 0.01:
            lo.add_imu(*pending)
            pending = next(imu_iter, None)
        lo.add_scan(ts, pl)
        if not steady and ts[-1] > steady_from:
            _ = lo.trajectory  # flush ramp (and any partial chunk)
            steady = True
            mark = lo.sweep_id
        if steady and lo.sweep_id - mark >= max(chunk, 1):
            # a full chunk has been dispatched since the last mark: flush and
            # stamp the boundary (first boundary starts the clock — it carries
            # the chained-program compile at k > 1)
            _ = lo.trajectory
            mark = lo.sweep_id
            if t0 is None:
                t0, n0 = time.perf_counter(), lo.sweep_id
            else:
                t_last = time.perf_counter()
    _ = lo.trajectory  # full flush (tail padding excluded from the timing)
    ate = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=False)
    if t_last is None:
        return float("nan"), 0, ate, lo.timing
    n = mark - n0
    wall_ms = (t_last - t0) / n * 1e3
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
