"""Wall-basis A/B of the k-sweep chained dispatch (VERDICT r4 item 2).

Runs the shipped default config on the synthetic room at chunk_sweeps in
{1, K...} and reports steady-state WALL ms/sweep for each — the number a
user of this tunnel-attached environment actually gets for offline replay.
The chained path stages k host feeds and runs one lax.scan dispatch + one
packed fetch per k sweeps, so the per-dispatch RPC floor (~30 ms here,
MEASUREMENTS.md round 4) amortizes k-fold.

Usage: python benchmarks/chunked_bench.py [K ...] [--duration S]
       (default: K = 1 4 8, S = 60; K = 16 needs S >= 90 — the timed window
       is max(4K, 16) sweeps after a 20.5 s ramp plus one compile chunk)
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
    # Pipelined whole-chunk timing: flush ONCE at the first steady chunk
    # boundary (absorbs the chained-program compile and any ramp partial-chunk
    # padding), let the next C whole chunks pipeline with NO intermediate
    # flushes (async dispatch: host prep + h2d overlap device work — this is
    # how a real replay runs), then flush once at boundary 1 + C and stop.
    # Flushing every chunk serializes host -> h2d -> exec -> fetch and was
    # measured SLOWER than the pipelined per-dispatch path (47.8 vs 35.4
    # ms/sweep, r5 bench session) — the opposite of what chunking is for.
    t0 = t_last = None
    n0 = 0
    steady = False
    for ts, pl in seq.scans:
        while pending is not None and pending[0] <= ts[-1] + 0.01:
            lo.add_imu(*pending)
            pending = next(imu_iter, None)
        lo.add_scan(ts, pl)
        if not steady and ts[-1] > steady_from:
            _ = lo.trajectory  # flush ramp (and any partial chunk)
            steady = True
            n0 = lo.sweep_id
        if steady and t0 is None and lo.sweep_id - n0 >= max(chunk, 1):
            _ = lo.trajectory  # first boundary: chained compile lands here
            t0, n0 = time.perf_counter(), lo.sweep_id
        elif t0 is not None and lo.sweep_id - n0 >= max(4 * chunk, 16):
            _ = lo.trajectory  # single closing flush, >= 4 whole chunks later
            t_last = time.perf_counter()
            break
    n = lo.sweep_id - n0
    _ = lo.trajectory  # drain whatever remains (excluded from the timing)
    ate = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=False)
    if t_last is None:
        return float("nan"), 0, ate, lo.timing
    wall_ms = (t_last - t0) / n * 1e3
    return wall_ms, n, ate, lo.timing


if __name__ == "__main__":
    argv = sys.argv[1:]
    duration = 60.0
    if "--duration" in argv:
        i = argv.index("--duration")
        duration = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    ks = [int(a) for a in argv] or [1, 4, 8]
    cfg = WildcatConfig()
    for k in ks:
        wall_ms, n, ate, timing = run(k, duration=duration)
        rtf = cfg.sweep_duration * 1e3 / wall_ms
        print(f"chunk={k:2d}: wall {wall_ms:6.1f} ms/sweep = {rtf:5.1f}x "
              f"({n} steady sweeps, ATE {ate*1e3:.2f} mm) "
              f"timing prep={timing['prep']:.1f}s dispatch={timing['dispatch']:.1f}s "
              f"post={timing['post']:.1f}s", flush=True)
