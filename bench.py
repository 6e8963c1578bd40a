"""End-of-round benchmark: real-time factor of the full odometry pipeline.

Runs the complete per-sweep window solve (IMU propagation, undistortion, surfel
extraction, matching, LM solve, state update, window trims — one jitted step)
at the SHIPPED DEFAULT config (65,536-point sweeps, 16k fixed / 8k sliding
surfel map, config.py defaults) on a synthetic sequence dense enough to fill it
(~64k points per 0.5 s sweep — Hesai-Pandar-class density), long enough (30 s)
to reach the fixed-window steady state (fixed_window_duration = 20 s, the
heaviest matching regime). Device: whatever JAX selects (driver provides TPU).

Metric basis — device envelope. This environment reaches its TPU through a
network tunnel whose per-execute RPC overhead varies 10-50 ms/sweep run to run
(MEASUREMENTS.md round 3: identical code measured at 48.6 / 64.4 / 83.7 ms
wall with the device program steady at ~36 ms). The deployable number is the
steady-state on-device program time (jit_process_sweep envelope, captured with
jax.profiler over 6 steady sweeps): on a locally-attached TPU the ~7 ms of
host work overlaps the device step and dispatch is microseconds, so wall ~=
device. The JSON line reports BOTH: ``value`` = device-basis real-time factor,
``wall_rtf``/``wall_per_sweep_ms`` = this run's tunnel-afflicted wall numbers,
``tunnel_overhead_ms`` = their difference.

Accuracy is reported alongside: ATE RMSE (m, unaligned) against the exact
synthetic ground truth. The reference publishes no numbers (BASELINE.md); its
implied bar is 1.0x real-time (online mode exists, wildcat_slam_node.cc:69-79).

Prints exactly one JSON line. ``--r01-regime`` reruns the round-1 bench
configuration (32k-point capacities, 6000 points/scan, 8 s) at current HEAD —
the cross-round continuity row MEASUREMENTS.md records once per round so the
headline numbers stay comparable across rounds whatever the tunnel does.
"""

import glob
import gzip
import json
import os
import sys
import tempfile
import time


def _device_ms_per_sweep(trace_dir: str):
    """Mean jit_process_sweep device envelope from a profiler trace."""
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return None, 0
    with gzip.open(paths[0]) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])
    tpu_pids = {e["pid"] for e in ev if e.get("ph") == "M"
                and e.get("name") == "process_name" and "TPU" in e["args"].get("name", "")}
    durs = [e["dur"] for e in ev if e.get("ph") == "X" and e.get("pid") in tpu_pids
            and e["name"].startswith("jit_process_sweep")]
    if not durs:
        return None, 0
    return sum(durs) / len(durs) / 1e3, len(durs)


def main():
    import jax

    from wildcat_slam_tpu.config import WildcatConfig
    from wildcat_slam_tpu.io.synthetic import SyntheticSequence, ate_rmse
    from wildcat_slam_tpu.odometry.pipeline import LidarOdometry

    r01 = "--r01-regime" in sys.argv[1:]
    if r01:  # the round-1 bench config, verbatim (git c6e32fb:bench.py)
        cfg = WildcatConfig(
            max_points_per_sweep=32768, max_surfels_per_sweep=1024,
            max_surfels_sliding=4096, max_surfels_fixed=8192,
            max_correspondences=4096, max_leaves_per_sweep=8192,
            inner_iter_num_max=30)
        seq = SyntheticSequence(duration=8.0, points_per_scan=6000,
                                room_half=5.0, seed=0)
    else:
        cfg = WildcatConfig()  # shipped defaults — production shapes
        seq = SyntheticSequence(duration=50.0, points_per_scan=12800, room_half=5.0, seed=0)
    lo = LidarOdometry(cfg)
    # offline replay's recommended mode is --chunk-sweeps K (k-sweep chained
    # dispatch, round 5): after the per-sweep wall window + device trace, the
    # run switches to chunked dispatch and times full chunks only — that is
    # the wall number an offline user of this tunnel-attached environment
    # actually gets. K=8 amortizes the per-dispatch RPC floor 8-fold.
    chunk_k = 0 if r01 else 8  # r01 continuity row keeps its fixed definition

    trace_dir = tempfile.mkdtemp(prefix="wc_bench_trace_")
    imu_iter = iter(seq.imu)
    pending = next(imu_iter, None)
    t_start = t_steady = t_wall_end = None
    n_pre = n_wall = 0
    # r01 ran 8 s with no ramp gating (everything after the compile sweep
    # counted); keep that definition for the continuity row
    steady_from = 1.0 if r01 else cfg.fixed_window_duration + cfg.sweep_duration
    wall_sweeps = 12  # untraced steady sweeps for the wall numbers
    trace_sweeps = 6
    tracing = trace_done = False
    n_trace0 = 0
    t_c0 = None  # chunked-phase clock start (after the chained-program compile)
    n_c0 = n_ck = 0
    t_ck = None  # time of the flush after the latest full chunk
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
        if (t_steady is not None and not tracing and not trace_done
                and t_wall_end is None and lo.sweep_id - n_pre >= wall_sweeps):
            _ = lo.trajectory  # wall window closes fully flushed
            t_wall_end = time.perf_counter()
            n_wall = lo.sweep_id - n_pre
            n_trace0 = lo.sweep_id
            jax.profiler.start_trace(trace_dir)
            tracing = True
        if tracing and lo.sweep_id - n_trace0 >= trace_sweeps:
            _ = lo.trajectory
            jax.profiler.stop_trace()
            tracing, trace_done = False, True
            if chunk_k > 1:  # phase B: switch the SAME run to chained dispatch
                lo.chunk = chunk_k
        if chunk_k > 1 and trace_done:
            if t_c0 is None and lo.sweep_id - n_trace0 - trace_sweeps >= chunk_k:
                _ = lo.trajectory  # first chunk carries the chained compile
                t_c0 = time.perf_counter()
                n_c0 = lo.sweep_id
            elif (t_c0 is not None and t_ck is None
                  and lo.sweep_id - n_c0 >= 4 * chunk_k):
                # ONE flush after a fixed whole number of chunks: the chunks
                # in between pipeline (async dispatch; host prep and transfers
                # overlap device work). Flushing every chunk serializes
                # host -> h2d -> exec -> fetch and was measured SLOWER than
                # the pipelined per-dispatch path (47.8 vs 35.4 ms/sweep,
                # r5) — the opposite of what chunking is for.
                _ = lo.trajectory
                t_ck = time.perf_counter()
                n_ck = lo.sweep_id - n_c0
    if tracing:
        _ = lo.trajectory
        jax.profiler.stop_trace()
    _ = lo.trajectory  # final flush blocks on all queued device work
    if t_wall_end is None:  # short run fallback: all steady sweeps are the wall window
        t_wall_end = time.perf_counter()
        n_wall = lo.sweep_id - n_pre

    if t_steady is None or n_wall < 4:
        print(json.dumps({"metric": "realtime_factor", "value": 0.0, "unit": "x",
                          "vs_baseline": 0.0, "error": "too few steady-state sweeps"}))
        return 1

    per_dispatch_wall = (t_wall_end - t_steady) / n_wall
    per_dispatch_rtf = cfg.sweep_duration / per_dispatch_wall
    # phase B: chunked offline replay (the recommended --chunk-sweeps mode).
    # t_c0 closes after the FIRST full chunk (which carries the chained-program
    # compile); t_ck/n_ck track the latest full-chunk flush after that, so the
    # window times only steady chained dispatches incl. their per-chunk fetch.
    chunked_per_sweep = None
    if chunk_k > 1 and t_c0 is not None and t_ck is not None and n_ck >= chunk_k:
        chunked_per_sweep = (t_ck - t_c0) / n_ck
    # wall = the better of the two offline modes THIS session (both are
    # always reported below). Which wins is a property of the tunnel's
    # current regime, not of the code: when the per-dispatch floor dominates,
    # chunking amortizes it k-fold; when bandwidth + large-RPC serialization
    # dominate (regime observed r5: h2d ~60 MB/s, one 8 MB execute RPC
    # serializes worse than 8 pipelined 1 MB ones), per-sweep dispatch wins.
    # The chained program itself is device-neutral (traced 14.24 ms/sweep at
    # k=8 vs 14.3 per-sweep, MEASUREMENTS r5).
    if chunked_per_sweep is not None and chunked_per_sweep < per_dispatch_wall:
        wall_per_sweep = chunked_per_sweep
        wall_mode = f"chunked_k{chunk_k}"
    else:  # r01 continuity row / short runs / chunk-loses regime
        wall_per_sweep = per_dispatch_wall
        wall_mode = "per_dispatch"
    wall_rtf = cfg.sweep_duration / wall_per_sweep
    per_ramp = (t_steady - t_start) / max(n_pre - 1, 1)
    ate = ate_rmse(lo.trajectory, lambda t: seq.gt_pose(t)[0], align=False)

    dev_ms, n_traced = _device_ms_per_sweep(trace_dir)
    if dev_ms is not None:
        rtf = cfg.sweep_duration * 1e3 / dev_ms
        basis = "device"
    else:  # no trace (e.g. CPU run): fall back to wall
        dev_ms = wall_per_sweep * 1e3
        rtf = wall_rtf
        basis = "wall"

    print(json.dumps({
        "metric": "realtime_factor",
        "value": round(rtf, 3),
        "unit": "x",
        "vs_baseline": round(rtf, 3),
        "basis": basis,
        "per_sweep_ms": round(dev_ms, 1),
        "traced_sweeps": n_traced,
        "wall_rtf": round(wall_rtf, 3),
        "wall_per_sweep_ms": round(wall_per_sweep * 1e3, 1),
        "wall_mode": wall_mode,
        "per_dispatch_wall_rtf": round(per_dispatch_rtf, 3),
        "per_dispatch_wall_ms": round(per_dispatch_wall * 1e3, 1),
        "chunk_sweeps": chunk_k,
        "chunked_wall_ms": (round(chunked_per_sweep * 1e3, 1)
                            if chunked_per_sweep is not None else None),
        "chunked_sweeps_timed": n_ck if chunked_per_sweep is not None else 0,
        "tunnel_overhead_ms": round(per_dispatch_wall * 1e3 - dev_ms, 1),
        "sweeps": lo.sweep_id,
        "steady_sweeps": n_wall,
        "realtime_factor_rampup": round(cfg.sweep_duration / per_ramp, 3),
        "points_per_sweep": 30000 if r01 else 64000,
        "regime": "r01" if r01 else "shipped",
        "ate_rmse_m": round(ate, 5),
        "device": str(jax.devices()[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
