"""Per-stage microbenchmarks of the odometry pipeline.

The reference wires a google-benchmark harness but ships zero benchmark files
(cmake/google-test.cmake:39-48, SURVEY.md §4). This is that promise kept:

    python benchmarks/microbench.py [--ablate] [--duration 4.0]

Reports per-stage wall times. NOTE: isolated stage timings through the TPU
tunnel measure dispatch throughput, not device time — the trustworthy numbers
come from --ablate, which re-runs the full pipeline with individual stages
stubbed out and reports the end-to-end deltas.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_e2e(ablate: str, duration: float) -> float:
    """Per-sweep mean ms with a stage (and everything after it depends on)
    stubbed. ablate in: none, solve, match, extract."""
    import jax
    import jax.numpy as jnp
    import wildcat_slam_tpu.odometry.pipeline as pl
    from wildcat_slam_tpu.config import WildcatConfig
    from wildcat_slam_tpu.io.synthetic import SyntheticSequence

    if ablate == "step":
        # stub the whole jitted device step: what remains is the host floor —
        # pop_sweep/decimation, feed-array construction, host->device transfer
        def fake_step(state, *args, **kw):
            return state, dict(packed=jnp.zeros((22,), jnp.float32))

        pl.process_sweep = fake_step
    if ablate in ("solve", "match", "extract"):
        import wildcat_slam_tpu.odometry.solver as sol

        def fake_solve(sample, sfac, ifac, weights, dt, grav, ff, **kw):
            z = jnp.asarray(0.0, sample.cor.dtype)
            return sample, sol.SolveStats(jnp.asarray(0, jnp.int32), z, z, z)

        pl.solve_window = fake_solve
    if ablate in ("match", "extract"):
        def fake_match(cq, nq, tq, vq, ct, nt, tt, vt, max_pairs=8192, **kw):
            z = jnp.zeros((max_pairs,), jnp.int32)
            return z, z, jnp.zeros((max_pairs,), bool), jnp.asarray(0, jnp.int32)

        pl.match_surfels = fake_match
    if ablate == "extract":
        def fake_extract(pts, t, valid, cfg):
            n = cfg.max_surfels_per_sweep
            d = pts.dtype
            return dict(
                t=jnp.zeros(n, d), center=jnp.zeros((n, 3), d), cov=jnp.zeros((n, 3, 3), d),
                norm=jnp.zeros((n, 3), d), resolution=jnp.zeros(n, d), std=jnp.zeros(n, d),
                valid=jnp.zeros(n, bool), n_dropped=jnp.asarray(0, jnp.int32),
            )

        pl.extract_surfels = fake_extract

    if os.environ.get("MICROBENCH_DEFAULT_CFG"):
        cfg = WildcatConfig()  # shipped production capacities (65k points)
        pps = 12800
    else:
        cfg = WildcatConfig(
            max_points_per_sweep=32768, max_surfels_per_sweep=1024,
            max_surfels_sliding=4096, max_surfels_fixed=8192,
            max_correspondences=4096, max_leaves_per_sweep=8192,
            inner_iter_num_max=30,
        )
        pps = 6000
    seq = SyntheticSequence(duration=duration, points_per_scan=pps, room_half=5.0, seed=0)
    lo = pl.LidarOdometry(cfg)
    imu_iter = iter(seq.imu)
    pending = next(imu_iter, None)
    t_start = None
    for ts, pts in seq.scans:
        while pending is not None and pending[0] <= ts[-1] + 0.01:
            lo.add_imu(*pending)
            pending = next(imu_iter, None)
        lo.add_scan(ts, pts)
        if lo.sweep_id == 1 and t_start is None:
            _ = lo.trajectory  # exclude the compile sweep
            t_start = time.perf_counter()
    # throughput, not dispatch latency: the deferred-fetch design queues device
    # work ahead of the host, so per-call timings are meaningless — flush and
    # divide total wall by steady sweeps
    _ = lo.trajectory
    return (time.perf_counter() - t_start) / max(lo.sweep_id - 1, 1) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ablate", action="store_true",
                    help="run the cumulative-ablation breakdown (4 pipeline runs)")
    ap.add_argument("--duration", type=float, default=4.0)
    ap.add_argument("--stage", default=None, help=argparse.SUPPRESS)  # internal
    args = ap.parse_args()

    if args.stage is not None:
        print(f"{args.stage} {run_e2e(args.stage, args.duration):.1f}")
        return

    if not args.ablate:
        print(f"full pipeline: {run_e2e('none', args.duration):.1f} ms/sweep")
        return

    # each ablation in its own process (jit caches are keyed by function identity)
    results = {}
    for stage in ["none", "solve", "match", "extract", "step"]:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--stage", stage,
             "--duration", str(args.duration)],
            capture_output=True, text=True, cwd=REPO, timeout=900,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith(stage)]
        if not line:
            print(out.stdout, out.stderr[-2000:])
            raise RuntimeError(f"ablation {stage} failed")
        results[stage] = float(line[0].split()[1])

    print(f"{'full pipeline':<28}{results['none']:8.1f} ms/sweep")
    print(f"{'  solver':<28}{results['none'] - results['solve']:8.1f} ms")
    print(f"{'  matching+factors':<28}{results['solve'] - results['match']:8.1f} ms")
    print(f"{'  extraction':<28}{results['match'] - results['extract']:8.1f} ms")
    print(f"{'  imu/undistort (device)':<28}{results['extract'] - results['step']:8.1f} ms")
    print(f"{'  host feed floor':<28}{results['step']:8.1f} ms")


if __name__ == "__main__":
    main()
