"""Aggregate throughput of batched windows through the user-facing driver.

Runs B independent synthetic odometry windows in lockstep through
``parallel.batch.BatchedOdometry`` (the same code path as the CLI's
``--batch``). Use batch == n_devices (one window per device): each device then
runs the fully adaptive unbatched program. Larger per-device chunks execute
serially per device (static loop); measured on one chip, vmap-style batching
is ~2x slower per window because it de-adaptivizes the solver's control flow.

    python benchmarks/batched_bench.py [--batch 4] [--duration 4.0] [--devices N]
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--duration", type=float, default=4.0)
    ap.add_argument("--devices", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from wildcat_slam_tpu.config import WildcatConfig
    from wildcat_slam_tpu.io.synthetic import SyntheticSequence
    from wildcat_slam_tpu.parallel.batch import BatchedOdometry

    cfg = WildcatConfig(
        max_points_per_sweep=32768, max_surfels_per_sweep=1024,
        max_surfels_sliding=4096, max_surfels_fixed=8192,
        max_correspondences=4096, max_leaves_per_sweep=8192,
        inner_iter_num_max=30,
    )
    b = args.batch
    bo = BatchedOdometry(cfg, batch=b, n_devices=args.devices)

    seqs = [SyntheticSequence(duration=args.duration, points_per_scan=6000,
                              room_half=5.0, seed=s) for s in range(b)]
    iters = [iter(s.imu) for s in seqs]
    pendings = [next(it, None) for it in iters]

    n_sweeps = 0
    t_start = None
    for k in range(len(seqs[0].scans)):
        for i in range(b):
            ts, pts = seqs[i].scans[k]
            while pendings[i] is not None and pendings[i][0] <= ts[-1] + 0.01:
                bo.add_imu(i, *pendings[i])
                pendings[i] = next(iters[i], None)
            bo.add_scan(i, ts, pts)
        stepped = bo.pump()
        if stepped and t_start is None:
            # first step pays the compile: start the clock after it lands
            jax.block_until_ready(bo.state.sample.pos)
            t_start = time.perf_counter()
            n_sweeps = 0
            continue
        n_sweeps += stepped * b
    if t_start is None:  # degenerate: everything landed in the tail drain
        t_start = time.perf_counter()
    n_sweeps += bo.finish() * b
    jax.block_until_ready(bo.state.sample.pos)

    wall = time.perf_counter() - t_start
    print(f"batch={b} devices={bo.mesh.devices.size}: {n_sweeps} sweeps in {wall:.2f}s "
          f"-> {n_sweeps * cfg.sweep_duration / wall:.2f}x aggregate real-time "
          f"({wall / max(n_sweeps, 1) * 1e3:.1f} ms/sweep amortized)")
    # sanity: batched windows stay finite and produced real trajectories
    assert bool(jnp.all(jnp.isfinite(bo.state.sample.pos))), "non-finite state"
    assert all(len(t) > 0 for t in bo.trajectories), "empty trajectory"


if __name__ == "__main__":
    main()
