"""Aggregate throughput of batched windows (parallel/mesh.py).

Runs B independent synthetic odometry windows in lockstep through the sharded
sweep step. Use batch == n_devices (one window per device): each device then
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
    from wildcat_slam_tpu.odometry import pipeline as pipe
    from wildcat_slam_tpu.parallel import mesh as pmesh

    cfg = WildcatConfig(
        max_points_per_sweep=32768, max_surfels_per_sweep=1024,
        max_surfels_sliding=4096, max_surfels_fixed=8192,
        max_correspondences=4096, max_leaves_per_sweep=8192,
        inner_iter_num_max=30,
    )
    b = args.batch
    mesh = pmesh.make_mesh(args.devices)
    dtype = jnp.float32

    # B windows fed the same synthetic sequence with different seeds: use B
    # single-window host drivers to produce identical-shape feeds, then stack.
    seqs = [SyntheticSequence(duration=args.duration, points_per_scan=6000,
                              room_half=5.0, seed=s) for s in range(b)]
    drivers = [pipe.LidarOdometry(cfg) for _ in range(b)]

    # monkeypatch: capture feeds instead of dispatching per-window
    feeds: list = []

    def capture(state, *args_, emit_cloud=False):
        cfg_ = args_[-1]  # cfg arrives positionally from the host driver
        feeds.append(args_[:-1])
        cfg = cfg_
        # return state unchanged; pose outputs are placeholders (host bookkeeping
        # only consumes scalars it can live without during capture)
        out = dict(packed=jnp.zeros(22, jnp.float32),
                   pts_world=jnp.zeros((cfg.max_points_per_sweep, 3), dtype),
                   pts_valid=jnp.zeros(cfg.max_points_per_sweep, bool))
        return state, out

    # run the four host drivers in lockstep, batching each sweep's feeds
    state = pmesh.batched_window_state(cfg, b, dtype, mesh)
    init = pmesh.make_batched_init(cfg, mesh)
    step = pmesh.make_batched_step(cfg, mesh)

    iters = [iter(s.imu) for s in seqs]
    pendings = [next(it, None) for it in iters]
    orig = pipe.process_sweep
    inited = False
    n_sweeps = 0
    t_start = None
    try:
        pipe.process_sweep = capture

        class CaptureInit:
            def __call__(self, st, t, acc, gyr, cfg_):
                self.args = (t, acc, gyr)
                return st

        cap_init = CaptureInit()
        orig_init = pipe.init_window
        pipe.init_window = cap_init

        for k in range(len(seqs[0].scans)):
            feeds.clear()
            for i in range(b):
                ts, pts = seqs[i].scans[k]
                while pendings[i] is not None and pendings[i][0] <= ts[-1] + 0.01:
                    drivers[i].add_imu(*pendings[i])
                    pendings[i] = next(iters[i], None)
                drivers[i].add_scan(ts, pts)
            if not inited and all(d.initialized for d in drivers):
                state = init(
                    state,
                    jnp.broadcast_to(jnp.asarray(cap_init.args[0], dtype), (b,) + cap_init.args[0].shape),
                    jnp.broadcast_to(jnp.asarray(cap_init.args[1], dtype), (b,) + cap_init.args[1].shape),
                    jnp.broadcast_to(jnp.asarray(cap_init.args[2], dtype), (b,) + cap_init.args[2].shape),
                )
                inited = True
            if len(feeds) == b:
                batched = [jnp.stack([jnp.asarray(f[j]) for f in feeds]) for j in range(len(feeds[0]))]
                state, out = step(state, *batched)
                n_sweeps += b
                if t_start is None:
                    jax.block_until_ready(out["packed"])
                    t_start = time.perf_counter()
                    n_sweeps = 0
        jax.block_until_ready(state.sample.pos)
    finally:
        pipe.process_sweep = orig
        pipe.init_window = orig_init

    wall = time.perf_counter() - t_start
    print(f"batch={b} devices={len(mesh.devices.flat)}: {n_sweeps} sweeps in {wall:.2f}s "
          f"-> {n_sweeps * cfg.sweep_duration / wall:.2f}x aggregate real-time "
          f"({wall / max(n_sweeps, 1) * 1e3:.1f} ms/sweep amortized)")
    # sanity: batched windows stay finite
    assert bool(jnp.all(jnp.isfinite(state.sample.pos))), "non-finite state"


if __name__ == "__main__":
    main()
