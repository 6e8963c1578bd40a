"""Device-mesh parallelism: batch-of-windows data parallelism.

The reference is strictly single-process/single-thread (SURVEY.md §2: no DP/TP/
PP/NCCL/MPI anywhere — wildcat_slam_node.cc:74-77 is a single spin loop), so
there is no distributed behavior to reproduce. The TPU-native scaling story is
*batch-of-windows data parallelism*: B independent odometry windows (parallel
bag segments, a multi-robot fleet, or a mapping farm) advance in lockstep, with
every per-sweep tensor carrying a leading batch axis sharded over a 1-D device
mesh. Within a window the solve is single-chip by design — a 6 s window's
normal equations are ~1k x 1k, far too small to profit from cross-chip sharding;
throughput scaling comes from independent windows.

Implementation: ``process_sweep`` is vmapped over the batch axis and jitted with
``NamedSharding(P("window"))`` on every leading axis. XLA partitions the whole
step — including the LM ``while_loop`` (it runs to the max active iteration
count across the shard's windows, masking finished ones) — with zero
collectives on the hot path; only scalar reductions for host diagnostics cross
the ICI.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wildcat_slam_tpu.config import WildcatConfig
from wildcat_slam_tpu.odometry import pipeline as pipe


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "window") -> Mesh:
    """1-D mesh over the first n devices (all by default)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batched_window_state(cfg: WildcatConfig, batch: int, dtype, mesh: Mesh) -> pipe.WindowState:
    """WindowState with a leading batch axis, sharded over the mesh."""
    one = pipe.WindowState.empty(cfg, dtype)
    state = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), one
    )
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), state)


def make_batched_step(cfg: WildcatConfig, mesh: Mesh):
    """Returns a jitted batched sweep step: state and all feed arrays carry a
    leading window axis sharded over the mesh."""
    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))

    def step(state, imu_t, imu_acc, imu_gyr, imu_n, sample_t, sample_n,
             pts, pts_t, pts_n, n_sample_drop, n_imu_drop, fix_first_pos):
        return jax.vmap(
            lambda s, a, b, c, d, e, f, g, h, i, j, k, l: pipe.process_sweep.__wrapped__(
                s, a, b, c, d, e, f, g, h, i, j, k, l, cfg
            )
        )(state, imu_t, imu_acc, imu_gyr, imu_n, sample_t, sample_n,
          pts, pts_t, pts_n, n_sample_drop, n_imu_drop, fix_first_pos)

    # a single sharding acts as a pytree prefix: every leaf of every argument
    # is sharded along its leading (window) axis
    return jax.jit(step, in_shardings=shard, out_shardings=shard)


def make_batched_init(cfg: WildcatConfig, mesh: Mesh):
    """Jitted batched window bootstrap (leading window axis)."""
    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))

    def init(state, imu_t, imu_acc, imu_gyr):
        return jax.vmap(
            lambda s, a, b, c: pipe.init_window.__wrapped__(s, a, b, c, cfg)
        )(state, imu_t, imu_acc, imu_gyr)

    return jax.jit(init, in_shardings=(shard,) * 4, out_shardings=shard)
