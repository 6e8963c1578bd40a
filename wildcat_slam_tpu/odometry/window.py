"""Sliding/fixed window management: bounded-capacity ring semantics under jit.

Covers ``ShrinkToFit`` (lidar_odometry.cc:228-251) and the window bookkeeping of
``AddLidarScan`` (surfel insertion cc:526, sample/imu/surfel trimming cc:574-580),
re-designed as masked shifts over fixed-capacity arrays (the trim itself is
inlined in pipeline.process_sweep with host-computed drop counts — see the
host/device split note there):

- sample states: drop from the front while back.t - front.t > sliding duration;
- IMU states: drop from the front while older than the new sample front;
- sliding surfels older than the IMU front migrate to the fixed window;
- the fixed window keeps at most ``fixed_window_duration`` seconds before its
  newest surfel. (The reference's trim loop compares an element with itself and
  so never trims — lidar_odometry.cc:247-249, flagged in SURVEY.md as a bug; we
  implement the evident intent.)

Also provides time rebasing: device times are window-relative f32; each sweep
the origin is shifted to the (new) sample front so relative magnitudes stay
bounded over arbitrarily long runs (the host accumulates the epoch in f64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wildcat_slam_tpu.odometry.states import ImuStates, SampleStates, Surfels
from wildcat_slam_tpu.odometry import imu as imu_mod
from wildcat_slam_tpu.ops import lie


def _shift_left(buf: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Drop the first n entries (clamped gather; tail padding repeats, unread)."""
    cap = buf.shape[0]
    idx = jnp.clip(jnp.arange(cap) + n, 0, cap - 1)
    return buf[idx]


def add_sample_states(
    sample: SampleStates, imu: ImuStates, new_t: jnp.ndarray, n_new: jnp.ndarray
) -> SampleStates:
    """Append up to A new sample states at the given times (on the IMU grid):
    poses by lerp/slerp of IMU states, biases copied from the current back state
    (lidar_odometry.cc:429-453)."""
    a = new_t.shape[0]
    c = sample.count
    pos, rot = imu_mod.interp_pose(imu, new_t)

    last_cor = jax.lax.dynamic_slice(sample.cor, (c.astype(jnp.int32) - 1, jnp.asarray(0, jnp.int32)), (1, 12))[0]
    new_cor = jnp.zeros((a, 12), sample.cor.dtype).at[:, 6:12].set(last_cor[6:12])

    zero = jnp.asarray(0, jnp.int32)

    def put(buf, vals):
        starts = (c.astype(jnp.int32),) + (zero,) * (buf.ndim - 1)
        return jax.lax.dynamic_update_slice(buf, vals.astype(buf.dtype), starts)

    return sample.replace(
        t=put(sample.t, new_t),
        rot=put(sample.rot, rot),
        pos=put(sample.pos, pos),
        cor=put(sample.cor, new_cor),
        count=c + n_new,
    )


def merge_surfels_into_window(win: Surfels, new: Surfels, keep_newest: bool = True):
    """Append a sweep's surfels to a window (lidar_odometry.cc:526). Windows are
    time-ordered; on overflow the oldest entries are dropped.

    Returns ``(window, overflow)`` where ``overflow`` has the dropped (oldest)
    entries marked valid — callers under capacity pressure migrate them to the
    fixed window instead of losing their constraints (the reference's unbounded
    deques never drop; this is the bounded-capacity analog)."""
    cap = win.capacity
    both = jax.tree_util.tree_map(lambda a, b: jnp.concatenate([a, b], 0), win, new)
    bigt = jnp.asarray(jnp.finfo(win.t.dtype).max, win.t.dtype)
    order = jnp.argsort(jnp.where(both.valid, both.t, bigt), stable=True)
    both = jax.tree_util.tree_map(lambda x: x[order], both)
    nv = jnp.sum(both.valid.astype(jnp.int32))
    start = jnp.maximum(nv - cap, 0) if keep_newest else jnp.asarray(0, jnp.int32)

    def slice_(x):
        starts = (start.astype(jnp.int32),) + (jnp.asarray(0, jnp.int32),) * (x.ndim - 1)
        return jax.lax.dynamic_slice(x, starts, (cap,) + x.shape[1:])

    kept = jax.tree_util.tree_map(slice_, both)
    dropped_mask = both.valid & (jnp.arange(both.t.shape[0]) < start)
    overflow = jax.tree_util.tree_map(lambda x: x[:cap], both.replace(valid=dropped_mask[: both.t.shape[0]]))
    return kept, overflow


def rebase_times(sample: SampleStates, imu: ImuStates, sld: Surfels, fix: Surfels):
    """Shift all window-relative times so the sample front is 0; returns the
    shift applied (host adds it to its f64 epoch)."""
    shift = sample.t[0]
    sample = sample.replace(t=jnp.where(sample.mask, sample.t - shift, 0.0))
    imu = imu.replace(t=jnp.where(imu.mask, imu.t - shift, 0.0))
    sld = sld.replace(t=jnp.where(sld.valid, sld.t - shift, 0.0))
    fix = fix.replace(t=jnp.where(fix.valid, fix.t - shift, 0.0))
    return sample, imu, sld, fix, shift
