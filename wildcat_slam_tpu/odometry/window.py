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


def insert_surfels(win: Surfels, new: Surfels, win_aux: jnp.ndarray | None = None,
                   new_aux: jnp.ndarray | None = None):
    """Insert ``new``'s valid entries into a window's free (invalid) slots.

    The bounded-capacity analog of the reference's unbounded deque insert
    (lidar_odometry.cc:526): when free slots run short the OLDEST valid entries
    are evicted first and returned compactly so callers can migrate them (the
    sliding window migrates evictions to the fixed window).

    TPU-first: windows are NOT kept sorted — every consumer (matcher, factor
    build, trims) is mask/index-based — so an insert touches only
    ``new.capacity`` rows per field via a unique-sorted-index scatter instead of
    re-gathering the whole window. Costs one key sort of the window plus one of
    ``new``.

    ``win_aux``/``new_aux``: optional per-row payload tables ((N, D) and
    (new.capacity, D)) carried through the same compaction/scatter, so callers
    can maintain derived-row caches (the pipeline's fixed-window
    ``pack_geo_rows`` table) incrementally.

    Returns (window, evicted), plus the updated aux table when one was given;
    ``evicted`` has ``new.capacity`` rows.
    """
    m = new.capacity
    dtype = win.t.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    # insertion targets: free slots first (key -inf), then oldest valid entries
    slot_key = jnp.where(win.valid, win.t, -big)
    slots = jnp.argsort(slot_key)[:m].astype(jnp.int32)

    # compact the new entries (valid first, time order preserved)
    ckey = jnp.where(new.valid, new.t, big)
    order = jnp.argsort(ckey)[:m]
    newc = jax.tree_util.tree_map(lambda x: x[order], new)
    newc = newc.replace(valid=newc.valid & (ckey[order] < big))
    n_new = jnp.sum(newc.valid.astype(jnp.int32))
    write = jnp.arange(m) < n_new

    # re-order by slot index so the scatter has provably sorted unique indices
    slot_order = jnp.argsort(slots)
    slots_s = slots[slot_order]
    newc = jax.tree_util.tree_map(lambda x: x[slot_order], newc)
    write_s = write[slot_order]

    evicted = jax.tree_util.tree_map(lambda x: x[slots_s], win)
    evicted = evicted.replace(valid=evicted.valid & write_s)

    def put(buf, vals):
        cur = buf[slots_s]
        sel = write_s.reshape((-1,) + (1,) * (buf.ndim - 1))
        return buf.at[slots_s].set(jnp.where(sel, vals.astype(buf.dtype), cur),
                                   unique_indices=True, indices_are_sorted=True)

    out = Surfels(
        t=put(win.t, newc.t),
        center=put(win.center, newc.center),
        cov=put(win.cov, newc.cov),
        norm=put(win.norm, newc.norm),
        rot=put(win.rot, newc.rot),
        pos=put(win.pos, newc.pos),
        resolution=put(win.resolution, newc.resolution),
        std=put(win.std, newc.std),
        valid=win.valid.at[slots_s].set(
            jnp.where(write_s, newc.valid, win.valid[slots_s]),
            unique_indices=True, indices_are_sorted=True),
    )
    if new_aux is None:
        return out, evicted
    auxc = new_aux[order][slot_order]
    out_aux = win_aux.at[slots_s].set(
        jnp.where(write_s[:, None], auxc.astype(win_aux.dtype), win_aux[slots_s]),
        unique_indices=True, indices_are_sorted=True)
    return out, evicted, out_aux


def extract_moved(sld: Surfels, t_cut: jnp.ndarray, capacity: int):
    """Pull up to ``capacity`` of the oldest surfels with ``t < t_cut`` out of
    the sliding window (the sliding->fixed migration of ShrinkToFit,
    lidar_odometry.cc:243-246). Excess movers simply stay one more sweep.
    Returns (sld, moved)."""
    big = jnp.asarray(jnp.finfo(sld.t.dtype).max, sld.t.dtype)
    move = sld.valid & (sld.t < t_cut)
    key = jnp.where(move, sld.t, big)
    idx = jnp.argsort(key)[:capacity].astype(jnp.int32)
    taken = jnp.arange(capacity) < jnp.minimum(jnp.sum(move.astype(jnp.int32)), capacity)
    moved = jax.tree_util.tree_map(lambda x: x[idx], sld)
    moved = moved.replace(valid=moved.valid & taken)
    sld = sld.replace(valid=sld.valid.at[idx].set(
        jnp.where(taken, False, sld.valid[idx]), unique_indices=True))
    return sld, moved


def rebase_times(sample: SampleStates, imu: ImuStates, sld: Surfels, fix: Surfels):
    """Shift all window-relative times so the sample front is 0; returns the
    shift applied (host adds it to its f64 epoch)."""
    shift = sample.t[0]
    sample = sample.replace(t=jnp.where(sample.mask, sample.t - shift, 0.0))
    imu = imu.replace(t=jnp.where(imu.mask, imu.t - shift, 0.0))
    sld = sld.replace(t=jnp.where(sld.valid, sld.t - shift, 0.0))
    fix = fix.replace(t=jnp.where(fix.valid, fix.t - shift, 0.0))
    return sample, imu, sld, fix, shift
