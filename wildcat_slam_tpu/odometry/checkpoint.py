"""Checkpoint / resume of the odometry state.

The reference has NO state serialization — a crash loses the trajectory
(SURVEY.md §5: the protobuf machinery in its build is vestigial). Here the full
window state (device pytree) plus the host bookkeeping serialize to one .npz,
so a long mapping run can resume mid-sequence.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from wildcat_slam_tpu.odometry.pipeline import LidarOdometry


_HOST_FIELDS = ("synced", "initialized", "epoch", "sample_times", "imu_front_time",
                "fix_first", "sweep_id", "_last_raw_imu_t")


def save(path: str, lo: LidarOdometry) -> None:
    lo.flush_chunks()  # chunked mode: device state must catch up to the host
    _pts = lo.points.dump()
    flat, treedef = jax.tree_util.tree_flatten(jax.device_get(lo.state))
    host = {f: getattr(lo, f) for f in _HOST_FIELDS}
    np.savez_compressed(
        path,
        __meta__=json.dumps(dict(
            n_leaves=len(flat),
            host=host,
            config=lo.cfg.to_json(),
            trajectory_len=len(lo.trajectory),
            use_native=bool(getattr(lo, "use_native", False)),
        )),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)},
        traj_t=np.asarray([e[0] for e in lo.trajectory]),
        traj_pos=np.stack([e[1] for e in lo.trajectory]) if lo.trajectory else np.zeros((0, 3)),
        traj_rot=np.stack([e[2] for e in lo.trajectory]) if lo.trajectory else np.zeros((0, 4)),
        imu_queue_t=np.asarray([e[0] for e in lo.imu_queue]),
        imu_queue_acc=np.stack([e[1] for e in lo.imu_queue]) if lo.imu_queue else np.zeros((0, 3)),
        imu_queue_gyr=np.stack([e[2] for e in lo.imu_queue]) if lo.imu_queue else np.zeros((0, 3)),
        pts_t=_pts[0],
        pts_xyz=_pts[1],
        resampler=lo.resampler.get_state(),
    )


def load(path: str, use_native: bool = None) -> LidarOdometry:
    """Restore a LidarOdometry from a checkpoint. The host feeder kind
    (numpy vs native C++) defaults to whatever wrote the checkpoint; pass
    ``use_native`` to override."""
    from wildcat_slam_tpu.config import WildcatConfig

    d = np.load(path, allow_pickle=False)
    meta = json.loads(str(d["__meta__"]))
    cfg = WildcatConfig.from_json(meta["config"])
    if use_native is None:
        use_native = bool(meta.get("use_native", False))
    lo = LidarOdometry(cfg, use_native=use_native)

    template = jax.tree_util.tree_structure(lo.state)
    n_expected = template.num_leaves
    leaves = [jnp.asarray(d[f"leaf_{i}"]) for i in range(meta["n_leaves"])]
    recompute_fix_geo = False
    if meta["n_leaves"] == n_expected - 1:
        # pre-round-4 checkpoint: WindowState gained the trailing fix_geo
        # cache leaf (pipeline.WindowState). Insert a placeholder of the
        # current shape and recompute the cache from the restored fixed
        # window below — the cache is derived state, nothing is lost.
        placeholder = jax.tree_util.tree_leaves(lo.state)[-1]
        leaves.append(jnp.zeros_like(placeholder))
        recompute_fix_geo = True
    elif meta["n_leaves"] != n_expected:
        raise ValueError(
            f"checkpoint format mismatch: {path} holds {meta['n_leaves']} state "
            f"leaves but the current WindowState has {n_expected}; the file was "
            "written by an incompatible version")
    lo.state = jax.tree_util.tree_unflatten(template, leaves)
    if recompute_fix_geo:
        from wildcat_slam_tpu.odometry import factors as fmod

        lo.state = lo.state.replace(fix_geo=fmod.pack_geo_rows(lo.state.fix))

    for f in _HOST_FIELDS:
        setattr(lo, f, meta["host"].get(f, getattr(lo, f)))
    lo.trajectory = [
        (float(t), p, q) for t, p, q in zip(d["traj_t"], d["traj_pos"], d["traj_rot"])
    ]
    lo.imu_queue = [
        (float(t), a, g) for t, a, g in zip(d["imu_queue_t"], d["imu_queue_acc"], d["imu_queue_gyr"])
    ]
    lo.points.restore(d["pts_t"], d["pts_xyz"])
    lo.resampler.set_state(d["resampler"])
    return lo


# ---------------------------------------------------------------- batch mode

def batch_paths(path: str, n: int) -> list:
    """Per-window file names for a batch checkpoint: ``out.npz`` ->
    ``out.w0.npz .. out.w{n-1}.npz``. Each file is a complete SINGLE-window
    checkpoint — any window of a batch run can also be resumed standalone."""
    base, ext = os.path.splitext(path)
    return [f"{base}.w{i}{ext or '.npz'}" for i in range(n)]


def save_batch(path: str, bo) -> list:
    """Checkpoint a :class:`~wildcat_slam_tpu.parallel.batch.BatchedOdometry`
    as one single-window-format file per window (see :func:`batch_paths`).
    The batched device state is fetched once and sliced per window; host
    bookkeeping lives in the embedded frontends already."""
    paths = batch_paths(path, len(bo.windows))
    host_state = jax.device_get(bo.state)
    for i, (p, w) in enumerate(zip(paths, bo.windows)):
        # the window's slice of the batched state IS its single-window state
        w.state = jax.tree_util.tree_map(lambda x: x[i], host_state)
        save(p, w)
    return paths


def load_batch(paths, use_native: bool = None, n_devices: int = None):
    """Restore a BatchedOdometry from per-window checkpoint files (written by
    :func:`save_batch`, or any set of compatible single-window checkpoints).
    All files must share one config and one init status — the batched step is
    lockstep, so a mixed set cannot have come from one batch run."""
    from wildcat_slam_tpu.parallel.batch import BatchedOdometry

    los = [load(p, use_native=use_native) for p in paths]
    if len({lo.cfg.to_json() for lo in los}) != 1:
        raise ValueError("batch resume: checkpoint configs differ across windows")
    inits = {bool(lo.initialized) for lo in los}
    if len(inits) != 1:
        raise ValueError(
            "batch resume: mixed window init status across checkpoints — "
            "these files were not written by one lockstep batch run")
    bo = BatchedOdometry(los[0].cfg, batch=len(los), n_devices=n_devices,
                         use_native=bool(getattr(los[0], "use_native", False)))
    for i, lo in enumerate(los):
        lo.dispatch = False  # the batch driver steps; frontends only buffer
        bo.windows[i] = lo
    per_win = [jax.tree_util.tree_leaves(jax.device_get(lo.state)) for lo in los]
    template = jax.tree_util.tree_structure(bo.state)
    sharding = jax.tree_util.tree_leaves(bo.state)[0].sharding
    bo.state = jax.tree_util.tree_unflatten(
        template,
        [jax.device_put(np.stack(ls), sharding) for ls in zip(*per_win)])
    bo._initialized = inits.pop()
    return bo
