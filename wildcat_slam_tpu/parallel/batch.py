"""Multi-window batch driver: user-facing mesh data parallelism.

``parallel/mesh.py`` provides the sharded per-sweep step (B independent
odometry windows over a 1-D device mesh — the mapping-farm / multi-robot
scaling axis, SURVEY.md §5; the reference is strictly single-stream,
wildcat_slam_node.cc:74-77). This module is the HOST side that makes it a
capability rather than a benchmark: ``BatchedOdometry`` owns B single-window
host frontends (``LidarOdometry`` — sweep boundary logic, feed construction,
trajectory bookkeeping, all shared verbatim via ``_prepare_feed``/``_commit``)
and ONE batched device state sharded over the mesh.

Lockstep model (offline batch processing — parallel bag segments):

- feed each window's sensor stream with :meth:`add_imu`/:meth:`add_scan`
  (windows may be fed interleaved or one after another — nothing dispatches
  until a step is possible);
- :meth:`pump` runs sharded steps while EVERY active window has a complete
  sweep buffered (no wasted no-op compute mid-run);
- :meth:`finish` drains the tails: windows that ran out of data get zero-count
  no-op feeds (all inputs masked on device) so the remaining windows keep
  stepping until none has a full sweep left.

Per-window trajectories/stats come from the embedded frontends:
``bo.windows[i].trajectory``. The CLI exposes this as ``--batch SRC1,SRC2,...``
(cli.py), writing one TUM file per window.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax

from wildcat_slam_tpu.config import WildcatConfig
from wildcat_slam_tpu.odometry.pipeline import LidarOdometry
from wildcat_slam_tpu.parallel import mesh as mesh_mod


class BatchedOdometry:
    """B lockstep odometry windows sharded over a device mesh.

    The batch size must be a multiple of the mesh size (shard_map splits the
    leading axis evenly); with fewer real segments than devices, pass a
    smaller mesh via ``n_devices``.
    """

    def __init__(self, cfg: WildcatConfig = WildcatConfig(), batch: int = 2,
                 n_devices: Optional[int] = None, use_native: bool = False):
        self.cfg = cfg
        if n_devices is None:
            # largest mesh that divides the batch evenly
            avail = len(jax.devices())
            n_devices = max(d for d in range(1, min(batch, avail) + 1)
                            if batch % d == 0)
        self.mesh = mesh_mod.make_mesh(n_devices)
        n_dev = self.mesh.devices.size
        if batch % n_dev != 0:
            raise ValueError(
                f"batch={batch} must be a multiple of the mesh size {n_dev} "
                "(pass n_devices to shrink the mesh)")
        self.windows: List[LidarOdometry] = []
        for _ in range(batch):
            w = LidarOdometry(cfg, use_native=use_native)
            w.dispatch = False  # host buffering only; this driver steps
            self.windows.append(w)
        dtype = self.windows[0].dtype
        self.state = mesh_mod.batched_window_state(cfg, batch, dtype, self.mesh)
        self._step = mesh_mod.make_batched_step(cfg, self.mesh)
        self._init = mesh_mod.make_batched_init(cfg, self.mesh)
        self._initialized = False

    # ------------------------------------------------------------- feeding
    def add_imu(self, i: int, t: float, acc, gyr) -> None:
        self.windows[i].add_imu(t, acc, gyr)

    def add_scan(self, i: int, times: np.ndarray, points_lidar: np.ndarray) -> None:
        self.windows[i].add_scan(times, points_lidar)

    # ------------------------------------------------------------ stepping
    def _init_all(self) -> bool:
        """Batched window bootstrap — requires every window's first sweep to
        be ready (lockstep init; offline segments satisfy this trivially)."""
        if not all(w._ready() for w in self.windows):
            return False
        args = [w._init_args() for w in self.windows]  # commits host state
        stacked = [np.stack([a[j] for a in args]) for j in range(3)]
        self.state = self._init(self.state, *stacked)
        self._initialized = True
        return True

    def _round(self, ready: List[bool]) -> None:
        """One sharded step: real feeds for ready windows, no-op feeds for the
        rest (exhausted tails keep lockstep; their outputs are discarded)."""
        preps = [w._prepare_feed() if r else None
                 for w, r in zip(self.windows, ready)]
        feeds = [p["args"] if p is not None else w.noop_feed()
                 for p, w in zip(preps, self.windows)]
        stacked = [np.stack([f[j] for f in feeds]) for j in range(len(feeds[0]))]
        self.state, out = self._step(self.state, *stacked)
        packed = out["packed"]  # (B, n_packed), window-sharded
        packed.copy_to_host_async()
        for i, (w, p) in enumerate(zip(self.windows, preps)):
            if p is not None:
                w._commit({"packed": packed[i]}, p["back"], p["host_stats"])

    def pump(self) -> int:
        """Run sharded steps while EVERY window has a complete sweep buffered.
        Returns the number of steps taken."""
        if not self._initialized and not self._init_all():
            return 0
        n = 0
        while all(w._ready() for w in self.windows):
            self._round([True] * len(self.windows))
            n += 1
        return n

    def finish(self) -> int:
        """Drain the tails: keep stepping while ANY window has a sweep left,
        feeding no-ops to exhausted ones. Call after all data is fed."""
        n = self.pump()
        if not self._initialized:
            raise RuntimeError(
                "batched init never became possible: some window received "
                "less than one full sweep of data")
        while True:
            ready = [w._ready() for w in self.windows]
            if not any(ready):
                return n
            self._round(ready)
            n += 1

    # ------------------------------------------------------------- results
    @property
    def trajectories(self) -> List[list]:
        return [w.trajectory for w in self.windows]

    @property
    def stats(self) -> List[list]:
        return [w.stats for w in self.windows]
