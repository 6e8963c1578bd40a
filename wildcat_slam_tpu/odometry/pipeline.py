"""The odometry pipeline: host feeder + one jitted per-sweep window solve.

Covers ``LidarOdometry`` (lidar_odometry.{h,cc}) and the driver loop
(wildcat_slam_node.cc): the host side buffers sensor data, decides sweep
boundaries, and feeds padded arrays; the device side runs the whole per-sweep
step — IMU propagation, sample-state creation, undistortion, surfel extraction,
window merging, correspondence matching, the LM solve, and the post-solve state
updates — as ONE jitted, shape-static function (SURVEY.md §3.3: the device
boundary wraps exactly steps PredictImuStates..UpdateSamplePoses).

Host/device split of time bookkeeping: absolute timestamps stay f64 on the host
(device f32 cannot hold them); the device sees window-relative f32 times. All
data-dependent *counts* (new sample states, IMU ticks to feed, sample states to
drop) are computed host-side on the exact f64 grid and passed as scalars, so
borderline f32 comparisons on device can never diverge from the host's view.

Sweep orchestration mirrors AddLidarScan (lidar_odometry.cc:487-605):
1. extrinsic transform + range/blind-box filter on arrival (:489-496, host),
2. head sync of the two streams (:457-485, host),
3. wait until points and IMU cover sweep_end = first_point_t + sweep_duration
   (:503-509; we additionally wait one extra IMU tick past the last new sample
   state so the window always carries exactly one trailing IMU state),
4. process_sweep on device,
5. trajectory append (the reference instead publishes TF, :597-602).
"""

from __future__ import annotations

import time
from functools import partial
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from wildcat_slam_tpu.config import WildcatConfig
from wildcat_slam_tpu.odometry import corrections as cor_mod
from wildcat_slam_tpu.odometry import factors as fmod
from wildcat_slam_tpu.odometry import imu as imu_mod
from wildcat_slam_tpu.odometry import window as win_mod
from wildcat_slam_tpu.odometry.match import match_surfels
from wildcat_slam_tpu.odometry.solver import solve_window
from wildcat_slam_tpu.odometry.states import ImuStates, SampleStates, Surfels
from wildcat_slam_tpu.odometry.surfel import extract_surfels


@struct.dataclass
class WindowState:
    sample: SampleStates
    imu: ImuStates
    sld: Surfels
    fix: Surfels
    # cached pack_geo_rows(fix): (max_surfels_fixed, 12) [cov_world sym6,
    # center_world, norm_world]. Fixed-window poses are frozen after insertion
    # (only sliding-window poses are re-attached post-solve), so these derived
    # rows change ONLY at the sweep's fixed-window insert — process_sweep
    # refreshes just the inserted rows (insert_surfels aux payload) instead of
    # recomputing all rows every sweep (measured 0.56 ms/sweep at 16384 rows).
    fix_geo: jnp.ndarray

    @classmethod
    def empty(cls, cfg: WildcatConfig, dtype) -> "WindowState":
        return cls(
            sample=SampleStates.empty(cfg.max_sample_states, dtype),
            imu=ImuStates.empty(cfg.max_imu_states, dtype),
            sld=Surfels.empty(cfg.max_surfels_sliding, dtype),
            fix=Surfels.empty(cfg.max_surfels_fixed, dtype),
            fix_geo=jnp.zeros((cfg.max_surfels_fixed, 12), dtype),
        )


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def init_window(state: WindowState, imu_t, imu_acc, imu_gyr, cfg: WildcatConfig) -> WindowState:
    """Window bootstrap from the first two IMU samples
    (lidar_odometry.cc:369-398): two IMU states, one sample state at the first
    IMU time, gravity from the first accelerometer direction."""
    imu = imu_mod.init_from_first_two(state.imu, imu_t, imu_acc, imu_gyr, cfg.imu_dt)
    a0 = imu_acc[0]
    grav = -cfg.gravity_norm * a0 / jnp.linalg.norm(a0)
    sample = state.sample.replace(
        t=state.sample.t.at[0].set(imu_t[0].astype(state.sample.t.dtype)),
        rot=state.sample.rot.at[0].set(imu.rot[0]),
        pos=state.sample.pos.at[0].set(imu.pos[0]),
        count=jnp.asarray(1, jnp.int32),
        grav=grav.astype(state.sample.grav.dtype),
    )
    return state.replace(sample=sample, imu=imu)


def _process_sweep_impl(
    state: WindowState,
    # IMU feed: padded (K,) arrays of resampled samples, n valid
    imu_t, imu_acc, imu_gyr, imu_n,
    # new sample-state times (on the IMU grid), n valid
    sample_t, sample_n,
    # sweep points (IMU frame), padded (P, 3)/(P,), n valid
    pts, pts_t, pts_n,
    # host-computed window control
    n_sample_drop, n_imu_drop, fix_first_pos,
    cfg: WildcatConfig,
    emit_cloud: bool = False,
):
    """One full sweep step on device. Returns (state, outputs dict).

    Unjitted body — traced by :func:`process_sweep` (one sweep per dispatch)
    and, as a ``lax.scan`` body, by :func:`process_sweeps_chained` (k sweeps
    per dispatch for offline replay, amortizing the host<->device round-trip).
    """
    sample, imu = state.sample, state.imu
    dtype = sample.pos.dtype

    # 1. IMU propagation with the back sample state's biases (cc:405-427)
    sc = sample.count.astype(jnp.int32)
    back_cor = jax.lax.dynamic_slice(sample.cor, (sc - 1, jnp.asarray(0, jnp.int32)), (1, 12))[0]
    bg, ba = back_cor[6:9], back_cor[9:12]
    imu = imu_mod.propagate(imu, imu_t, imu_acc, imu_gyr, imu_n, bg, ba, sample.grav, cfg.imu_dt)

    # 2. new sample states (cc:429-453)
    sample = win_mod.add_sample_states(sample, imu, sample_t, sample_n)
    pred_pos = sample.pos[sample.count - 1]  # predicted back pose (diagnostic)

    # 3. undistort sweep (cc:518-520)
    pts_valid = jnp.arange(pts.shape[0]) < pts_n
    pts_world = imu_mod.undistort_points(imu, pts_t, pts, sorted_t=cfg.sorted_undistort)

    # 4. surfel extraction + pose attachment (cc:522-527)
    sweep_surf = extract_surfels(pts_world, pts_t, pts_valid, cfg)
    new_surfels = cor_mod.attach_surfel_poses(
        sweep_surf["t"], sweep_surf["center"], sweep_surf["cov"], sweep_surf["norm"],
        sweep_surf["resolution"], sweep_surf["std"], sweep_surf["valid"], imu,
    )
    # slot-insertion into the sliding window: only new.capacity rows are
    # written; evictions under capacity pressure migrate to the fixed window
    # at the post-solve trim (the reference's deques are unbounded)
    sld, sld_evicted = win_mod.insert_surfels(state.sld, new_surfels)
    fix, fix_geo = state.fix, state.fix_geo

    stats = {}
    for _ in range(cfg.outer_iter_num_max):  # cc:529 (default 1)
        # 5. correspondences (cc:530-538). The fixed window's world-frame
        # tables come from the fix_geo cache (see WindowState) — only the
        # sliding window, whose poses moved last solve, is recomputed.
        c_sld, n_sld = sld.center_world(), sld.norm_world()
        c_fix, n_fix = fix_geo[:, 6:9], fix_geo[:, 9:12]
        iq_s, it_s, pv_s, drop_s = match_surfels(
            c_sld, n_sld, sld.t, sld.valid, c_sld, n_sld, sld.t, sld.valid,
            center_dist=cfg.match_center_dist, angular_dist=cfg.match_angular_dist,
            surfel_dist=cfg.match_surfel_dist, time_diff=cfg.match_time_diff,
            k=cfg.match_knn, max_pairs=cfg.max_correspondences, self_match=True,
            approx=cfg.match_knn_approx,
        )
        iq_f, it_f, pv_f, drop_f = match_surfels(
            c_sld, n_sld, sld.t, sld.valid, c_fix, n_fix, fix.t, fix.valid,
            center_dist=cfg.match_center_dist, angular_dist=cfg.match_angular_dist,
            surfel_dist=cfg.match_surfel_dist, time_diff=cfg.match_time_diff,
            k=cfg.match_knn, max_pairs=cfg.max_correspondences, self_match=False,
            approx=cfg.match_knn_approx,
        )

        # 6. factors (cc:543-545) — one packed table per window, shared across
        # both builds (pack_factor_rows: wide gathers, cov_world computed once)
        sld_pack = fmod.pack_factor_rows(sld)
        fix_pack = fmod.pack_factor_rows_from_geo(fix, fix_geo)
        sfac_b = fmod.build_surfel_factors(
            sld, sld, iq_s, it_s, pv_s, sample, cfg.surfel_sigma_floor, target_optimized=True,
            sq_pack=sld_pack, st_pack=sld_pack)
        sfac_u = fmod.build_surfel_factors(
            sld, fix, iq_f, it_f, pv_f, sample, cfg.surfel_sigma_floor, target_optimized=False,
            sq_pack=sld_pack, st_pack=fix_pack)
        sfac = jax.tree_util.tree_map(lambda a, b: jnp.concatenate([a, b], 0), sfac_b, sfac_u)
        ifac = fmod.build_imu_factors(imu, sample, max_factors=cfg.max_imu_states)

        # degeneracy health signal (no reference analog — see
        # factors.direction_coverage): direction coverage of the match set
        # around the predicted back pose, computed once per outer iteration.
        # With remapping on, the same eigendecomposition also yields the
        # weak-subspace projectors the solver uses to act on the signal.
        if cfg.degeneracy_remap:
            w_t, w_r, deg_t, deg_r = fmod.degeneracy_projectors(
                sfac, pred_pos, cfg.degeneracy_remap_ratio)
            remap_proj = (w_t, w_r)
        else:
            deg_t, deg_r = fmod.direction_coverage(sfac, pred_pos)
            remap_proj = None

        # 7. solve (cc:540-562)
        weights = (cfg.weight_gyr, cfg.weight_acc, cfg.weight_bg, cfg.weight_ba)
        if cfg.debug_residuals:
            # pre-solve snapshot (reference prints residual histograms before
            # AND after each solve, lidar_odometry.cc:547-549,568-571)
            from wildcat_slam_tpu.odometry.solver import residual_snapshot
            stats_res_pre = residual_snapshot(
                sample, sfac, ifac, weights, cfg.imu_dt, sample.grav)
        else:
            stats_res_pre = None
        sample, sstats = solve_window(
            sample, sfac, ifac, weights, cfg.imu_dt, sample.grav, fix_first_pos,
            cauchy_scale=cfg.cauchy_loss_scale, max_iterations=cfg.inner_iter_num_max,
            init_lambda=cfg.gn_initial_lambda, function_tolerance=cfg.gn_function_tolerance,
            linear_solver=cfg.linear_solver, pcg_iters=cfg.pcg_iters, pcg_tol=cfg.pcg_tol,
            n_binary=cfg.max_correspondences, remap_proj=remap_proj,
        )
        if cfg.debug_residuals:
            from wildcat_slam_tpu.odometry.solver import residual_snapshot
            stats_res = residual_snapshot(
                sample, sfac, ifac, weights, cfg.imu_dt, sample.grav)
        else:
            stats_res = None
        stats = dict(
            iterations=sstats.iterations,
            initial_cost=sstats.initial_cost,
            final_cost=sstats.final_cost,
            n_new_surfels=new_surfels.count,
            n_pairs_sld=jnp.sum(pv_s.astype(jnp.int32)),
            n_pairs_fix=jnp.sum(pv_f.astype(jnp.int32)),
            # capacity-overflow telemetry (the reference is unbounded; any
            # loss to the static capacities must be visible, not silent)
            n_surfels_dropped=sweep_surf["n_dropped"],
            n_pairs_dropped=drop_s + drop_f,
            deg_trans_ratio=deg_t,
            deg_rot_ratio=deg_r,
            lm_lambda_final=sstats.lambda_final,
        )

        # 8. post-solve updates (cc:564-566)
        imu = cor_mod.update_imu_poses(sample, imu, cfg.imu_dt)
        sld = cor_mod.update_surfel_poses(sld, imu)
        sample = sample.apply_corrections()

    # 9. window trims (cc:574-580); drop counts are host-computed
    sample2 = sample.replace(
        t=win_mod._shift_left(sample.t, n_sample_drop),
        rot=win_mod._shift_left(sample.rot, n_sample_drop),
        pos=win_mod._shift_left(sample.pos, n_sample_drop),
        cor=win_mod._shift_left(sample.cor, n_sample_drop),
        count=sample.count - n_sample_drop,
    )
    imu2 = imu.replace(
        t=win_mod._shift_left(imu.t, n_imu_drop),
        rot=win_mod._shift_left(imu.rot, n_imu_drop),
        pos=win_mod._shift_left(imu.pos, n_imu_drop),
        acc=win_mod._shift_left(imu.acc, n_imu_drop),
        gyr=win_mod._shift_left(imu.gyr, n_imu_drop),
        count=imu.count - n_imu_drop,
    )
    imu_front_t = imu2.t[0]
    sld, moved = win_mod.extract_moved(sld, imu_front_t, cfg.max_surfels_per_sweep * 2)
    incoming = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], 0), sld_evicted, moved)
    # derived rows for ONLY the incoming block (3x sweep cap), scattered into
    # the fix_geo cache alongside the surfel insert
    inc_geo = fmod.pack_geo_rows(incoming)
    fix, _, fix_geo = win_mod.insert_surfels(fix, incoming, win_aux=fix_geo,
                                             new_aux=inc_geo)
    small = jnp.asarray(jnp.finfo(dtype).min, dtype)
    fix_newest = jnp.max(jnp.where(fix.valid, fix.t, small))
    fix = fix.replace(valid=fix.valid & (fix.t >= fix_newest - cfg.fixed_window_duration))

    # 10. rebase times to the new sample front
    sample2, imu2, sld, fix, shift = win_mod.rebase_times(sample2, imu2, sld, fix)

    # final undistortion for output (cc:584-595) with post-solve poses — only
    # when the caller collects clouds (static flag: skipped work is not traced)
    if emit_cloud:
        pts_world_final = imu_mod.undistort_points(imu2, pts_t - shift, pts, sorted_t=True)
    else:
        pts_world_final = jnp.zeros_like(pts)

    pose_idx = sample2.count - 1
    # all small outputs packed into ONE vector: the host fetches it with a
    # single device->host transfer (the TPU tunnel costs ~ms per round-trip)
    packed = jnp.concatenate([
        sample2.pos[pose_idx].astype(jnp.float32),                    # 0:3
        sample2.rot[pose_idx].astype(jnp.float32),                    # 3:7
        jnp.stack([
            shift.astype(jnp.float32),                                # 7
            stats["iterations"].astype(jnp.float32),                  # 8
            stats["initial_cost"].astype(jnp.float32),                # 9
            stats["final_cost"].astype(jnp.float32),                  # 10
            stats["n_new_surfels"].astype(jnp.float32),               # 11
            stats["n_pairs_sld"].astype(jnp.float32),                 # 12
            stats["n_pairs_fix"].astype(jnp.float32),                 # 13
        ]),
        pred_pos.astype(jnp.float32),                                 # 14:17
        jnp.stack([
            stats["n_surfels_dropped"].astype(jnp.float32),           # 17
            stats["n_pairs_dropped"].astype(jnp.float32),             # 18
            stats["deg_trans_ratio"].astype(jnp.float32),             # 19
            stats["deg_rot_ratio"].astype(jnp.float32),               # 20
            stats["lm_lambda_final"].astype(jnp.float32),             # 21
        ]),
    ])
    outputs = dict(packed=packed, pts_world=pts_world_final, pts_valid=pts_valid)
    if stats_res is not None:
        outputs["residuals"] = stats_res
        outputs["residuals_pre"] = stats_res_pre
    return state.replace(sample=sample2, imu=imu2, sld=sld, fix=fix,
                         fix_geo=fix_geo), outputs


@partial(jax.jit, static_argnames=("cfg", "emit_cloud"), donate_argnames=("state",))
def process_sweep(
    state: WindowState,
    imu_t, imu_acc, imu_gyr, imu_n,
    sample_t, sample_n,
    pts, pts_t, pts_n,
    n_sample_drop, n_imu_drop, fix_first_pos,
    cfg: WildcatConfig,
    emit_cloud: bool = False,
):
    """One sweep per device dispatch (see :func:`_process_sweep_impl`)."""
    return _process_sweep_impl(
        state, imu_t, imu_acc, imu_gyr, imu_n, sample_t, sample_n,
        pts, pts_t, pts_n, n_sample_drop, n_imu_drop, fix_first_pos,
        cfg, emit_cloud)


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def process_sweeps_chained(
    state: WindowState,
    # every feed array carries a leading (k,) chunk axis
    imu_t, imu_acc, imu_gyr, imu_n,
    sample_t, sample_n,
    pts, pts_t, pts_n,
    n_sample_drop, n_imu_drop, fix_first_pos,
    cfg: WildcatConfig,
):
    """k sweeps in ONE device dispatch: ``lax.scan`` over the sweep body.

    The wall-clock attack for offline replay (the reference's rosbag loop,
    wildcat_slam_node.cc:86-98): through the TPU tunnel each dispatch + fetch
    round-trip costs ~30 ms — 68% of the per-sweep wall time at round-4 state
    (BENCH_r04) — and every sweep paid one. All of ``_prepare_feed``'s
    bookkeeping is host-only (it never reads device results), so offline
    replay can stage k sweeps of feeds and run them through one scan,
    amortizing the RPC floor k-fold. Streaming keeps the per-sweep path
    (chaining would add up to k sweeps of latency).

    Returns ``(state, packed)`` with packed (k, n_packed) — one row per sweep,
    fetched by the host in a single transfer.
    """
    feeds = (imu_t, imu_acc, imu_gyr, imu_n, sample_t, sample_n,
             pts, pts_t, pts_n, n_sample_drop, n_imu_drop, fix_first_pos)

    def body(st, feed):
        st, out = _process_sweep_impl(st, *feed, cfg=cfg, emit_cloud=False)
        return st, out["packed"]

    state, packed = jax.lax.scan(body, state, feeds)
    return state, packed


def _voxel_decimate_indices(xyz: np.ndarray, cap: int, size0: float) -> np.ndarray:
    """Spatially uniform decimation of an overfull sweep: keep the first point
    per voxel, coarsening the grid geometrically until the kept count fits the
    capacity. (The reference's DownSamplingVoxel, surfel_extraction.cc:228-302,
    documents the same intent — one representative per voxel.) Returns sorted
    indices into xyz, so the time order of the kept points is preserved."""
    size = float(size0)
    first = np.arange(min(len(xyz), cap))
    for _ in range(32):
        cell = np.clip(np.floor(xyz / size), -(2**20), 2**20 - 1).astype(np.int64) + 2**20
        key = (cell[:, 0] << 42) | (cell[:, 1] << 21) | cell[:, 2]
        _, first = np.unique(key, return_index=True)
        if len(first) <= cap:
            return np.sort(first)
        size *= 1.5
    return np.sort(first)[:cap]


# Chunked host point buffer (numpy twin of native/feeder.cc); kept under the
# historical name — see _ptbuf.py for the per-scan-cost rationale.
from wildcat_slam_tpu.odometry._ptbuf import ChunkedPointBuffer as _NumpyPointBuffer


class LidarOdometry:
    """Host-facing odometry frontend (mirrors LidarOdometry + the node driver).

    Usage:
        lo = LidarOdometry(WildcatConfig())
        lo.add_imu(t, acc, gyr)          # raw IMU, any rate
        lo.add_scan(times, points_lidar) # one lidar scan (lidar frame)
        lo.trajectory                    # [(t, pos(3), quat wxyz(4)), ...]

    ``use_native=True`` swaps the host feeder (point filtering/buffering and IMU
    resampling) for the C++ implementation in native/feeder.cc via ctypes; both
    paths are output-identical (tests/test_native.py).

    ``chunk_sweeps=k`` (offline replay): stage k sweeps of feeds host-side and
    run them through ONE device dispatch (:func:`process_sweeps_chained`),
    amortizing the host<->device round-trip k-fold. Reading ``trajectory`` /
    ``stats`` flushes any partial chunk first (padded with no-op feeds), so do
    it at end-of-run, not per sweep — mid-run reads are correct but pay the
    padding. Incompatible with cloud collection and debug_residuals (both
    need per-sweep device outputs).
    """

    def __init__(self, cfg: WildcatConfig = WildcatConfig(), collect_clouds: bool = False,
                 use_native: bool = False, chunk_sweeps: int = 1):
        self.cfg = cfg
        self.dtype = jnp.float32 if cfg.dtype == "float32" else jnp.float64
        self._np_dtype = np.float32 if cfg.dtype == "float32" else np.float64
        self.state = WindowState.empty(cfg, self.dtype)
        if use_native:
            from wildcat_slam_tpu.io import native

            self.resampler = native.NativeResampler(cfg.imu_rate)
            self.points = native.NativeFeeder(
                np.asarray(cfg.ext_lidar2imu_rot, np.float64).reshape(3, 3),
                cfg.ext_lidar2imu_pos, cfg.min_range, cfg.max_range,
                cfg.blind_box_min, cfg.blind_box_max)
        else:
            self.resampler = imu_mod.ImuResampler(cfg.imu_rate)
            self.points = _NumpyPointBuffer(cfg)
        self.use_native = use_native
        # dispatch=False turns the frontend into a pure host buffer/bookkeeper:
        # add_scan never runs the device step. The batched driver
        # (parallel/batch.py) owns the device state and steps B windows at
        # once through the sharded program, reusing _ready/_prepare_feed/
        # _commit from here.
        self.dispatch = True
        self.chunk = int(chunk_sweeps)
        if self.chunk < 1:
            raise ValueError(f"chunk_sweeps must be >= 1, got {chunk_sweeps}")
        if self.chunk > 1 and (collect_clouds or cfg.debug_residuals):
            raise ValueError(
                "chunk_sweeps > 1 is incompatible with collect_clouds / "
                "debug_residuals: both need per-sweep device outputs, which "
                "the chained dispatch does not emit")
        self._feed_queue: List[dict] = []  # prepared-but-undispatched sweeps
        self.imu_queue: List[tuple] = []   # resampled (t, acc, gyr), f64
        self._last_raw_imu_t: Optional[float] = None
        self._warned_overflow = False
        self.synced = False
        self.initialized = False
        self.epoch: Optional[float] = None
        self.sample_times: List[float] = []  # absolute f64 times of window sample states
        self.imu_front_time: Optional[float] = None  # absolute time of device imu[0]
        self.fix_first = True
        self.sweep_id = 0
        self._trajectory: List[tuple] = []
        self._stats: List[dict] = []
        self._pending: List[tuple] = []  # (back_t, device outputs) not yet fetched
        # cumulative host-side timing (seconds) for perf attribution: keys
        # prep (feed-array build), dispatch (process_sweep call until async
        # return), post (deferred-fetch bookkeeping); read via .timing
        self.timing = {"prep": 0.0, "dispatch": 0.0, "post": 0.0, "sweeps": 0}
        self.residuals: List[dict] = []  # pre/post-solve residual snapshots (debug)
        self.clouds: List[np.ndarray] = [] if collect_clouds else None
        self._stride = int(round(cfg.sample_dt * cfg.imu_rate))

    def _flush(self) -> None:
        self.flush_chunks()
        if not self._pending:
            return
        pending, self._pending = self._pending, []
        # one transfer per distinct device array: chunked entries share one
        # (k, n_packed) array — fetch it once, index rows on the host
        uniq: dict = {}
        for _, obj, _, _ in pending:
            uniq.setdefault(id(obj), obj)
        fetched = dict(zip(uniq.keys(), jax.device_get(list(uniq.values()))))
        for back, obj, host_stats, row in pending:
            v = fetched[id(obj)]
            v = np.asarray(v if row is None else v[row], np.float64)
            self._trajectory.append((back, v[0:3], v[3:7]))
            warn = self.cfg.degeneracy_warn_ratio
            self._stats.append(dict(
                shift=v[7], iterations=int(v[8]), initial_cost=v[9],
                final_cost=v[10], n_new_surfels=int(v[11]),
                n_pairs_sld=int(v[12]), n_pairs_fix=int(v[13]),
                pose_pos_pred=v[14:17],
                n_surfels_dropped=int(v[17]), n_pairs_dropped=int(v[18]),
                deg_trans_ratio=v[19], deg_rot_ratio=v[20],
                lm_lambda_final=v[21],
                degenerate=bool(warn > 0 and min(v[19], v[20]) < warn),
                **host_stats,
            ))

    @property
    def trajectory(self) -> List[tuple]:
        self._flush()
        return self._trajectory

    @trajectory.setter
    def trajectory(self, value) -> None:  # checkpoint restore
        self._pending = []
        self._trajectory = list(value)

    @property
    def stats(self) -> List[dict]:
        self._flush()
        return self._stats

    # ------------------------------------------------------------------ IMU
    def add_imu(self, t: float, acc, gyr):
        """One raw IMU message. Raises on out-of-order timestamps (covers both
        the numpy and native resamplers; mirrors the add_scan ordering check)."""
        if self._last_raw_imu_t is not None and t < self._last_raw_imu_t:
            raise ValueError(
                f"IMU sample at {t:.6f} arrived before the previous raw sample "
                f"{self._last_raw_imu_t:.6f}; IMU messages must be time-ordered")
        self._last_raw_imu_t = float(t)
        for tt, aa, gg in self.resampler.add(t, acc, gyr):
            self.imu_queue.append((tt, aa, gg))

    # ----------------------------------------------------------------- scan
    def add_scan(self, times: np.ndarray, points_lidar: np.ndarray):
        """One lidar scan: per-point absolute times (sorted) + (N, 3) points in
        the lidar frame. Applies extrinsic + filters (cc:489-496) and buffers.
        Raises on non-monotonic point times (the reference CHECK-aborts,
        lidar_odometry.cc:491)."""
        times = np.ascontiguousarray(times, np.float64)
        if len(times):
            if np.any(np.diff(times) < 0):
                raise ValueError("point times within a scan must be non-decreasing")
            if len(self.points) and times[0] < self.points.back_time:
                raise ValueError(
                    f"scan starts at {times[0]:.6f} before the buffered tail "
                    f"{self.points.back_time:.6f}; scans must arrive in time order")
        self.points.add_points(times, np.ascontiguousarray(points_lidar, np.float32))
        while self.dispatch and self._try_process():
            pass

    # ------------------------------------------------------------- internals
    def _sync(self) -> bool:
        if self.synced:
            return True
        if not self.imu_queue or len(self.points) == 0:
            return False
        if self.imu_queue[-1][0] < self.points.front_time:
            return False
        while self.imu_queue and self.imu_queue[0][0] < self.points.front_time:
            self.imu_queue.pop(0)
        self.points.drop_before(self.imu_queue[0][0])
        if len(self.points) == 0:
            return False
        self.synced = True
        return True

    def _ready(self) -> bool:
        """True when a complete sweep (and, pre-init, the two bootstrap IMU
        samples) is buffered. Pure readiness check — no state changes beyond
        the head sync."""
        cfg = self.cfg
        if not self._sync() or len(self.points) == 0 or not self.imu_queue:
            return False
        sweep_end = self.points.front_time + cfg.sweep_duration
        if self.points.back_time < sweep_end:
            return False
        # wait until IMU covers one tick past the last new sample state
        if self.imu_queue[-1][0] < sweep_end + 1.0 / cfg.imu_rate:
            return False
        if not self.initialized and len(self.imu_queue) < 2:
            return False
        return True

    def _init_args(self):
        """Pop the two bootstrap IMU samples and build the init_window feed
        (host bookkeeping committed here). Caller must have checked _ready()."""
        (t0, a0, g0), (t1, a1, g1) = self.imu_queue[0], self.imu_queue[1]
        np_dtype = self._np_dtype
        self.epoch = t0
        args = (np.asarray([0.0, t1 - t0], np_dtype),
                np.stack([a0, a1]).astype(np_dtype),
                np.stack([g0, g1]).astype(np_dtype))
        self.imu_queue = self.imu_queue[2:]
        self.sample_times = [t0]
        self.imu_front_time = t0
        self.initialized = True
        return args

    def _try_process(self) -> bool:
        cfg = self.cfg
        if not self._ready():
            return False

        _tm0 = time.perf_counter()
        if not self.initialized:
            self.state = init_window(self.state, *self._init_args(), cfg)

        prep = self._prepare_feed()
        _tm1 = time.perf_counter()
        if self.chunk > 1:
            # chained mode: stage the feed; dispatch once a full chunk exists
            self._feed_queue.append(prep)
            self.timing["prep"] += _tm1 - _tm0
            self.timing["sweeps"] += 1
            if len(self._feed_queue) >= self.chunk:
                q, self._feed_queue = self._feed_queue, []
                self._dispatch_chunk(q)
            return True
        # numpy args go straight into the jitted call: one transfer each inside
        # the dispatch, no separate asarray/convert round-trips per argument
        state, out = process_sweep(self.state, *prep["args"], cfg,
                                   emit_cloud=self.clouds is not None)
        self.state = state
        _tm2 = time.perf_counter()
        self._commit(out, prep["back"], prep["host_stats"])
        _tm3 = time.perf_counter()
        self.timing["prep"] += _tm1 - _tm0
        self.timing["dispatch"] += _tm2 - _tm1
        self.timing["post"] += _tm3 - _tm2
        self.timing["sweeps"] += 1
        return True

    def _dispatch_chunk(self, preps: List[dict]) -> None:
        """Run len(preps) staged sweeps (noop-padded to the chunk size) through
        ONE :func:`process_sweeps_chained` dispatch; their packed outputs come
        back as one (k, n_packed) array fetched in a single transfer."""
        _tm1 = time.perf_counter()
        feeds = [p["args"] for p in preps]
        # pad a partial tail chunk with no-op feeds so the compiled (k,)-shape
        # program is reused; the padding rows' outputs are discarded (the
        # extra solves only refine the final window state, after every real
        # sweep's pose has been produced)
        while len(feeds) < self.chunk:
            feeds.append(self.noop_feed())
        stacked = [np.stack([f[j] for f in feeds]) for j in range(len(feeds[0]))]
        self.state, packed = process_sweeps_chained(self.state, *stacked, self.cfg)
        _tm2 = time.perf_counter()
        packed.copy_to_host_async()
        for i, p in enumerate(preps):
            self._pending.append((p["back"], packed, p["host_stats"], i))
            self.sweep_id += 1
        self.timing["dispatch"] += _tm2 - _tm1
        self.timing["post"] += time.perf_counter() - _tm2

    def flush_chunks(self) -> None:
        """Dispatch any staged-but-undispatched sweeps (chunked mode) as one
        noop-padded final chunk. Reading ``trajectory``/``stats`` calls this;
        no-op when the queue is empty or chunking is off."""
        if self._feed_queue:
            q, self._feed_queue = self._feed_queue, []
            self._dispatch_chunk(q)

    def _prepare_feed(self) -> dict:
        """Build one sweep's padded feed arrays and commit the sweep's host
        bookkeeping (queues popped, window-trim counts, epoch rebase). Returns
        {"args": process_sweep positional args after state, "back": absolute
        back-sample time, "host_stats": host-side counters}. Caller must have
        checked _ready() (and initialized the window). Shared verbatim by the
        single-window path above and the batched driver
        (parallel/batch.py)."""
        cfg = self.cfg
        sweep_end = self.points.front_time + cfg.sweep_duration

        # --- new sample states on the exact grid of resampled IMU times ---
        last_sample_t = self.sample_times[-1]
        n_add = int((sweep_end - last_sample_t) / cfg.sample_dt)
        new_sample_abs = [last_sample_t + cfg.sample_dt * (k + 1) for k in range(n_add)]
        # snap to the actual resampled grid values to keep exact equality
        t0_grid = self.resampler._t0
        rate = cfg.imu_rate
        new_sample_abs = [t0_grid + round((t - t0_grid) * rate) / rate for t in new_sample_abs]
        sample_back_abs = new_sample_abs[-1] if new_sample_abs else last_sample_t

        # --- IMU feed: all resampled samples up to one tick past sample back ---
        feed_until = sample_back_abs + 1.5 / rate  # include back+1 tick, exclude back+2
        k_feed = 0
        while k_feed < len(self.imu_queue) and self.imu_queue[k_feed][0] < feed_until:
            k_feed += 1
        feed = self.imu_queue[:k_feed]
        self.imu_queue = self.imu_queue[k_feed:]

        # feed arrays are built directly in the device dtype: converting on
        # device (jnp.asarray(np_f64, f32)) dispatches one convert_element_type
        # pjit per array per sweep — measured ~0.6 ms each through the TPU
        # tunnel — and transfers double-width bytes; the host-side cast is the
        # same IEEE rounding
        np_dtype = self._np_dtype
        kmax = int(cfg.sweep_duration * cfg.imu_rate) + 32
        if k_feed > kmax:
            raise RuntimeError(f"IMU feed {k_feed} exceeds capacity {kmax}")
        imu_t = np.zeros((kmax,), np_dtype)
        imu_acc = np.zeros((kmax, 3), np_dtype)
        imu_gyr = np.zeros((kmax, 3), np_dtype)
        for i, (tt, aa, gg) in enumerate(feed):
            imu_t[i], imu_acc[i], imu_gyr[i] = tt - self.epoch, aa, gg

        amax = int(cfg.sweep_duration / cfg.sample_dt) + 8
        sam_t = np.zeros((amax,), np_dtype)
        for i, tt in enumerate(new_sample_abs):
            sam_t[i] = tt - self.epoch

        # --- sweep points: all buffered points before the new sample back ---
        cap_p = cfg.max_points_per_sweep
        p_t = np.zeros((cap_p,), np.float32)
        p_xyz = np.zeros((cap_p, 3), np.float32)
        n_avail = self.points.count_until(sample_back_abs)
        n_pts_dropped = 0
        if n_avail > cap_p:
            # overfull sweep: pop everything, then decimate (spatially uniform)
            # or truncate — either way the loss is counted, never silent
            tmp_t = np.zeros((n_avail,), np.float32)
            tmp_xyz = np.zeros((n_avail, 3), np.float32)
            self.points.pop_sweep(sample_back_abs, self.epoch, tmp_t, tmp_xyz)
            if cfg.overflow_decimate:
                keep = _voxel_decimate_indices(tmp_xyz, cap_p, cfg.decimate_voxel_size)
            else:
                keep = np.arange(cap_p)
            n_pts_cap = len(keep)
            p_t[:n_pts_cap] = tmp_t[keep]
            p_xyz[:n_pts_cap] = tmp_xyz[keep]
            n_pts_dropped = n_avail - n_pts_cap
            if not self._warned_overflow:
                import warnings
                warnings.warn(
                    f"sweep {self.sweep_id}: {n_avail} points exceed "
                    f"max_points_per_sweep={cap_p}; "
                    + ("voxel-decimated to fit" if cfg.overflow_decimate
                       else "tail truncated")
                    + f" ({n_pts_dropped} dropped). Raise the capacity or keep "
                    "overflow_decimate on; per-sweep counts are in stats"
                    "['n_points_dropped'].")
                self._warned_overflow = True
        else:
            n_pts_cap = self.points.pop_sweep(sample_back_abs, self.epoch, p_t, p_xyz)

        # --- host-side window trim bookkeeping (exact f64 grid) ---
        all_samples = self.sample_times + new_sample_abs
        # capacity checks: the shrink runs after appending, so the transient
        # counts must fit (silent dynamic_update_slice clamping would corrupt)
        if len(all_samples) > cfg.max_sample_states:
            raise RuntimeError(
                f"sample window {len(all_samples)} exceeds max_sample_states="
                f"{cfg.max_sample_states}; raise the capacity")
        n_imu_after = int(round((sample_back_abs - self.imu_front_time) * rate)) + 2
        if n_imu_after > cfg.max_imu_states:
            raise RuntimeError(
                f"imu window {n_imu_after} exceeds max_imu_states="
                f"{cfg.max_imu_states}; raise the capacity")
        back = all_samples[-1]
        thr = cfg.sliding_window_duration + 0.5 * cfg.sample_dt
        n_drop = sum(1 for t in all_samples if back - t > thr)
        new_front = all_samples[n_drop]
        # device imu ticks are contiguous from imu_front_time; drop all before new_front
        n_imu_drop = max(0, int(round((new_front - self.imu_front_time) * rate)))
        fix_first = self.fix_first

        # host bookkeeping updates (all pure-host values — committed before
        # dispatch so the batched driver can stack feeds from many windows
        # before any device call)
        self.sample_times = all_samples[n_drop:]
        self.imu_front_time = new_front
        if n_drop > 0:
            self.fix_first = False
        self.epoch = new_front

        return dict(
            args=(imu_t, imu_acc, imu_gyr, np.int32(k_feed),
                  sam_t, np.int32(n_add),
                  p_xyz.astype(np_dtype, copy=False), p_t.astype(np_dtype, copy=False),
                  np.int32(n_pts_cap),
                  np.int32(n_drop), np.int32(n_imu_drop),
                  np.bool_(fix_first)),
            back=back,
            host_stats=dict(n_points_in=n_avail, n_points_fed=n_pts_cap,
                            n_points_dropped=n_pts_dropped),
        )

    def noop_feed(self) -> tuple:
        """A zero-count feed with the sweep's static shapes: propagates no IMU,
        adds no sample states or points, trims nothing. Used by the batched
        driver to keep exhausted windows in lockstep (parallel/batch.py); the
        device step still runs but every input is masked out."""
        cfg = self.cfg
        np_dtype = self._np_dtype
        kmax = int(cfg.sweep_duration * cfg.imu_rate) + 32
        amax = int(cfg.sweep_duration / cfg.sample_dt) + 8
        cap_p = cfg.max_points_per_sweep
        return (np.zeros((kmax,), np_dtype), np.zeros((kmax, 3), np_dtype),
                np.zeros((kmax, 3), np_dtype), np.int32(0),
                np.zeros((amax,), np_dtype), np.int32(0),
                np.zeros((cap_p, 3), np_dtype), np.zeros((cap_p,), np_dtype),
                np.int32(0),
                np.int32(0), np.int32(0), np.bool_(self.fix_first))

    def _commit(self, out: dict, back: float, host_stats: dict) -> None:
        """Post-dispatch bookkeeping for one sweep: defer the device->host
        fetch — the caller returns right after dispatch so the next sweep's
        host-side preparation overlaps this sweep's device compute; the packed
        output's transfer starts immediately (async) and is materialized
        lazily by the trajectory/stats accessors."""
        out["packed"].copy_to_host_async()
        self._pending.append((back, out["packed"], host_stats, None))
        if "residuals" in out:
            rs, rsv, ri, riv = jax.device_get(out["residuals"])
            entry = dict(
                surfel=np.asarray(rs)[np.asarray(rsv)],
                imu=np.asarray(ri)[np.asarray(riv)],
            )
            rs, rsv, ri, riv = jax.device_get(out["residuals_pre"])
            entry["surfel_pre"] = np.asarray(rs)[np.asarray(rsv)]
            entry["imu_pre"] = np.asarray(ri)[np.asarray(riv)]
            self.residuals.append(entry)
        if self.clouds is not None:
            pts_w, pv = jax.device_get((out["pts_world"], out["pts_valid"]))
            self.clouds.append(np.asarray(pts_w)[np.asarray(pv)])
        self.sweep_id += 1
