"""Typed, serializable configuration for the whole pipeline.

Consolidates the reference's scattered constants into one dataclass:
- ``LioConfig`` hard-coded values (lio_config.h:8-46),
- call-site magic numbers (surfel_extraction.cc:24,33,327; cost_functor.h:24,112;
  lidar_odometry.cc:270; knn_surfel_matcher.h:37-41),
- plus the static capacities the TPU build needs for shape-static jit.
"""

from __future__ import annotations

import dataclasses
import json
import math
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class WildcatConfig:
    # ----- IMU noise model (lio_config.h:10-14) -----
    gyroscope_noise_density: float = 0.00015198973532354657
    accelerometer_noise_density: float = 0.006308226052016165
    gyroscope_random_walk: float = 0.00011673723527962174
    accelerometer_random_walk: float = 2.664506559330434e-06
    imu_factor_weight: float = 0.01

    # ----- Preprocess (lio_config.h:18-29) -----
    max_range: float = 120.0
    min_range: float = 0.3
    # Axis-aligned blind box around the sensor, in the IMU frame.
    blind_box_min: Tuple[float, float, float] = (-0.8, -0.5, -0.4)
    blind_box_max: Tuple[float, float, float] = (0.3, 0.5, 0.4)
    # lidar -> imu extrinsic for the Hilti rig: rotation matrix rows + translation.
    ext_lidar2imu_rot: Tuple[float, ...] = (
        -5.32125e-08, -1.0, 0.0,
        -1.0, -5.32125e-08, -0.0,
        0.0, 0.0, -1.0,
    )
    ext_lidar2imu_pos: Tuple[float, float, float] = (-0.001, -0.00855, 0.055)

    # ----- Windows (lio_config.h:32-36) -----
    imu_rate: float = 200.0
    sample_dt: float = 0.08
    fixed_window_duration: float = 20.0
    sliding_window_duration: float = 6.0
    sweep_duration: float = 0.5

    # ----- Optimization (lio_config.h:39-41; lidar_odometry.cc:270,551-561) -----
    gravity_norm: float = 9.81
    outer_iter_num_max: int = 1
    inner_iter_num_max: int = 100
    cauchy_loss_scale: float = 0.4          # lidar_odometry.cc:270
    surfel_sigma_floor: float = 0.05 / 6.0  # cost_functor.h:24,112

    # ----- Surfel extraction (surfel_extraction.cc:24,33,327) -----
    voxel_size: float = 0.8
    max_voxel_depth: int = 2                 # octree max_layer
    min_points_per_plane: int = 20           # layer_point_size + cluster min size
    planer_threshold: float = 0.01           # min eigenvalue bound
    min_plane_likeness: float = 0.1          # 2(l_mid-l_min)/sum(l)
    cluster_time_gap: float = 0.05           # ClusterSurfels time split

    # ----- Correspondence search (knn_surfel_matcher.h:37-41) -----
    match_center_dist: float = 1.0
    match_angular_dist: float = 5.0 * math.pi / 180.0
    match_surfel_dist: float = 0.1
    match_knn: int = 10
    # TPU partial-reduce top-k (lax.approx_max_k, recall 0.95) for the KNN; set
    # False for exact lax.top_k when debugging correspondence parity
    match_knn_approx: bool = True
    match_time_diff: float = 0.06

    # ----- TPU static capacities (no reference analog; sized from the data regime:
    # 6 s window / 0.08 s samples = 76 states, 200 Hz imu * 6 s = 1201 states;
    # capacities must absorb one extra sweep because the window shrink runs
    # AFTER the new sweep is appended, mirroring the reference's order) -----
    max_points_per_sweep: int = 65536
    # Overfull-sweep policy: when a sweep exceeds max_points_per_sweep, keep the
    # first point per voxel on a geometrically coarsening grid until it fits
    # (spatially uniform; the reference's DownSamplingVoxel,
    # surfel_extraction.cc:228-302, documents the same intent). With the policy
    # off, the sweep tail beyond capacity is truncated. Either way the dropped
    # count is surfaced per sweep in LidarOdometry.stats (n_points_dropped).
    overflow_decimate: bool = True
    decimate_voxel_size: float = 0.02  # starting grid; coarsened x1.5 until fit
    max_sample_states: int = 96
    max_imu_states: int = 1536
    max_surfels_per_sweep: int = 1024
    max_surfels_sliding: int = 8192
    max_surfels_fixed: int = 16384
    max_correspondences: int = 8192
    max_voxels_per_sweep: int = 8192
    max_leaves_per_sweep: int = 16384

    # ----- Solver details (TPU Gauss-Newton replacing Ceres LM) -----
    # (the LM damping schedule is Nielsen's gain-ratio rule, which has no
    # up/down factors — only the initial lambda is tunable)
    gn_initial_lambda: float = 1e-4
    # sorted-stamp undistortion fast path (tick-diff scatter + running sum);
    # False selects the per-point gather path — a config field, not an env var,
    # so the A/B toggle participates in the jit cache key
    sorted_undistort: bool = True
    # measured on synthetic 8 s sequences: 1e-3 converges in ~4 LM iterations
    # with equal-or-better ATE than 1e-6 (which averages ~17) — the late
    # iterations chase sensor noise (Ceres' default 1e-6 is tuned for generic
    # problems, not this windowed re-solve-every-sweep regime)
    gn_function_tolerance: float = 1e-3
    # block-Jacobi PCG with a small fixed budget: measured equal to dense
    # Cholesky at steady state (3-4 LM iterations) and ~2x faster on
    # iteration-heavy early sweeps; LM only needs a descent step, so an
    # inexact solve is fine. "pcg" auto-selects the fused Pallas kernel
    # (ops/pcg_pallas.py, H + preconditioner VMEM-resident) on TPU backends
    # and the portable lax.while_loop elsewhere; "pcg_xla" forces the
    # portable path; "cholesky" remains available
    linear_solver: str = "pcg"
    pcg_iters: int = 24
    pcg_tol: float = 1e-2
    debug_residuals: bool = False  # return post-solve residual vectors per sweep
    # Degeneracy health signal (no reference analog): per sweep the pipeline
    # computes scale-free direction-coverage ratios in [0, 1] for translation
    # and rotation (factors.direction_coverage). A sweep whose min ratio falls
    # below this threshold is flagged `degenerate` in stats — the pose is still
    # produced, but the geometry under-constrains some motion direction
    # (corridor without cross walls, rotationally symmetric room) and the
    # estimate can drift silently there. 0 disables the flag. The default is
    # calibrated on the validation regimes (MEASUREMENTS.md round 4): nominal
    # rooms sit at >= 0.15 on both ratios; the known-weak scenes (sparse-door
    # corridor, cylinder) fall one-plus orders of magnitude below it.
    degeneracy_warn_ratio: float = 0.02
    # Degeneracy solution remapping (Zhang & Singh ICRA'16 §V adapted to the
    # joint lidar+IMU solve; factors.degeneracy_projectors +
    # solver.solve_window remap_step): when a direction-coverage eigenvalue
    # falls below degeneracy_remap_ratio * lambda_max, every LM step's
    # common-mode translation/rotation component along that axis is removed —
    # the pose dead-reckons on IMU there instead of random-walking on lidar
    # noise. Exact no-op on healthy scenes (the projectors are exact zeros
    # when no direction is weak). A/B validation (MEASUREMENTS.md round 5) is
    # REGIME-DEPENDENT, which is why the default stays False: at sparse
    # configs where the weak eigenvalue is truly null (CPU small-config
    # cylinder: 39.3 -> 3.8 mm) the remap suppresses the random walk 10x, but
    # at the shipped 64k config the same scene's "weak" axis (ratio 2.3e-3 of
    # a large lambda_max) still aggregates enough absolute constraint that
    # solving beats dead-reckoning — remap measured 11.6 -> 34.0 mm (6 s) and
    # 17.4 -> 45.5 mm (15 s) WORSE on real TPU. Enable only for feature-poor
    # sensors/configs where flagged sweeps show visible along-axis drift.
    # The reference solves blind in degenerate geometry
    # (lidar_odometry.cc:540-562 — no analog).
    degeneracy_remap: bool = False
    degeneracy_remap_ratio: float = 0.02
    dtype: str = "float32"

    def __post_init__(self):
        """Fail at construction, not at trace time: an invalid iteration count
        or capacity otherwise surfaces as an opaque KeyError/bad-shape deep in
        the jitted pipeline (the reference hard-codes these, lio_config.h:39-41,
        so it has no equivalent failure mode to mirror)."""
        if self.outer_iter_num_max < 1:
            raise ValueError(
                f"outer_iter_num_max must be >= 1, got {self.outer_iter_num_max} "
                "(the reference hard-codes 1, lio_config.h:40)")
        if self.inner_iter_num_max < 1:
            raise ValueError(
                f"inner_iter_num_max must be >= 1, got {self.inner_iter_num_max}")
        for name in ("max_points_per_sweep", "max_sample_states", "max_imu_states",
                     "max_surfels_per_sweep", "max_surfels_sliding",
                     "max_surfels_fixed", "max_correspondences",
                     "max_voxels_per_sweep", "max_leaves_per_sweep", "pcg_iters"):
            v = getattr(self, name)
            if not isinstance(v, int) or v < 1:
                raise ValueError(f"{name} must be a positive int, got {v!r}")
        for name in ("imu_rate", "sample_dt", "sweep_duration",
                     "sliding_window_duration", "fixed_window_duration",
                     "voxel_size", "decimate_voxel_size"):
            v = getattr(self, name)
            if not v > 0:
                raise ValueError(f"{name} must be > 0, got {v!r}")
        if self.linear_solver not in ("pcg", "pcg_xla", "cholesky"):
            raise ValueError(
                f"linear_solver must be one of 'pcg', 'pcg_xla', 'cholesky'; "
                f"got {self.linear_solver!r}")
        if not 0.0 <= self.degeneracy_warn_ratio < 1.0:
            raise ValueError(
                f"degeneracy_warn_ratio must be in [0, 1), got "
                f"{self.degeneracy_warn_ratio!r} (the ratios it thresholds are "
                "lambda_min/lambda_max values in [0, 1]; 0 disables the flag)")
        if not 0.0 < self.degeneracy_remap_ratio < 1.0:
            raise ValueError(
                f"degeneracy_remap_ratio must be in (0, 1), got "
                f"{self.degeneracy_remap_ratio!r} (eigenvalues below "
                "remap_ratio * lambda_max count as unobserved directions; "
                "disable remapping with degeneracy_remap=False, not ratio 0)")
        if self.dtype not in ("float32", "float64"):
            raise ValueError(f"dtype must be 'float32' or 'float64', got {self.dtype!r}")

    # ----- Derived cost weights (lio_config.h:42-45) -----
    @property
    def weight_gyr(self) -> float:
        return 1.0 / (self.gyroscope_noise_density * math.sqrt(self.imu_rate)) * self.imu_factor_weight

    @property
    def weight_acc(self) -> float:
        return 1.0 / (self.accelerometer_noise_density * math.sqrt(self.imu_rate)) * self.imu_factor_weight

    @property
    def weight_bg(self) -> float:
        return 1.0 / (self.gyroscope_random_walk / math.sqrt(self.imu_rate)) * self.imu_factor_weight

    @property
    def weight_ba(self) -> float:
        return 1.0 / (self.accelerometer_random_walk / math.sqrt(self.imu_rate)) * self.imu_factor_weight

    @property
    def imu_dt(self) -> float:
        return 1.0 / self.imu_rate

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "WildcatConfig":
        d = json.loads(s)
        d = {k: tuple(v) if isinstance(v, list) else v for k, v in d.items()}
        return cls(**d)

    def replace(self, **kw) -> "WildcatConfig":
        return dataclasses.replace(self, **kw)
