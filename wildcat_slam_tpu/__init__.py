"""wildcat_slam_tpu — TPU-native (JAX/XLA/Pallas) continuous-time lidar-inertial odometry.

A from-scratch rebuild of the capabilities of kekeliu-whu/Wildcat-SLAM (an unofficial
implementation of the Wildcat paper, arXiv:2205.12595). The reference's C++/ROS/Ceres
stack is re-designed as a functional JAX library:

- ``ops``      — compute primitives: Lie-group math, splines, batched 3x3 eigh,
                 voxel hashing, correspondence search, and the fused Pallas PCG
                 solver (pcg_pallas.py, VMEM-resident H + preconditioner). The
                 other hot ops are deliberately expressed as XLA-friendly
                 dense/segmented algebra — payload-carrying sorts, running-sum
                 range reductions, MXU contractions, approx_max_k — chosen per
                 measured profile (docs/ARCHITECTURE.md "kernel strategy").
- ``odometry`` — the sliding-window odometry core: states, IMU propagation, sweep
                 undistortion, surfel extraction, factors, Gauss-Newton solver,
                 window management, and the host-facing pipeline.
- ``parallel`` — jax.sharding mesh utilities and multi-window data parallelism.
- ``io``       — dataset readers (synthetic trajectories, Hilti-format clouds),
                 trajectory export (TUM format).
- ``utils``    — histogram diagnostics, profiling, config plumbing.
- ``viz``      — surfel/trajectory export for external viewers (no ROS dependency).

Layer map of the reference is documented in /root/repo/SURVEY.md; each module here
cites the reference files (file:line) whose behavior it covers.
"""

from wildcat_slam_tpu.config import WildcatConfig

__all__ = ["WildcatConfig"]
__version__ = "0.1.0"
