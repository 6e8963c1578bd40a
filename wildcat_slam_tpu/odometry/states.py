"""Fixed-capacity, mask-validated state containers (JAX pytrees).

Re-designs the reference's pointer-based state model (surfel.h:9-127 —
``SampleState``, ``ImuState``, ``Surfel`` held in ``std::deque``s) as
structure-of-arrays pytrees with static capacity + validity masks, so the whole
per-sweep window solve is shape-static under jit. Ring-buffer semantics (the
reference's deque pops in ``ShrinkToFit``, lidar_odometry.cc:228-251) become
masked shifts over these arrays.

Conventions:
- Quaternions are (N, 4) wxyz, body->world.
- Timestamps on device are **window-relative** in the compute dtype: absolute f64
  stamps stay on the host (the pipeline keeps a float64 epoch and rebases each
  window), because absolute Unix stamps do not fit f32 and TPUs have no fast f64.
- ``count`` is a traced scalar (int32); slots [0, count) are valid and contiguous.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from wildcat_slam_tpu.ops import lie


@struct.dataclass
class SampleStates:
    """The 12-dof optimization nodes sampled every ``sample_dt`` (surfel.h:9-23).

    ``cor`` packs [rot_cor(3), pos_cor(3), bg(3), ba(3)] exactly like the
    reference's ``data_cor[12]``. ``rot``/``pos`` are the nominal pose; the solver
    estimates corrections which are then folded in by ``UpdateSamplePoses``
    semantics (lidar_odometry.cc:172-179).
    """

    t: jnp.ndarray        # (S,) f64 timestamps
    rot: jnp.ndarray      # (S, 4) wxyz
    pos: jnp.ndarray      # (S, 3)
    cor: jnp.ndarray      # (S, 12) [rot_cor, pos_cor, bg, ba]
    count: jnp.ndarray    # () int32 number of valid entries
    grav: jnp.ndarray     # (3,) gravity in world (reference keeps per-state but
                          # only ever uses back()'s: lidar_odometry.cc:341,406-408)

    @property
    def capacity(self) -> int:
        return self.t.shape[0]

    @property
    def mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity) < self.count

    @property
    def rot_cor(self) -> jnp.ndarray:
        return self.cor[:, 0:3]

    @property
    def pos_cor(self) -> jnp.ndarray:
        return self.cor[:, 3:6]

    @property
    def bg(self) -> jnp.ndarray:
        return self.cor[:, 6:9]

    @property
    def ba(self) -> jnp.ndarray:
        return self.cor[:, 9:12]

    @classmethod
    def empty(cls, capacity: int, dtype=jnp.float32) -> "SampleStates":
        return cls(
            t=jnp.zeros((capacity,), dtype),
            rot=lie.quat_identity((capacity,), dtype),
            pos=jnp.zeros((capacity, 3), dtype),
            cor=jnp.zeros((capacity, 12), dtype),
            count=jnp.asarray(0, jnp.int32),
            grav=jnp.zeros((3,), dtype),
        )

    def apply_corrections(self) -> "SampleStates":
        """UpdateSamplePoses (lidar_odometry.cc:172-179): fold corrections into the
        nominal pose and zero them. bg/ba persist (they are states, not corrections).
        """
        new_rot = lie.quat_mul(lie.exp_quat(self.rot_cor), self.rot)
        new_pos = self.pos_cor + self.pos
        m = self.mask
        rot = jnp.where(m[:, None], new_rot, self.rot)
        pos = jnp.where(m[:, None], new_pos, self.pos)
        cor = self.cor.at[:, 0:6].set(0.0)
        return self.replace(rot=lie.quat_normalize(rot), pos=pos, cor=cor)


@struct.dataclass
class ImuStates:
    """Per-IMU-tick states (surfel.h:25-33): timestamp, pose, and the resampled
    measurements that produced it."""

    t: jnp.ndarray      # (I,) f64
    rot: jnp.ndarray    # (I, 4)
    pos: jnp.ndarray    # (I, 3)
    acc: jnp.ndarray    # (I, 3)
    gyr: jnp.ndarray    # (I, 3)
    count: jnp.ndarray  # () int32

    @property
    def capacity(self) -> int:
        return self.t.shape[0]

    @property
    def mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity) < self.count

    @classmethod
    def empty(cls, capacity: int, dtype=jnp.float32) -> "ImuStates":
        return cls(
            t=jnp.zeros((capacity,), dtype),
            rot=lie.quat_identity((capacity,), dtype),
            pos=jnp.zeros((capacity, 3), dtype),
            acc=jnp.zeros((capacity, 3), dtype),
            gyr=jnp.zeros((capacity, 3), dtype),
            count=jnp.asarray(0, jnp.int32),
        )


@struct.dataclass
class Surfels:
    """Planar patches with body-frame geometry + an attached pose (surfel.h:35-122).

    The reference lazily converts world->body on the first ``UpdatePose``
    (surfel.h:48-58); here extraction emits world-frame geometry and the pipeline
    converts to body-frame in one batched step when poses are attached, so device
    state always stores body-frame geometry + pose.
    """

    t: jnp.ndarray            # (N,) f64 mean point timestamp
    center: jnp.ndarray       # (N, 3) body frame
    cov: jnp.ndarray          # (N, 3, 3) body frame
    norm: jnp.ndarray         # (N, 3) body frame, sign fixed toward viewpoint
    rot: jnp.ndarray          # (N, 4) body->world
    pos: jnp.ndarray          # (N, 3) body->world
    resolution: jnp.ndarray   # (N,) cell size the surfel came from
    std: jnp.ndarray          # (N,) sqrt(lambda_min) plane thickness
    valid: jnp.ndarray        # (N,) bool — surfel slots need not be contiguous

    @property
    def capacity(self) -> int:
        return self.t.shape[0]

    @property
    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32))

    @classmethod
    def empty(cls, capacity: int, dtype=jnp.float32) -> "Surfels":
        return cls(
            t=jnp.zeros((capacity,), dtype),
            center=jnp.zeros((capacity, 3), dtype),
            cov=jnp.zeros((capacity, 3, 3), dtype),
            norm=jnp.zeros((capacity, 3), dtype),
            rot=lie.quat_identity((capacity,), dtype),
            pos=jnp.zeros((capacity, 3), dtype),
            resolution=jnp.zeros((capacity,), dtype),
            std=jnp.zeros((capacity,), dtype),
            valid=jnp.zeros((capacity,), bool),
        )

    # --- world-frame accessors (surfel.h:67-91) ---
    def center_world(self) -> jnp.ndarray:
        return lie.quat_rotate(self.rot, self.center) + self.pos

    def norm_world(self) -> jnp.ndarray:
        return lie.quat_rotate(self.rot, self.norm)

    def cov_world(self) -> jnp.ndarray:
        r = lie.quat_to_matrix(self.rot)
        hp = jax.lax.Precision.HIGHEST  # true f32 (TPU matmul defaults to bf16)
        return jnp.matmul(jnp.matmul(r, self.cov, precision=hp),
                          jnp.swapaxes(r, -1, -2), precision=hp)
