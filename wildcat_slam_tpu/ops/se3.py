"""SE(3) rigid transforms as (quaternion, translation) pairs.

Equivalent of the reference's Cartographer-derived ``Rigid3<T>``
(common/rigid_transform.h:35-144: identity/rotation/translation constructors,
composition, inverse, point and cloud transforms). Batched and functional: a
transform is a ``(q (...,4) wxyz, t (...,3))`` tuple, composable with vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from wildcat_slam_tpu.ops import lie


class Rigid3(NamedTuple):
    q: jnp.ndarray  # (..., 4) wxyz
    t: jnp.ndarray  # (..., 3)

    @classmethod
    def identity(cls, shape=(), dtype=jnp.float32) -> "Rigid3":
        return cls(lie.quat_identity(shape, dtype), jnp.zeros(tuple(shape) + (3,), dtype))

    @classmethod
    def rotation(cls, q: jnp.ndarray) -> "Rigid3":
        return cls(q, jnp.zeros(q.shape[:-1] + (3,), q.dtype))

    @classmethod
    def translation(cls, t: jnp.ndarray) -> "Rigid3":
        return cls(lie.quat_identity(t.shape[:-1], t.dtype), t)

    @classmethod
    def from_matrix(cls, rot: jnp.ndarray, t: jnp.ndarray) -> "Rigid3":
        """From a (..., 3, 3) rotation matrix + translation (e.g. the config's
        extrinsic, lio_config.h:23-29)."""
        # Shepperd's method, branch-free via the w-dominant form is enough here
        # because extrinsics are far from the w=0 singularity; for general
        # matrices use the 4-branch max-diagonal method.
        w = 0.5 * jnp.sqrt(jnp.clip(1.0 + rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2], 1e-12))
        x = (rot[..., 2, 1] - rot[..., 1, 2]) / (4 * w)
        y = (rot[..., 0, 2] - rot[..., 2, 0]) / (4 * w)
        z = (rot[..., 1, 0] - rot[..., 0, 1]) / (4 * w)
        q = lie.quat_normalize(jnp.stack([w, x, y, z], axis=-1))
        return cls(q, t)

    def compose(self, other: "Rigid3") -> "Rigid3":
        """self * other (rigid_transform.h operator*)."""
        return Rigid3(
            lie.quat_normalize(lie.quat_mul(self.q, other.q)),
            lie.quat_rotate(self.q, other.t) + self.t,
        )

    def __mul__(self, other: "Rigid3") -> "Rigid3":
        return self.compose(other)

    def inverse(self) -> "Rigid3":
        qi = lie.quat_conj(self.q)
        return Rigid3(qi, -lie.quat_rotate(qi, self.t))

    def apply(self, points: jnp.ndarray) -> jnp.ndarray:
        """Transform (..., 3) points (TransformPoint/TransformPointCloud,
        rigid_transform.h:131-144)."""
        return lie.quat_rotate(self.q, points) + self.t

    def matrix(self) -> jnp.ndarray:
        return lie.quat_to_matrix(self.q)
