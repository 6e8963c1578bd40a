"""Synthetic lidar-inertial sequences with exact ground truth.

The reference has no simulator — its only end-to-end check is eyeballing rviz on
Hilti bags (SURVEY.md §4). This generator provides deterministic sequences whose
IMU stream is *discretely consistent* with the pipeline's propagation model, so
integration error is exactly zero and every downstream deviation is attributable
to the component under test:

- gyro samples solve the midpoint recurrence
  ``Log(R_k^T R_{k+1}) = (w_k + w_{k+1})/2 * dt``  (lidar_odometry.cc:121)
- accelerometer samples invert the second-difference position rule
  ``a_k = R_k^T ((p_{k+2} - 2 p_{k+1} + p_k)/dt^2 - g_w)``  (:122)

Lidar scans are raycasts from the moving sensor into an axis-aligned room
(floor/ceiling/4 walls), returned in the *lidar* frame with the Hilti extrinsic
inverted, so the pipeline's own extrinsic handling is exercised.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation


def _traj_pose(t, speed=1.0):
    """Smooth trajectory: position + rotation (scipy) at times t (vectorized).

    Starts AT REST with identity attitude (smoothstep envelope with zero initial
    velocity): the odometry — like the reference — encodes zero initial velocity
    by construction (the first two IMU states share pos=0, lidar_odometry.cc:379)
    and anchors its world frame at the initial body pose, so a moving start would
    be unobservable initialization error, not algorithm error.
    """
    t = np.asarray(t)
    ramp = np.clip(t / 2.0, 0.0, 1.0)
    s = ramp * ramp * (3.0 - 2.0 * ramp)  # smoothstep: s(0)=s'(0)=0
    pos = np.stack(
        [
            2.0 * np.sin(0.4 * speed * t) * s,
            1.5 * np.sin(0.3 * speed * t) * s,
            0.3 * np.sin(0.23 * speed * t) * s,
        ],
        axis=-1,
    )
    yaw = (0.5 * np.sin(0.21 * speed * t) + 0.1 * speed * t) * s
    pitch = 0.12 * np.sin(0.33 * speed * t) * s
    roll = 0.1 * np.sin(0.27 * speed * t) * s
    rot = Rotation.from_euler("zyx", np.stack([yaw, pitch, roll], axis=-1))
    return pos, rot


class SyntheticSequence:
    """Deterministic synthetic lidar-inertial sequence.

    Attributes after construction:
      imu: list of (t, acc (3,), gyr (3,)) at `imu_rate`
      scans: list of (times (N,), points_lidar (N, 3)) per 0.1 s scan packet
      gt_pos(t), gt_rot(t): ground truth sampling (world frame, body->world)
    """

    def __init__(
        self,
        duration: float = 10.0,
        imu_rate: float = 200.0,
        points_per_scan: int = 2000,
        scan_period: float = 0.1,
        room_half: float = 8.0,
        noise_range: float = 0.003,
        outlier_fraction: float = 0.0,
        gravity: float = 9.81,
        speed: float = 1.0,
        seed: int = 0,
        ext_rot: np.ndarray | None = None,
        ext_pos: np.ndarray | None = None,
    ):
        rng = np.random.default_rng(seed)
        self.speed = speed
        self.g_w = np.array([0.0, 0.0, -gravity])
        dt = 1.0 / imu_rate
        n = int(duration * imu_rate) + 3

        t_imu = np.arange(n) * dt
        pos, rot = _traj_pose(t_imu, speed)
        rmat = rot.as_matrix()

        # gyro: solve the midpoint recurrence forward (w0 from analytic rate)
        rel = (rot[:-1].inv() * rot[1:]).as_rotvec()  # Log(R_k^T R_{k+1})
        w = np.zeros((n, 3))
        w[0] = rel[0] / dt  # good first approximation
        for k in range(n - 1):
            w[k + 1] = 2.0 * rel[k] / dt - w[k]

        # accel: invert the second-difference rule
        acc = np.zeros((n, 3))
        pdd = (pos[2:] - 2 * pos[1:-1] + pos[:-2]) / (dt * dt)
        acc[: n - 2] = np.einsum("nij,nj->ni", rmat[: n - 2].transpose(0, 2, 1), pdd - self.g_w)
        acc[n - 2 :] = acc[n - 3]

        self.imu = [(t_imu[k], acc[k], w[k]) for k in range(n)]
        self._rot = rot
        self._pos = pos
        self._t_imu = t_imu

        # extrinsic (defaults to the Hilti rig of the config)
        if ext_rot is None:
            ext_rot = np.array(
                [[-5.32125e-08, -1.0, 0.0], [-1.0, -5.32125e-08, -0.0], [0.0, 0.0, -1.0]]
            )
        if ext_pos is None:
            ext_pos = np.array([-0.001, -0.00855, 0.055])
        inv_rot = ext_rot.T
        inv_pos = -inv_rot @ ext_pos

        # lidar scans: raycast into the room walls
        self.scans = []
        half = room_half
        normals = np.array(
            [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]], float
        )
        offsets = np.array([half, half, half, half, 1.0, 3.0])  # floor at z=-1, ceil z=3
        n_scans = int(duration / scan_period)
        for s in range(n_scans):
            ts = s * scan_period + np.sort(rng.uniform(0, scan_period, points_per_scan))
            p_s, r_s = _traj_pose(ts, speed)
            # random directions, mildly downward-biased like a real spinning lidar
            az = rng.uniform(-np.pi, np.pi, points_per_scan)
            el = rng.uniform(-0.45, 0.45, points_per_scan)
            d_body = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)], axis=1)
            d_w = np.einsum("nij,nj->ni", r_s.as_matrix(), d_body)

            # first positive intersection among the 6 planes: n.x = -offset
            # plane: n . x + off = 0 -> t = -(n.p + off) / (n.d)
            num = -(p_s @ normals.T + offsets)  # (N, 6)
            den = d_w @ normals.T
            tt = np.where(den != 0, num / den, np.inf)
            tt = np.where(tt > 1e-6, tt, np.inf)
            t_hit = tt.min(axis=1)
            ok = np.isfinite(t_hit)
            t_hit = np.where(ok, t_hit, 1.0)
            hits_w = p_s + d_w * t_hit[:, None]
            hits_w += rng.normal(scale=noise_range, size=hits_w.shape) * d_w  # range noise
            if outlier_fraction > 0.0:
                # floating clutter / dynamic-object returns at random ranges —
                # exercises the Cauchy robustification of the surfel factors
                n_out = int(outlier_fraction * points_per_scan)
                which = rng.choice(points_per_scan, n_out, replace=False)
                hits_w[which] = p_s[which] + d_w[which] * rng.uniform(0.5, 6.0, (n_out, 1))

            # world -> imu body -> lidar frame
            hits_b = np.einsum("nij,nj->ni", r_s.as_matrix().transpose(0, 2, 1), hits_w - p_s)
            hits_l = hits_b @ inv_rot.T + inv_pos
            self.scans.append((ts[ok], hits_l[ok]))

    def gt_pose(self, t):
        """Ground-truth (pos, rot wxyz quaternion) at times t."""
        pos, rot = _traj_pose(np.asarray(t), self.speed)
        q = rot.as_quat()  # xyzw
        return pos, np.concatenate([q[..., 3:4], q[..., :3]], axis=-1)


def ate_rmse(traj, gt_pos_fn, align: bool = True):
    """Absolute trajectory error of [(t, pos, quat)] vs ground truth positions.
    With ``align=True`` a rigid (SE3, Umeyama without scale) alignment is applied
    first — the standard ATE protocol."""
    t = np.array([e[0] for e in traj])
    p = np.stack([e[1] for e in traj])
    g = gt_pos_fn(t)
    if align and len(traj) >= 3:
        mu_p, mu_g = p.mean(0), g.mean(0)
        pc, gc = p - mu_p, g - mu_g
        u, _, vt = np.linalg.svd(pc.T @ gc)
        d = np.sign(np.linalg.det(vt.T @ u.T))
        r = vt.T @ np.diag([1, 1, d]) @ u.T
        p = (r @ pc.T).T + mu_g
    return float(np.sqrt(np.mean(np.sum((p - g) ** 2, axis=1))))
