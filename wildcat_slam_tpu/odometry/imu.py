"""IMU handling: uniform-rate resampling (host) and on-device state propagation.

Covers:
- ``ImuResampler`` (sensor/imu_resampler.h:11-54) -> :class:`ImuResampler` (host,
  numpy; vectorized over whole chunks instead of the reference's 2-deep queue).
- ``PredictPoseOfNewImuState`` (lidar_odometry.cc:112-123) -> :func:`propagate`,
  a ``lax.scan`` over the velocity-free second-difference recurrence
  ``rot3 = rot2 * Exp(((gyr2+gyr3)/2 - bg) dt)``,
  ``pos3 = (R1 (acc1 - ba) + grav) dt^2 + 2 pos2 - pos1``.
- pose interpolation at query times (lerp pos / slerp rot between bracketing IMU
  states) used by ``UndistortSweep`` (lidar_odometry.cc:143-158), sample-state
  creation (:445-453) and ``UpdateSurfelPoses`` (:160-170) -> :func:`interp_pose`.

Grid-exactness design note: the reference computes sample-state times as
``t0 + i * sample_dt`` while IMU targets accumulate ``prev + 1/rate``; their
floating-point drift is guarded by CHECKs (lidar_odometry.cc:119,209-210). Here
sample states sit *exactly on the IMU grid* at stride ``round(sample_dt * rate)``
(16 ticks at 200 Hz / 0.08 s), so all window boundaries are exact and the
uniform-dt precondition of the recurrence holds by construction.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from wildcat_slam_tpu.odometry.states import ImuStates
from wildcat_slam_tpu.ops import lie


class ImuResampler:
    """Linear-interpolating resampler onto the uniform grid ``t0 + k / rate``.

    Streaming host-side equivalent of sensor/imu_resampler.h:11-54: the first raw
    sample passes through and anchors the grid; each later grid target is lerped
    from its bracketing raw pair. (The reference emits at most one sample per raw
    message because the driver calls Advance once per Add, wildcat_slam_node.cc:38-43;
    for raw rate >= target rate — the practical regime — the outputs are identical.)
    """

    def __init__(self, rate: float):
        self.rate = float(rate)
        self._grid_k = 0          # next grid index to emit
        self._t0 = None           # grid anchor (first raw timestamp)
        self._prev = None         # last raw sample (t, acc, gyr)

    def add(self, t: float, acc, gyr):
        """Feed one raw sample; returns list of (t, acc, gyr) resampled outputs.

        Raises on out-of-order raw samples (t earlier than the previous raw
        sample): a silent negative lerp factor would extrapolate garbage onto
        the grid. Mirrors the scan-path ordering check (pipeline.add_scan)."""
        if self._prev is not None and t < self._prev[0]:
            raise ValueError(
                f"IMU sample at {t:.6f} arrived before the previous raw sample "
                f"{self._prev[0]:.6f}; IMU messages must be time-ordered")
        acc = np.asarray(acc, np.float64)
        gyr = np.asarray(gyr, np.float64)
        out = []
        if self._t0 is None:
            self._t0 = float(t)
            self._prev = (float(t), acc, gyr)
            self._grid_k = 1
            return [(float(t), acc, gyr)]
        tp, accp, gyrp = self._prev
        while True:
            target = self._t0 + self._grid_k / self.rate
            if target > t:
                break
            if target >= tp:
                f = 0.0 if t == tp else (target - tp) / (t - tp)
                out.append((target, (1 - f) * accp + f * acc, (1 - f) * gyrp + f * gyr))
            self._grid_k += 1
        self._prev = (float(t), acc, gyr)
        return out

    def get_state(self) -> np.ndarray:
        """Serializable state (checkpoint support): 11 doubles, shared layout
        with the native resampler (native/feeder.cc wc_resampler_get_state)."""
        out = np.zeros(11, np.float64)
        if self._t0 is not None:
            out[0] = 1.0
            out[1] = self._grid_k
            out[2] = self._t0
            out[3], out[4:7], out[7:10] = self._prev[0], self._prev[1], self._prev[2]
        return out

    def set_state(self, st: np.ndarray) -> None:
        st = np.asarray(st, np.float64)
        if st[0] != 0.0:
            self._grid_k = int(st[1])
            self._t0 = float(st[2])
            self._prev = (float(st[3]), st[4:7].copy(), st[7:10].copy())
        else:
            self._grid_k, self._t0, self._prev = 0, None, None


# ---------------------------------------------------------------------------
# Device-side propagation and interpolation
# ---------------------------------------------------------------------------

def propagate(
    imu: ImuStates,
    new_t: jnp.ndarray,     # (K,) window-relative times of new resampled samples
    new_acc: jnp.ndarray,   # (K, 3)
    new_gyr: jnp.ndarray,   # (K, 3)
    new_count: jnp.ndarray, # () int32 — first new_count entries are valid
    bg: jnp.ndarray,
    ba: jnp.ndarray,
    grav: jnp.ndarray,
    dt: float,
) -> ImuStates:
    """Append K new IMU states predicted by the second-difference recurrence
    (lidar_odometry.cc:112-123,405-427). Requires imu.count >= 2.
    """
    k = new_t.shape[0]
    c = imu.count
    zero = jnp.asarray(0, jnp.int32)

    def get(i):
        i = i.astype(jnp.int32)
        return (
            jax.lax.dynamic_slice(imu.pos, (i, zero), (1, 3))[0],
            jax.lax.dynamic_slice(imu.rot, (i, zero), (1, 4))[0],
            jax.lax.dynamic_slice(imu.acc, (i, zero), (1, 3))[0],
            jax.lax.dynamic_slice(imu.gyr, (i, zero), (1, 3))[0],
        )

    p1, r1, a1, g1 = get(c - 2)  # second-to-last window state
    p2, r2, a2, g2 = get(c - 1)  # last window state

    dt2 = jnp.asarray(dt * dt, imu.pos.dtype)

    # The recurrence is associative once unrolled (TPU-first: O(log K) depth
    # instead of a K-step sequential scan):
    #   rot_n  = rot_last * prod_{j<=n} Exp(((gyr_{j-1}+gyr_j)/2 - bg) dt)
    #   v_n    = (p_last - p_prev) + dt^2 * cumsum(R_j (a_j - ba) + grav), j<=n-2
    #   pos_n  = p_last + cumsum(v)
    gyr_prev = jnp.concatenate([g2[None], new_gyr[:-1]], axis=0)
    dq = lie.exp_quat(((gyr_prev + new_gyr) / 2.0 - bg) * dt)     # (K, 4)
    prod = jax.lax.associative_scan(lie.quat_mul, dq)             # (K, 4)
    rot_new = lie.quat_normalize(lie.quat_mul(r2[None], prod))

    # world acceleration at extended indices (-2)=r1/a1, (-1)=r2/a2, then the
    # new states 0..K-3; v_n = (p2-p1) + dt^2 * sum_{j=-2}^{n-2} accw_j
    rot_acc = jnp.concatenate([r1[None], r2[None], rot_new[: k - 2]], axis=0)  # (K, 4)
    acc_acc = jnp.concatenate([a1[None], a2[None], new_acc[: k - 2]], axis=0)
    accw = lie.quat_rotate(rot_acc, acc_acc - ba) + grav                       # (K, 3)
    v = (p2 - p1)[None] + dt2 * jnp.cumsum(accw, axis=0)                       # (K, 3)
    pos_new = p2[None] + jnp.cumsum(v, axis=0)

    # Write the K results at offset `count`; only the valid prefix advances count.
    def put(buf, vals):
        starts = (c.astype(jnp.int32),) + (zero,) * (buf.ndim - 1)
        return jax.lax.dynamic_update_slice(buf, vals.astype(buf.dtype), starts)

    # Mask invalid rows to keep padding inert (values past count are never read).
    return imu.replace(
        t=put(imu.t, new_t),
        pos=put(imu.pos, pos_new),
        rot=put(imu.rot, rot_new),
        acc=put(imu.acc, new_acc),
        gyr=put(imu.gyr, new_gyr),
        count=c + new_count,
    )


def init_from_first_two(
    imu: ImuStates,
    t: jnp.ndarray,    # (2,)
    acc: jnp.ndarray,  # (2, 3)
    gyr: jnp.ndarray,  # (2, 3)
    dt: float,
) -> ImuStates:
    """Window bootstrap (lidar_odometry.cc:369-386): state 0 at identity/origin,
    state 1 rotated by the averaged gyro over one tick."""
    rot1 = lie.exp_quat(((gyr[0] + gyr[1]) / 2.0) * dt)
    rot = jnp.stack([lie.quat_identity((), rot1.dtype), rot1])
    return imu.replace(
        t=imu.t.at[:2].set(t.astype(imu.t.dtype)),
        rot=imu.rot.at[:2].set(rot.astype(imu.rot.dtype)),
        pos=imu.pos.at[:2].set(0.0),
        acc=imu.acc.at[:2].set(acc.astype(imu.acc.dtype)),
        gyr=imu.gyr.at[:2].set(gyr.astype(imu.gyr.dtype)),
        count=jnp.asarray(2, jnp.int32),
    )


def bracket_indices(imu: ImuStates, query_t: jnp.ndarray) -> jnp.ndarray:
    """Index ``idx`` of the first valid IMU state with ``t >= query`` (the
    reference's std::lower_bound, lidar_odometry.cc:148), clamped to [1, count-1]
    so (idx-1, idx) always brackets within the valid range."""
    big = jnp.asarray(jnp.finfo(imu.t.dtype).max, imu.t.dtype)
    t_pad = jnp.where(imu.mask, imu.t, big)
    q = query_t.astype(imu.t.dtype)
    # The IMU grid is uniform by construction — the resampler emits t0 + k/rate
    # (the reference CHECK_NEARs uniform dt, lidar_odometry.cc:119) — so the
    # bracket is O(1) arithmetic instead of a bisection (which cost ~3 ms/sweep
    # at 32k queries). f32 rounding can put the guess one step off and grid
    # ticks must resolve exactly, so the guess is corrected against the actual
    # stored times (two monotone steps cover the worst case, incl. exact ties).
    n = imu.t.shape[0]
    rate = 1.0 / (imu.t[1] - imu.t[0])
    idx = jnp.floor((q - imu.t[0]) * rate).astype(jnp.int32)
    idx = jnp.clip(idx, 0, n - 1)
    for _ in range(2):  # first k with t_pad[k] >= q (std::lower_bound)
        idx = jnp.where(t_pad[idx] < q, jnp.minimum(idx + 1, n - 1), idx)
    return jnp.clip(idx, 1, imu.count - 1)


def interp_pose(imu: ImuStates, query_t: jnp.ndarray):
    """Pose at query times by lerp(pos)/slerp(rot) between bracketing IMU states
    (lidar_odometry.cc:151-153,165-167,447-449). Returns (pos (Q,3), rot (Q,4))."""
    idx = bracket_indices(imu, query_t)
    t0 = imu.t[idx - 1]
    t1 = imu.t[idx]
    f = ((query_t.astype(imu.t.dtype) - t0) / jnp.maximum(t1 - t0, jnp.finfo(imu.t.dtype).tiny))
    f = jnp.clip(f, 0.0, 1.0).astype(imu.pos.dtype)
    pos = imu.pos[idx - 1] * (1.0 - f)[..., None] + imu.pos[idx] * f[..., None]
    rot = lie.quat_slerp(imu.rot[idx - 1], imu.rot[idx], f)
    return pos, rot


def _interp_pose_sorted(imu: ImuStates, query_t: jnp.ndarray):
    """interp_pose for a time-SORTED query vector (a sweep's point stamps).

    With sorted queries the bracket indices are non-decreasing, so the
    per-point bracket-state lookup — 16 channels of 4-byte random row gathers,
    which run at ~0.5 GB/s effective on TPU — can be rebuilt as a tick-side
    difference scatter (K rows) plus one running sum over the points: exact
    telescoping, identical bracketing.

    The run boundaries come from the DUAL search: instead of computing a
    per-point bracket index (``bracket_indices``: K-table lookups at P=64k
    sorted positions, whose two correction-step gathers cost ~0.9 ms/sweep on
    TPU) and then finding each tick's first point, search the K tick times
    into the sorted P point stamps directly. ``lower_bound(t, q) >= k`` iff
    ``q > t[k-1]`` (t is monotone), so the first point of run k is
    ``searchsorted(query_t, t[k-1], side='right')`` — K cheap queries against
    the point stamps, no per-point index materialized at all. The [1, count-1]
    clamp of ``bracket_indices`` maps to: runs 0 and 1 both start at point 0,
    runs past count-1 never start (boundary ``big``).
    """
    # the padding tail of a sweep holds zeros — clamp to the running max so the
    # index sequence stays monotone (identity on genuinely sorted stamps;
    # padding points get the last pose and are masked downstream)
    query_t = jax.lax.associative_scan(jnp.maximum, query_t)
    k_cap = imu.t.shape[0]
    p_cap = query_t.shape[0]
    dtype = imu.pos.dtype

    # per-tick channel matrix: [t(k-1), t(k), pos(k-1), pos(k), rot(k-1), rot(k)]
    def prev(a):
        return jnp.concatenate([a[:1], a[:-1]], axis=0)

    vals = jnp.concatenate(
        [imu.t[:, None].astype(dtype), prev(imu.t)[:, None].astype(dtype),
         imu.pos, prev(imu.pos), imu.rot, prev(imu.rot)],
        axis=1,
    )  # (K, 16)
    # first point position of each tick's bracket run (dual search, see above);
    # ticks with no points collapse onto the same position (deltas telescope)
    big = jnp.asarray(jnp.finfo(imu.t.dtype).max, imu.t.dtype)
    j = jnp.arange(k_cap)
    # boundary time of run k is t[k-1], with the upper clamp to count-1
    # expressed as: runs k >= count never start
    tj = jnp.where((j >= 1) & (j <= imu.count - 2), imu.t, big)
    bound = jnp.concatenate([jnp.full((2,), -big, imu.t.dtype), tj[1:k_cap - 1]])
    qt = query_t.astype(imu.t.dtype)
    s = jnp.searchsorted(qt, bound, side="right").astype(jnp.int32)
    delta = jnp.concatenate([vals[:1], vals[1:] - vals[:-1]], axis=0)
    scat = jnp.zeros((p_cap, vals.shape[1]), dtype).at[s].add(delta, mode="drop")
    per_pt = jnp.cumsum(scat, axis=0)  # (P, 16) = vals[idx]

    t1 = per_pt[:, 0]
    t0 = per_pt[:, 1]
    pos1 = per_pt[:, 2:5]
    pos0 = per_pt[:, 5:8]
    rot1 = per_pt[:, 8:12]
    rot0 = per_pt[:, 12:16]
    f = (query_t.astype(dtype) - t0) / jnp.maximum(t1 - t0, jnp.finfo(dtype).tiny)
    f = jnp.clip(f, 0.0, 1.0)
    pos = pos0 * (1.0 - f)[..., None] + pos1 * f[..., None]
    rot = lie.quat_slerp(rot0, rot1, f)
    return pos, rot


def undistort_points(imu: ImuStates, pt_t: jnp.ndarray, pt_xyz: jnp.ndarray,
                     sorted_t: bool = False):
    """UndistortSweep (lidar_odometry.cc:143-158): transform each point into the
    world frame using the interpolated pose at its timestamp. Pass
    ``sorted_t=True`` when ``pt_t`` is non-decreasing (a sweep in arrival
    order) to take the scan-free fast path."""
    if sorted_t:
        pos, rot = _interp_pose_sorted(imu, pt_t)
    else:
        pos, rot = interp_pose(imu, pt_t)
    return lie.quat_rotate(rot, pt_xyz) + pos
