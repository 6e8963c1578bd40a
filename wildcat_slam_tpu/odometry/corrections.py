"""Post-solve state updates: B-spline-smoothed corrections onto IMU states,
surfel pose attachment/refresh, and sample-state pose folding.

Covers ``CubicBSplineSampleCorrector`` + ``UpdateImuPoses`` (lidar_odometry.cc:22-54,
187-215), ``UpdateSurfelPoses`` (:160-170). The asymmetry is intentional and
preserved: the *optimizer* interpolates corrections linearly between sample states
(cost_functor.h:375-379) while the *state update* smooths them with a least-squares
cubic B-spline — that is the reference's continuous-time formulation.

All functions are shape-static: the B-spline fit runs over the full sample-state
capacity with identity rows for invalid slots, so the dynamic window length ``n``
only enters through masks and clipped gather indices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from wildcat_slam_tpu.odometry import imu as imu_mod
from wildcat_slam_tpu.odometry.states import ImuStates, SampleStates, Surfels
from wildcat_slam_tpu.ops import lie
from wildcat_slam_tpu.ops.spline import _M


def fit_correction_spline(sample: SampleStates) -> jnp.ndarray:
    """LS-fit B-spline control points through the (rot_cor, pos_cor) samples.

    Masked version of CubicBSplineInterpolator::Init (spline_interpolation.h:74-104):
    the collocation matrix N is tridiagonal [1/6, 4/6, 1/6] with boundary lumping
    from the reference's index clamping; rows/cols past ``count`` are identity with
    zero targets, so padding control points are exactly zero.

    Returns Q: (S, 6) control points for [rot_cor | pos_cor].
    """
    s = sample.capacity
    n = sample.count
    dtype = sample.cor.dtype

    rows = jnp.arange(s)
    nmat = jnp.zeros((s, s), dtype)
    # offsets (i-1, i, i+1, i+2) with weights (1,4,1,0)/6, indices clipped to [0, n-1]
    for off, w in ((-1, 1.0 / 6.0), (0, 4.0 / 6.0), (1, 1.0 / 6.0)):
        cols = jnp.clip(rows + off, 0, n - 1)
        nmat = nmat.at[rows, cols].add(jnp.where(rows < n, w, 0.0))
    eye = jnp.eye(s, dtype=dtype)
    nmat = jnp.where((rows < n)[:, None], nmat, eye)

    p = jnp.concatenate([sample.rot_cor, sample.pos_cor], axis=1)
    p = jnp.where((rows < n)[:, None], p, 0.0)

    # true-f32 matmuls: TPU defaults to one-pass bf16, and this fit feeds the
    # per-sweep attitude update — bf16 noise here compounds across sweeps
    hp = jax.lax.Precision.HIGHEST
    ntn = jnp.matmul(nmat.T, nmat, precision=hp)
    ntp = jnp.matmul(nmat.T, p, precision=hp)
    return jnp.linalg.solve(ntn, ntp)


def eval_correction_spline(sample: SampleStates, q: jnp.ndarray, query_t: jnp.ndarray):
    """Evaluate the fitted correction spline at query times.

    Mirrors CubicBSplineInterpolator::Interp (spline_interpolation.h:51-71) with a
    dynamic sample count. Returns ((Q, 3) rot_cor, (Q, 3) pos_cor, (Q,) in_range).
    """
    n = sample.count
    dtype = q.dtype
    t0 = sample.t[0]
    t_back = sample.t[n - 1]
    qt = query_t.astype(sample.t.dtype)
    in_range = (qt >= t0) & (qt <= t_back)

    span = jnp.maximum(t_back - t0, jnp.asarray(jnp.finfo(sample.t.dtype).tiny))
    index_f = ((qt - t0) / span * (n - 1).astype(sample.t.dtype) + 1.0).astype(dtype)
    index_int = jnp.floor(index_f).astype(jnp.int32)
    tf = index_f - index_int.astype(dtype)

    offsets = jnp.arange(-2, 2, dtype=jnp.int32)
    idx = jnp.clip(index_int[..., None] + offsets, 0, n - 1)
    q4 = q[idx]  # (Q, 4, 6)

    tv = jnp.stack([tf * tf * tf, tf * tf, tf, jnp.ones_like(tf)], axis=-1)
    w = jnp.einsum("...i,ij->...j", tv, _M.astype(dtype)) / 6.0
    vals = jnp.einsum("...j,...jd->...d", w, q4)
    return vals[..., 0:3], vals[..., 3:6], in_range


def update_imu_poses(sample: SampleStates, imu: ImuStates, dt: float) -> ImuStates:
    """UpdateImuPoses (lidar_odometry.cc:187-215): apply B-spline-smoothed
    corrections to every IMU state inside the sample window, then re-extrapolate
    the single trailing state (the pipeline feeds IMU exactly one tick past the
    last sample state, so the tail length is always 1)."""
    q = fit_correction_spline(sample)
    rot_cor, pos_cor, ok = eval_correction_spline(sample, q, imu.t)
    ok = ok & imu.mask

    new_rot = lie.quat_mul(lie.exp_quat(rot_cor), imu.rot)
    new_pos = pos_cor + imu.pos
    rot = lie.quat_normalize(jnp.where(ok[:, None], new_rot, imu.rot))
    pos = jnp.where(ok[:, None], new_pos, imu.pos)
    out = imu.replace(rot=rot, pos=pos)

    # Re-extrapolate the final state from the two corrected states before it
    # (lidar_odometry.cc:205-214), with the last sample state's biases/gravity.
    c = imu.count.astype(jnp.int32)
    sc = sample.count.astype(jnp.int32)
    i32 = lambda x: jnp.asarray(x, jnp.int32)
    bg = jax.lax.dynamic_slice(sample.cor, (sc - 1, i32(6)), (1, 3))[0]
    ba = jax.lax.dynamic_slice(sample.cor, (sc - 1, i32(9)), (1, 3))[0]

    def g(buf, i, w):
        return jax.lax.dynamic_slice(buf, (i.astype(jnp.int32), i32(0)), (1, w))[0]

    p1, r1, a1 = g(pos, c - 3, 3), g(rot, c - 3, 4), g(out.acc, c - 3, 3)
    p2, r2 = g(pos, c - 2, 3), g(rot, c - 2, 4)
    g2, g3 = g(out.gyr, c - 2, 3), g(out.gyr, c - 1, 3)
    dt2 = jnp.asarray(dt * dt, pos.dtype)
    r3 = lie.quat_mul(r2, lie.exp_quat(((g2 + g3) / 2.0 - bg) * dt))
    p3 = (lie.quat_rotate(r1, a1 - ba) + sample.grav) * dt2 + 2.0 * p2 - p1

    pos = jax.lax.dynamic_update_slice(pos, p3[None], (c - 1, i32(0)))
    rot = jax.lax.dynamic_update_slice(rot, r3[None], (c - 1, i32(0)))
    return out.replace(rot=rot, pos=pos)


def attach_surfel_poses(
    t: jnp.ndarray,
    center_w: jnp.ndarray,
    cov_w: jnp.ndarray,
    norm_w: jnp.ndarray,
    resolution: jnp.ndarray,
    std: jnp.ndarray,
    valid: jnp.ndarray,
    imu: ImuStates,
) -> Surfels:
    """First UpdateSurfelPoses touch (surfel.h:48-58 + lidar_odometry.cc:160-170):
    attach the interpolated pose at each surfel's timestamp and convert the
    world-frame geometry into the body frame."""
    pos, rot = imu_mod.interp_pose(imu, t)
    rinv = lie.quat_conj(rot)
    center_b = lie.quat_rotate(rinv, center_w - pos)
    norm_b = lie.quat_rotate(rinv, norm_w)
    rmat_inv = lie.quat_to_matrix(rinv)
    # true f32: bf16-default batched matmuls would put ~0.4% noise on the
    # covariances that drive the plane fits and joint normals
    hp = jax.lax.Precision.HIGHEST
    cov_b = jnp.matmul(jnp.matmul(rmat_inv, cov_w, precision=hp),
                       jnp.swapaxes(rmat_inv, -1, -2), precision=hp)
    return Surfels(
        t=t,
        center=center_b,
        cov=cov_b,
        norm=norm_b,
        rot=rot,
        pos=pos,
        resolution=resolution,
        std=std,
        valid=valid,
    )


def update_surfel_poses(surfels: Surfels, imu: ImuStates) -> Surfels:
    """Subsequent UpdateSurfelPoses calls (lidar_odometry.cc:160-170): refresh only
    the attached pose; body-frame geometry is immutable after attachment."""
    pos, rot = imu_mod.interp_pose(imu, surfels.t)
    keep = surfels.valid[:, None]
    return surfels.replace(
        rot=jnp.where(keep, rot, surfels.rot),
        pos=jnp.where(keep, pos, surfels.pos),
    )
