"""Full-pipeline oracle: a literal, sequential, f64 numpy port of the
reference's LidarOdometry (lidar_odometry.cc:487-605 and its helpers).

PARITY APPARATUS, not product code. The reference cannot be built in this
image (no ROS/PCL/Ceres), so this oracle IS the feasible "Ceres baseline" of
BASELINE.json: deques, per-point loops, per-factor loops, a dense f64
Levenberg-Marquardt on the reference's own residual definitions
(cost_functor.h) with Cauchy loss on surfel factors (first-order corrector —
exactly what Ceres does when rho'' < 0, see ceres corrector.cc) and the
SubsetParameterization gauge (lidar_odometry.cc:556-560).

Ports, with reference citations:
- AddLidarScan orchestration            lidar_odometry.cc:487-605
- SyncHeadingMsgs                       lidar_odometry.cc:457-485
- PredictImuStatesAndSampleStates       lidar_odometry.cc:365-455
- PredictPoseOfNewImuState              lidar_odometry.cc:112-123
- BuildSweep / UndistortSweep           lidar_odometry.cc:134-158
- UpdateSurfelPoses / UpdateSamplePoses lidar_odometry.cc:160-179
- UpdateImuPoses + cubic corrector      lidar_odometry.cc:22-54,187-215
- CubicBSplineInterpolator              spline_interpolation.h:42-113
- ShrinkToFit (incl. its no-op fixed-window trim, a faithful bug)
                                        lidar_odometry.cc:228-250
- SurfelMatchUnary/BinaryFactor, ImuFactor residuals
                                        cost_functor.h:16-69,100-179,264-472
  (Jacobians are derived correctly here and verified against finite
  differences in test_oracle_pipeline.py; the reference's own IMU-factor
  Jacobians contain blocks inconsistent with its residuals, documented in
  wildcat_slam_tpu/odometry/factors.py)
- Surfel body/world frame bookkeeping   surfel.h:35-122
- surfel extraction + matcher           reuse of the literal oracles in
                                        test_surfel.py / test_match.py

Deviation from the reference (shared with the product, by design): IMU is
resampled onto the anchored grid t0 + k/rate and sample states sit exactly on
that grid (see odometry/imu.py module docstring); the reference's drifting
prev + 1/freq grid makes its own CHECKs borderline.
"""

from __future__ import annotations

import numpy as np

from wildcat_slam_tpu.odometry.imu import ImuResampler

from test_surfel import oracle_extract
from test_match import oracle_match

# ---------------------------------------------------------------------------
# f64 rotation helpers (batched where useful). Independent of the product's
# ops/lie.py: plain Rodrigues / quaternion formulas.
# ---------------------------------------------------------------------------


def hat(v):
    v = np.asarray(v)
    z = np.zeros(v.shape[:-1])
    return np.stack([
        np.stack([z, -v[..., 2], v[..., 1]], -1),
        np.stack([v[..., 2], z, -v[..., 0]], -1),
        np.stack([-v[..., 1], v[..., 0], z], -1),
    ], -2)


def exp_so3(r):
    r = np.asarray(r, np.float64)
    th = np.linalg.norm(r, axis=-1, keepdims=True)
    th = np.maximum(th, 1e-300)
    k = r / th
    th = th[..., None]
    kk = hat(k)
    eye = np.broadcast_to(np.eye(3), kk.shape)
    return eye + np.sin(th) * kk + (1 - np.cos(th)) * (kk @ kk)


def log_so3(R):
    tr = np.clip((np.trace(R, axis1=-2, axis2=-1) - 1) / 2, -1.0, 1.0)
    th = np.arccos(tr)
    w = np.stack([R[..., 2, 1] - R[..., 1, 2],
                  R[..., 0, 2] - R[..., 2, 0],
                  R[..., 1, 0] - R[..., 0, 1]], -1)
    s = np.where(th > 1e-9, th / np.maximum(2 * np.sin(th), 1e-300), 0.5 + th * th / 12)
    return w * s[..., None]


def jr(r):
    """Right Jacobian of SO(3)."""
    r = np.asarray(r, np.float64)
    th = np.linalg.norm(r, axis=-1)
    h = hat(r)
    h2 = h @ h
    eye = np.broadcast_to(np.eye(3), h.shape)
    small = th < 1e-6
    th_safe = np.where(small, 1.0, th)[..., None, None]
    a = np.where(small[..., None, None], 0.5 - th[..., None, None] ** 2 / 24,
                 (1 - np.cos(th_safe)) / th_safe**2)
    b = np.where(small[..., None, None], 1.0 / 6 - th[..., None, None] ** 2 / 120,
                 (th_safe - np.sin(th_safe)) / th_safe**3)
    return eye - a * h + b * h2


def jr_inv(r):
    r = np.asarray(r, np.float64)
    th = np.linalg.norm(r, axis=-1)
    h = hat(r)
    h2 = h @ h
    eye = np.broadcast_to(np.eye(3), h.shape)
    small = th < 1e-6
    th_safe = np.where(small, 1.0, th)[..., None, None]
    c = np.where(
        small[..., None, None],
        1.0 / 12 + th[..., None, None] ** 2 / 720,
        1 / th_safe**2 - (1 + np.cos(th_safe)) / (2 * th_safe * np.sin(th_safe)),
    )
    return eye + 0.5 * h + c * h2


def jl_inv(r):
    return jr_inv(-np.asarray(r))


# quaternions: wxyz, f64
def quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def quat_conj(q):
    return np.array([q[0], -q[1], -q[2], -q[3]])


def quat_from_rotvec(r):
    th = np.linalg.norm(r)
    if th < 1e-12:
        return np.array([1.0, r[0] / 2, r[1] / 2, r[2] / 2]) / np.sqrt(1 + th * th / 4)
    axis = r / th
    return np.concatenate([[np.cos(th / 2)], np.sin(th / 2) * axis])


def quat_to_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def quat_rot(q, v):
    return quat_to_mat(q) @ np.asarray(v, np.float64)


def slerp(q0, q1, f):
    """Eigen-style shortest-path slerp."""
    d = float(np.dot(q0, q1))
    if d < 0:
        q1 = -q1
        d = -d
    if d > 0.9995:
        q = (1 - f) * q0 + f * q1
        return q / np.linalg.norm(q)
    th = np.arccos(np.clip(d, -1, 1))
    q = (np.sin((1 - f) * th) * q0 + np.sin(f * th) * q1) / np.sin(th)
    return q / np.linalg.norm(q)


# ---------------------------------------------------------------------------
# Cubic B-spline corrector (spline_interpolation.h:42-113 + cc:22-54)
# ---------------------------------------------------------------------------

_M_SPLINE = np.array([[-1, 3, -3, 1], [3, -6, 3, 0], [-3, 0, 3, 0], [1, 4, 1, 0]], np.float64)


class CubicBSplineInterpolator:
    def __init__(self, timestamps, points):
        self.ts = np.asarray(timestamps, np.float64)
        p = np.asarray(points, np.float64)
        np_ = len(self.ts)
        self.np_ = np_
        n = np.zeros((np_, np_))
        temp = (np.array([0, 0, 0, 1.0]) @ _M_SPLINE) / 6.0
        for i in range(np_):
            idxv = np.clip(np.arange(i - 1, i + 3), 0, np_ - 1)
            np.add.at(n, (i, idxv), temp)
        self.q = np.linalg.inv(n.T @ n) @ n.T @ p

    def interp(self, t):
        if t < self.ts[0] or t > self.ts[-1]:
            return None
        index_f = (t - self.ts[0]) / (self.ts[-1] - self.ts[0]) * (self.np_ - 1) + 1.0
        ii = int(np.floor(index_f))
        s = index_f - ii
        idxv = np.clip(np.arange(ii - 2, ii + 2), 0, self.np_ - 1)
        tv = np.array([s**3, s**2, s, 1.0])
        return (tv @ _M_SPLINE @ self.q[idxv]) / 6.0


# ---------------------------------------------------------------------------
# State / surfel containers (surfel.h)
# ---------------------------------------------------------------------------


class SampleState:
    __slots__ = ("timestamp", "data_cor", "grav", "rot", "pos")

    def __init__(self, timestamp):
        self.timestamp = timestamp
        self.data_cor = np.zeros(12)  # rot_cor, pos_cor, bg, ba
        self.grav = np.zeros(3)
        self.rot = np.array([1.0, 0, 0, 0])
        self.pos = np.zeros(3)

    @property
    def bg(self):
        return self.data_cor[6:9]

    @property
    def ba(self):
        return self.data_cor[9:12]


class ImuState:
    __slots__ = ("timestamp", "pos", "rot", "acc", "gyr")

    def __init__(self, timestamp, acc, gyr):
        self.timestamp = timestamp
        self.acc = np.asarray(acc, np.float64)
        self.gyr = np.asarray(gyr, np.float64)
        self.pos = np.zeros(3)
        self.rot = np.array([1.0, 0, 0, 0])


class OracleSurfel:
    """surfel.h:35-122 — center/cov/norm world at birth, body after first
    UpdatePose."""

    __slots__ = ("timestamp", "resolution", "std", "rot", "pos",
                 "center", "cov", "norm", "in_body")

    def __init__(self, t, center, cov, norm, resolution, std):
        self.timestamp = t
        self.center = np.asarray(center, np.float64)
        self.cov = np.asarray(cov, np.float64)
        self.norm = np.asarray(norm, np.float64)
        self.resolution = resolution
        self.std = std
        self.rot = np.array([1.0, 0, 0, 0])
        self.pos = np.zeros(3)
        self.in_body = False

    def update_pose(self, pos, rot):
        self.pos = pos
        self.rot = rot
        if not self.in_body:
            self.in_body = True
            r = quat_to_mat(rot)
            self.center = r.T @ (self.center - pos)
            self.norm = r.T @ self.norm
            self.cov = r.T @ self.cov @ r

    def center_world(self):
        return quat_rot(self.rot, self.center) + self.pos

    def norm_world(self):
        return quat_rot(self.rot, self.norm)

    def cov_world(self):
        r = quat_to_mat(self.rot)
        return r @ self.cov @ r.T


def predict_pose_of_new_imu_state(i1, i2, ba, bg, grav, i3):
    """lidar_odometry.cc:112-123"""
    dt = i3.timestamp - i2.timestamp
    i3.rot = quat_mul(i2.rot, quat_from_rotvec(((i2.gyr + i3.gyr) / 2 - bg) * dt))
    i3.pos = (quat_rot(i1.rot, i1.acc - ba) + grav) * dt * dt + 2 * i2.pos - i1.pos


def _interp_pose(imu_states, t):
    """lerp pos / slerp rot between bracketing imu states (cc:143-170)."""
    ts = [s.timestamp for s in imu_states]
    idx = int(np.searchsorted(ts, t, side="left"))
    assert 1 <= idx < len(imu_states), (idx, t, ts[0], ts[-1])
    a, b = imu_states[idx - 1], imu_states[idx]
    f = (t - a.timestamp) / (b.timestamp - a.timestamp)
    pos = a.pos * (1 - f) + b.pos * f
    rot = slerp(a.rot, b.rot, f)
    return pos, rot


# ---------------------------------------------------------------------------
# The oracle odometry
# ---------------------------------------------------------------------------


class OracleLidarOdometry:
    def __init__(self, cfg):
        self.cfg = cfg
        self.resampler = ImuResampler(cfg.imu_rate)
        self.imu_buff = []      # (t, acc, gyr) resampled
        self.points_buff_t = []
        self.points_buff_xyz = []
        self.sample_states = []
        self.imu_states = []
        self.surfels_sld = []
        self.surfels_fix = []
        self.synced = False
        self.init_sld_win = False
        self.first_state = None  # gauge anchor (cc:556: static first sample)
        self.sweep_id = 0
        self.trajectory = []
        self._ext_rot = np.asarray(cfg.ext_lidar2imu_rot, np.float64).reshape(3, 3)
        self._ext_pos = np.asarray(cfg.ext_lidar2imu_pos, np.float64)

    # ------------------------------------------------------------- feeding
    def add_imu(self, t, acc, gyr):
        for tt, aa, gg in self.resampler.add(t, acc, gyr):
            self.imu_buff.append((tt, aa, gg))

    def add_scan(self, times, pts_lidar):
        """AddLidarScan cc:487-605 (one sweep attempt per call)."""
        cfg = self.cfg
        p = np.asarray(pts_lidar, np.float64) @ self._ext_rot.T + self._ext_pos
        rr = np.linalg.norm(p, axis=1)
        in_box = np.all((p >= np.asarray(cfg.blind_box_min)) &
                        (p <= np.asarray(cfg.blind_box_max)), axis=1)
        keep = (rr >= cfg.min_range) & (rr <= cfg.max_range) & ~in_box
        for t, xyz in zip(np.asarray(times, np.float64)[keep], p[keep]):
            self.points_buff_t.append(t)
            self.points_buff_xyz.append(xyz)

        if not self._sync_heading_msgs():
            return
        self._try_sweep()

    def _sync_heading_msgs(self):
        """cc:457-485"""
        if self.synced:
            return True
        if not self.imu_buff or not self.points_buff_t:
            return False
        if self.imu_buff[-1][0] < self.points_buff_t[0]:
            return False
        while self.imu_buff[0][0] < self.points_buff_t[0]:
            self.imu_buff.pop(0)
        while self.points_buff_t[0] < self.imu_buff[0][0]:
            self.points_buff_t.pop(0)
            self.points_buff_xyz.pop(0)
        self.synced = True
        return True

    # ------------------------------------------------------------ sweeping
    def _predict_imu_and_sample_states(self, end_time):
        """cc:365-455"""
        cfg = self.cfg
        dt = 1.0 / cfg.imu_rate
        if not self.init_sld_win:
            for i in range(2):
                t, acc, gyr = self.imu_buff.pop(0)
                st = ImuState(t, acc, gyr)
                if i == 1:
                    st.rot = quat_from_rotvec((self.imu_states[-1].gyr + st.gyr) / 2 * dt)
                self.imu_states.append(st)
            ss = SampleState(self.imu_states[0].timestamp)
            ss.grav = -cfg.gravity_norm * self.imu_states[0].acc / np.linalg.norm(self.imu_states[0].acc)
            ss.rot = self.imu_states[0].rot.copy()
            ss.pos = self.imu_states[0].pos.copy()
            self.sample_states.append(ss)
            self.first_state = ss
            self.init_sld_win = True

        old_last = self.sample_states[-1].timestamp
        add_size = int((end_time - old_last) / cfg.sample_dt)
        add_last = old_last + cfg.sample_dt * add_size

        back = self.sample_states[-1]
        ba, bg, grav = back.ba.copy(), back.bg.copy(), back.grav.copy()
        while self.imu_buff:
            t, acc, gyr = self.imu_buff.pop(0)
            st = ImuState(t, acc, gyr)
            predict_pose_of_new_imu_state(self.imu_states[-2], self.imu_states[-1],
                                          ba, bg, grav, st)
            self.imu_states.append(st)
            if st.timestamp >= add_last:
                break

        for i in range(1, add_size + 1):
            ts = old_last + i * cfg.sample_dt
            # snap to the resampled grid (shared deviation, see module doc)
            t0 = self.resampler._t0
            ts = t0 + round((ts - t0) * cfg.imu_rate) / cfg.imu_rate
            ss = SampleState(ts)
            ss.data_cor[6:9] = bg
            ss.data_cor[9:12] = ba
            ss.grav = grav
            ss.pos, ss.rot = _interp_pose(self.imu_states, ts)
            self.sample_states.append(ss)

    def _try_sweep(self):
        cfg = self.cfg
        if not self.points_buff_t:
            return
        sweep_endtime = self.points_buff_t[0] + cfg.sweep_duration
        if (self.points_buff_t[-1] < sweep_endtime or not self.imu_buff
                or self.imu_buff[-1][0] < sweep_endtime):
            return

        self._predict_imu_and_sample_states(sweep_endtime)
        sweep_endtime = self.sample_states[-1].timestamp

        # BuildSweep (cc:134-141)
        n = int(np.searchsorted(np.asarray(self.points_buff_t), sweep_endtime, side="left"))
        sweep_t = np.asarray(self.points_buff_t[:n])
        sweep_p = np.asarray(self.points_buff_xyz[:n])
        del self.points_buff_t[:n]
        del self.points_buff_xyz[:n]

        # UndistortSweep (cc:143-158)
        und = np.empty_like(sweep_p)
        for i in range(n):
            pos, rot = _interp_pose(self.imu_states, sweep_t[i])
            und[i] = quat_rot(rot, sweep_p[i]) + pos

        # BuildSurfels (surfel_extraction.cc:316-337) via the literal octree oracle
        raw = oracle_extract(und, sweep_t, cfg)
        new_surfels = [OracleSurfel(s["t"], s["center"], s["cov"], s["norm"],
                                    s["resolution"], s["std"]) for s in raw]
        self.surfels_sld.extend(new_surfels)
        self._update_surfel_poses(self.surfels_sld)

        for _ in range(cfg.outer_iter_num_max):
            corrs_sld = self._match(self.surfels_sld, self.surfels_sld, True)
            corrs_fix = self._match(self.surfels_sld, self.surfels_fix, False)
            self._solve(corrs_sld, corrs_fix)
            self._update_imu_poses()
            self._update_surfel_poses(self.surfels_sld)
            self._update_sample_poses()

        self._shrink_to_fit()
        back = self.sample_states[-1]
        self.trajectory.append((back.timestamp, back.pos.copy(), back.rot.copy()))
        self.sweep_id += 1

    # ------------------------------------------------------------ matching
    def _match(self, queries, targets, self_match):
        if not targets or not queries:
            return []
        cq = np.array([s.center_world() for s in queries])
        nq = np.array([s.norm_world() for s in queries])
        tq = np.array([s.timestamp for s in queries])
        if self_match:
            ct, nt, tt = cq, nq, tq
        else:
            ct = np.array([s.center_world() for s in targets])
            nt = np.array([s.norm_world() for s in targets])
            tt = np.array([s.timestamp for s in targets])
        pairs = oracle_match(cq, nq, tq, ct, nt, tt, self_match, k=self.cfg.match_knn)
        out = []
        for i, j in pairs:
            s1, s2 = queries[i], targets[j]
            if s1.timestamp < s2.timestamp:
                out.append((s1, s2))
            else:
                out.append((s2, s1))
        return out

    # ------------------------------------------------------------- updates
    def _update_surfel_poses(self, surfels):
        for s in surfels:
            pos, rot = _interp_pose(self.imu_states, s.timestamp)
            s.update_pose(pos, rot)

    def _update_sample_poses(self):
        for ss in self.sample_states:
            ss.rot = quat_mul(quat_from_rotvec(ss.data_cor[0:3]), ss.rot)
            ss.pos = ss.data_cor[3:6] + ss.pos
            ss.data_cor[0:6] = 0.0

    def _update_imu_poses(self):
        """cc:187-215: cubic B-spline corrector over sample corrections."""
        ts = [ss.timestamp for ss in self.sample_states]
        rots = [ss.data_cor[0:3].copy() for ss in self.sample_states]
        poss = [ss.data_cor[3:6].copy() for ss in self.sample_states]
        rint = CubicBSplineInterpolator(ts, rots)
        pint = CubicBSplineInterpolator(ts, poss)
        corrected_last = -1
        for i, st in enumerate(self.imu_states):
            rc = rint.interp(st.timestamp)
            if rc is None:
                continue
            pc = pint.interp(st.timestamp)
            st.rot = quat_mul(quat_from_rotvec(rc), st.rot)
            st.pos = pc + st.pos
            corrected_last = i
        if corrected_last != -1 and corrected_last < len(self.imu_states) - 1:
            back = self.sample_states[-1]
            size = len(self.imu_states)
            predict_pose_of_new_imu_state(
                self.imu_states[size - 3], self.imu_states[size - 2],
                back.ba, back.bg, back.grav, self.imu_states[size - 1])

    def _shrink_to_fit(self):
        """cc:228-250, kept literal including the no-op fixed-window trim."""
        cfg = self.cfg
        ss = self.sample_states
        if not ss or ss[-1].timestamp - ss[0].timestamp <= cfg.sliding_window_duration:
            return
        while ss[-1].timestamp - ss[0].timestamp > cfg.sliding_window_duration:
            ss.pop(0)
        while self.imu_states[0].timestamp < ss[0].timestamp:
            self.imu_states.pop(0)
        while self.surfels_sld and self.surfels_sld[0].timestamp < self.imu_states[0].timestamp:
            self.surfels_fix.insert(0, self.surfels_sld.pop(0))
        # reference: while (fix.back - fix.back > dur) pop_back  -> never trims

    # --------------------------------------------------------------- solve
    def _bracket(self, t):
        """upper_bound bracket (sp_l, sp_r, factor) in the sliding samples
        (the reference's std::upper_bound lookups, cc:258-332). t equal to the
        back sample clamps to the last interval with factor 1 (the lerped value
        and jacobian weights are identical either way)."""
        ts = np.array([s.timestamp for s in self.sample_states])
        idx = int(np.searchsorted(ts, t, side="right"))
        if idx == len(ts) and t == ts[-1]:
            idx -= 1
        assert 1 <= idx < len(ts), (t, ts[0], ts[-1])
        f = (t - ts[idx - 1]) / (ts[idx] - ts[idx - 1])
        return idx - 1, idx, f

    def _build_problem(self, corrs_sld, corrs_fix):
        """Factor construction + residual/jacobian/cost closures for the
        current window (split from _solve so the FD-verification test can
        probe the jacobians directly)."""
        cfg = self.cfg
        S = len(self.sample_states)
        sig2 = cfg.surfel_sigma_floor**2
        a2 = cfg.cauchy_loss_scale**2

        # ---- surfel factors (cost_functor.h:16-241): weight_/norm_ fixed at
        # build time from current world covariances
        bfac = []  # binary: both ends corrected (s1, s2 in sliding window)
        for s1, s2 in corrs_sld:
            cov = s1.cov_world() + s2.cov_world()
            vals, vecs = np.linalg.eigh(cov)
            w = 1.0 / np.sqrt(sig2 + vals[0])
            il1, ir1, f1 = self._bracket(s1.timestamp)
            il2, ir2, f2 = self._bracket(s2.timestamp)
            bfac.append((il1, ir1, f1, il2, ir2, f2, w, vecs[:, 0],
                         quat_rot(s1.rot, s1.center), s1.pos,
                         quat_rot(s2.rot, s2.center), s2.pos))
        ufac = []  # unary: s1 constant (fixed window), s2 corrected
        for s1, s2 in corrs_fix:
            cov = s1.cov_world() + s2.cov_world()
            vals, vecs = np.linalg.eigh(cov)
            w = 1.0 / np.sqrt(sig2 + vals[0])
            il2, ir2, f2 = self._bracket(s2.timestamp)
            ufac.append((il2, ir2, f2, w, vecs[:, 0], s1.center_world(),
                         quat_rot(s2.rot, s2.center), s2.pos))

        # ---- imu factors (cc:319-363): triples fully inside the sample span
        ifac = []
        sfront = self.sample_states[0].timestamp
        sback = self.sample_states[-1].timestamp
        for i in range(len(self.imu_states) - 2):
            i1, i2, i3 = self.imu_states[i], self.imu_states[i + 1], self.imu_states[i + 2]
            if i1.timestamp < sfront:
                continue
            if i3.timestamp > sback:
                break
            br = []
            for st in (i1, i2, i3):
                # ComputeStateCorr: each time bracketed independently
                il, ir, f = self._bracket(min(st.timestamp, sback))
                br.append((il, ir, f))
            ifac.append((i1, i2, i3, br))

        grav = self.sample_states[-1].grav
        dt = 1.0 / cfg.imu_rate
        wg, wa, wbg, wba = cfg.weight_gyr, cfg.weight_acc, cfg.weight_bg, cfg.weight_ba

        # precompute imu constants
        R1s = np.array([quat_to_mat(f[0].rot) for f in ifac]) if ifac else np.zeros((0, 3, 3))
        R2s = np.array([quat_to_mat(f[1].rot) for f in ifac]) if ifac else np.zeros((0, 3, 3))
        p1s = np.array([f[0].pos for f in ifac]).reshape(-1, 3)
        p2s = np.array([f[1].pos for f in ifac]).reshape(-1, 3)
        p3s = np.array([f[2].pos for f in ifac]).reshape(-1, 3)
        a1s = np.array([f[0].acc for f in ifac]).reshape(-1, 3)
        g1s = np.array([f[0].gyr for f in ifac]).reshape(-1, 3)
        g2s = np.array([f[1].gyr for f in ifac]).reshape(-1, 3)
        ibr = np.array([[list(b) for b in f[3]] for f in ifac]).reshape(-1, 3, 3)

        n_par = S * 12
        free = np.ones(n_par, bool)
        # SubsetParameterization while the first-ever sample leads (cc:556-560)
        if self.sample_states[0] is self.first_state:
            free[3:6] = False

        def lerp12(x, il, ir, f, sl):
            return (1 - f)[:, None] * x[il, sl] + f[:, None] * x[ir, sl]

        def surfel_residuals(x, with_jac):
            """Residuals + dense jacobian rows for all surfel factors."""
            rows = []
            res = []
            jrows = None
            m = len(bfac) + len(ufac)
            if with_jac:
                jrows = np.zeros((m, S, 12))
            k = 0
            for il1, ir1, f1, il2, ir2, f2, w, nv, a1, pp1, a2_, pp2 in bfac:
                r1 = (1 - f1) * x[il1, 0:3] + f1 * x[ir1, 0:3]
                t1 = (1 - f1) * x[il1, 3:6] + f1 * x[ir1, 3:6]
                r2 = (1 - f2) * x[il2, 0:3] + f2 * x[ir2, 0:3]
                t2 = (1 - f2) * x[il2, 3:6] + f2 * x[ir2, 3:6]
                e1, e2 = exp_so3(r1), exp_so3(r2)
                res.append(w * nv @ (e1 @ a1 + t1 + pp1 - e2 @ a2_ - t2 - pp2))
                if with_jac:
                    j1 = np.zeros(12)
                    j1[0:3] = -w * nv @ (e1 @ hat(a1) @ jr(r1))
                    j1[3:6] = w * nv
                    j2 = np.zeros(12)
                    j2[0:3] = w * nv @ (e2 @ hat(a2_) @ jr(r2))
                    j2[3:6] = -w * nv
                    jrows[k, il1] += j1 * (1 - f1)
                    jrows[k, ir1] += j1 * f1
                    jrows[k, il2] += j2 * (1 - f2)
                    jrows[k, ir2] += j2 * f2
                k += 1
            for il2, ir2, f2, w, nv, c1w, a2_, pp2 in ufac:
                r2 = (1 - f2) * x[il2, 0:3] + f2 * x[ir2, 0:3]
                t2 = (1 - f2) * x[il2, 3:6] + f2 * x[ir2, 3:6]
                e2 = exp_so3(r2)
                res.append(w * nv @ (c1w - e2 @ a2_ - t2 - pp2))
                if with_jac:
                    j2 = np.zeros(12)
                    j2[0:3] = w * nv @ (e2 @ hat(a2_) @ jr(r2))
                    j2[3:6] = -w * nv
                    jrows[k, il2] += j2 * (1 - f2)
                    jrows[k, ir2] += j2 * f2
                k += 1
            res = np.asarray(res) if res else np.zeros(0)
            if with_jac:
                jrows = jrows.reshape(m, n_par) if m else np.zeros((0, n_par))
            return res, jrows

        def imu_residuals(x, with_jac):
            """cost_functor.h:272-356 residuals; Jacobians derived correctly
            (FD-verified in test_oracle_pipeline.py)."""
            mi = len(ifac)
            if mi == 0:
                return np.zeros(0), np.zeros((0, n_par)) if with_jac else None
            # corrections lerped at i1, i2, i3 times
            cor = []
            for kk in range(3):
                il, ir, f = ibr[:, kk, 0].astype(int), ibr[:, kk, 1].astype(int), ibr[:, kk, 2]
                cor.append(dict(
                    il=il, ir=ir, f=f,
                    r=lerp12(x, il, ir, f, slice(0, 3)),
                    t=lerp12(x, il, ir, f, slice(3, 6)),
                    bg=lerp12(x, il, ir, f, slice(6, 9)),
                    ba=lerp12(x, il, ir, f, slice(9, 12)),
                ))
            e1 = exp_so3(cor[0]["r"])
            e2 = exp_so3(cor[1]["r"])
            A = e1 @ R1s          # Exp(r1) R1
            B = e2 @ R2s
            Q = np.transpose(A, (0, 2, 1)) @ B
            q = log_so3(Q)
            gyr_est = q / dt
            acc_est = ((cor[2]["t"] + p3s) + (cor[0]["t"] + p1s) - 2 * (cor[1]["t"] + p2s)) / dt**2
            rot_acc = np.einsum("mij,mj->mi", A, a1s - cor[0]["ba"])
            r = np.zeros((mi, 12))
            r[:, 0:3] = wg * ((g1s + g2s) / 2 - gyr_est - cor[0]["bg"])
            r[:, 3:6] = wa * (rot_acc - acc_est + grav)
            r[:, 6:9] = wbg * (cor[0]["bg"] - cor[1]["bg"])
            r[:, 9:12] = wba * (cor[0]["ba"] - cor[1]["ba"])
            if not with_jac:
                return r.reshape(-1), None

            # d tau blocks: tau1 (at i1), tau2 (at i2), tau3 (at i3)
            R1v = np.einsum("mij,mj->mi", R1s, a1s - cor[0]["ba"])
            jt1 = np.zeros((mi, 12, 12))
            jt1[:, 0:3, 0:3] = (wg / dt) * (jl_inv(q) @ np.transpose(R1s, (0, 2, 1)) @ jr(cor[0]["r"]))
            jt1[:, 0:3, 6:9] = -wg * np.eye(3)
            jt1[:, 3:6, 0:3] = -wa * (e1 @ hat(R1v) @ jr(cor[0]["r"]))
            jt1[:, 3:6, 3:6] = (-wa / dt**2) * np.eye(3)
            jt1[:, 3:6, 9:12] = -wa * A
            jt1[:, 6:9, 6:9] = wbg * np.eye(3)
            jt1[:, 9:12, 9:12] = wba * np.eye(3)

            jt2 = np.zeros((mi, 12, 12))
            jt2[:, 0:3, 0:3] = (-wg / dt) * (jr_inv(q) @ np.transpose(R2s, (0, 2, 1)) @ jr(cor[1]["r"]))
            jt2[:, 3:6, 3:6] = (2 * wa / dt**2) * np.eye(3)
            jt2[:, 6:9, 6:9] = -wbg * np.eye(3)
            jt2[:, 9:12, 9:12] = -wba * np.eye(3)

            jt3 = np.zeros((mi, 12, 12))
            jt3[:, 3:6, 3:6] = (-wa / dt**2) * np.eye(3)

            jd = np.zeros((mi, 12, S, 12))
            for kk, jt in ((0, jt1), (1, jt2), (2, jt3)):
                il, ir, f = ibr[:, kk, 0].astype(int), ibr[:, kk, 1].astype(int), ibr[:, kk, 2]
                np.add.at(jd, (np.arange(mi), slice(None), il), jt * (1 - f)[:, None, None])
                np.add.at(jd, (np.arange(mi), slice(None), ir), jt * f[:, None, None])
            return r.reshape(-1), jd.reshape(mi * 12, n_par)

        def cost(x):
            rs, _ = surfel_residuals(x, False)
            ri, _ = imu_residuals(x, False)
            return 0.5 * (np.sum(a2 * np.log1p(rs * rs / a2)) + np.sum(ri * ri))

        def normal_eqs(x):
            rs, js = surfel_residuals(x, True)
            ri, ji = imu_residuals(x, True)
            # first-order robust corrector (what Ceres does for rho'' < 0)
            sw = 1.0 / np.sqrt(1.0 + rs * rs / a2)
            js = js * sw[:, None]
            rs = rs * sw
            jall = np.concatenate([js, ji], axis=0)
            rall = np.concatenate([rs, ri])
            h = jall.T @ jall
            g = jall.T @ rall
            return h, g

        return dict(surfel_residuals=surfel_residuals, imu_residuals=imu_residuals,
                    cost=cost, normal_eqs=normal_eqs, free=free, S=S,
                    n_bfac=len(bfac), n_ufac=len(ufac), n_ifac=len(ifac))

    def _solve(self, corrs_sld, corrs_fix):
        cfg = self.cfg
        prob = self._build_problem(corrs_sld, corrs_fix)
        S, free = prob["S"], prob["free"]
        cost, normal_eqs = prob["cost"], prob["normal_eqs"]

        # ---- Levenberg-Marquardt (f64, full convergence)
        x = np.array([ss.data_cor for ss in self.sample_states])
        c = cost(x)
        lam, nu = 1e-6, 2.0
        h, g = normal_eqs(x)
        for _ in range(cfg.inner_iter_num_max):
            d = np.clip(np.diag(h), 1e-12, None)
            hd = h + lam * np.diag(d)
            hd = hd * np.outer(free, free) + np.diag((~free).astype(np.float64))
            gm = g * free
            delta = np.linalg.solve(hd, -gm)
            xn = x + delta.reshape(S, 12)
            cn = cost(xn)
            pred = 0.5 * (delta @ (lam * d * delta) - delta @ gm)
            if cn < c and np.isfinite(cn) and pred > 0:
                rel = (c - cn) / max(c, 1e-300)
                rho = (c - cn) / max(pred, 1e-300)
                x, c = xn, cn
                lam *= max(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
                nu = 2.0
                if rel < 1e-9:
                    break
                h, g = normal_eqs(x)
            else:
                lam *= nu
                nu *= 2.0
                if lam > 1e12:
                    break
        for ss, row in zip(self.sample_states, x):
            ss.data_cor[:] = row


def run_oracle(cfg, seq):
    """Feed a SyntheticSequence through the oracle; returns the oracle."""
    lo = OracleLidarOdometry(cfg)
    it = iter(seq.imu)
    pending = next(it, None)
    for ts, pl in seq.scans:
        while pending is not None and pending[0] <= ts[-1] + 0.01:
            lo.add_imu(*pending)
            pending = next(it, None)
        lo.add_scan(ts, pl)
    return lo
