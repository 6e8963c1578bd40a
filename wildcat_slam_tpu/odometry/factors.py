"""Batched factor construction and evaluation with analytic Jacobians.

Covers cost_functor.h — ``SurfelMatchUnaryFactor`` (:16-69),
``SurfelMatchBinaryFactor<0|1|2>`` (:71-241) and ``ImuFactor<0|1>`` (:243-472) —
re-designed for scatter-based assembly: the reference needs 5 template
specializations because Ceres demands a distinct parameter-block signature per
bracket-overlap pattern; with (sample index, weight) scatter pairs the modes
disappear. Every surfel factor touches up to 4 sample blocks with linear
interpolation weights, every IMU factor up to 6 (3 interpolation times x 2
brackets); coincident indices simply accumulate.

Conventions:
- ``cor`` is the (S, 12) correction state: [rot_cor, pos_cor, bg, ba] per sample
  state (surfel.h:13-17).
- The *linear* interpolation of corrections between bracketing sample states is
  the optimizer's parameterization (cost_functor.h:33-35,124-136,358-400); the
  cubic B-spline smoothing happens only in the post-solve state update.
- Jacobians here are exact derivatives of the residuals as written, verified by
  finite differences in tests. Two deliberate deviations from the reference's
  hand-written Jacobians, which are inconsistent with its own residual:
  (a) the reference adds a gyro-residual/bias block for the *second* IMU time
      (cost_functor.h:314) although the residual only uses the bias at the first
      (:295); (b) its gyro/rotation block for the first time (:303) evaluates
      F() with ``Exp(+r)`` where the residual contains ``Exp(r)^-1`` (:291) —
      both agree with the exact derivative only at zero correction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from wildcat_slam_tpu.odometry.states import SampleStates, Surfels
from wildcat_slam_tpu.ops import lie
from wildcat_slam_tpu.ops.eigh3 import eigh3


def sample_bracket(sample: SampleStates, t_query: jnp.ndarray):
    """Bracketing sample-state indices/factors for query times.

    upper_bound semantics (lidar_odometry.cc:258,303,330): right index is the
    first sample state with t > query, clipped into the valid range; the factor
    is clipped to [0, 1] (the reference CHECKs instead).
    Returns (il, ir, f): left/right indices and interpolation factor.
    """
    big = jnp.asarray(jnp.finfo(sample.t.dtype).max, sample.t.dtype)
    tpad = jnp.where(sample.mask, sample.t, big)
    q = t_query.astype(sample.t.dtype)
    # The sample grid is uniform by construction (one state per sample_dt tick,
    # lidar_odometry.cc:404-419), so the upper_bound is O(1) arithmetic with a
    # correction against the stored times (f32 rounding and exact tick queries
    # can put the floor guess up to two steps low — e.g. q exactly on tick m
    # must yield m+1). Replaces an unrolled bisection (~0.9 ms/sweep).
    n = sample.t.shape[0]
    ar = jnp.arange(n, dtype=jnp.int32)

    def read(ix):
        # table read as a one-hot masked reduce: exact (one nonzero summand),
        # and fuses on TPU — a width-1 row gather of the (S,) table at M=8k
        # query rows costs ~0.065 ms/call (whole tiled rows per fetch), and
        # sample_bracket needs four reads per call
        return jnp.sum(jnp.where(ix[..., None] == ar, tpad, 0.0), axis=-1)

    ir = jnp.floor((q - sample.t[0]) / (sample.t[1] - sample.t[0])).astype(jnp.int32)
    ir = jnp.clip(ir, 0, n - 1)
    for _ in range(2):  # first k with tpad[k] > q (std::upper_bound)
        ir = jnp.where(read(ir) <= q, jnp.minimum(ir + 1, n - 1), ir)
    ir = jnp.clip(ir, 1, sample.count - 1).astype(jnp.int32)
    il = ir - 1
    tl, tr = read(il), read(ir)  # il/ir <= count-1, where t == tpad
    f = (t_query.astype(sample.t.dtype) - tl) / jnp.maximum(tr - tl, jnp.finfo(sample.t.dtype).tiny)
    f = jnp.clip(f, 0.0, 1.0).astype(sample.cor.dtype)
    return il, ir, f


def _interp_cor(cor: jnp.ndarray, il, ir, f):
    """Linear interpolation of the 12-dof correction between brackets."""
    return cor[il] * (1.0 - f)[..., None] + cor[ir] * f[..., None]


# ---------------------------------------------------------------------------
# Surfel match factors (unary + binary unified)
# ---------------------------------------------------------------------------

@struct.dataclass
class SurfelFactors:
    """Per-factor constants, fixed at build time (cost_functor.h:22-26,110-113:
    the joint-covariance normal and weight are computed at construction and do
    not vary during the solve)."""

    valid: jnp.ndarray  # (M,)
    w: jnp.ndarray      # (M,) 1/sqrt((0.05/6)^2 + lambda_min)
    n: jnp.ndarray      # (M, 3) joint normal (world, min eigvec of cov1+cov2)
    # side 1 (earlier surfel): if opt1, v1/p1 are (R1 c_b, pos1) and i1/f1 give
    # its correction bracket; else (fixed window) v1 + p1 is the world center.
    opt1: jnp.ndarray   # (M,) bool — False for unary factors
    v1: jnp.ndarray     # (M, 3)
    p1: jnp.ndarray     # (M, 3)
    i1l: jnp.ndarray    # (M,) int32
    i1r: jnp.ndarray
    f1: jnp.ndarray     # (M,)
    # side 2 (later surfel): always optimized
    v2: jnp.ndarray
    p2: jnp.ndarray
    i2l: jnp.ndarray
    i2r: jnp.ndarray
    f2: jnp.ndarray

    @property
    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def pack_factor_rows(s: Surfels) -> jnp.ndarray:
    """(K, 18) per-surfel factor constants packed into one row:
    [t, valid, rot quat (4), center body (3), pos (3), cov_world sym6 (6)].

    TPU random row gathers pay per row, not per byte, at these widths — one
    wide (M, 18) gather per matched side replaces six narrow ones, and the
    window's cov_world is computed once per sweep instead of once per factor
    build (the sliding window feeds both the binary and the unary build)."""
    cw = s.cov_world()
    cw6 = jnp.stack([cw[:, 0, 0], cw[:, 1, 1], cw[:, 2, 2],
                     cw[:, 0, 1], cw[:, 0, 2], cw[:, 1, 2]], axis=1)
    return jnp.concatenate([
        s.t[:, None], s.valid.astype(s.t.dtype)[:, None],
        s.rot, s.center, s.pos, cw6,
    ], axis=1)


def pack_geo_rows(s: Surfels) -> jnp.ndarray:
    """(K, 12) pose-frozen derived geometry per surfel:
    [cov_world sym6 (6), center_world (3), norm_world (3)].

    Every column is a pure row-local function of (rot, pos, center, norm, cov)
    — fields that never change after a surfel enters the FIXED window (poses
    are only re-attached for the sliding window, corrections.py). The pipeline
    therefore caches this table for the fixed window and refreshes only the
    rows touched by the sweep's insert (window.insert_surfels aux payload)
    instead of recomputing all ``max_surfels_fixed`` rows per sweep."""
    cw = s.cov_world()
    cw6 = jnp.stack([cw[:, 0, 0], cw[:, 1, 1], cw[:, 2, 2],
                     cw[:, 0, 1], cw[:, 0, 2], cw[:, 1, 2]], axis=1)
    return jnp.concatenate([cw6, s.center_world(), s.norm_world()], axis=1)


def pack_factor_rows_from_geo(s: Surfels, geo: jnp.ndarray) -> jnp.ndarray:
    """:func:`pack_factor_rows` assembled from a cached :func:`pack_geo_rows`
    table — live t/valid (they change at rebase/trim) + raw pose/geometry
    fields + the cached cov_world sym6. Matches ``pack_factor_rows`` exactly
    on all raw-field columns; the cov6 columns agree to f32 roundoff (the
    3-wide cov_world matmul may reduce in a different order at the cache's
    insert-block batch size than at the full window)."""
    return jnp.concatenate([
        s.t[:, None], s.valid.astype(s.t.dtype)[:, None],
        s.rot, s.center, s.pos, geo[:, 0:6],
    ], axis=1)


def _sym6_to_full(m6: jnp.ndarray) -> jnp.ndarray:
    xx, yy, zz, xy, xz, yz = (m6[..., i] for i in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([xy, yy, yz], axis=-1),
        jnp.stack([xz, yz, zz], axis=-1),
    ], axis=-2)


def build_surfel_factors(
    sq: Surfels, st_: Surfels,
    iq: jnp.ndarray, it: jnp.ndarray, pair_valid: jnp.ndarray,
    sample: SampleStates,
    sigma_floor: float,
    target_optimized: bool,
    sq_pack: jnp.ndarray | None = None,
    st_pack: jnp.ndarray | None = None,
) -> SurfelFactors:
    """Build factor constants from matched pairs (iq into sq, it into st_).

    ``target_optimized=True``: both surfels live in the sliding window (binary
    factor, lidar_odometry.cc:254-297). ``False``: the target is in the frozen
    fixed window (unary factor, :299-317). The pair is ordered by time so s1 is
    the earlier surfel (knn_surfel_matcher.cc:41-45).

    ``sq_pack``/``st_pack``: precomputed :func:`pack_factor_rows` tables (the
    pipeline shares the sliding window's across both builds).
    """
    if sq_pack is None:
        sq_pack = pack_factor_rows(sq)
    if st_pack is None:
        st_pack = sq_pack if st_ is sq else pack_factor_rows(st_)
    gq = sq_pack[iq]   # (M, 18) — one wide gather per side
    gt = st_pack[it]

    tq, tt = gq[:, 0], gt[:, 0]
    valid = pair_valid & (gq[:, 1] > 0.5) & (gt[:, 1] > 0.5)

    cw_q = _sym6_to_full(gq[:, 12:18])
    cw_t = _sym6_to_full(gt[:, 12:18])
    vals, vecs = eigh3(cw_q + cw_t)
    lam_min = vals[..., 0]
    n = vecs[..., :, 0]
    w = 1.0 / jnp.sqrt(sigma_floor**2 + jnp.maximum(lam_min, 0.0))

    # per-side quantities (from the gathered rows — no further window reads)
    def side(g):
        v = lie.quat_rotate(g[:, 2:6], g[:, 6:9])  # R * c_body
        p = g[:, 9:12]
        il, ir, f = sample_bracket(sample, g[:, 0])
        return v, p, il, ir, f

    vq_, pq_, iql, iqr, fq = side(gq)
    vt_, pt_, itl, itr, ft = side(gt)

    if target_optimized:
        # order by time: s1 = earlier (both optimized)
        swap = tq > tt
        sel = lambda a, b: jnp.where(swap, b, a)
        selv = lambda a, b: jnp.where(swap[:, None], b, a)
        return SurfelFactors(
            valid=valid & (tq != tt), w=w, n=n,
            opt1=jnp.ones_like(valid),
            v1=selv(vq_, vt_), p1=selv(pq_, pt_), i1l=sel(iql, itl), i1r=sel(iqr, itr), f1=sel(fq, ft),
            v2=selv(vt_, vq_), p2=selv(pt_, pq_), i2l=sel(itl, iql), i2r=sel(itr, iqr), f2=sel(ft, fq),
        )
    else:
        # unary: target (fixed window) is s1 and constant; query (sliding) is s2.
        # The reference builds these factors only with the fixed surfel first
        # (BuildFixWinLidarResiduals), regardless of time order of the match.
        c1w = vt_ + pt_
        zi = jnp.zeros_like(iq)
        return SurfelFactors(
            valid=valid, w=w, n=n,
            opt1=jnp.zeros_like(valid),
            v1=c1w, p1=jnp.zeros_like(c1w), i1l=zi, i1r=zi, f1=jnp.zeros_like(fq),
            v2=vq_, p2=pq_, i2l=iql, i2r=iqr, f2=fq,
        )


def direction_coverage(fac: SurfelFactors, ref_pos: jnp.ndarray):
    """Degeneracy health signal: direction coverage of the surfel constraints.

    The reference has no analog — it emits confident poses in weak geometry
    (corridors between sparse doors, rotationally symmetric rooms) with no
    warning (lidar_odometry.cc:540-562 solves whatever problem it is given).
    This diagnostic follows the Zhang & Singh ICRA'16 degeneracy analysis: a
    surfel factor constrains motion only along its joint normal, so the
    weighted second-moment matrices of the constraint directions

        D_t = sum_m w_m^2  n_m n_m^T                       (translation)
        D_r = sum_m w_m^2  c_m c_m^T,  c_m = (x_m - p) x n_m   (rotation)

    measure how well the 3 translation / 3 rotation axes are observed by the
    current match set (x_m = world center of the optimized-side surfel, p = the
    current pose position, so levers are window-scale). The scale-free
    eigenvalue ratios lambda_min/lambda_max in [0, 1] are the health signal:
    a corridor with no cross walls drives the translation ratio toward 0 along
    the corridor axis; a rotationally symmetric scene (cylinder) drives the
    rotation ratio toward 0 about the symmetry axis. Returns
    ``(trans_ratio, rot_ratio)`` as scalars; 0 when no factors are active
    (no lidar constraint at all — maximally degenerate).
    """
    dt_mat, dr_mat = _coverage_mats(fac, ref_pos)
    dtype = fac.n.dtype

    def ratio(d):
        vals, _ = eigh3(d)
        lo = jnp.maximum(vals[0], 0.0)
        return lo / jnp.maximum(vals[2], jnp.finfo(dtype).tiny)

    return ratio(dt_mat), ratio(dr_mat)


def _coverage_mats(fac: SurfelFactors, ref_pos: jnp.ndarray):
    """The weighted second-moment matrices (D_t, D_r) of
    :func:`direction_coverage` — shared with :func:`degeneracy_projectors`."""
    dtype = fac.n.dtype
    w2 = jnp.where(fac.valid, fac.w * fac.w, 0.0).astype(dtype)
    dt_mat = jnp.einsum("m,mi,mj->ij", w2, fac.n, fac.n)
    lever = (fac.v2 + fac.p2) - ref_pos[None, :].astype(dtype)
    c = jnp.cross(lever, fac.n)
    dr_mat = jnp.einsum("m,mi,mj->ij", w2, c, c)
    return dt_mat, dr_mat


def degeneracy_projectors(fac: SurfelFactors, ref_pos: jnp.ndarray,
                          remap_ratio: float):
    """Weak-subspace projectors for degeneracy solution remapping.

    Acting on the round-4 health signal instead of only reporting it: when a
    direction-coverage eigenvalue collapses, the joint problem still has a
    near-null mode — the COMMON-MODE (all-states-together) translation or
    rotation update along the collapsed axis, which neither the surfel factors
    (no constraint there) nor the IMU factors (relative-only) observe. The LM
    damping regularizes the singularity numerically, so the solver happily
    steps into that subspace driven by residual noise; the steps accumulate as
    random-walk drift. The standard remedy is Zhang & Singh ICRA'16 §V
    solution remapping — zero the update along unobserved directions and keep
    the prediction (here: IMU dead reckoning) there instead. The joint-solve
    adaptation (solver.lm_step): project only the common-mode MEAN of the
    per-state updates off the weak axes, preserving the differential
    components the IMU does observe.

    Returns ``(W_t, W_r, trans_ratio, rot_ratio)``: 3x3 weak-subspace
    projectors ``W = sum_{k weak} v_k v_k^T`` (world frame; weak = eigenvalue
    < remap_ratio * lambda_max) plus the same scale-free ratios
    :func:`direction_coverage` reports. On a healthy scene both W are EXACT
    zeros (the mask sums no terms), so the solver's remapped step equals the
    unremapped one bit-for-bit — the remap is inert unless the signal fires.
    (No reference analog: lidar_odometry.cc:540-562 solves blind.)
    """
    dt_mat, dr_mat = _coverage_mats(fac, ref_pos)
    dtype = fac.n.dtype

    def proj(d):
        vals, vecs = eigh3(d)
        lam_max = jnp.maximum(vals[2], jnp.finfo(dtype).tiny)
        ratio = jnp.maximum(vals[0], 0.0) / lam_max
        weak = (vals < remap_ratio * vals[2]).astype(dtype)        # (3,)
        w = jnp.einsum("k,ik,jk->ij", weak, vecs, vecs)
        return w, ratio

    w_t, r_t = proj(dt_mat)
    w_r, r_r = proj(dr_mat)
    return w_t, w_r, r_t, r_r


def interp_weights(fac: SurfelFactors, s_cap: int, dtype):
    """(W1, W2): (M, S) bracket-lerp weight matrices, constant through a solve.

    ``W @ cor`` reproduces ``_interp_cor`` as one MXU contraction instead of
    per-factor row gathers (built once per solve — the brackets don't move),
    and doubles as the scatter map for the Jacobian rows: row m of J is
    ``W1[m] ⊗ j1[m] + W2[m] ⊗ j2[m]``."""
    ar = jnp.arange(s_cap, dtype=jnp.int32)
    w1 = ((fac.i1l[:, None] == ar) * (1.0 - fac.f1)[:, None]
          + (fac.i1r[:, None] == ar) * fac.f1[:, None])
    w2 = ((fac.i2l[:, None] == ar) * (1.0 - fac.f2)[:, None]
          + (fac.i2r[:, None] == ar) * fac.f2[:, None])
    return w1.astype(dtype), w2.astype(dtype)


def surfel_residuals(fac: SurfelFactors, cor: jnp.ndarray, with_jac: bool = True,
                     w_interp=None):
    """Evaluate residuals and (optionally) Jacobian blocks.

    Returns (r (M,), jac (M, 4, 12), idx (M, 4)): per-factor contributions onto
    sample blocks (i1l, i1r, i2l, i2r) — unary factors carry zero weight on the
    first two. Residual (cost_functor.h:39,140):
    r = w n . (T1 - T2),  T_i = Exp(r_si) v_i + t_si + p_i (optimized side).

    ``w_interp``: optional precomputed :func:`interp_weights` — routes the
    correction interpolation through the MXU instead of row gathers.
    """
    if w_interp is not None:
        # HIGHEST precision: TPU f32 matmuls default to one-pass bf16
        # multiplications; this contraction replaces an exact gather+lerp and
        # feeds residuals directly, so it must be true f32
        w1, w2 = w_interp
        hp = jax.lax.Precision.HIGHEST
        c1 = jnp.matmul(w1, cor, precision=hp)
        c2 = jnp.matmul(w2, cor, precision=hp)
    else:
        c1 = _interp_cor(cor, fac.i1l, fac.i1r, fac.f1)
        c2 = _interp_cor(cor, fac.i2l, fac.i2r, fac.f2)
    r1c, t1c = c1[:, 0:3], c1[:, 3:6]
    r2c, t2c = c2[:, 0:3], c2[:, 3:6]

    e1 = lie.quat_rotate(lie.exp_quat(r1c), fac.v1) + t1c + fac.p1
    t1 = jnp.where(fac.opt1[:, None], e1, fac.v1)  # unary: v1 is the world center
    t2 = lie.quat_rotate(lie.exp_quat(r2c), fac.v2) + t2c + fac.p2

    r = fac.w * jnp.sum(fac.n * (t1 - t2), axis=-1)
    r = jnp.where(fac.valid, r, 0.0)
    if not with_jac:
        return r, None, None

    wn = fac.w[:, None] * fac.n  # (M, 3)

    def block(v, rc, sign):
        # d r / d rot_cor = sign * w n^T * (-Exp(rc) Hat(v) Jr(rc)); concat, not
        # .at[].set — slab writes into tiled layouts are slow on TPU.
        # The 3x3 product is consumed only through the row vector w n^T, so
        # evaluate as three successive batched matvecs on the VPU (u^T Hat(v)
        # = cross(u, v)) instead of materializing (M, 3, 3) MXU products.
        u = lie.vec_mat3(wn, lie.exp_matrix(rc))
        u = jnp.cross(u, v)
        jrot = -sign * lie.vec_mat3(u, lie.jr(rc))
        jpos = sign * wn
        return jnp.concatenate([jrot, jpos, jnp.zeros(v.shape[:1] + (6,), v.dtype)], axis=1)

    j1 = block(fac.v1, r1c, 1.0) * fac.opt1[:, None]
    j2 = block(fac.v2, r2c, -1.0)
    vm = fac.valid[:, None]
    jac = jnp.stack(
        [
            j1 * (1.0 - fac.f1)[:, None] * vm,
            j1 * fac.f1[:, None] * vm,
            j2 * (1.0 - fac.f2)[:, None] * vm,
            j2 * fac.f2[:, None] * vm,
        ],
        axis=1,
    )
    idx = jnp.stack([fac.i1l, fac.i1r, fac.i2l, fac.i2r], axis=1)
    return r, jac, idx


# ---------------------------------------------------------------------------
# IMU factors
# ---------------------------------------------------------------------------

@struct.dataclass
class ImuFactors:
    """Constants for one IMU-triplet factor (i1, i2, i3) (cost_functor.h:257-271).
    ``idx``/``f``: (Mi, 3, 2) bracket indices and (Mi, 3) lerp factors for the
    three IMU timestamps."""

    valid: jnp.ndarray  # (Mi,)
    q1: jnp.ndarray     # (Mi, 4) nominal rot of i1
    q2: jnp.ndarray     # (Mi, 4) nominal rot of i2
    a1: jnp.ndarray     # (Mi, 3) acc of i1
    g1: jnp.ndarray     # (Mi, 3) gyr of i1
    g2: jnp.ndarray     # (Mi, 3) gyr of i2
    p1: jnp.ndarray     # (Mi, 3) pos of i1
    p2: jnp.ndarray
    p3: jnp.ndarray
    il: jnp.ndarray     # (Mi, 3) int32 left bracket per tau
    ir: jnp.ndarray     # (Mi, 3) int32
    f: jnp.ndarray      # (Mi, 3)

    @property
    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def build_imu_factors(imu, sample: SampleStates, max_factors: int) -> ImuFactors:
    """One factor per consecutive IMU triplet fully inside the sample window
    (BuildImuResiduals, lidar_odometry.cc:319-363)."""
    cap = imu.capacity
    i0 = jnp.arange(cap, dtype=jnp.int32)
    front = sample.t[0]
    back = sample.t[sample.count - 1]
    valid = (
        (i0 + 2 < imu.count)
        & (imu.t >= front)                       # i1 inside window (cc:324)
        & (imu.t[jnp.minimum(i0 + 2, cap - 1)] <= back)  # i3 inside (cc:327)
    )

    t123 = jnp.stack(
        [imu.t, imu.t[jnp.minimum(i0 + 1, cap - 1)], imu.t[jnp.minimum(i0 + 2, cap - 1)]],
        axis=1,
    )
    il, ir, f = sample_bracket(sample, t123)

    fac = ImuFactors(
        valid=valid,
        q1=imu.rot, q2=imu.rot[jnp.minimum(i0 + 1, cap - 1)],
        a1=imu.acc, g1=imu.gyr, g2=imu.gyr[jnp.minimum(i0 + 1, cap - 1)],
        p1=imu.pos, p2=imu.pos[jnp.minimum(i0 + 1, cap - 1)], p3=imu.pos[jnp.minimum(i0 + 2, cap - 1)],
        il=il, ir=ir, f=f,
    )
    # compact to max_factors (valid first, stable keeps time order)
    order = jnp.argsort(~fac.valid, stable=True)[:max_factors]
    return jax.tree_util.tree_map(lambda x: x[order], fac)


def imu_residuals(fac: ImuFactors, cor: jnp.ndarray, weights, dt: float, grav: jnp.ndarray,
                  with_jac: bool = True):
    """Evaluate the 12-dim residual and (optionally) Jacobian blocks per factor.

    Residual (cost_functor.h:291-298):
      r[0:3] = w_g ((g1+g2)/2 - Log((Exp(c1) q1)^-1 Exp(c2) q2)/dt - bg(tau1))
      r[3:6] = w_a (Exp(c1) q1 (a1 - ba(tau1)) - ((p3c+p3)+(p1c+p1)-2(p2c+p2))/dt^2 + grav)
      r[6:9] = w_bg (bg(tau1) - bg(tau2));  r[9:12] = w_ba (ba(tau1) - ba(tau2))

    Returns (r (Mi, 12), jac (Mi, 6, 12, 12), idx (Mi, 6)) where the 6 blocks are
    (tau1_l, tau1_r, tau2_l, tau2_r, tau3_l, tau3_r) contributions.
    """
    w_g, w_a, w_bg, w_ba = weights
    dtype = cor.dtype
    mi = fac.q1.shape[0]

    c = jnp.stack([_interp_cor(cor, fac.il[:, k], fac.ir[:, k], fac.f[:, k]) for k in range(3)], axis=1)  # (Mi, 3, 12)
    r1c, r2c = c[:, 0, 0:3], c[:, 1, 0:3]
    t1c, t2c, t3c = c[:, 0, 3:6], c[:, 1, 3:6], c[:, 2, 3:6]
    bg1, bg2 = c[:, 0, 6:9], c[:, 1, 6:9]
    ba1, ba2 = c[:, 0, 9:12], c[:, 1, 9:12]

    e1 = lie.exp_quat(r1c)
    e2 = lie.exp_quat(r2c)
    q1c = lie.quat_mul(e1, fac.q1)  # corrected rot of i1
    q2c = lie.quat_mul(e2, fac.q2)

    x = lie.quat_mul(lie.quat_conj(q1c), q2c)
    theta = lie.log_quat(x)
    gyr_est = theta / dt
    acc_world = lie.quat_rotate(q1c, fac.a1 - ba1)
    acc_est = ((t3c + fac.p3) + (t1c + fac.p1) - 2.0 * (t2c + fac.p2)) / (dt * dt)

    r = jnp.concatenate(
        [
            w_g * ((fac.g1 + fac.g2) / 2.0 - gyr_est - bg1),
            w_a * (acc_world - acc_est + grav),
            w_bg * (bg1 - bg2),
            w_ba * (ba1 - ba2),
        ],
        axis=1,
    )
    r = jnp.where(fac.valid[:, None], r, 0.0)
    if not with_jac:
        return r, None, None

    # --- analytic Jacobians wrt the three tau corrections (12x12 each) ---
    # assembled by block CONCATENATION: .at[].set slab writes into the TPU's
    # tiled layout lower to pathologically slow dynamic-update-slices (measured
    # ~1.9 ms per (Mi,12,12) write), while concatenated blocks fuse cleanly
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (mi, 3, 3))
    z3 = jnp.zeros((mi, 3, 3), dtype)

    q1m = lie.quat_to_matrix(fac.q1)
    q2m = lie.quat_to_matrix(fac.q2)
    jr1 = lie.jr(r1c)
    jr2 = lie.jr(r2c)

    # d theta/d r1c = -Jl_inv(theta) q1m^T Jr(r1c); d theta/d r2c = Jr_inv(theta) q2m^T Jr(r2c)
    dth_dr1 = -lie.mat3_mul(
        lie.mat3_mul(lie.jl_inv(theta), jnp.swapaxes(q1m, -1, -2)), jr1)
    dth_dr2 = lie.mat3_mul(
        lie.mat3_mul(lie.jr_inv(theta), jnp.swapaxes(q2m, -1, -2)), jr2)

    e1m = lie.quat_to_matrix(e1)
    dacc_dr1 = -lie.mat3_mul(
        lie.mat3_mul(e1m, lie.hat(lie.quat_rotate(fac.q1, fac.a1 - ba1))), jr1)

    def blockmat(rows):
        return jnp.concatenate(
            [jnp.concatenate(r, axis=2) for r in rows], axis=1)

    jt1 = blockmat([
        [-(w_g / dt) * dth_dr1, z3, -w_g * eye3, z3],
        [w_a * dacc_dr1, -(w_a / dt / dt) * eye3, z3, -w_a * lie.quat_to_matrix(q1c)],
        [z3, z3, w_bg * eye3, z3],
        [z3, z3, z3, w_ba * eye3],
    ])
    # NOTE jt2: no (gyr, bg) block — the residual uses bg(tau1) only; module doc.
    jt2 = blockmat([
        [-(w_g / dt) * dth_dr2, z3, z3, z3],
        [z3, (2.0 * w_a / dt / dt) * eye3, z3, z3],
        [z3, z3, -w_bg * eye3, z3],
        [z3, z3, z3, -w_ba * eye3],
    ])
    jt3 = blockmat([
        [z3, z3, z3, z3],
        [z3, -(w_a / dt / dt) * eye3, z3, z3],
        [z3, z3, z3, z3],
        [z3, z3, z3, z3],
    ])

    vm = fac.valid[:, None, None]
    jac = jnp.stack(
        [
            jt1 * (1.0 - fac.f[:, 0])[:, None, None] * vm,
            jt1 * fac.f[:, 0][:, None, None] * vm,
            jt2 * (1.0 - fac.f[:, 1])[:, None, None] * vm,
            jt2 * fac.f[:, 1][:, None, None] * vm,
            jt3 * (1.0 - fac.f[:, 2])[:, None, None] * vm,
            jt3 * fac.f[:, 2][:, None, None] * vm,
        ],
        axis=1,
    )
    idx = jnp.stack([fac.il[:, 0], fac.ir[:, 0], fac.il[:, 1], fac.ir[:, 1], fac.il[:, 2], fac.ir[:, 2]], axis=1)
    return r, jac, idx
