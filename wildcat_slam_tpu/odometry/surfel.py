"""Surfel extraction: hierarchical voxel plane fitting + temporal clustering.

TPU-native re-design of the reference's recursive octree pipeline
(surfel_extraction.cc:12-220,304-337):

Reference structure                      This module
-----------------------------------      ------------------------------------------
absl::flat_hash_map<VoxelLoc,OctoTree>   packed int cell keys + stable multi-key sort
OctoTree recursion (max_layer=2)         three flat voxel levels (0.8/0.4/0.2 m)
per-node InitPlane eigensolve            batched segment moments + closed-form eigh3
ClusterSurfels time-gap scan             sorted-order gap flags + cluster segment sums

Gating semantics preserved exactly (surfel_extraction.cc:128-184):
- level-0 voxels with  n0 > 20 points are plane-fitted; **planar roots are
  force-split too** (":131-137 note by kk"), so their children are also fitted;
- level-1 cells fitted iff n0 > 20 and n1 > 20; planar level-1 cells are leaves;
- level-2 cells fitted iff their level-1 parent was fitted, non-planar, and
  n2 > 20 (CutOctoTree recursion, :142-184);
- every *fitted and planar* node at any level contributes surfels via temporal
  clustering of its own points (ExtractSurfelInfo, :304-314): clusters split at
  >0.05 s gaps, clusters with >= 20 points re-fitted and plane-tested
  (ClusterSurfels, :12-65), normal sign fixed toward the view point.

Numerics: second moments are accumulated about each cell's center (anchor), not
the world origin — covariance is translation-invariant, and this keeps f32
cancellation error ~1e-8 even at 100 m range, which the plane threshold
(lambda_min < 1e-2, surfel sigma ~1e-2) requires.

Plane test (surfel_extraction.cc:106-111): node planar iff
``lambda_min < planer_threshold`` and ``2 (lambda_mid - lambda_min) / sum > min_plane_likeness``;
cluster kept iff ``lambda_min <= planer_threshold`` and ``likeness >= min_plane_likeness``
(the reference uses strict comparison for nodes and skip-if-beyond for clusters,
surfel_extraction.cc:54).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from wildcat_slam_tpu.config import WildcatConfig
from wildcat_slam_tpu.ops import voxel
from wildcat_slam_tpu.ops.dfsum import df_prefix, df_range_sum
from wildcat_slam_tpu.ops.eigh3 import eigh3

def _unpack_sym(m6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) [xx yy zz xy xz yz] -> full symmetric (..., 3, 3)."""
    xx, yy, zz, xy, xz, yz = (m6[..., i] for i in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([xy, yy, yz], axis=-1),
        jnp.stack([xz, yz, zz], axis=-1),
    ], axis=-2)


def _compact_positions(flag: jnp.ndarray, slot_id: jnp.ndarray, cap: int, fill: int,
                       payload: tuple = ()):
    """(cap + 1,) start positions: out[j] = index of the flagged element with
    ``slot_id == j`` (slot ids are consecutive over flagged elements), ``fill``
    for absent slots. Slots past ``cap`` are cut (slot ``cap`` itself is kept
    as the open-ended sentinel).

    This is stream compaction. The scatter formulation —
    ``full(cap+1, fill).at[where(flag, slot_id, cap+1)].set(arange)`` — walks
    all P index rows (~0.30 ms/call at P=64k on TPU, 6 calls/sweep); a 2-key
    bitonic sort that floats the flagged positions to the front costs ~0.1 ms
    and XLA shares nothing between the two, so the sort wins.

    ``payload``: optional per-element (P,) channels to carry through the same
    sort — returns each evaluated at the flagged positions (garbage at absent
    slots; callers must mask). Riding the sort replaces the width-1 random
    gathers ``chan[positions]`` (measured 0.116 ms each at 16384 slots — TPU
    gathers fetch whole tiled rows, so width-1 rows waste the lanes) with
    ~linear extra bitonic-pass traffic.
    """
    p = flag.shape[0]
    big = jnp.int32(2**31 - 1)
    key = jnp.where(flag, slot_id, big)
    outs = jax.lax.sort((key, jnp.arange(p, dtype=jnp.int32)) + tuple(payload),
                        num_keys=1)
    if p < cap + 1:  # fewer elements than slots: missing tail = absent slots
        pad = cap + 1 - p
        outs = (jnp.concatenate([outs[0], jnp.full((pad,), big, jnp.int32)]),
                jnp.concatenate([outs[1], jnp.zeros((pad,), jnp.int32)])) + tuple(
                    jnp.concatenate([o, jnp.zeros((pad,), o.dtype)]) for o in outs[2:])
    head_k, head_p = outs[0][:cap + 1], outs[1][:cap + 1]
    pos = jnp.where(head_k <= cap, head_p, jnp.int32(fill))
    if not payload:
        return pos
    return pos, tuple(o[:cap + 1] for o in outs[2:])


def _plane_test(vals: jnp.ndarray, thr: float, likeness_min: float, strict: bool):
    """vals: (..., 3) ascending eigenvalues."""
    s = jnp.sum(vals, axis=-1)
    likeness = 2.0 * (vals[..., 1] - vals[..., 0]) / jnp.maximum(s, jnp.finfo(vals.dtype).tiny)
    if strict:
        return (vals[..., 0] < thr) & (likeness > likeness_min)
    return (vals[..., 0] <= thr) & (likeness >= likeness_min)


@partial(jax.jit, static_argnames=("cfg",))
def extract_surfels(
    pts: jnp.ndarray,      # (P, 3) world-frame undistorted points
    t: jnp.ndarray,        # (P,) window-relative timestamps (sorted ascending)
    valid: jnp.ndarray,    # (P,) bool
    cfg: WildcatConfig,
):
    """Extract surfels from one undistorted sweep.

    Returns a dict of world-frame surfel arrays, each of length
    ``cfg.max_surfels_per_sweep``: t, center, cov, norm, resolution, std, valid —
    plus a scalar int32 ``n_dropped``: candidates lost to the static capacities
    (clusters past max_leaves_per_sweep + valid surfels past
    max_surfels_per_sweep). The reference's vectors are unbounded
    (surfel_extraction.cc:304-337), so capacity loss must never be silent.
    Surfels are sorted by timestamp (surfel_extraction.cc:334); overflow beyond
    the capacity drops the latest ones.
    """
    p_cap = pts.shape[0]
    dtype = pts.dtype
    n_levels = cfg.max_voxel_depth + 1
    min_pts = cfg.min_points_per_plane
    v_cap = cfg.max_voxels_per_sweep
    nc = cfg.max_leaves_per_sweep
    arange_p = jnp.arange(p_cap, dtype=jnp.int32)

    # TPU cost shape (profiled at 64k points): random row gathers of small rows
    # run at ~0.5 GB/s effective (4-byte rows vs 512-byte lanes), while carrying
    # the same channels through lax.sort's bitonic passes is ~10x cheaper, and
    # a scatter-add segment_sum serializes on duplicate targets. So each level
    # sorts WITH its payload, and every segment/cluster reduction is a range
    # difference of one running sum (tiny unique-index gathers at compact
    # slots), not a scatter.
    per_level = []
    n_seg_dropped = jnp.asarray(0, jnp.int32)
    for level in range(n_levels):
        size = cfg.voxel_size / (2.0**level)
        cell = jnp.floor(pts / size).astype(jnp.int32)
        hi, lo = voxel.split_keys(cell)
        big = jnp.int32(2**31 - 1)
        hi = jnp.where(valid, hi, big)
        lo = jnp.where(valid, lo, big)

        # Stable lexicographic sort by (hi, lo); stability preserves the input
        # time order inside each cell (insertion order in the reference
        # octree). Payload rides the sort operands — but only the
        # non-derivable ones: valid_s falls out of the key (valid keys are
        # < 2^30 by construction, invalid are pinned to 2^31-1) and cell_s is
        # recomputed elementwise from the sorted points, saving 4 of 11
        # operands of bitonic-sort traffic at 64k rows.
        (hi_s, lo_s, perm, px, py, pz, t_s) = jax.lax.sort(
            (hi, lo, arange_p, pts[:, 0], pts[:, 1], pts[:, 2], t),
            dimension=0, num_keys=2, is_stable=True)
        valid_s = hi_s != big
        pts_s = jnp.stack([px, py, pz], axis=1)
        cell_s = jnp.floor(pts_s / size).astype(jnp.int32)

        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])]
        )
        seg_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1

        # Anchor = cell center; second moments accumulated about it (see module
        # doc). One (P, 11) running sum serves both the node moments and the
        # cluster moments below.
        anchor = (cell_s.astype(dtype) + 0.5) * size
        q = jnp.where(valid_s[:, None], pts_s - anchor, 0.0)
        w = valid_s.astype(dtype)
        qq = jnp.stack([q[:, 0] * q[:, 0], q[:, 1] * q[:, 1], q[:, 2] * q[:, 2],
                        q[:, 0] * q[:, 1], q[:, 0] * q[:, 2], q[:, 1] * q[:, 2]], axis=1)
        tw = jnp.where(valid_s, t_s, 0.0).astype(dtype)
        chan = jnp.concatenate([w[:, None], q, qq, tw[:, None]], axis=1)
        # Blocked compensated prefix: a plain f32 cumsum stores each prefix
        # rounded to eps * |global total| (~1e-3 on the qq channels at 64k
        # points), which a small late segment inherits wholesale — right on top
        # of the smallest eigenvalue the plane gate reads. The blocked scheme
        # confines range-sum rounding to ~eps * |block total| at plain-cumsum
        # cost (see ops/dfsum.py).
        cumz = df_prefix(chan)

        # compact segment start positions: slot j in [0, v_cap); slot v_cap
        # doubles as the open-ended sentinel. Segments beyond v_cap are
        # dropped — and counted (capacity loss is never silent).
        start_arr = _compact_positions(is_start, seg_id, v_cap, p_cap)
        sums = df_range_sum(cumz, start_arr[:-1], start_arr[1:])  # (V, 11)
        n_seg = sums[:, 0]
        s1 = sums[:, 1:4]
        s2 = _unpack_sym(sums[:, 4:10])

        n_safe = jnp.maximum(n_seg, 1.0)
        mean_q = s1 / n_safe[:, None]
        cov = s2 / n_safe[:, None, None] - mean_q[:, :, None] * mean_q[:, None, :]
        vals, _vecs = eigh3(cov)
        node_plane = _plane_test(vals, cfg.planer_threshold, cfg.min_plane_likeness, strict=True)
        node_big = n_seg > min_pts  # strictly greater (surfel_extraction.cc:129,172)

        n_segs_valid = jnp.sum((is_start & valid_s).astype(jnp.int32))
        n_seg_dropped += jnp.maximum(0, n_segs_valid - v_cap)

        per_level.append(dict(
            perm=perm, is_start=is_start, seg_id=seg_id, start_arr=start_arr,
            t_s=t_s, valid_s=valid_s, cell_s=cell_s, cumz=cumz,
            n=n_seg, plane=node_plane, big=node_big, size=size,
        ))

    # --- hierarchy gating, evaluated per compact SLOT ---
    # A child segment's parent slot is found through the child's first point:
    # its input index, then the parent's seg_id at that input index. The
    # parent's seg_id in INPUT order is the sort (perm, seg_id) — undoing the
    # level sort with one cheap 2-operand sort instead of materializing the
    # inverse permutation by scatter (~0.30 ms/level of 64k index rows).
    seg_id_input = []
    for l in range(n_levels - 1):  # only parent levels are queried
        _, sid = jax.lax.sort((per_level[l]["perm"], per_level[l]["seg_id"]), num_keys=1)
        seg_id_input.append(sid)

    # level 0 fits when big; level 1 always follows a big root (forced split,
    # surfel_extraction.cc:131-137); deeper levels only under non-planar parents
    fitted = [per_level[0]["big"]]
    for l in range(1, n_levels):
        lv = per_level[l]
        parent_open = fitted[l - 1] if l == 1 else fitted[l - 1] & ~per_level[l - 1]["plane"]
        i0 = lv["perm"][jnp.clip(lv["start_arr"][:-1], 0, p_cap - 1)]
        pseg = seg_id_input[l - 1][i0]
        ok = parent_open[jnp.clip(pseg, 0, v_cap - 1)] & (pseg < v_cap)
        fitted.append(ok & lv["big"])
    cand = [fitted[l] & per_level[l]["plane"] for l in range(n_levels)]  # per slot

    # --- temporal clustering within candidate nodes, per level ---
    out_chunks = []
    n_cluster_dropped = n_seg_dropped
    for level in range(n_levels):
        lv = per_level[level]
        seg_ok = lv["seg_id"] < v_cap
        # expand per-slot candidacy to points: seg_id is non-decreasing, so a
        # delta scatter at the (unique, ascending) segment-start positions
        # plus one int32 running sum — both exact — replaces a (P,) random
        # gather of 1-wide rows (measured 0.53 ms/level at 64k points; TPU
        # gathers fetch whole tiled rows, so width-1 rows waste the lanes)
        ci = cand[level].astype(jnp.int32)
        dse = ci - jnp.concatenate([jnp.zeros((1,), jnp.int32), ci[:-1]])
        flag_pts = jnp.cumsum(
            jnp.zeros((p_cap,), jnp.int32).at[lv["start_arr"][:-1]].add(
                dse, mode="drop", unique_indices=True, indices_are_sorted=True))
        cand_s = (flag_pts > 0) & seg_ok & lv["valid_s"]

        gap = jnp.concatenate(
            [jnp.ones((1,), bool), (lv["t_s"][1:] - lv["t_s"][:-1]) > cfg.cluster_time_gap]
        )
        new_cluster = (lv["is_start"] | gap) & cand_s
        cl_id = jnp.cumsum(new_cluster.astype(jnp.int32)) - 1
        n_cluster_dropped += jnp.maximum(0, jnp.sum(new_cluster.astype(jnp.int32)) - nc)

        # Per-point channels the cluster slots will need, carried through the
        # compaction sort instead of gathered afterwards (each width-1 gather
        # at 16384 slots measured 0.116 ms — see _compact_positions):
        #  - the enclosing segment's END position = the next segment start
        #    strictly after this point (suffix-min over start positions);
        #    identical to the old start_arr[seg_of + 1] lookup in every
        #    consumed case, including the open-ended last segment (p_cap)
        #  - the cell-center anchor of this point (the cluster anchor is its
        #    first point's)
        idx_or_end = jnp.where(lv["is_start"], arange_p, jnp.int32(p_cap))
        nxt = jnp.concatenate([jax.lax.cummin(idx_or_end, reverse=True)[1:],
                               jnp.full((1,), p_cap, jnp.int32)])
        anchor_pts = (lv["cell_s"].astype(dtype) + 0.5) * lv["size"]

        # cluster start positions; slot nc is the next-of-last sentinel
        cl_start, (seg_end_h, ax, ay, az) = _compact_positions(
            new_cluster, cl_id, nc, p_cap,
            payload=(nxt, anchor_pts[:, 0], anchor_pts[:, 1], anchor_pts[:, 2]))
        # A cluster never crosses its segment, and every point of a candidate
        # segment is a candidate (candidacy is per segment; padding sorts to
        # the tail), so the range [start, min(next cluster start, segment
        # end)) contains exactly the cluster's points. Absent slots carry
        # garbage payload but cl_start = p_cap forces an empty range there.
        cl_end = jnp.maximum(jnp.minimum(cl_start[1:], seg_end_h[:nc]), cl_start[:nc])
        sums = df_range_sum(lv["cumz"], cl_start[:nc], cl_end)  # (NC, 11)
        n_cl = sums[:, 0]
        s1 = sums[:, 1:4]
        st = sums[:, 10]

        n_safe = jnp.maximum(n_cl, 1.0)
        mean_q = s1 / n_safe[:, None]
        # covariance kept in sym6 through the level merge: the (3*NC, 3, 3)
        # full form cost a 0.15 ms/sweep layout copy at the concat (trace
        # round 4, copy.7906); eigh3 reads scalar components so the full view
        # built for it fuses away, and the final unpack happens after the
        # capacity gather (cap rows, not 3*NC)
        mq = mean_q
        cov6 = sums[:, 4:10] / n_safe[:, None] - jnp.stack(
            [mq[:, 0] * mq[:, 0], mq[:, 1] * mq[:, 1], mq[:, 2] * mq[:, 2],
             mq[:, 0] * mq[:, 1], mq[:, 0] * mq[:, 2], mq[:, 1] * mq[:, 2]], axis=1)
        cov = _unpack_sym(cov6)
        tmean = st / n_safe
        # a cluster subdivides one cell in time: anchor = its first point's
        # cell center
        anchor = jnp.stack([ax[:nc], ay[:nc], az[:nc]], axis=1)
        center = anchor + mean_q

        vals, vecs = eigh3(cov)
        keep = (
            (n_cl >= min_pts)  # clusters keep >= 20 (surfel_extraction.cc:33)
            & _plane_test(vals, cfg.planer_threshold, cfg.min_plane_likeness, strict=False)
        )

        norm = vecs[:, :, 0]
        # sign toward view point (world origin, surfel_extraction.cc:58-61,327)
        flip = jnp.sum(norm * center, axis=1) < 0.0
        norm = jnp.where(flip[:, None], -norm, norm)

        out_chunks.append(dict(
            t=tmean, center=center, cov=cov6, norm=norm,
            resolution=jnp.full((nc,), lv["size"], dtype),
            std=jnp.sqrt(jnp.maximum(vals[:, 0], 0.0)),
            valid=keep,
        ))

    merged = {k: jnp.concatenate([c[k] for c in out_chunks], axis=0) for k in out_chunks[0]}

    # sort by (valid desc, time asc) and truncate to capacity (surfel cc:334 sorts
    # by time; overflow beyond capacity drops the latest surfels)
    bigt = jnp.asarray(jnp.finfo(dtype).max, dtype)
    cap = cfg.max_surfels_per_sweep
    # slice the permutation BEFORE gathering: v[order][:cap] materializes full
    # (3*NC,)-row gathers of every field (measured ~1.8 ms/sweep at 49152
    # candidates); v[order[:cap]] gathers only the kept rows
    order = jnp.argsort(jnp.where(merged["valid"], merged["t"], bigt), stable=True)[:cap]
    n_valid = jnp.sum(merged["valid"].astype(jnp.int32))
    out = {k: v[order] for k, v in merged.items()}
    out["cov"] = _unpack_sym(out["cov"])  # sym6 -> (cap, 3, 3), post-gather
    out["n_dropped"] = n_cluster_dropped + jnp.maximum(0, n_valid - cap)
    return out
