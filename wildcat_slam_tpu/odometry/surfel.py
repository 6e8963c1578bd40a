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
from wildcat_slam_tpu.ops.eigh3 import eigh3

def _unpack_sym(m6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) [xx yy zz xy xz yz] -> full symmetric (..., 3, 3)."""
    xx, yy, zz, xy, xz, yz = (m6[..., i] for i in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([xy, yy, yz], axis=-1),
        jnp.stack([xz, yz, zz], axis=-1),
    ], axis=-2)


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

    per_level = []
    for level in range(n_levels):
        size = cfg.voxel_size / (2.0**level)
        cell = jnp.floor(pts / size).astype(jnp.int32)
        hi, lo = voxel.split_keys(cell)
        big = jnp.int32(2**31 - 1)
        hi = jnp.where(valid, hi, big)
        lo = jnp.where(valid, lo, big)

        # Stable lexicographic sort by (hi, lo); stability preserves the input
        # time order inside each cell (insertion order in the reference octree).
        perm0 = jnp.arange(p_cap, dtype=jnp.int32)
        hi_s, lo_s, perm = jax.lax.sort((hi, lo, perm0), dimension=0, num_keys=2, is_stable=True)

        pts_s = pts[perm]
        t_s = t[perm]
        valid_s = valid[perm]
        cell_s = cell[perm]

        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])]
        )
        seg_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1

        # Anchor = cell center; second moments accumulated about it (see module doc).
        anchor = (cell_s.astype(dtype) + 0.5) * size
        q = jnp.where(valid_s[:, None], pts_s - anchor, 0.0)
        w = valid_s.astype(dtype)

        n_seg = jax.ops.segment_sum(w, seg_id, num_segments=p_cap, indices_are_sorted=True)
        # pack (1 | q | unique second-moment entries) into one (P, 10) segment
        # sum: one reduction pass, and the symmetric moment carries 6 entries
        qq = jnp.stack([q[:, 0] * q[:, 0], q[:, 1] * q[:, 1], q[:, 2] * q[:, 2],
                        q[:, 0] * q[:, 1], q[:, 0] * q[:, 2], q[:, 1] * q[:, 2]], axis=1)
        moments = jax.ops.segment_sum(
            jnp.concatenate([q, qq], axis=1), seg_id, num_segments=p_cap,
            indices_are_sorted=True)
        s1 = moments[:, 0:3]
        s2 = _unpack_sym(moments[:, 3:9])
        # exact anchor per segment: the cell coords of its first point (all
        # points in a segment share the cell; gather beats a segment_min)
        start_pos = voxel.segment_start_positions(seg_id, is_start, p_cap)
        cmin = cell_s[jnp.clip(start_pos, 0, p_cap - 1)]

        n_safe = jnp.maximum(n_seg, 1.0)
        mean_q = s1 / n_safe[:, None]
        cov = s2 / n_safe[:, None, None] - mean_q[:, :, None] * mean_q[:, None, :]
        vals, _vecs = eigh3(cov)
        node_plane = _plane_test(vals, cfg.planer_threshold, cfg.min_plane_likeness, strict=True)
        node_big = n_seg > min_pts  # strictly greater (surfel_extraction.cc:129,172)

        per_level.append(
            dict(
                perm=perm, seg_id=seg_id, is_start=is_start, t_s=t_s, valid_s=valid_s,
                anchor=anchor, q=q, w=w, n=n_seg, plane=node_plane, big=node_big,
                cmin=cmin, size=size, start_pos=start_pos,
            )
        )

    # --- hierarchy gating, evaluated per SEGMENT (not per point) ---
    # Each child segment's parent cell is found through the child's first point:
    # input index perm_l[start], position in the parent's sort order via the
    # parent's inverse permutation, then the parent's seg_id there. One int32
    # inverse-permutation scatter per parent level replaces six per-point flag
    # scatters + per-point flag combination (~2.8 ms/sweep at 32k points).
    arange_p = jnp.arange(p_cap, dtype=jnp.int32)
    inv_perm = []
    for l in range(n_levels - 1):  # only parent levels need an inverse
        ip = jnp.zeros((p_cap,), jnp.int32).at[per_level[l]["perm"]].set(
            arange_p, unique_indices=True)
        inv_perm.append(ip)

    def parent_seg(level):
        """Parent-level segment id for every level segment slot."""
        lv = per_level[level]
        i0 = lv["perm"][jnp.clip(lv["start_pos"], 0, p_cap - 1)]
        return per_level[level - 1]["seg_id"][inv_perm[level - 1][i0]]

    # level 0 fits when big; level 1 always follows a big root (forced split,
    # surfel_extraction.cc:131-137); deeper levels only under non-planar parents
    fitted = [per_level[0]["big"]]
    for l in range(1, n_levels):
        prev = per_level[l - 1]
        parent_open = fitted[l - 1] if l == 1 else fitted[l - 1] & ~prev["plane"]
        fitted.append(parent_open[parent_seg(l)] & per_level[l]["big"])
    cand = [fitted[l] & per_level[l]["plane"] for l in range(n_levels)]  # per segment

    # --- temporal clustering within candidate nodes, per level ---
    out_chunks = []
    n_cluster_dropped = jnp.asarray(0, jnp.int32)
    nc = cfg.max_leaves_per_sweep
    for level in range(n_levels):
        lv = per_level[level]
        cand_s = cand[level][lv["seg_id"]] & lv["valid_s"]

        gap = jnp.concatenate(
            [jnp.ones((1,), bool), (lv["t_s"][1:] - lv["t_s"][:-1]) > cfg.cluster_time_gap]
        )
        new_cluster = (lv["is_start"] | gap) & cand_s
        # points outside candidate nodes get an out-of-range id -> dropped by segment_sum
        cl_id = jnp.where(cand_s, jnp.cumsum(new_cluster.astype(jnp.int32)) - 1, nc)
        n_cluster_dropped += jnp.maximum(0, jnp.sum(new_cluster.astype(jnp.int32)) - nc)

        w = cand_s.astype(dtype)
        q = lv["q"] * w[:, None]
        qq = jnp.stack([q[:, 0] * lv["q"][:, 0], q[:, 1] * lv["q"][:, 1], q[:, 2] * lv["q"][:, 2],
                        q[:, 0] * lv["q"][:, 1], q[:, 0] * lv["q"][:, 2], q[:, 1] * lv["q"][:, 2]], axis=1)
        tw = jnp.where(cand_s, lv["t_s"], 0.0).astype(dtype)
        moments = jax.ops.segment_sum(
            jnp.concatenate([w[:, None], q, qq, tw[:, None]], axis=1), cl_id, num_segments=nc)
        n_cl = moments[:, 0]
        s1 = moments[:, 1:4]
        s2 = _unpack_sym(moments[:, 4:10])
        st = moments[:, 10]
        # a cluster subdivides one cell in time, so its cell coords are those of
        # its first point: one unique-index scatter + gather instead of three
        # segment_mins (which cost ~4.8 ms/sweep across the levels)
        sp = voxel.segment_start_positions(cl_id, new_cluster, nc)
        sp = jnp.clip(sp, 0, p_cap - 1)
        cmin = lv["cmin"][lv["seg_id"][sp]]

        n_safe = jnp.maximum(n_cl, 1.0)
        mean_q = s1 / n_safe[:, None]
        cov = s2 / n_safe[:, None, None] - mean_q[:, :, None] * mean_q[:, None, :]
        tmean = st / n_safe
        anchor = (cmin.astype(dtype) + 0.5) * lv["size"]
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

        out_chunks.append(
            dict(
                t=tmean, center=center, cov=cov, norm=norm,
                resolution=jnp.full((nc,), lv["size"], dtype),
                std=jnp.sqrt(jnp.maximum(vals[:, 0], 0.0)),
                valid=keep,
            )
        )

    merged = {k: jnp.concatenate([c[k] for c in out_chunks], axis=0) for k in out_chunks[0]}

    # sort by (valid desc, time asc) and truncate to capacity (surfel cc:334 sorts
    # by time; overflow beyond capacity drops the latest surfels)
    bigt = jnp.asarray(jnp.finfo(dtype).max, dtype)
    order = jnp.argsort(jnp.where(merged["valid"], merged["t"], bigt), stable=True)
    cap = cfg.max_surfels_per_sweep
    n_valid = jnp.sum(merged["valid"].astype(jnp.int32))
    out = {k: v[order][:cap] for k, v in merged.items()}
    out["n_dropped"] = n_cluster_dropped + jnp.maximum(0, n_valid - cap)
    return out
