"""Voxel key packing and masked segment utilities.

TPU-native replacement for the reference's ``absl::flat_hash_map<VoxelLoc, OctoTree*>``
(surfel_extraction.h:55-81,125-134): instead of pointer-chasing hash maps, points are
given packed integer cell keys, stably sorted, and reduced with segment sums. Stable
sort preserves the input time order inside each cell, which is what the reference's
insertion order gives its octree nodes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 20 bits per axis, biased: supports cell coords in [-2^19, 2^19). At the finest
# 0.2 m cells that is a +-104 km world span — far beyond lidar range.
_BITS = 20
_BIAS = 1 << (_BITS - 1)


def split_keys(cell_xyz: jnp.ndarray):
    """Pack integer cell coords (N, 3) int32 into two int32 sort keys (30 bits
    each) — collision-free, unlike the reference's modular hash
    (surfel_extraction.h:72-81), and int32-native for the TPU (no int64)."""
    c = cell_xyz + _BIAS
    hi = (c[..., 0] << 10) | (c[..., 1] >> 10)
    lo = ((c[..., 1] & 1023) << 20) | c[..., 2]
    return hi, lo


def segment_ids_from_sorted_keys(sorted_keys: jnp.ndarray):
    """Given sorted keys (N,), return (segment_id (N,), is_start (N,)).
    Segment ids are 0-based and increase with key order."""
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]]
    )
    seg_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    return seg_id, is_start


def segment_start_positions(seg_id: jnp.ndarray, is_start: jnp.ndarray, num_segments: int):
    """Index of each segment's first element, for *sorted* contiguous segments.
    Uses a unique+sorted scatter (XLA's vectorizable fast path — a scatter with
    possibly-duplicate indices is serialized on TPU). Padding segments report N."""
    n = seg_id.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    out = jnp.full((num_segments,), n, jnp.int32)
    idx = jnp.where(is_start, jnp.clip(seg_id, 0, num_segments - 1), num_segments)
    return out.at[idx].set(pos, mode="drop", unique_indices=True, indices_are_sorted=True)
