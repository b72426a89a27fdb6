"""Voxel-grid centroid downsampling as a sort/segment-mean kernel.

Replaces ``pcl::VoxelGrid`` (reference ``odom.cc:126-127, 459-463``;
``map.cc:100-105``) with a TPU-friendly pipeline:

1. quantize points to integer voxel coords relative to the cloud min corner;
2. linearize to a collision-free int32 id (grid extents clamped to 1024^3
   cells, i.e. 256 m at 0.25 m resolution — beyond-extent points are capped
   into edge cells, matching PCL's bounded-bbox behavior closely enough);
3. sort by scrambled (bijectively hashed) id — ONE radix sort groups
   equal ids and randomizes group order for uniform overflow;
4. mark segment starts, compact segment slots by prefix-sum, and
   scatter-add points into per-voxel accumulators;
5. centroid = sum / count, emitted compacted-to-front.

Output order is voxel-id order (ascending), which also matches PCL's
leaf-iteration order, so oracle comparisons can sort both sides identically.
"""

from __future__ import annotations

import jax.numpy as jnp

from direct_lidar_odometry_tpu.core.cloud import PAD_VALUE, PointCloud

_GRID_DIM = 1024  # cells per axis; 1024^3 < 2^31 keeps linear ids in int32


def voxel_ids(points: jnp.ndarray, mask: jnp.ndarray, res: float) -> jnp.ndarray:
    """Collision-free linear voxel id per point; invalid points get INT32_MAX."""
    # min corner over valid points only
    big = jnp.asarray(PAD_VALUE, points.dtype)
    masked = jnp.where(mask[..., None], points, big)
    origin = jnp.min(masked, axis=-2, keepdims=True)
    coords = jnp.floor((points - origin) / res).astype(jnp.int32)
    coords = jnp.clip(coords, 0, _GRID_DIM - 1)
    ids = coords[..., 0] + _GRID_DIM * (coords[..., 1] + _GRID_DIM * coords[..., 2])
    return jnp.where(mask, ids, jnp.iinfo(jnp.int32).max)


def _scramble(ids: jnp.ndarray) -> jnp.ndarray:
    """Murmur-style bijective mix of voxel ids (uint32 order)."""
    h = ids.astype(jnp.uint32)
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h


def voxel_downsample(
    cloud: PointCloud, res: float, out_capacity: int | None = None
) -> PointCloud:
    """Centroid voxel filter. Output is compacted to the front.

    ``out_capacity`` defaults to the input capacity. If more voxels are
    occupied than ``out_capacity``, a *spatially uniform* subset of voxels
    survives: segments are ordered by a scrambled (hashed) voxel id, so
    overflow degrades into uniform random downsampling. (Ordering by raw
    id instead would keep one bounding-box corner of the scene and drop
    the rest — observed to bias registration by meters.) Output order is
    scrambled-id order.
    """
    import jax

    n = cloud.capacity
    cap = out_capacity or n
    ids = voxel_ids(cloud.points, cloud.mask, res)
    # ONE sort suffices: _scramble is bijective, so equal ids share a key
    # (stay adjacent) and distinct ids get distinct keys — sorting by the
    # scrambled key alone both groups voxels and randomizes group order.
    # Invalid points all carry the INT32_MAX sentinel id, i.e. one shared
    # key; they land somewhere in the middle as a single block and are
    # dropped by the svalid gating below without consuming a segment slot.
    # Coordinates ride along as sort payloads — a multi-operand sort beats
    # argsort + three 131k gathers ~1.6x on v5e.
    skey = _scramble(ids)
    _, sids, sx, sy, sz, sv = jax.lax.sort(
        (skey, ids, cloud.points[:, 0], cloud.points[:, 1], cloud.points[:, 2],
         cloud.mask.astype(jnp.float32)),
        num_keys=1,
    )
    spts = jnp.stack([sx, sy, sz], axis=-1)
    svalid = sv > 0.5

    first = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sids[1:] != sids[:-1]], axis=0
    ) & svalid
    slot = jnp.cumsum(first.astype(jnp.int32)) - 1  # segment index per point
    slot = jnp.where(svalid, slot, cap)  # out-of-range -> dropped by scatter

    sums = jnp.zeros((cap, 3), dtype=jnp.float32).at[slot].add(
        spts, mode="drop"
    )
    counts = jnp.zeros((cap,), dtype=jnp.float32).at[slot].add(
        jnp.ones((n,), jnp.float32), mode="drop"
    )
    out_mask = counts > 0
    centroids = sums / jnp.maximum(counts, 1.0)[..., None]
    centroids = jnp.where(out_mask[..., None], centroids, PAD_VALUE)
    return PointCloud(points=centroids, mask=out_mask)
