"""Scan preprocessing: NaN masking + inverse crop box.

Functional equivalent of reference ``odom.cc:443-465``:
``removeNaNFromPointCloud`` -> ``pcl::CropBox`` with ``setNegative(true)``
and box ``[-size, +size]^3`` (``odom.cc:122-124``) -> voxel grid (see
:mod:`direct_lidar_odometry_tpu.ops.voxel`). Here the first two collapse
into one masked elementwise pass that XLA fuses.
"""

from __future__ import annotations

import jax.numpy as jnp

from direct_lidar_odometry_tpu.core.cloud import PAD_VALUE, PointCloud


def nan_crop_mask(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    crop_size: float | None,
) -> jnp.ndarray:
    """Mask off NaN/Inf points and points inside the sensor-centered crop box.

    points: [..., N, 3]; mask: [..., N]; returns refined mask [..., N].
    ``crop_size=None`` disables the crop (reference ``crop_use_`` toggle).
    """
    finite = jnp.all(jnp.isfinite(points), axis=-1)
    out = mask & finite
    if crop_size is not None:
        inside = jnp.all(jnp.abs(points) <= crop_size, axis=-1)
        out = out & ~inside
    return out


def preprocess(
    cloud: PointCloud,
    crop_size: float | None,
) -> PointCloud:
    """NaN + crop-box masking, padding invalidated slots.

    Compaction is deferred to the voxel filter (whose sort compacts for
    free); when voxelization is disabled callers should
    :func:`~direct_lidar_odometry_tpu.core.cloud.compact` explicitly.
    """
    mask = nan_crop_mask(cloud.points, cloud.mask, crop_size)
    pts = jnp.where(mask[..., None], cloud.points, PAD_VALUE)
    pts = jnp.where(jnp.isfinite(pts), pts, PAD_VALUE)
    return PointCloud(points=pts, mask=mask)


def ranges(points: jnp.ndarray) -> jnp.ndarray:
    """Euclidean range of each point from the sensor origin. [..., N, 3] -> [..., N]."""
    return jnp.linalg.norm(points, axis=-1)


def masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median over valid entries (used by the spaciousness metric,
    reference ``odom.cc:990-1010`` which takes ``nth_element`` at n/2).

    Implemented by sorting with invalid entries pushed to +inf and indexing
    the (count // 2)-th order statistic, matching the reference's
    upper-median choice.
    """
    big = jnp.asarray(jnp.inf, dtype=values.dtype)
    vals = jnp.where(mask, values, big)
    svals = jnp.sort(vals, axis=-1)
    n = jnp.sum(mask.astype(jnp.int32), axis=-1)
    idx = jnp.clip(n // 2, 0, values.shape[-1] - 1)
    med = jnp.take_along_axis(svals, idx[..., None], axis=-1)[..., 0]
    return jnp.where(n > 0, med, 0.0)
