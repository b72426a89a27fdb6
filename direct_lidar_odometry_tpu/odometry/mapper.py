"""Map aggregation — the reference MapNode, in-process.

Reference ``dlo::MapNode`` (``src/dlo/map.cc:19-131``) accumulates
published keyframe clouds into one map and periodically voxel-downsamples
and publishes it. Here the keyframe ring already holds every keyframe
cloud, so the "map" is a pure function of the odometry state — no second
process, no pub/sub, same result.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from direct_lidar_odometry_tpu.core.cloud import PointCloud
from direct_lidar_odometry_tpu.ops import voxel
from direct_lidar_odometry_tpu.odometry.state import KeyframeStore


def build_map(
    kf: KeyframeStore, leaf_size: float, out_capacity: int | None = None
) -> PointCloud:
    """Concatenate all keyframe clouds and voxel-downsample.

    Equivalent to the accumulate (``map.cc:121-131``) + timer downsample
    (``map.cc:100-114``) pair with leaf ``cfg.map.leaf_size``.
    """
    k, nk, _ = kf.points.shape
    kmask = (jnp.arange(k) < kf.count)[:, None]
    flat = PointCloud(
        points=kf.points.reshape(k * nk, 3),
        mask=(kf.masks & kmask).reshape(k * nk),
    )
    cap = out_capacity or k * nk
    return voxel.voxel_downsample(flat, leaf_size, out_capacity=cap)


build_map_jit = jax.jit(build_map, static_argnums=(1, 2))
