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
import numpy as np

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


from direct_lidar_odometry_tpu.utils.precision import f32_matmuls as _f32

build_map_jit = jax.jit(_f32(build_map), static_argnums=(1, 2))


def _quat_to_rotmat_np(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float64)


def build_map_xyzi(
    kf_scans: dict[int, "np.ndarray"],
    positions: "np.ndarray",
    quats: "np.ndarray",
    leaf_size: float,
) -> "np.ndarray":
    """Intensity-carrying map export (host side, offline).

    ``kf_scans``: ring slot -> sensor-frame [M, 4] xyzi keyframe scan (the
    runner's intensity sidecar, hostprep.reduce_keyframe_scan_xyzi);
    ``positions``/``quats``: the CURRENT keyframe poses from the device
    state (so loop-closure re-anchoring is reflected). Transforms each
    retained scan to world, concatenates, and voxel-averages xyz AND
    intensity at ``leaf_size`` — the PointXYZI-parity twin of
    :func:`build_map` (reference map.cc:100-131 with pcl::PointXYZI).
    """
    from direct_lidar_odometry_tpu.io.hostprep import voxel_mean_xyzi

    parts = []
    for slot, scan in sorted(kf_scans.items()):
        if len(scan) == 0:
            continue
        r = _quat_to_rotmat_np(np.asarray(quats[slot], np.float64))
        t = np.asarray(positions[slot], np.float64)
        world = scan[:, :3].astype(np.float64) @ r.T + t
        parts.append(
            np.concatenate(
                [world.astype(np.float32), scan[:, 3:4]], axis=1
            )
        )
    if not parts:
        return np.zeros((0, 4), np.float32)
    return voxel_mean_xyzi(np.concatenate(parts, axis=0), leaf_size)
