from direct_lidar_odometry_tpu.ops import (  # noqa: F401
    eigh3,
    hashgrid,
    preprocess,
    voxel,
)
