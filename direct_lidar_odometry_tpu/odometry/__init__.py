from direct_lidar_odometry_tpu.odometry import (  # noqa: F401
    adaptive,
    hulls,
    imu,
    keyframes,
    mapper,
    pipeline,
    runner,
    state,
    submap,
)
