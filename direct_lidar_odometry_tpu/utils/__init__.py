from direct_lidar_odometry_tpu.utils import precision, profiling  # noqa: F401
