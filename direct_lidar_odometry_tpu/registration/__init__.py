from direct_lidar_odometry_tpu.registration import covariance, gicp  # noqa: F401
