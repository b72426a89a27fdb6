from direct_lidar_odometry_tpu.io import evaluation, kitti, synthetic, trajectory  # noqa: F401
