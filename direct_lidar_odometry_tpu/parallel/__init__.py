from direct_lidar_odometry_tpu.parallel import batched, posegraph, sharded  # noqa: F401
