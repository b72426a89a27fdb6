from direct_lidar_odometry_tpu.cli import main

raise SystemExit(main())
