import yaml

from direct_lidar_odometry_tpu.config import DloConfig, load_config


def test_defaults_match_reference():
    """Defaults must mirror reference cfg/params.yaml + cfg/dlo.yaml."""
    cfg = DloConfig()
    assert cfg.preprocessing.crop.size == 1.0
    assert cfg.preprocessing.voxel_scan.res == 0.25
    assert cfg.preprocessing.voxel_submap.res == 0.5
    assert cfg.keyframe.thresh_dist == 5.0
    assert cfg.keyframe.thresh_rot == 45.0
    assert cfg.submap.knn == cfg.submap.kcv == cfg.submap.kcc == 10
    assert cfg.gicp.min_num_points == 10
    assert cfg.gicp.s2s.k_correspondences == 10
    assert cfg.gicp.s2s.max_correspondence_distance == 1.0
    assert cfg.gicp.s2m.k_correspondences == 20
    assert cfg.gicp.s2m.max_correspondence_distance == 0.5
    assert cfg.gicp.s2s.max_iterations == 32
    assert cfg.gicp.s2s.optimizer == "lm"
    assert cfg.imu.calib_time == 3.0
    assert cfg.map.leaf_size == 0.25


def test_yaml_roundtrip(tmp_path):
    data = {
        "keyframe": {"thresh_dist": 2.5},
        "gicp": {"s2m": {"max_iterations": 16}},
        "shapes": {"n_scan": 1024},
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(data))
    cfg = load_config(str(p))
    assert cfg.keyframe.thresh_dist == 2.5
    assert cfg.gicp.s2m.max_iterations == 16
    assert cfg.gicp.s2s.max_iterations == 32  # untouched default
    assert cfg.shapes.n_scan == 1024


def test_overrides():
    cfg = load_config(None, overrides={"gicp.s2s.optimizer": "gn", "imu.use": True})
    assert cfg.gicp.s2s.optimizer == "gn"
    assert cfg.imu.use is True


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump({"no_such_key": 1}))
    try:
        load_config(str(p))
        assert False, "expected KeyError"
    except KeyError:
        pass
