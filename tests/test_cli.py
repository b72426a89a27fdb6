import json
import subprocess
import sys
import os

import numpy as np
import pytest


def run_cli(args, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = ""  # conftest's forcing doesn't reach subprocesses
    env["PYTHONPATH"] = "/root/repo"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_compilation_cache_dir','/root/.cache/jax_test_cache');"
        "jax.config.update('jax_persistent_cache_min_entry_size_bytes',-1);"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs',0.0);"
        "from direct_lidar_odometry_tpu.cli import main;"
        f"raise SystemExit(main({args!r}))"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, cwd="/root/repo", timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc


SMALL = [
    "--set", "shapes.n_raw=8192", "--set", "shapes.n_scan=8192",
    "--set", "shapes.n_keyframe=8192", "--set", "shapes.max_keyframes=32",
    "--set", "shapes.max_submap_kf=4", "--set", "shapes.n_submap_flat=16384",
    "--set", "shapes.imu_window=64", "--set", "shapes.grid_table_size=16384",
    "--set", "shapes.submap_table_size=16384", "--set", "shapes.knn_query_chunk=2048",
    "--set", "shapes.hull_directions=16",
]


@pytest.mark.slow
def test_cli_synthetic_end_to_end(tmp_path):
    proc = run_cli(
        ["--synthetic", "10", "--out-dir", str(tmp_path), "--quiet", "--eval",
         "--map-ply", "map.ply", "--checkpoint", "ckpt.npz"] + SMALL,
        tmp_path,
    )
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["frames"] == 10
    assert summary["ate_rmse_m"] < 0.5  # synthetic world sized for bench, CPU small shapes
    # artifacts exist and parse
    from direct_lidar_odometry_tpu.io import ply, trajectory

    est = trajectory.read_kitti(str(tmp_path / "trajectory_kitti.txt"))
    assert est.shape == (10, 4, 4)
    m = ply.read_ply(str(tmp_path / "map.ply"))
    assert len(m) > 100
    assert (tmp_path / "ckpt.npz").exists()


def test_checkpoint_roundtrip_api(tmp_path):
    import sys as _s
    _s.path.insert(0, "/root/repo/tests")
    from test_pipeline import tiny_cfg
    from direct_lidar_odometry_tpu.odometry import pipeline
    from direct_lidar_odometry_tpu.utils import checkpoint
    import jax

    cfg = tiny_cfg()
    state = pipeline.fresh_state(cfg)
    checkpoint.save_state(str(tmp_path / "s.npz"), state, extra={"prev_stamp": 1.5})
    restored, extra = checkpoint.load_state(str(tmp_path / "s.npz"), cfg)
    assert extra["prev_stamp"] == 1.5
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
