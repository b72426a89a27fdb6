"""End-to-end pipeline run with backend="pallas" (interpret mode on CPU).

Round-2 gap (VERDICT): the full pallas pipeline was exercised ONLY by
bench.py on the real TPU; tests ran the hashgrid backend and tested pallas
kernels in isolation. A kernel<->pipeline integration bug (shape contract,
Morton-ordering assumption, AABB staleness) would surface only at the
once-per-round TPU run. These tests run the REAL pipeline composition —
preprocess -> normals -> S2S -> submap -> S2M -> keyframes — through the
pallas kernels in interpret mode at tiny shapes, both per-frame and
chunked (lax.scan) dispatch, with an ATE assertion.

Interpret mode executes the same kernel dataflow (grids, SMEM tables,
packed-index min-reduce) without the Mosaic compiler, so it catches
integration bugs, not codegen bugs.
"""

import numpy as np
import pytest

from direct_lidar_odometry_tpu.config import DloConfig, ShapeConfig
from direct_lidar_odometry_tpu.io import evaluation, synthetic
from direct_lidar_odometry_tpu.odometry.runner import OdometryRunner

SCAN_RANGE = 13.0


def pallas_cfg(**overrides) -> DloConfig:
    cfg = DloConfig().replace(
        nn_backend="pallas",
        shapes=ShapeConfig(
            n_raw=4096, n_scan=2048, n_keyframe=1024, max_keyframes=16,
            max_submap_kf=4, n_submap_flat=4096, imu_window=32,
            grid_table_size=2 ** 12, submap_table_size=2 ** 12,
            cell_cap_1nn=8, cell_cap_knn=32, knn_query_chunk=1024,
            hull_directions=16,
        ),
    )
    for key, value in overrides.items():
        cfg = cfg.replace(**{key: value})
    return cfg


@pytest.fixture(scope="module")
def sparse_world():
    # sparser than test_pipeline's world so scans fit the 2048-pt budget
    rng = np.random.default_rng(0)
    w = synthetic.make_world(
        rng, n_frames=10, extent=15.0, n_boxes=6, speed=0.4,
        ground_points=3000, density=3.0,
    )
    return w


def _scans(world, n):
    return [
        synthetic.render_scan(world, t, np.random.default_rng(50 + t),
                              max_range=SCAN_RANGE, max_points=4096)
        for t in range(n)
    ]


def _ate(runner, world):
    est = runner.trajectory()
    gt = np.linalg.inv(world.poses[0])[None] @ world.poses[: len(est)]
    return evaluation.ate(est, gt, align=False).rmse


def test_pallas_pipeline_per_frame(sparse_world):
    """odom_frame e2e through the pallas kernels, per-frame dispatch."""
    cfg = pallas_cfg()
    runner = OdometryRunner(cfg)
    for t, s in enumerate(_scans(sparse_world, 6)):
        runner.process_scan(s, float(sparse_world.stamps[t]), sync=True)
    rmse = _ate(runner, sparse_world)
    assert rmse < 0.05, f"pallas e2e ATE {rmse:.4f} m"
    # every frame must have converged with real correspondence counts
    for st in runner.stats[1:]:
        assert int(st.result.s2m_num_corr) > 100


def test_pallas_pipeline_chunked_matches_per_frame(sparse_world):
    """The chunked (lax.scan) pallas path — the exact program bench.py runs
    on TPU — must agree with per-frame stepping."""
    cfg = pallas_cfg()
    scans = _scans(sparse_world, 6)
    stamps = [float(s) for s in sparse_world.stamps[:6]]

    single = OdometryRunner(cfg)
    for s, st in zip(scans, stamps):
        single.process_scan(s, st)

    chunked = OdometryRunner(cfg)
    chunked.process_scan(scans[0], stamps[0])  # init frame
    chunked.process_scan(scans[1], stamps[1])
    chunked.process_chunk(scans[2:6], stamps[2:6])

    est_a = single.trajectory()
    est_b = chunked.trajectory()
    assert est_a.shape == est_b.shape == (6, 4, 4)
    np.testing.assert_allclose(est_a, est_b, atol=5e-3)
    assert _ate(chunked, sparse_world) < 0.05
