"""Tests for the Pallas TPU backend (run in interpret mode on CPU).

The pallas backend is the production TPU path: Morton-sorted clouds,
AABB-pruned VMEM kernels (ops/pallas_nn.py, ops/pallas_cov.py), and the
pipeline wiring that keeps every cloud Z-ordered. These tests pin its
exactness against the brute-force oracle and run the full odometry
pipeline with nn_backend="pallas" end to end.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from direct_lidar_odometry_tpu.config import DloConfig
from direct_lidar_odometry_tpu.io import evaluation, synthetic
from direct_lidar_odometry_tpu.odometry.runner import OdometryRunner
from direct_lidar_odometry_tpu.ops import bruteforce, morton, pallas_cov, pallas_nn


def _sorted_cloud(rng, n, valid_frac=0.9, extent=12.0):
    pts = np.column_stack([
        rng.uniform(-extent, extent, n),
        rng.uniform(-extent, extent, n),
        rng.uniform(0.0, 2.5, n),
    ]).astype(np.float32)
    mask = rng.random(n) < valid_frac
    pts[~mask] = 1e6
    p, m = jnp.asarray(pts), jnp.asarray(mask)
    order = morton.sort_order(p, m)
    return p[order], m[order]


def test_pruned_1nn_matches_bruteforce():
    rng = np.random.default_rng(0)
    tp, tm = _sorted_cloud(rng, 4096)
    qp, qm = _sorted_cloud(rng, 2048)
    radius = 0.8
    clo, chi = morton.chunk_aabbs(tp, tm, 512)
    i_p, d_p, f_p = pallas_nn.query_1nn_sorted(tp, tm, clo, chi, qp, qm, radius)
    i_b, d_b, f_b = bruteforce.query_1nn(tp, tm, qp, qm, radius, tile=2048)
    i_p, d_p, f_p = map(np.asarray, (i_p, d_p, f_p))
    i_b, d_b, f_b = map(np.asarray, (i_b, d_b, f_b))
    assert (f_p == f_b).all()
    assert f_p.sum() > 100  # the test world must actually produce matches
    assert (i_p[f_p] == i_b[f_p]).all()
    np.testing.assert_allclose(d_p[f_p], d_b[f_p], rtol=1e-5)


def test_pruned_1nn_mxu_variant_agrees_within_slack():
    """The MXU distance-expansion kernel (backend "pallas_mxu") may pick a
    different winner only among near-ties within the expansion's ~1e-3 m^2
    cancellation slack; each query's chosen neighbor must be within that
    slack of the true nearest, and the reported d2 stays exact."""
    rng = np.random.default_rng(3)
    tp, tm = _sorted_cloud(rng, 4096)
    qp, qm = _sorted_cloud(rng, 2048)
    radius = 0.8
    clo, chi = morton.chunk_aabbs(tp, tm, morton.TARGET_CHUNK)
    i_e, d_e, f_e = pallas_nn.query_1nn_sorted(tp, tm, clo, chi, qp, qm, radius)
    i_m, d_m, f_m = pallas_nn.query_1nn_sorted(
        tp, tm, clo, chi, qp, qm, radius, mxu=True
    )
    i_e, d_e, f_e = map(np.asarray, (i_e, d_e, f_e))
    i_m, d_m, f_m = map(np.asarray, (i_m, d_m, f_m))
    slack = 2e-3
    # found may differ only for borderline-radius queries
    border = np.abs(d_e - radius * radius) < slack
    assert (f_e == f_m)[~border].all()
    both = f_e & f_m
    assert both.sum() > 100
    # winner d2 within slack of the true nearest; d2 itself exact
    assert np.all(d_m[both] - d_e[both] < slack)
    tpn, qpn = np.asarray(tp), np.asarray(qp)
    d2_re = np.sum((qpn[both] - tpn[i_m[both]]) ** 2, axis=-1)
    np.testing.assert_allclose(d_m[both], d2_re, rtol=1e-5)


def test_pruned_1nn_never_returns_masked_targets():
    rng = np.random.default_rng(1)
    tp, tm = _sorted_cloud(rng, 2048, valid_frac=0.5)
    qp, qm = _sorted_cloud(rng, 512, valid_frac=1.0)
    clo, chi = morton.chunk_aabbs(tp, tm, 512)
    idx, _, found = pallas_nn.query_1nn_sorted(tp, tm, clo, chi, qp, qm, 5.0)
    idx, found = np.asarray(idx), np.asarray(found)
    tm_np = np.asarray(tm)
    assert tm_np[idx[found]].all()


def test_pruned_1nn_empty_target():
    rng = np.random.default_rng(2)
    qp, qm = _sorted_cloud(rng, 512)
    tp = jnp.full((1024, 3), 1e6, jnp.float32)
    tm = jnp.zeros(1024, bool)
    clo, chi = morton.chunk_aabbs(tp, tm, 512)
    idx, _, found = pallas_nn.query_1nn_sorted(tp, tm, clo, chi, qp, qm, 1.0)
    assert not np.asarray(found).any()
    assert (np.asarray(idx) == -1).all()


def test_pruned_moments_match_exhaustive():
    rng = np.random.default_rng(3)
    tp, tm = _sorted_cloud(rng, 2048, extent=6.0)
    radius = 0.9
    clo, chi = morton.chunk_aabbs(tp, tm, 512)
    m_ex = np.asarray(pallas_cov.radius_moments(tp, tm, tp, radius))
    m_pr = np.asarray(
        pallas_cov.radius_moments_sorted(tp, tm, clo, chi, tp, tm, radius)
    )
    v = np.asarray(tm)
    np.testing.assert_allclose(m_ex[v], m_pr[v], atol=1e-4)


def test_pruned_kernels_under_vmap():
    """parallel/batched.py vmaps the whole step; the custom_vmap rule must
    reproduce per-sequence results exactly."""
    rng = np.random.default_rng(4)
    parts = [
        (*_sorted_cloud(rng, 1024), *_sorted_cloud(rng, 512)) for _ in range(3)
    ]
    radius = 0.8
    stacked = [jnp.stack(x) for x in zip(*parts)]
    aabbs = [morton.chunk_aabbs(tp, tm, 512) for tp, tm, _, _ in parts]
    clo = jnp.stack([a[0] for a in aabbs])
    chi = jnp.stack([a[1] for a in aabbs])

    fn = jax.vmap(
        lambda tp, tm, lo, hi, qp, qm: pallas_nn.query_1nn_sorted(
            tp, tm, lo, hi, qp, qm, radius
        )
    )
    iv, dv, fv = fn(stacked[0], stacked[1], clo, chi, stacked[2], stacked[3])
    for b, (tp, tm, qp, qm) in enumerate(parts):
        lo, hi = aabbs[b]
        i1, d1, f1 = pallas_nn.query_1nn_sorted(tp, tm, lo, hi, qp, qm, radius)
        f1 = np.asarray(f1)
        assert (np.asarray(fv[b]) == f1).all()
        assert (np.asarray(iv[b])[f1] == np.asarray(i1)[f1]).all()


@pytest.fixture(scope="module")
def pallas_cfg():
    cfg = DloConfig()
    return cfg.replace(
        nn_backend="pallas",
        shapes=cfg.shapes.__class__(
            n_raw=8192,
            n_scan=8192,
            n_keyframe=8192,
            max_keyframes=64,
            max_submap_kf=8,
            imu_window=64,
            grid_table_size=2 ** 14,
            submap_table_size=2 ** 15,
            cell_cap_1nn=16,
            cell_cap_knn=48,
            knn_query_chunk=2048,
            hull_directions=32,
        ),
    )


def test_pipeline_pallas_backend(pallas_cfg):
    """Full odometry with the TPU production backend (interpret mode here):
    Morton-sorted scans, pruned NN + moment kernels, sorted submap."""
    from tests.test_pipeline import SCAN_RANGE, make_test_world

    world = make_test_world(11, n_frames=12)
    rng = np.random.default_rng(5)
    runner = OdometryRunner(pallas_cfg)
    for t in range(12):
        scan = synthetic.render_scan(
            world, t, rng, max_range=SCAN_RANGE, max_points=8192
        )
        runner.process_scan(scan, t * 0.1)
    est = runner.trajectory()
    res = evaluation.ate(est, world.poses[:12])
    assert res.rmse < 0.05, res
    assert runner.num_keyframes() >= 1
