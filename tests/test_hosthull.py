"""Exact host hull path (odometry/hosthull.py + runner plumbing).

The VERDICT-identified fidelity gap: the device direction-sampled hull
surrogate has convex recall < 0.4 vs QHull at K=512 on trajectory-shaped
point sets. The host path must be EXACT (recall 1.0 for convex vertices)
at production K, and the runner must feed it into submap selection.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import ConvexHull

from direct_lidar_odometry_tpu.odometry import hosthull, submap
from direct_lidar_odometry_tpu.odometry.runner import OdometryRunner


def trajectory_positions(k, seed, elev=0.3):
    """Wandering ground-robot trajectory with gentle elevation."""
    rng = np.random.default_rng(seed)
    yaw, pos, yv = 0.0, np.zeros(3), 0.0
    pts = []
    for t in range(k):
        yv = 0.8 * yv + rng.normal(scale=0.04)
        yaw += np.clip(yv, -0.09, 0.09)
        pos = pos + np.array([np.cos(yaw), np.sin(yaw), 0]) * rng.uniform(1, 8)
        pos[2] = elev * np.sin(t * 0.05) * 10
        pts.append(pos.copy())
    return np.asarray(pts, np.float32)


@pytest.mark.parametrize("k", [32, 128, 512])
def test_convex_membership_exact_at_production_k(k):
    """Recall AND precision 1.0 vs scipy.ConvexHull — the host path IS
    QHull, this guards the plumbing (padding, gating, dtype)."""
    for seed in range(3):
        p = trajectory_positions(k, seed)
        got = hosthull.convex_membership_host(p.astype(np.float64))
        want = np.zeros(k, bool)
        want[ConvexHull(p.astype(np.float64), qhull_options="QJ").vertices] = True
        assert (got == want).all()


def test_convex_gating_small_sets():
    assert not hosthull.convex_membership_host(np.zeros((3, 3))).any()
    # collinear: falls back without crashing
    p = np.stack([np.arange(8.0), np.zeros(8), np.zeros(8)], axis=1)
    m = hosthull.convex_membership_host(p)
    assert m.dtype == bool and len(m) == 8


def test_concave_membership_boundary_of_grid():
    """Alpha shape of a dense planar grid: boundary ring in, interior out
    (with alpha ~ grid pitch the interior is fully covered by kept
    simplices)."""
    n = 9
    gx, gy = np.meshgrid(np.arange(n, dtype=np.float64), np.arange(n, dtype=np.float64))
    p = np.stack([gx.ravel(), gy.ravel(), 0.02 * np.sin(gx.ravel() + gy.ravel())], axis=1)
    mem = hosthull.concave_membership_host(p, alpha=2.0)
    idx = np.arange(n * n).reshape(n, n)
    boundary = np.zeros((n, n), bool)
    boundary[0, :] = boundary[-1, :] = boundary[:, 0] = boundary[:, -1] = True
    # every true boundary point is found
    assert mem[idx[boundary]].all()
    # the deep interior is not boundary
    assert not mem[idx[3:-3, 3:-3]].any()


def test_concave_alpha_too_small_is_empty():
    p = trajectory_positions(64, 0)
    assert not hosthull.concave_membership_host(p, alpha=1e-3).any()


def test_selection_uses_host_masks():
    """select_submap_keyframes must prefer fresh host masks over the
    surrogate, and ignore them when stale."""
    from direct_lidar_odometry_tpu.odometry.state import KeyframeStore
    from direct_lidar_odometry_tpu.odometry import hulls
    from tests.test_pipeline import tiny_cfg

    cfg = tiny_cfg()
    k = cfg.shapes.max_keyframes
    p = trajectory_positions(k, 1)
    store = KeyframeStore(
        positions=jnp.asarray(p),
        quats=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (k, 1)),
        points=jnp.zeros((k, 4, 3), jnp.float32),
        masks=jnp.zeros((k, 4), bool),
        normals=jnp.zeros((k, 4, 3), jnp.float32),
        normals_valid=jnp.zeros((k, 4), bool),
        count=jnp.int32(k),
        seq=jnp.arange(k, dtype=jnp.int32),
        health=jnp.zeros((k,), jnp.float32),
    )
    dirs = jnp.asarray(hulls.fibonacci_directions(cfg.shapes.hull_directions))
    q = jnp.asarray(p[k // 2])
    prev = jnp.zeros((k,), bool)
    alpha = jnp.float32(5.0)
    cvx, ccv = hosthull.host_hull_masks(p, k, 5.0, k)

    sel_host = submap.select_submap_keyframes(
        store, prev, q, alpha, cfg, dirs,
        (jnp.asarray(cvx), jnp.asarray(ccv), jnp.asarray(True)),
    )
    sel_stale = submap.select_submap_keyframes(
        store, prev, q, alpha, cfg, dirs,
        (jnp.asarray(cvx), jnp.asarray(ccv), jnp.asarray(False)),
    )
    sel_none = submap.select_submap_keyframes(store, prev, q, alpha, cfg, dirs)
    # stale masks == no masks (surrogate)
    np.testing.assert_array_equal(
        np.asarray(sel_stale.members), np.asarray(sel_none.members)
    )
    # fresh masks produce a selection consistent with an exact-hull oracle
    d2 = np.sum((p - np.asarray(q)) ** 2, axis=1)

    def k_smallest(mask, kk):
        if mask.sum() == 0:
            return mask
        vals = np.where(mask, d2, np.inf)
        kth = np.sort(vals)[kk - 1] if mask.sum() >= kk else np.max(vals[mask])
        return mask & (vals <= kth)

    want = (
        k_smallest(np.ones(k, bool), cfg.submap.knn)
        | k_smallest(cvx, cfg.submap.kcv)
        | k_smallest(ccv, cfg.submap.kcc)
    )
    got = np.asarray(sel_host.members)
    if want.sum() > cfg.shapes.max_submap_kf:
        assert got.sum() == cfg.shapes.max_submap_kf
        assert (got & ~want).sum() == 0
    else:
        np.testing.assert_array_equal(got, want)


def test_runner_refreshes_host_hulls():
    """End-to-end: after enough frames the runner has computed fresh host
    masks and keeps tracking."""
    from direct_lidar_odometry_tpu.io import synthetic
    from direct_lidar_odometry_tpu.io import evaluation
    from tests.test_pipeline import SCAN_RANGE, make_test_world, tiny_cfg, gt_relative

    world = make_test_world(7)
    cfg = tiny_cfg()
    rng = np.random.default_rng(3)
    runner = OdometryRunner(cfg)
    for t in range(25):
        scan = synthetic.render_scan(world, t, rng, max_range=SCAN_RANGE,
                                     max_points=8192)
        runner.process_scan(scan, world.stamps[t])
    assert runner._hull_fresh, "host hull masks never refreshed"
    est = runner.trajectory()
    res = evaluation.ate(est, gt_relative(world, len(est)), align=False)
    assert res.rmse < 0.10, res.rmse
