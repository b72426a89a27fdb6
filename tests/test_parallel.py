import numpy as np
import jax
import jax.numpy as jnp
import pytest

from direct_lidar_odometry_tpu.core import se3
from direct_lidar_odometry_tpu.io import synthetic
from direct_lidar_odometry_tpu.parallel import batched, posegraph, sharded

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_pipeline import SCAN_RANGE, make_test_world, tiny_cfg  # noqa: E402


@pytest.fixture(scope="module")
def worlds():
    return [make_test_world(seed, n_frames=6) for seed in (7, 13)]


def _stack_scans(worlds, t, cfg, rngs):
    pts = np.full((len(worlds), cfg.shapes.n_raw, 3), 1e6, np.float32)
    mask = np.zeros((len(worlds), cfg.shapes.n_raw), bool)
    for b, (w, rng) in enumerate(zip(worlds, rngs)):
        s = synthetic.render_scan(w, t, rng, max_range=SCAN_RANGE, max_points=cfg.shapes.n_raw)
        pts[b, : len(s)] = s
        mask[b, : len(s)] = True
    return jnp.asarray(pts), jnp.asarray(mask)


def test_batched_odometry_matches_single(worlds):
    """vmapped 2-sequence odometry must track both worlds."""
    cfg = tiny_cfg()
    init_fn, step_fn = batched.make_batched_fns(cfg)
    states = batched.batched_state(cfg, 2)
    rngs = [np.random.default_rng(3), np.random.default_rng(4)]
    eye = jnp.tile(jnp.eye(4, dtype=jnp.float32), (2, 1, 1))

    pts, mask = _stack_scans(worlds, 0, cfg, rngs)
    states = init_fn(states, pts, mask)
    errs = []
    for t in range(1, 6):
        pts, mask = _stack_scans(worlds, t, cfg, rngs)
        states, res = step_fn(states, pts, mask, eye)
        for b, w in enumerate(worlds):
            gt = np.linalg.inv(w.poses[0]) @ w.poses[t]
            errs.append(np.linalg.norm(np.asarray(res.position)[b] - gt[:3, 3]))
    assert max(errs) < 0.05, errs


def test_sharded_step_runs_on_mesh(worlds):
    """shard_map over 8 CPU devices: 8 sequences, psum fleet health."""
    cfg = tiny_cfg()
    assert jax.device_count() >= 8
    mesh = sharded.make_mesh(8)
    step = sharded.make_sharded_step(cfg, mesh)
    states = batched.batched_state(cfg, 8)
    states = sharded.shard_states(states, mesh)
    init_fn, _ = batched.make_batched_fns(cfg)

    rngs = [np.random.default_rng(100 + b) for b in range(8)]
    ws = [worlds[b % 2] for b in range(8)]
    pts, mask = _stack_scans(ws, 0, cfg, rngs)
    states = init_fn(states, pts, mask)
    pts, mask = _stack_scans(ws, 1, cfg, rngs)
    eye = jnp.tile(jnp.eye(4, dtype=jnp.float32), (8, 1, 1))
    states, res, mean_corr, max_err = step(states, pts, mask, eye)
    assert res.position.shape == (8, 3)
    assert float(mean_corr) > 500  # psum'd across devices
    assert np.isfinite(float(max_err))
    # all 8 sequences tracked their (shared) worlds
    for b in range(8):
        gt = np.linalg.inv(ws[b].poses[0]) @ ws[b].poses[1]
        assert np.linalg.norm(np.asarray(res.position)[b] - gt[:3, 3]) < 0.05


def make_noisy_chain(rng, k=12, m=16):
    """Ground-truth chain of poses + noisy estimates, exact relative edges."""
    gt = [np.eye(4)]
    for i in range(1, k):
        d = np.zeros(6)
        d[:3] = rng.normal(scale=0.05, size=3)
        d[3:] = [1.0, rng.normal(scale=0.2), 0.0]
        step = np.asarray(se3.se3_exp(jnp.asarray(d, jnp.float32)))
        gt.append(gt[-1] @ step)
    gt = np.asarray(gt, np.float32)
    noisy = gt.copy()
    for i in range(1, k):
        d = rng.normal(scale=0.05, size=6).astype(np.float32)
        noisy[i] = noisy[i] @ np.asarray(se3.se3_exp(jnp.asarray(d)))
    # edges: consecutive + a few skip-2 edges, all with EXACT gt relatives
    edges, rels = [], []
    for i in range(k - 1):
        edges.append([i, i + 1])
        rels.append(np.linalg.inv(gt[i]) @ gt[i + 1])
    for i in range(0, k - 2, 3):
        edges.append([i, i + 2])
        rels.append(np.linalg.inv(gt[i]) @ gt[i + 2])
    while len(edges) < m:
        edges.append([0, 0])
        rels.append(np.eye(4))
    edge_mask = np.asarray([not (e[0] == e[1] == 0) for e in edges[:m]]) | np.asarray(
        [i == 0 for i in range(m)]
    ) & False
    return gt, noisy, np.asarray(edges[:m], np.int32), np.asarray(rels[:m], np.float32), edge_mask


def test_posegraph_refinement_reduces_error(rng):
    gt, noisy, edges, rels, emask = make_noisy_chain(rng)
    k = len(gt)
    graph = posegraph.PoseGraph(
        poses=jnp.asarray(noisy),
        pose_mask=jnp.ones((k,), bool),
        edges=jnp.asarray(edges),
        rel=jnp.asarray(rels),
        edge_mask=jnp.asarray(emask),
        weights=jnp.ones((len(edges),), jnp.float32),
    )
    before = np.mean(
        [np.linalg.norm(noisy[i][:3, 3] - gt[i][:3, 3]) for i in range(k)]
    )
    refined, err = posegraph.refine(graph, iterations=25)
    refined = np.asarray(refined)
    # compare in the gauge of pose 0
    aligned = np.linalg.inv(refined[0])[None] @ refined
    gt_al = np.linalg.inv(gt[0])[None] @ gt
    after = np.mean(
        [np.linalg.norm(aligned[i][:3, 3] - gt_al[i][:3, 3]) for i in range(k)]
    )
    assert after < before * 0.5, (before, after)


def test_distributed_refine_matches_single(rng):
    """Edge-sharded psum refinement == single-device refinement."""
    gt, noisy, edges, rels, emask = make_noisy_chain(rng, k=10, m=16)
    k = len(gt)
    graph = posegraph.PoseGraph(
        poses=jnp.asarray(noisy),
        pose_mask=jnp.ones((k,), bool),
        edges=jnp.asarray(edges),
        rel=jnp.asarray(rels),
        edge_mask=jnp.asarray(emask),
        weights=jnp.ones((len(edges),), jnp.float32),
    )
    single, err_s = posegraph.refine(graph, iterations=5)
    mesh = sharded.make_mesh(8, axis="edge")
    dist_fn = sharded.make_distributed_refine(mesh, iterations=5)
    dist, err_d = dist_fn(graph)
    np.testing.assert_allclose(np.asarray(single), np.asarray(dist), atol=2e-4)
    # converged error is ~1e-8 (f32 noise floor); compare with an atol
    np.testing.assert_allclose(float(err_s), float(err_d), rtol=1e-3, atol=1e-9)
