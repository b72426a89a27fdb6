"""Loop closure + pose-graph refinement (odometry/loopclosure.py,
parallel/posegraph.py).

Validates the three layers separately: the analytic SE(3) edge Jacobians
against numeric differentiation (f64 oracle), the Gauss-Newton refinement
on a classic drifted-loop PGO problem, and the full in-pipeline
refine/re-anchor round on a revisiting trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from direct_lidar_odometry_tpu.core import se3
from direct_lidar_odometry_tpu.odometry import loopclosure
from direct_lidar_odometry_tpu.odometry.runner import OdometryRunner
from direct_lidar_odometry_tpu.parallel import posegraph


# ---------------------------------------------------------------------------
# f64 numpy oracle of the residual + pseudo-exp retraction
# ---------------------------------------------------------------------------

def _rodrigues(w):
    t = np.linalg.norm(w)
    k = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if t < 1e-10:
        return np.eye(3) + k
    return np.eye(3) + np.sin(t) / t * k + (1 - np.cos(t)) / t**2 * (k @ k)


def _log_so3(r):
    cos_t = np.clip((np.trace(r) - 1) / 2, -1, 1)
    t = np.arccos(cos_t)
    if t < 1e-10:
        return np.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]]) / 2
    v = np.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]])
    return v * t / (2 * np.sin(t))


def _retract(x, xi):
    """x @ P(xi), P = (rodrigues(xi_w), xi_t) — matches se3.se3_exp."""
    p = np.eye(4)
    p[:3, :3] = _rodrigues(xi[:3])
    p[:3, 3] = xi[3:]
    return x @ p


def _residual_np(x_i, x_j, z):
    e = np.linalg.inv(z) @ (np.linalg.inv(x_i) @ x_j)
    return np.concatenate([_log_so3(e[:3, :3]), e[:3, 3]])


def _rand_pose(rng, rot_scale=0.6, trans_scale=4.0):
    x = np.eye(4)
    x[:3, :3] = _rodrigues(rng.normal(scale=rot_scale, size=3))
    x[:3, 3] = rng.normal(scale=trans_scale, size=3)
    return x


def test_edge_jacobians_match_numdiff():
    """Analytic J_i, J_j == central differences of the f64 oracle.

    Moderate residual (|w| ~ 0.05) so the first-order Jr^-1 approximation
    error (O(|w|^2)) stays below tolerance — the regime GN iterates in.
    """
    rng = np.random.default_rng(0)
    for _ in range(5):
        x_i = _rand_pose(rng)
        x_j = _rand_pose(rng)
        # measurement = true relative perturbed a little => small residual
        z_true = np.linalg.inv(x_i) @ x_j
        z = _retract(z_true, rng.normal(scale=0.03, size=6))

        r, j_i, j_j = posegraph.edge_jacobians(
            jnp.asarray(x_i, jnp.float32), jnp.asarray(x_j, jnp.float32),
            jnp.asarray(z, jnp.float32),
        )
        np.testing.assert_allclose(
            np.asarray(r), _residual_np(x_i, x_j, z), atol=1e-5
        )
        eps = 1e-6
        num_i = np.zeros((6, 6))
        num_j = np.zeros((6, 6))
        for k in range(6):
            d = np.zeros(6)
            d[k] = eps
            num_i[:, k] = (
                _residual_np(_retract(x_i, d), x_j, z)
                - _residual_np(_retract(x_i, -d), x_j, z)
            ) / (2 * eps)
            num_j[:, k] = (
                _residual_np(x_i, _retract(x_j, d), z)
                - _residual_np(x_i, _retract(x_j, -d), z)
            ) / (2 * eps)
        # first-order Jr^-1 -> O(|w|^2) ~ 1e-3 relative error budget
        np.testing.assert_allclose(np.asarray(j_i), num_i, atol=5e-3)
        np.testing.assert_allclose(np.asarray(j_j), num_j, atol=5e-3)


def test_refinement_closes_drifted_loop():
    """Classic PGO: integrate noisy chain measurements around a circle,
    close with one exact loop edge — refinement must recover most of the
    accumulated drift (this exercises the adjoint coupling: the loop
    correction is mostly rotational early in the chain and must propagate
    into translation)."""
    rng = np.random.default_rng(1)
    k = 32
    radius = 20.0
    # ground-truth poses on a circle, heading tangent
    gt = np.zeros((k, 4, 4))
    for t in range(k):
        a = 2 * np.pi * t / k
        gt[t] = np.eye(4)
        gt[t, :3, :3] = _rodrigues(np.array([0, 0, a + np.pi / 2]))
        gt[t, :3, 3] = [radius * np.cos(a), radius * np.sin(a), 0.0]
    # noisy chain measurements, integrated => drifted estimates
    z_chain = np.zeros((k - 1, 4, 4))
    est = np.zeros_like(gt)
    est[0] = gt[0]
    for t in range(k - 1):
        z_true = np.linalg.inv(gt[t]) @ gt[t + 1]
        z_chain[t] = _retract(z_true, rng.normal(scale=[8e-3] * 3 + [4e-2] * 3))
        est[t + 1] = est[t] @ z_chain[t]
    drift_before = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
    assert drift_before.max() > 0.5, "test world failed to drift"

    # graph: noisy chain + one exact loop edge (0 -> k-1)
    m = k  # k-1 chain + 1 loop
    edges = np.zeros((m, 2), np.int32)
    rel = np.zeros((m, 4, 4), np.float32)
    weights = np.ones((m,), np.float32)
    edges[: k - 1] = np.stack([np.arange(k - 1), np.arange(1, k)], axis=1)
    rel[: k - 1] = z_chain
    edges[k - 1] = [0, k - 1]
    rel[k - 1] = np.linalg.inv(gt[0]) @ gt[k - 1]
    weights[k - 1] = 4.0

    graph = posegraph.PoseGraph(
        poses=jnp.asarray(est, jnp.float32),
        pose_mask=jnp.ones((k,), bool),
        edges=jnp.asarray(edges),
        rel=jnp.asarray(rel, jnp.float32),
        edge_mask=jnp.ones((m,), bool),
        weights=jnp.asarray(weights),
    )
    refined, _err = posegraph.refine(graph, iterations=15)
    refined = np.asarray(refined)
    drift_after = np.linalg.norm(refined[:, :3, 3] - gt[:, :3, 3], axis=1)
    # most of the drift must be recovered
    assert drift_after.max() < 0.35 * drift_before.max(), (
        drift_before.max(), drift_after.max())
    assert np.all(np.isfinite(refined))


def test_loop_candidates_gap_and_radius():
    from direct_lidar_odometry_tpu.odometry.state import KeyframeStore

    k = 16
    pos = np.zeros((k, 3), np.float32)
    pos[:, 0] = np.arange(k)          # walk away along x ...
    pos[12] = [0.5, 0.0, 0.0]         # ... and come back near the start
    store = KeyframeStore(
        positions=jnp.asarray(pos),
        quats=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (k, 1)),
        points=jnp.zeros((k, 4, 3), jnp.float32),
        masks=jnp.zeros((k, 4), bool),
        normals=jnp.zeros((k, 4, 3), jnp.float32),
        normals_valid=jnp.zeros((k, 4), bool),
        count=jnp.int32(14),
        seq=jnp.arange(k, dtype=jnp.int32),
        health=jnp.zeros((k,), jnp.float32),
    )
    edges, mask = loopclosure.loop_candidates(
        store, loop_radius=2.0, min_index_gap=8, max_loops=4
    )
    edges = np.asarray(edges)[np.asarray(mask)]
    # (0, 12) d=0.5 and (1, 12) d=0.5 qualify; (2, 12) gap 10 >= 8 d=1.5 too
    assert len(edges) >= 2
    for i, j in edges:
        assert j - i >= 8
        assert np.linalg.norm(pos[i] - pos[j]) < 2.0
        assert j < 14  # never an empty slot


def test_refinement_repairs_drifted_ring():
    """build_refinement_graph + refine on a drifted keyframe RING (store
    level, exact loop measurements): per-keyframe error vs ground truth
    must DECREASE. Regression for two round-4 findings: (a) the slot-order
    chain prior mis-routed corrections after eviction (seq ordering), and
    (b) an unweighted chain spread a localized correction uniformly,
    dragging accurate keyframes off GT (health weighting). Also exercised
    with slots stored in SHUFFLED order to emulate eviction rewrites."""
    from direct_lidar_odometry_tpu.odometry.state import KeyframeStore

    rng = np.random.default_rng(4)
    k = 40
    radius = 12.0
    gt = np.zeros((k, 4, 4))
    for t in range(k):
        a = 2 * np.pi * t / k
        gt[t] = np.eye(4)
        gt[t, :3, :3] = _rodrigues(np.array([0, 0, a + np.pi / 2]))
        gt[t, :3, 3] = [radius * np.cos(a), radius * np.sin(a), 0.0]
    gt = np.linalg.inv(gt[0])[None] @ gt
    # drift burst: keyframes 12..20 accumulate translation error, which
    # then persists to the end of the ring
    est = gt.copy()
    drift = np.zeros(3)
    healths = np.full(k, 0.08, np.float32)
    for t in range(12, 20):
        drift += rng.normal(scale=0.02, size=3)
        healths[t] = 0.8  # degraded odometry during the burst
    for t in range(12, k):
        est[t, :3, 3] = gt[t, :3, 3] + drift * min(1.0, (t - 11) / 8.0)

    perm = rng.permutation(k)  # slot order != trajectory order (eviction)
    inv_perm = np.argsort(perm)
    store = KeyframeStore(
        positions=jnp.asarray(est[perm, :3, 3], jnp.float32),
        quats=jnp.asarray(np.stack([
            np.asarray(se3.rotmat_to_quat(jnp.asarray(est[p, :3, :3],
                                                      jnp.float32)))
            for p in perm]), jnp.float32),
        points=jnp.zeros((k, 4, 3), jnp.float32),
        masks=jnp.zeros((k, 4), bool),
        normals=jnp.zeros((k, 4, 3), jnp.float32),
        normals_valid=jnp.zeros((k, 4), bool),
        count=jnp.int32(k),
        seq=jnp.asarray(perm, jnp.int32),
        health=jnp.asarray(healths[perm]),
    )
    # one exact loop edge: first and last keyframes (slots via inv_perm)
    i_slot, j_slot = int(inv_perm[0]), int(inv_perm[k - 1])
    z = np.linalg.inv(gt[0]) @ gt[k - 1]
    loops = loopclosure.LoopEdges(
        edges=jnp.asarray([[i_slot, j_slot]], jnp.int32),
        mask=jnp.asarray([True]),
        rel=jnp.asarray(z[None], jnp.float32),
        weight=jnp.asarray([2.0], jnp.float32),
        num_corr=jnp.asarray([1000], jnp.int32),
    )
    graph = loopclosure.build_refinement_graph(store, loops, chain_weight=1.0)
    new_poses, _err = posegraph.refine(graph, iterations=10)
    new_pos = np.asarray(new_poses)[:, :3, 3]
    err_before = np.linalg.norm(est[perm, :3, 3] - gt[perm, :3, 3], axis=-1)
    err_after = np.linalg.norm(new_pos - gt[perm, :3, 3], axis=-1)
    assert err_after.mean() < 0.7 * err_before.mean(), (
        err_before.mean(), err_after.mean())
    assert err_after.max() < err_before.max()


def test_drifted_revisit_needs_wide_gate():
    """A revisit with ~1.2 m accumulated drift: the S2M 0.5 m gate rejects
    the loop edge (few/no correspondences from the identity guess) while
    the wired ``posegraph.loop_corr_distance`` 2.0 m gate closes it with
    the correct relative measurement. Regression for the round-3 dead-knob
    finding: register_loop_edges used cfg.gicp.s2m verbatim, disabling
    loop closure exactly when drift exceeded 0.5 m."""
    import dataclasses

    from direct_lidar_odometry_tpu.config import DloConfig, ShapeConfig
    from direct_lidar_odometry_tpu.odometry.state import KeyframeStore
    from direct_lidar_odometry_tpu.registration import covariance

    rng = np.random.default_rng(7)
    # structured scene: three orthogonal noisy planes -> well-defined normals
    n = 2048
    pts = np.zeros((n, 3), np.float32)
    third = n // 3
    pts[:third, :2] = rng.uniform(-8, 8, (third, 2))            # floor z=0
    pts[third : 2 * third, 1:] = rng.uniform(-8, 8, (third, 2))  # wall x=0
    pts[third : 2 * third, 0] = 5.0
    rest = n - 2 * third
    pts[2 * third :, ::2] = rng.uniform(-8, 8, (rest, 2))        # wall y=0
    pts[2 * third :, 1] = 5.0
    pts += rng.normal(scale=0.01, size=pts.shape).astype(np.float32)
    mask = np.ones((n,), bool)

    nrm = covariance.estimate_normals_brute(
        jnp.asarray(pts), jnp.asarray(mask), k=10, chunk=1024
    )

    # keyframe i: the true scene at the true pose (identity). keyframe j:
    # the SAME scene re-observed after the loop, but stored drifted by D
    # (odometry error) — both the stored cloud and the stored pose carry D.
    drift = np.eye(4, dtype=np.float32)
    drift[:3, 3] = [1.2, -0.4, 0.1]
    pts_j = pts @ drift[:3, :3].T + drift[:3, 3]
    x_j_stored = drift.copy()  # drifted pose estimate of the revisit

    k_cap, nk = 4, n
    store = KeyframeStore(
        positions=jnp.asarray(
            np.stack([np.zeros(3, np.float32), x_j_stored[:3, 3],
                      np.zeros(3, np.float32), np.zeros(3, np.float32)])),
        quats=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (k_cap, 1)),
        points=jnp.asarray(np.stack([pts, pts_j, pts, pts])),
        masks=jnp.ones((k_cap, nk), bool),
        normals=jnp.stack([nrm.normals] * k_cap),
        normals_valid=jnp.stack([nrm.valid] * k_cap),
        count=jnp.int32(2),
        seq=jnp.arange(k_cap, dtype=jnp.int32),
        health=jnp.zeros((k_cap,), jnp.float32),
    )
    edges = jnp.asarray([[0, 1]], jnp.int32)
    mask_e = jnp.asarray([True])

    base = DloConfig().replace(
        shapes=ShapeConfig(n_scan=n, n_keyframe=nk, max_keyframes=k_cap,
                           grid_table_size=2 ** 12, submap_table_size=2 ** 12),
    )
    wide = loopclosure.register_loop_edges(store, edges, mask_e, base, "hashgrid")
    assert float(wide.weight[0]) > 0, "wide loop gate failed to close the loop"
    # measured dT must recover the drift: Z = X_i^-1 dT X_j with X_i = I,
    # X_j = drift and dT ~ drift^-1  =>  Z ~ identity-translation residual
    z = np.asarray(wide.rel[0])
    assert np.linalg.norm(z[:3, 3]) < 0.05, z

    tight = dataclasses.replace(
        base, posegraph=dataclasses.replace(
            base.posegraph, loop_corr_distance=0.5, loop_max_iterations=32))
    narrow = loopclosure.register_loop_edges(store, edges, mask_e, tight, "hashgrid")
    # under the tight gate the drifted revisit cannot be measured: either
    # the edge is rejected outright or it grossly under-corrects the drift
    if float(narrow.weight[0]) > 0:
        z_n = np.asarray(narrow.rel[0])
        assert np.linalg.norm(z_n[:3, 3]) > 0.3, (
            "tight gate unexpectedly measured the full drift", z_n)


def _loop_world(n_frames=40):
    """Synthetic world whose trajectory returns near its start."""
    from tests.test_pipeline import make_test_world

    w = make_test_world(13, n_frames=n_frames, speed=0.4)
    # overwrite the wandering trajectory with a closed loop
    radius = 0.4 * n_frames / (2 * np.pi)
    for t in range(n_frames):
        a = 2 * np.pi * t / n_frames
        w.poses[t] = np.eye(4)
        w.poses[t, :3, :3] = _rodrigues(np.array([0, 0, a + np.pi / 2]))
        w.poses[t, :3, 3] = [radius * np.cos(a), radius * np.sin(a), 1.5]
    return w


def test_pipeline_refine_and_reanchor():
    """Full pipeline on a closed-loop trajectory: the refinement round
    runs, finds the revisit, keeps the state finite and self-consistent,
    and tracking continues cleanly afterwards."""
    from direct_lidar_odometry_tpu.io import synthetic
    from tests.test_pipeline import SCAN_RANGE, tiny_cfg

    import dataclasses

    n = 40
    world = _loop_world(n)
    base = tiny_cfg()
    cfg = dataclasses.replace(
        base,
        posegraph=dataclasses.replace(
            base.posegraph,
            use=True, min_index_gap=4, loop_radius=4.0,
            refine_every_kf=3, check_every=64, min_loop_corr=100,
        ),
        keyframe=dataclasses.replace(base.keyframe, thresh_dist=1.0),
        adaptive=dataclasses.replace(base.adaptive, use=False),
    )
    rng = np.random.default_rng(3)
    runner = OdometryRunner(cfg)
    for t in range(n):
        scan = synthetic.render_scan(
            world, t, rng, max_range=SCAN_RANGE, max_points=8192
        )
        runner.process_scan(scan, world.stamps[t])
    info = runner.maybe_refine(force=True)
    assert info is not None, "refinement did not run"
    assert info["n_candidates"] >= 1, info
    # state stays finite and consistent
    st = runner.state
    assert bool(jnp.isfinite(st.pose).all())
    assert bool(jnp.isfinite(st.keyframes.positions).all())
    kfc = int(st.keyframes.count)
    pts = np.asarray(st.keyframes.points[:kfc])
    msk = np.asarray(st.keyframes.masks[:kfc])
    assert np.isfinite(pts[msk]).all()
    # keyframe clouds must sit near their (possibly re-anchored) poses
    for i in range(kfc):
        if msk[i].sum() == 0:
            continue
        centroid = pts[i][msk[i]].mean(axis=0)
        d = np.linalg.norm(centroid - np.asarray(st.keyframes.positions[i]))
        assert d < SCAN_RANGE, (i, d)
    # tracking continues after re-anchoring
    for t in range(5):
        scan = synthetic.render_scan(
            world, t % n, rng, max_range=SCAN_RANGE, max_points=8192
        )
        res = runner.process_scan(scan, world.stamps[-1] + 0.1 * (t + 1))
        assert runner.health_check(res) != "diverged"
