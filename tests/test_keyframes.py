"""Keyframe ring eviction (round-2: replaces the silent drop at capacity).

The reference grows its keyframe vector unboundedly (odom.cc:1166); the
fixed-capacity ring must keep accepting keyframes past capacity by evicting
the most redundant one (densest pair member farther from the new pose) so
long sequences keep tracking with a bounded map.
"""

import numpy as np
import jax.numpy as jnp

from direct_lidar_odometry_tpu.core.cloud import PointCloud
from direct_lidar_odometry_tpu.odometry import keyframes
from direct_lidar_odometry_tpu.odometry.state import KeyframeStore
from direct_lidar_odometry_tpu.registration.covariance import Normals


def _store(positions: np.ndarray, nk: int = 64) -> KeyframeStore:
    k = len(positions)
    return KeyframeStore(
        positions=jnp.asarray(positions, jnp.float32),
        quats=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (k, 1)),
        points=jnp.zeros((k, nk, 3), jnp.float32),
        masks=jnp.ones((k, nk), bool),
        normals=jnp.zeros((k, nk, 3), jnp.float32),
        normals_valid=jnp.ones((k, nk), bool),
        count=jnp.int32(k),
        seq=jnp.arange(k, dtype=jnp.int32),
        health=jnp.zeros((k,), jnp.float32),
    )


def _dummy_cloud(nk: int = 64):
    return (
        PointCloud(points=jnp.ones((nk, 3), jnp.float32), mask=jnp.ones((nk,), bool)),
        Normals(normals=jnp.zeros((nk, 3), jnp.float32), valid=jnp.ones((nk,), bool)),
    )


def test_insert_below_capacity_appends():
    kf = _store(np.array([[0.0, 0, 0], [5.0, 0, 0]]))
    kf = kf._replace(count=jnp.int32(1))  # one real entry, capacity 2
    cloud, nrm = _dummy_cloud()
    new, evicted, _slot = keyframes.insert(
        kf, jnp.asarray([9.0, 0, 0]), jnp.asarray([1.0, 0, 0, 0]), cloud, nrm
    )
    assert not bool(evicted)
    assert int(new.count) == 2
    assert np.allclose(np.asarray(new.positions[1]), [9.0, 0, 0])


def test_insert_at_capacity_evicts_densest_pair_member():
    # keyframes at 0, 0.5 (densest pair), 10, 20; new keyframe at 21.
    # The densest pair is (0, 0.5); the member farther from 21 is 0.
    kf = _store(np.array([[0.0, 0, 0], [0.5, 0, 0], [10.0, 0, 0], [20.0, 0, 0]]))
    cloud, nrm = _dummy_cloud()
    new, evicted, _slot = keyframes.insert(
        kf, jnp.asarray([21.0, 0, 0]), jnp.asarray([1.0, 0, 0, 0]), cloud, nrm
    )
    assert bool(evicted)
    assert int(new.count) == 4  # bounded
    xs = sorted(float(x) for x in np.asarray(new.positions)[:, 0])
    assert xs == [0.5, 10.0, 20.0, 21.0], xs


def test_tracking_survives_past_capacity(rng):
    """Pipeline-level: a sequence spawning more keyframes than capacity must
    keep tracking (previously new keyframes were silently dropped)."""
    import dataclasses
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import make_test_world, tiny_cfg

    from direct_lidar_odometry_tpu.io import evaluation, synthetic
    from direct_lidar_odometry_tpu.odometry.runner import OdometryRunner

    cfg = tiny_cfg()
    cfg = cfg.replace(
        shapes=dataclasses.replace(cfg.shapes, max_keyframes=3, max_submap_kf=3),
        adaptive=dataclasses.replace(cfg.adaptive, use=False),
        keyframe=dataclasses.replace(cfg.keyframe, thresh_dist=1.0),
    )
    world = make_test_world(11, n_frames=20, speed=0.5)
    runner = OdometryRunner(cfg)
    evicted_any = False
    for t in range(20):
        scan = synthetic.render_scan(
            world, t, np.random.default_rng(t), max_range=13.0, max_points=8192
        )
        res = runner.process_scan(scan, float(world.stamps[t]))
        if res is not None and bool(res.kf_evicted):
            evicted_any = True
    assert runner.num_keyframes() == 3  # saturated but bounded
    assert evicted_any, "capacity was never crossed — test world too tame"
    est = runner.trajectory()
    gt = np.linalg.inv(world.poses[0])[None] @ world.poses[: len(est)]
    ate = evaluation.ate(est, gt, align=False)
    assert ate.rmse < 0.30, f"tracking degraded past capacity: ATE {ate.rmse:.3f}"
