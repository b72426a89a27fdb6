"""Tests for the round-5 realistic renderers (occlusion, beams, dynamics).

The round-4 verdict's item 2: the soup renderer did range gating only —
points behind walls were visible. These tests pin the realism properties
the bench world now rests on.
"""

import numpy as np

from direct_lidar_odometry_tpu.io import synthetic


def _two_walls_world():
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        synthetic._box_surface(rng, [5.0, 0.0, 1.5], [0.2, 8.0, 3.0], 400.0),
        synthetic._box_surface(rng, [10.0, 0.0, 1.5], [0.2, 8.0, 3.0], 400.0),
    ]).astype(np.float32)
    poses = np.eye(4)[None].repeat(2, 0)
    poses[:, 2, 3] = 1.5
    return synthetic.SyntheticWorld(
        surface_points=pts, poses=poses, stamps=np.array([0.0, 0.1]))


def test_soup_renderer_sees_through_walls():
    w = _two_walls_world()
    s = synthetic.render_scan(w, 0, np.random.default_rng(1),
                              max_range=20.0, max_points=1 << 20)
    assert (s[:, 0] > 7.0).sum() > 1000  # legacy behavior, by design


def test_zbuffer_occlusion_culls_back_wall():
    w = _two_walls_world()
    bm = synthetic.BeamModel(fov_up_deg=20.0, fov_down_deg=-25.0)
    s = synthetic.render_scan(w, 0, np.random.default_rng(1),
                              max_range=20.0, max_points=1 << 20, beams=bm)
    behind = (s[:, 0] > 7.0).sum()
    # tiny silhouette-edge leak tolerated; the wall face must be gone
    assert behind < 0.01 * len(s), (behind, len(s))
    assert len(s) > 1000


def test_raycast_occlusion_is_exact():
    world = synthetic.BoxWorld(
        boxes=np.array([[5.0, 0.0, 1.5, 0.2, 8.0, 3.0],
                        [10.0, 0.0, 1.5, 0.2, 8.0, 3.0]], np.float32),
        poses=_two_walls_world().poses,
        stamps=np.array([0.0, 0.1]),
    )
    bm = synthetic.BeamModel(fov_up_deg=20.0, fov_down_deg=-25.0)
    s = synthetic.render_scan(world, 0, np.random.default_rng(1),
                              max_range=20.0, max_points=1 << 20, beams=bm)
    # nothing may land on the second wall's face: behind the first wall,
    # within its shadow footprint, above the ground
    on_back_wall = ((s[:, 0] > 7.0) & (np.abs(s[:, 1]) < 3.0)
                    & (s[:, 2] > -1.2))
    assert on_back_wall.sum() == 0
    assert len(s) > 1000


def test_raycast_beam_structure():
    """One return per (beam, azimuth) ray at most; ranges ring-structured."""
    rng = np.random.default_rng(0)
    world = synthetic.make_urban_world(rng, n_frames=5, speed=0.5)
    bm = synthetic.BeamModel(n_beams=16, n_azimuth=256)
    s = synthetic.render_scan(world, 0, rng, max_range=30.0,
                              max_points=1 << 20, beams=bm)
    assert len(s) <= 16 * 256
    # elevation angles cluster on at most n_beams rings
    el = np.arcsin(s[:, 2] / np.linalg.norm(s, axis=1))
    hist, _ = np.histogram(el, bins=16 * 4,
                           range=(np.deg2rad(-17.0), np.deg2rad(17.0)))
    assert (hist > 0).sum() <= 16 + 2  # jittered rows stay in ~n_beams bins


def test_raycast_dynamic_boxes_move():
    rng = np.random.default_rng(0)
    world = synthetic.BoxWorld(
        boxes=np.zeros((0, 6), np.float32),
        poses=np.eye(4)[None].repeat(2, 0),
        stamps=np.array([0.0, 1.0]),
        dynamic_boxes=np.array([[8.0, 0.0, 1.0, 2.0, 2.0, 2.0]], np.float32),
        dynamic_vel=np.array([[0.0, 3.0, 0.0]], np.float32),
    )
    world.poses[:, 2, 3] = 1.5
    bm = synthetic.BeamModel(fov_up_deg=20.0, fov_down_deg=-25.0)
    s0 = synthetic.render_scan(world, 0, np.random.default_rng(1),
                               max_range=30.0, max_points=1 << 20, beams=bm)
    s1 = synthetic.render_scan(world, 1, np.random.default_rng(1),
                               max_range=30.0, max_points=1 << 20, beams=bm)
    box0 = s0[np.abs(s0[:, 2] + 1.5) > 0.15]  # non-ground returns
    box1 = s1[np.abs(s1[:, 2] + 1.5) > 0.15]
    # the box (the only structure) moved 3 m along +y between frames
    # (median of the visible face sits slightly inside the travel because
    # the newly exposed -y side face joins the return set)
    assert abs(np.median(box1[:, 1]) - np.median(box0[:, 1]) - 3.0) < 0.6


def test_raycast_rough_boxes_noisier():
    base = dict(
        poses=np.eye(4)[None].repeat(1, 0), stamps=np.array([0.0]))
    base["poses"][0, 2, 3] = 1.5
    crisp = synthetic.BoxWorld(
        boxes=np.array([[8.0, 0.0, 1.5, 4.0, 4.0, 3.0]], np.float32),
        rough=np.array([0.0], np.float32), **base)
    fuzzy = synthetic.BoxWorld(
        boxes=np.array([[8.0, 0.0, 1.5, 4.0, 4.0, 3.0]], np.float32),
        rough=np.array([0.15], np.float32), **base)
    bm = synthetic.BeamModel(fov_up_deg=15.0, fov_down_deg=-15.0)

    def face_spread(w):
        s = synthetic.render_scan(w, 0, np.random.default_rng(1),
                                  max_range=30.0, max_points=1 << 20,
                                  beams=bm, noise=0.001)
        # centre of the front face only (side faces slope away in x)
        face = s[(np.abs(s[:, 0] - 6.0) < 1.0) & (np.abs(s[:, 1]) < 1.5)
                 & (s[:, 2] > -1.2)]
        return np.std(face[:, 0])

    assert face_spread(fuzzy) > 4 * face_spread(crisp)


def test_raycast_sees_structure_at_any_yaw():
    """Regression: the per-box azimuth-wedge culling must slice the ray
    grid in the SENSOR frame — a world-frame wedge made every box vanish
    once the robot had yawed far enough (round-5 bug, cost 2.6 m ATE)."""
    rng = np.random.default_rng(0)
    world = synthetic.make_urban_world(rng, n_frames=30, speed=1.0,
                                       n_dynamic=0, closed_loop=True)
    bm = synthetic.BeamModel()
    P = world.poses
    yaw = np.abs(np.degrees(np.arctan2(P[:, 1, 0], P[:, 0, 0])))
    assert yaw.max() > 90, "world must actually turn for this test"
    for t in range(0, 30, 5):
        s = synthetic.render_scan(world, t, rng, max_range=40.0,
                                  max_points=1 << 20, beams=bm)
        non_ground = (np.abs(s[:, 2] + 1.5) > 0.3).sum()
        assert non_ground > 3000, (t, non_ground)


def test_raycast_inside_box_returns_nothing():
    """A sensor inside a solid box must see no returns from it (the old
    behavior emitted a min_range shell that the crop then deleted —
    whole scans vanished whenever a trajectory clipped a building)."""
    world = synthetic.BoxWorld(
        boxes=np.array([[0.0, 0.0, 1.5, 6.0, 6.0, 4.0]], np.float32),
        poses=np.eye(4)[None],
        stamps=np.array([0.0]),
    )
    world.poses[0, 2, 3] = 1.5  # inside the box
    bm = synthetic.BeamModel(fov_up_deg=15.0, fov_down_deg=-15.0)
    s = synthetic.render_scan(world, 0, np.random.default_rng(1),
                              max_range=30.0, max_points=1 << 20, beams=bm)
    # the box is the only structure and we are inside it: no box returns
    # (ground hits may remain — an enclosed sensor is out-of-contract for
    # the renderer; the invariant is no garbage interior shells)
    non_ground = s[np.abs(s[:, 2] + 1.5) > 0.15] if len(s) else s
    assert len(non_ground) == 0, len(non_ground)


def test_urban_world_scan_density():
    """The bench world must stay in the realistic OS1-64 class."""
    rng = np.random.default_rng(0)
    world = synthetic.make_urban_world(rng, n_frames=20, speed=1.0,
                                       n_dynamic=2)
    bm = synthetic.BeamModel()
    s = synthetic.render_scan(world, 5, rng, max_range=40.0,
                              max_points=1 << 20, beams=bm)
    assert 30000 < len(s) <= 64 * 1024
    vox = np.unique(np.floor(s / 0.25).astype(np.int64), axis=0)
    assert len(vox) > 7000  # enough structure for registration


def test_checkpoint_v2_field_paths(tmp_path):
    """Round-4 advisor: checkpoints must survive state-schema growth."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    from direct_lidar_odometry_tpu import config as config_mod
    from direct_lidar_odometry_tpu.odometry import pipeline
    from direct_lidar_odometry_tpu.utils import checkpoint

    cfg = config_mod.DloConfig()
    cfg = cfg.replace(shapes=dataclasses.replace(
        cfg.shapes, n_raw=512, n_scan=512, n_keyframe=512, max_keyframes=4,
        max_submap_kf=2, n_submap_flat=1024, grid_table_size=1024,
        submap_table_size=1024, hull_directions=8))
    state = pipeline.fresh_state(cfg)
    p = str(tmp_path / "ck.npz")
    checkpoint.save_state(p, state, extra={"prev_stamp": 1.5})
    loaded, extra = checkpoint.load_state(p, cfg)
    assert extra["prev_stamp"] == 1.5
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # forward migration: drop one field from the archive -> template value
    data = dict(np.load(p))
    seq_keys = [k for k in data if k.endswith("/seq")]
    assert seq_keys, list(data)[:8]
    data.pop(seq_keys[0])
    p2 = str(tmp_path / "ck2.npz")
    np.savez_compressed(p2, **data)
    loaded2, _ = checkpoint.load_state(p2, cfg)
    assert jax.tree_util.tree_structure(loaded2) == \
        jax.tree_util.tree_structure(state)

    # v1 archives with a stale leaf count must fail with a clear message
    leaves = jax.tree_util.tree_leaves(state)
    v1 = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves[:-1])}
    p3 = str(tmp_path / "ck_v1.npz")
    np.savez_compressed(p3, **v1)
    try:
        checkpoint.load_state(p3, cfg)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "format v1" in str(e)
