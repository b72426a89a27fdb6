"""End-to-end IMU evidence (round-4 verdict item 4): the gyro-prior hot
path and gravity alignment exercised at sequence scale, not only as
units, plus host/device integrator agreement."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from direct_lidar_odometry_tpu.config import DloConfig
from direct_lidar_odometry_tpu.io import evaluation, synthetic
from direct_lidar_odometry_tpu.odometry import imu as imu_mod
from direct_lidar_odometry_tpu.odometry.runner import OdometryRunner

from tests.test_pipeline import tiny_cfg


def test_integrate_window_host_matches_device():
    """The host prior path (one tunnel RTT per frame saved) must agree
    with the in-jit integrator bit-for-bit in double precision class."""
    rng = np.random.default_rng(0)
    for count in (0, 1, 2, 7, 31):
        window = np.zeros((32, 7), np.float32)
        window[:, 0] = np.sort(rng.uniform(0.0, 0.1, 32))
        window[:, 1:4] = rng.normal(scale=0.8, size=(32, 3))
        dev = np.asarray(
            imu_mod.integrate_window(jnp.asarray(window), jnp.int32(count)))
        host = imu_mod.integrate_window_host(window, count)
        np.testing.assert_allclose(dev, host, atol=1e-5)


def _tilted_loop_world(n_frames=20, roll_deg=6.0, pitch_deg=-4.0):
    rng = np.random.default_rng(4)
    world = synthetic.make_urban_world(
        rng, n_frames=n_frames, speed=0.4, corridor=7.0, n_dynamic=0)
    r, p = np.deg2rad(roll_deg), np.deg2rad(pitch_deg)
    Rx = np.array([[1, 0, 0], [0, np.cos(r), -np.sin(r)],
                   [0, np.sin(r), np.cos(r)]])
    Ry = np.array([[np.cos(p), 0, np.sin(p)], [0, 1, 0],
                   [-np.sin(p), 0, np.cos(p)]])
    tilt = Rx @ Ry
    # tilt the SENSOR mounting: body frame rotated relative to the
    # (level) trajectory — the situation gravity alignment exists for
    world.poses[:, :3, :3] = world.poses[:, :3, :3] @ tilt
    return world, tilt


def test_gravity_align_end_to_end():
    """3 s static calibration -> gravity-aligned initial orientation ->
    tracking on a tilted-sensor world (reference odom.cc:535-579 flow)."""
    world, tilt = _tilted_loop_world()
    cfg = tiny_cfg(
        imu=DloConfig().imu.__class__(use=True, calib_time=1.0,
                                      buffer_size=2048),
        gravity_align=True,
        s2s_prior="constant_velocity",
    )
    runner = OdometryRunner(cfg)
    # static calibration window before motion: body reads tilted gravity
    g_body = tilt.T @ np.array([0.0, 0.0, 9.81])
    for i in range(120):
        runner.push_imu(-1.5 + i * 0.01, np.zeros(3), g_body)
    imu_rng = np.random.default_rng(9)
    bm = synthetic.BeamModel(n_beams=32, n_azimuth=512)
    rng = np.random.default_rng(11)
    for t in range(len(world.poses)):
        for row in synthetic.make_imu_between(world, t, 100.0, imu_rng):
            runner.push_imu(float(row[0]), row[1:4], row[4:7])
        s = synthetic.render_scan(world, t, rng, max_range=13.0,
                                  max_points=cfg.shapes.n_raw, beams=bm)
        runner.process_scan(s, stamp=float(world.stamps[t]))

    est = runner.trajectory()
    # (a) the initial orientation must level the tilted gravity: rotating
    # the body gravity direction by est[0]'s rotation gives +z
    g_est = est[0][:3, :3] @ (g_body / np.linalg.norm(g_body))
    assert np.arccos(np.clip(g_est[2], -1, 1)) < np.deg2rad(1.0), g_est
    # (b) tracking survives the tilt: SE(3)-aligned ATE stays small
    gt = np.linalg.inv(world.poses[0])[None] @ world.poses[: len(est)]
    err = evaluation.ate(est, gt, align=True)
    assert err.rmse < 0.08, err.rmse


def test_imu_prior_tracks_fast_turns():
    """A/B at sequence scale: with an aggressive-turn world, the gyro
    prior must not be worse than constant-velocity (the reference trusts
    the gyro every scan, odom.cc:801-806)."""
    rng = np.random.default_rng(3)
    world = synthetic.make_urban_world(
        rng, n_frames=24, speed=0.5, corridor=7.0, n_dynamic=0,
        closed_loop=True)  # constant hard turn: CV rotation lags
    bm = synthetic.BeamModel(n_beams=32, n_azimuth=512)

    def run(use_imu):
        cfg = tiny_cfg(
            imu=DloConfig().imu.__class__(use=use_imu, calib_time=0.0,
                                          buffer_size=2048),
            s2s_prior="constant_velocity",
        )
        runner = OdometryRunner(cfg)
        imu_rng = np.random.default_rng(5)
        srng = np.random.default_rng(6)
        for t in range(len(world.poses)):
            if use_imu:
                for row in synthetic.make_imu_between(world, t, 100.0, imu_rng):
                    runner.push_imu(float(row[0]), row[1:4], row[4:7])
            s = synthetic.render_scan(world, t, srng, max_range=13.0,
                                      max_points=cfg.shapes.n_raw, beams=bm)
            runner.process_scan(s, stamp=float(world.stamps[t]))
        est = runner.trajectory()
        gt = np.linalg.inv(world.poses[0])[None] @ world.poses[: len(est)]
        return evaluation.ate(est, gt, align=False).rmse

    ate_cv = run(False)
    ate_imu = run(True)
    assert np.isfinite(ate_imu) and np.isfinite(ate_cv)
    assert ate_imu <= ate_cv * 1.25 + 0.01, (ate_imu, ate_cv)
