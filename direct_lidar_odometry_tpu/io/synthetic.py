"""Synthetic LiDAR world + scan generator (host-side, NumPy).

The reference validates against a 9-minute rosbag that is not in the mirror
(``README.md:61-76``, ``.MISSING_LARGE_BLOBS``) and no KITTI data ships in
this environment, so tests and benchmarks use a procedurally generated
world: a ground plane plus random boxes/walls, sampled on surfaces, scanned
from a smooth trajectory with range-limited visibility and per-point noise.
Ground-truth poses make ATE exactly measurable.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class SyntheticWorld:
    surface_points: np.ndarray  # [M, 3] dense point soup on surfaces (world frame)
    poses: np.ndarray           # [T, 4, 4] ground-truth sensor poses
    stamps: np.ndarray          # [T] seconds


def _box_surface(rng, center, size, density):
    """Sample points on the faces of an axis-aligned box."""
    cx, cy, cz = center
    sx, sy, sz = size
    areas = np.array([sy * sz, sy * sz, sx * sz, sx * sz, sx * sy, sx * sy])
    counts = np.maximum((areas * density).astype(int), 1)
    pts = []
    for face, n in enumerate(counts):
        u = rng.uniform(-0.5, 0.5, size=(n, 2))
        if face < 2:  # +x / -x
            x = np.full(n, 0.5 if face == 0 else -0.5)
            p = np.stack([x, u[:, 0], u[:, 1]], axis=1)
        elif face < 4:
            y = np.full(n, 0.5 if face == 2 else -0.5)
            p = np.stack([u[:, 0], y, u[:, 1]], axis=1)
        else:
            z = np.full(n, 0.5 if face == 4 else -0.5)
            p = np.stack([u[:, 0], u[:, 1], z], axis=1)
        pts.append(p * np.array(size) + np.array(center))
    return np.concatenate(pts, axis=0)


def make_world(
    rng: np.random.Generator,
    n_frames: int = 50,
    extent: float = 60.0,
    n_boxes: int = 40,
    density: float = 60.0,
    speed: float = 1.2,
    dt: float = 0.1,
    yaw_rate: float = 0.04,
    ground_points: int = 40000,
) -> SyntheticWorld:
    """Build a world and a smooth wandering trajectory through it.

    NOTE on scan overlap: consecutive scans rendered from this world see
    the *same* surface points (plus noise) wherever their ranges overlap —
    like a real LiDAR densely sampling continuous surfaces. Keep the world
    dense enough (ground_points/density vs extent) that
    :func:`render_scan`'s ``max_points`` does NOT force random
    subsampling, otherwise scans become near-disjoint sparse subsets and
    scan-to-map matching at realistic radii breaks down.
    """
    surf = [
        # ground plane as a thin grid of points
        np.stack(
            [
                rng.uniform(-extent, extent, size=ground_points),
                rng.uniform(-extent, extent, size=ground_points),
                np.zeros(ground_points),
            ],
            axis=1,
        )
    ]
    for _ in range(n_boxes):
        center = [
            rng.uniform(-extent * 0.9, extent * 0.9),
            rng.uniform(-extent * 0.9, extent * 0.9),
            rng.uniform(1.0, 4.0),
        ]
        size = rng.uniform(1.0, 8.0, size=3)
        surf.append(_box_surface(rng, center, size, density))
    surface_points = np.concatenate(surf, axis=0).astype(np.float32)

    # smooth trajectory: constant speed, AR(1) yaw rate (white-noise yaw
    # produces 20deg+ single-frame jumps that alias scan matching without
    # an IMU prior — real platforms turn smoothly), sensor 1.5m up
    poses = np.zeros((n_frames, 4, 4))
    stamps = np.arange(n_frames) * dt
    yaw = 0.0
    yaw_vel = 0.0
    pos = np.array([0.0, 0.0, 1.5])
    for t in range(n_frames):
        yaw_vel = 0.8 * yaw_vel + rng.normal(scale=yaw_rate)
        yaw_vel = np.clip(yaw_vel, -0.09, 0.09)  # <= ~5 deg/frame, 10 Hz realistic
        yaw += yaw_vel * dt * 10
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        poses[t] = np.eye(4)
        poses[t, :3, :3] = R
        poses[t, :3, 3] = pos
        pos = pos + R @ np.array([speed * dt * 10, 0, 0])
    return SyntheticWorld(surface_points=surface_points, poses=poses, stamps=stamps)


def make_loop_world(
    rng: np.random.Generator,
    n_frames: int = 500,
    speed: float = 0.4,
    dt: float = 0.1,
    z_amplitude: float = 1.0,
    n_loops: float = 1.0,
    density: float = 6.0,
    ground_density: float = 9.0,
) -> SyntheticWorld:
    """Closed-loop trajectory with elevation — the hard validation world.

    The sensor travels a circle of circumference ``speed * n_frames /
    n_loops`` (heading tangent to it, like a vehicle) while bobbing
    ``z_amplitude`` metres sinusoidally — exercising loop closure, z
    drift, and pitch-free elevation change over arbitrarily long
    sequences. The world (ground plane + boxes) is sized to the loop so
    500+ frame runs never exit the populated region (the failure mode of
    :func:`make_world`'s wandering trajectory past ``extent``).
    Surface density matches :func:`make_world`'s tuned test settings
    (~0.3 m sampling) so scan matching stays in the ICP basin.
    """
    radius = speed * n_frames / n_loops / (2 * np.pi)
    extent = radius + 16.0  # loop + scan range margin
    ground_points = int(ground_density * (2 * extent) ** 2)  # pts per m^2
    # boxes scattered in an annulus around the loop path so every frame
    # sees vertical structure (pure ground is yaw-unobservable)
    n_boxes = max(8, int(radius * 1.5))
    surf = [
        np.stack(
            [
                rng.uniform(-extent, extent, size=ground_points),
                rng.uniform(-extent, extent, size=ground_points),
                np.zeros(ground_points),
            ],
            axis=1,
        )
    ]
    for k in range(n_boxes):
        a = 2 * np.pi * k / n_boxes + rng.uniform(-0.2, 0.2)
        rr = radius + rng.uniform(-8.0, 8.0)
        center = [rr * np.cos(a), rr * np.sin(a), rng.uniform(1.0, 4.0)]
        size = rng.uniform(1.0, 8.0, size=3)
        surf.append(_box_surface(rng, center, size, density))
    surface_points = np.concatenate(surf, axis=0).astype(np.float32)

    poses = np.zeros((n_frames, 4, 4))
    stamps = np.arange(n_frames) * dt
    for t in range(n_frames):
        a = 2 * np.pi * n_loops * t / n_frames
        c, s = np.cos(a + np.pi / 2), np.sin(a + np.pi / 2)  # tangent heading
        poses[t] = np.eye(4)
        poses[t, :3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        poses[t, :3, 3] = [
            radius * np.cos(a),
            radius * np.sin(a),
            1.5 + z_amplitude * np.sin(2 * a),
        ]
    return SyntheticWorld(
        surface_points=surface_points, poses=poses, stamps=stamps
    )


def dump_kitti(
    world: SyntheticWorld,
    root: str,
    sequence: str = "00",
    rng: np.random.Generator | None = None,
    max_range: float = 13.0,
    max_points: int = 8192,
) -> str:
    """Write a synthetic world as a KITTI odometry sequence directory.

    Produces ``root/sequences/<seq>/velodyne/NNNNNN.bin`` (float32 xyzi
    rows — intensity synthesized as 1/range, a crude lambertian),
    ``times.txt``, and ``root/poses/<seq>.txt``, the exact layout
    :func:`direct_lidar_odometry_tpu.io.kitti.load_sequence` (and the
    native C++ feeder) reads — so the full CLI ``--kitti`` path is
    testable without the (zero-egress) real dataset. Returns ``root``.
    """
    import os

    rng = rng or np.random.default_rng(0)
    vdir = os.path.join(root, "sequences", sequence, "velodyne")
    os.makedirs(vdir, exist_ok=True)
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)
    n = len(world.poses)
    for t in range(n):
        xyz = render_scan(world, t, rng, max_range=max_range,
                          max_points=max_points)
        r = np.maximum(np.linalg.norm(xyz, axis=1), 1.0)
        xyzi = np.concatenate([xyz, (1.0 / r)[:, None]], axis=1)
        xyzi.astype(np.float32).tofile(
            os.path.join(vdir, f"{t:06d}.bin")
        )
    np.savetxt(os.path.join(root, "sequences", sequence, "times.txt"),
               world.stamps, fmt="%.6f")
    np.savetxt(os.path.join(root, "poses", f"{sequence}.txt"),
               world.poses[:, :3, :4].reshape(n, 12), fmt="%.9f")
    return root


def render_scan(
    world: SyntheticWorld,
    frame: int,
    rng: np.random.Generator,
    max_range: float = 40.0,
    min_range: float = 0.5,
    max_points: int = 8192,
    noise: float = 0.01,
) -> np.ndarray:
    """Points visible from pose[frame], in the sensor frame. [<=max_points, 3]."""
    T = world.poses[frame]
    rel = world.surface_points - T[:3, 3]
    r = np.linalg.norm(rel, axis=1)
    vis = (r < max_range) & (r > min_range)
    pts_w = world.surface_points[vis]
    if len(pts_w) > max_points:
        sel = rng.choice(len(pts_w), size=max_points, replace=False)
        pts_w = pts_w[sel]
    # world -> sensor
    pts_s = (pts_w - T[:3, 3]) @ T[:3, :3]
    pts_s = pts_s + rng.normal(scale=noise, size=pts_s.shape)
    return pts_s.astype(np.float32)


def make_imu_between(
    world: SyntheticWorld, frame: int, rate_hz: float, rng, gyro_noise=0.002,
    gyro_bias=np.zeros(3),
):
    """Synthesize gyro samples between frame-1 and frame from ground truth.

    Returns [S, 7] rows of (stamp, wx, wy, wz, ax, ay, az) in the body frame,
    mirroring the reference's ImuMeas layout (odom.h:151-164).
    """
    if frame == 0:
        return np.zeros((0, 7))
    t0, t1 = world.stamps[frame - 1], world.stamps[frame]
    n = max(int((t1 - t0) * rate_hz), 2)
    ts = np.linspace(t0, t1, n)
    R0 = world.poses[frame - 1][:3, :3]
    R1 = world.poses[frame][:3, :3]
    # constant body angular velocity over the interval: w = log(R0^T R1)/dt
    dR = R0.T @ R1
    cos_t = np.clip((np.trace(dR) - 1) / 2, -1, 1)
    theta = np.arccos(cos_t)
    if theta < 1e-9:
        w = np.zeros(3)
    else:
        w = (
            theta
            / (2 * np.sin(theta))
            * np.array([dR[2, 1] - dR[1, 2], dR[0, 2] - dR[2, 0], dR[1, 0] - dR[0, 1]])
        ) / (t1 - t0)
    out = np.zeros((n, 7))
    out[:, 0] = ts
    out[:, 1:4] = w + gyro_bias + rng.normal(scale=gyro_noise, size=(n, 3))
    out[:, 4:7] = np.array([0, 0, 9.81]) @ np.eye(3)  # crude static accel
    return out
