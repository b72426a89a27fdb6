import numpy as np

from direct_lidar_odometry_tpu.io import kitti, ply, trajectory


def test_velodyne_bin_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 4)).astype(np.float32)
    p = tmp_path / "000000.bin"
    pts.tofile(p)
    out = kitti.read_velodyne_bin(str(p))
    np.testing.assert_array_equal(out, pts)


def test_kitti_sequence_dir(tmp_path, rng):
    vdir = tmp_path / "sequences" / "07" / "velodyne"
    vdir.mkdir(parents=True)
    for i in range(3):
        rng.normal(size=(50, 4)).astype(np.float32).tofile(vdir / f"{i:06d}.bin")
    poses = np.tile(np.eye(4), (3, 1, 1))
    poses[:, 0, 3] = [0, 1, 2]
    pdir = tmp_path / "poses"
    pdir.mkdir()
    trajectory.write_kitti(str(pdir / "07.txt"), poses)
    seq = kitti.load_sequence(str(tmp_path), "07")
    assert len(seq) == 3
    assert seq.scan(1).shape == (50, 3)
    np.testing.assert_allclose(seq.poses, poses, atol=1e-6)


def test_kitti_calib(tmp_path):
    p = tmp_path / "calib.txt"
    tr = np.arange(12, dtype=float)
    p.write_text("P0: " + " ".join(map(str, range(12))) + "\n"
                 "Tr: " + " ".join(map(str, tr)) + "\n")
    calib = kitti.read_calib(str(p))
    np.testing.assert_allclose(calib["Tr"], tr.reshape(3, 4))


def test_trajectory_kitti_roundtrip(tmp_path, rng):
    from scipy.spatial.transform import Rotation

    poses = np.tile(np.eye(4), (5, 1, 1))
    poses[:, :3, :3] = Rotation.random(5, random_state=0).as_matrix()
    poses[:, :3, 3] = rng.normal(size=(5, 3)) * 10
    p = tmp_path / "traj.txt"
    trajectory.write_kitti(str(p), poses)
    out = trajectory.read_kitti(str(p))
    np.testing.assert_allclose(out, poses, atol=1e-7)


def test_tum_writer(tmp_path, rng):
    poses = np.tile(np.eye(4), (3, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(3, 3))
    p = tmp_path / "tum.txt"
    trajectory.write_tum(str(p), np.array([0.0, 0.1, 0.2]), poses)
    rows = np.loadtxt(p)
    assert rows.shape == (3, 8)
    np.testing.assert_allclose(rows[:, 1:4], poses[:, :3, 3], atol=1e-5)


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    p = tmp_path / "m.ply"
    ply.write_ply(str(p), pts)
    out = ply.read_ply(str(p))
    np.testing.assert_array_equal(out, pts)


def test_quat_sign_continuity_full_yaw():
    """360-degree yaw sweep: emitted quaternions must have no sign jumps
    (reference publishPose continuity check, odom.cc:334-346)."""
    from scipy.spatial.transform import Rotation

    angles = np.linspace(0.0, 2 * np.pi, 73)  # crosses the q/-q hemisphere
    rots = Rotation.from_euler("z", angles[:, None]).as_matrix()
    q = trajectory.continuous_quats(rots)
    dots = np.sum(q[1:] * q[:-1], axis=-1)
    assert np.all(dots >= 0.0), f"sign jump: min dot {dots.min()}"
    # each quat still encodes the same rotation
    back = Rotation.from_quat(q).as_matrix()
    assert np.allclose(back, rots, atol=1e-6)


def test_tum_writer_continuous(tmp_path):
    from scipy.spatial.transform import Rotation

    angles = np.linspace(0.0, 2 * np.pi, 37)
    poses = np.tile(np.eye(4), (len(angles), 1, 1))
    poses[:, :3, :3] = Rotation.from_euler("z", angles[:, None]).as_matrix()
    p = tmp_path / "t.txt"
    trajectory.write_tum(str(p), np.arange(len(angles), dtype=float), poses)
    rows = np.loadtxt(p)
    q = rows[:, 4:8]
    assert np.all(np.sum(q[1:] * q[:-1], axis=-1) >= 0.0)
