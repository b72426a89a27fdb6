import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from direct_lidar_odometry_tpu.core import se3


def random_rotvecs(rng, n=64, scale=np.pi * 0.9):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    mags = rng.uniform(0, scale, size=(n, 1))
    return (v * mags).astype(np.float32)


def test_so3_exp_matches_scipy(rng):
    w = random_rotvecs(rng)
    r = np.asarray(se3.so3_exp(jnp.asarray(w)))
    r_ref = Rotation.from_rotvec(w.astype(np.float64)).as_matrix()
    np.testing.assert_allclose(r, r_ref, atol=1e-4)


def test_so3_exp_small_angle(rng):
    w = rng.normal(size=(16, 3)).astype(np.float32) * 1e-6
    r = np.asarray(se3.so3_exp(jnp.asarray(w)))
    r_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(r, r_ref, atol=1e-6)


def test_so3_log_roundtrip(rng):
    w = random_rotvecs(rng)
    r = se3.so3_exp(jnp.asarray(w))
    w2 = np.asarray(se3.so3_log(r))
    np.testing.assert_allclose(w2, w, atol=1e-4)


def test_quat_rotmat_roundtrip(rng):
    w = random_rotvecs(rng)
    r_ref = Rotation.from_rotvec(w).as_matrix().astype(np.float32)
    q = se3.rotmat_to_quat(jnp.asarray(r_ref))
    r2 = np.asarray(se3.quat_to_rotmat(q))
    np.testing.assert_allclose(r2, r_ref, atol=1e-5)


def test_quat_mul_matches_scipy(rng):
    q1 = Rotation.random(32, random_state=1)
    q2 = Rotation.random(32, random_state=2)
    # scipy uses xyzw; ours is wxyz
    def to_wxyz(r):
        q = r.as_quat()
        return np.concatenate([q[:, 3:4], q[:, :3]], axis=-1).astype(np.float32)

    q12 = np.asarray(se3.quat_mul(jnp.asarray(to_wxyz(q1)), jnp.asarray(to_wxyz(q2))))
    ref = to_wxyz(q1 * q2)
    # sign ambiguity
    sign = np.sign(np.sum(q12 * ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(q12 * sign, ref, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    w = random_rotvecs(rng, n=8)
    r = se3.so3_exp(jnp.asarray(w))
    q = se3.rotmat_to_quat(r)
    v = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    out_q = np.asarray(se3.quat_rotate(q, v))
    out_m = np.asarray((r @ v[..., None])[..., 0])
    np.testing.assert_allclose(out_q, out_m, atol=1e-5)


def test_se3_inverse(rng):
    w = random_rotvecs(rng, n=8)
    r = se3.so3_exp(jnp.asarray(w))
    t = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32) * 10)
    T = se3.make_se3(r, t)
    eye = np.asarray(T @ se3.se3_inverse(T))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)


def test_transform_points(rng):
    T = se3.make_se3(se3.so3_exp(jnp.asarray([0.1, 0.2, -0.3])), jnp.asarray([1.0, -2.0, 3.0]))
    pts = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    out = np.asarray(se3.transform_points(T, pts))
    h = np.concatenate([np.asarray(pts), np.ones((100, 1))], axis=-1)
    ref = (np.asarray(T) @ h.T).T[:, :3]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_quat_from_two_vectors(rng):
    a = rng.normal(size=(32, 3)).astype(np.float32)
    b = rng.normal(size=(32, 3)).astype(np.float32)
    q = se3.quat_from_two_vectors(jnp.asarray(a), jnp.asarray(b))
    rotated = np.array(se3.quat_rotate(q, jnp.asarray(a)))
    rotated = rotated / np.linalg.norm(rotated, axis=-1, keepdims=True)
    b_n = b / np.linalg.norm(b, axis=-1, keepdims=True)
    np.testing.assert_allclose(rotated, b_n, atol=1e-5)


def test_quat_angle_deg():
    q1 = se3.rotmat_to_quat(se3.so3_exp(jnp.asarray([0.0, 0.0, 0.5])))
    q2 = se3.rotmat_to_quat(se3.so3_exp(jnp.asarray([0.0, 0.0, 0.0])))
    angle = float(se3.quat_angle_deg(q1, q2))
    np.testing.assert_allclose(angle, np.degrees(0.5), atol=1e-3)
