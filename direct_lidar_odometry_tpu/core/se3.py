"""SO(3)/SE(3) primitives, batch-friendly and jit-safe.

Functional equivalents of the reference's Sophus-derived helpers
(``include/nano_gicp/gicp/so3.hpp:50-118``: ``skew``/``skewd``/``so3_exp``)
plus the quaternion kinematics used by the odometry node
(``src/dlo/odom.cc:859-919`` IMU integration, ``odom.cc:926-964`` pose
propagation). All functions broadcast over leading batch dimensions and use
``jnp.where`` small-angle branches instead of data-dependent control flow so
they trace cleanly under ``jit``/``vmap``.

Quaternions are ``[w, x, y, z]`` arrays (Hamilton convention, matching the
reference's use of Eigen accessors ``q.w(), q.x(), ...``).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Cross-product matrix. Reference ``so3.hpp`` skew/skewd.

    v: [..., 3] -> [..., 3, 3]
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map so(3) -> SO(3) via Rodrigues, small-angle safe.

    Matches reference ``so3.hpp:84-118`` (quaternion form of exp); here we
    produce the rotation matrix directly:
    ``R = I + A [w]x + B [w]x^2`` with ``A = sin(t)/t``, ``B = (1-cos t)/t^2``.

    w: [..., 3] -> [..., 3, 3]
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)  # guarded; exact branch below
    small = theta2 < 1e-8
    # Taylor: A ~ 1 - t^2/6, B ~ 1/2 - t^2/24
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    k = skew(w)
    kk = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * kk


def so3_log(r: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map SO(3) -> so(3) (rotation vector). [..., 3, 3] -> [..., 3]."""
    trace = r[..., 0, 0] + r[..., 1, 1] + r[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # axis from the skew-symmetric part; near theta=0 use first-order terms,
    # near theta=pi fall back to the diagonal form.
    v = jnp.stack(
        [
            r[..., 2, 1] - r[..., 1, 2],
            r[..., 0, 2] - r[..., 2, 0],
            r[..., 1, 0] - r[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    small = theta < 1e-4
    near_pi = theta > jnp.pi - 1e-3
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / jnp.where(sin_t == 0, 1.0, 2.0 * sin_t))
    w_generic = v * scale[..., None]
    # theta ~ pi: R ~ I + 2 [n]x^2 => n^2_i = (R_ii + 1)/2
    diag = jnp.stack([r[..., 0, 0], r[..., 1, 1], r[..., 2, 2]], axis=-1)
    n_abs = jnp.sqrt(jnp.maximum((diag + 1.0) * 0.5, 0.0))
    # fix signs using off-diagonal sums: n_i n_j = (R_ij + R_ji)/4 / ...
    sx = jnp.ones_like(n_abs[..., 0])
    sy = jnp.where(r[..., 0, 1] + r[..., 1, 0] < 0, -1.0, 1.0)
    sz = jnp.where(r[..., 0, 2] + r[..., 2, 0] < 0, -1.0, 1.0)
    n_pi = n_abs * jnp.stack([sx, sy, sz], axis=-1)
    n_pi = n_pi / jnp.maximum(jnp.linalg.norm(n_pi, axis=-1, keepdims=True), _EPS)
    w_pi = n_pi * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


# ---------------------------------------------------------------------------
# Quaternions [w, x, y, z]
# ---------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product. [..., 4] x [..., 4] -> [..., 4]."""
    w1, x1, y1, z1 = (q1[..., i] for i in range(4))
    w2, x2, y2, z2 = (q2[..., i] for i in range(4))
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] -> [..., 3, 3]; q need not be exactly normalized."""
    q = quat_normalize(q)
    w, x, y, z = (q[..., i] for i in range(4))
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(r: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] (w >= 0). Branchless Shepperd via candidate select."""
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate 4*|q_i|^2 values
    qw2 = 1.0 + tr
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22
    # candidates (unnormalized), one per dominant component
    cw = jnp.stack([qw2, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cx = jnp.stack([m21 - m12, qx2, m01 + m10, m02 + m20], axis=-1)
    cy = jnp.stack([m02 - m20, m01 + m10, qy2, m12 + m21], axis=-1)
    cz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, qz2], axis=-1)
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    idx = jnp.argmax(mags, axis=-1)
    cand = jnp.stack([cw, cx, cy, cz], axis=-2)  # [..., 4cand, 4comp]
    q = jnp.take_along_axis(cand, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors by quaternion: [..., 4], [..., 3] -> [..., 3]."""
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def quat_angle_deg(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle between two quaternions in degrees.

    Matches the keyframe rotation test at reference ``odom.cc:1136-1140``:
    ``theta = 2 atan2(|vec(dq)|, w(dq))``.
    """
    dq = quat_mul(q1, quat_conj(q2))
    vec_norm = jnp.linalg.norm(dq[..., 1:], axis=-1)
    theta = 2.0 * jnp.arctan2(vec_norm, dq[..., 0])
    # wrap to [0, pi] equivalent magnitude
    theta = jnp.where(theta > jnp.pi, 2 * jnp.pi - theta, theta)
    return jnp.abs(theta) * (180.0 / jnp.pi)


def quat_from_two_vectors(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Quaternion rotating unit-ish vector a onto b (Eigen FromTwoVectors).

    Used by gravity alignment, reference ``odom.cc:556-560``.
    """
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), _EPS)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), _EPS)
    c = jnp.cross(a, b)
    d = jnp.sum(a * b, axis=-1)
    w = 1.0 + d
    q = jnp.concatenate([w[..., None], c], axis=-1)
    # antiparallel fallback: rotate pi about any axis orthogonal to a
    ortho = jnp.cross(a, jnp.array([1.0, 0.0, 0.0], dtype=a.dtype))
    ortho = jnp.where(
        jnp.linalg.norm(ortho, axis=-1, keepdims=True) < 1e-6,
        jnp.cross(a, jnp.array([0.0, 1.0, 0.0], dtype=a.dtype)),
        ortho,
    )
    q_pi = jnp.concatenate([jnp.zeros_like(w[..., None]), ortho], axis=-1)
    q = jnp.where((w < 1e-6)[..., None], q_pi, q)
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SE(3) as 4x4 homogeneous matrices
# ---------------------------------------------------------------------------

def make_se3(r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3], [..., 3] -> [..., 4, 4]."""
    batch = jnp.broadcast_shapes(r.shape[:-2], t.shape[:-1])
    r = jnp.broadcast_to(r, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([r, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=r.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def se3_inverse(t: jnp.ndarray) -> jnp.ndarray:
    r = t[..., :3, :3]
    p = t[..., :3, 3]
    r_t = jnp.swapaxes(r, -1, -2)
    return make_se3(r_t, -(r_t @ p[..., None])[..., 0])


def se3_rotation(t: jnp.ndarray) -> jnp.ndarray:
    return t[..., :3, :3]


def se3_translation(t: jnp.ndarray) -> jnp.ndarray:
    return t[..., :3, 3]


def transform_points(t: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply SE(3) to points: [4, 4], [..., 3] -> [..., 3].

    Functional ``pcl::transformPointCloud`` (reference ``odom.cc:971-974``).
    """
    return pts @ t[:3, :3].T + t[:3, 3]


def se3_exp(tau: jnp.ndarray) -> jnp.ndarray:
    """Twist [rot(3), trans(3)] -> 4x4, matching the reference's update
    parameterization ``delta = (so3_exp(d[0:3]), d[3:6])``
    (``lsq_registration_impl.hpp:150-153, 175-178``) — note the translation
    part is applied directly, NOT via the SE(3) V-matrix."""
    r = so3_exp(tau[..., :3])
    return make_se3(r, tau[..., 3:6])
