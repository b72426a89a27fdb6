"""Fused GICP linearization kernel (ops/pallas_gicp.py) vs the XLA path.

The fused kernel must reproduce the unfused linearization (H, b, error,
n_corr, frozen payload) bit-closely: same correspondences (targets are
well-separated so the centered-MXU distance math cannot flip a nearest
neighbor), same Mahalanobis, same reductions up to f32 summation order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from direct_lidar_odometry_tpu.config import load_config
from direct_lidar_odometry_tpu.core import se3
from direct_lidar_odometry_tpu.ops import morton
from direct_lidar_odometry_tpu.registration import gicp
from direct_lidar_odometry_tpu.registration.covariance import PLANE_EPS


def _make_problem(rng, ns=512, nt=1024, n_invalid_t=60, n_invalid_q=40):
    # targets on a jittered grid: min separation ~0.4 m >> f32 noise, so
    # nearest-neighbor choices are unambiguous
    side = int(np.ceil(np.sqrt(nt)))
    gx, gy = np.meshgrid(np.arange(side), np.arange(side))
    base = np.stack([gx.ravel(), gy.ravel()], axis=1)[:nt] * 1.0
    tgt = np.concatenate(
        [base + rng.uniform(-0.3, 0.3, base.shape),
         rng.uniform(0, 2.0, (nt, 1))], axis=1
    ).astype(np.float32)
    tmask = np.ones((nt,), bool)
    tmask[rng.choice(nt, n_invalid_t, replace=False)] = False
    tnorm = rng.normal(size=(nt, 3)).astype(np.float32)
    tnorm /= np.linalg.norm(tnorm, axis=1, keepdims=True)
    tnval = rng.random(nt) > 0.1

    qi = rng.choice(nt, ns)
    src = tgt[qi] + rng.normal(0, 0.05, (ns, 3)).astype(np.float32)
    smask = np.ones((ns,), bool)
    smask[rng.choice(ns, n_invalid_q, replace=False)] = False
    snorm = rng.normal(size=(ns, 3)).astype(np.float32)
    snorm /= np.linalg.norm(snorm, axis=1, keepdims=True)
    snval = rng.random(ns) > 0.1

    # one permutation applied to every per-point attribute (sort_cloud and
    # sort_order may tie-break duplicate Morton codes differently)
    order = np.asarray(morton.sort_order(jnp.asarray(tgt), jnp.asarray(tmask)))
    tp = jnp.asarray(tgt[order])
    tm = jnp.asarray(tmask[order])
    tn = jnp.asarray(tnorm[order])
    tv = jnp.asarray(tnval[order])
    lo, hi = morton.chunk_aabbs(tp, tm, 512)

    target = gicp.GicpTarget(points=tp, mask=tm, normals=tn,
                             normals_valid=tv, grid=None,
                             chunk_lo=lo, chunk_hi=hi)
    source = gicp.GicpSource(points=jnp.asarray(src), mask=jnp.asarray(smask),
                             normals=jnp.asarray(snorm),
                             normals_valid=jnp.asarray(snval))
    return source, target


@pytest.mark.parametrize("seed", [0, 3])
def test_fused_matches_unfused_linearize(seed):
    rng = np.random.default_rng(seed)
    source, target = _make_problem(rng)
    cfg = load_config().gicp.s2m  # radius 0.5
    # rotation kept small: the target grid spans ~32 m from the origin, so
    # 0.03 rad would displace far points by ~1 m — past the 0.5 m gate —
    # leaving too few correspondences for the comparison to be meaningful
    x0 = se3.se3_exp(jnp.asarray([0.004, -0.002, 0.003, 0.05, -0.04, 0.02],
                                 jnp.float32))

    lin_f = gicp._linearize(x0, source, target, cfg, 32, "pallas_fused")
    lin_u = gicp._linearize(x0, source, target, cfg, 32, "pallas")

    assert int(lin_f.n_corr) == int(lin_u.n_corr) > 200
    np.testing.assert_array_equal(np.asarray(lin_f.weight),
                                  np.asarray(lin_u.weight))
    np.testing.assert_array_equal(np.asarray(lin_f.corr),
                                  np.asarray(lin_u.corr))
    # frozen payload: the selected target point/normal for every matched query
    w = np.asarray(lin_f.weight) > 0.5
    np.testing.assert_allclose(np.asarray(lin_f.mu_b)[w],
                               np.asarray(lin_u.mu_b)[w], rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lin_f.n_b)[w],
                               np.asarray(lin_u.n_b)[w], rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(lin_f.h), np.asarray(lin_u.h),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(lin_f.b), np.asarray(lin_u.b),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(float(lin_f.error), float(lin_u.error),
                               rtol=2e-4)


def test_seeded_linearize_matches_cold():
    """Warm-started branch-and-bound must return exactly the cold result:
    the seed only tightens the initial bound. Seed with correspondences
    from a DIFFERENT transform so the seeded distances are wrong-but-valid
    upper bounds, the adversarial case."""
    rng = np.random.default_rng(5)
    source, target = _make_problem(rng)
    cfg = load_config().gicp.s2m
    x_a = se3.se3_exp(jnp.asarray([0.002, -0.001, 0.002, 0.03, -0.02, 0.01],
                                  jnp.float32))
    x_b = se3.se3_exp(jnp.asarray([-0.003, 0.002, 0.001, -0.04, 0.05, 0.02],
                                  jnp.float32))
    lin_a = gicp._linearize(x_a, source, target, cfg, 32, "pallas_fused")
    cold = gicp._linearize(x_b, source, target, cfg, 32, "pallas_fused")
    seeded = gicp._linearize(x_b, source, target, cfg, 32, "pallas_fused",
                             seed_corr=lin_a.corr)
    np.testing.assert_array_equal(np.asarray(seeded.corr),
                                  np.asarray(cold.corr))
    np.testing.assert_array_equal(np.asarray(seeded.weight),
                                  np.asarray(cold.weight))
    np.testing.assert_allclose(np.asarray(seeded.h), np.asarray(cold.h),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(float(seeded.error), float(cold.error),
                               rtol=1e-5)
    # all -1 seeds == cold exactly (the align loop's first iteration)
    none_seeded = gicp._linearize(
        x_b, source, target, cfg, 32, "pallas_fused",
        seed_corr=jnp.full((source.points.shape[0],), -1, jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(none_seeded.corr),
                                  np.asarray(cold.corr))


def test_compute_error_matches_direct():
    """_compute_error's columnwise Mahalanobis == explicit 3x3 math."""
    rng = np.random.default_rng(1)
    source, target = _make_problem(rng)
    cfg = load_config().gicp.s2m
    x0 = jnp.eye(4, dtype=jnp.float32)
    lin = gicp._linearize(x0, source, target, cfg, 32, "pallas_fused")

    xi = se3.se3_exp(jnp.asarray([0.01, 0.0, -0.01, 0.02, 0.01, 0.0],
                                 jnp.float32))
    got = float(gicp._compute_error(xi, source, lin))

    # oracle: explicit per-point 3x3 inverse
    p_t = np.asarray(se3.transform_points(xi, source.points), np.float64)
    mu_b = np.asarray(lin.mu_b, np.float64)
    n_b = np.asarray(lin.n_b, np.float64)
    m0 = np.asarray(lin.m0, np.float64)
    w = np.asarray(lin.weight, np.float64)
    want = 0.0
    a = 1.0 - PLANE_EPS
    for i in range(len(w)):
        if w[i] < 0.5:
            continue
        A = 2 * np.eye(3) - a * (np.outer(n_b[i], n_b[i]) + np.outer(m0[i], m0[i]))
        e = mu_b[i] - p_t[i]
        want += e @ np.linalg.inv(A) @ e
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_fused_align_recovers_transform():
    """Full align() on the fused path recovers a known SE(3) perturbation."""
    rng = np.random.default_rng(2)
    source, target = _make_problem(rng, n_invalid_t=0, n_invalid_q=0)
    # make source an exactly-transformed copy of (valid) target points
    true_tau = jnp.asarray([0.02, -0.015, 0.01, 0.1, -0.08, 0.05], jnp.float32)
    t_true = se3.se3_exp(true_tau)
    ns = source.points.shape[0]
    pick = np.asarray(target.points)[: ns]
    src_pts = se3.transform_points(se3.se3_inverse(t_true), jnp.asarray(pick))
    source = gicp.GicpSource(
        points=src_pts, mask=jnp.ones((ns,), bool),
        normals=target.normals[:ns], normals_valid=jnp.ones((ns,), bool),
    )
    cfg = load_config().gicp.s2s
    res = gicp.align(source, target, jnp.eye(4, dtype=jnp.float32), cfg,
                     cap=32, backend="pallas")
    assert bool(res.converged)
    err = np.asarray(res.transform) - np.asarray(t_true)
    assert np.abs(err).max() < 5e-3, err
