"""Validate the device-side hull surrogates against exact scipy hulls.

The reference uses QHull convex/concave hulls of keyframe positions
(odom.cc:1017-1090) to pick boundary keyframes for the submap; our
surrogates (direction-extremal membership / empty-half-space test) must
recover the hull vertices that matter.
"""

import numpy as np
import jax.numpy as jnp
from scipy.spatial import ConvexHull

from direct_lidar_odometry_tpu.odometry import hulls


def trajectory_like_points(rng, n=60):
    """A wandering-trajectory point set (what keyframe positions look like)."""
    steps = rng.normal(scale=1.0, size=(n, 3))
    steps[:, 2] *= 0.05  # mostly planar like a ground robot
    return np.cumsum(steps, axis=0).astype(np.float32)


def test_convex_surrogate_recovers_hull_vertices(rng):
    pts = trajectory_like_points(rng)
    n = len(pts)
    directions = jnp.asarray(hulls.fibonacci_directions(256))
    members = np.asarray(
        hulls.convex_membership(jnp.asarray(pts), jnp.ones(n, bool), directions)
    )
    hull = ConvexHull(pts.astype(np.float64))
    true_vertices = set(hull.vertices.tolist())
    got = set(np.nonzero(members)[0].tolist())
    # every surrogate member must be a true hull vertex (no false positives)
    assert got <= true_vertices
    # functional criterion: the members must preserve the trajectory's
    # spatial FOOTPRINT (that is what hull keyframes buy the submap —
    # near-coplanar face vertices have needle-thin support cones no
    # direction scan finds, and they add no footprint). 2D hull "volume"
    # is the area.
    sel = pts[sorted(got)]
    area_full = ConvexHull(pts[:, :2].astype(np.float64)).volume
    area_sel = ConvexHull(sel[:, :2].astype(np.float64)).volume
    assert area_sel / area_full > 0.95, area_sel / area_full
    # the single farthest-from-centroid vertex (always direction-dominant)
    # must be found; its near-collinear trajectory neighbors may not be —
    # they have needle-thin support cones and add no footprint
    centroid = pts.mean(axis=0)
    d = np.linalg.norm(pts - centroid, axis=1)
    assert int(np.argmax(d)) in got


def test_convex_surrogate_gates_small_sets(rng):
    pts = trajectory_like_points(rng, n=8)
    directions = jnp.asarray(hulls.fibonacci_directions(64))
    mask = np.zeros(8, bool)
    mask[:3] = True  # fewer than 4 keyframes -> no members (odom.cc:1019)
    members = np.asarray(
        hulls.convex_membership(jnp.asarray(pts), jnp.asarray(mask), directions)
    )
    assert not members.any()


def test_concave_surrogate_finds_boundary(rng):
    # a ring of points: every point is on the alpha-shape boundary for
    # alpha ~ ring spacing; interior fill points are not
    n_ring = 32
    theta = np.linspace(0, 2 * np.pi, n_ring, endpoint=False)
    ring = np.stack([10 * np.cos(theta), 10 * np.sin(theta), np.zeros(n_ring)], axis=1)
    inner = rng.uniform(-4, 4, size=(16, 3)) * np.array([1, 1, 0])
    pts = np.concatenate([ring, inner]).astype(np.float32)
    n = len(pts)
    directions = jnp.asarray(hulls.fibonacci_directions(128))
    members = np.asarray(
        hulls.concave_membership(
            jnp.asarray(pts), jnp.ones(n, bool), directions, jnp.float32(2.5)
        )
    )
    # all ring points are boundary
    assert members[:n_ring].all()


def test_concave_surrogate_gates_small_sets(rng):
    pts = trajectory_like_points(rng, n=10)
    directions = jnp.asarray(hulls.fibonacci_directions(64))
    mask = np.zeros(10, bool)
    mask[:4] = True  # fewer than 5 -> no members (odom.cc:1059)
    members = np.asarray(
        hulls.concave_membership(jnp.asarray(pts), jnp.asarray(mask), directions,
                                 jnp.float32(2.0))
    )
    assert not members.any()
