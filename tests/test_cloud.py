import numpy as np
import jax.numpy as jnp

from direct_lidar_odometry_tpu.core import cloud as cl


def test_from_numpy_pads(rng):
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    c = cl.from_numpy(pts, capacity=16)
    assert c.capacity == 16
    assert int(c.count()) == 10
    np.testing.assert_allclose(cl.to_numpy(c), pts)
    assert np.all(np.asarray(c.points)[10:] == cl.PAD_VALUE)


def test_from_numpy_truncates(rng):
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    c = cl.from_numpy(pts, capacity=8)
    assert int(c.count()) == 8
    np.testing.assert_allclose(cl.to_numpy(c), pts[:8])


def test_compact(rng):
    pts = rng.normal(size=(12, 3)).astype(np.float32)
    mask = np.zeros(12, dtype=bool)
    mask[[1, 3, 7, 8]] = True
    c = cl.PointCloud(points=jnp.asarray(pts), mask=jnp.asarray(mask))
    cc = cl.compact(c)
    assert int(cc.count()) == 4
    np.testing.assert_allclose(cl.to_numpy(cc), pts[[1, 3, 7, 8]])
    assert bool(jnp.all(cc.mask[:4])) and not bool(jnp.any(cc.mask[4:]))
