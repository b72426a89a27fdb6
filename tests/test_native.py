"""Native host runtime (cpp/libdlo_host.so) tests.

Builds the library on demand via make; skips if no toolchain.
"""

import numpy as np
import pytest

from direct_lidar_odometry_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (make -C cpp)"
)


def test_read_velodyne(tmp_path, rng):
    pts4 = rng.normal(scale=10, size=(5000, 4)).astype(np.float32)
    p = tmp_path / "scan.bin"
    pts4.tofile(p)
    out = native.read_velodyne(str(p))
    np.testing.assert_array_equal(out, pts4[:, :3])


def test_preprocess_matches_oracle(tmp_path, rng):
    pts = rng.normal(scale=10, size=(5000, 3)).astype(np.float32)
    pts[5] = np.nan
    pts[17] = [0.2, -0.3, 0.4]  # inside crop
    got = native.preprocess(pts, crop_size=1.0, res=0.5)
    valid = np.isfinite(pts).all(1) & ~np.all(np.abs(pts) <= 1.0, axis=1)
    vp = pts[valid]
    origin = vp.min(0)
    ids = np.floor((vp - origin) / 0.5).astype(np.int64)
    key = ids[:, 0] + (ids[:, 1] << 10) + (ids[:, 2] << 20)
    want = np.array([vp[key == u].mean(0) for u in np.unique(key)], np.float32)
    assert len(got) == len(want)
    g = got[np.lexsort(got.T)]
    w = want[np.lexsort(want.T)]
    np.testing.assert_allclose(g, w, atol=1e-4)


def test_preprocess_overflow_uniform(rng):
    pts = rng.uniform(0, 100, size=(8000, 3)).astype(np.float32)
    got = native.preprocess(pts, crop_size=0.0, res=0.5, out_cap=512)
    assert len(got) == 512
    # uniform truncation spans the extent
    assert np.all(got.min(axis=0) < 15) and np.all(got.max(axis=0) > 85)


def test_feeder_streams_in_order(tmp_path, rng):
    files = []
    for i in range(5):
        p = tmp_path / f"{i:06d}.bin"
        rng.normal(scale=10, size=(2000, 4)).astype(np.float32).tofile(p)
        files.append(str(p))
    feeder = native.ScanFeeder(files, res=0.25, depth=2)
    got = list(feeder)
    feeder.close()
    assert [i for i, _ in got] == list(range(5))
    assert all(1500 < len(s) <= 2000 for _, s in got)


def test_feeder_missing_file(tmp_path, rng):
    p = tmp_path / "ok.bin"
    rng.normal(size=(100, 4)).astype(np.float32).tofile(p)
    feeder = native.ScanFeeder(
        [str(p), str(tmp_path / "missing.bin")], crop_size=0.0, res=0.0
    )
    it = iter(feeder)
    i, s = next(it)
    assert i == 0 and len(s) == 100
    with pytest.raises(IOError):
        next(it)
    feeder.close()


def test_preprocess_morton_matches_numpy_and_device(rng):
    """The C++ host preprocessor, the numpy fallback, and the device op
    (ops/voxel.voxel_downsample_morton) must produce the SAME voxel
    centroids in the SAME (Morton) order, including the Bresenham
    overflow subsample."""
    import jax.numpy as jnp

    from direct_lidar_odometry_tpu.core.cloud import PointCloud
    from direct_lidar_odometry_tpu.io import hostprep
    from direct_lidar_odometry_tpu.ops import preprocess as prep, voxel

    pts = rng.uniform(-30, 30, (20000, 3)).astype(np.float32)
    pts[100:110] = np.nan
    pts[200:220] *= 0.01  # inside the crop box

    for cap in (32768, 2048):  # no-overflow and overflow
        a = native.preprocess_morton(pts, 1.0, 0.25, cap)
        b = hostprep._preprocess_morton_numpy(pts, 1.0, 0.25, cap)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-4)
        c = prep.preprocess(
            PointCloud(points=jnp.asarray(pts), mask=jnp.ones(len(pts), bool)),
            1.0,
        )
        d = voxel.voxel_downsample_morton(c, 0.25, out_capacity=cap)
        dd = np.asarray(d.points)[np.asarray(d.mask)]
        assert dd.shape == a.shape
        np.testing.assert_allclose(dd, a, atol=1e-4)
