import numpy as np
import jax.numpy as jnp
from scipy.spatial import cKDTree

from direct_lidar_odometry_tpu.core import cloud as cl
from direct_lidar_odometry_tpu.ops import eigh3, hashgrid, preprocess, voxel


# ---------------------------------------------------------------- preprocess

def test_nan_crop_mask(rng):
    pts = rng.uniform(-10, 10, size=(100, 3)).astype(np.float32)
    pts[3] = np.nan
    pts[7, 1] = np.inf
    pts[10] = [0.5, -0.5, 0.2]  # inside crop box
    c = cl.make_cloud(jnp.asarray(pts), jnp.ones(100, bool))
    out = preprocess.preprocess(cl.PointCloud(jnp.asarray(pts), jnp.ones(100, bool)), crop_size=1.0)
    mask = np.asarray(out.mask)
    assert not mask[3] and not mask[7] and not mask[10]
    inside = np.all(np.abs(pts) <= 1.0, axis=-1)
    finite = np.all(np.isfinite(pts), axis=-1)
    np.testing.assert_array_equal(mask, finite & ~inside)


def test_masked_median(rng):
    vals = rng.uniform(0, 100, size=(50,)).astype(np.float32)
    mask = rng.uniform(size=50) > 0.3
    med = float(preprocess.masked_median(jnp.asarray(vals), jnp.asarray(mask)))
    valid = np.sort(vals[mask])
    # reference takes nth_element at n/2 (upper median), odom.cc:1003-1004
    assert med == valid[len(valid) // 2]


# ---------------------------------------------------------------- voxel grid

def numpy_voxel_oracle(pts: np.ndarray, res: float) -> np.ndarray:
    """PCL-style centroid voxel grid over the cloud bbox (sorted by voxel id)."""
    origin = pts.min(axis=0)
    coords = np.floor((pts - origin) / res).astype(np.int64)
    ids = coords[:, 0] + 1024 * (coords[:, 1] + 1024 * coords[:, 2])
    out = []
    for uid in np.unique(ids):
        out.append(pts[ids == uid].mean(axis=0))
    return np.asarray(out, dtype=np.float32)


def test_voxel_downsample_matches_oracle(rng):
    pts = rng.uniform(-8, 8, size=(500, 3)).astype(np.float32)
    c = cl.from_numpy(pts, capacity=512)
    out = voxel.voxel_downsample(c, res=0.5)
    got = cl.to_numpy(out)
    want = numpy_voxel_oracle(pts, 0.5)
    assert got.shape == want.shape
    # output order is scrambled-id; compare as lexicographically sorted sets
    np.testing.assert_allclose(
        got[np.lexsort(got.T)], want[np.lexsort(want.T)], atol=1e-4
    )


def test_voxel_downsample_respects_mask(rng):
    pts = rng.uniform(-4, 4, size=(100, 3)).astype(np.float32)
    mask = np.zeros(100, bool)
    mask[:60] = True
    c = cl.PointCloud(jnp.asarray(pts), jnp.asarray(mask))
    out = voxel.voxel_downsample(c, res=0.5)
    want = numpy_voxel_oracle(pts[:60], 0.5)
    got = cl.to_numpy(out)
    np.testing.assert_allclose(
        got[np.lexsort(got.T)], want[np.lexsort(want.T)], atol=1e-4
    )


def test_voxel_output_compacted(rng):
    pts = rng.uniform(-4, 4, size=(128, 3)).astype(np.float32)
    out = voxel.voxel_downsample(cl.from_numpy(pts, 128), res=1.0)
    m = np.asarray(out.mask)
    n = m.sum()
    assert m[:n].all() and not m[n:].any()


# ---------------------------------------------------------------- hash grid

def test_cell_base_distinct_in_neighborhood():
    """All cells within a +-2 offset of any cell must have distinct keys
    (guards against the XOR-multiplicative sign-cancellation collision)."""
    import itertools
    deltas = np.array(list(itertools.product([-2, -1, 0, 1, 2], repeat=3)), np.int32)
    for anchor in [np.array([0, 0, 0]), np.array([-7, 13, -211]), np.array([1000, -1000, 5])]:
        bases = np.asarray(
            hashgrid._cell_base(jnp.asarray(anchor[None, :] + deltas))
        )
        assert len(np.unique(bases)) == len(deltas)
        keys2 = np.asarray(hashgrid._hash2_cells(jnp.asarray(anchor[None, :] + deltas)))
        assert len(np.unique(keys2)) == len(deltas)


def test_query_1nn_exact_within_radius(rng):
    tgt = rng.uniform(-10, 10, size=(800, 3)).astype(np.float32)
    qry = (tgt[:600] + rng.normal(scale=0.3, size=(600, 3))).astype(np.float32)
    radius = 1.0
    grid = hashgrid.build(jnp.asarray(tgt), jnp.ones(800, bool), radius, 2048)
    idx, d2, found = hashgrid.query_1nn(
        grid, jnp.asarray(qry), jnp.ones(600, bool), radius, cap=64
    )
    tree = cKDTree(tgt)
    dref, iref = tree.query(qry, k=1)
    found = np.asarray(found)
    idx = np.asarray(idx)
    d2 = np.asarray(d2)
    in_radius = dref < radius
    np.testing.assert_array_equal(found, in_radius)
    np.testing.assert_array_equal(idx[in_radius], iref[in_radius])
    np.testing.assert_allclose(np.sqrt(d2[in_radius]), dref[in_radius], rtol=1e-4)
    assert np.all(idx[~in_radius] == -1)


def test_query_1nn_respects_masks(rng):
    tgt = rng.uniform(-5, 5, size=(100, 3)).astype(np.float32)
    tmask = np.zeros(100, bool)
    tmask[:50] = True
    qry = tgt[:80].copy()
    qmask = np.ones(80, bool)
    qmask[70:] = False
    grid = hashgrid.build(jnp.asarray(tgt), jnp.asarray(tmask), 1.0, 512)
    idx, d2, found = hashgrid.query_1nn(grid, jnp.asarray(qry), jnp.asarray(qmask), 1.0, cap=64)
    idx, found = np.asarray(idx), np.asarray(found)
    assert not found[70:].any()
    # queries 0..49 coincide with valid targets -> d2 == 0, idx == self
    np.testing.assert_array_equal(idx[:50], np.arange(50))
    # masked-out targets can never be returned
    assert np.all(idx[found] < 50)


def test_query_knn_matches_kdtree(rng):
    pts = rng.uniform(-6, 6, size=(1024, 3)).astype(np.float32)
    k = 10
    # cell 2.0m: with 1024 pts in 12^3 box, k=10 NN are well within 2.0m
    grid = hashgrid.build(jnp.asarray(pts), jnp.ones(1024, bool), 2.0, 4096)
    kidx, kd2, kvalid = hashgrid.query_knn(
        grid, jnp.asarray(pts), jnp.ones(1024, bool), k=k, cap=96, chunk=512
    )
    tree = cKDTree(pts)
    dref, iref = tree.query(pts, k=k)
    kidx, kd2, kvalid = np.asarray(kidx), np.asarray(kd2), np.asarray(kvalid)
    # compare as sets per query (ties may reorder); the grid only guarantees
    # exactness when the true k-neighborhood is within one cell (2.0 m)
    eligible = 0
    ok = 0
    for i in range(1024):
        if dref[i, -1] <= 2.0 and kvalid[i].all():
            eligible += 1
            if set(kidx[i]) == set(iref[i]):
                ok += 1
    assert eligible / 1024 > 0.85  # the scenario keeps most queries eligible
    assert ok == eligible, f"{eligible - ok} eligible queries mismatched"
    np.testing.assert_allclose(
        np.sort(np.sqrt(kd2), axis=-1)[kvalid.all(-1) & (dref[:, -1] <= 2.0)],
        np.sort(dref, axis=-1)[kvalid.all(-1) & (dref[:, -1] <= 2.0)],
        rtol=1e-3,
    )


# ---------------------------------------------------------------- eigh3

def test_eigvalsh3_matches_numpy(rng):
    a = rng.normal(size=(256, 3, 3)).astype(np.float32)
    sym = a @ a.transpose(0, 2, 1)  # PSD
    got = np.asarray(eigh3.eigvalsh3(jnp.asarray(sym)))
    want = np.linalg.eigvalsh(sym)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_smallest_eigvec3(rng):
    a = rng.normal(size=(128, 3, 3)).astype(np.float32)
    sym = a @ a.transpose(0, 2, 1)
    v, evals = eigh3.smallest_eigvec3(jnp.asarray(sym))
    v = np.asarray(v)
    # check A v = lambda_min v
    want_vals, want_vecs = np.linalg.eigh(sym)
    ref = want_vecs[..., 0]
    dots = np.abs(np.sum(v * ref, axis=-1))
    # allow a handful of near-degenerate failures
    assert (dots > 0.999).mean() > 0.97


def test_smallest_eigvec3_planar(rng):
    # points on a plane with normal n -> covariance smallest eigvec == n
    n = np.asarray([1.0, 2.0, -0.5])
    n /= np.linalg.norm(n)
    basis = np.linalg.svd(n[None])[2][1:]  # 2 orthogonal in-plane vectors
    uv = rng.normal(size=(200, 2))
    pts = uv @ basis + rng.normal(scale=1e-3, size=(200, 3))
    cov = np.cov(pts.T).astype(np.float32)
    v, _ = eigh3.smallest_eigvec3(jnp.asarray(cov))
    assert abs(float(jnp.dot(v, jnp.asarray(n, jnp.float32)))) > 0.999


def test_voxel_overflow_is_spatially_uniform(rng):
    """When voxels exceed capacity, the surviving subset must span the whole
    cloud extent, not one bounding-box corner."""
    pts = rng.uniform(0, 100, size=(2048, 3)).astype(np.float32)
    out = voxel.voxel_downsample(cl.from_numpy(pts, 2048), res=0.5, out_capacity=256)
    kept = cl.to_numpy(out)
    assert len(kept) == 256
    # uniform survival -> kept min/max close to the full extent in every axis
    assert np.all(kept.min(axis=0) < 15.0)
    assert np.all(kept.max(axis=0) > 85.0)


def test_voxel_morton_matches_plain_voxel(rng):
    """The fused voxel+Morton op must produce the same centroid set as the
    two-pass path (sorting is the only difference when nothing overflows)."""
    pts = rng.uniform(-20, 20, size=(4096, 3)).astype(np.float32)
    mask = np.ones(4096, bool)
    mask[3800:] = False
    c = cl.PointCloud(jnp.asarray(pts), jnp.asarray(mask))
    a = cl.to_numpy(voxel.voxel_downsample(c, 0.5, out_capacity=4096))
    b = cl.to_numpy(voxel.voxel_downsample_morton(c, 0.5, out_capacity=4096))
    assert len(a) == len(b)
    np.testing.assert_allclose(
        a[np.lexsort(a.T)], b[np.lexsort(b.T)], atol=1e-4
    )


def test_voxel_morton_output_is_z_ordered(rng):
    from direct_lidar_odometry_tpu.ops import morton

    pts = rng.uniform(-20, 20, size=(4096, 3)).astype(np.float32)
    c = cl.from_numpy(pts, capacity=4096)
    out = voxel.voxel_downsample_morton(c, 0.5, out_capacity=4096)
    codes = np.asarray(morton.morton_codes(out.points, out.mask, cell=0.5))
    vc = codes[np.asarray(out.mask)].astype(np.int64)
    assert np.all(np.diff(vc) >= 0)


def test_voxel_morton_overflow_uniform_and_exact_cap(rng):
    pts = rng.uniform(0, 100, size=(16384, 3)).astype(np.float32)
    out = voxel.voxel_downsample_morton(
        cl.from_numpy(pts, 16384), res=0.5, out_capacity=512
    )
    kept = cl.to_numpy(out)
    # Bresenham subsample keeps exactly `cap` segments when S > cap
    assert len(kept) == 512
    # spatially uniform: all octants populated within ~30% of each other
    oct_ids = (
        (kept[:, 0] > 50).astype(int) * 4
        + (kept[:, 1] > 50).astype(int) * 2
        + (kept[:, 2] > 50).astype(int)
    )
    counts = np.bincount(oct_ids, minlength=8)
    assert counts.min() > 0.6 * counts.max()
