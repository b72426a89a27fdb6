"""Exactness check of the pallas kernels ON REAL TPU at production shapes.

The unit suite runs these kernels in interpret mode on CPU; this tool
closes the real-hardware gap: query_1nn_sorted and radius moments are
checked against scipy/numpy oracles at bench-like shapes on the actual
TPU (it cleared the kernels during the round-2 divergence hunt — the
bug was algorithmic, not Mosaic).
"""
import numpy as np
import jax
import jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scipy.spatial import cKDTree

from direct_lidar_odometry_tpu.ops import morton, pallas_nn, pallas_cov

rng = np.random.default_rng(0)

def make_cloud(n, valid_frac=0.9, extent=40.0):
    m = int(n * valid_frac)
    pts = np.full((n, 3), 1e6, np.float32)
    pts[:m] = rng.uniform(-extent, extent, size=(m, 3)).astype(np.float32)
    # cluster to mimic scan density: add a dense ground plane
    pts[: m // 2, 2] = rng.uniform(-2, 0, size=m // 2)
    mask = np.zeros(n, bool)
    mask[:m] = True
    return pts, mask

def zsort(pts, mask):
    p, m = morton.sort_cloud(jnp.asarray(pts), jnp.asarray(mask))
    return np.asarray(p), np.asarray(m)

print("# devices:", jax.devices())

for (T, Q, radius) in [(65536, 32768, 0.5), (32768, 32768, 1.0), (8192, 8192, 1.0)]:
    tp, tm = make_cloud(T)
    qp, qm = make_cloud(Q)
    tp, tm = zsort(tp, tm)
    qp, qm = zsort(qp, qm)
    lo, hi = morton.chunk_aabbs(jnp.asarray(tp), jnp.asarray(tm), morton.TARGET_CHUNK)
    idx, d2, found = jax.jit(
        lambda tpx, tmx, lox, hix, qpx, qmx: pallas_nn.query_1nn_sorted(
            tpx, tmx, lox, hix, qpx, qmx, radius, interpret=False
        )
    )(jnp.asarray(tp), jnp.asarray(tm), lo, hi, jnp.asarray(qp), jnp.asarray(qm))
    idx, d2, found = np.asarray(idx), np.asarray(d2), np.asarray(found)

    tree = cKDTree(tp[tm])
    tidx = np.flatnonzero(tm)
    dd, jj = tree.query(qp, k=1, distance_upper_bound=radius)
    ref_found = qm & np.isfinite(dd)
    # compare d2 of the found matches (ties can differ in index)
    mism_found = (found != ref_found)
    n_mf = int(mism_found.sum())
    ok = found & ref_found
    d2_ref = dd[ok] ** 2
    d2_got = np.sum((qp[ok] - tp[idx[ok]]) ** 2, axis=-1)
    bad_d2 = np.abs(d2_got - d2_ref) > 1e-5
    print(f"T={T} Q={Q} r={radius}: found mismatches={n_mf}/{Q}, "
          f"d2 mismatches={int(bad_d2.sum())}/{int(ok.sum())}, "
          f"max|d2 diff|={np.abs(d2_got - d2_ref).max() if ok.sum() else 0:.2e}")

# radius moments (normals) check at scan shape
T = 32768
tp, tm = make_cloud(T, extent=20.0)
tp, tm = zsort(tp, tm)
lo, hi = morton.chunk_aabbs(jnp.asarray(tp), jnp.asarray(tm), morton.TARGET_CHUNK)
r = 0.75
m = jax.jit(
    lambda a, b, c, d: pallas_cov.radius_moments_sorted(
        a, b, c, d, a, b, r, interpret=False
    )
)(jnp.asarray(tp), jnp.asarray(tm), lo, hi)
m = np.asarray(m)
tree = cKDTree(tp[tm])
counts_ref = np.array([len(tree.query_ball_point(p, r)) if v else 0
                       for p, v in zip(tp[:2048], tm[:2048])])
counts_got = m[:2048, 0]
print("moments shape:", m.shape)
print("count mismatches (first 2048):",
      int((np.abs(counts_got - counts_ref) > 0.5).sum()))
