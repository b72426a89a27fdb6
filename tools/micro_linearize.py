"""Micro-bench: pruned NN kernel alone vs the full _linearize XLA glue.

Quantifies the headroom of fusing the GICP linearization into the Pallas
NN kernel. Run on TPU: python tools/micro_linearize.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=16):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from direct_lidar_odometry_tpu.config import load_config as default_config
    from direct_lidar_odometry_tpu.ops import morton, pallas_nn
    from direct_lidar_odometry_tpu.registration import gicp

    cfg = default_config()
    ns, nt = 32768, 65536
    rng = np.random.default_rng(0)
    # scan-like geometry: points on a rough ground+structure within 40 m
    src_pts = (rng.random((ns, 3)) * np.array([80, 80, 8]) - np.array([40, 40, 4])).astype(np.float32)
    tgt_pts = src_pts[rng.integers(0, ns, nt)] + rng.normal(0, 0.1, (nt, 3)).astype(np.float32)
    src_n = rng.normal(size=(ns, 3)).astype(np.float32)
    src_n /= np.linalg.norm(src_n, axis=1, keepdims=True)
    tgt_n = rng.normal(size=(nt, 3)).astype(np.float32)
    tgt_n /= np.linalg.norm(tgt_n, axis=1, keepdims=True)

    sp, sm = morton.sort_cloud(jnp.asarray(src_pts), jnp.ones((ns,), bool))
    tp, tm = morton.sort_cloud(jnp.asarray(tgt_pts), jnp.ones((nt,), bool))
    lo, hi = morton.chunk_aabbs(tp, tm, morton.TARGET_CHUNK)
    sn = jnp.asarray(src_n)
    tn = jnp.asarray(tgt_n)
    ones_s = jnp.ones((ns,), bool)
    ones_t = jnp.ones((nt,), bool)

    src = gicp.GicpSource(points=sp, mask=sm, normals=sn, normals_valid=ones_s)
    tgt = gicp.GicpTarget(points=tp, mask=tm, normals=tn, normals_valid=ones_t,
                          grid=None, chunk_lo=lo, chunk_hi=hi)
    x0 = jnp.eye(4, dtype=jnp.float32)
    radius = cfg.gicp.s2m.max_correspondence_distance

    nn_fn = jax.jit(lambda q: pallas_nn.query_1nn_sorted(tp, tm, lo, hi, q, sm, radius))
    fused_fn = jax.jit(lambda x: gicp._linearize(x, src, tgt, cfg.gicp.s2m, 32, "pallas_fused"))
    unfused_fn = jax.jit(
        lambda x: gicp._linearize(x, src, tgt, cfg.gicp.s2m, 32, "pallas")
    )
    seeded_fn = jax.jit(
        lambda x, c: gicp._linearize(x, src, tgt, cfg.gicp.s2m, 32, "pallas_fused",
                                     seed_corr=c)
    )
    corr0 = fused_fn(x0).corr
    # perturb like one GICP iteration's delta (mm-scale)
    x1 = jnp.asarray(np.asarray(x0).copy())
    x1 = x1.at[0, 3].add(0.004).at[1, 3].add(-0.003)

    print(f"NN kernel alone          {timeit(nn_fn, sp):8.3f} ms")
    print(f"_linearize fused cold    {timeit(fused_fn, x0):8.3f} ms")
    print(f"_linearize fused seeded  {timeit(seeded_fn, x1, corr0):8.3f} ms")
    print(f"_linearize unfused       {timeit(unfused_fn, x0):8.3f} ms")


if __name__ == "__main__":
    main()
