"""Micro-attribution of gicp.align cost at production shapes (TPU).

Times: pallas 1-NN alone, full _linearize, LM step pieces, and the
preprocess sort chain. Run: python tools/micro_align.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20):
    """On the tunneled transport block_until_ready can return before the
    computation drains; a tiny device->host transfer cannot (runner.py)."""
    import jax
    import numpy as np

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[:1] if getattr(leaf, "ndim", 0) else leaf)

    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main() -> None:
    import jax
    import jax.numpy as jnp

    import bench
    from direct_lidar_odometry_tpu.config import resolve_backend
    from direct_lidar_odometry_tpu.io import synthetic
    from direct_lidar_odometry_tpu.odometry import pipeline
    from direct_lidar_odometry_tpu.odometry.runner import OdometryRunner
    from direct_lidar_odometry_tpu.ops import morton, pallas_nn, voxel
    from direct_lidar_odometry_tpu.core.cloud import PointCloud
    from direct_lidar_odometry_tpu.registration import gicp, covariance
    from direct_lidar_odometry_tpu.utils.precision import f32_matmuls

    cfg = bench.production_cfg(False)
    backend = resolve_backend(cfg)
    rng = np.random.default_rng(0)
    world, max_range, max_pts, beams = bench.make_bench_world(4, rng, False)
    runner = OdometryRunner(cfg)
    for t in range(3):
        s = synthetic.render_scan(world, t, rng, max_range=max_range, max_points=max_pts, beams=beams)
        runner.process_scan(s, world.stamps[t], sync=True)
    state = runner.state
    raw = synthetic.render_scan(world, 3, rng, max_range=max_range, max_points=max_pts, beams=beams)
    pts = np.full((cfg.shapes.n_raw, 3), 1e6, np.float32)
    msk = np.zeros((cfg.shapes.n_raw,), bool)
    pts[: len(raw)] = raw
    msk[: len(raw)] = True
    pts, msk = jnp.asarray(pts), jnp.asarray(msk)

    scan = jax.jit(lambda p, m: pipeline.preprocess_scan(p, m, cfg, backend))(pts, msk)
    nrm = jax.jit(lambda s: pipeline._scan_normals(s, cfg, backend))(scan)
    src = gicp.GicpSource(scan.points, scan.mask, nrm.normals, nrm.valid)
    tgt = jax.jit(
        lambda st: gicp.make_target(
            st.prev_points, st.prev_mask, st.prev_normals, st.prev_normals_valid,
            cfg.gicp.s2s.max_correspondence_distance, cfg.shapes.grid_table_size,
            backend=backend,
        )
    )(state)
    g = state.last_delta

    r = cfg.gicp.s2s.max_correspondence_distance

    nn_fn = jax.jit(
        lambda q: pallas_nn.query_1nn_sorted(
            tgt.points, tgt.mask, tgt.chunk_lo, tgt.chunk_hi, q, src.mask, r
        )
    )
    lin_fn = jax.jit(
        f32_matmuls(
            lambda x0: gicp._linearize(
                x0, src, tgt, cfg.gicp.s2s, cfg.shapes.cell_cap_1nn, backend
            )
        )
    )
    corr_fn = jax.jit(
        f32_matmuls(
            lambda x0: gicp._update_correspondences(
                x0, src, tgt, cfg.gicp.s2s, cfg.shapes.cell_cap_1nn, backend
            )
        )
    )
    align_fn = jax.jit(
        f32_matmuls(
            lambda: gicp.align(src, tgt, g, cfg.gicp.s2s,
                               cap=cfg.shapes.cell_cap_1nn, backend=backend)
        )
    )
    res = align_fn()
    print(f"# s2s iters={int(res.iterations)}", file=sys.stderr)

    # candidate stats: how many chunks does the average query tile visit?
    from direct_lidar_odometry_tpu.ops.pallas_nn import _BQ, candidate_chunks
    qlo, qhi = morton.chunk_aabbs(scan.points, scan.mask, _BQ)
    _, counts = candidate_chunks(qlo, qhi, tgt.chunk_lo, tgt.chunk_hi, r)
    print(f"# candidate chunks/tile: mean {float(jnp.mean(counts)):.1f} "
          f"max {int(jnp.max(counts))} of {tgt.points.shape[0]//512}", file=sys.stderr)

    # preprocess pieces
    crop = cfg.preprocessing.crop.size
    from direct_lidar_odometry_tpu.ops import preprocess as prep
    pre_fn = jax.jit(lambda p, m: prep.preprocess(PointCloud(points=p, mask=m), crop))
    c0 = pre_fn(pts, msk)
    vox_fn = jax.jit(lambda c: voxel.voxel_downsample(
        c, cfg.preprocessing.voxel_scan.res, out_capacity=cfg.shapes.n_scan))
    cv = vox_fn(c0)
    mort_fn = jax.jit(lambda c: morton.sort_order(c.points, c.mask))

    # remaining frame pieces: normals, s2s target build, submap, s2m, keyframe
    from direct_lidar_odometry_tpu.odometry import hulls, keyframes, submap
    from direct_lidar_odometry_tpu.core import se3

    directions = hulls.fibonacci_directions(cfg.shapes.hull_directions)
    nrm_fn = jax.jit(lambda s: pipeline._scan_normals(s, cfg, backend))
    tgt_fn = jax.jit(
        lambda st: gicp.make_target(
            st.prev_points, st.prev_mask, st.prev_normals, st.prev_normals_valid,
            cfg.gicp.s2s.max_correspondence_distance, cfg.shapes.grid_table_size,
            backend=backend,
        )
    )
    qpos = se3.se3_translation(state.pose)

    def submap_fn(st, q):
        sel = submap.select_submap_keyframes(
            st.keyframes, st.submap_members, q, jnp.float32(5.0), cfg, directions
        )
        st2 = submap.assemble_submap(st, sel, q, cfg, backend)
        return st2.submap_points

    sub_fn = jax.jit(f32_matmuls(submap_fn))

    def s2m_fn(st, g2):
        sm_lo, sm_hi = morton.chunk_aabbs(st.submap_points, st.submap_mask, morton.TARGET_CHUNK)
        t = gicp.GicpTarget(
            chunk_lo=sm_lo, chunk_hi=sm_hi,
            points=st.submap_points, mask=st.submap_mask,
            normals=st.submap_normals, normals_valid=st.submap_normals_valid,
            grid=st.submap_grid,
        )
        return gicp.align(src, t, g2, cfg.gicp.s2m,
                          cap=cfg.shapes.cell_cap_1nn, backend=backend)

    s2m_jit = jax.jit(f32_matmuls(s2m_fn))

    kf_fn = jax.jit(f32_matmuls(
        lambda st, p: keyframes.maybe_spawn(
            st.keyframes, scan, p, cfg, jnp.float32(5.0), backend)[0].count
    ))
    step_full = jax.jit(f32_matmuls(
        lambda st, p, m: pipeline.odom_frame(
            cfg, backend, directions, st, p, m, jnp.eye(4, dtype=jnp.float32))
    ))

    rows = [
        ("pallas 1nn only", timeit(nn_fn, scan.points)),
        ("update_correspondences", timeit(corr_fn, g)),
        ("full _linearize", timeit(lin_fn, g)),
        ("align (s2s, ~3 iters)", timeit(align_fn)),
        ("prep mask/crop 131k", timeit(pre_fn, pts, msk)),
        ("voxel_downsample 131k", timeit(vox_fn, c0)),
        ("morton sort 32k", timeit(mort_fn, cv)),
        ("scan normals", timeit(nrm_fn, scan)),
        ("s2s make_target", timeit(tgt_fn, state)),
        ("submap select+assemble", timeit(sub_fn, state, qpos)),
        ("s2m align", timeit(s2m_jit, state, state.pose)),
        ("keyframe maybe_spawn", timeit(kf_fn, state, state.pose)),
        ("FULL odom_frame", timeit(step_full, state, pts, msk, n=10)),
    ]
    for name, ms in rows:
        print(f"{name:28s} {ms:8.3f} ms")


if __name__ == "__main__":
    main()
