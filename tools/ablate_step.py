"""Cumulative-prefix ablation of the jitted odometry step.

profile_stages.py times stages as standalone jits, which overstates
stages the full step skips (conditional submap rebuild / keyframe spawn)
or runs at reduced resolution (coarse S2S). This tool jits CUMULATIVE
PREFIXES of the exact odom_frame wiring (same coarse stride, same
conditionals) so successive deltas attribute the real full-step budget.

Run on the TPU: python tools/ablate_step.py [--small]
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
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp

    import bench
    from direct_lidar_odometry_tpu.config import resolve_backend
    from direct_lidar_odometry_tpu.core import se3
    from direct_lidar_odometry_tpu.io import synthetic
    from direct_lidar_odometry_tpu.odometry import (
        adaptive, hulls, keyframes, pipeline, submap,
    )
    from direct_lidar_odometry_tpu.odometry.runner import OdometryRunner
    from direct_lidar_odometry_tpu.ops import morton
    from direct_lidar_odometry_tpu.registration import gicp
    from direct_lidar_odometry_tpu.utils.precision import f32_matmuls

    small = "--small" in sys.argv
    cfg = bench.production_cfg(small)
    cfg = cfg.replace(quantize_transfer=False)
    backend = resolve_backend(cfg)
    shapes = cfg.shapes
    print(f"# backend={backend} n_scan={shapes.n_scan} "
          f"stride={cfg.gicp.s2s_coarse_stride}", file=sys.stderr)

    rng = np.random.default_rng(0)
    frames = 8
    world, max_range, max_pts, beams = bench.make_bench_world(frames + 1, rng, small)
    runner = OdometryRunner(cfg)
    for t in range(frames):
        s = synthetic.render_scan(world, t, rng, beams=beams, max_range=max_range,
                                  max_points=max_pts)
        runner.process_scan(s, world.stamps[t], sync=True)
    state = runner.state
    raw = synthetic.render_scan(world, frames, rng, beams=beams, max_range=max_range,
                                max_points=max_pts)
    # match the runner's wire format: with host_preprocess the device step
    # receives <= n_scan Z-ordered voxel centroids, not the raw scan
    raw = runner._prep_points(raw)
    cap = runner._wire_capacity()
    pts = np.full((cap, 3), 1e6, np.float32)
    msk = np.zeros((cap,), bool)
    pts[: len(raw)] = raw[:, :3][:cap]
    msk[: min(len(raw), cap)] = True
    pts, msk = jnp.asarray(pts), jnp.asarray(msk)
    eye = jnp.eye(4, dtype=jnp.float32)
    directions = hulls.fibonacci_directions(shapes.hull_directions)
    no_hull = (jnp.zeros((shapes.max_keyframes,), bool),
               jnp.zeros((shapes.max_keyframes,), bool), jnp.asarray(False))

    def prefix(stop):
        """Build the odom_frame prefix up to `stop`, mirroring pipeline.odom_frame."""

        @jax.jit
        @f32_matmuls
        def fn(state, pts, msk, imu_prior):
            scan = pipeline.preprocess_scan(pts, msk, cfg, backend)
            if stop == "preprocess":
                return scan
            spac = adaptive.update_spaciousness(
                state.spaciousness, scan.points, scan.mask, cfg.adaptive.lpf_alpha)
            thresh_dist = (adaptive.keyframe_thresh_from_spaciousness(spac)
                           if cfg.adaptive.use else jnp.float32(cfg.keyframe.thresh_dist))
            nrm = pipeline._scan_normals(scan, cfg, backend)
            if stop == "normals":
                return nrm
            src = gicp.GicpSource(scan.points, scan.mask, nrm.normals, nrm.valid)
            guess = (se3.make_se3(imu_prior[:3, :3], state.last_delta[:3, 3])
                     if cfg.imu.use else state.last_delta)
            # coarse-to-fine S2S, mirroring pipeline.odom_frame
            cs = max(1, int(cfg.gicp.s2s_coarse_stride))
            while cs > 1 and (shapes.n_scan // cs) % morton.TARGET_CHUNK != 0:
                cs -= 1
            if cs > 1:
                coarse_src = gicp.GicpSource(scan.points[::cs], scan.mask[::cs],
                                             nrm.normals[::cs], nrm.valid[::cs])
                coarse_target = gicp.make_target(
                    state.prev_points[::cs], state.prev_mask[::cs],
                    state.prev_normals[::cs], state.prev_normals_valid[::cs],
                    cfg.gicp.s2s.max_correspondence_distance,
                    shapes.grid_table_size, backend=backend)
                coarse_res = gicp.align(coarse_src, coarse_target, guess,
                                        cfg.gicp.s2s, cap=shapes.cell_cap_1nn,
                                        backend=backend)
                guess = coarse_res.transform
                if stop == "s2s_coarse":
                    return coarse_res
            s2s_target = gicp.make_target(
                state.prev_points, state.prev_mask,
                state.prev_normals, state.prev_normals_valid,
                cfg.gicp.s2s.max_correspondence_distance,
                shapes.grid_table_size, backend=backend)
            s2s_res = gicp.align(src, s2s_target, guess, cfg.gicp.s2s,
                                 cap=shapes.cell_cap_1nn, backend=backend)
            if stop == "s2s":
                return s2s_res
            t_global = state.t_s2s @ s2s_res.transform
            qp = se3.se3_translation(t_global)
            sel = submap.select_submap_keyframes(
                state.keyframes, state.submap_members, qp, thresh_dist, cfg,
                directions, no_hull)
            st = submap.assemble_submap(state, sel, qp, cfg, backend)
            if stop == "submap":
                return st.submap_points
            sm_lo, sm_hi = morton.chunk_aabbs(st.submap_points, st.submap_mask, morton.TARGET_CHUNK)
            s2m_target = gicp.GicpTarget(
                points=st.submap_points, mask=st.submap_mask,
                normals=st.submap_normals, normals_valid=st.submap_normals_valid,
                grid=st.submap_grid, chunk_lo=sm_lo, chunk_hi=sm_hi)
            s2m_res = gicp.align(src, s2m_target, t_global, cfg.gicp.s2m,
                                 cap=shapes.cell_cap_1nn, backend=backend)
            if stop == "s2m":
                return s2m_res
            pose = jnp.where(s2m_res.num_correspondences > 0,
                             s2m_res.transform, t_global)
            kf, spawned, kf_evicted, _slot = keyframes.maybe_spawn(
                st.keyframes, scan, pose, cfg, thresh_dist, backend)
            return kf.count, spawned, pose

        return fn

    # dispatch floor: an (almost) empty jit with the same args — the fixed
    # per-call cost every prefix pays once, so "cum ms" rows include it and
    # deltas cancel it
    floor_fn = jax.jit(lambda state, p, m, e: p[0] + e[0, 0])
    floor = timeit(floor_fn, state, pts, msk, eye)
    print(f"# dispatch floor: {floor:.2f} ms", file=sys.stderr)

    rows = []
    prev_ms = 0.0
    stops = ["preprocess", "normals", "s2s", "submap", "s2m", "full"]
    if cfg.gicp.s2s_coarse_stride > 1:
        stops.insert(2, "s2s_coarse")
    for stop in stops:
        fn = prefix(stop)
        ms = timeit(fn, state, pts, msk, eye)
        rows.append((stop, ms, ms - prev_ms))
        prev_ms = ms

    _, full_step = pipeline.make_step_fns(cfg, donate=False)
    ms_ref = timeit(full_step, state, pts, msk, eye, *no_hull)
    print(f"{'prefix':14s} {'cum ms':>8s} {'delta ms':>9s}")
    for name, ms, d in rows:
        print(f"{name:14s} {ms:8.2f} {d:9.2f}")
    print(f"{'make_step_fns':14s} {ms_ref:8.2f}")


if __name__ == "__main__":
    main()
