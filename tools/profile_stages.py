"""Per-stage device timing of the odometry step at production shapes.

Times each pipeline stage as its own jitted function on real data (state
captured after a few warmup frames), so the 30-40 ms/frame budget can be
attributed. Run on the TPU: python tools/profile_stages.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=8):
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

    import bench
    from direct_lidar_odometry_tpu.config import resolve_backend
    from direct_lidar_odometry_tpu.core import se3
    from direct_lidar_odometry_tpu.io import synthetic
    from direct_lidar_odometry_tpu.odometry import adaptive, hulls, keyframes, pipeline, submap
    from direct_lidar_odometry_tpu.odometry.runner import OdometryRunner
    from direct_lidar_odometry_tpu.ops import morton
    from direct_lidar_odometry_tpu.registration import gicp
    from direct_lidar_odometry_tpu.utils.precision import f32_matmuls

    small = "--small" in sys.argv
    cfg = bench.production_cfg(small)
    cfg = cfg.replace(quantize_transfer=False)
    backend = resolve_backend(cfg)
    print(f"# backend={backend} shapes n_scan={cfg.shapes.n_scan}", file=sys.stderr)

    rng = np.random.default_rng(0)
    frames = 8
    world, max_range, max_pts, beams = bench.make_bench_world(frames + 1, rng, small)
    runner = OdometryRunner(cfg)
    for t in range(frames):
        s = synthetic.render_scan(world, t, rng, max_range=max_range, max_points=max_pts, beams=beams)
        runner.process_scan(s, world.stamps[t], sync=True)
    state = runner.state
    raw = synthetic.render_scan(world, frames, rng, max_range=max_range, max_points=max_pts, beams=beams)
    # wire-capacity encode, matching the runner exactly: with
    # cfg.host_preprocess the device step starts from <= n_scan Z-ordered
    # voxel centroids (feeding the raw 131k capacity instead would profile
    # a program the bench never runs — and overflows the cov kernel's
    # SMEM candidate table)
    prepped = runner._prep_points(raw)
    cap = runner._wire_capacity()
    pts = np.full((cap, 3), 1e6, np.float32)
    msk = np.zeros((cap,), bool)
    m = min(len(prepped), cap)
    pts[:m] = prepped[:m, :3]
    msk[:m] = True
    pts, msk = jnp.asarray(pts), jnp.asarray(msk)
    eye = jnp.eye(4, dtype=jnp.float32)
    directions = hulls.fibonacci_directions(cfg.shapes.hull_directions)

    # stage fns
    pre = jax.jit(lambda p, m: pipeline.preprocess_scan(p, m, cfg, backend))
    scan = pre(pts, msk)
    nrm_fn = jax.jit(lambda s: pipeline._scan_normals(s, cfg, backend))
    nrm = nrm_fn(scan)
    src = gicp.GicpSource(scan.points, scan.mask, nrm.normals, nrm.valid)

    s2s_tgt_fn = jax.jit(
        lambda st: gicp.make_target(
            st.prev_points, st.prev_mask, st.prev_normals, st.prev_normals_valid,
            cfg.gicp.s2s.max_correspondence_distance, cfg.shapes.grid_table_size,
            backend=backend,
        )
    )
    s2s_target = s2s_tgt_fn(state)

    @jax.jit
    @f32_matmuls
    def s2s_fn(src, tgt, g):
        return gicp.align(src, tgt, g, cfg.gicp.s2s, cap=cfg.shapes.cell_cap_1nn,
                          backend=backend)

    s2s_res = s2s_fn(src, s2s_target, state.last_delta)
    print(f"# s2s iters={int(s2s_res.iterations)}", file=sys.stderr)

    @jax.jit
    @f32_matmuls
    def submap_fn(st, tg):
        qp = se3.se3_translation(tg)
        spac = adaptive.update_spaciousness(st.spaciousness, scan.points, scan.mask,
                                            cfg.adaptive.lpf_alpha)
        td = adaptive.keyframe_thresh_from_spaciousness(spac)
        sel = submap.select_submap_keyframes(
            st.keyframes, st.submap_members, qp, td, cfg, directions)
        return submap.assemble_submap(st, sel, qp, cfg, backend)

    t_global = state.t_s2s @ s2s_res.transform
    state2 = submap_fn(state, t_global)

    @jax.jit
    @f32_matmuls
    def s2m_fn(st, src, g):
        lo, hi = morton.chunk_aabbs(st.submap_points, st.submap_mask, morton.TARGET_CHUNK)
        tgt = gicp.GicpTarget(
            points=st.submap_points, mask=st.submap_mask,
            normals=st.submap_normals, normals_valid=st.submap_normals_valid,
            grid=st.submap_grid, chunk_lo=lo, chunk_hi=hi)
        return gicp.align(src, tgt, g, cfg.gicp.s2m, cap=cfg.shapes.cell_cap_1nn,
                          backend=backend)

    s2m_res = s2m_fn(state2, src, t_global)
    print(f"# s2m iters={int(s2m_res.iterations)}", file=sys.stderr)

    @jax.jit
    @f32_matmuls
    def kf_fn(st, pose):
        return keyframes.maybe_spawn(st.keyframes, scan, pose,
                                     cfg, jnp.float32(5.0), backend)

    full_init, full_step = pipeline.make_step_fns(cfg, donate=False)
    rows = [
        ("preprocess+morton", timeit(pre, pts, msk)),
        ("normals", timeit(nrm_fn, scan)),
        ("s2s make_target", timeit(s2s_tgt_fn, state)),
        ("s2s align", timeit(s2s_fn, src, s2s_target, state.last_delta)),
        ("submap select+assemble", timeit(submap_fn, state, t_global)),
        ("s2m align", timeit(s2m_fn, state2, src, t_global)),
        ("keyframe maybe_spawn", timeit(kf_fn, state2, s2m_res.transform)),
        ("FULL step (jit)", timeit(
            full_step, state, pts, msk, eye,
            jnp.zeros((cfg.shapes.max_keyframes,), bool),
            jnp.zeros((cfg.shapes.max_keyframes,), bool),
            jnp.asarray(False),
        )),
    ]
    for name, ms in rows:
        print(f"{name:28s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
