"""Per-frame health trace of the bench world on the current device.

Usage: python tools/trace_frames.py [world_frames] [run_frames] [--cpu] [key=val ...]

Runs the exact bench configuration frame-by-frame (sync) and prints
position error vs ground truth plus GICP health each frame. This is the
tool that located the round-2 divergence: S2S stalls in a local minimum
of the gated plane-to-plane objective at production density (per-corr
Mahalanobis error ~6 vs ~0.15 healthy) and the tight 0.5 m S2M gate
cannot pull back — fixed by the staged-gate rescue (GicpConfig.s2m_rescue).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    import jax

    if "--cpu" in sys.argv:
        sys.argv.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401
    from direct_lidar_odometry_tpu.io import synthetic
    from direct_lidar_odometry_tpu.odometry.runner import OdometryRunner

    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 45
    run_frames = frames
    if len(sys.argv) > 2 and sys.argv[2].isdigit():
        run_frames = int(sys.argv[2])
        sys.argv.pop(2)
    cfg = bench.production_cfg(False)
    for ov in sys.argv[2:]:
        from direct_lidar_odometry_tpu import config as config_mod
        from direct_lidar_odometry_tpu.cli import _parse_override
        k, v = _parse_override(ov)
        cfg = config_mod._override(cfg, k.split("."), v)
    print(f"# device={jax.devices()[0].platform} stride={cfg.gicp.s2s_coarse_stride} "
          f"backend={cfg.nn_backend}", file=sys.stderr)
    rng = np.random.default_rng(0)
    world, max_range, max_pts, beams = bench.make_bench_world(frames, rng, False)
    scans = [synthetic.render_scan(world, t, rng, beams=beams, max_range=max_range,
                                   max_points=max_pts) for t in range(run_frames)]
    gt = np.linalg.inv(world.poses[0])[None] @ world.poses

    runner = OdometryRunner(cfg)
    for t in range(run_frames):
        t0 = time.perf_counter()
        res = runner.process_scan(scans[t], world.stamps[t], sync=True)
        ms = (time.perf_counter() - t0) * 1e3
        est = np.asarray(runner.poses[-1])
        err = np.linalg.norm(est[:3, 3] - gt[t, :3, 3])
        if res is None:
            print(f"t={t:3d} init err={err*100:7.2f}cm {ms:7.1f}ms")
            continue
        print(
            f"t={t:3d} err={err*100:7.2f}cm "
            f"s2s[it={int(res.s2s_iterations):2d} nc={int(res.s2s_num_corr):6d} "
            f"cv={bool(res.s2s_converged)} e={float(res.s2s_error):9.1f}] "
            f"s2m[it={int(res.s2m_iterations):2d} nc={int(res.s2m_num_corr):6d} "
            f"cv={bool(res.s2m_converged)} e={float(res.s2m_error):9.1f}] "
            f"kf={int(res.num_keyframes)} sp={float(res.spaciousness):5.2f} "
            f"th={float(res.keyframe_thresh_dist):4.1f} chg={bool(res.submap_changed)} "
            f"{ms:6.1f}ms"
        )


if __name__ == "__main__":
    main()
