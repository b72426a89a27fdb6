"""Hull-surrogate cost on the DP (batched) axis — VERDICT r3 item 7.

The single-sequence runner feeds EXACT QHull membership masks (computed
host-side, one frame behind — odometry/hosthull.py); the batched/sharded
paths use the device-side direction-extremal surrogate (odometry/hulls.py)
whose convex recall vs QHull is <0.4 on trajectory-shaped keyframe sets.
This tool measures what that actually costs end-to-end: the SAME world is
driven through (a) the single-sequence runner with exact hulls, (b) the
single-sequence runner with the surrogate (hull feed disabled), and
(c) the batched step at B=4 (surrogate by construction), and the ATEs are
compared. Differences between (a) and (b) isolate the hull policy;
(c) confirms the batched path matches (b) (its per-sequence renders use
different rngs, so compare the distribution, not bitwise).

CPU (small shapes):  JAX_PLATFORMS=cpu python tools/hull_ab.py
Env: HAB_FRAMES (default 60), HAB_BATCH (default 4).
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import dataclasses

    import jax.numpy as jnp

    from direct_lidar_odometry_tpu.config import DloConfig, ShapeConfig
    from direct_lidar_odometry_tpu.io import evaluation, synthetic
    from direct_lidar_odometry_tpu.odometry.runner import OdometryRunner
    from direct_lidar_odometry_tpu.parallel import batched

    n_frames = int(os.environ.get("HAB_FRAMES", "60"))
    b = int(os.environ.get("HAB_BATCH", "4"))

    base = DloConfig().replace(s2s_prior="constant_velocity")
    base = base.replace(
        shapes=ShapeConfig(
            n_raw=8192, n_scan=8192, n_keyframe=8192, max_keyframes=24,
            max_submap_kf=8, imu_window=64, grid_table_size=2 ** 14,
            submap_table_size=2 ** 15, cell_cap_1nn=16, cell_cap_knn=48,
            knn_query_chunk=2048, hull_directions=32,
        ),
        # force the hull path to MATTER: small keyframe spacing spawns
        # many keyframes, and a small submap.knn makes the hull-selected
        # keyframes a real fraction of the submap
        keyframe=dataclasses.replace(base.keyframe, thresh_dist=1.0),
        adaptive=dataclasses.replace(base.adaptive, use=False),
        submap=dataclasses.replace(base.submap, knn=3, kcv=3, kcc=3),
    )
    rng = np.random.default_rng(9)
    # round-5: ray-cast closed loop (exact occlusion; HULL_SOUP=1 restores
    # the legacy point-soup world the round-4 A/B ran on)
    if bool(int(os.environ.get("HULL_SOUP", "0"))):
        world = synthetic.make_loop_world(
            rng, n_frames=n_frames, speed=0.4, z_amplitude=1.0,
            density=6.0, ground_density=9.0,
        )
        beams = None
    else:
        # wandering corridor (a closed loop at 60 frames x 0.4 m/frame is
        # a 3.8 m-radius circle — too tight for 13 m-range scans to keep
        # structure in view; measured divergent)
        world = synthetic.make_urban_world(
            rng, n_frames=n_frames, speed=0.4, corridor=7.0,
            n_dynamic=0,
        )
        beams = synthetic.BeamModel(n_beams=32, n_azimuth=512)
    gt = np.linalg.inv(world.poses[0])[None] @ world.poses

    def run_single(use_exact_hulls: bool, tag: str):
        runner = OdometryRunner(base)
        if not use_exact_hulls:
            # disable the host hull feed: masks stay all-False with
            # hull_fresh=False, so submap selection falls back to the
            # device surrogate exactly like the batched path
            runner._enqueue_hull_fetch = lambda *_a, **_k: None
        for t in range(n_frames):
            s = synthetic.render_scan(
                world, t, np.random.default_rng(1000 + t),
                max_range=13.0, max_points=8192, beams=beams,
            )
            runner.process_scan(s, float(world.stamps[t]))
        est = runner.trajectory()[: len(gt)]
        ate = evaluation.ate(est, gt[: len(est)], align=False)
        print(json.dumps({
            "config": tag, "frames": n_frames,
            "ate_rmse_m": round(float(ate.rmse), 4),
            "ate_max_m": round(float(ate.max), 4),
            "keyframes": runner.num_keyframes(),
        }), flush=True)
        return float(ate.rmse)

    run_single(True, "single_exact_hulls")
    run_single(False, "single_surrogate_hulls")

    # batched path (device surrogate by construction)
    init_fn, step_fn = batched.make_batched_fns(base)
    states = batched.batched_state(base, b)
    eye = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    poses = [[] for _ in range(b)]
    for t in range(n_frames):
        pts = np.full((b, base.shapes.n_raw, 3), 1e6, np.float32)
        mask = np.zeros((b, base.shapes.n_raw), bool)
        for i in range(b):
            s = synthetic.render_scan(
                world, t, np.random.default_rng(1000 + t + 7919 * i),
                max_range=13.0, max_points=8192, beams=beams,
            )
            pts[i, : len(s)] = s
            mask[i, : len(s)] = True
        if t == 0:
            states = init_fn(states, jnp.asarray(pts), jnp.asarray(mask))
            for i in range(b):
                poses[i].append(np.eye(4, dtype=np.float32))
            continue
        states, res = step_fn(states, jnp.asarray(pts), jnp.asarray(mask), eye)
        p = np.asarray(res.pose)
        for i in range(b):
            poses[i].append(p[i])
    ates = []
    for i in range(b):
        est = np.stack(poses[i])[: len(gt)]
        ates.append(float(evaluation.ate(est, gt[: len(est)], align=False).rmse))
    print(json.dumps({
        "config": "batched_surrogate_hulls", "frames": n_frames, "batch": b,
        "ate_rmse_m_per_seq": [round(a, 4) for a in ates],
        "ate_rmse_m_mean": round(float(np.mean(ates)), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
