"""Odometry state: everything carried frame-to-frame, as one pytree.

The reference's ``dlo::OdomNode`` keeps this as mutable members
(``include/dlo/odom.h:75-110``: T, T_s2s, pose/rotq, keyframes vector,
submap cloud/normals, spaciousness history). Here it is an immutable
NamedTuple of fixed-shape arrays threaded through the jitted per-frame
step — the functional redesign that makes the pipeline vmappable over
independent sequences (the DP axis) and trivially checkpointable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from direct_lidar_odometry_tpu.config import DloConfig, resolve_backend, submap_flat_size
from direct_lidar_odometry_tpu.ops import hashgrid


class KeyframeStore(NamedTuple):
    """Preallocated keyframe ring (reference ``keyframes`` vector +
    ``keyframe_normals`` cache, odom.h:80-82, odom.cc:1166-1174).

    Capacity is static; ``count`` tracks occupancy. When full, new
    keyframes are dropped (the reference grows unboundedly; a capacity is
    the price of static shapes — size via ShapeConfig.max_keyframes).
    """

    positions: jnp.ndarray      # [K, 3] keyframe pose translations
    quats: jnp.ndarray          # [K, 4] keyframe pose rotations (wxyz)
    points: jnp.ndarray         # [K, Nk, 3] world-frame keyframe clouds
    masks: jnp.ndarray          # [K, Nk]
    normals: jnp.ndarray        # [K, Nk, 3] cached normals (odom.cc:1324 role)
    normals_valid: jnp.ndarray  # [K, Nk]
    count: jnp.ndarray          # int32
    # Monotonic insertion sequence number per slot (-1 = never written).
    # After eviction rewrites a slot, SLOT order no longer reflects
    # trajectory order — the loop-closure chain prior and the revisit
    # index-gap test must order keyframes by ``seq``, not slot (measured:
    # a slot-order chain prior ROUTED a loop correction wrongly and
    # doubled the keyframe map error on a 300-frame evicting run).
    seq: jnp.ndarray            # [K] int32
    # Odometry health at spawn time: the spawn frame's S2M
    # per-correspondence Mahalanobis error (~0.08 healthy, multiples of
    # that through degraded stretches). Pose-graph refinement weights its
    # chain prior by this (information-weighted PGO): without it the
    # solver spreads a loop correction UNIFORMLY around the trajectory,
    # dragging accurate keyframes off while fixing drifted ones (measured:
    # mean keyframe map error 0.084 -> 0.199 m on a burst-drift run with
    # uniform weights; the closure region itself repaired 0.23 -> 0.01).
    health: jnp.ndarray         # [K] f32

    @property
    def capacity(self) -> int:
        return self.positions.shape[0]


class OdomState(NamedTuple):
    """Full carried state of one odometry sequence."""

    pose: jnp.ndarray            # [4, 4] current world pose T (odom.h:76)
    t_s2s: jnp.ndarray           # [4, 4] S2S-propagated pose T_s2s_prev (odom.h:77)
    last_delta: jnp.ndarray      # [4, 4] inv(pose_{t-1}) @ pose_t — the
                                 # constant-velocity S2S prior (see config)
    # previous preprocessed scan = next frame's S2S target (odom.cc:850)
    prev_points: jnp.ndarray     # [N, 3]
    prev_mask: jnp.ndarray       # [N]
    prev_normals: jnp.ndarray    # [N, 3]
    prev_normals_valid: jnp.ndarray  # [N]
    keyframes: KeyframeStore
    # submap cache (reference submap_cloud/submap_normals + idx change
    # detection, odom.cc:1309-1329)
    submap_members: jnp.ndarray  # [K] bool membership mask of the cached submap
    submap_points: jnp.ndarray   # [S*Nk, 3] flattened submap cloud
    submap_mask: jnp.ndarray     # [S*Nk]
    submap_normals: jnp.ndarray  # [S*Nk, 3]
    submap_normals_valid: jnp.ndarray  # [S*Nk]
    # cached S2M hash grid (rebuilt on submap change); None when the
    # "brute" backend is active (tiled search needs no index)
    submap_grid: hashgrid.HashGrid | None
    spaciousness: jnp.ndarray    # f32 low-pass median range (odom.cc:1004-1006)
    frame_idx: jnp.ndarray       # int32


class FrameResult(NamedTuple):
    """Per-frame outputs (the reference's published odom + debug stats)."""

    pose: jnp.ndarray            # [4, 4]
    position: jnp.ndarray        # [3]
    quat: jnp.ndarray            # [4] wxyz
    new_keyframe: jnp.ndarray    # bool
    kf_slot: jnp.ndarray         # int32 ring slot written this frame (-1 if
                                 # none) — lets host mirrors (runner intensity
                                 # sidecar) track the ring through eviction
    kf_evicted: jnp.ndarray      # bool — ring was full, a redundant keyframe
                                 # was replaced (see keyframes._eviction_slot)
    num_keyframes: jnp.ndarray   # int32
    submap_changed: jnp.ndarray  # bool
    spaciousness: jnp.ndarray    # f32
    keyframe_thresh_dist: jnp.ndarray  # f32 (adaptive)
    # health metrics (SURVEY §5 failure-detection gap — capability add)
    s2s_iterations: jnp.ndarray
    s2s_error: jnp.ndarray
    s2s_num_corr: jnp.ndarray
    s2s_converged: jnp.ndarray
    s2m_iterations: jnp.ndarray
    s2m_error: jnp.ndarray
    s2m_num_corr: jnp.ndarray
    s2m_converged: jnp.ndarray


def empty_keyframes(cfg: DloConfig) -> KeyframeStore:
    k = cfg.shapes.max_keyframes
    nk = cfg.shapes.n_keyframe
    return KeyframeStore(
        positions=jnp.zeros((k, 3), jnp.float32),
        quats=jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (k, 1)),
        points=jnp.full((k, nk, 3), 1e6, jnp.float32),
        masks=jnp.zeros((k, nk), bool),
        normals=jnp.zeros((k, nk, 3), jnp.float32),
        normals_valid=jnp.zeros((k, nk), bool),
        count=jnp.int32(0),
        seq=jnp.full((k,), -1, jnp.int32),
        health=jnp.zeros((k,), jnp.float32),
    )


def empty_state(cfg: DloConfig, initial_pose: jnp.ndarray | None = None) -> OdomState:
    n = cfg.shapes.n_scan
    k = cfg.shapes.max_keyframes
    s_flat = submap_flat_size(cfg)
    backend = resolve_backend(cfg)
    pose = jnp.eye(4, dtype=jnp.float32) if initial_pose is None else initial_pose
    # t_s2s must be a DISTINCT buffer: the step fns donate the state, and
    # donating the same buffer via two pytree leaves is an error
    t_s2s = jnp.array(pose, copy=True)
    empty_flat_pts = jnp.full((s_flat, 3), 1e6, jnp.float32)
    empty_flat_mask = jnp.zeros((s_flat,), bool)
    return OdomState(
        pose=pose,
        t_s2s=t_s2s,
        last_delta=jnp.eye(4, dtype=jnp.float32),
        prev_points=jnp.full((n, 3), 1e6, jnp.float32),
        prev_mask=jnp.zeros((n,), bool),
        prev_normals=jnp.zeros((n, 3), jnp.float32),
        prev_normals_valid=jnp.zeros((n,), bool),
        keyframes=empty_keyframes(cfg),
        submap_members=jnp.zeros((k,), bool),
        submap_points=empty_flat_pts,
        submap_mask=empty_flat_mask,
        submap_normals=jnp.zeros((s_flat, 3), jnp.float32),
        submap_normals_valid=jnp.zeros((s_flat,), bool),
        submap_grid=(
            hashgrid.build(
                empty_flat_pts,
                empty_flat_mask,
                cfg.gicp.s2m.max_correspondence_distance,
                cfg.shapes.submap_table_size,
            )
            if backend == "hashgrid"
            else None
        ),
        spaciousness=jnp.float32(-1.0),  # <0 = LPF unseeded (see adaptive.py)
        frame_idx=jnp.int32(0),
    )
