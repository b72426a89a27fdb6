"""Checkpoint/resume for odometry state — a capability the reference lacks
(SURVEY.md §5: trajectory/keyframes/map live only in RAM).

The whole per-sequence state is one pytree of arrays, so checkpointing is
a flatten + npz (portable, no orbax dependency needed for arrays this
small). Resume restores bit-identical continuation (tested).
"""

from __future__ import annotations

import json

import numpy as np
import jax

from direct_lidar_odometry_tpu.config import DloConfig
from direct_lidar_odometry_tpu.odometry.state import OdomState
from direct_lidar_odometry_tpu.odometry import pipeline


def save_state(path: str, state: OdomState, extra: dict | None = None) -> None:
    leaves, _ = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    if extra:
        arrays["extra_json"] = np.frombuffer(
            json.dumps(extra).encode(), dtype=np.uint8
        )
    np.savez_compressed(path, **arrays)


def load_state(path: str, cfg: DloConfig) -> tuple[OdomState, dict]:
    """Restore a state saved under the same config (shapes must match)."""
    data = np.load(path)
    template = pipeline.fresh_state(cfg)
    _, treedef = jax.tree_util.tree_flatten(template)
    n = len(jax.tree_util.tree_leaves(template))
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    extra = {}
    if "extra_json" in data:
        extra = json.loads(bytes(data["extra_json"]).decode())
    return state, extra
