"""Checkpoint/resume for odometry state — a capability the reference lacks
(SURVEY.md §5: trajectory/keyframes/map live only in RAM).

The whole per-sequence state is one pytree of arrays, so checkpointing is
a flatten + npz (portable, no orbax dependency needed for arrays this
small). Resume restores bit-identical continuation (tested).

Format v2 (round 5): arrays are keyed by their pytree FIELD PATH (e.g.
``state/keyframes/seq``) plus a ``format_version`` stamp, so adding or
reordering state fields no longer silently mis-assigns positionally
saved leaves (round-4 advisor finding: v1 ``leaf_{i}`` keys broke with a
bare KeyError when KeyframeStore grew seq/health). v1 checkpoints load
only if the leaf count still matches, otherwise a clear error names the
version mismatch; v2 checkpoints missing newly added fields fall back to
the template's fresh value (forward migration).
"""

from __future__ import annotations

import json

import numpy as np
import jax

from direct_lidar_odometry_tpu.config import DloConfig
from direct_lidar_odometry_tpu.odometry.state import OdomState
from direct_lidar_odometry_tpu.odometry import pipeline

FORMAT_VERSION = 2


def _path_str(path) -> str:
    parts = []
    for p in path:
        name = getattr(p, "name", None)
        if name is None:
            name = str(getattr(p, "idx", getattr(p, "key", p)))
        parts.append(str(name))
    return "state/" + "/".join(parts)


def save_state(path: str, state: OdomState, extra: dict | None = None) -> None:
    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {_path_str(kp): np.asarray(x) for kp, x in flat}
    arrays["format_version"] = np.asarray(FORMAT_VERSION)
    if extra:
        arrays["extra_json"] = np.frombuffer(
            json.dumps(extra).encode(), dtype=np.uint8
        )
    np.savez_compressed(path, **arrays)


def load_state(path: str, cfg: DloConfig) -> tuple[OdomState, dict]:
    """Restore a state saved under the same config (shapes must match)."""
    data = np.load(path)
    template = pipeline.fresh_state(cfg)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    version = int(data["format_version"]) if "format_version" in data else 1
    if version == 1:
        n = len(flat)
        missing = [i for i in range(n) if f"leaf_{i}" not in data]
        if missing or f"leaf_{n}" in data:
            raise ValueError(
                f"checkpoint {path!r} is format v1 (positional leaves) and "
                f"predates fields of the current OdomState (expected {n} "
                "leaves) — it cannot be mapped safely. Re-save it with the "
                "version of the code that wrote it, or restart the sequence."
            )
        leaves = [data[f"leaf_{i}"] for i in range(n)]
    else:
        leaves = []
        for kp, tmpl_leaf in flat:
            key = _path_str(kp)
            if key in data:
                leaves.append(data[key])
            else:
                # forward migration: a field added after the save keeps its
                # fresh-state value (e.g. keyframes/seq=-1, health=0)
                leaves.append(np.asarray(tmpl_leaf))
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    extra = {}
    if "extra_json" in data:
        extra = json.loads(bytes(data["extra_json"]).decode())
    return state, extra
