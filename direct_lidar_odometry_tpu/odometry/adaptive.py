"""Adaptive parameters from the spaciousness metric.

Reference: ``computeSpaciousness`` (``odom.cc:990-1010``) — low-pass
filtered median point range — and ``setAdaptiveParams``
(``odom.cc:1188-1204``) — a step map from spaciousness to the keyframe
distance threshold (also reused as the concave-hull alpha).

One deliberate improvement: the reference computes spaciousness on a
detached thread and *may* consume the previous frame's value
(``odom.cc:653-659``); here it is computed synchronously, deterministically.
"""

from __future__ import annotations

import jax.numpy as jnp

from direct_lidar_odometry_tpu.ops import preprocess


def update_spaciousness(
    prev: jnp.ndarray, points: jnp.ndarray, mask: jnp.ndarray, alpha: float = 0.95,
    max_samples: int = 4096,
) -> jnp.ndarray:
    """s_t = alpha * s_{t-1} + (1-alpha) * median(range). odom.cc:1004-1006.

    The reference seeds the LPF with the first median (static local
    ``median_prev = median_curr``); prev < 0 marks "unseeded" here.

    The median is taken over an even-stride subsample capped at
    ``max_samples`` points: a masked median lowers to a full sort, and at
    32k points that sort costs more than the metric is worth. The clouds
    are Morton-ordered here, so an even stride is spatially uniform; the
    sampling error of a 4096-point median is ~1/sqrt(n) of the range
    spread — far below the 5 m steps of the threshold map this feeds
    (odom.cc:1188-1199).
    """
    n = points.shape[-2]
    if n > max_samples:
        stride = (n + max_samples - 1) // max_samples
        points = points[..., ::stride, :]
        mask = mask[..., ::stride]
    med = preprocess.masked_median(preprocess.ranges(points), mask)
    seeded = prev >= 0.0
    prev_eff = jnp.where(seeded, prev, med)
    return alpha * prev_eff + (1.0 - alpha) * med


def keyframe_thresh_from_spaciousness(s: jnp.ndarray) -> jnp.ndarray:
    """Step map, reference odom.cc:1188-1199."""
    return jnp.where(
        s > 20.0,
        10.0,
        jnp.where(s > 10.0, 5.0, jnp.where(s > 5.0, 1.0, 0.5)),
    ).astype(jnp.float32)
