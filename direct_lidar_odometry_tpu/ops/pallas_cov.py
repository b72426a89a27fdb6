"""Pallas TPU kernel: fixed-radius neighborhood covariance accumulation.

Normal estimation needs each point's local covariance. The reference takes
exactly k neighbors from a kd-tree (``nano_gicp_impl.hpp:310-321``); the
XLA brute-force equivalent (top_k over a [chunk, T] distance matrix) costs
~75 ms for a 32k scan on TPU — dominated by HBM-materialized distances and
the top-k selection.

This kernel instead accumulates *all* neighbors within a fixed radius in
one VMEM-resident pass: per (query, target) pair it computes the
query-relative offset (so second moments never suffer catastrophic
cancellation — offsets are bounded by the radius), a radius test, and 10
masked moment accumulations (count, Sum d, Sum d d^T). On voxel-downsampled
clouds the point density is uniform by construction, so a radius of a few
voxel sizes yields a stable neighbor count everywhere except the sparse
far field (masked out via min_neighbors, like the reference's degenerate
guard rails).

Covariance from raw relative moments: mu = S1/n, C = S2/n - mu mu^T.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BQ = 256
_BT = 2048


def _cov_kernel(q_ref, t_ref, tbias_ref, out_ref, *, t_total: int, radius2: float):
    """q_ref [3,BQ]; t_ref [3,T]; tbias [1,T]; out_ref [10, BQ]:
    rows = (count, sx, sy, sz, sxx, sxy, sxz, syy, syz, szz)."""
    qx = q_ref[0, :][:, None]
    qy = q_ref[1, :][:, None]
    qz = q_ref[2, :][:, None]

    n_chunks = t_total // _BT

    def body(j, acc):
        off = j * _BT
        tx = t_ref[0, pl.ds(off, _BT)][None, :]
        ty = t_ref[1, pl.ds(off, _BT)][None, :]
        tz = t_ref[2, pl.ds(off, _BT)][None, :]
        bias = tbias_ref[0, pl.ds(off, _BT)][None, :]
        dx = tx - qx  # [BQ, BT] query-relative offsets
        dy = ty - qy
        dz = tz - qz
        d2 = dx * dx + dy * dy + dz * dz + bias
        w = (d2 <= radius2).astype(jnp.float32)
        wdx = w * dx
        wdy = w * dy
        wdz = w * dz
        return (
            acc[0] + jnp.sum(w, axis=1),
            acc[1] + jnp.sum(wdx, axis=1),
            acc[2] + jnp.sum(wdy, axis=1),
            acc[3] + jnp.sum(wdz, axis=1),
            acc[4] + jnp.sum(wdx * dx, axis=1),
            acc[5] + jnp.sum(wdx * dy, axis=1),
            acc[6] + jnp.sum(wdx * dz, axis=1),
            acc[7] + jnp.sum(wdy * dy, axis=1),
            acc[8] + jnp.sum(wdy * dz, axis=1),
            acc[9] + jnp.sum(wdz * dz, axis=1),
        )

    init = tuple(jnp.zeros((_BQ,), jnp.float32) for _ in range(10))
    acc = jax.lax.fori_loop(0, n_chunks, body, init)
    for i in range(10):
        out_ref[i, :] = acc[i]


def radius_moments(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    queries: jnp.ndarray,
    radius: float,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """[T,3],[T],[Q,3] -> [Q,10] raw relative moments within ``radius``."""
    t_total = points.shape[0]
    q_total = queries.shape[0]
    assert t_total % _BT == 0, (t_total, _BT)
    assert q_total % _BQ == 0, (q_total, _BQ)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tq = queries.T.astype(jnp.float32)
    tt = points.T.astype(jnp.float32)
    tbias = jnp.where(mask, 0.0, jnp.inf).astype(jnp.float32)[None, :]

    out = pl.pallas_call(
        partial(_cov_kernel, t_total=t_total, radius2=float(radius) ** 2),
        grid=(q_total // _BQ,),
        in_specs=[
            pl.BlockSpec((3, _BQ), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, t_total), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_total), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((10, _BQ), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((10, q_total), jnp.float32),
        interpret=interpret,
    )(tq, tt, tbias)
    return out.T  # [Q, 10]


def moments_to_cov(m: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[Q,10] -> (cov [Q,3,3], count [Q]). Query-relative, so well-conditioned."""
    n = jnp.maximum(m[:, 0], 1.0)
    mu = m[:, 1:4] / n[:, None]
    sxx, sxy, sxz = m[:, 4] / n, m[:, 5] / n, m[:, 6] / n
    syy, syz, szz = m[:, 7] / n, m[:, 8] / n, m[:, 9] / n
    exx = sxx - mu[:, 0] * mu[:, 0]
    exy = sxy - mu[:, 0] * mu[:, 1]
    exz = sxz - mu[:, 0] * mu[:, 2]
    eyy = syy - mu[:, 1] * mu[:, 1]
    eyz = syz - mu[:, 1] * mu[:, 2]
    ezz = szz - mu[:, 2] * mu[:, 2]
    row0 = jnp.stack([exx, exy, exz], axis=-1)
    row1 = jnp.stack([exy, eyy, eyz], axis=-1)
    row2 = jnp.stack([exz, eyz, ezz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2), m[:, 0]
