"""Pallas TPU kernel for 1-NN correspondence search — the hot loop.

The XLA brute-force path (ops/bruteforce.py) materializes a [Q, T] (or
[Q, tile]) distance intermediate in HBM every pass (~1.4 ms for 8k x 8k on
v5e, HBM-bound). This kernel keeps everything in VMEM: points live in
planar [3, N] layout (lane dimension = points, aligned to 128), each grid
step processes a BQ query tile against all T targets in BT chunks with a
running (min, argmin) carry, and only the final [Q] results ever touch
HBM. Arithmetic is per-coordinate broadcasting on the VPU — no [BQ,BT,3]
tensor, no gathers, no cancellation-prone norm expansion.

Speed-of-light estimate: Q*T*~11 VPU ops; 8k x 8k -> ~0.2 ms, 8k x 64k
submap pass -> ~1.5 ms/iteration.

Masking: invalid targets carry a +inf bias added to their distances;
invalid queries are filtered by the caller (contract matches
bruteforce.query_1nn / hashgrid.query_1nn).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from direct_lidar_odometry_tpu.ops import morton as _morton

_BQ = 128   # queries per grid step (smaller tile = tighter AABB = fewer
            # candidate chunks; 128 measured ~20% faster than 256 at
            # production submap shapes on v5e)
_BT = 2048  # target chunk per inner iteration (exhaustive kernel)
_BT_S = _morton.TARGET_CHUNK  # target chunk for the AABB-pruned kernel (finer = more skips)


def _nn1_kernel(q_ref, t_ref, tbias_ref, d2_ref, idx_ref, *, t_total: int, bt: int = _BT):
    """One BQ-tile of queries vs all targets.

    q_ref:    [3, BQ]   query tile (planar)
    t_ref:    [3, T]    all targets (planar, VMEM-resident)
    tbias_ref:[1, T]    0.0 valid / +inf invalid
    d2_ref:   [1, BQ]   out: best squared distance
    idx_ref:  [1, BQ]   out: best target index (int32)
    """
    qx = q_ref[0, :][:, None]  # [BQ, 1]
    qy = q_ref[1, :][:, None]
    qz = q_ref[2, :][:, None]

    n_chunks = t_total // bt

    def body(j, carry):
        best_d2, best_idx = carry  # [BQ], [BQ]
        off = j * bt
        tx = t_ref[0, pl.ds(off, bt)][None, :]  # [1, BT]
        ty = t_ref[1, pl.ds(off, bt)][None, :]
        tz = t_ref[2, pl.ds(off, bt)][None, :]
        bias = tbias_ref[0, pl.ds(off, bt)][None, :]
        dx = qx - tx
        dy = qy - ty
        dz = qz - tz
        d2 = dx * dx + dy * dy + dz * dz + bias  # [BQ, BT]
        arg = jnp.argmin(d2, axis=-1)  # [BQ]
        cmin = jnp.min(d2, axis=-1)    # [BQ]
        better = cmin < best_d2
        best_d2 = jnp.where(better, cmin, best_d2)
        best_idx = jnp.where(better, off + arg.astype(jnp.int32), best_idx)
        return best_d2, best_idx

    init = (
        jnp.full((_BQ,), jnp.inf, jnp.float32),
        jnp.full((_BQ,), -1, jnp.int32),
    )
    best_d2, best_idx = jax.lax.fori_loop(0, n_chunks, body, init)
    d2_ref[0, :] = best_d2
    idx_ref[0, :] = best_idx


def query_1nn(
    target_points: jnp.ndarray,
    target_mask: jnp.ndarray,
    queries: jnp.ndarray,
    query_mask: jnp.ndarray,
    radius,
    interpret: bool | None = None,
):
    """Contract-compatible with bruteforce.query_1nn: exact 1-NN in radius.

    target_points [T,3], queries [Q,3]; T % 2048 == 0, Q % 256 == 0.
    """
    t_total = target_points.shape[0]
    q_total = queries.shape[0]
    bt = min(_BT, t_total)
    assert t_total % bt == 0, (t_total, _BT)
    assert q_total % _BQ == 0, (q_total, _BQ)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tq = queries.T.astype(jnp.float32)           # [3, Q] planar
    tt = target_points.T.astype(jnp.float32)     # [3, T]
    tbias = jnp.where(target_mask, 0.0, jnp.inf).astype(jnp.float32)[None, :]

    d2, idx = pl.pallas_call(
        partial(_nn1_kernel, t_total=t_total, bt=bt),
        grid=(q_total // _BQ,),
        in_specs=[
            pl.BlockSpec((3, _BQ), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, t_total), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_total), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _BQ), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BQ), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, q_total), jnp.float32),
            jax.ShapeDtypeStruct((1, q_total), jnp.int32),
        ],
        interpret=interpret,
    )(tq, tt, tbias)

    best_d2 = d2[0]
    best_idx = idx[0]
    radius2 = jnp.asarray(radius, jnp.float32) ** 2
    found = query_mask & (best_d2 < radius2)
    return jnp.where(found, best_idx, -1), best_d2, found


# Packed candidate word: low 10 bits = chunk index (C <= 1024), upper 21
# bits = the tile-chunk AABB squared gap, floor-quantized to radius^2 /
# _GAP_SCALE units. Floor keeps the branch-and-bound break conservative
# (quantized gap <= true gap, so "q-gap > bound" implies "gap > bound").
_IDX_BITS = 10
_GAP_SCALE = (1 << 21) - 1


def candidate_chunks(
    qlo: jnp.ndarray, qhi: jnp.ndarray,
    chunk_lo: jnp.ndarray, chunk_hi: jnp.ndarray,
    radius: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-query-tile candidate target-chunk lists (the kd-tree analog).

    qlo/qhi [3, Qc], chunk_lo/chunk_hi [3, C] (masked AABBs from
    ops.morton.chunk_aabbs). Returns (cand [Qc, C] int32 — PACKED
    gap+index words (see _IDX_BITS) sorted ascending, candidates first —
    and counts [Qc] int32). A chunk is a candidate iff the AABB-AABB
    squared gap <= radius^2; conservative, so any target within ``radius``
    of any query in the tile lies in a candidate chunk. The ascending-gap
    order makes a branch-and-bound early exit exact: once a chunk's
    tile-level gap exceeds every query's current best, no later chunk can
    improve any query (kd-tree ``searchLevel`` analog,
    nanoflann_impl.hpp:1355-1418). Packing the gap into the index word
    keeps SMEM at one table — a separate f32 gap table overflows the 1 MB
    SMEM budget in batched mode. Empty chunks/tiles carry +-inf bounds
    and are never candidates.
    """
    c = chunk_lo.shape[1]
    assert c <= (1 << _IDX_BITS), (c, "chunk count exceeds packed index bits")
    g1 = chunk_lo.T[None, :, :] - qhi.T[:, None, :]   # [Qc, C, 3]
    g2 = qlo.T[:, None, :] - chunk_hi.T[None, :, :]
    g = jnp.maximum(jnp.maximum(g1, g2), 0.0)
    gap2 = jnp.sum(g * g, axis=-1)                    # [Qc, C]
    r2 = jnp.float32(radius * radius)
    visit = gap2 <= r2
    gq = jnp.clip(
        jnp.floor(gap2 * (_GAP_SCALE / float(radius * radius))), 0, _GAP_SCALE
    ).astype(jnp.int32)
    idx = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32), visit.shape)
    packed = (gq << _IDX_BITS) | idx
    # non-candidates sort last (max key), never reached (k < counts)
    packed = jnp.where(visit, packed, jnp.int32(0x7FFFFFFF))
    cand = jax.lax.sort(packed, dimension=1)
    counts = jnp.sum(visit, axis=1).astype(jnp.int32)
    return cand, counts


# Low mantissa bits of d2 sacrificed to carry the chunk-local point index
# through the min-reduction (one packed int min replaces argmin + min +
# two selects per chunk — measured 22% kernel win on v5e). The bit count
# tracks _BT_S; the masked value is <= the true d2 (conservative for the
# radius test and the B&B bound) with relative error <= 2^-14.
_PACK_BITS = max(1, (_BT_S - 1)).bit_length()
_PACK_MASK = (1 << _PACK_BITS) - 1
assert _BT_S <= (1 << _PACK_BITS)
# Loop unroll: chunks per branch-and-bound iteration. 2 measured best on
# v5e (halves loop/bound overhead; 4 overshoots the early exit).
_UNROLL = 2


def _nn1_pruned_kernel(
    cnt_ref, cand_ref, q_ref, t_ref, qinit_ref, d2_ref, idx_ref,
    *, qc: int, radius2: float,
):
    _pruned_kernel_body(cnt_ref, cand_ref, q_ref, t_ref, None, qinit_ref,
                        d2_ref, idx_ref, qc=qc, radius2=radius2)


def _nn1_pruned_kernel_mxu(
    cnt_ref, cand_ref, q_ref, t_ref, t2_ref, qinit_ref, d2_ref, idx_ref,
    *, qc: int, radius2: float,
):
    """MXU variant: see ``_pruned_kernel_body`` (t2_ref = [1,1,T] |t|^2)."""
    _pruned_kernel_body(cnt_ref, cand_ref, q_ref, t_ref, t2_ref, qinit_ref,
                        d2_ref, idx_ref, qc=qc, radius2=radius2)


def _pruned_kernel_body(
    cnt_ref, cand_ref, q_ref, t_ref, t2_ref, qinit_ref, d2_ref, idx_ref,
    *, qc: int, radius2: float,
):
    """One (batch b, query tile i) grid step vs its candidate chunks only.

    cnt_ref: [B*Qc] SMEM candidate counts; cand_ref: [B*Qc, C] SMEM
    packed gap+index candidate words (first cnt valid per row, ascending
    AABB gap — see candidate_chunks); q_ref [1, 3, BQ]; t_ref [1, 3, T]
    with invalid targets PRE-FOLDED to PAD coordinates (1e6 — their d2 is
    ~1e12, no bias row needed); qinit_ref [1, 1, BQ] per-query initial
    best (radius^2 for valid queries, 0 for padded/invalid ones so they
    never dominate the early-exit bound); outputs [1, 1, BQ]. d2 output
    carries the packed-index mantissa mask (callers recompute exact d2
    from the index — one [Q] gather). Non-candidate chunks cost nothing,
    not even a branch, and the loop stops early at the first chunk whose
    tile-level gap exceeds every query's current best (exact: gaps
    ascend, per-query gaps dominate the tile gap, and the packed gap is
    floor-quantized so the comparison stays conservative). Bests start at
    radius^2 — beyond that a miss is a miss. This is the kd-tree's
    branch-and-bound (``searchLevel``), at tile granularity, processing
    _UNROLL chunks per iteration.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    row = b * qc + i
    qx = q_ref[0, 0, :][:, None]  # [BQ, 1]
    qy = q_ref[0, 1, :][:, None]
    qz = q_ref[0, 2, :][:, None]
    cnt = cnt_ref[row]
    gap_unit = jnp.float32(radius2 / _GAP_SCALE)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_BQ, _BT_S), 1)

    n_c = cand_ref.shape[1]

    if t2_ref is not None:
        # MXU expansion path: d2 = |q|^2 + |t|^2 - 2 q.t with the cross
        # term as a [BQ,3]x[3,BT_S] matmul on the otherwise-idle MXU (K=3
        # underutilizes the systolic array but the VPU sheds ~8 of its 11
        # ops per pair). Expansion cancellation costs up to ~|q|^2 * 1e-7
        # absolute d2 error (~1e-3 m^2 at 100 m coords) — winner choice
        # between near-ties and borderline radius hits may differ from the
        # exact kernel, which is why this is the opt-in "pallas_mxu"
        # backend; callers always recompute the winner's d2 exactly.
        qmat = jnp.concatenate([qx, qy, qz], axis=1)        # [BQ, 3]
        q2 = (qx * qx + qy * qy + qz * qz)                   # [BQ, 1]

    def chunk_min(k):
        """Min over chunk cand[k]: (masked-d2 bits [BQ] int32, global idx)."""
        j = cand_ref[row, jnp.minimum(k, n_c - 1)] & ((1 << _IDX_BITS) - 1)
        off = pl.multiple_of(j * _BT_S, _BT_S)
        if t2_ref is not None:
            tmat = t_ref[0, :, pl.ds(off, _BT_S)]            # [3, BT_S]
            # HIGHEST pins the multiplies to f32 regardless of the ambient
            # jax.default_matmul_precision: with the default bf16 MXU passes
            # the cross term carries ~0.4% relative error (tens of m^2 at
            # map-scale coordinates), silently corrupting winner selection
            # for direct callers outside the f32_matmuls-wrapped pipeline.
            g = jax.lax.dot_general(
                qmat, tmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                                # [BQ, BT_S]
            t2 = t2_ref[0, 0, pl.ds(off, _BT_S)][None, :]
            # clamp: cancellation can go slightly negative, and the bit-
            # pattern ordering below needs d2 >= 0
            d2 = jnp.maximum(q2 + t2 - 2.0 * g, 0.0)
        else:
            tx = t_ref[0, 0, pl.ds(off, _BT_S)][None, :]
            ty = t_ref[0, 1, pl.ds(off, _BT_S)][None, :]
            tz = t_ref[0, 2, pl.ds(off, _BT_S)][None, :]
            dx = qx - tx
            dy = qy - ty
            dz = qz - tz
            d2 = dx * dx + dy * dy + dz * dz  # [BQ, BT_S], >= 0
        # positive-float bit patterns order like the floats: mask the low
        # mantissa bits, or-in the lane index, ONE int min-reduce
        p = (d2.view(jnp.int32) & jnp.int32(~_PACK_MASK)) | lane
        pmin = jnp.min(p, axis=-1)  # [BQ]
        return pmin & jnp.int32(~_PACK_MASK), off + (pmin & _PACK_MASK)

    def cond(carry):
        _, _, k, bound = carry
        # & does not short-circuit: clamp the read for the k == cnt probe
        gapq = (cand_ref[row, jnp.minimum(k, n_c - 1)] >> _IDX_BITS).astype(
            jnp.float32
        )
        return (k < cnt) & (gapq * gap_unit <= bound)

    def body(carry):
        bp, bi, k, _ = carry
        for u in range(_UNROLL):
            cm, gi = chunk_min(k + u)
            if u > 0:
                # the trailing unrolled chunk may run past cnt: neutralize
                cm = jnp.where(k + u < cnt, cm, jnp.int32(0x7F000000))
            better = cm < bp
            bp = jnp.where(better, cm, bp)
            bi = jnp.where(better, gi, bi)
        return (bp, bi, k + _UNROLL, jnp.max(bp.view(jnp.float32)))

    best0 = qinit_ref[0, 0, :]  # [BQ]
    b0 = best0.view(jnp.int32) & jnp.int32(~_PACK_MASK)
    init = (
        b0,
        jnp.full((_BQ,), -1, jnp.int32),
        jnp.int32(0),
        jnp.max(b0.view(jnp.float32)),
    )
    bp, best_idx, _, _ = jax.lax.while_loop(cond, body, init)
    d2_ref[0, 0, :] = bp.view(jnp.float32)
    idx_ref[0, 0, :] = best_idx


# SMEM budget for the per-tile candidate tables ([B*Qc, C] int32 + counts).
# The hardware cap is 1 MB and the pallas pipeline DOUBLE-BUFFERS SMEM
# inputs (measured: a 532 KB table compiles to a 1.01 MB smem program), so
# the per-call budget is under half the cap; the batch axis splits across
# pallas calls when a single grid would overflow (production shapes at
# B >= 8: 8 * 256 tiles * 65 words * 4 B = 0.53 MB -> 1.06 MB buffered).
_SMEM_BUDGET_BYTES = 450_000


def _smem_subbatch(b_total: int, qc: int, n_c: int) -> int:
    per_b = qc * (n_c + 1) * 4
    return max(1, min(b_total, _SMEM_BUDGET_BYTES // max(per_b, 1)))


def _pruned_1nn_batched(
    target_points, target_mask, chunk_lo, chunk_hi, queries, query_mask,
    radius: float, interpret: bool, mxu: bool = False,
):
    """Batched pruned search. All inputs carry a leading [B] axis."""
    b_total = target_points.shape[0]
    qc = queries.shape[1] // _BQ
    n_c = chunk_lo.shape[-1]
    bs = _smem_subbatch(b_total, qc, n_c)
    if bs < b_total:
        parts = [
            _pruned_1nn_one(
                target_points[i : i + bs], target_mask[i : i + bs],
                chunk_lo[i : i + bs], chunk_hi[i : i + bs],
                queries[i : i + bs], query_mask[i : i + bs],
                radius, interpret, mxu,
            )
            for i in range(0, b_total, bs)
        ]
        return tuple(
            jnp.concatenate([p[k] for p in parts], axis=0) for k in range(3)
        )
    return _pruned_1nn_one(
        target_points, target_mask, chunk_lo, chunk_hi, queries, query_mask,
        radius, interpret, mxu,
    )


def _pruned_1nn_one(
    target_points, target_mask, chunk_lo, chunk_hi, queries, query_mask,
    radius: float, interpret: bool, mxu: bool = False,
):
    from direct_lidar_odometry_tpu.ops import morton

    b_total, t_total = target_points.shape[0], target_points.shape[1]
    q_total = queries.shape[1]
    assert t_total % _BT_S == 0, (t_total, _BT_S)
    assert q_total % _BQ == 0, (q_total, _BQ)
    qc = q_total // _BQ

    qlo, qhi = jax.vmap(lambda p, m: morton.chunk_aabbs(p, m, _BQ))(
        queries, query_mask
    )  # [B, 3, Qc]
    cand, counts = jax.vmap(
        lambda a, b, c, d: candidate_chunks(a, b, c, d, radius)
    )(qlo, qhi, chunk_lo, chunk_hi)  # [B, Qc, C], [B, Qc]
    n_c = cand.shape[-1]

    tq = jnp.swapaxes(queries, 1, 2).astype(jnp.float32)        # [B, 3, Q]
    # invalid targets folded to PAD coordinates (d2 ~ 1e12): no bias row,
    # one fewer load + add per chunk visit
    tt = jnp.swapaxes(
        jnp.where(target_mask[..., None], target_points, 1e6), 1, 2
    ).astype(jnp.float32)                                        # [B, 3, T]
    r2 = float(radius) ** 2
    qinit = jnp.where(query_mask, jnp.float32(r2), 0.0)[:, None, :]

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # counts [B*Qc]
        pl.BlockSpec(memory_space=pltpu.SMEM),  # cand [B*Qc, C] packed
        pl.BlockSpec((1, 3, _BQ), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 3, t_total), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((1, 1, _BQ), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
    ]
    inputs = [
        counts.reshape(b_total * qc),
        cand.reshape(b_total * qc, n_c),
        tq, tt, qinit,
    ]
    if mxu:
        # |t|^2 row for the expansion; pad coords (1e6) give ~3e12 — the
        # same never-wins masking as the exact path
        t2 = jnp.sum(tt * tt, axis=1, keepdims=True)  # [B, 1, T]
        in_specs.insert(4, pl.BlockSpec(
            (1, 1, t_total), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
        ))
        inputs.insert(4, t2)
        kernel = partial(_nn1_pruned_kernel_mxu, qc=qc, radius2=r2)
    else:
        kernel = partial(_nn1_pruned_kernel, qc=qc, radius2=r2)

    d2, idx = pl.pallas_call(
        kernel,
        grid=(b_total, qc),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, _BQ), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _BQ), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_total, 1, q_total), jnp.float32),
            jax.ShapeDtypeStruct((b_total, 1, q_total), jnp.int32),
        ],
        interpret=interpret,
    )(*inputs)

    best_idx = idx[:, 0, :]
    # the kernel's d2 carries the packed-index mantissa mask; recompute the
    # exact d2 from the winning index (one [Q] gather — keeps the public
    # contract bit-exact with the brute-force path)
    j = jnp.clip(best_idx, 0, None)
    sel = jnp.take_along_axis(target_points, j[..., None], axis=1)  # [B, Q, 3]
    best_d2 = jnp.sum((queries - sel) ** 2, axis=-1)
    found = query_mask & (best_idx >= 0) & (best_d2 < r2)
    best_d2 = jnp.where(best_idx >= 0, best_d2, jnp.inf)
    return jnp.where(found, best_idx, -1), best_d2, found


@lru_cache(maxsize=None)
def _pruned_1nn_fn(radius: float, interpret: bool, mxu: bool = False):
    """custom_vmap wrapper so ``jax.vmap`` (parallel/batched.py) maps onto
    the natively-batched grid instead of pallas' default batching (which
    cannot express per-batch SMEM candidate lists)."""

    def single(tp, tm, clo, chi, q, qm):
        out = _pruned_1nn_batched(
            tp[None], tm[None], clo[None], chi[None], q[None], qm[None],
            radius, interpret, mxu,
        )
        return jax.tree.map(lambda x: x[0], out)

    f = jax.custom_batching.custom_vmap(single)

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        full = tuple(
            a if ab else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, ab in zip(args, in_batched)
        )
        out = _pruned_1nn_batched(*full, radius, interpret, mxu)
        return out, (True, True, True)

    return f


def query_1nn_sorted(
    target_points: jnp.ndarray,
    target_mask: jnp.ndarray,
    chunk_lo: jnp.ndarray,
    chunk_hi: jnp.ndarray,
    queries: jnp.ndarray,
    query_mask: jnp.ndarray,
    radius: float,
    interpret: bool | None = None,
    mxu: bool = False,
):
    """Exact 1-NN within ``radius`` over a Morton-sorted target cloud.

    ``chunk_lo``/``chunk_hi`` are [3, T//512] masked chunk AABBs from
    :func:`ops.morton.chunk_aabbs`. Targets (and ideally queries) should be
    Z-ordered — correctness never depends on it, only the skip rate.
    ``radius`` must be a static Python float (it is baked into the
    candidate pruning test). Results match :func:`query_1nn` exactly for
    every query whose nearest neighbor lies within ``radius``; other
    queries report ``found=False`` either way.

    ``mxu=True`` selects the distance-expansion kernel (cross term on the
    MXU): winner selection becomes approximate within ~|coord|^2 * 1e-7
    m^2 (near-ties and borderline radius hits may differ), though the
    reported d2 stays exact. Used by the opt-in "pallas_mxu" backend.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    fn = _pruned_1nn_fn(float(radius), bool(interpret), bool(mxu))
    return fn(
        target_points, target_mask, chunk_lo, chunk_hi, queries, query_mask
    )
