"""Fused GICP linearization kernel — NN search + Mahalanobis + H/b in one
VMEM pass.

This is the round-2 performance kernel. One GICP iteration in the reference
is three OpenMP loops (``nano_gicp_impl.hpp:173-270``): 1-NN correspondence
search, per-point Mahalanobis ``(C_B + T C_A T^T)^{-1}``, and the
Gauss-Newton H/b accumulation with ``J = [skew(Tp) | -I]``. Round 1 mapped
those to a Pallas 1-NN kernel followed by XLA gathers + einsum reductions
over ``[Ns, 3, 3]`` HBM intermediates; this kernel fuses the whole
linearization so each iteration reads the target cloud once and writes only
``[Qc, 32]`` per-tile H/b partials plus an ``[8, Q]`` frozen-correspondence
payload (needed by the Levenberg-Marquardt gain test,
``lsq_registration_impl.hpp:180-204``). No per-point ``[Ns, 3, 3]`` array
ever touches HBM and no gather ever runs: the best target's position and
normal are selected inside the kernel with a one-hot MXU matmul.

Distance math is the MXU-friendly expansion ``|q-t|^2 = |q-c|^2 + |t-c|^2
- 2 (q-c)·(t-c)`` with ``c`` the (masked) query-tile centroid: centering
keeps coordinate magnitudes at candidate-neighborhood scale (tile extent +
radius + chunk extent), so the f32 cancellation error is <= ~1e-6 m^2 —
far below any correspondence-choice or gating sensitivity. The cross term
is a ``[BQ,3] x [3,BT]`` matmul on the MXU; the elementwise work per pair
drops from ~11 VPU ops (coordinate-difference form) to ~3.

Pruning is identical to ops/pallas_nn.py: Morton-sorted targets, per-chunk
AABBs, per-query-tile candidate chunk lists sorted by AABB gap (SMEM), and
a branch-and-bound early exit once the next chunk's gap exceeds every
query's current best (the kd-tree ``searchLevel`` analog at tile
granularity, ``nanoflann_impl.hpp:1355-1418``).

PLANE covariances enter as normals only (see registration/covariance.py):
``C_B + R C_A R^T = 2I - (1-eps)(n_b n_b^T + m m^T)`` with ``m = R n_a``,
inverted analytically per query on the VPU.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from direct_lidar_odometry_tpu.ops.pallas_nn import (
    _BQ,
    _BT_S,
    _IDX_BITS,
    _GAP_SCALE,
    candidate_chunks,
)

_BIG = 1e30  # finite "invalid" distance bias (inf * 0 = NaN in the one-hot
             # payload matmul; 1e30 never wins a min). Python float — a
             # jnp scalar here would be captured by the kernel as a traced
             # constant, which pallas_call rejects.

# hb partial row layout (slot -> value), summed over tiles by the caller:
#   0:6   upper triangle of H_tl = sum w * S^T M S   (00,01,02,11,12,22)
#   6:15  H_tr = -sum w * S^T M, row-major
#   15:21 upper triangle of H_br = sum w * M
#   21:27 b = [sum S^T M e, -sum M e]
#   27    error = sum e^T M e
#   28    n_corr = sum w
_N_SLOTS = 29


def _fused_linearize_kernel(
    cnt_ref, cand_ref, q_ref, s_ref, sidx_ref, t_ref,
    hb_ref, pay_ref, idx_ref, acc_ref,
    *, qc: int, radius2: float, plane_eps: float,
):
    """One (batch b, query tile i) grid step.

    q_ref [1, 8, BQ]: rows 0-2 transformed source xyz, 3-5 rotated source
    normal m = R n_a, 6 query weight (mask & normals_valid, 0/1), 7 initial
    best distance: seed d2 when warm-started, radius^2 for valid unseeded
    lanes, 0 for invalid lanes (they must never pin the branch-and-bound
    bound).
    s_ref [1, 8, BQ]: warm-start payload for seeded lanes — rows 0-2 the
    seed target point, 3-5 its normal, 6 its normals_valid; zeros when
    cold. Seeding with the previous GICP iteration's correspondence
    collapses the initial bound from radius^2 to the actual neighbor
    distance, so the gap-sorted traversal exits after the few
    AABB-overlapping chunks — the dominant per-iteration saving, and
    EXACT: every chunk that could beat the seed is still visited.
    sidx_ref [1, 1, BQ] int32: seed target index, -1 when cold.
    t_ref [1, 8, T]: rows 0-2 target xyz, 3-5 target normal, 6 target
    normals_valid (0/1), 7 target mask (0/1).
    hb_ref [1, 32, 8]: per-tile packed partials (_N_SLOTS rows used, all 8
    lanes of a row carry the same sum). The slot vectors are staged as
    rows of the [32, BQ] VMEM scratch ``acc_ref`` and lane-reduced by one
    MXU dot against ones — Mosaic lowers row stores and 2D dots natively
    where it rejects 29-way vector stacks and scalar SMEM stores
    ("Offset change" / "offset mismatch on non-concat dimension").
    pay_ref [1, 8, BQ]: frozen-correspondence payload — rows 0-2 mu_b,
    3-5 n_b, 6 final correspondence weight w, 7 best squared distance.
    idx_ref [1, 1, BQ]: best target index, -1 when no correspondence.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    row = b * qc + i

    qx = q_ref[0, 0, :]
    qy = q_ref[0, 1, :]
    qz = q_ref[0, 2, :]
    qw = q_ref[0, 6, :]
    qinit = q_ref[0, 7, :]

    # masked query centroid: padded/invalid lanes can carry huge coords
    wsum = jnp.maximum(jnp.sum(qw), 1.0)
    cx = jnp.sum(qx * qw) / wsum
    cy = jnp.sum(qy * qw) / wsum
    cz = jnp.sum(qz * qw) / wsum
    qcx = qx - cx
    qcy = qy - cy
    qcz = qz - cz
    qn = qcx * qcx + qcy * qcy + qcz * qcz           # [BQ]
    qc3 = jnp.stack([qcx, qcy, qcz], axis=1)          # [BQ, 3]

    col = jax.lax.broadcasted_iota(jnp.int32, (_BQ, _BT_S), 1)
    cnt = cnt_ref[row]
    gap_unit = jnp.float32(radius2 / _GAP_SCALE)
    n_c = cand_ref.shape[1]

    def cond(carry):
        _, _, _, k, bound = carry
        gapq = (cand_ref[row, jnp.minimum(k, n_c - 1)] >> _IDX_BITS).astype(
            jnp.float32
        )
        return (k < cnt) & (gapq * gap_unit <= bound)

    def body(carry):
        best_d2, best_idx, pay6, k, _ = carry
        j = cand_ref[row, k] & ((1 << _IDX_BITS) - 1)
        off = pl.multiple_of(j * _BT_S, _BT_S)
        chunk = t_ref[0, :, pl.ds(off, _BT_S)]        # [8, BT_S]
        bias = (1.0 - chunk[7, :]) * _BIG             # [BT_S]
        tcx = chunk[0, :] - cx
        tcy = chunk[1, :] - cy
        tcz = chunk[2, :] - cz
        tn = tcx * tcx + tcy * tcy + tcz * tcz + bias  # [BT_S]
        tc3 = jnp.stack([tcx, tcy, tcz], axis=0)       # [3, BT_S]
        qt = jax.lax.dot_general(
            qc3, tc3, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # [BQ, BT_S] on MXU
        d2 = (qn[:, None] - 2.0 * qt) + tn[None, :]
        arg = jnp.argmin(d2, axis=-1)                  # [BQ]
        cmin = jnp.min(d2, axis=-1)
        better = cmin < best_d2
        sel = (col == arg[:, None]).astype(jnp.float32)  # one-hot [BQ, BT_S]
        selpay = jax.lax.dot_general(
            sel, chunk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # [BQ, 8] on MXU
        pay6 = tuple(
            jnp.where(better, selpay[:, c], pay6[c]) for c in range(7)
        )
        best_d2 = jnp.where(better, cmin, best_d2)
        best_idx = jnp.where(better, off + arg.astype(jnp.int32), best_idx)
        return (best_d2, best_idx, pay6, k + 1, jnp.max(best_d2))

    init = (
        qinit,
        sidx_ref[0, 0, :],
        tuple(s_ref[0, c, :] for c in range(7)),
        jnp.int32(0),
        jnp.max(qinit),
    )
    best_d2, best_idx, pay6, visits, _ = jax.lax.while_loop(cond, body, init)

    # ---- per-query GICP linearization (all [BQ]-wide VPU math) ----
    found = best_idx >= 0
    bx, by, bz, nx, ny, nz, tval = pay6
    w = jnp.where(found & (qw > 0.5) & (tval > 0.5), 1.0, 0.0)

    mx = q_ref[0, 3, :]
    my = q_ref[0, 4, :]
    mz = q_ref[0, 5, :]

    # A = C_B + R C_A R^T = 2I - a (n n^T + m m^T), a = 1 - eps
    a = jnp.float32(1.0 - plane_eps)
    a00 = 2.0 - a * (nx * nx + mx * mx)
    a01 = -a * (nx * ny + mx * my)
    a02 = -a * (nx * nz + mx * mz)
    a11 = 2.0 - a * (ny * ny + my * my)
    a12 = -a * (ny * nz + my * mz)
    a22 = 2.0 - a * (nz * nz + mz * mz)

    # M = w * A^{-1} (analytic adjugate; A is SPD by construction)
    co00 = a11 * a22 - a12 * a12
    co01 = a02 * a12 - a01 * a22
    co02 = a01 * a12 - a02 * a11
    det = a00 * co00 + a01 * co01 + a02 * co02
    inv_det = w / jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
    m00 = co00 * inv_det
    m01 = co01 * inv_det
    m02 = co02 * inv_det
    m11 = (a00 * a22 - a02 * a02) * inv_det
    m12 = (a01 * a02 - a00 * a12) * inv_det
    m22 = (a00 * a11 - a01 * a01) * inv_det

    # e = mu_b - p (zero when w = 0 via M)
    ex = bx - qx
    ey = by - qy
    ez = bz - qz
    mex = m00 * ex + m01 * ey + m02 * ez
    mey = m01 * ex + m11 * ey + m12 * ez
    mez = m02 * ex + m12 * ey + m22 * ez
    err = ex * mex + ey * mey + ez * mez

    # H_tr = S M with S = skew(p): column k of S M is p x M[:,k]
    def cross(vx, vy, vz, ux, uy, uz):
        return (vy * uz - vz * uy, vz * ux - vx * uz, vx * uy - vy * ux)

    t00, t10, t20 = cross(qx, qy, qz, m00, m01, m02)
    t01, t11, t21 = cross(qx, qy, qz, m01, m11, m12)
    t02, t12, t22 = cross(qx, qy, qz, m02, m12, m22)

    # H_tl column k = -p x (M s_k), s_k = p x e_k
    # s_0 = (0, pz, -py), s_1 = (-pz, 0, px), s_2 = (py, -px, 0)
    d0x = m01 * qz - m02 * qy
    d0y = m11 * qz - m12 * qy
    d0z = m12 * qz - m22 * qy
    d1x = m02 * qx - m00 * qz
    d1y = m12 * qx - m01 * qz
    d1z = m22 * qx - m02 * qz
    d2x = m00 * qy - m01 * qx
    d2y = m01 * qy - m11 * qx
    d2z = m02 * qy - m12 * qx
    c0x, _, _ = cross(qx, qy, qz, d0x, d0y, d0z)
    c1x, c1y, _ = cross(qx, qy, qz, d1x, d1y, d1z)
    c2x, c2y, _ = cross(qx, qy, qz, d2x, d2y, d2z)
    h00 = -c0x
    h01 = -c1x
    h02 = -c2x
    h11 = -c1y
    h12 = -c2y  # = (-p x D[:,2])[1]; symmetry: H_tl[1,2] = H_tl[2,1] = -c2y
    # H_tl[2,2] = (-p x D[:,2])[2]
    h22 = -(qx * d2y - qy * d2x)

    # b_top = S^T (M e) = -p x me ; b_bot = -M e
    btx, bty, btz = cross(qx, qy, qz, mex, mey, mez)
    b0 = -btx
    b1 = -bty
    b2 = -btz

    # slots 29/30: B&B diagnostics — chunks visited / candidates listed
    # per tile (caller divides by BQ; see fused_linearize return)
    vis = jnp.full((_BQ,), visits.astype(jnp.float32) / _BQ)
    cnd = jnp.full((_BQ,), cnt.astype(jnp.float32) / _BQ)
    slot_vals = (
        h00, h01, h02, h11, h12, h22,
        t00, t01, t02, t10, t11, t12, t20, t21, t22,
        m00, m01, m02, m11, m12, m22,
        b0, b1, b2, -mex, -mey, -mez,
        err, w, vis, cnd,
    )  # _N_SLOTS (+2 diagnostics) [BQ]-vectors
    for k, v in enumerate(slot_vals):
        acc_ref[k, :] = v
    for k in range(len(slot_vals), 32):
        acc_ref[k, :] = jnp.zeros((_BQ,), jnp.float32)
    ones = jnp.ones((_BQ, 8), jnp.float32)
    hb_ref[0, :, :] = jax.lax.dot_general(
        acc_ref[:, :], ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    pay_ref[0, 0, :] = bx
    pay_ref[0, 1, :] = by
    pay_ref[0, 2, :] = bz
    pay_ref[0, 3, :] = nx
    pay_ref[0, 4, :] = ny
    pay_ref[0, 5, :] = nz
    pay_ref[0, 6, :] = w
    pay_ref[0, 7, :] = best_d2
    idx_ref[0, 0, :] = jnp.where(w > 0.5, best_idx, -1)


def _fused_linearize_batched(
    t_pack, chunk_lo, chunk_hi, q_pack, s_pack, seed_idx,
    radius: float, plane_eps: float, interpret: bool,
):
    """Batched fused linearize. t_pack [B, 8, T], q_pack/s_pack [B, 8, Q],
    seed_idx [B, 1, Q] int32."""
    from direct_lidar_odometry_tpu.ops import morton

    b_total, _, t_total = t_pack.shape
    q_total = q_pack.shape[2]
    assert t_total % _BT_S == 0, (t_total, _BT_S)
    assert q_total % _BQ == 0, (q_total, _BQ)
    qc = q_total // _BQ

    qpts = jnp.swapaxes(q_pack[:, 0:3, :], 1, 2)      # [B, Q, 3]
    qmask = q_pack[:, 6, :] > 0.5
    qlo, qhi = jax.vmap(lambda p, m: morton.chunk_aabbs(p, m, _BQ))(
        qpts, qmask
    )
    cand, counts = jax.vmap(
        lambda a, b, c, d: candidate_chunks(a, b, c, d, radius)
    )(qlo, qhi, chunk_lo, chunk_hi)
    n_c = cand.shape[-1]
    r2 = float(radius) ** 2

    hb, pay, idx = pl.pallas_call(
        partial(_fused_linearize_kernel, qc=qc, radius2=r2,
                plane_eps=plane_eps),
        grid=(b_total, qc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts [B*Qc]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cand [B*Qc, C]
            pl.BlockSpec((1, 8, _BQ), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _BQ), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _BQ), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, t_total), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 32, 8), lambda b, i: (b * qc + i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, _BQ), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _BQ), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_total * qc, 32, 8), jnp.float32),
            jax.ShapeDtypeStruct((b_total, 8, q_total), jnp.float32),
            jax.ShapeDtypeStruct((b_total, 1, q_total), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((32, _BQ), jnp.float32)],
        interpret=interpret,
    )(
        counts.reshape(b_total * qc),
        cand.reshape(b_total * qc, n_c),
        q_pack, s_pack, seed_idx, t_pack,
    )
    return hb[:, :, 0].reshape(b_total, qc, 32), pay, idx[:, 0, :]


@lru_cache(maxsize=None)
def _fused_fn(radius: float, plane_eps: float, interpret: bool):
    """custom_vmap so parallel/batched.py maps onto the native batch grid
    (pallas' default batching cannot express per-batch SMEM candidate
    lists — same rationale as pallas_nn._pruned_1nn_fn)."""

    def single(t_pack, clo, chi, q_pack, s_pack, seed_idx):
        out = _fused_linearize_batched(
            t_pack[None], clo[None], chi[None], q_pack[None],
            s_pack[None], seed_idx[None],
            radius, plane_eps, interpret,
        )
        return jax.tree.map(lambda x: x[0], out)

    f = jax.custom_batching.custom_vmap(single)

    @f.def_vmap
    def _rule(axis_size, in_batched, *args):
        full = tuple(
            a if ab else jnp.broadcast_to(a, (axis_size,) + a.shape)
            for a, ab in zip(args, in_batched)
        )
        out = _fused_linearize_batched(*full, radius, plane_eps, interpret)
        return out, (True, True, True)

    return f


class FusedLinearization:
    """Unpacked fused-kernel results (see _N_SLOTS layout)."""

    __slots__ = ("h", "b", "error", "n_corr", "mu_b", "n_b", "weight",
                 "best_d2", "corr", "bb_visits", "bb_candidates")

    def __init__(self, h, b, error, n_corr, mu_b, n_b, weight, best_d2, corr,
                 bb_visits=None, bb_candidates=None):
        self.h = h
        self.b = b
        self.error = error
        self.n_corr = n_corr
        self.mu_b = mu_b
        self.n_b = n_b
        self.weight = weight
        self.best_d2 = best_d2
        self.corr = corr
        self.bb_visits = bb_visits
        self.bb_candidates = bb_candidates


def fused_linearize(
    target_points: jnp.ndarray,
    target_mask: jnp.ndarray,
    target_normals: jnp.ndarray,
    target_normals_valid: jnp.ndarray,
    chunk_lo: jnp.ndarray,
    chunk_hi: jnp.ndarray,
    p_t: jnp.ndarray,
    m_rot: jnp.ndarray,
    query_weight: jnp.ndarray,
    radius: float,
    plane_eps: float = 1e-3,
    interpret: bool | None = None,
    seed_corr: jnp.ndarray | None = None,
) -> FusedLinearization:
    """One GICP linearization pass over a Morton-sorted target cloud.

    target_* describe the (static-shape, masked) target; ``p_t`` [Q,3] are
    the transformed source points, ``m_rot`` [Q,3] the rotated source
    normals ``R n_a``, ``query_weight`` [Q] bool/0-1 (source mask &
    normals_valid). ``radius`` must be a static Python float. Returns H
    [6,6], b [6], error, n_corr plus the frozen-correspondence payload
    (mu_b, n_b, weight, best_d2, corr) the LM gain test needs
    (``nano_gicp_impl.hpp:272-296`` re-evaluates error with frozen
    correspondences and Mahalanobis).

    ``seed_corr`` [Q] int32 (or None): previous-iteration correspondence
    indices for warm-starting the branch-and-bound (see kernel docstring).
    The result is exactly the unseeded result — the seed only tightens the
    initial bound; one [Q]-row gather per pass replaces multi-chunk
    traversals inside the kernel.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    r2 = jnp.float32(float(radius) ** 2)
    q = p_t.shape[0]
    if seed_corr is None:
        qinit = jnp.where(query_weight, r2, 0.0)
        s_pack = jnp.zeros((8, q), jnp.float32)
        seed_idx = jnp.full((1, q), -1, jnp.int32)
    else:
        j = jnp.clip(seed_corr, 0, target_points.shape[0] - 1)
        mu_s = target_points[j]                     # [Q, 3]
        d2_s = jnp.sum((p_t - mu_s) ** 2, axis=-1)
        seeded = (seed_corr >= 0) & query_weight & (d2_s <= r2)
        qinit = jnp.where(
            query_weight, jnp.where(seeded, d2_s, r2), 0.0
        )
        sf = seeded.astype(jnp.float32)[:, None]
        s_pack = jnp.concatenate(
            [
                (mu_s * sf).T.astype(jnp.float32),
                (target_normals[j] * sf).T.astype(jnp.float32),
                (target_normals_valid[j].astype(jnp.float32) * sf[:, 0])[None, :],
                jnp.zeros((1, q), jnp.float32),
            ],
            axis=0,
        )  # [8, Q]
        seed_idx = jnp.where(seeded, j, -1).astype(jnp.int32)[None, :]

    q_pack = jnp.concatenate(
        [
            p_t.T.astype(jnp.float32),
            m_rot.T.astype(jnp.float32),
            query_weight.astype(jnp.float32)[None, :],
            qinit[None, :],
        ],
        axis=0,
    )  # [8, Q]
    t_pack = jnp.concatenate(
        [
            target_points.T.astype(jnp.float32),
            target_normals.T.astype(jnp.float32),
            target_normals_valid.astype(jnp.float32)[None, :],
            target_mask.astype(jnp.float32)[None, :],
        ],
        axis=0,
    )  # [8, T]

    fn = _fused_fn(float(radius), float(plane_eps), bool(interpret))
    hb, pay, corr = fn(t_pack, chunk_lo, chunk_hi, q_pack, s_pack, seed_idx)

    sums = jnp.sum(hb, axis=0)  # [32]
    h00, h01, h02, h11, h12, h22 = (sums[k] for k in range(6))
    tr = sums[6:15].reshape(3, 3)
    m00, m01, m02, m11, m12, m22 = (sums[15 + k] for k in range(6))
    h_tl = jnp.array([[h00, h01, h02], [h01, h11, h12], [h02, h12, h22]])
    h_br = jnp.array([[m00, m01, m02], [m01, m11, m12], [m02, m12, m22]])
    # kernel emits S M = -S^T M; _linearize's h_tr = -sum S^T M = +sum S M
    h = jnp.block([[h_tl, tr], [tr.T, h_br]])
    b = sums[21:27]
    return FusedLinearization(
        h=h,
        b=b,
        error=sums[27],
        n_corr=sums[28].astype(jnp.int32),
        mu_b=pay[0:3, :].T,
        n_b=pay[3:6, :].T,
        weight=pay[6, :],
        best_d2=pay[7, :],
        corr=corr,
        bb_visits=sums[29],       # total chunk visits across tiles
        bb_candidates=sums[30],   # total candidate-list length across tiles
    )
