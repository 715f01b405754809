"""Fused radius-moment + sign-vote Pallas kernels for SHOT LRFs / normals.

Why: the matmul formulation (ops/neighbors.radius_covariance +
ops/lrf.shot_lrf) materializes several [Q, N] float32 arrays in HBM per
pass (d2, in-radius mask, weights, then two sign-vote dot blocks) -- for
the self-LRF over a 2048-pt cloud that is ~9 x 16 MB of HBM traffic per
cloud, and the serving extract stage is HBM-bound because of it (measured
9.5 ms / 32-cloud batch for normals alone on v5e).

These kernels stream [TQ, TN] blocks through VMEM instead: the distance
block, the radius gate and the weights live only on-chip, and the HBM
traffic drops to the points themselves plus tiny [16, Q] outputs.

Layout: coordinates are transposed to [8, L] (rows 0..2 = x, y, z; rest
zero-padding to the f32 sublane tile), with L padded to the lane tile and
invalid/padded points parked far away (1e9) so every gate fails for them
-- no separate mask plumbing.

Numerics note: distances here are exact coordinate differences, not the
(q^2 + p^2 - 2qp) matmul identity, so the radius gate is *more* accurate
than the matmul path; boundary points within ~1e-7 of the radius may gate
differently between the two implementations, and keypoints with
near-degenerate covariance (ambiguous LRFs by construction) can settle on
a different sign.  Parity is asserted statistically (>= 97% of frames
bit-close, all valid flags equal) in tests/test_pallas_kernels.py.

STATUS: AUTO-enabled on real TPU backends when the subprocess probe
passes (ops/pallas.use_pallas; PCD_USE_PALLAS=0/1 overrides); CPU keeps
the matmul path so goldens stay bit-stable.  The radius rides in SMEM as
a traced scalar, so the batched detect/train programs (which pass radius
as a program argument) compile ONE kernel for all radii.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 256   # query tile (lanes-major rows of the output)
TN = 2048  # point tile streamed per grid step
# tile sweep on v5e (32-cloud self-LRF normals, N=2048, honest host-fetch
# sync): (256, 512) 5.28 ms -> (256, 1024) 4.46 -> (256, 2048) 4.25;
# TQ=512+ or TN>2048 blocks fail VMEM compile.  The kernel is grid-step
# overhead-bound at small tiles (1024 steps/batch at 256x512), so bigger
# n-tiles win; small clouds pad up to one 2048 tile, which costs ~nothing
# in absolute terms.

# moment output rows in the [16, Q] result
R_S0, R_S1X, R_S1Y, R_S1Z = 0, 1, 2, 3
R_XX, R_YY, R_ZZ, R_XY, R_XZ, R_YZ = 4, 5, 6, 7, 8, 9
R_CNT = 10


def _pad_lanes(n: int, t: int) -> int:
    return -(-n // t) * t


def _kernel_version() -> int:
    """v1 = all per-pair feature reductions on the VPU (original kernels);
    v2 = moments and sign-vote dots ride the MXU (d2 via the matmul
    identity, per-point feature matrix contracted against the weight tile,
    manual bf16x3 splits because Mosaic only lowers DEFAULT/HIGHEST).
    PCD_PALLAS_LRF_V=1/2 overrides.

    MEASURED NEGATIVE (kept opt-in, default v1): on an idle v5e via the
    axon tunnel, 128-cloud batches, N=2048 --
      Q=256 (the serving keypoint shape): v2 0.97x of v1 (5.47 vs 5.29 ms)
      Q=512: 0.67x    Q=1024: 0.61x    Q=2048 (self-LRF): 0.58x
    The per-pair work the MXU absorbs (~35 VPU ops/pair) is already hidden
    behind the [TQ, TN] block loads at these tiles, while v2 pays 3x dot
    passes for the f32 split plus the [12, TN] feature-matrix build per
    grid step; frames agree with v1 (|cos|>0.999 on 100% of valid frames,
    ~0.3% sign flips on near-tied votes).  Revisit if a backend with
    cheaper dot precision control (or much larger N tiles) shows up."""
    import os
    return int(os.environ.get("PCD_PALLAS_LRF_V", "1"))


def to_lanes(xyz: jnp.ndarray, lanes: int) -> jnp.ndarray:
    """[L, 3] -> [8, lanes] rows x/y/z, padded entries parked at 1e9."""
    L = xyz.shape[0]
    out = jnp.full((8, lanes), 1e9, xyz.dtype)
    out = out.at[:3, :L].set(xyz.T)
    return out


@functools.partial(jax.jit, static_argnames=("weighting",))
def _moments_call(qt: jnp.ndarray, pt: jnp.ndarray, radius: jnp.ndarray,
                  weighting: str) -> jnp.ndarray:
    """radius may be a TRACED scalar (the batched detect/train programs
    pass it as a program argument so one compile serves every radius); it
    rides in SMEM as a [1, 2] (r, r^2) operand."""
    qpad = qt.shape[1]
    npad = pt.shape[1]
    rad_s = jnp.asarray(radius, jnp.float32)
    rr = jnp.stack([rad_s, rad_s * rad_s]).reshape(1, 2)

    def kern(r_ref, q_ref, p_ref, out_ref):
        j = pl.program_id(1)
        rad = r_ref[0, 0]
        r2 = r_ref[0, 1]
        qx, qy, qz = q_ref[0, :], q_ref[1, :], q_ref[2, :]
        px, py, pz = p_ref[0, :], p_ref[1, :], p_ref[2, :]
        dx = qx[:, None] - px[None, :]
        dy = qy[:, None] - py[None, :]
        dz = qz[:, None] - pz[None, :]
        d2 = dx * dx + dy * dy + dz * dz
        in_r = d2 <= r2
        if weighting == "shot":
            w = jnp.where(in_r, rad - jnp.sqrt(d2), 0.0)
        else:
            w = in_r.astype(jnp.float32)
        pxb, pyb, pzb = px[None, :], py[None, :], pz[None, :]
        rows = [
            jnp.sum(w, axis=1),
            jnp.sum(w * pxb, axis=1),
            jnp.sum(w * pyb, axis=1),
            jnp.sum(w * pzb, axis=1),
            jnp.sum(w * pxb * pxb, axis=1),
            jnp.sum(w * pyb * pyb, axis=1),
            jnp.sum(w * pzb * pzb, axis=1),
            jnp.sum(w * pxb * pyb, axis=1),
            jnp.sum(w * pxb * pzb, axis=1),
            jnp.sum(w * pyb * pzb, axis=1),
            jnp.sum(in_r.astype(jnp.float32), axis=1),
        ]
        zero = jnp.zeros_like(rows[0])
        block = jnp.stack(rows + [zero] * (16 - len(rows)))     # [16, TQ]

        @pl.when(j == 0)
        def _():
            out_ref[:] = block

        @pl.when(j != 0)
        def _():
            out_ref[:] = out_ref[:] + block

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, qpad), jnp.float32),
        grid=(qpad // TQ, npad // TN),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, TQ), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, TQ), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
    )(rr, qt, pt)


@functools.partial(jax.jit, static_argnames=("weighting",))
def _moments_call_v2(qt: jnp.ndarray, pt: jnp.ndarray, radius: jnp.ndarray,
                     weighting: str) -> jnp.ndarray:
    """MXU formulation of _moments_call: d2 via the matmul identity
    (matches ops/neighbors.pairwise_sqdist, so the radius gate agrees with
    the XLA path), then the 10 moment rows as ONE [12, TN] x [TN, TQ]
    contraction of the per-point feature matrix against the weight tile.
    Mosaic lowers only DEFAULT/HIGHEST dot precisions, so the moment
    contraction uses a manual bf16x3 split (precision=HIGH equivalent);
    the k=3 identity dot uses HIGHEST (6 passes of a k=3 matmul -- cheap).
    VPU work per pair drops from ~45 ops to ~10 (gate + weight)."""
    qpad = qt.shape[1]
    npad = pt.shape[1]
    rad_s = jnp.asarray(radius, jnp.float32)
    rr = jnp.stack([rad_s, rad_s * rad_s]).reshape(1, 2)
    hi = jax.lax.Precision.HIGHEST

    def kern(r_ref, q_ref, p_ref, out_ref):
        j = pl.program_id(1)
        rad, r2 = r_ref[0, 0], r_ref[0, 1]
        q3 = q_ref[:3, :]                        # [3, TQ]
        p3 = p_ref[:3, :]                        # [3, TN]
        qq = jnp.sum(q3 * q3, axis=0)            # [TQ]
        pp = jnp.sum(p3 * p3, axis=0)            # [TN]
        qp = jax.lax.dot_general(q3, p3, (((0,), (0,)), ((), ())),
                                 precision=hi)   # [TQ, TN]
        d2 = qq[:, None] + pp[None, :] - 2.0 * qp
        in_r = d2 <= r2
        if weighting == "shot":
            w = jnp.where(in_r, rad - jnp.sqrt(jnp.maximum(d2, 0.0)), 0.0)
        else:
            w = in_r.astype(jnp.float32)
        px, py, pz = p3[0], p3[1], p3[2]
        ones = jnp.ones_like(px)
        zeros = jnp.zeros_like(px)
        F = jnp.stack([ones, px, py, pz, px * px, py * py, pz * pz,
                       px * py, px * pz, py * pz, zeros, zeros])  # [12, TN]

        def split(x):
            h = x.astype(jnp.bfloat16).astype(jnp.float32)
            return h, x - h
        F_hi, F_lo = split(F)
        w_hi, w_lo = split(w)
        dims = (((1,), (1,)), ((), ()))
        mom = (jax.lax.dot_general(F_hi, w_hi, dims)
               + jax.lax.dot_general(F_lo, w_hi, dims)
               + jax.lax.dot_general(F_hi, w_lo, dims))          # [12, TQ]
        cnt = jnp.sum(in_r.astype(jnp.float32), axis=1)          # [TQ]
        block = jnp.concatenate(
            [mom[:10], cnt[None, :],
             jnp.zeros((5, mom.shape[1]), mom.dtype)], axis=0)   # [16, TQ]

        @pl.when(j == 0)
        def _():
            out_ref[:] = block

        @pl.when(j != 0)
        def _():
            out_ref[:] = out_ref[:] + block

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, qpad), jnp.float32),
        grid=(qpad // TQ, npad // TN),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, TQ), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, TQ), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
    )(rr, qt, pt)


@jax.jit
def _sign_votes_call_v2(qt: jnp.ndarray, pt: jnp.ndarray, axes: jnp.ndarray,
                        radius: jnp.ndarray) -> jnp.ndarray:
    """MXU formulation of _sign_votes_call: the gate's d2 and both axis
    dots are k=3 HIGHEST matmuls ([TQ, 3] x [3, TN] through the MXU);
    the VPU keeps only the gate comparison and the two vote reductions.
    Same [8, Qpad] output contract as v1 (row 0 = plus_x, row 1 = plus_z)."""
    qpad = qt.shape[1]
    npad = pt.shape[1]
    rad_s = jnp.asarray(radius, jnp.float32)
    rr = (rad_s * rad_s).reshape(1, 1)
    hi = jax.lax.Precision.HIGHEST

    def kern(r_ref, q_ref, p_ref, a_ref, out_ref):
        j = pl.program_id(1)
        r2 = r_ref[0, 0]
        q3 = q_ref[:3, :]
        p3 = p_ref[:3, :]
        v3 = a_ref[:3, :]                        # x-axis candidate [3, TQ]
        u3 = a_ref[3:6, :]                       # z-axis candidate
        qq = jnp.sum(q3 * q3, axis=0)
        pp = jnp.sum(p3 * p3, axis=0)
        dims = (((0,), (0,)), ((), ()))
        qp = jax.lax.dot_general(q3, p3, dims, precision=hi)     # [TQ, TN]
        vp = jax.lax.dot_general(v3, p3, dims, precision=hi)
        up = jax.lax.dot_general(u3, p3, dims, precision=hi)
        d2 = qq[:, None] + pp[None, :] - 2.0 * qp
        in_r = d2 <= r2
        qv = jnp.sum(q3 * v3, axis=0)            # [TQ]
        qu = jnp.sum(q3 * u3, axis=0)
        plus_x = jnp.sum((in_r & (vp - qv[:, None] >= 0)).astype(jnp.float32),
                         axis=1)
        plus_z = jnp.sum((in_r & (up - qu[:, None] >= 0)).astype(jnp.float32),
                         axis=1)
        zero = jnp.zeros_like(plus_x)
        block = jnp.stack([plus_x, plus_z] + [zero] * 6)         # [8, TQ]

        @pl.when(j == 0)
        def _():
            out_ref[:] = block

        @pl.when(j != 0)
        def _():
            out_ref[:] = out_ref[:] + block

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, qpad), jnp.float32),
        grid=(qpad // TQ, npad // TN),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, TQ), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TQ), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TQ), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
    )(rr, qt, pt, axes)


def _moments_dispatch(qt, pt, radius, weighting):
    if _kernel_version() >= 2:
        return _moments_call_v2(qt, pt, radius, weighting)
    return _moments_call(qt, pt, radius, weighting)


def _sign_votes_dispatch(qt, pt, axes, radius, z_only: bool = False):
    if _kernel_version() >= 2 and not z_only:
        return _sign_votes_call_v2(qt, pt, axes, radius)
    return _sign_votes_call(qt, pt, axes, radius, z_only=z_only)


@functools.partial(jax.jit, static_argnames=("z_only",))
def _sign_votes_call(qt: jnp.ndarray, pt: jnp.ndarray, axes: jnp.ndarray,
                     radius: jnp.ndarray, z_only: bool = False) -> jnp.ndarray:
    """axes: [8, Qpad] rows 0..2 = candidate x-axis, 3..5 = candidate z-axis.
    Returns [8, Qpad]: row 0 = #(offset . x_axis >= 0, in radius),
    row 1 = same for the z-axis.  radius may be traced (SMEM scalar).
    z_only skips the x-axis dot (the normals consumer reads only z;
    row 0 is then zero)."""
    qpad = qt.shape[1]
    npad = pt.shape[1]
    rad_s = jnp.asarray(radius, jnp.float32)
    rr = (rad_s * rad_s).reshape(1, 1)

    def kern(r_ref, q_ref, p_ref, a_ref, out_ref):
        j = pl.program_id(1)
        r2 = r_ref[0, 0]
        qx, qy, qz = q_ref[0, :], q_ref[1, :], q_ref[2, :]
        px, py, pz = p_ref[0, :], p_ref[1, :], p_ref[2, :]
        dx = px[None, :] - qx[:, None]        # offset vector p - q
        dy = py[None, :] - qy[:, None]
        dz = pz[None, :] - qz[:, None]
        d2 = dx * dx + dy * dy + dz * dz
        in_r = d2 <= r2
        ux, uy, uz = a_ref[3, :], a_ref[4, :], a_ref[5, :]
        dot_z = dx * ux[:, None] + dy * uy[:, None] + dz * uz[:, None]
        plus_z = jnp.sum((in_r & (dot_z >= 0)).astype(jnp.float32), axis=1)
        if z_only:
            plus_x = jnp.zeros_like(plus_z)
        else:
            vx, vy, vz = a_ref[0, :], a_ref[1, :], a_ref[2, :]
            dot_x = dx * vx[:, None] + dy * vy[:, None] + dz * vz[:, None]
            plus_x = jnp.sum((in_r & (dot_x >= 0)).astype(jnp.float32),
                             axis=1)
        zero = jnp.zeros_like(plus_x)
        block = jnp.stack([plus_x, plus_z] + [zero] * 6)        # [8, TQ]

        @pl.when(j == 0)
        def _():
            out_ref[:] = block

        @pl.when(j != 0)
        def _():
            out_ref[:] = out_ref[:] + block

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, qpad), jnp.float32),
        grid=(qpad // TQ, npad // TN),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, TQ), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TQ), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TQ), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
    )(rr, qt, pt, axes)


def _prep_lanes(queries, q_mask, points, mask):
    """Centroid-shift, park invalid points far away, pack to the [8, L]
    lane-major layout (shared by the moment and sign-vote passes)."""
    m = mask.astype(points.dtype)
    shift = jnp.sum(points * m[:, None], axis=0) / jnp.maximum(m.sum(), 1.0)
    pts = jnp.where(mask[:, None], points - shift[None, :], 1e9)
    qs = jnp.where(q_mask[:, None], queries - shift[None, :], 1e9)
    qpad = _pad_lanes(qs.shape[0], TQ)
    npad = _pad_lanes(pts.shape[0], TN)
    return qs, to_lanes(qs, qpad), to_lanes(pts, npad), qpad, npad


def lrf_moments(queries: jnp.ndarray, q_mask: jnp.ndarray,
                points: jnp.ndarray, mask: jnp.ndarray, radius: float,
                weighting: str = "shot",
                center: str = "query"):
    """Drop-in replacement for ops/neighbors.radius_covariance built on the
    fused kernel.  Returns (cov [Q,3,3], wsum [Q], count [Q], centroid-shift
    applied to inputs) matching radius_covariance's math."""
    qs, q_lanes, p_lanes, _, _ = _prep_lanes(queries, q_mask, points, mask)
    mom = _moments_dispatch(q_lanes, p_lanes, jnp.asarray(radius), weighting)
    mom = mom[:, :queries.shape[0]]

    s0 = mom[R_S0]
    s1 = mom[R_S1X:R_S1Z + 1].T                                   # [Q, 3]
    s2 = jnp.stack([
        jnp.stack([mom[R_XX], mom[R_XY], mom[R_XZ]], axis=-1),
        jnp.stack([mom[R_XY], mom[R_YY], mom[R_YZ]], axis=-1),
        jnp.stack([mom[R_XZ], mom[R_YZ], mom[R_ZZ]], axis=-1),
    ], axis=-2)                                                   # [Q, 3, 3]
    count = mom[R_CNT].astype(jnp.int32)

    s0_safe = jnp.maximum(s0, 1e-30)
    if center == "mean":
        c = s1 / s0_safe[:, None]
    else:
        c = qs[:, :3]
        c = jnp.where(q_mask[:, None], c, 0.0)
    cov = (s2 - c[:, :, None] * s1[:, None, :]
           - s1[:, :, None] * c[:, None, :]
           + s0[:, None, None] * c[:, :, None] * c[:, None, :])
    cov = cov / s0_safe[:, None, None]
    return cov, s0, count


# ---------------------------------------------------------------------------
# Windowed (sorted-axis pruned) variants: ops/binned.py sorts each cloud by
# its principal axis, so a tile of TQW consecutive queries only needs a
# contiguous window of the sorted points.  The windows are PRE-GATHERED by
# XLA into a [8, T * W] lane array (contiguous slab gather -- ~0.1 ms for
# the whole serving batch), so the kernels keep a plain 1-D grid with the
# SAME step count as the dense kernels and 0.5-0.6x the per-step work; no
# scalar-prefetch plumbing, and the window aligns to the 128-lane tile
# instead of a coarse block size.  Exactness is the caller's contract
# (ops/binned.window_starts).
# ---------------------------------------------------------------------------

TQW = 256  # query tile of the windowed kernels


@functools.partial(jax.jit, static_argnames=("weighting", "window"))
def _moments_call_gathered(qt: jnp.ndarray,   # [8, Q]
                           pw: jnp.ndarray,   # [8, T * window] per-tile rows
                           radius: jnp.ndarray, weighting: str,
                           window: int) -> jnp.ndarray:
    """_moments_call over pre-gathered per-tile windows: query tile i
    sweeps ONLY its own [8, window] slab (block i of pw)."""
    qpad = qt.shape[1]
    rad_s = jnp.asarray(radius, jnp.float32)
    rr = jnp.stack([rad_s, rad_s * rad_s]).reshape(1, 2)

    def kern(r_ref, q_ref, p_ref, out_ref):
        rad = r_ref[0, 0]
        r2 = r_ref[0, 1]
        qx, qy, qz = q_ref[0, :], q_ref[1, :], q_ref[2, :]
        px, py, pz = p_ref[0, :], p_ref[1, :], p_ref[2, :]
        dx = qx[:, None] - px[None, :]
        dy = qy[:, None] - py[None, :]
        dz = qz[:, None] - pz[None, :]
        d2 = dx * dx + dy * dy + dz * dz
        in_r = d2 <= r2
        if weighting == "shot":
            w = jnp.where(in_r, rad - jnp.sqrt(d2), 0.0)
        else:
            w = in_r.astype(jnp.float32)
        pxb, pyb, pzb = px[None, :], py[None, :], pz[None, :]
        rows = [
            jnp.sum(w, axis=1),
            jnp.sum(w * pxb, axis=1),
            jnp.sum(w * pyb, axis=1),
            jnp.sum(w * pzb, axis=1),
            jnp.sum(w * (pxb * pxb), axis=1),
            jnp.sum(w * (pyb * pyb), axis=1),
            jnp.sum(w * (pzb * pzb), axis=1),
            jnp.sum(w * (pxb * pyb), axis=1),
            jnp.sum(w * (pxb * pzb), axis=1),
            jnp.sum(w * (pyb * pzb), axis=1),
            jnp.sum(in_r.astype(jnp.float32), axis=1),
        ]
        zero = jnp.zeros_like(rows[0])
        out_ref[:] = jnp.stack(rows + [zero] * (16 - len(rows)))

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, qpad), jnp.float32),
        grid=(qpad // TQW,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, TQW), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, window), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, TQW), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(rr, qt, pw)


@functools.partial(jax.jit, static_argnames=("z_only", "window"))
def _sign_votes_call_gathered(qt: jnp.ndarray, pw: jnp.ndarray,
                              axes: jnp.ndarray, radius: jnp.ndarray,
                              z_only: bool, window: int) -> jnp.ndarray:
    """_sign_votes_call over pre-gathered windows.  z_only skips the
    x-axis dot (the normals consumer reads only the z axis; row 0 is then
    zero)."""
    qpad = qt.shape[1]
    rad_s = jnp.asarray(radius, jnp.float32)
    rr = (rad_s * rad_s).reshape(1, 1)

    def kern(r_ref, q_ref, p_ref, a_ref, out_ref):
        r2 = r_ref[0, 0]
        qx, qy, qz = q_ref[0, :], q_ref[1, :], q_ref[2, :]
        px, py, pz = p_ref[0, :], p_ref[1, :], p_ref[2, :]
        dx = px[None, :] - qx[:, None]
        dy = py[None, :] - qy[:, None]
        dz = pz[None, :] - qz[:, None]
        d2 = dx * dx + dy * dy + dz * dz
        in_r = d2 <= r2
        ux, uy, uz = a_ref[3, :], a_ref[4, :], a_ref[5, :]
        dot_z = dx * ux[:, None] + dy * uy[:, None] + dz * uz[:, None]
        plus_z = jnp.sum((in_r & (dot_z >= 0)).astype(jnp.float32), axis=1)
        if z_only:
            plus_x = jnp.zeros_like(plus_z)
        else:
            vx, vy, vz = a_ref[0, :], a_ref[1, :], a_ref[2, :]
            dot_x = dx * vx[:, None] + dy * vy[:, None] + dz * vz[:, None]
            plus_x = jnp.sum((in_r & (dot_x >= 0)).astype(jnp.float32),
                             axis=1)
        zero = jnp.zeros_like(plus_z)
        out_ref[:] = jnp.stack([plus_x, plus_z] + [zero] * 6)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, qpad), jnp.float32),
        grid=(qpad // TQW,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, TQW), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, window), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TQW), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TQW), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(rr, qt, pw, axes)


def shot_lrf_pallas_windowed(points_sorted: jnp.ndarray,  # [B, N, 3]
                             mask_sorted: jnp.ndarray,    # [B, N]
                             keys_sorted: jnp.ndarray,    # [B, N]
                             radius: float,
                             window: int,
                             tile_q: int = TQW,
                             min_neighbors: int = 5,
                             z_only: bool = False):
    """Self-LRF over a principal-axis-sorted batch via the windowed
    kernels, flattened to ONE pallas call over all B*N queries (no vmap of
    pallas_call; tiles never span clouds because N % tile_q == 0 and
    window starts are clamped inside each cloud's block range).

    Returns (frames [B, N, 3, 3], valid [B, N], exact []).  Parity target:
    ops/lrf.shot_lrf per cloud, same statistical-sign caveat as the dense
    fused kernels (module docstring)."""
    from ..binned import window_starts
    from ..eigh3 import eigh3x3

    b, n, _ = points_sorted.shape
    if n % tile_q or tile_q != TQW:
        raise ValueError(f"N={n} must divide by tile_q={TQW}")
    window = min(window, n)
    if window % 128:
        raise ValueError("window must be a multiple of the 128-lane tile")

    # per-cloud element starts (lane-aligned, clamped inside the cloud)
    def plan_one(qk, qm):
        return window_starts(qk, qm, qk, radius, tile_q, window, align=128)

    plans = jax.vmap(plan_one)(keys_sorted, mask_sorted)
    base = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    starts = (plans.starts + base).reshape(-1)              # [T] global elems
    exact = jnp.all(plans.exact)

    # centroid-shift per cloud, park invalid, flatten, pack to lanes
    m = mask_sorted.astype(points_sorted.dtype)
    cnt = jnp.maximum(m.sum(axis=1), 1.0)
    shift = jnp.sum(points_sorted * m[..., None], axis=1) / cnt[:, None]
    pts = jnp.where(mask_sorted[..., None],
                    points_sorted - shift[:, None, :], 1e9)
    flat = pts.reshape(b * n, 3)
    lanes = to_lanes(flat, b * n)

    # pre-gather each tile's window into [8, T * window].  The gather moves
    # whole 128-lane blocks along a MIDDLE axis (starts are 128-aligned by
    # the plan): a flat lane-axis gather (lanes[:, idx]) is a pathological
    # column gather on TPU -- measured ~18 ms/batch vs ~0.1 ms for the
    # block form at serving shapes.
    lanes3 = lanes.reshape(8, (b * n) // 128, 128)
    blk = (starts // 128)[:, None] + jnp.arange(window // 128)[None, :]
    pwin = jnp.take(lanes3, blk.reshape(-1), axis=1,
                    ).reshape(8, starts.shape[0] * window)

    mom = _moments_call_gathered(lanes, pwin, jnp.asarray(radius), "shot",
                                 window)
    s0 = mom[R_S0]
    s1 = mom[R_S1X:R_S1Z + 1].T
    s2 = jnp.stack([
        jnp.stack([mom[R_XX], mom[R_XY], mom[R_XZ]], axis=-1),
        jnp.stack([mom[R_XY], mom[R_YY], mom[R_YZ]], axis=-1),
        jnp.stack([mom[R_XZ], mom[R_YZ], mom[R_ZZ]], axis=-1),
    ], axis=-2)
    count = mom[R_CNT].astype(jnp.int32)
    s0_safe = jnp.maximum(s0, 1e-30)
    c = jnp.where(mask_sorted.reshape(-1)[:, None], flat, 0.0)
    cov = (s2 - c[:, :, None] * s1[:, None, :]
           - s1[:, :, None] * c[:, None, :]
           + s0[:, None, None] * c[:, :, None] * c[:, None, :])
    cov = cov / s0_safe[:, None, None]

    _, vecs = eigh3x3(cov)
    v1 = vecs[:, :, 2]
    v3 = vecs[:, :, 0]

    axes = jnp.zeros((8, b * n), jnp.float32)
    if not z_only:
        axes = axes.at[:3, :].set(v1.T)
    axes = axes.at[3:6, :].set(v3.T)
    votes = _sign_votes_call_gathered(lanes, pwin, axes,
                                      jnp.asarray(radius), z_only, window)
    n_in = count.astype(jnp.float32)
    plus_z = votes[1]
    z_axis = jnp.where((plus_z < n_in - plus_z)[:, None], -v3, v3)
    if z_only:
        x_axis = v1
    else:
        plus_x = votes[0]
        x_axis = jnp.where((plus_x < n_in - plus_x)[:, None], -v1, v1)
    y_axis = jnp.cross(z_axis, x_axis)
    frames = jnp.stack([x_axis, y_axis, z_axis], axis=1)
    valid = mask_sorted.reshape(-1) & (count >= min_neighbors) & (s0 > 0)
    return (frames.reshape(b, n, 3, 3), valid.reshape(b, n), exact)


def shot_lrf_pallas(queries: jnp.ndarray, q_mask: jnp.ndarray,
                    points: jnp.ndarray, mask: jnp.ndarray, radius: float,
                    min_neighbors: int = 5, z_only: bool = False):
    """SHOT LRF via the fused kernels (parity target: ops/lrf.shot_lrf).
    Returns (frames [Q,3,3] rows = x,y,z axes, valid [Q]).  z_only skips
    the x-axis sign vote (x/y rows then carry eigh's sign convention --
    only valid when the caller consumes just the z axis)."""
    from ..eigh3 import eigh3x3

    # shared prep for the two fused passes (moments + sign votes)
    qs, q_lanes, p_lanes, qpad, _ = _prep_lanes(queries, q_mask, points, mask)
    mom = _moments_dispatch(q_lanes, p_lanes, jnp.asarray(radius), "shot")
    mom = mom[:, :queries.shape[0]]
    s0 = mom[R_S0]
    s1 = mom[R_S1X:R_S1Z + 1].T
    s2 = jnp.stack([
        jnp.stack([mom[R_XX], mom[R_XY], mom[R_XZ]], axis=-1),
        jnp.stack([mom[R_XY], mom[R_YY], mom[R_YZ]], axis=-1),
        jnp.stack([mom[R_XZ], mom[R_YZ], mom[R_ZZ]], axis=-1),
    ], axis=-2)
    count = mom[R_CNT].astype(jnp.int32)
    s0_safe = jnp.maximum(s0, 1e-30)
    c = jnp.where(q_mask[:, None], qs, 0.0)
    cov = (s2 - c[:, :, None] * s1[:, None, :]
           - s1[:, :, None] * c[:, None, :]
           + s0[:, None, None] * c[:, :, None] * c[:, None, :])
    cov = cov / s0_safe[:, None, None]
    wsum = s0

    _, vecs = eigh3x3(cov)
    v1 = vecs[:, :, 2]
    v3 = vecs[:, :, 0]

    axes = jnp.zeros((8, qpad), jnp.float32)
    if not z_only:
        axes = axes.at[:3, :queries.shape[0]].set(v1.T)
    axes = axes.at[3:6, :queries.shape[0]].set(v3.T)
    votes = _sign_votes_dispatch(q_lanes, p_lanes, axes, jnp.asarray(radius),
                                 z_only=z_only)
    plus_z = votes[1, :queries.shape[0]]
    n_in = count.astype(jnp.float32)

    if z_only:
        x_axis = v1
    else:
        plus_x = votes[0, :queries.shape[0]]
        x_axis = jnp.where((plus_x < n_in - plus_x)[:, None], -v1, v1)
    z_axis = jnp.where((plus_z < n_in - plus_z)[:, None], -v3, v3)
    y_axis = jnp.cross(z_axis, x_axis)
    frames = jnp.stack([x_axis, y_axis, z_axis], axis=1)
    valid = q_mask & (count >= min_neighbors) & (wsum > 0)
    return frames, valid
