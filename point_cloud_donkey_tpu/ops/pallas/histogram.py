"""Pallas TPU kernel: batched weighted histograms (segment accumulation).

STATUS: retained as a documented experiment, NOT on the hot path.  On v5e
this kernel measured 452ms/batch vs the XLA chunked-bin reduce at 364ms and
the MXU outer-product formulation (now ops/shot._shot_histogram_2pass) at 5.3ms for
the SHOT workload -- the VPU masked-reduction strategy cannot compete with
a systolic matmul for this op, and Mosaic constraints (128-divisible last
dims, no sublane<->lane reshapes) prevented better layouts.  Kept for the
record of what was tried; see the perf notes in _shot_histogram_2pass.

The SHOT-family descriptors need, per keypoint row, a weighted histogram over
a few hundred bins from ~5k (index, weight) pairs.  XLA lowers that scatter
terribly on TPU (~800 ms/batch measured for a [8192, 5120] -> [8192, 352]
accumulation).

Kernel strategy (VPU): rows stay in sublanes, elements in lanes (natural
layout, no Mosaic-unsupported reshapes/transposes).  For each histogram bin
b the kernel computes a masked lane-reduction

    H[r, b] = sum_c w[r, c] * (idx[r, c] == b)

over the whole [TR, C] tile, accumulating into a VMEM-resident [TR, L]
accumulator via one-hot lane writes.  Work is O(R * C * L) elementwise ops on
the VPU, but fully vectorized with only L loop iterations per grid step --
no per-element scatter, no tiny matmuls, no lane/sublane reshapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hist_kernel(idx_ref, w_ref, out_ref, *, length: int, tr: int):
    idx = idx_ref[:]   # [TR, C] int32
    w = w_ref[:]       # [TR, C] f32
    lane = jax.lax.broadcasted_iota(jnp.int32, (tr, length), 1)

    def bin_body(b, acc):
        hb = jnp.sum(jnp.where(idx == b, w, 0.0), axis=1, keepdims=True)  # [TR,1]
        return acc + jnp.where(lane == b, hb, 0.0)

    out_ref[:] = jax.lax.fori_loop(0, length, bin_body,
                                   jnp.zeros((tr, length), jnp.float32))


def batched_histogram(indices: jnp.ndarray, weights: jnp.ndarray,
                      length: int, row_tile: int = 128) -> jnp.ndarray:
    """indices/weights: [R, C] -> histograms [R, length].

    Indices must lie in [0, length); zero-weight entries may point anywhere
    in range (they contribute nothing)."""
    r, c = indices.shape
    tr = min(row_tile, r)
    pad_r = (-r) % tr
    if pad_r:
        indices = jnp.pad(indices, ((0, pad_r), (0, 0)))
        weights = jnp.pad(weights, ((0, pad_r), (0, 0)))
    rp = indices.shape[0]
    g = rp // tr

    out = pl.pallas_call(
        functools.partial(_hist_kernel, length=length, tr=tr),
        out_shape=jax.ShapeDtypeStruct((rp, length), jnp.float32),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, length), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(indices, weights.astype(jnp.float32))
    return out[:r]


def shot_histogram(indices: jnp.ndarray, weights: jnp.ndarray,
                   length: int = 352) -> jnp.ndarray:
    """[K, M, S] slot indices/weights -> [K, length] histograms."""
    k = indices.shape[0]
    flat_i = indices.reshape(k, -1)
    flat_w = weights.reshape(k, -1)
    return batched_histogram(flat_i, flat_w, length)
