"""Pallas TPU kernel: SHOT histogram accumulation with VMEM-resident
one-hots (opt-in only -- measured SLOWER than the XLA path; kept as an
honest negative result plus parity test).

Hypothesis: the XLA path (ops/shot._shot_histogram_2pass) materializes
[K, M, V] one-hot operands in HBM (~67 MB bf16 per cloud at serving
shapes), so building them in VMEM should win.

MEASURED OUTCOME (v5e, [32 clouds, 192 kp, 2048 pts], honest host-fetch
sync): XLA 2-pass bf16 4.06 ms/batch, this kernel 79.99 ms/batch -- 20x
SLOWER.  Why: the accumulation is a batched contraction over M with
K-dependent operands, which decomposes into per-keypoint [V, TM] @
[TM, B] matmuls; at V=32, B=11 those are tile-fragment-sized, so the MXU
runs at a few percent utilization and every dot pays operand relayout.
XLA's batched bf16 matmul instead streams big tiles at memory bandwidth
-- its HBM cost (~2.6 ms/batch) is already close to the stage's floor,
and the 2-pass + bf16 tricks (ops/shot.py) capture most of the win.
Routed only under PCD_PALLAS_SHOTHIST=1.

This kernel takes the eleven compact [K, M] slot-index/weight arrays the
binning math already produces (i32 volume/bin indices, f32 weights),
streams [TK, TM] blocks through VMEM, builds the one-hot / multi-hot
operands ON-CHIP, and contracts them on the MXU with two [V, TM] @
[TM, B] dots per keypoint row.

Grouping (identical sums to the XLA 2-pass up to fp re-association):
  pass A: volume one-hot of `desc` x (central + cosine) weighted bin hots
  pass B: (radial + inclination + azimuth) weighted volume multi-hot x
          bin one-hot of `step`
Masked lanes carry zero weights (the caller pre-multiplies by the use
mask), and padded rows/columns contribute zero the same way.

Works for any per-volume bin count (SHOT 11, CSHOT color 31) via the
static `n_bin`.  f32 throughout (the operands never touch HBM, so the
bf16 traffic trick of the XLA path buys nothing here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NR_SECTORS = 32

TK = 8     # keypoint rows per block
TM = 512   # neighbor columns streamed per grid step


def _pad2(x: jnp.ndarray, rows: int, cols: int, fill=0) -> jnp.ndarray:
    pr = (-x.shape[0]) % rows
    pc = (-x.shape[1]) % cols
    if pr or pc:
        x = jnp.pad(x, ((0, pr), (0, pc)), constant_values=fill)
    return x


@functools.partial(jax.jit, static_argnames=("n_bin",))
def _hist_call(desc, step, central_w, cos_bin, cos_w,
               rad_vol, rad_w, incl_vol, incl_w, az_vol, az_w,
               n_bin: int) -> jnp.ndarray:
    kpad, mpad = desc.shape

    def kern(d_ref, s_ref, cw_ref, cb_ref, cosw_ref,
             rv_ref, rw_ref, iv_ref, iw_ref, azv_ref, azw_ref, out_ref):
        j = pl.program_id(1)
        # iotas built in-kernel (captured constants are not allowed)
        av = jax.lax.broadcasted_iota(jnp.int32, (1, NR_SECTORS), 1)[0]
        ab = jax.lax.broadcasted_iota(jnp.int32, (1, n_bin), 1)[0]
        rows = []
        for k in range(TK):
            dk = d_ref[k, :]                       # [TM] i32
            sk = s_ref[k, :]
            oh_desc = (dk[:, None] == av).astype(jnp.float32)     # [TM, V]
            wc_a = ((sk[:, None] == ab).astype(jnp.float32)
                    * cw_ref[k, :][:, None]
                    + (cb_ref[k, :][:, None] == ab).astype(jnp.float32)
                    * cosw_ref[k, :][:, None])                    # [TM, B]
            ha = jax.lax.dot_general(
                oh_desc, wc_a, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)               # [V, B]
            ohvw = ((rv_ref[k, :][:, None] == av).astype(jnp.float32)
                    * rw_ref[k, :][:, None]
                    + (iv_ref[k, :][:, None] == av).astype(jnp.float32)
                    * iw_ref[k, :][:, None]
                    + (azv_ref[k, :][:, None] == av).astype(jnp.float32)
                    * azw_ref[k, :][:, None])                     # [TM, V]
            oh_step = (sk[:, None] == ab).astype(jnp.float32)     # [TM, B]
            hb = jax.lax.dot_general(
                ohvw, oh_step, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)               # [V, B]
            rows.append(ha + hb)
        # [TK, V, B]; the (V, B) -> V*B flatten happens OUTSIDE the kernel
        # (Mosaic cannot shape-cast sublanes into lanes)
        acc = jnp.stack(rows, axis=0)

        @pl.when(j == 0)
        def _():
            out_ref[:] = acc

        @pl.when(j != 0)
        def _():
            out_ref[:] = out_ref[:] + acc

    ispec_i = pl.BlockSpec((TK, TM), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)
    out3 = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((kpad, NR_SECTORS, n_bin),
                                       jnp.float32),
        grid=(kpad // TK, mpad // TM),
        in_specs=[ispec_i] * 11,
        out_specs=pl.BlockSpec((TK, NR_SECTORS, n_bin),
                               lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        # under a 32-cloud vmap the whole output stays VMEM-resident while
        # accumulating over the m-grid (~18 MB double-buffered at SHOT
        # shapes) -- above the 16 MB default scoped limit, well inside the
        # 128 MB v5e VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(desc, step, central_w, cos_bin, cos_w,
      rad_vol, rad_w, incl_vol, incl_w, az_vol, az_w)
    return out3.reshape(kpad, NR_SECTORS * n_bin)


def shot_histogram_pallas(desc, step, central_w, cos_bin, cos_w,
                          rad_vol, rad_w, incl_vol, incl_w,
                          az_vol, az_w, n_bin: int) -> jnp.ndarray:
    """[K, M] slot arrays -> [K, NR_SECTORS * n_bin] histograms.

    Drop-in for ops/shot._shot_histogram_2pass's accumulation (the caller
    zero-weights masked lanes).  Padded rows produce zero histograms;
    padded columns carry zero weights (indices pad to 0 harmlessly)."""
    k, m = desc.shape
    ints = [_pad2(x.astype(jnp.int32), TK, TM) for x in
            (desc, step, cos_bin, rad_vol, incl_vol, az_vol)]
    flts = [_pad2(x.astype(jnp.float32), TK, TM) for x in
            (central_w, cos_w, rad_w, incl_w, az_w)]
    d_p, s_p, cb_p, rv_p, iv_p, azv_p = ints
    cw_p, cosw_p, rw_p, iw_p, azw_p = flts
    out = _hist_call(d_p, s_p, cw_p, cb_p, cosw_p,
                     rv_p, rw_p, iv_p, iw_p, azv_p, azw_p, n_bin=n_bin)
    return out[:k]
