"""Pallas TPU kernel: flann::ChiSquareDistance matrix (opt-in only).

d(x, y) = sum_i (x_i - y_i)^2 / (x_i + y_i) does not factor into matmuls,
so the XLA path (ops/neighbors.chi_square_distance_matrix) runs it on the
VPU over broadcast [chunk, C, D] temporaries.  This kernel streams
[TQ, TD] query and [TC, TD] database blocks through VMEM and reduces the
d-axis on-chip.  The zero-padded d-columns contribute exactly 0
(a_i + b_i = 0 terms are skipped per flann semantics), so padding never
changes results.

MEASURED OUTCOME (v5e, honest host-fetch sync): the kernel only ties the
XLA path -- 9.1 vs 8.9 ms at [6144, 785, 352]; 47 vs 37 ms at C=4096
(block sweep over TQ in {8..256}, TD in {128, 384}, both term
formulations).  The op is VPU-division-bound, not HBM-bound, so VMEM
streaming buys nothing; the MXU feature-map approximation
(neighbors.chi_square_distance_matrix_approx, 2.9 ms, the
FLANNExactMatch=false default) is the path that actually wins.  Kept
behind PCD_PALLAS_CHISQ=1 for experimentation; NOT auto-enabled.

Numerics: same f32 arithmetic as the XLA path; only the reduction order
differs (d-blocks of TD accumulated in grid order), so distances match to
f32 round-off -- exact-equality kNN tests remain CPU-only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 64    # query rows per block (best of the v5e block sweep)
TC = 128   # database rows per block (sublanes)
TD = 384   # descriptor dims per block (lanes); D > 384 falls back to 128


def _pad_to(x: jnp.ndarray, rows: int, cols: int) -> jnp.ndarray:
    pr = (-x.shape[0]) % rows
    pc = (-x.shape[1]) % cols
    if pr or pc:
        x = jnp.pad(x, ((0, pr), (0, pc)))
    return x


@functools.partial(jax.jit, static_argnames=("td",))
def _chisq_call(a: jnp.ndarray, b: jnp.ndarray, td: int = TD) -> jnp.ndarray:
    qpad, dpad = a.shape
    cpad = b.shape[0]
    TD = td

    def kern(a_ref, b_ref, out_ref):
        k = pl.program_id(2)
        av = a_ref[:]                       # [TQ, TD]
        bv = b_ref[:]                       # [TC, TD]
        s = av[:, None, :] + bv[None, :, :]         # [TQ, TC, TD]
        diff = av[:, None, :] - bv[None, :, :]
        pos = s > 0
        term = jnp.where(pos, diff * diff / jnp.where(pos, s, 1.0), 0.0)
        part = jnp.sum(term, axis=-1)               # [TQ, TC]

        @pl.when(k == 0)
        def _():
            out_ref[:] = part

        @pl.when(k != 0)
        def _():
            out_ref[:] = out_ref[:] + part

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((qpad, cpad), jnp.float32),
        grid=(qpad // TQ, cpad // TC, dpad // TD),
        in_specs=[
            pl.BlockSpec((TQ, TD), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, TD), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TQ, TC), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
    )(a, b)


def chi_square_distance_matrix_pallas(a: jnp.ndarray,
                                      b: jnp.ndarray) -> jnp.ndarray:
    """[Q, D] x [C, D] -> [Q, C] flann::ChiSquareDistance matrix."""
    q, c = a.shape[0], b.shape[0]
    td = TD if a.shape[1] <= TD else 128
    a_p = _pad_to(a.astype(jnp.float32), TQ, td)
    b_p = _pad_to(b.astype(jnp.float32), TC, td)
    return _chisq_call(a_p, b_p, td=td)[:q, :c]
