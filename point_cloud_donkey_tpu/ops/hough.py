"""TPU-native Hough3D vote accumulation.

Reference: voting/voting_hough_3d.cpp:33-95 + PCL recognition hough_3d
(HoughSpace3D::vote / voteInt).  The O(V) work -- trilinear corner weights
and the scatter-add into the accumulator grid -- runs as one jitted
program per (vote-capacity, grid-shape, interpolation) signature; the tiny
candidate NMS stays on the host (models/voting.py keeps the dict-based
accumulator `_class_hough` as the reference oracle, tested for equality in
tests/test_detection.py).

Grid layout: the host derives the occupied integer-bin range from the
votes (the oracle's dict accumulator is unbounded, so the device grid is
sized to cover every touched bin exactly -- no clipping, bit-parity with
the dict), buckets the extents, and passes the bin-key origin dynamically.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# 8 corner offsets of the trilinear cell, in (x, y, z) minor-to-major order
_CORNERS = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                    np.int32)


def _bucket(n: int, step: int = 8) -> int:
    return max(step, -(-n // step) * step)


@functools.lru_cache(maxsize=None)
def _hough_program(v_cap: int, dims: Tuple[int, int, int], interpolate: bool):
    """One class's Hough accumulation: votes -> corner keys + weights ->
    scatter-add grid.  Returns (grid [Dx*Dy*Dz], keys [V, C, 3], w [V, C])
    where C = 8 (trilinear, PCL voteInt) or 1 (nearest bin, vote)."""
    dx, dy, dz = dims
    total = dx * dy * dz

    @jax.jit
    def run(positions, weights, valid, min_coord, bin_size, key_min):
        rel = (positions - min_coord[None, :]) / bin_size
        if interpolate:
            # PCL HoughSpace3D::voteInt: spread over the 8 corners of the
            # cell around (rel - 0.5)
            base = jnp.floor(rel - 0.5).astype(jnp.int32)
            frac = (rel - 0.5) - base
            offs = jnp.asarray(_CORNERS)                       # [8, 3]
            keys = base[:, None, :] + offs[None, :, :]         # [V, 8, 3]
            w = (jnp.abs(1 - offs[None, :, 0] - frac[:, None, 0])
                 * jnp.abs(1 - offs[None, :, 1] - frac[:, None, 1])
                 * jnp.abs(1 - offs[None, :, 2] - frac[:, None, 2])
                 ) * weights[:, None]                          # [V, 8]
        else:
            keys = jnp.floor(rel).astype(jnp.int32)[:, None, :]  # [V, 1, 3]
            w = weights[:, None]
        w = jnp.where(valid[:, None], w, 0.0)

        local = keys - key_min[None, None, :]
        # the grid covers every touched bin by construction; the guard only
        # protects the scatter against padded lanes
        inb = ((local >= 0) & (local < jnp.asarray(dims)[None, None, :])).all(-1)
        flat = (local[..., 0] * dy + local[..., 1]) * dz + local[..., 2]
        flat = jnp.where(inb, flat, 0)
        w_eff = jnp.where(inb, w, 0.0)
        grid = jnp.zeros((total,), jnp.float32).at[flat.reshape(-1)].add(
            w_eff.reshape(-1))
        return grid, keys, w
    return run


def hough_accumulate(positions: np.ndarray, weights: np.ndarray,
                     min_coord: np.ndarray, bin_size: float,
                     interpolate: bool):
    """Accumulate one class's votes into a Hough grid on device.

    Returns (grid flat [total], key_min [3], dims (dx,dy,dz),
    keys [V, C, 3], corner weights [V, C]) with V the true vote count."""
    v = len(positions)
    v_cap = _bucket(v, 64)
    pos_pad = np.zeros((v_cap, 3), np.float32)
    pos_pad[:v] = positions
    w_pad = np.zeros(v_cap, np.float32)
    w_pad[:v] = weights
    valid = np.arange(v_cap) < v

    # host-side bin-range probe (cheap O(V)) to size the static grid; same
    # float32 arithmetic as the device program, plus a one-bin safety margin
    rel = ((positions.astype(np.float32) - min_coord[None, :].astype(np.float32))
           / np.float32(bin_size))
    base = np.floor(rel - 0.5).astype(np.int64) if interpolate \
        else np.floor(rel).astype(np.int64)
    key_min = base.min(axis=0) - 1
    key_max = base.max(axis=0) + (1 if interpolate else 0) + 1
    dims = tuple(int(d) for d in
                 (_bucket(int(e) + 1, 4) for e in (key_max - key_min)))

    run = _hough_program(v_cap, dims, bool(interpolate))
    grid, keys, w = run(jnp.asarray(pos_pad), jnp.asarray(w_pad),
                        jnp.asarray(valid),
                        jnp.asarray(min_coord, jnp.float32),
                        jnp.asarray(bin_size, jnp.float32),
                        jnp.asarray(key_min, jnp.int32))
    return (np.asarray(grid), key_min.astype(np.int64), dims,
            np.asarray(keys[:v]).astype(np.int64), np.asarray(w[:v]))
