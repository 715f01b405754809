"""SHOT-352 descriptor, vectorized over [keypoints, neighbor-capacity] blocks.

Spec: Tombari et al. ECCV 2010 as implemented by PCL (pcl::SHOTEstimation::
interpolateSingleChannel / computePointSHOT), which the reference wraps at
features/features_shot.cpp:28-81.  Geometry: 32 spatial volumes = 8 azimuth x
2 elevation x 2 radial shells; each volume holds an 11-slot histogram over
cos(angle(neighbor normal, LRF z-axis)); quadrilinear soft-binning across the
cosine, radial, elevation and azimuth dimensions; final L2 normalization.
Neighbors at distance ~0 are skipped; keypoints with < 5 in-radius neighbors
produce invalid descriptors (PCL emits NaNs; we emit a False validity flag).

TPU formulation: all per-neighbor quantities are computed as [K, M] element-
wise arrays on the VPU from a fixed-capacity neighbor gather; the 5 scatter
slots per neighbor (central + 4 interpolation targets) are accumulated into
the 352-bin histogram with a one-hot matmul on the MXU (segment-free, static
shapes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .neighbors import NeighborBlock

NR_BINS = 10            # cosine histogram bins (slot count per volume = 11)
NR_SECTORS = 32         # spatial volumes
DESC_LEN = NR_SECTORS * (NR_BINS + 1)  # 352

_RAD_45 = jnp.pi / 4.0
_RAD_90 = jnp.pi / 2.0
_RAD_135 = 3.0 * jnp.pi / 4.0
_RAD_PI_7_8 = jnp.pi * 7.0 / 8.0  # angular sector start offset (157.5 deg)


class ShotResult(NamedTuple):
    descriptors: jnp.ndarray  # [K, 352]
    valid: jnp.ndarray        # [K]


def _histogram_from_slots(indices: jnp.ndarray, weights: jnp.ndarray,
                          length: int) -> jnp.ndarray:
    """Accumulate [K, M, S] (index, weight) slots into [K, length] histograms
    with one flat scatter-add (static shapes; duplicate indices accumulate).

    TODO(pallas): replace with a fused VMEM-resident accumulation kernel."""
    k = indices.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, indices.shape, 0)
    flat = (row * length + indices).reshape(-1)
    hist = jnp.zeros((k * length,), weights.dtype).at[flat].add(weights.reshape(-1))
    return hist.reshape(k, length)


def shot_descriptor(
    keypoints: jnp.ndarray,    # [K, 3]
    frames: jnp.ndarray,       # [K, 3, 3] rows = x,y,z axes
    frame_valid: jnp.ndarray,  # [K]
    points: jnp.ndarray,       # [N, 3] surface
    normals: jnp.ndarray,      # [N, 3] surface normals
    nbr: NeighborBlock,        # gathered in-radius neighbors (capacity M)
    radius: float,
    min_neighbors: int = 5,
) -> ShotResult:
    K, M = nbr.idx.shape
    dtype = points.dtype

    npos = points[nbr.idx]     # [K, M, 3]
    nnrm = normals[nbr.idx]    # [K, M, 3]
    use = nbr.valid & (nbr.dist > 1e-15) & jnp.isfinite(nbr.dist)
    # sanitize distances of unused entries so no inf/NaN leaks through
    # masked arithmetic (0 * inf = NaN)
    d = jnp.where(use, nbr.dist, radius * 0.5)

    delta = npos - keypoints[:, None, :]
    x_l = jnp.einsum("kmd,kd->km", delta, frames[:, 0, :])
    y_l = jnp.einsum("kmd,kd->km", delta, frames[:, 1, :])
    z_l = jnp.einsum("kmd,kd->km", delta, frames[:, 2, :])

    # cosine histogram coordinate (normal vs LRF z-axis)
    cos_desc = jnp.clip(jnp.einsum("kmd,kd->km", nnrm, frames[:, 2, :]), -1.0, 1.0)
    use = use & jnp.all(jnp.isfinite(nnrm), axis=-1)
    bin_dist = (1.0 + cos_desc) * NR_BINS / 2.0
    step = jnp.floor(bin_dist + 0.5).astype(jnp.int32)
    bd = bin_dist - step.astype(dtype)

    # spatial volume index (PCL bit pattern)
    bit4 = ((y_l > 0) | ((y_l == 0.0) & (x_l < 0))).astype(jnp.int32)
    bit3_cond = (x_l > 0) | ((x_l == 0.0) & (y_l > 0))
    bit3 = jnp.where(bit3_cond, 1 - bit4, bit4)
    desc = ((bit4 << 3) + (bit3 << 2)) << 1
    inner_cond = (x_l * y_l > 0) | (x_l == 0.0)
    add4 = jnp.where(
        inner_cond,
        jnp.where(jnp.abs(x_l) >= jnp.abs(y_l), 0, 4),
        jnp.where(jnp.abs(x_l) > jnp.abs(y_l), 4, 0),
    )
    desc = desc + add4
    desc = desc + (z_l > 0).astype(jnp.int32)
    r_half = radius / 2.0
    desc = desc + jnp.where(d > r_half, 2, 0)
    volume = desc * (NR_BINS + 1)

    central_idx = volume + step
    central_w = 1.0 - jnp.abs(bd)

    # --- cosine interpolation (adjacent histogram slot, modulo NR_BINS like PCL)
    cos_idx = jnp.where(
        bd > 0,
        volume + ((step + 1) % NR_BINS),
        volume + ((step - 1 + NR_BINS) % NR_BINS),
    )
    cos_w = jnp.abs(bd)

    # --- radial interpolation (adjacent shell)
    r34, r14 = 3.0 * radius / 4.0, radius / 4.0
    rd_out = (d - r34) / r_half
    rd_in = (d - r14) / r_half
    outer = d > r_half
    rd = jnp.where(outer, rd_out, rd_in)
    has_rad_nbr = jnp.where(outer, d <= r34, d >= r14)
    central_w = central_w + jnp.where(
        outer,
        jnp.where(d > r34, 1.0 - rd_out, 1.0 + rd_out),
        jnp.where(d < r14, 1.0 + rd_in, 1.0 - rd_in),
    )
    rad_idx = (desc + jnp.where(outer, -2, 2)) * (NR_BINS + 1) + step
    rad_w = jnp.where(has_rad_nbr, jnp.abs(rd), 0.0)
    rad_idx = jnp.where(has_rad_nbr, rad_idx, 0)

    # --- inclination interpolation (adjacent elevation volume)
    incl_cos = jnp.clip(z_l / d, -1.0, 1.0)
    incl = jnp.arccos(incl_cos)
    lower = (incl > _RAD_90) | ((incl == _RAD_90) & (z_l <= 0))
    id_low = (incl - _RAD_135) / _RAD_90
    id_up = (incl - _RAD_45) / _RAD_90
    central_w = central_w + jnp.where(
        lower,
        jnp.where(incl > _RAD_135, 1.0 - id_low, 1.0 + id_low),
        jnp.where(incl < _RAD_45, 1.0 + id_up, 1.0 - id_up),
    )
    has_incl_nbr = jnp.where(lower, incl <= _RAD_135, incl >= _RAD_45)
    incl_idx = (desc + jnp.where(lower, 1, -1)) * (NR_BINS + 1) + step
    incl_w = jnp.where(has_incl_nbr, jnp.where(lower, jnp.abs(id_low), jnp.abs(id_up)), 0.0)
    incl_idx = jnp.where(has_incl_nbr, incl_idx, 0)

    # --- azimuth interpolation (adjacent sector, +-4 mod 32)
    has_az = (x_l != 0.0) | (y_l != 0.0)
    azimuth = jnp.arctan2(y_l, x_l)
    sel = desc >> 2
    az_dist = (azimuth - (-_RAD_PI_7_8 + _RAD_45 * sel.astype(dtype))) / _RAD_45
    az_dist = jnp.clip(az_dist, -0.5, 0.5)
    central_w = central_w + jnp.where(has_az, 1.0 - jnp.abs(az_dist), 0.0)
    az_interp = jnp.where(az_dist > 0,
                          (desc + 4) % NR_SECTORS,
                          (desc - 4 + NR_SECTORS) % NR_SECTORS)
    az_idx = az_interp * (NR_BINS + 1) + step
    az_w = jnp.where(has_az, jnp.abs(az_dist), 0.0)
    az_idx = jnp.where(has_az, az_idx, 0)

    # --- assemble slots, mask out unused neighbors, accumulate
    usef = use.astype(dtype)
    indices = jnp.stack([central_idx, cos_idx, rad_idx, incl_idx, az_idx], axis=-1)
    weights = jnp.stack([central_w, cos_w, rad_w, incl_w, az_w], axis=-1)
    weights = weights * usef[..., None]
    indices = jnp.where(use[..., None], indices, 0)

    hist = _histogram_from_slots(indices, weights, DESC_LEN)

    norm = jnp.linalg.norm(hist, axis=1, keepdims=True)
    descriptors = hist / jnp.maximum(norm, 1e-30)

    n_neighbors = jnp.sum(use, axis=1)
    valid = frame_valid & (n_neighbors >= min_neighbors) & (norm[:, 0] > 0)
    return ShotResult(descriptors=descriptors, valid=valid)
