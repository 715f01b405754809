"""SHORT_SHOT descriptor: spherical-grid point histogram in LRF coordinates.

Spec: reference features/features_short_shot.cpp:77-366 (custom descriptor by
Seib; grid of r_bins x e_bins x a_bins over (radius, polar angle theta,
azimuth phi), per-axis linear interpolation into one secondary bin, cyclic
azimuth, optional log-radius binning, L2 normalization).  Bin layout is
``bin_r + bin_theta * r_bins + bin_phi * r_bins * e_bins``.

Auto bin configurations for dims 8..256 mirror configureSphericalGrid
(features_short_shot.cpp:285-366).

Neighbors with distance <= 1e-15 are skipped and, with a min radius, r <
min_radius is skipped too (features_short_shot.cpp:125-135).  Works without
normals (the reference skips normal computation for SHORT_SHOT,
implicit_shape_model.cpp:852-867).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .neighbors import NeighborBlock

AUTO_BINS = {
    8: (1, 1, 8),
    16: (2, 2, 4),
    24: (2, 2, 6),
    32: (2, 2, 8),
    64: (2, 4, 8),
    96: (3, 4, 8),
    128: (4, 4, 8),
    192: (6, 4, 8),
    256: (8, 4, 8),
}


def resolve_bins(feature_dims: int, bin_type: str, r_bins: int, e_bins: int,
                 a_bins: int) -> Tuple[int, int, int, int]:
    """configureSphericalGrid semantics: 'auto' picks bins from dims (unknown
    dims fall back to 32 = 2x2x8); 'manual' recomputes dims from bins."""
    if bin_type == "auto":
        bins = AUTO_BINS.get(feature_dims)
        if bins is None:
            bins = AUTO_BINS[32]
            feature_dims = 32
        return (feature_dims, *bins)
    if bin_type == "manual":
        return (r_bins * e_bins * a_bins, r_bins, e_bins, a_bins)
    return (32, 2, 2, 8)


class ShortShotResult(NamedTuple):
    descriptors: jnp.ndarray  # [K, D]
    valid: jnp.ndarray        # [K]


def _interp(raw: jnp.ndarray):
    """linear_interpolation (features_short_shot.cpp:246-260): returns
    (primary weight, secondary offset in {-1, +1})."""
    dec = raw - jnp.floor(raw)
    w = jnp.where(dec <= 0.5, dec + 0.5, (1.0 - dec) + 0.5)
    off = jnp.where(dec <= 0.5, -1, 1).astype(jnp.int32)
    return w, off


def _correct_bin(b: jnp.ndarray, total: int, cyclic: bool) -> jnp.ndarray:
    if cyclic:
        return jnp.where(b < 0, total - 1, jnp.where(b >= total, 0, b))
    return jnp.clip(b, 0, total - 1)


def short_shot_descriptor(
    keypoints: jnp.ndarray,    # [K, 3]
    frames: jnp.ndarray,       # [K, 3, 3]
    frame_valid: jnp.ndarray,  # [K]
    points: jnp.ndarray,       # [N, 3]
    nbr: NeighborBlock,
    radius: float,
    r_bins: int = 2,
    e_bins: int = 2,
    a_bins: int = 8,
    min_radius: float = 0.0,
    log_radius: bool = False,
) -> ShortShotResult:
    dims = r_bins * e_bins * a_bins
    dtype = points.dtype
    K, M = nbr.idx.shape

    use = nbr.valid & (nbr.dist > 1e-15) & jnp.isfinite(nbr.dist)
    npos = points[nbr.idx]
    delta = npos - keypoints[:, None, :]
    x_l = jnp.einsum("kmd,kd->km", delta, frames[:, 0, :])
    y_l = jnp.einsum("kmd,kd->km", delta, frames[:, 1, :])
    z_l = jnp.einsum("kmd,kd->km", delta, frames[:, 2, :])

    r = jnp.sqrt(x_l * x_l + y_l * y_l + z_l * z_l)
    use = use & (r >= min_radius) if min_radius > 0 else use
    r = jnp.where(use, r, radius * 0.5)  # sanitize masked lanes
    theta = jnp.degrees(jnp.arccos(jnp.clip(z_l / jnp.maximum(r, 1e-30), -1.0, 1.0)))
    phi = jnp.degrees(jnp.arctan2(y_l, x_l))

    if log_radius:
        ln_rmin = math.log(min_radius) if min_radius > 0 else 0.0
        ln_span = math.log(radius / min_radius) if min_radius > 0 else 1.0
        raw_r = (r_bins - 1) * (jnp.log(jnp.maximum(r, 1e-30)) - ln_rmin) / ln_span + 1.0
    else:
        raw_r = r_bins * r / radius
    raw_t = e_bins * theta / 180.0
    raw_p = a_bins * (phi + 180.0) / 360.0

    bin_r = jnp.clip(raw_r.astype(jnp.int32), 0, r_bins - 1)
    bin_t = jnp.minimum(raw_t.astype(jnp.int32), e_bins - 1)
    bin_p = jnp.minimum(raw_p.astype(jnp.int32), a_bins - 1)

    w_r, off_r = _interp(raw_r)
    w_t, off_t = _interp(raw_t)
    w_p, off_p = _interp(raw_p)

    bin_r2 = _correct_bin(bin_r + off_r, r_bins, False)
    bin_t2 = _correct_bin(bin_t + off_t, e_bins, False)
    bin_p2 = _correct_bin(bin_p + off_p, a_bins, True)
    r2_ok = (r_bins > 1) & (bin_r2 != bin_r)
    t2_ok = (e_bins > 1) & (bin_t2 != bin_t)
    p2_ok = (a_bins > 1) & (bin_p2 != bin_p)

    def lin(br, bt, bp):
        return br + bt * r_bins + bp * r_bins * e_bins

    usef = use.astype(dtype)
    idx = jnp.stack([
        lin(bin_r, bin_t, bin_p),
        lin(bin_r, bin_t, bin_p2),
        lin(bin_r, bin_t2, bin_p),
        lin(bin_r2, bin_t, bin_p),
    ], axis=-1)
    w = jnp.stack([
        w_r + w_t + w_p,
        jnp.where(p2_ok, w_r + w_t + (1.0 - w_p), 0.0),
        jnp.where(t2_ok, w_r + (1.0 - w_t) + w_p, 0.0),
        jnp.where(r2_ok, (1.0 - w_r) + w_t + w_p, 0.0),
    ], axis=-1) * usef[..., None]
    idx = jnp.where(w > 0, idx, 0)

    row = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)
    flat = (row * dims + idx).reshape(-1)
    hist = jnp.zeros((K * dims,), dtype).at[flat].add(w.reshape(-1)).reshape(K, dims)

    norm = jnp.linalg.norm(hist, axis=1, keepdims=True)
    descriptors = hist / jnp.maximum(norm, 1e-30)
    valid = frame_valid & (norm[:, 0] > 0)
    return ShortShotResult(descriptors=descriptors, valid=valid)
