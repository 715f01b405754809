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
    use = nbr.valid & (nbr.dist > 1e-15) & jnp.isfinite(nbr.dist)
    npos = points[nbr.idx]
    delta = npos - keypoints[:, None, :]
    return _short_shot_core(keypoints, frames, frame_valid, delta, use,
                            radius, r_bins, e_bins, a_bins, min_radius,
                            log_radius)


def short_shot_descriptor_dense(
    keypoints: jnp.ndarray,    # [K, 3]
    frames: jnp.ndarray,       # [K, 3, 3]
    frame_valid: jnp.ndarray,  # [K]
    points: jnp.ndarray,       # [N, 3]
    mask: jnp.ndarray,         # [N]
    radius: float,
    r_bins: int = 2,
    e_bins: int = 2,
    a_bins: int = 8,
    min_radius: float = 0.0,
    log_radius: bool = False,
) -> ShortShotResult:
    """Gather-free SHORT_SHOT over dense [K, N] masked arrays (serving path;
    same dense-over-gather rationale as ops/shot.shot_descriptor_dense)."""
    from .neighbors import pairwise_sqdist
    d2 = pairwise_sqdist(keypoints, points)
    use = (d2 <= radius * radius) & (d2 > 1e-15) & mask[None, :]
    delta = points[None, :, :] - keypoints[:, None, :]
    return _short_shot_core(keypoints, frames, frame_valid, delta, use,
                            radius, r_bins, e_bins, a_bins, min_radius,
                            log_radius)


def _short_shot_core(keypoints, frames, frame_valid, delta, use, radius,
                     r_bins, e_bins, a_bins, min_radius, log_radius):
    dims = r_bins * e_bins * a_bins
    dtype = keypoints.dtype
    K = delta.shape[0]
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

    from .shot import _histogram_from_slots
    hist = _histogram_from_slots(idx, w, dims)

    norm = jnp.linalg.norm(hist, axis=1, keepdims=True)
    descriptors = hist / jnp.maximum(norm, 1e-30)
    valid = frame_valid & (norm[:, 0] > 0)
    return ShortShotResult(descriptors=descriptors, valid=valid)


# ---------------------------------------------------------------------------
# SHORT_CSHOT: shape grid + color histogram grid
# (reference features/features_short_cshot.cpp)
# ---------------------------------------------------------------------------

COLOR_AUTO_BINS = {
    8: (1, 1, 8), 16: (2, 2, 4), 24: (2, 2, 6), 32: (2, 2, 8),
    64: (2, 4, 8), 96: (3, 4, 8), 128: (4, 4, 8),
}


def resolve_color_bins(color_dims: int):
    """configureSphericalColorGrid (features_short_cshot.cpp:592-650):
    auto-only; unsupported dims fall back to 32."""
    bins = COLOR_AUTO_BINS.get(color_dims)
    if bins is None:
        return 32, *COLOR_AUTO_BINS[32]
    return color_dims, *bins


def short_cshot_descriptor(
    keypoints: jnp.ndarray,    # [K, 3]
    kp_rgb: jnp.ndarray,       # [K, 3] in [0,1]
    frames: jnp.ndarray,       # [K, 3, 3]
    frame_valid: jnp.ndarray,  # [K]
    points: jnp.ndarray,       # [N, 3]
    rgb: jnp.ndarray,          # [N, 3] in [0,1]
    nbr: NeighborBlock,
    radius: float,
    r_bins: int = 2, e_bins: int = 2, a_bins: int = 8,
    r_cbins: int = 2, e_cbins: int = 2, a_cbins: int = 8,
    color_hist_size: int = 15,
    min_radius: float = 0.0,
    log_radius: bool = False,
) -> ShortShotResult:
    """Fused shape + color descriptor (features_short_cshot.cpp:103-430):
    the shape part is the SHORT_SHOT spherical grid; the color part bins the
    normalized-CIELab distance to the keypoint color into a color histogram
    nested inside its own spherical grid, with linear interpolation on all
    four axes (the c-secondary increment uses (1-w_c)+(1-w_r)+w_t+w_p,
    preserving the reference's quirk at :424-426).  One joint L2 norm."""
    from .color import color_distance, rgb_to_cielab_normalized

    shape_dims = r_bins * e_bins * a_bins
    color_dims = r_cbins * e_cbins * a_cbins * color_hist_size
    total = shape_dims + color_dims
    dtype = points.dtype
    K, M = nbr.idx.shape

    use = nbr.valid & (nbr.dist > 1e-15) & jnp.isfinite(nbr.dist)
    npos = points[nbr.idx]
    delta = npos - keypoints[:, None, :]
    x_l = jnp.einsum("kmd,kd->km", delta, frames[:, 0, :])
    y_l = jnp.einsum("kmd,kd->km", delta, frames[:, 1, :])
    z_l = jnp.einsum("kmd,kd->km", delta, frames[:, 2, :])

    r = jnp.sqrt(x_l * x_l + y_l * y_l + z_l * z_l)
    if min_radius > 0:
        use = use & (r >= min_radius)
    r = jnp.where(use, r, radius * 0.5)
    theta = jnp.degrees(jnp.arccos(jnp.clip(z_l / jnp.maximum(r, 1e-30), -1.0, 1.0)))
    phi = jnp.degrees(jnp.arctan2(y_l, x_l))

    lab_kp = rgb_to_cielab_normalized(kp_rgb)
    lab_n = rgb_to_cielab_normalized(rgb)[nbr.idx]
    cdist = color_distance(lab_kp[:, None, :], lab_n)

    import math as _math
    if log_radius:
        ln_rmin = _math.log(min_radius) if min_radius > 0 else 0.0
        ln_span = _math.log(radius / min_radius) if min_radius > 0 else 1.0

    def radial_raw(nbins):
        if log_radius:
            return (nbins - 1) * (jnp.log(jnp.maximum(r, 1e-30)) - ln_rmin) / ln_span + 1.0
        return nbins * r / radius

    usef = use.astype(dtype)

    # ---- shape part (same scheme as short_shot_descriptor) ----------------
    def grid_slots(rb, eb, ab, offset, stride, extra_w=None):
        raw_r = radial_raw(rb)
        raw_t = eb * theta / 180.0
        raw_p = ab * (phi + 180.0) / 360.0
        b_r = jnp.clip(raw_r.astype(jnp.int32), 0, rb - 1)
        b_t = jnp.minimum(raw_t.astype(jnp.int32), eb - 1)
        b_p = jnp.minimum(raw_p.astype(jnp.int32), ab - 1)
        w_r, o_r = _interp(raw_r)
        w_t, o_t = _interp(raw_t)
        w_p, o_p = _interp(raw_p)
        b_r2 = _correct_bin(b_r + o_r, rb, False)
        b_t2 = _correct_bin(b_t + o_t, eb, False)
        b_p2 = _correct_bin(b_p + o_p, ab, True)
        r2ok = (rb > 1) & (b_r2 != b_r)
        t2ok = (eb > 1) & (b_t2 != b_t)
        p2ok = (ab > 1) & (b_p2 != b_p)

        def lin(br, bt, bp):
            return offset + (br + bt * rb + bp * rb * eb) * stride

        return (lin, (b_r, b_t, b_p), (b_r2, b_t2, b_p2),
                (w_r, w_t, w_p), (r2ok, t2ok, p2ok))

    lin_s, (br, bt, bp), (br2, bt2, bp2), (wr, wt, wp), (r2ok, t2ok, p2ok) = \
        grid_slots(r_bins, e_bins, a_bins, 0, 1)
    idx_shape = jnp.stack([
        lin_s(br, bt, bp), lin_s(br, bt, bp2), lin_s(br, bt2, bp), lin_s(br2, bt, bp),
    ], axis=-1)
    w_shape = jnp.stack([
        wr + wt + wp,
        jnp.where(p2ok, wr + wt + (1.0 - wp), 0.0),
        jnp.where(t2ok, wr + (1.0 - wt) + wp, 0.0),
        jnp.where(r2ok, (1.0 - wr) + wt + wp, 0.0),
    ], axis=-1) * usef[..., None]

    # ---- color part ---------------------------------------------------------
    lin_c, (cbr, cbt, cbp), (cbr2, cbt2, cbp2), (cwr, cwt, cwp), (cr2ok, ct2ok, cp2ok) = \
        grid_slots(r_cbins, e_cbins, a_cbins, 0, color_hist_size)
    raw_c = cdist * color_hist_size
    b_c = jnp.minimum(raw_c.astype(jnp.int32), color_hist_size - 1)
    w_c, o_c = _interp(raw_c)
    b_c2 = _correct_bin(b_c + o_c, color_hist_size, False)
    c2ok = (color_hist_size > 1) & (b_c2 != b_c)

    def cidx(bc, br_, bt_, bp_):
        return shape_dims + bc + lin_c(br_, bt_, bp_)

    idx_color = jnp.stack([
        cidx(b_c, cbr, cbt, cbp),
        cidx(b_c, cbr, cbt, cbp2),
        cidx(b_c, cbr, cbt2, cbp),
        cidx(b_c, cbr2, cbt, cbp),
        cidx(b_c2, cbr, cbt, cbp),
    ], axis=-1)
    w_color = jnp.stack([
        w_c + cwr + cwt + cwp,
        jnp.where(cp2ok, w_c + cwr + cwt + (1.0 - cwp), 0.0),
        jnp.where(ct2ok, w_c + cwr + (1.0 - cwt) + cwp, 0.0),
        jnp.where(cr2ok, w_c + (1.0 - cwr) + cwt + cwp, 0.0),
        # reference quirk: the c-secondary increment also flips w_r
        # (features_short_cshot.cpp:424-426)
        jnp.where(c2ok, (1.0 - w_c) + (1.0 - cwr) + cwt + cwp, 0.0),
    ], axis=-1) * usef[..., None]

    idx = jnp.concatenate([idx_shape, idx_color], axis=-1)
    w = jnp.concatenate([w_shape, w_color], axis=-1)
    idx = jnp.where(w > 0, idx, 0)

    from .shot import _histogram_from_slots
    hist = _histogram_from_slots(idx, w, total)

    norm = jnp.linalg.norm(hist, axis=1, keepdims=True)
    descriptors = hist / jnp.maximum(norm, 1e-30)
    valid = frame_valid & (norm[:, 0] > 0)
    return ShortShotResult(descriptors=descriptors, valid=valid)
