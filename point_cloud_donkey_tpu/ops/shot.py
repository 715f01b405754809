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
                          length: int, bin_chunk: int = 16) -> jnp.ndarray:
    """Accumulate [K, M, S] (index, weight) slots into [K, length] histograms.

    TPU strategy: chunked-bin masked reductions -- for each chunk of
    `bin_chunk` bins, one fused pass computes sum_m w * (idx == b) for all
    bins of the chunk.  Measured ~2.2x faster than XLA scatter-add on v5e
    (scatter lowers to serialized updates); the optimization_barrier keeps
    producers from being re-fused into every chunk."""
    k = indices.shape[0]
    flat_i = indices.reshape(k, -1)
    flat_w = weights.reshape(k, -1)
    flat_i, flat_w = jax.lax.optimization_barrier((flat_i, flat_w))
    u = bin_chunk
    nch = (length + u - 1) // u

    def body(c, acc):
        bins = c * u + jnp.arange(u)
        eq = flat_i[:, :, None] == bins[None, None, :]
        part = jnp.sum(jnp.where(eq, flat_w[:, :, None], 0.0), axis=1)
        return jax.lax.dynamic_update_slice(acc, part, (0, c * u))

    acc = jax.lax.fori_loop(0, nch, body,
                            jnp.zeros((k, nch * u), weights.dtype))
    return acc[:, :length]


def _shot_histogram_2pass(desc, step, central_w, cos_bin, cos_w,
                          rad_vol, rad_w, incl_vol, incl_w,
                          az_vol, az_w, n_bin: int = NR_BINS + 1
                          ) -> jnp.ndarray:
    """SHOT's 5 scatter slots as TWO batched matmuls instead of five.

    Slots (central, cosine-interp) share the volume `desc`: one volume
    one-hot against a bin operand carrying both weighted bin one-hots.
    Slots (radial, inclination, azimuth) share the bin `step`: their three
    weighted volume one-hots merge into one multi-hot operand against an
    unweighted bin one-hot.  Identical sums to the 5-pass version up to fp
    re-association; 2.5x less one-hot operand traffic through HBM (the
    [K, M, V] operands dominate this kernel's cost at M ~ 2048).

    Works for any per-volume bin count (SHOT 11, CSHOT color 31).

    Operand dtype: this kernel is purely HBM-bound on its [K, M, V] one-hot
    operands (they dwarf every real input).  On accelerator backends the
    operands are stored bf16 with f32 MXU accumulation, halving the stage's
    HBM traffic; the one-hots are exact in bf16 and the weights (<= ~4)
    round at 2^-8 relative, well under descriptor-matching noise.  CPU
    keeps f32 so golden-oracle tests stay bit-stable (PCD_SHOT_BF16=0/1
    overrides).

    PCD_PALLAS_SHOTHIST=1 routes to the VMEM-one-hot Pallas kernel
    (ops/pallas/shot_hist.py) -- NOT auto-enabled: measured 20x slower on
    v5e (per-keypoint tile-fragment matmuls; see that module's docstring
    for the numbers).  This XLA formulation is within ~1.6x of the
    stage's HBM floor."""
    import os as _os
    if _os.environ.get("PCD_PALLAS_SHOTHIST") == "1":
        from .pallas.shot_hist import shot_histogram_pallas
        hist = shot_histogram_pallas(desc, step, central_w, cos_bin, cos_w,
                                     rad_vol, rad_w, incl_vol, incl_w,
                                     az_vol, az_w, n_bin)
        return hist.astype(central_w.dtype)
    dtype = central_w.dtype
    import os
    v = os.environ.get("PCD_SHOT_BF16")
    use_bf16 = (jax.default_backend() != "cpu") if v is None else v == "1"
    op_dtype = jnp.bfloat16 if use_bf16 else dtype
    av = jnp.arange(NR_SECTORS, dtype=jnp.int32)
    ab = jnp.arange(n_bin, dtype=jnp.int32)
    hi = jax.lax.Precision.HIGHEST

    # pass A: volume one-hot (desc) x [central + cosine] weighted bins
    oh_desc = (desc[:, :, None] == av).astype(op_dtype)         # [K,M,V]
    wc_a = ((step[:, :, None] == ab).astype(dtype) * central_w[:, :, None]
            + (cos_bin[:, :, None] == ab).astype(dtype) * cos_w[:, :, None]
            ).astype(op_dtype)
    hist = jax.lax.dot_general(oh_desc, wc_a,
                               (((1,), (1,)), ((0,), (0,))), precision=hi,
                               preferred_element_type=dtype)

    # pass B: weighted volume multi-hot (rad/incl/az) x bin one-hot (step)
    ohvw = ((rad_vol[:, :, None] == av).astype(dtype) * rad_w[:, :, None]
            + (incl_vol[:, :, None] == av).astype(dtype) * incl_w[:, :, None]
            + (az_vol[:, :, None] == av).astype(dtype) * az_w[:, :, None]
            ).astype(op_dtype)
    oh_step = (step[:, :, None] == ab).astype(op_dtype)
    hist = hist + jax.lax.dot_general(ohvw, oh_step,
                                      (((1,), (1,)), ((0,), (0,))),
                                      precision=hi,
                                      preferred_element_type=dtype)
    return hist.reshape(desc.shape[0], NR_SECTORS * n_bin)


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
    npos = points[nbr.idx]     # [K, M, 3]
    nnrm = normals[nbr.idx]    # [K, M, 3]
    use = nbr.valid & (nbr.dist > 1e-15) & jnp.isfinite(nbr.dist)
    delta = npos - keypoints[:, None, :]
    return _shot_core(keypoints, frames, frame_valid, delta, nbr.dist, nnrm,
                      use, radius, min_neighbors)


def shot_descriptor_dense(
    keypoints: jnp.ndarray,    # [K, 3]
    frames: jnp.ndarray,       # [K, 3, 3]
    frame_valid: jnp.ndarray,  # [K]
    points: jnp.ndarray,       # [N, 3]
    normals: jnp.ndarray,      # [N, 3]
    mask: jnp.ndarray,         # [N]
    radius: float,
    min_neighbors: int = 5,
) -> ShotResult:
    """Gather-free SHOT over dense [K, N] masked arrays: the in-radius set
    comes straight from the pairwise distance matmul, so no random-access
    neighbor gather touches HBM (the serving hot path; random gathers of
    [K, M, 3] blocks cost ~18ms per 16-cloud batch on v5e).  Distances are
    the matmul identity (HIGHEST) -- exact-zero self-pairs can slip the
    1e-15 exclusion (error ~1e-7 * scale^2), which never occurs for
    voxel-centroid keypoints; the parity path (shot_descriptor over a
    gathered block with exact recomputed distances) is unchanged."""
    from .neighbors import pairwise_sqdist
    d2 = pairwise_sqdist(keypoints, points)
    use = (d2 <= radius * radius) & (d2 > 1e-15) & mask[None, :]
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    x_l, y_l, z_l, cos_desc, nrm_ok = _dense_local_coords(
        keypoints, frames, points, normals)
    return _shot_core_from_coords(
        frame_valid, x_l, y_l, z_l, cos_desc, d, use & nrm_ok,
        radius, min_neighbors)


def _dense_local_coords(keypoints, frames, points, normals):
    """Local-frame coordinates for the dense paths WITHOUT materializing the
    [K, N, 3] offset block (604 MB per 32-cloud batch at K=192, N=2048 --
    it dominated the descriptor stage's HBM traffic).  Identity:
    (p - q) . axis = p . axis - q . axis, so three compact
    [K*3, 3] @ [3, N] dots (HIGHEST) replace the batched per-neighbor
    einsums, and the normal cosine is one [K, 3] @ [3, N] dot."""
    hi = jax.lax.Precision.HIGHEST
    k = keypoints.shape[0]
    fr_flat = frames.reshape(k * 3, 3)
    pf = jax.lax.dot_general(fr_flat, points, (((1,), (1,)), ((), ())),
                             precision=hi).reshape(k, 3, -1)      # [K, 3, N]
    off = jnp.einsum("kd,kad->ka", keypoints, frames,
                     precision=hi)                                # [K, 3]
    x_l = pf[:, 0, :] - off[:, 0, None]
    y_l = pf[:, 1, :] - off[:, 1, None]
    z_l = pf[:, 2, :] - off[:, 2, None]
    cos_desc = jnp.clip(
        jax.lax.dot_general(frames[:, 2, :], normals,
                            (((1,), (1,)), ((), ())), precision=hi),
        -1.0, 1.0)                                                # [K, N]
    nrm_ok = jnp.all(jnp.isfinite(normals), axis=-1)[None, :]
    return x_l, y_l, z_l, cos_desc, nrm_ok


def _shot_core(keypoints, frames, frame_valid, delta, dist, nnrm, use,
               radius, min_neighbors):
    """Shared SHOT math over gathered [K, M] neighbor blocks (exact
    coordinate differences; the dense path computes its local coords via
    _dense_local_coords instead)."""
    x_l = jnp.einsum("kmd,kd->km", delta, frames[:, 0, :])
    y_l = jnp.einsum("kmd,kd->km", delta, frames[:, 1, :])
    z_l = jnp.einsum("kmd,kd->km", delta, frames[:, 2, :])
    cos_desc = jnp.clip(jnp.einsum("kmd,kd->km", nnrm, frames[:, 2, :]), -1.0, 1.0)
    use = use & jnp.all(jnp.isfinite(nnrm), axis=-1)
    return _shot_core_from_coords(frame_valid, x_l, y_l, z_l, cos_desc,
                                  dist, use, radius, min_neighbors)


def _shot_core_from_coords(frame_valid, x_l, y_l, z_l, cos_desc, dist, use,
                           radius, min_neighbors):
    """Shared SHOT binning over precomputed local coordinates [K, M]."""
    dtype = x_l.dtype
    # sanitize distances of unused entries so no inf/NaN leaks through
    # masked arithmetic (0 * inf = NaN)
    d = jnp.where(use, dist, radius * 0.5)
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

    # --- accumulate the 5 scatter slots on the MXU in two fused passes
    # (flat index = volume * (NR_BINS + 1) + bin throughout); masked lanes
    # contribute zero through their zeroed weights
    usef = use.astype(dtype)
    cos_bin = jnp.where(bd > 0, (step + 1) % NR_BINS,
                        (step - 1 + NR_BINS) % NR_BINS)
    rad_vol = jnp.where(has_rad_nbr, desc + jnp.where(outer, -2, 2), 0)
    incl_vol = jnp.where(has_incl_nbr, desc + jnp.where(lower, 1, -1), 0)
    hist = _shot_histogram_2pass(
        desc, step, central_w * usef, cos_bin, cos_w * usef,
        rad_vol, rad_w * usef, incl_vol, incl_w * usef,
        az_interp, az_w * usef)

    norm = jnp.linalg.norm(hist, axis=1, keepdims=True)
    descriptors = hist / jnp.maximum(norm, 1e-30)

    n_neighbors = jnp.sum(use, axis=1)
    valid = frame_valid & (n_neighbors >= min_neighbors) & (norm[:, 0] > 0)
    return ShotResult(descriptors=descriptors, valid=valid)


# ---------------------------------------------------------------------------
# CSHOT (color SHOT, 1344 = 32*(10+1) shape + 32*(30+1) color)
# ---------------------------------------------------------------------------

NR_COLOR_BINS = 30
CSHOT_LEN = NR_SECTORS * (NR_BINS + 1) + NR_SECTORS * (NR_COLOR_BINS + 1)


def cshot_descriptor(
    keypoints: jnp.ndarray,     # [K, 3]
    kp_rgb: jnp.ndarray,        # [K, 3] keypoint colors in [0,1]
    frames: jnp.ndarray,        # [K, 3, 3]
    frame_valid: jnp.ndarray,   # [K]
    points: jnp.ndarray,        # [N, 3]
    normals: jnp.ndarray,       # [N, 3]
    rgb: jnp.ndarray,           # [N, 3] colors in [0,1]
    nbr: NeighborBlock,
    radius: float,
    min_neighbors: int = 5,
) -> ShotResult:
    """CSHOT-1344 (PCL pcl::SHOTColorEstimation / interpolateDoubleChannel;
    reference wrapper features/features_cshot.cpp).  The shape channel is
    identical to SHOT; the color channel histograms the normalized-CIELab
    distance between each neighbor's color and the keypoint color over 31
    slots per spatial volume; the spatial (radial/elevation/azimuth)
    interpolation weights apply to both channels."""
    from .color import rgb_to_cielab_normalized

    from .color import color_distance

    npos = points[nbr.idx]
    nnrm = normals[nbr.idx]
    use = nbr.valid & (nbr.dist > 1e-15) & jnp.isfinite(nbr.dist)
    delta = npos - keypoints[:, None, :]
    x_l = jnp.einsum("kmd,kd->km", delta, frames[:, 0, :])
    y_l = jnp.einsum("kmd,kd->km", delta, frames[:, 1, :])
    z_l = jnp.einsum("kmd,kd->km", delta, frames[:, 2, :])
    cos_desc = jnp.clip(
        jnp.einsum("kmd,kd->km", nnrm, frames[:, 2, :]), -1.0, 1.0)
    use = use & jnp.all(jnp.isfinite(nnrm), axis=-1)
    lab_kp = rgb_to_cielab_normalized(kp_rgb)           # [K, 3]
    lab_n = rgb_to_cielab_normalized(rgb)[nbr.idx]      # [K, M, 3]
    cdist = color_distance(lab_kp[:, None, :], lab_n)
    return _cshot_core_from_coords(frame_valid, x_l, y_l, z_l, cos_desc,
                                   nbr.dist, cdist, use, radius,
                                   min_neighbors)


def cshot_descriptor_dense(
    keypoints: jnp.ndarray,
    kp_rgb: jnp.ndarray,
    frames: jnp.ndarray,
    frame_valid: jnp.ndarray,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    rgb: jnp.ndarray,
    mask: jnp.ndarray,
    radius: float,
    min_neighbors: int = 5,
) -> ShotResult:
    """Gather-free CSHOT over dense [K, N] masked arrays (serving path; see
    shot_descriptor_dense for the distance-precision caveat; local coords
    via _dense_local_coords, no [K, N, 3] offset block)."""
    from .color import color_distance, rgb_to_cielab_normalized
    from .neighbors import pairwise_sqdist
    d2 = pairwise_sqdist(keypoints, points)
    use = (d2 <= radius * radius) & (d2 > 1e-15) & mask[None, :]
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    x_l, y_l, z_l, cos_desc, nrm_ok = _dense_local_coords(
        keypoints, frames, points, normals)
    lab_kp = rgb_to_cielab_normalized(kp_rgb)           # [K, 3]
    lab_n = rgb_to_cielab_normalized(rgb)               # [N, 3]
    cdist = color_distance(lab_kp[:, None, :], lab_n[None, :, :])
    return _cshot_core_from_coords(frame_valid, x_l, y_l, z_l, cos_desc,
                                   d, cdist, use & nrm_ok, radius,
                                   min_neighbors)


def _cshot_core_from_coords(frame_valid, x_l, y_l, z_l, cos_desc, dist,
                            cdist, use, radius, min_neighbors):
    """Shared CSHOT binning over precomputed local coordinates and color
    distances [K, M]."""
    dtype = x_l.dtype
    d = jnp.where(use, dist, radius * 0.5)

    # shape channel coordinate
    bin_shape = (1.0 + cos_desc) * NR_BINS / 2.0
    step_s = jnp.floor(bin_shape + 0.5).astype(jnp.int32)
    bd_s = bin_shape - step_s.astype(dtype)

    # color channel coordinate (cshot.hpp: colorDistance * nr_color_bins)
    bin_color = cdist * NR_COLOR_BINS
    step_c = jnp.floor(bin_color + 0.5).astype(jnp.int32)
    bd_c = bin_color - step_c.astype(dtype)

    # spatial volume (same bit pattern as SHOT)
    bit4 = ((y_l > 0) | ((y_l == 0.0) & (x_l < 0))).astype(jnp.int32)
    bit3_cond = (x_l > 0) | ((x_l == 0.0) & (y_l > 0))
    bit3 = jnp.where(bit3_cond, 1 - bit4, bit4)
    desc = ((bit4 << 3) + (bit3 << 2)) << 1
    inner_cond = (x_l * y_l > 0) | (x_l == 0.0)
    add4 = jnp.where(inner_cond,
                     jnp.where(jnp.abs(x_l) >= jnp.abs(y_l), 0, 4),
                     jnp.where(jnp.abs(x_l) > jnp.abs(y_l), 4, 0))
    desc = desc + add4 + (z_l > 0).astype(jnp.int32)
    r_half = radius / 2.0
    desc = desc + jnp.where(d > r_half, 2, 0)

    shape_off = 0
    color_off = NR_SECTORS * (NR_BINS + 1)
    vol_s = desc * (NR_BINS + 1)
    vol_c = color_off + desc * (NR_COLOR_BINS + 1)

    central_s = vol_s + step_s
    central_c = vol_c + step_c
    w_s = 1.0 - jnp.abs(bd_s)
    w_c = 1.0 - jnp.abs(bd_c)

    cos_idx_s = jnp.where(bd_s > 0, vol_s + ((step_s + 1) % NR_BINS),
                          vol_s + ((step_s - 1 + NR_BINS) % NR_BINS))
    cos_w_s = jnp.abs(bd_s)
    cos_idx_c = jnp.where(bd_c > 0, vol_c + ((step_c + 1) % NR_COLOR_BINS),
                          vol_c + ((step_c - 1 + NR_COLOR_BINS) % NR_COLOR_BINS))
    cos_w_c = jnp.abs(bd_c)

    # radial interpolation (shared spatial weight, both channels)
    r34, r14 = 3.0 * radius / 4.0, radius / 4.0
    outer = d > r_half
    rd = jnp.where(outer, (d - r34) / r_half, (d - r14) / r_half)
    has_rad = jnp.where(outer, d <= r34, d >= r14)
    spatial_rad = jnp.where(outer,
                            jnp.where(d > r34, 1.0 - rd, 1.0 + rd),
                            jnp.where(d < r14, 1.0 + rd, 1.0 - rd))
    w_s = w_s + spatial_rad
    w_c = w_c + spatial_rad
    rad_vol = desc + jnp.where(outer, -2, 2)
    rad_idx_s = rad_vol * (NR_BINS + 1) + step_s
    rad_idx_c = color_off + rad_vol * (NR_COLOR_BINS + 1) + step_c
    rad_w = jnp.where(has_rad, jnp.abs(rd), 0.0)

    # inclination
    incl = jnp.arccos(jnp.clip(z_l / d, -1.0, 1.0))
    lower = (incl > _RAD_90) | ((incl == _RAD_90) & (z_l <= 0))
    id_ = jnp.where(lower, (incl - _RAD_135) / _RAD_90, (incl - _RAD_45) / _RAD_90)
    spatial_incl = jnp.where(
        lower, jnp.where(incl > _RAD_135, 1.0 - id_, 1.0 + id_),
        jnp.where(incl < _RAD_45, 1.0 + id_, 1.0 - id_))
    w_s = w_s + spatial_incl
    w_c = w_c + spatial_incl
    has_incl = jnp.where(lower, incl <= _RAD_135, incl >= _RAD_45)
    incl_vol = desc + jnp.where(lower, 1, -1)
    incl_idx_s = incl_vol * (NR_BINS + 1) + step_s
    incl_idx_c = color_off + incl_vol * (NR_COLOR_BINS + 1) + step_c
    incl_w = jnp.where(has_incl, jnp.abs(id_), 0.0)

    # azimuth
    has_az = (x_l != 0.0) | (y_l != 0.0)
    azimuth = jnp.arctan2(y_l, x_l)
    sel = desc >> 2
    az_dist = jnp.clip((azimuth - (-_RAD_PI_7_8 + _RAD_45 * sel.astype(dtype)))
                       / _RAD_45, -0.5, 0.5)
    w_s = w_s + jnp.where(has_az, 1.0 - jnp.abs(az_dist), 0.0)
    w_c = w_c + jnp.where(has_az, 1.0 - jnp.abs(az_dist), 0.0)
    az_vol = jnp.where(az_dist > 0, (desc + 4) % NR_SECTORS,
                       (desc - 4 + NR_SECTORS) % NR_SECTORS)
    az_idx_s = az_vol * (NR_BINS + 1) + step_s
    az_idx_c = color_off + az_vol * (NR_COLOR_BINS + 1) + step_c
    az_w = jnp.where(has_az, jnp.abs(az_dist), 0.0)

    usef = use.astype(dtype)
    cos_bin_s = jnp.where(bd_s > 0, (step_s + 1) % NR_BINS,
                          (step_s - 1 + NR_BINS) % NR_BINS)
    cos_bin_c = jnp.where(bd_c > 0, (step_c + 1) % NR_COLOR_BINS,
                          (step_c - 1 + NR_COLOR_BINS) % NR_COLOR_BINS)
    rad_vol_g = jnp.where(has_rad, rad_vol, 0)
    incl_vol_g = jnp.where(has_incl, incl_vol, 0)
    hist_s = _shot_histogram_2pass(
        desc, step_s, w_s * usef, cos_bin_s, cos_w_s * usef,
        rad_vol_g, rad_w * usef, incl_vol_g, incl_w * usef,
        az_vol, az_w * usef, n_bin=NR_BINS + 1)
    hist_c = _shot_histogram_2pass(
        desc, step_c, w_c * usef, cos_bin_c, cos_w_c * usef,
        rad_vol_g, rad_w * usef, incl_vol_g, incl_w * usef,
        az_vol, az_w * usef, n_bin=NR_COLOR_BINS + 1)
    hist = jnp.concatenate([hist_s, hist_c], axis=1)
    norm = jnp.linalg.norm(hist, axis=1, keepdims=True)
    descriptors = hist / jnp.maximum(norm, 1e-30)
    n_neighbors = jnp.sum(use, axis=1)
    valid = frame_valid & (n_neighbors >= min_neighbors) & (norm[:, 0] > 0)
    return ShotResult(descriptors=descriptors, valid=valid)
