"""3D shape context family: 3DSC / USC, plus RSD and RIFT descriptors.

References: features/features_3dsc.cpp (pcl::ShapeContext3DEstimation,
ShapeContext1980 = 12 azimuth x 11 elevation x 15 log-radial bins,
min_radius = radius/10), features/features_usc.cpp (pcl::UniqueShapeContext,
same geometry but a unique LRF), features/features_rsd.cpp
(pcl::RSDEstimation), features/features_rift.cpp (pcl::RIFTEstimation32 over
intensity gradients).

Divergence note: PCL's 3DSC draws a random azimuth origin per keypoint
(rand()); here both 3DSC and USC use the SHOT LRF azimuth, making 3DSC
deterministic and equal to USC's orientation scheme.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .neighbors import NeighborBlock, pairwise_sqdist
from .shot import ShotResult, _histogram_from_slots

SC_AZ = 12
SC_EL = 11
SC_RAD = 15
SC_LEN = SC_AZ * SC_EL * SC_RAD  # 1980


def shape_context_descriptor(
    keypoints: jnp.ndarray,    # [K, 3]
    frames: jnp.ndarray,       # [K, 3, 3] (rows = axes; z = normal direction)
    frame_valid: jnp.ndarray,  # [K]
    points: jnp.ndarray,       # [N, 3]
    nbr: NeighborBlock,
    radius: float,
    min_radius_factor: float = 0.1,
    density_radius_factor: float = 0.2,   # PCL point_density_radius = radius/5
    min_neighbors: int = 5,
) -> ShotResult:
    dtype = points.dtype
    use = nbr.valid & (nbr.dist > 1e-15) & jnp.isfinite(nbr.dist)
    d = jnp.where(use, nbr.dist, radius * 0.5)

    delta = points[nbr.idx] - keypoints[:, None, :]
    x_l = jnp.einsum("kmd,kd->km", delta, frames[:, 0, :])
    y_l = jnp.einsum("kmd,kd->km", delta, frames[:, 1, :])
    z_l = jnp.einsum("kmd,kd->km", delta, frames[:, 2, :])

    rmin = min_radius_factor * radius
    use = use & (d >= rmin)

    az = (jnp.arctan2(y_l, x_l) + jnp.pi) / (2 * jnp.pi)  # [0, 1)
    el = jnp.arccos(jnp.clip(z_l / d, -1.0, 1.0)) / jnp.pi  # [0, 1]
    ln_span = jnp.log(radius / rmin)
    rbin = jnp.log(jnp.maximum(d, rmin) / rmin) / ln_span  # [0, 1]

    b_az = jnp.clip((az * SC_AZ).astype(jnp.int32), 0, SC_AZ - 1)
    b_el = jnp.clip((el * SC_EL).astype(jnp.int32), 0, SC_EL - 1)
    b_r = jnp.clip((rbin * SC_RAD).astype(jnp.int32), 0, SC_RAD - 1)
    idx = (b_az * SC_EL + b_el) * SC_RAD + b_r

    # weight = 1 / (local density * cbrt(bin volume)); local density =
    # neighbor count within the density radius around each NEIGHBOR point
    dr = density_radius_factor * radius
    # density per surface point (dense masked count)
    # note: reuse of the neighbor block keeps this O(K*M) by approximating
    # the density with the count among the keypoint's support
    npos = points[nbr.idx]
    # pairwise within support would be O(K*M^2); PCL uses a global search --
    # approximate with a global per-point density computed once
    # (host of this function passes it; here compute on the fly over points)
    # global density:
    d2_pts = pairwise_sqdist(points, points)
    density = jnp.sum(d2_pts <= dr * dr, axis=1).astype(dtype)  # [N]
    rho = density[nbr.idx]                                      # [K, M]

    # bin volume ~ ((r_hi^3 - r_lo^3)/3) * (el band) * (az width)
    r_lo = rmin * jnp.exp(b_r.astype(dtype) / SC_RAD * ln_span)
    r_hi = rmin * jnp.exp((b_r.astype(dtype) + 1) / SC_RAD * ln_span)
    el_lo = b_el.astype(dtype) / SC_EL * jnp.pi
    el_hi = (b_el.astype(dtype) + 1) / SC_EL * jnp.pi
    vol = ((r_hi ** 3 - r_lo ** 3) / 3.0) * (jnp.cos(el_lo) - jnp.cos(el_hi)) \
        * (2 * jnp.pi / SC_AZ)
    w = 1.0 / jnp.maximum(rho * jnp.cbrt(jnp.maximum(vol, 1e-30)), 1e-30)
    w = jnp.where(use, w, 0.0)
    idx = jnp.where(use, idx, 0)

    hist = _histogram_from_slots(idx[..., None], w[..., None], SC_LEN)
    n_nb = jnp.sum(use, axis=1)
    valid = frame_valid & (n_nb >= min_neighbors)
    return ShotResult(descriptors=hist, valid=valid)


# ---------------------------------------------------------------------------
# RSD (radius-based surface descriptor)
# ---------------------------------------------------------------------------

RSD_SUBDIV = 5
RSD_HIST_LEN = RSD_SUBDIV * RSD_SUBDIV  # full histogram variant
RSD_MAX_RADIUS_FACTOR = 1.5             # plane_radius analogue


def rsd_descriptor(
    keypoints: jnp.ndarray,
    kp_mask: jnp.ndarray,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    nbr: NeighborBlock,
    radius: float,
    use_hist: bool = True,
    min_neighbors: int = 5,
) -> ShotResult:
    """RSD: osculating radius r = d / (2 sin(angle/2)) per neighbor; the
    descriptor is either the joint (distance, angle) 5x5 histogram
    (UseFullRSDHistogram=true) or just (r_min, r_max)."""
    dtype = points.dtype
    use = nbr.valid & (nbr.dist > 1e-15) & jnp.isfinite(nbr.dist)
    d = jnp.where(use, nbr.dist, radius * 0.5)

    kp_n = normals[nbr.idx[:, 0]]         # nearest surface normal as keypoint normal
    nn = normals[nbr.idx]
    cos_a = jnp.clip(jnp.einsum("kmd,kd->km", nn, kp_n), -1.0, 1.0)
    ang = jnp.arccos(cos_a)

    if use_hist:
        b_d = jnp.clip((d / radius * RSD_SUBDIV).astype(jnp.int32), 0, RSD_SUBDIV - 1)
        b_a = jnp.clip((ang / jnp.pi * RSD_SUBDIV).astype(jnp.int32), 0, RSD_SUBDIV - 1)
        idx = jnp.where(use, b_d * RSD_SUBDIV + b_a, 0)
        w = use.astype(dtype)
        hist = _histogram_from_slots(idx[..., None], w[..., None], RSD_HIST_LEN)
        cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
        desc = hist / cnt[:, None]
    else:
        r_est = d / jnp.maximum(2.0 * jnp.sin(ang / 2.0), 1e-3)
        r_est = jnp.clip(r_est, 0.0, RSD_MAX_RADIUS_FACTOR * radius / 0.1)
        r_min = jnp.min(jnp.where(use, r_est, jnp.inf), axis=1)
        r_max = jnp.max(jnp.where(use, r_est, 0.0), axis=1)
        r_min = jnp.where(jnp.isfinite(r_min), r_min, 0.0)
        desc = jnp.stack([r_min, r_max], axis=1)

    n_nb = jnp.sum(use, axis=1)
    valid = kp_mask & (n_nb >= min_neighbors)
    return ShotResult(descriptors=desc, valid=valid)


# ---------------------------------------------------------------------------
# RIFT (rotation-invariant feature transform over intensity gradients)
# ---------------------------------------------------------------------------

RIFT_DIST_BINS = 4
RIFT_ANGLE_BINS = 8
RIFT_LEN = RIFT_DIST_BINS * RIFT_ANGLE_BINS  # 32


def intensity_gradients(points: jnp.ndarray, normals: jnp.ndarray,
                        intensity: jnp.ndarray, mask: jnp.ndarray,
                        radius: float) -> jnp.ndarray:
    """Least-squares intensity gradient per point, projected onto the tangent
    plane (pcl::IntensityGradientEstimation essence): solve
    A g = b with A = sum w (p_j - p_i)(p_j - p_i)^T, b = sum w (I_j - I_i)
    (p_j - p_i), then remove the normal component."""
    from .neighbors import radius_covariance
    d2 = pairwise_sqdist(points, points)
    in_r = (d2 <= radius * radius) & mask[None, :]
    w = in_r.astype(points.dtype)
    hi = jax.lax.Precision.HIGHEST

    s0 = jnp.sum(w, axis=1)
    s1 = jnp.matmul(w, points, precision=hi)
    xx = (points[:, :, None] * points[:, None, :]).reshape(-1, 9)
    s2 = jnp.matmul(w, xx, precision=hi).reshape(-1, 3, 3)
    sI = jnp.matmul(w, intensity[:, None], precision=hi)[:, 0]
    sIx = jnp.matmul(w * intensity[None, :], points, precision=hi)

    p = points
    A = (s2 - p[:, :, None] * s1[:, None, :] - s1[:, :, None] * p[:, None, :]
         + s0[:, None, None] * p[:, :, None] * p[:, None, :])
    b = sIx - p * sI[:, None] - intensity[:, None] * (s1 - s0[:, None] * p)

    A = A + 1e-8 * jnp.eye(3)[None]
    g = jnp.linalg.solve(A, b[..., None])[..., 0]
    g = g - jnp.sum(g * normals, axis=1, keepdims=True) * normals
    return jnp.where(mask[:, None], g, 0.0)


def rift_descriptor(
    keypoints: jnp.ndarray,
    kp_mask: jnp.ndarray,
    points: jnp.ndarray,
    gradients: jnp.ndarray,   # [N, 3] intensity gradients
    nbr: NeighborBlock,
    radius: float,
    min_neighbors: int = 5,
) -> ShotResult:
    """RIFT-32: 4 distance rings x 8 bins over the angle between the neighbor
    gradient and the outward radial direction, weighted by gradient magnitude,
    bilinear soft binning, normalized to sum 1 (PCL RIFTEstimation)."""
    dtype = points.dtype
    use = nbr.valid & (nbr.dist > 1e-15) & jnp.isfinite(nbr.dist)
    d = jnp.where(use, nbr.dist, radius * 0.5)

    delta = points[nbr.idx] - keypoints[:, None, :]
    radial = delta / jnp.maximum(d[..., None], 1e-12)
    g = gradients[nbr.idx]
    gmag = jnp.linalg.norm(g, axis=-1)
    gdir = g / jnp.maximum(gmag[..., None], 1e-12)
    cos_t = jnp.clip(jnp.sum(radial * gdir, axis=-1), -1.0, 1.0)
    theta = jnp.arccos(cos_t)

    db = d / radius * RIFT_DIST_BINS - 0.5
    ab = theta / jnp.pi * RIFT_ANGLE_BINS - 0.5
    d0 = jnp.clip(jnp.floor(db).astype(jnp.int32), 0, RIFT_DIST_BINS - 2)
    a0 = jnp.clip(jnp.floor(ab).astype(jnp.int32), 0, RIFT_ANGLE_BINS - 2)
    fd = jnp.clip(db - d0, 0.0, 1.0)
    fa = jnp.clip(ab - a0, 0.0, 1.0)

    base = d0 * RIFT_ANGLE_BINS + a0
    idx = jnp.stack([base, base + 1,
                     base + RIFT_ANGLE_BINS, base + RIFT_ANGLE_BINS + 1], axis=-1)
    w = jnp.stack([(1 - fd) * (1 - fa), (1 - fd) * fa,
                   fd * (1 - fa), fd * fa], axis=-1) * gmag[..., None]
    w = w * use.astype(dtype)[..., None]
    idx = jnp.where(use[..., None], idx, 0)

    hist = _histogram_from_slots(idx, w, RIFT_LEN)
    total = jnp.maximum(jnp.sum(hist, axis=1, keepdims=True), 1e-30)
    out = hist / total
    n_nb = jnp.sum(use, axis=1)
    valid = kp_mask & (n_nb >= min_neighbors)
    return ShotResult(descriptors=out, valid=valid)
