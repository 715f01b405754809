"""Whole-cloud (global) descriptors: ESF, VFH, GRSD, GASD.

Reference wrappers: features/features_esf.cpp (pcl::ESFEstimation, 640),
features/features_vfh.cpp (pcl::VFHEstimation, 308, NormalizeBins=true,
NormalizeDistance=false), features/features_grsd.cpp (pcl::GRSDEstimation,
21), features/features_gasd.cpp (pcl::GASDColorEstimation, 984 with color /
512 shape-only).

These are TPU-first re-implementations of the published algorithms, not
bit-exact PCL ports (noted divergences in each docstring); they are the
verification-stage inputs whose job is separability, trained and evaluated
with the same implementation on both sides.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .shot import _histogram_from_slots


# ---------------------------------------------------------------------------
# ESF-640 (Wohlkinger & Vincze)
# ---------------------------------------------------------------------------

ESF_BINS = 64
ESF_SAMPLES = 20000
ESF_GRID = 64


def esf_sample_indices(n: int, mask: jnp.ndarray, seed: int = 0,
                       samples: int = ESF_SAMPLES):
    """The three index streams of point pairs/triples ESF samples.
    Deterministic PRNG sampling replaces the reference's rand()
    (divergence: sample sequence, not structure).  Split out so the golden
    oracle can treat the indices as shared inputs (like frames for SHOT).

    Draws are uniform over the `count` valid points (stable order), so the
    stream depends only on the valid prefix content, not the padding bucket
    size — the same cloud yields the same descriptor at any padded length."""
    del n
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    count = jnp.maximum(mask.sum(), 1)
    order = jnp.argsort(~mask, stable=True)   # valid indices first

    def pick(k, shape):
        return order[jax.random.randint(k, shape, 0, count)]

    return (pick(k1, (samples,)), pick(k2, (samples,)),
            pick(k3, (samples,)))


def esf_descriptor(points: jnp.ndarray, mask: jnp.ndarray,
                   seed: int = 0, indices=None) -> jnp.ndarray:
    """[640] = 10 x 64-bin histograms: D2 distances, A3 angles and D3 areas
    of random point pairs/triples, each split by the line-tracing class
    (IN on-surface / OUT free-space / MIXED) over a 64^3 occupancy grid,
    plus the in/out ratio histogram.  `indices` overrides the sampled
    (ia, ib, ic) streams (golden-oracle hook)."""
    n = points.shape[0]
    dtype = points.dtype
    m = mask.astype(dtype)

    # normalize cloud into the unit grid
    big = jnp.asarray(jnp.inf, dtype)
    mn = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    mx = jnp.max(jnp.where(mask[:, None], points, -big), axis=0)
    scale = jnp.maximum(jnp.max(mx - mn), 1e-12)
    unit = (points - mn) / scale              # in [0, 1]^3 (approx)

    # occupancy grid
    cells = jnp.clip((unit * (ESF_GRID - 1)).astype(jnp.int32), 0, ESF_GRID - 1)
    flat = (cells[:, 0] * ESF_GRID + cells[:, 1]) * ESF_GRID + cells[:, 2]
    # invalid rows route to an out-of-range index and are dropped — routing
    # them to index 0 would spuriously occupy voxel (0,0,0) on padded clouds
    occ = jnp.zeros(ESF_GRID ** 3, bool) \
        .at[jnp.where(mask, flat, ESF_GRID ** 3)].set(True, mode="drop")

    ia, ib, ic = esf_sample_indices(n, mask, seed) \
        if indices is None else indices

    pa, pb, pc = unit[ia], unit[ib], unit[ic]

    def line_class(p, q, steps: int = 16):
        """Fraction of sampled in-between voxels occupied -> IN/OUT/MIXED."""
        t = (jnp.arange(1, steps + 1, dtype=dtype) / (steps + 1))[None, :, None]
        samples = p[:, None, :] * (1 - t) + q[:, None, :] * t  # [S, steps, 3]
        c = jnp.clip((samples * (ESF_GRID - 1)).astype(jnp.int32), 0, ESF_GRID - 1)
        f = (c[..., 0] * ESF_GRID + c[..., 1]) * ESF_GRID + c[..., 2]
        hit = occ[f]
        frac = jnp.mean(hit.astype(dtype), axis=1)
        cls = jnp.where(frac > 0.9, 0, jnp.where(frac < 0.1, 1, 2))  # in/out/mix
        return cls, frac

    def hist(vals, sel, lo, hi):
        b = jnp.clip(((vals - lo) / (hi - lo) * ESF_BINS).astype(jnp.int32),
                     0, ESF_BINS - 1)
        return _histogram_from_slots(
            b[None, :, None], sel.astype(dtype)[None, :, None], ESF_BINS)[0]

    # D2: pair distances, by class
    d2 = jnp.linalg.norm(pa - pb, axis=1)
    cls_ab, frac_ab = line_class(pa, pb)
    h_d2 = [hist(d2, cls_ab == c, 0.0, jnp.sqrt(3.0)) for c in range(3)]
    # ratio histogram of in-fraction for mixed lines
    h_ratio = hist(frac_ab, cls_ab >= 0, 0.0, 1.0)

    # A3: angle at b in triangle (a, b, c), classified by the opposite edge
    v1 = pa - pb
    v2 = pc - pb
    cosang = jnp.sum(v1 * v2, axis=1) / jnp.maximum(
        jnp.linalg.norm(v1, axis=1) * jnp.linalg.norm(v2, axis=1), 1e-12)
    ang = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
    cls_ac, _ = line_class(pa, pc)
    h_a3 = [hist(ang, cls_ac == c, 0.0, jnp.pi) for c in range(3)]

    # D3: sqrt of triangle area, classified by majority of the three edges
    area = 0.5 * jnp.linalg.norm(jnp.cross(pb - pa, pc - pa), axis=1)
    d3 = jnp.sqrt(area)
    cls_bc, _ = line_class(pb, pc)
    votes_in = ((cls_ab == 0).astype(jnp.int32) + (cls_ac == 0) + (cls_bc == 0))
    votes_out = ((cls_ab == 1).astype(jnp.int32) + (cls_ac == 1) + (cls_bc == 1))
    tri_cls = jnp.where(votes_in >= 2, 0, jnp.where(votes_out >= 2, 1, 2))
    h_d3 = [hist(d3, tri_cls == c, 0.0, jnp.sqrt(0.5 * jnp.sqrt(3.0))) for c in range(3)]

    full = jnp.concatenate(h_d2 + h_a3 + h_d3 + [h_ratio])
    return full / jnp.maximum(jnp.sum(full), 1e-30)


# ---------------------------------------------------------------------------
# VFH-308 (Rusu et al.)
# ---------------------------------------------------------------------------

VFH_BINS = 45
VFH_VP_BINS = 128
VFH_LEN = 4 * VFH_BINS + VFH_VP_BINS  # 308


def vfh_descriptor(points: jnp.ndarray, normals: jnp.ndarray,
                   mask: jnp.ndarray,
                   viewpoint=(0.0, 0.0, 0.0),
                   centroid: jnp.ndarray = None,
                   avg_normal: jnp.ndarray = None,
                   normalize_bins: bool = True) -> jnp.ndarray:
    """Viewpoint Feature Histogram: Darboux-frame angles of every point
    against the (centroid, average-normal) pair via pcl::computePairFeatures
    (incl. its source/target swap), 45 bins each in PCL's block order
    (f1 = atan2, f2 = v.n, f3 = cos, normalized distance),
    percentage-normalized (NormalizeBins=true), plus a 128-bin viewpoint
    component over cos(angle(normal, viewpoint direction)).

    `centroid` / `avg_normal` override the cloud averages — PCL's
    UseGivenCentroid/UseGivenNormal path that CVFH drives per cluster;
    `normalize_bins=False` keeps raw counts (CVFH sets NormalizeBins
    false, features_cvfh.cpp:52)."""
    from .fpfh import pair_features_pcl
    dtype = points.dtype
    m = mask.astype(dtype)
    msum = jnp.maximum(m.sum(), 1.0)
    if centroid is None:
        centroid = jnp.sum(points * m[:, None], axis=0) / msum
    if avg_normal is None:
        n_avg = jnp.sum(normals * m[:, None], axis=0)
    else:
        n_avg = avg_normal
    n_avg = n_avg / jnp.maximum(jnp.linalg.norm(n_avg), 1e-12)

    f1, f2, f3, d, deg = pair_features_pcl(
        jnp.broadcast_to(centroid[None, :], points.shape),
        jnp.broadcast_to(n_avg[None, :], points.shape), points, normals)
    max_d = jnp.max(jnp.where(mask, d, 0.0))
    dn = d / jnp.maximum(max_d, 1e-12)

    # degenerate pairs (point == centroid / parallel) are skipped but the
    # normalization denominator keeps the full size (PCL continue semantics)
    mc = m * (~deg).astype(dtype)
    norm_fac = (100.0 / msum) if normalize_bins else 1.0

    def hist45(vals, lo, hi, weights):
        b = jnp.clip(((vals - lo) / (hi - lo) * VFH_BINS).astype(jnp.int32),
                     0, VFH_BINS - 1)
        h = _histogram_from_slots(b[None, :, None], weights[None, :, None],
                                  VFH_BINS)[0]
        return norm_fac * h

    h1 = hist45(f1, -jnp.pi, jnp.pi, mc)
    h2 = hist45(f2, -1.0, 1.0, mc)
    h3 = hist45(f3, -1.0, 1.0, mc)
    hd = hist45(dn, 0.0, 1.0, mc)

    vp = jnp.asarray(viewpoint, dtype)
    vdir = vp[None, :] - points
    vdir = vdir / jnp.maximum(jnp.linalg.norm(vdir, axis=1, keepdims=True), 1e-12)
    cos_vp = jnp.sum(normals * vdir, axis=1)
    bvp = jnp.clip(((cos_vp + 1.0) / 2.0 * VFH_VP_BINS).astype(jnp.int32),
                   0, VFH_VP_BINS - 1)
    hvp = _histogram_from_slots(bvp[None, :, None], m[None, :, None], VFH_VP_BINS)[0]
    hvp = norm_fac * hvp

    return jnp.concatenate([h1, h2, h3, hd, hvp])


# ---------------------------------------------------------------------------
# GRSD-21 (Marton et al.)
# ---------------------------------------------------------------------------

GRSD_LEN = 21


def _rsd_radii(points, normals, mask, radius):
    """Per-point RSD (r_min, r_max): for neighbor pairs, the osculating
    radius estimate r = d / (2 sin(angle/2)); min/max over the neighborhood
    (pcl::RSDEstimation essence)."""
    from .neighbors import pairwise_sqdist
    d2 = pairwise_sqdist(points, points)
    in_r = (d2 <= radius * radius) & mask[None, :] & (d2 > 1e-12)
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    cos_a = jnp.clip(jnp.matmul(normals, normals.T,
                                precision=jax.lax.Precision.HIGHEST), -1.0, 1.0)
    ang = jnp.arccos(cos_a)
    r_est = d / jnp.maximum(2.0 * jnp.sin(ang / 2.0), 1e-3)
    r_est = jnp.clip(r_est, 0.0, 1e3)
    r_min = jnp.min(jnp.where(in_r, r_est, jnp.inf), axis=1)
    r_max = jnp.max(jnp.where(in_r, r_est, 0.0), axis=1)
    has = jnp.any(in_r, axis=1)
    return jnp.where(has, r_min, 0.0), r_max, has


def _surface_type(r_min, r_max, radius):
    """Surface class per GRSD: 0 plane, 1 cylinder, 2 noise/corner, 3 sphere,
    4 edge (thresholds relative to the support radius)."""
    plane = r_min > 2.0 * radius
    sphere = (r_max < 2.0 * radius) & (r_min > 0.5 * radius)
    cylinder = (r_min < 2.0 * radius) & (r_max > 2.0 * radius) & (r_min > 0.5 * radius)
    edge = r_min < 0.15 * radius
    t = jnp.where(plane, 0,
                  jnp.where(cylinder, 1,
                            jnp.where(sphere, 3,
                                      jnp.where(edge, 4, 2))))
    return t


def grsd_descriptor(points: jnp.ndarray, normals: jnp.ndarray,
                    mask: jnp.ndarray, radius: float,
                    types=None) -> jnp.ndarray:
    """[21] = upper-triangle (incl. diagonal) of the 6x6 surface-type
    transition matrix between neighboring points (type 5 = free space is not
    observable from a single cloud and stays empty, matching GRSD's empty-
    space column only when ray tracing is unavailable).  `types` overrides
    the per-point surface classes (golden-oracle hook: the RSD radius
    estimate d / (2 sin(angle/2)) is precision-unstable for near-parallel
    normals, so class labels near thresholds can differ between fp32 and a
    fp64 oracle)."""
    from .neighbors import pairwise_sqdist
    if types is None:
        r_min, r_max, has = _rsd_radii(points, normals, mask, radius)
        t = _surface_type(r_min, r_max, radius)
        t = jnp.where(has & mask, t, 5)
    else:
        t = types

    d2 = pairwise_sqdist(points, points)
    adj = (d2 <= radius * radius) & (d2 > 1e-12) & mask[None, :] & mask[:, None]
    ti = t[:, None]
    tj = t[None, :]
    lo = jnp.minimum(ti, tj)
    hi = jnp.maximum(ti, tj)
    # upper-triangle index of (lo, hi) in a 6x6 symmetric matrix
    tri = (lo * (11 - lo)) // 2 + (hi - lo)
    w = adj.astype(points.dtype)
    h = _histogram_from_slots(tri.reshape(1, -1, 1), w.reshape(1, -1, 1), GRSD_LEN)[0]
    return h / jnp.maximum(jnp.sum(h), 1e-30)


# ---------------------------------------------------------------------------
# GASD (Lima & Teichrieb): 512 shape-only / 984 with color
# ---------------------------------------------------------------------------

def gasd_descriptor(points: jnp.ndarray, mask: jnp.ndarray,
                    rgb=None) -> jnp.ndarray:
    """Grid-aligned shape (+ color) descriptor: align the cloud to its PCA
    reference frame, histogram point counts over an 8^3 grid (512, shape
    only) or 6^3 shape + 4^3 x 12 hue bins (216 + 768 = 984) with color
    (pcl::GASDSignature512 / GASDSignature984 layouts)."""
    from .eigh3 import eigh3x3
    dtype = points.dtype
    m = mask.astype(dtype)
    msum = jnp.maximum(m.sum(), 1.0)
    c = jnp.sum(points * m[:, None], axis=0) / msum
    centered = points - c
    cov = jnp.einsum("n,ni,nj->ij", m, centered, centered) / msum
    _, vecs = eigh3x3(cov)

    # sign disambiguation: each extreme axis points toward the cloud's
    # third-moment (skewness) majority, so the frame does not depend on the
    # eigensolver's arbitrary eigenvector signs and is repeatable across
    # views of the same object.  PCL's GASD flips toward the camera
    # viewpoint (pcl gasd.hpp); these clouds carry no viewpoint, so the
    # intrinsic skewness rule replaces it (documented divergence).
    def _flip(v):
        s = jnp.sum(m * (centered @ v) ** 3)
        return jnp.where(s < 0, -v, v)

    a0 = _flip(vecs[:, 0])          # smallest eigenvalue
    a2 = _flip(vecs[:, 2])          # largest eigenvalue
    a1 = jnp.cross(a2, a0)          # right-handed middle axis
    axes = jnp.stack([a0, a1, a2])  # rows = axes (ascending eigenvalue)
    local = centered @ axes.T

    half = jnp.max(jnp.where(mask[:, None], jnp.abs(local), 0.0))
    half = jnp.maximum(half, 1e-12)
    unit = jnp.clip((local / half + 1.0) / 2.0, 0.0, 1.0 - 1e-6)

    def grid_hist(g):
        cells = (unit * g).astype(jnp.int32)
        flat = (cells[:, 0] * g + cells[:, 1]) * g + cells[:, 2]
        h = _histogram_from_slots(flat[None, :, None], m[None, :, None], g ** 3)[0]
        return h / msum

    if rgb is None:
        return grid_hist(8)

    shape = grid_hist(6)
    # hue histogram per 4^3 cell
    r, g_, b = rgb[:, 0], rgb[:, 1], rgb[:, 2]
    mx = jnp.max(rgb, axis=1)
    mn_c = jnp.min(rgb, axis=1)
    diff = jnp.maximum(mx - mn_c, 1e-12)
    hue = jnp.where(mx == r, (g_ - b) / diff,
                    jnp.where(mx == g_, 2.0 + (b - r) / diff,
                              4.0 + (r - g_) / diff))
    hue = (hue * 60.0) % 360.0
    hue_bin = jnp.clip((hue / 360.0 * 12).astype(jnp.int32), 0, 11)
    cells4 = (unit * 4).astype(jnp.int32)
    flat4 = ((cells4[:, 0] * 4 + cells4[:, 1]) * 4 + cells4[:, 2]) * 12 + hue_bin
    color = _histogram_from_slots(flat4[None, :, None], m[None, :, None],
                                  4 ** 3 * 12)[0] / msum
    return jnp.concatenate([shape, color])
