"""FPFH-33 descriptor (Rusu et al., PCL FPFHEstimation; the reference wraps
it at features/features_fpfh.cpp).

Per pair (p, q) the Darboux-frame features come from
pcl::computePairFeatures (pfh_tools.cpp) INCLUDING its source/target swap
(the point whose normal has the smaller angle to the connecting line
becomes the source):
  f1 = atan2(w . n_t, n_s . n_t) in [-pi, pi]
  f2 = v . n_t                   in [-1, 1]
  f3 = n_s . (t - s) / d         in [-1, 1]
SPFH(p) = three 11-bin histograms over p's neighbors in PCL's block order
(f1 | f2 | f3), each increment 100/#neighbors; degenerate pairs are skipped
but still count in the denominator.  FPFH(p) = SPFH(p) +
(1/k) sum_q SPFH(q)/d(p,q)^2, then each block renormalized to sum 100.
Oracle: tests/golden_ref.fpfh_ref.

TPU formulation: SPFH for all surface points via fixed-capacity neighbor
blocks + the chunked-bin histogram kernel; the FPFH weighting step is a
masked gather + einsum.
"""

from __future__ import annotations

import jax.numpy as jnp

from .neighbors import gather_radius_neighbors
from .shot import ShotResult, _histogram_from_slots

FPFH_BINS = 11
FPFH_LEN = 3 * FPFH_BINS


def _spfh_bins(f1, f2, f3):
    """PCL block packing: f1 (atan2) | f2 | f3, 11 bins each."""
    b1 = jnp.clip((FPFH_BINS * (f1 + jnp.pi) / (2.0 * jnp.pi)).astype(jnp.int32),
                  0, FPFH_BINS - 1)
    b2 = jnp.clip((FPFH_BINS * (f2 + 1.0) / 2.0).astype(jnp.int32), 0, FPFH_BINS - 1)
    b3 = jnp.clip((FPFH_BINS * (f3 + 1.0) / 2.0).astype(jnp.int32), 0, FPFH_BINS - 1)
    return jnp.stack([b1, b2 + FPFH_BINS, b3 + 2 * FPFH_BINS], axis=-1)


def spfh_all_points(points: jnp.ndarray, normals: jnp.ndarray,
                    mask: jnp.ndarray, radius: float,
                    capacity: int = 128) -> jnp.ndarray:
    """[N, 33] SPFH histograms for every surface point."""
    nbr = gather_radius_neighbors(points, points, mask, radius, capacity,
                                  exclude_zero_dist=True)
    q = points[nbr.idx]          # [N, M, 3]
    nq = normals[nbr.idx]
    f1, f2, f3, _, deg = pair_features_pcl(
        points[:, None, :], normals[:, None, :], q, nq)
    idx = _spfh_bins(f1, f2, f3)                                 # [N, M, 3]

    contrib = nbr.valid & ~deg
    count = jnp.maximum(jnp.sum(nbr.valid, axis=1), 1)
    incr = (100.0 / count.astype(points.dtype))[:, None, None]
    w = jnp.where(contrib[..., None], incr, 0.0) * jnp.ones_like(idx, points.dtype)
    idx = jnp.where(contrib[..., None], idx, 0)
    return _histogram_from_slots(idx, w, FPFH_LEN)


def fpfh_descriptor(
    keypoints: jnp.ndarray,    # [K, 3]
    kp_mask: jnp.ndarray,      # [K]
    points: jnp.ndarray,       # [N, 3]
    normals: jnp.ndarray,      # [N, 3]
    mask: jnp.ndarray,         # [N]
    radius: float,
    capacity: int = 128,
    min_neighbors: int = 5,
) -> ShotResult:
    spfh = spfh_all_points(points, normals, mask, radius, capacity)

    # SPFH at the keypoint itself: keypoints may not be surface points
    # (voxel-grid centroids), so compute their own SPFH too
    nbr_k = gather_radius_neighbors(keypoints, points, mask, radius, capacity,
                                    exclude_zero_dist=True)
    # keypoint normals: use the nearest surface point's normal (PCL keypoints
    # carry normals from the input cloud; the voxel-centroid analogue).
    # NB: slot 0 may be an invalidated zero-distance self-pair (its index is
    # rewritten to 0), so take the argmin over valid distances (inf when
    # invalid), not idx[:, 0].
    nearest_slot = jnp.argmin(nbr_k.dist, axis=1)
    nearest = jnp.take_along_axis(nbr_k.idx, nearest_slot[:, None], axis=1)[:, 0]
    kp_normals = normals[nearest]
    q = points[nbr_k.idx]
    nq = normals[nbr_k.idx]
    f1, f2, f3, _, deg = pair_features_pcl(
        keypoints[:, None, :], kp_normals[:, None, :], q, nq)
    idx = _spfh_bins(f1, f2, f3)
    contrib = nbr_k.valid & ~deg
    count = jnp.maximum(jnp.sum(nbr_k.valid, axis=1), 1)
    incr = (100.0 / count.astype(points.dtype))[:, None, None]
    w = jnp.where(contrib[..., None], incr, 0.0) * jnp.ones_like(idx, points.dtype)
    idx = jnp.where(contrib[..., None], idx, 0)
    spfh_kp = _histogram_from_slots(idx, w, FPFH_LEN)

    # weighted neighbor SPFH sum: fpfh = spfh_kp + (1/k) sum spfh_q / d^2
    d_safe = jnp.where(nbr_k.valid, jnp.maximum(nbr_k.dist, 1e-6), jnp.inf)
    wgt = jnp.where(nbr_k.valid, 1.0 / (d_safe * d_safe), 0.0)   # [K, M]
    nb_spfh = spfh[nbr_k.idx]                                    # [K, M, 33]
    k_count = jnp.maximum(jnp.sum(nbr_k.valid, axis=1), 1).astype(points.dtype)
    acc = spfh_kp + jnp.einsum("km,kml->kl", wgt, nb_spfh) / k_count[:, None]

    # renormalize each 11-bin block to sum 100 (PCL)
    blocks = acc.reshape(-1, 3, FPFH_BINS)
    sums = jnp.maximum(jnp.sum(blocks, axis=2, keepdims=True), 1e-30)
    out = (100.0 * blocks / sums).reshape(-1, FPFH_LEN)

    n_neighbors = jnp.sum(nbr_k.valid, axis=1)
    valid = kp_mask & (n_neighbors >= min_neighbors)
    return ShotResult(descriptors=out, valid=valid)


def pair_features_pcl(p1, n1, p2, n2):
    """pcl::computePairFeatures semantics incl. the source/target swap: the
    point whose normal has the smaller angle to the connecting line becomes
    the source (pcl/features/pfh_tools.cpp).  Inputs broadcastable [..., 3];
    returns (f1, f2, f3, f4) with f1 in [-pi, pi], f2/f3 cosines, f4 = d."""
    dp = p2 - p1
    f4 = jnp.linalg.norm(dp, axis=-1)
    d_safe = jnp.maximum(f4, 1e-12)[..., None]
    dpn = dp / d_safe

    a1 = jnp.sum(n1 * dpn, axis=-1)
    a2 = jnp.sum(n2 * dpn, axis=-1)
    swap = jnp.arccos(jnp.clip(jnp.abs(a1), 0, 1)) > \
        jnp.arccos(jnp.clip(jnp.abs(a2), 0, 1))

    n1c = jnp.where(swap[..., None], n2, n1)
    n2c = jnp.where(swap[..., None], n1, n2)
    dpc = jnp.where(swap[..., None], -dpn, dpn)
    # on swap the connecting line flips, so f3 = n_source . d is -a2
    # (pcl pair_features: "f3 = angle2 * (-1)"); this also makes the pair
    # features symmetric in argument order
    f3 = jnp.where(swap, -a2, a1)

    v = jnp.cross(dpc, n1c)
    v_n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v / jnp.maximum(v_n, 1e-12)
    w = jnp.cross(n1c, v)
    f2 = jnp.sum(v * n2c, axis=-1)
    f1 = jnp.arctan2(jnp.sum(w * n2c, axis=-1), jnp.sum(n1c * n2c, axis=-1))
    degenerate = v_n[..., 0] < 1e-12
    return f1, f2, f3, f4, degenerate
