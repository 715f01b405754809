"""SHOT local reference frames (LRFs), batched and mask-aware.

Algorithm (Tombari et al., "Unique Signatures of Histograms", ECCV 2010; PCL
pcl::SHOTLocalReferenceFrameEstimation::getLocalRF, which the reference wraps
at features/features.cpp:238-252 and uses for consistent normal orientation at
utils/normal_orientation.cpp:48-110):

  1. Weighted covariance about the query point p over in-radius neighbors,
     weights (R - d_i), normalized by the weight sum.
  2. EVD; x-axis <- eigenvector of the largest eigenvalue, z-axis <- smallest.
  3. Sign disambiguation: flip x (resp. z) so that the majority of neighbor
     offset vectors have non-negative dot product with it.  PCL breaks exact
     ties with a median-distance window; exact ties are measure-zero on real
     float data, so here a tie keeps the eigenvector sign from a deterministic
     orientation convention (documented divergence).
  4. y = z cross x.
  5. Frames with fewer than 5 in-radius neighbors are invalid (PCL returns
     all-NaN; we return a False validity flag).

TPU formulation: moments via masked matmuls (ops/neighbors.radius_covariance),
batched closed-form 3x3 symmetric EVD, disambiguation via two more matmuls --
no per-point kd-tree work anywhere.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .eigh3 import eigh3x3
from .neighbors import pairwise_sqdist, radius_covariance


class LRFResult(NamedTuple):
    frames: jnp.ndarray  # [Q, 3, 3] rows = x_axis, y_axis, z_axis
    valid: jnp.ndarray   # [Q] bool


def eigh3x3_batched(cov: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched symmetric 3x3 EVD via the closed form (ops/eigh3.py) --
    pure elementwise VPU arithmetic instead of an iterative eigensolver.
    Returns (eigvals asc [Q,3], eigvecs [Q,3,3] columns)."""
    return eigh3x3(cov)


def _use_pallas() -> bool:
    """Fused-kernel path selection (ops/pallas/lrf_moments.py) via the
    shared subprocess-probed selector (ops/pallas.use_pallas):
    PCD_USE_PALLAS=1 forces on, =0 forces off, unset = auto on real TPU
    backends.  NB the fused kernels compute exact coordinate distances
    (not the matmul identity), so ~2% of near-degenerate frames may settle
    on a different sign; parity is statistical
    (tests/test_pallas_kernels.py)."""
    from .pallas import use_pallas
    return use_pallas()


def _fused_lrf_moments(queries, q_mask, points, mask, radius):
    """One [Q, N] distance/gate pass shared by the moment matmuls and the
    sign votes (the naive composition materializes the distance block
    twice; the LRF stage is HBM-bound on it).  Same math as
    radius_covariance(weighting="shot", center="query"), including the
    centroid shift that keeps the moment identity stable.

    Returns (pts_s, q_s, in_r, n_in, s0, v1, v3): shifted coords, the
    in-radius gate, counts, weight sums, and the x/z eigenvector
    candidates."""
    m = mask.astype(points.dtype)
    shift = jnp.sum(points * m[:, None], axis=0) / jnp.maximum(m.sum(), 1.0)
    pts_s = points - shift
    q_s = queries - shift

    d2 = pairwise_sqdist(q_s, pts_s)
    in_r = (d2 <= radius * radius) & mask[None, :]
    w = jnp.where(in_r, radius - jnp.sqrt(d2), 0.0).astype(points.dtype)

    hi = jax.lax.Precision.HIGHEST
    n_in = jnp.sum(in_r, axis=1)
    s0 = jnp.sum(w, axis=1)
    s1 = jnp.matmul(w, pts_s, precision=hi)                      # [Q, 3]
    xx = (pts_s[:, :, None] * pts_s[:, None, :]).reshape(-1, 9)  # [N, 9]
    s2 = jnp.matmul(w, xx, precision=hi).reshape(-1, 3, 3)       # [Q, 3, 3]
    s0_safe = jnp.maximum(s0, 1e-30)
    c = jnp.where(q_mask[:, None], q_s, 0.0)
    cov = (s2 - c[:, :, None] * s1[:, None, :]
           - s1[:, :, None] * c[:, None, :]
           + s0[:, None, None] * c[:, :, None] * c[:, None, :])
    cov = cov / s0_safe[:, None, None]

    _, vecs = eigh3x3_batched(cov)
    v1 = vecs[:, :, 2]  # largest eigenvalue -> x axis candidate
    v3 = vecs[:, :, 0]  # smallest -> z axis candidate
    return pts_s, q_s, in_r, n_in, s0, v1, v3


def shot_lrf(
    queries: jnp.ndarray,    # [Q, 3] keypoints
    q_mask: jnp.ndarray,     # [Q]
    points: jnp.ndarray,     # [N, 3] surface
    mask: jnp.ndarray,       # [N]
    radius: float,
    min_neighbors: int = 5,
    z_only: bool = False,
) -> LRFResult:
    """z_only skips the x-axis sign disambiguation (valid only when the
    caller consumes just the z axis, e.g. compute_normals_fast; the z
    votes are identical either way)."""
    if _use_pallas():
        from .pallas.lrf_moments import shot_lrf_pallas
        frames, valid = shot_lrf_pallas(queries, q_mask, points, mask,
                                        radius, min_neighbors,
                                        z_only=z_only)
        return LRFResult(frames=frames, valid=valid)

    pts_s, q_s, in_r, n_in, s0, v1, v3 = _fused_lrf_moments(
        queries, q_mask, points, mask, radius)

    def flip_sign(v):
        dots = jnp.einsum("nd,qd->qn", pts_s, v) \
            - jnp.sum(q_s * v, axis=1)[:, None]
        plus = jnp.sum((dots >= 0) & in_r, axis=1)
        minus = n_in - plus
        flip = plus < minus  # majority-vote sign; ties keep eigh's convention
        return jnp.where(flip[:, None], -v, v)

    x_axis = v1 if z_only else flip_sign(v1)
    z_axis = flip_sign(v3)
    y_axis = jnp.cross(z_axis, x_axis)

    frames = jnp.stack([x_axis, y_axis, z_axis], axis=1)  # rows = axes
    valid = q_mask & (n_in >= min_neighbors) & (s0 > 0)
    return LRFResult(frames=frames, valid=valid)


def shot_na_lrf(
    queries: jnp.ndarray,
    q_mask: jnp.ndarray,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    mask: jnp.ndarray,
    radius: float,
    min_neighbors: int = 5,
) -> LRFResult:
    """SHOT 'no-ambiguity' LRF (reference third_party/pcl_shot_na_lrf,
    used for ReferenceFrameType SHOTNA and consistent-normals method 2's
    sibling): identical to the SHOT LRF except the z-axis sign follows the
    majority of *neighbor normals* (dot(n_j, v3) >= 0) instead of the offset
    vectors -- removing the z ambiguity on flat regions.

    Single [Q, N] distance/gate pass shared by moments and sign votes
    (same fusion as shot_lrf)."""
    pts_s, q_s, in_r, n_in, s0, v1, v3 = _fused_lrf_moments(
        queries, q_mask, points, mask, radius)

    # x-axis: offset-vector majority (same as SHOT)
    dots_x = jnp.einsum("nd,qd->qn", pts_s, v1) \
        - jnp.sum(q_s * v1, axis=1)[:, None]
    plus_x = jnp.sum((dots_x >= 0) & in_r, axis=1)
    x_axis = jnp.where((plus_x < n_in - plus_x)[:, None], -v1, v1)

    # z-axis: neighbor-NORMAL majority (the "na" part)
    dots_z = jnp.einsum("nd,qd->qn", normals, v3)
    plus_z = jnp.sum((dots_z >= 0) & in_r, axis=1)
    z_axis = jnp.where((plus_z < n_in - plus_z)[:, None], -v3, v3)

    y_axis = jnp.cross(z_axis, x_axis)
    frames = jnp.stack([x_axis, y_axis, z_axis], axis=1)
    valid = q_mask & (n_in >= min_neighbors) & (s0 > 0)
    return LRFResult(frames=frames, valid=valid)


def flare_lrf(
    queries: jnp.ndarray,
    q_mask: jnp.ndarray,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    mask: jnp.ndarray,
    radius: float,
    tangent_radius: float,
    min_neighbors: int = 5,
) -> LRFResult:
    """FLARE LRF (Petrelli & Di Stefano; pcl::FLARELocalReferenceFrameEstimation,
    wrapped at features/features.cpp:209-235): z = local surface normal
    (plane fit), x = tangent-plane projection of the direction to the point
    with the largest signed distance along z within the tangent radius."""
    from .eigh3 import eigh3x3
    mom = radius_covariance(queries, points, mask, radius,
                            weighting="uniform", center="mean")
    vals, vecs = eigh3x3(mom.cov)
    z_axis = vecs[:, :, 0]
    # orient z toward the viewpoint (origin), FLARE's default
    flip = jnp.sum(z_axis * (0.0 - queries), axis=1) < 0
    z_axis = jnp.where(flip[:, None], -z_axis, z_axis)

    d2 = pairwise_sqdist(queries, points)
    in_t = (d2 <= tangent_radius * tangent_radius) & mask[None, :]
    # signed height of each candidate along z
    h = jnp.einsum("nd,qd->qn", points, z_axis) - \
        jnp.sum(queries * z_axis, axis=1)[:, None]
    h = jnp.where(in_t, h, -jnp.inf)
    best = jnp.argmax(h, axis=1)
    dir_vec = points[best] - queries
    x_axis = dir_vec - jnp.sum(dir_vec * z_axis, axis=1, keepdims=True) * z_axis
    nrm = jnp.linalg.norm(x_axis, axis=1, keepdims=True)
    fallback = jnp.stack([jnp.ones_like(nrm[:, 0]), jnp.zeros_like(nrm[:, 0]),
                          jnp.zeros_like(nrm[:, 0])], axis=1)
    x_axis = jnp.where(nrm > 1e-8, x_axis / jnp.maximum(nrm, 1e-12), fallback)
    y_axis = jnp.cross(z_axis, x_axis)

    n_in = jnp.sum((d2 <= radius * radius) & mask[None, :], axis=1)
    frames = jnp.stack([x_axis, y_axis, z_axis], axis=1)
    valid = q_mask & (n_in >= min_neighbors) & jnp.any(in_t, axis=1)
    return LRFResult(frames=frames, valid=valid)


def board_lrf(
    queries: jnp.ndarray,
    q_mask: jnp.ndarray,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    mask: jnp.ndarray,
    radius: float,
    min_neighbors: int = 5,
) -> LRFResult:
    """BOARD LRF (Petrelli & Di Stefano; pcl::BOARDLocalReferenceFrameEstimation,
    wrapped at features/features.cpp:181-206).  Simplified faithful variant:
    z = plane-fit normal oriented toward the viewpoint; x = tangent projection
    of the direction to the in-radius point whose normal deviates most from z
    (the descriptive direction BOARD seeks); border-aware hole compensation is
    not replicated (documented divergence)."""
    from .eigh3 import eigh3x3
    mom = radius_covariance(queries, points, mask, radius,
                            weighting="uniform", center="mean")
    vals, vecs = eigh3x3(mom.cov)
    z_axis = vecs[:, :, 0]
    flip = jnp.sum(z_axis * (0.0 - queries), axis=1) < 0
    z_axis = jnp.where(flip[:, None], -z_axis, z_axis)

    d2 = pairwise_sqdist(queries, points)
    in_r = (d2 <= radius * radius) & mask[None, :] & (d2 > 1e-12)
    cosdev = jnp.einsum("nd,qd->qn", normals, z_axis)
    score = jnp.where(in_r, -cosdev, -jnp.inf)  # most deviating normal
    best = jnp.argmax(score, axis=1)
    dir_vec = points[best] - queries
    x_axis = dir_vec - jnp.sum(dir_vec * z_axis, axis=1, keepdims=True) * z_axis
    nrm = jnp.linalg.norm(x_axis, axis=1, keepdims=True)
    fallback = jnp.stack([jnp.ones_like(nrm[:, 0]), jnp.zeros_like(nrm[:, 0]),
                          jnp.zeros_like(nrm[:, 0])], axis=1)
    x_axis = jnp.where(nrm > 1e-8, x_axis / jnp.maximum(nrm, 1e-12), fallback)
    y_axis = jnp.cross(z_axis, x_axis)

    n_in = jnp.sum(in_r, axis=1)
    frames = jnp.stack([x_axis, y_axis, z_axis], axis=1)
    valid = q_mask & (n_in >= min_neighbors)
    return LRFResult(frames=frames, valid=valid)
