"""Normal estimation with eigenvalues + consistent orientation, batched.

Reference behavior (implicit_shape_model.cpp:940-1037):
  * PCA normals: smallest eigenvector of the *uniform* covariance of in-radius
    neighbors about their mean (PCL NormalEstimation); curvature =
    lambda_0 / (lambda_0 + lambda_1 + lambda_2).  The reference's patched
    estimator (third_party/pcl_normal_3d_omp_with_eigenvalues) additionally
    exposes the three eigenvalues for keypoint-quality culling.
  * ConsistentNormalsMethod 0: flip towards the viewpoint (origin).
  * ConsistentNormalsMethod 1: center the cloud, flip towards origin, invert
    -- i.e. orient away from the centroid (implicit_shape_model.cpp:987-1014).
  * ConsistentNormalsMethod 2: normal = inverted z-axis of the SHOT LRF at
    every point with NormalRadius; PCA curvature is kept; points with invalid
    LRFs fall back to the PCA normal (utils/normal_orientation.cpp:48-110).

All dense, masked, jit-friendly; O(N^2) pairwise work is chunked by callers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .eigh3 import eigh3x3
from .lrf import shot_lrf
from .neighbors import radius_covariance


class NormalsResult(NamedTuple):
    normals: jnp.ndarray      # [N, 3]
    curvature: jnp.ndarray    # [N]
    eigenvalues: jnp.ndarray  # [N, 3] ascending (lambda0 <= lambda1 <= lambda2)
    valid: jnp.ndarray        # [N] finite-normal flag (NaN-normal analogue)


def pca_normals_at(
    queries: jnp.ndarray,  # [Q, 3] where to estimate normals
    q_mask: jnp.ndarray,   # [Q]
    points: jnp.ndarray,   # [N, 3] supporting surface
    mask: jnp.ndarray,     # [N]
    radius: float,
    min_neighbors: int = 3,
) -> NormalsResult:
    """PCA normals at arbitrary query positions (the tiled scene path calls
    this with a windowed slab of the sorted cloud as `points`)."""
    mom = radius_covariance(queries, points, mask, radius,
                            weighting="uniform", center="mean")
    vals, vecs = eigh3x3(mom.cov)
    normals = vecs[:, :, 0]  # smallest eigenvalue
    total = jnp.sum(vals, axis=1)
    curvature = jnp.where(total > 0, vals[:, 0] / jnp.maximum(total, 1e-30), 0.0)
    valid = q_mask & (mom.count >= min_neighbors)
    return NormalsResult(normals=normals, curvature=curvature,
                         eigenvalues=vals, valid=valid)


def pca_normals(
    points: jnp.ndarray,   # [N, 3]
    mask: jnp.ndarray,     # [N]
    radius: float,
    min_neighbors: int = 3,
) -> NormalsResult:
    return pca_normals_at(points, mask, points, mask, radius, min_neighbors)


def orient_towards_viewpoint(points, normals, viewpoint=(0.0, 0.0, 0.0)):
    vp = jnp.asarray(viewpoint, points.dtype)
    flip = jnp.sum((vp[None, :] - points) * normals, axis=1) < 0
    return jnp.where(flip[:, None], -normals, normals)


def orient_away_from_centroid(points, normals, mask, centroid=None):
    if centroid is None:
        m = mask.astype(points.dtype)
        centroid = jnp.sum(points * m[:, None], axis=0) / jnp.maximum(m.sum(), 1.0)
    flip = jnp.sum((points - centroid) * normals, axis=1) < 0
    return jnp.where(flip[:, None], -normals, normals)


def compute_normals_fast(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    radius: float,
) -> jnp.ndarray:
    """Serving fast path for ConsistentNormalsMethod 2: only the oriented
    normal (no curvature/eigenvalues), skipping the whole PCA pass -- one
    [N, N] sweep instead of two.  Points with invalid LRFs (< 5 in-radius
    neighbors; rare in dense clouds) fall back to +z instead of the PCA
    normal (parity path: compute_normals).  Only the z axis is consumed,
    so the sign-vote pass skips the x-axis dot (z_only; exact -- the z
    votes are unchanged)."""
    lrf = shot_lrf(points, mask, points, mask, radius, z_only=True)
    z = -lrf.frames[:, 2, :]
    up = jnp.zeros_like(z).at[:, 2].set(1.0)
    return jnp.where(lrf.valid[:, None], z, up)


def orient_emst(points, normals, k: int = 10):
    """ConsistentNormalsMethod 3: Hoppe-style orientation propagation over a
    Euclidean MST (the reference does this via VCGlib,
    implicit_shape_model.cpp:1016-1029; optional and off by default).
    Host-side: Prim MST over the kNN graph with edge weight 1 - |n_i.n_j|,
    BFS flip propagation from the highest point (oriented +z).  Inherently
    sequential -- runs once per cloud on the host."""
    import heapq
    import numpy as np
    pts = np.asarray(points)
    nrm = np.asarray(normals).copy()
    n = len(pts)
    if n == 0:
        return nrm
    # kNN graph on the host (n is the true cloud size; no padding here)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1) if n <= 4096 else None
    if d2 is None:
        # chunked for big clouds
        idxs = np.empty((n, k + 1), np.int64)
        for i0 in range(0, n, 1024):
            dd = ((pts[i0:i0 + 1024, None, :] - pts[None, :, :]) ** 2).sum(-1)
            idxs[i0:i0 + 1024] = np.argpartition(dd, k + 1, axis=1)[:, :k + 1]
    else:
        idxs = np.argpartition(d2, min(k + 1, n - 1), axis=1)[:, :k + 1]

    root = int(np.argmax(pts[:, 2]))
    if nrm[root, 2] < 0:
        nrm[root] = -nrm[root]
    visited = np.zeros(n, bool)
    visited[root] = True
    heap = []
    for j in idxs[root]:
        j = int(j)
        if j != root:
            w = 1.0 - abs(float(nrm[root] @ nrm[j]))
            heapq.heappush(heap, (w, root, j))
    while heap:
        w, par, cur = heapq.heappop(heap)
        if visited[cur]:
            continue
        visited[cur] = True
        if nrm[par] @ nrm[cur] < 0:
            nrm[cur] = -nrm[cur]
        for j in idxs[cur]:
            j = int(j)
            if not visited[j]:
                heapq.heappush(heap, (1.0 - abs(float(nrm[cur] @ nrm[j])),
                                      cur, j))
    # disconnected kNN components keep their PCA orientation
    return nrm


def compute_normals_at(
    queries: jnp.ndarray,
    q_mask: jnp.ndarray,
    points: jnp.ndarray,
    mask: jnp.ndarray,
    radius: float,
    method: int = 2,
    centroid=None,  # cloud centroid for method 1 (global, pass in when tiled)
) -> NormalsResult:
    """Normal pipeline for ConsistentNormalsMethod 0/1/2 at query positions.
    `points` may be a windowed slab of the cloud (tiled scene path); method 1
    then needs the full-cloud centroid passed explicitly."""
    pca = pca_normals_at(queries, q_mask, points, mask, radius)
    if method == 0:
        normals = orient_towards_viewpoint(queries, pca.normals)
    elif method == 1:
        # orientation happens at QUERY positions but the reference centroid
        # is the support cloud's; the old fallback passed the length-N cloud
        # mask against the length-Q queries (shape error when Q != N)
        if centroid is None:
            m = mask.astype(points.dtype)
            centroid = jnp.sum(points * m[:, None], axis=0) \
                / jnp.maximum(m.sum(), 1.0)
        normals = orient_away_from_centroid(queries, pca.normals, q_mask,
                                            centroid=centroid)
    elif method == 2:
        lrf = shot_lrf(queries, q_mask, points, mask, radius)
        z = lrf.frames[:, 2, :]
        normals = jnp.where(lrf.valid[:, None], -z, pca.normals)
    else:
        normals = pca.normals
    return NormalsResult(normals=normals, curvature=pca.curvature,
                         eigenvalues=pca.eigenvalues, valid=pca.valid)


def compute_normals(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    radius: float,
    method: int = 2,
) -> NormalsResult:
    """Full normal pipeline matching ConsistentNormalsMethod 0/1/2."""
    return compute_normals_at(points, mask, points, mask, radius, method)
