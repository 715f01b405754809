"""Harris3D / ISS3D / SIFT3D keypoint detectors (the reference wraps
pcl::HarrisKeypoint3D, pcl::ISSKeypoint3D, pcl::SIFTKeypoint at
keypoints/keypoints_harris3d.cpp, keypoints_iss3d.cpp, keypoints_sift3d.cpp).

All three are dense masked [N, N] formulations: neighborhoods come from the
pairwise-distance matmul, responses are batched 3x3 eigen/linear algebra on
the VPU, and non-max suppression is a masked row-max compare — no kd-trees,
no data-dependent shapes (a boolean keypoint mask comes back; the host
compacts it)."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .eigh3 import eigh3x3
from .neighbors import pairwise_sqdist


class KeypointMask(NamedTuple):
    is_keypoint: jnp.ndarray   # [N] bool
    positions: jnp.ndarray     # [N, 3] (possibly refined)
    response: jnp.ndarray      # [N]


def harris3d(
    points: jnp.ndarray,     # [N, 3]
    normals: jnp.ndarray,    # [N, 3]
    mask: jnp.ndarray,       # [N]
    radius: float,
    threshold: float = 1e-4,
    nonmax: bool = True,
    refine: bool = True,
) -> KeypointMask:
    """HARRIS response of the normal covariance: r = det(C) - 0.04 trace(C)^2
    over the RAW (unnormalized) sum of in-radius normal outer products —
    PCL's semantics; normalizing by count kills the response entirely
    (trace = count forces det <= (trace/3)^3 < 0.04 trace^2).  Refinement
    solves the classic corner system (sum n n^T) x = sum n n^T p."""
    d2 = pairwise_sqdist(points, points)
    in_r = (d2 <= radius * radius) & mask[None, :] & mask[:, None]
    w = in_r.astype(points.dtype)

    # C_i = sum_j n_j n_j^T  via moment matmuls (raw sums, like PCL)
    nn = jnp.einsum("ja,jb->jab", normals, normals).reshape(-1, 9)
    C = (w @ nn).reshape(-1, 3, 3)
    det = jnp.linalg.det(C)
    tr = jnp.trace(C, axis1=1, axis2=2)
    r = det - 0.04 * tr * tr

    keep = mask & (r > threshold)
    if nonmax:
        neigh_max = jnp.max(jnp.where(in_r, r[None, :], -jnp.inf), axis=1)
        keep = keep & (r >= neigh_max)

    pos = points
    if refine:
        # A x = b with A = sum n n^T, b = sum (n n^T) p over the neighborhood
        A = (w @ nn).reshape(-1, 3, 3)
        nntp = jnp.einsum("jab,jb->ja", nn.reshape(-1, 3, 3), points)
        b = w @ nntp
        ok = jnp.abs(jnp.linalg.det(A)) > 1e-9
        A_safe = jnp.where(ok[:, None, None], A, jnp.eye(3, dtype=points.dtype))
        x = jnp.linalg.solve(A_safe, b[..., None])[..., 0]
        # keep the refinement only if it stays inside the support radius
        near = jnp.sum((x - points) ** 2, axis=1) <= radius * radius
        pos = jnp.where((ok & near)[:, None], x, points)

    return KeypointMask(is_keypoint=keep, positions=pos, response=r)


def iss3d(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    salient_radius: float = 0.1,
    nonmax_radius: float = 0.05,
    gamma21: float = 0.975,
    gamma32: float = 0.975,
    min_neighbors: int = 5,
) -> KeypointMask:
    """ISS saliency: weighted scatter matrix with w_j = 1/|N(p_j)|, keep
    points with e2/e1 < gamma21 and e3/e2 < gamma32 (eigenvalues descending),
    saliency = e3, NMS in the non-max radius (keypoints_iss3d.cpp:7-13
    defaults = PCL ISSKeypoint3D semantics)."""
    d2 = pairwise_sqdist(points, points)
    r2 = salient_radius * salient_radius
    in_r = (d2 <= r2) & mask[None, :] & mask[:, None]
    count = jnp.maximum(jnp.sum(in_r, axis=1).astype(points.dtype), 1.0)
    wj = 1.0 / count                                   # per-point density weight

    W = in_r.astype(points.dtype) * wj[None, :]        # [N, N]
    wsum = jnp.maximum(jnp.sum(W, axis=1), 1e-12)
    # scatter about the query point: moments with the query shift
    S1 = W @ points                                    # [N, 3]
    pp = jnp.einsum("ja,jb->jab", points, points).reshape(-1, 9)
    S2 = (W @ pp).reshape(-1, 3, 3)
    q = points
    outer_q = jnp.einsum("na,nb->nab", q, q)
    cross = jnp.einsum("na,nb->nab", S1, q)
    S = S2 - cross - cross.transpose(0, 2, 1) + wsum[:, None, None] * outer_q
    S = S / wsum[:, None, None]

    vals, _ = eigh3x3(S)                               # ascending
    e1, e2, e3 = vals[:, 2], vals[:, 1], vals[:, 0]    # descending rename
    ok = mask & (e2 / jnp.maximum(e1, 1e-12) < gamma21) \
        & (e3 / jnp.maximum(e2, 1e-12) < gamma32) & (e3 > 0)
    saliency = jnp.where(ok, e3, -jnp.inf)

    nm2 = nonmax_radius * nonmax_radius
    in_nm = (d2 <= nm2) & mask[None, :] & mask[:, None]
    n_nm = jnp.sum(in_nm, axis=1)
    neigh_max = jnp.max(jnp.where(in_nm, saliency[None, :], -jnp.inf), axis=1)
    keep = ok & (saliency >= neigh_max) & (n_nm >= min_neighbors)
    return KeypointMask(is_keypoint=keep, positions=points, response=e3)


def sift3d(
    points: jnp.ndarray,
    intensity: jnp.ndarray,   # [N] (the reference feeds curvature,
                              # keypoints_sift3d.cpp:20-47)
    mask: jnp.ndarray,
    min_scale: float,
    n_octaves: int = 4,
    scales_per_octave: int = 3,
    min_contrast: float = 0.0,
) -> KeypointMask:
    """3D SIFT on a scalar field: per octave, Gaussian-smooth the intensity
    at geometrically spaced sigmas, difference-of-Gaussians between adjacent
    scales, and keep points that are spatial+scale extrema with |DoG| above
    the contrast threshold (pcl::SIFTKeypoint with setScales(radius, 4, 3),
    setMinimumContrast(0)).  Divergence: PCL subsamples the cloud between
    octaves; here all octaves run on the full cloud (denser coarse octaves,
    strictly more candidates checked)."""
    d2 = pairwise_sqdist(points, points)
    dtype = points.dtype
    valid_pair = mask[None, :] & mask[:, None]

    keep_any = jnp.zeros(points.shape[0], bool)
    best_resp = jnp.zeros(points.shape[0], dtype)
    for o in range(n_octaves):
        base = min_scale * (2.0 ** o)
        sigmas = [base * (2.0 ** (s / scales_per_octave))
                  for s in range(scales_per_octave + 1)]
        smoothed = []
        for s in sigmas:
            K = jnp.exp(-0.5 * d2 / (s * s))
            K = jnp.where((d2 <= 9.0 * s * s) & valid_pair, K, 0.0)
            ks = jnp.maximum(jnp.sum(K, axis=1), 1e-12)
            smoothed.append((K @ intensity) / ks)
        dogs = [smoothed[i + 1] - smoothed[i] for i in range(len(sigmas) - 1)]
        # extrema on the interior DoG layers
        for li in range(1, len(dogs) - 1):
            dog = dogs[li]
            sig = sigmas[li]
            nb = (d2 <= sig * sig) & valid_pair & (d2 > 0)
            lo = jnp.stack([jnp.min(jnp.where(nb, dogs[lj][None, :], jnp.inf),
                                    axis=1) for lj in (li - 1, li, li + 1)])
            hi = jnp.stack([jnp.max(jnp.where(nb, dogs[lj][None, :], -jnp.inf),
                                    axis=1) for lj in (li - 1, li, li + 1)])
            is_min = (dog < lo.min(axis=0)) & (dog < dogs[li - 1]) & (dog < dogs[li + 1])
            is_max = (dog > hi.max(axis=0)) & (dog > dogs[li - 1]) & (dog > dogs[li + 1])
            ext = mask & (is_min | is_max) & (jnp.abs(dog) >= min_contrast) \
                & jnp.any(nb, axis=1)
            keep_any = keep_any | ext
            best_resp = jnp.where(ext & (jnp.abs(dog) > best_resp),
                                  jnp.abs(dog), best_resp)
    return KeypointMask(is_keypoint=keep_any, positions=points,
                        response=best_resp)
