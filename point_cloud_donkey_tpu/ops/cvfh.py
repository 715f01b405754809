"""CVFH and OUR-CVFH global descriptors (Aldoma et al.; the reference wraps
pcl::CVFHEstimation / pcl::OURCVFHEstimation at features/features_cvfh.cpp and
features/features_ourcvfh.cpp with EPSAngleThreshold 10 deg, curvature
threshold 1.0, NormalizeBins false, axis ratio 0.8).

Pipeline per cloud:
  1. drop points with curvature above the threshold,
  2. smooth-region growing (distance tolerance AND normal-angle tolerance),
     keeping clusters of >= min_points,
  3. CVFH: one VFH-308 per cluster, computed over the WHOLE cloud against the
     cluster's (centroid, average normal) pair with raw counts,
  4. OUR-CVFH: additionally a SGURF reference frame per cluster; the 128-bin
     viewpoint component is replaced by the 8-octant x 13-bin shape
     distribution of the whole cloud in that frame (ambiguous frames, axis
     ratio < 0.8, emit both x and -x variants).

If no cluster survives, a single VFH over the curvature-filtered cloud is
emitted (PCL's fallback).  Region growing is inherently sequential, so it
runs on the host over distances computed by numpy; the per-cluster VFH runs
as the jitted TPU kernel (ops/global_descriptors.vfh_descriptor).

Note: the reference post-scales every descriptor by 2/(L(L-1)) via its
normalizeDescriptors (features.cpp:282-297 sums *indices*, not values — a
constant factor).  A constant scale only shifts absolute distance thresholds,
so it is not replicated (documented divergence).
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .global_descriptors import vfh_descriptor, VFH_BINS

SHAPE_DIST_BINS = 13
SHAPE_DIST_OCTANTS = 8


def smooth_region_clusters(
    xyz: np.ndarray,            # [N, 3]
    normals: np.ndarray,        # [N, 3]
    curvature: np.ndarray,      # [N]
    dist_tol: float,
    eps_angle: float,           # radians
    curv_threshold: float,
    min_points: int,
) -> Tuple[List[np.ndarray], np.ndarray]:
    """Euclidean clusters constrained by normal smoothness
    (pcl::extractEuclideanClustersSmooth semantics: BFS where a neighbor
    joins if within dist_tol AND its normal is within eps_angle of the
    *current* point's normal).  Returns (clusters, low_curvature_indices)."""
    keep = np.where(curvature <= curv_threshold)[0]
    if len(keep) == 0:
        return [], keep
    pts = xyz[keep]
    nrm = normals[keep]
    n = len(keep)
    cos_eps = math.cos(eps_angle)

    d2 = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1) \
        if n <= 4096 else None
    visited = np.zeros(n, bool)
    clusters: List[np.ndarray] = []
    tol2 = dist_tol * dist_tol
    for seed in range(n):
        if visited[seed]:
            continue
        queue = [seed]
        visited[seed] = True
        members = [seed]
        qi = 0
        while qi < len(queue):
            cur = queue[qi]
            qi += 1
            if d2 is not None:
                near = d2[cur] <= tol2
            else:
                near = np.sum((pts - pts[cur]) ** 2, axis=1) <= tol2
            cand = np.where(near & ~visited)[0]
            if len(cand) == 0:
                continue
            ok = nrm[cand] @ nrm[cur] >= cos_eps
            joins = cand[ok]
            visited[joins] = True
            queue.extend(joins.tolist())
            members.extend(joins.tolist())
        if len(members) >= min_points:
            clusters.append(keep[np.asarray(members)])
    return clusters, keep


@functools.lru_cache(maxsize=None)
def _cluster_vfh_stage(n: int):
    @jax.jit
    def run(points, normals, mask, centroid, avg_normal):
        return vfh_descriptor(points, normals, mask,
                              centroid=centroid, avg_normal=avg_normal,
                              normalize_bins=False)
    return run


@functools.lru_cache(maxsize=None)
def _shape_dist_stage(n: int):
    @jax.jit
    def run(points, mask, centroid, frame):
        return sgurf_shape_distribution(points, mask, centroid, frame)
    return run


def sgurf_shape_distribution(points: jnp.ndarray, mask: jnp.ndarray,
                             centroid: jnp.ndarray,
                             frame: jnp.ndarray) -> jnp.ndarray:
    """[104] shape distribution: points transformed into the SGURF frame
    (rows = x, y, z axes), split into 8 sign-octants, 13-bin histogram of
    |q| / d_max per octant, increments 100/N (pcl::OURCVFHEstimation::
    computeRFAndShapeDistribution essence)."""
    from .shot import _histogram_from_slots
    dtype = points.dtype
    m = mask.astype(dtype)
    q = jnp.einsum("ad,nd->na", frame, points - centroid[None, :])
    d = jnp.linalg.norm(q, axis=1)
    d_max = jnp.maximum(jnp.max(jnp.where(mask, d, 0.0)), 1e-12)
    octant = ((q[:, 0] < 0).astype(jnp.int32)
              + 2 * (q[:, 1] < 0).astype(jnp.int32)
              + 4 * (q[:, 2] < 0).astype(jnp.int32))
    b = jnp.clip((d / d_max * SHAPE_DIST_BINS).astype(jnp.int32),
                 0, SHAPE_DIST_BINS - 1)
    idx = octant * SHAPE_DIST_BINS + b
    hist = _histogram_from_slots(idx[None, :, None], m[None, :, None],
                                 SHAPE_DIST_BINS * SHAPE_DIST_OCTANTS)[0]
    return 100.0 * hist / jnp.maximum(m.sum(), 1.0)


def _sgurf_frames(xyz: np.ndarray, cluster: np.ndarray,
                  avg_normal: np.ndarray, centroid: np.ndarray,
                  axis_ratio: float) -> List[np.ndarray]:
    """SGURF x-axis candidates for one cluster: dominant in-plane direction
    of the distance-weighted scatter, sign from the heavier projection side;
    if the two sides are within axis_ratio of each other the frame is
    ambiguous and both signs are emitted (our_cvfh setAxisRatio 0.8)."""
    z = avg_normal / max(np.linalg.norm(avg_normal), 1e-12)
    rel = xyz[cluster] - centroid
    d = np.linalg.norm(rel, axis=1)
    w = np.maximum(d.max() - d, 0.0) ** 2
    proj = rel - np.outer(rel @ z, z)
    scatter = (proj * w[:, None]).T @ proj
    vals, vecs = np.linalg.eigh(scatter)
    x = vecs[:, -1]
    s = proj @ x
    s_plus = float(np.sum(w * np.maximum(s, 0.0)))
    s_minus = float(np.sum(w * np.maximum(-s, 0.0)))
    if s_minus > s_plus:
        x, s_plus, s_minus = -x, s_minus, s_plus
    frames = [np.stack([x, np.cross(z, x), z])]
    if s_plus > 0 and s_minus / s_plus > axis_ratio:   # ambiguous
        x2 = -x
        frames.append(np.stack([x2, np.cross(z, x2), z]))
    return frames


def cvfh_descriptors(
    xyz: np.ndarray,
    normals: np.ndarray,
    curvature: np.ndarray,
    points_pad: jnp.ndarray,     # [Np, 3] padded device cloud
    normals_pad: jnp.ndarray,
    mask_pad: jnp.ndarray,
    dist_tol: float = 0.015,
    eps_angle: float = math.radians(10.0),
    curv_threshold: float = 1.0,
    min_points: int = 50,
    with_sgurf: bool = False,
    axis_ratio: float = 0.8,
) -> np.ndarray:
    """[M, 308] CVFH (or OUR-CVFH when with_sgurf) descriptors for one cloud."""
    clusters, keep = smooth_region_clusters(
        xyz, normals, curvature, dist_tol, eps_angle, curv_threshold,
        min_points)
    n = points_pad.shape[0]
    vfh_run = _cluster_vfh_stage(n)

    if not clusters:
        if len(keep) == 0:
            keep = np.arange(len(xyz))
        clusters = [keep]   # PCL fallback: whole filtered cloud as one region

    out = []
    for cl in clusters:
        c = xyz[cl].mean(axis=0).astype(np.float32)
        nv = normals[cl].mean(axis=0).astype(np.float32)
        desc = np.asarray(vfh_run(points_pad, normals_pad, mask_pad,
                                  jnp.asarray(c), jnp.asarray(nv)))
        if not with_sgurf:
            out.append(desc)
            continue
        sd_run = _shape_dist_stage(n)
        for frame in _sgurf_frames(xyz, cl, nv, c, axis_ratio):
            sd = np.asarray(sd_run(points_pad, mask_pad, jnp.asarray(c),
                                   jnp.asarray(frame.astype(np.float32))))
            d = desc.copy()
            # the viewpoint component is replaced by the shape distribution
            # (8x13 = 104 slots; the remaining 24 stay zero)
            d[4 * VFH_BINS:] = 0.0
            d[4 * VFH_BINS:4 * VFH_BINS + len(sd)] = sd
            out.append(d)
    return np.stack(out).astype(np.float32)
