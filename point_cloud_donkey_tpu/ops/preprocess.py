"""Cloud preprocessing filters (implicit_shape_model.cpp:739-821), mask-based.

All filters keep the padded array shape and only update the validity mask
(TPU-friendly: no dynamic shapes), except the voxel filter which produces a
new padded cloud.

  * Statistical outlier removal (PCL StatisticalOutlierRemoval): mean
    distance to the K nearest neighbors per point; drop points whose mean
    exceeds global_mean + stddev_mul * global_stddev.
  * Radius outlier removal: keep points with >= min_neighbors within radius.
  * MLS smoothing, polynomial order 1: project each point onto the PCA plane
    of its radius neighborhood (the reference's default SmoothingPolynomialOrder
    is 1, implicit_shape_model.cpp:93; higher orders are not implemented).
  * Voxel-grid downsample filter (reuses ops/voxel_grid.py).
  * Z pass-through cut (CutoffDistanceZAxis).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from .eigh3 import eigh3x3
from .neighbors import pairwise_sqdist, radius_covariance


def statistical_outlier_removal(points: jnp.ndarray, mask: jnp.ndarray,
                                mean_k: int, stddev_mul: float) -> jnp.ndarray:
    """Returns the filtered mask."""
    d2 = pairwise_sqdist(points, points)
    d2 = jnp.where(mask[None, :], d2, jnp.inf)
    # exclude self by taking k+1 and dropping the closest (self)
    k = min(mean_k + 1, points.shape[0])
    neg, _ = jax.lax.top_k(-d2, k)
    d = jnp.sqrt(jnp.maximum(-neg[:, 1:], 0.0))
    finite = jnp.isfinite(d)
    mean_d = jnp.sum(jnp.where(finite, d, 0.0), axis=1) / \
        jnp.maximum(jnp.sum(finite, axis=1), 1)

    m = mask.astype(points.dtype)
    n = jnp.maximum(m.sum(), 1.0)
    g_mean = jnp.sum(jnp.where(mask, mean_d, 0.0)) / n
    g_var = jnp.sum(jnp.where(mask, (mean_d - g_mean) ** 2, 0.0)) / n
    thresh = g_mean + stddev_mul * jnp.sqrt(g_var)
    return mask & (mean_d <= thresh)


def radius_outlier_removal(points: jnp.ndarray, mask: jnp.ndarray,
                           radius: float, min_neighbors: int) -> jnp.ndarray:
    d2 = pairwise_sqdist(points, points)
    in_r = (d2 <= radius * radius) & mask[None, :]
    count = jnp.sum(in_r, axis=1) - 1  # exclude self
    return mask & (count >= min_neighbors)


def mls_smooth(points: jnp.ndarray, mask: jnp.ndarray,
               radius: float) -> jnp.ndarray:
    """Order-1 MLS: project each point onto its neighborhood PCA plane."""
    mom = radius_covariance(points, points, mask, radius,
                            weighting="uniform", center="mean")
    _, vecs = eigh3x3(mom.cov)
    normal = vecs[..., 0]  # smallest eigenvalue -> plane normal
    delta = points - mom.mean
    proj = points - jnp.sum(delta * normal, axis=1, keepdims=True) * normal
    ok = mom.count >= 3
    return jnp.where((mask & ok)[:, None], proj, points)


def z_cutoff(points: jnp.ndarray, mask: jnp.ndarray,
             cutoff: float) -> jnp.ndarray:
    """PassThrough on z in [0, cutoff] (implicit_shape_model.cpp:810-821)."""
    return mask & (points[:, 2] >= 0.0) & (points[:, 2] <= cutoff)
