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


def shot_lrf(
    queries: jnp.ndarray,    # [Q, 3] keypoints
    q_mask: jnp.ndarray,     # [Q]
    points: jnp.ndarray,     # [N, 3] surface
    mask: jnp.ndarray,       # [N]
    radius: float,
    min_neighbors: int = 5,
) -> LRFResult:
    mom = radius_covariance(queries, points, mask, radius,
                            weighting="shot", center="query")
    vals, vecs = eigh3x3_batched(mom.cov)
    v1 = vecs[:, :, 2]  # largest eigenvalue -> x axis candidate
    v3 = vecs[:, :, 0]  # smallest -> z axis candidate

    # disambiguation: dots[q, n] = (x_n - p_q) . v
    # = (X @ v_q) - p_q . v_q, computed per axis with one matmul each
    d2 = pairwise_sqdist(queries, points)
    in_r = (d2 <= radius * radius) & mask[None, :]
    n_in = jnp.sum(in_r, axis=1)

    def flip_sign(v):
        dots = jnp.einsum("nd,qd->qn", points, v) - jnp.sum(queries * v, axis=1)[:, None]
        plus = jnp.sum((dots >= 0) & in_r, axis=1)
        minus = n_in - plus
        flip = plus < minus  # majority-vote sign; ties keep eigh's convention
        return jnp.where(flip[:, None], -v, v)

    x_axis = flip_sign(v1)
    z_axis = flip_sign(v3)
    y_axis = jnp.cross(z_axis, x_axis)

    frames = jnp.stack([x_axis, y_axis, z_axis], axis=1)  # rows = axes
    valid = q_mask & (n_in >= min_neighbors) & (mom.wsum > 0)
    return LRFResult(frames=frames, valid=valid)
