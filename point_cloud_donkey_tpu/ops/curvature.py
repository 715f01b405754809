"""Principal curvature estimation (PCL PrincipalCurvaturesEstimation
semantics, used by keypoint culling --
keypoints/keypoints_voxel_grid_culling.cpp:136-153).

For each query point with normal n: project the normals of its in-radius
neighbors into the tangent plane (M = I - n n^T; n is used as given --
PCL feeds voxel-AVERAGED, unnormalized normals here), demean, accumulate
the summed outer-product covariance, and report
pc1 = largest eigenvalue / count, pc2 = middle eigenvalue / count
(PCL principal_curvatures.hpp: ``pc1 = eigenvalues_ (2) * indices_size``
with ``indices_size = 1/indices.size()``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .eigh3 import eigvals3x3
from .neighbors import pairwise_sqdist


class CurvatureResult(NamedTuple):
    pc1: jnp.ndarray  # [Q] largest eigenvalue
    pc2: jnp.ndarray  # [Q] middle eigenvalue
    valid: jnp.ndarray


def principal_curvatures(
    queries: jnp.ndarray,        # [Q, 3]
    query_normals: jnp.ndarray,  # [Q, 3]
    points: jnp.ndarray,         # [N, 3]
    normals: jnp.ndarray,        # [N, 3]
    mask: jnp.ndarray,           # [N]
    radius: float,
) -> CurvatureResult:
    d2 = pairwise_sqdist(queries, points)
    in_r = (d2 <= radius * radius) & mask[None, :]
    w = in_r.astype(points.dtype)                      # [Q, N]
    cnt = jnp.sum(w, axis=1)
    cnt_safe = jnp.maximum(cnt, 1.0)

    # projected normals p_qj = (I - n_q n_q^T) m_j = m_j - (n_q . m_j) n_q
    # covariance (summed, demeaned):
    #   C = sum_j p p^T - cnt * mu mu^T,  mu = sum_j p / cnt
    # expand through the projection so no [Q, N, 3] tensor materializes:
    #   sum_j w p p^T = M ( sum_j w m m^T ) M^T   with M = I - n n^T
    hi = jax.lax.Precision.HIGHEST
    s1 = jnp.matmul(w, normals, precision=hi)          # [Q, 3] sum of m_j
    mm = (normals[:, :, None] * normals[:, None, :]).reshape(-1, 9)
    s2 = jnp.matmul(w, mm, precision=hi).reshape(-1, 3, 3)

    n = query_normals
    ndot_s1 = jnp.sum(n * s1, axis=1)                  # [Q]
    # M s1 (projected sum)
    ps1 = s1 - ndot_s1[:, None] * n
    # M S2 M^T
    s2n = jnp.einsum("qij,qj->qi", s2, n)              # S2 n
    nts2n = jnp.sum(n * s2n, axis=1)
    ms2m = (s2
            - n[:, :, None] * s2n[:, None, :]
            - s2n[:, :, None] * n[:, None, :]
            + nts2n[:, None, None] * n[:, :, None] * n[:, None, :])
    mu = ps1 / cnt_safe[:, None]
    cov = ms2m - cnt_safe[:, None, None] * mu[:, :, None] * mu[:, None, :]

    vals = eigvals3x3(cov) / cnt_safe[:, None]  # ascending, / indices.size()
    return CurvatureResult(pc1=vals[:, 2], pc2=vals[:, 1], valid=cnt >= 2)
