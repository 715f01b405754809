"""RoPS descriptor (Guo et al., "Rotational Projection Statistics";
pcl::ROPSEstimation, wrapped at features/features_rops.cpp with 5 partition
bins, 3 rotations, support radius = descriptor radius, descriptor length
3 axes x 3 rotations x 3 projections x 5 statistics = 135).

PCL first greedy-triangulates the cloud (features_rops.cpp:50-62) and uses
the mesh to crop the local surface and weight the LRF scatter by triangle
area.  That triangulation is inherently host-sequential and only feeds the
crop/weights — the statistics themselves are computed over projected points.
This TPU formulation therefore works on the point-sampled surface directly
(documented divergence): the local crop is the in-radius neighbor block and
the LRF is the distance-weighted covariance about the keypoint.  Everything
downstream (rotations, plane projections, 5x5 distribution matrices, central
moments + Shannon entropy) follows the RoPS algorithm exactly and runs as
dense masked tensor ops.
"""

from __future__ import annotations

import jax.numpy as jnp

from .eigh3 import eigh3x3
from .neighbors import NeighborBlock
from .shot import ShotResult, _histogram_from_slots

ROPS_BINS = 5          # setNumberOfPartitionBins(5)
ROPS_ROTATIONS = 3     # setNumberOfRotations(3)
ROPS_LEN = 3 * ROPS_ROTATIONS * 3 * 5   # 135


def _axis_rotations(dtype):
    """[3*R, 3, 3] rotation matrices: for each local axis, R rotations with
    angle step 90deg / R (PCL's step; angles k * step, k = 1..R)."""
    mats = []
    step = jnp.pi / 2.0 / ROPS_ROTATIONS
    for axis in range(3):
        for k in range(1, ROPS_ROTATIONS + 1):
            a = step * k
            c, s = jnp.cos(a), jnp.sin(a)
            if axis == 0:
                m = jnp.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype)
            elif axis == 1:
                m = jnp.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype)
            else:
                m = jnp.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype)
            mats.append(m)
    return jnp.stack(mats)   # [9, 3, 3]


def _distribution_stats(u, v, valid, dtype):
    """5 RoPS statistics of one 2D projection: build the 5x5 distribution
    matrix over the valid points' bounding box, normalize to sum 1, then
    central moments mu11, mu21, mu12, mu22 and Shannon entropy.

    u, v: [K, T, M] projected coordinates; valid: [K, T, M] mask.
    Returns [K, T, 5]."""
    big = jnp.asarray(1e9, dtype)
    u_min = jnp.min(jnp.where(valid, u, big), axis=-1, keepdims=True)
    u_max = jnp.max(jnp.where(valid, u, -big), axis=-1, keepdims=True)
    v_min = jnp.min(jnp.where(valid, v, big), axis=-1, keepdims=True)
    v_max = jnp.max(jnp.where(valid, v, -big), axis=-1, keepdims=True)
    du = jnp.maximum(u_max - u_min, 1e-12)
    dv = jnp.maximum(v_max - v_min, 1e-12)
    bu = jnp.clip(((u - u_min) / du * ROPS_BINS).astype(jnp.int32),
                  0, ROPS_BINS - 1)
    bv = jnp.clip(((v - v_min) / dv * ROPS_BINS).astype(jnp.int32),
                  0, ROPS_BINS - 1)
    idx = bu * ROPS_BINS + bv                       # [K, T, M]
    K, T, M = idx.shape
    w = valid.astype(dtype)
    hist = _histogram_from_slots(
        idx.reshape(K * T, M, 1), w.reshape(K * T, M, 1), ROPS_BINS * ROPS_BINS)
    hist = hist.reshape(K, T, ROPS_BINS, ROPS_BINS)
    total = jnp.maximum(hist.sum(axis=(-1, -2), keepdims=True), 1e-12)
    p = hist / total                                # [K, T, 5, 5]

    coords = (jnp.arange(ROPS_BINS, dtype=dtype) + 0.5) / ROPS_BINS
    ci = coords[None, None, :, None]
    cj = coords[None, None, None, :]
    mi = jnp.sum(p * ci, axis=(-1, -2), keepdims=True)
    mj = jnp.sum(p * cj, axis=(-1, -2), keepdims=True)
    di, dj = ci - mi, cj - mj

    def mu(a, b):
        return jnp.sum(p * (di ** a) * (dj ** b), axis=(-1, -2))

    entropy = -jnp.sum(jnp.where(p > 0, p * jnp.log(jnp.maximum(p, 1e-30)),
                                 0.0), axis=(-1, -2))
    return jnp.stack([mu(1, 1), mu(2, 1), mu(1, 2), mu(2, 2), entropy],
                     axis=-1)                       # [K, T, 5]


def rops_descriptor(
    keypoints: jnp.ndarray,   # [K, 3]
    kp_mask: jnp.ndarray,
    points: jnp.ndarray,      # [N, 3]
    nbr: NeighborBlock,       # in-radius neighbor block of the keypoints
    radius: float,
    min_neighbors: int = 5,
) -> ShotResult:
    dtype = points.dtype
    K, M = nbr.idx.shape
    use = nbr.valid & jnp.isfinite(nbr.dist)
    q = points[nbr.idx]                              # [K, M, 3]
    rel = q - keypoints[:, None, :]
    rel = jnp.where(use[..., None], rel, 0.0)

    # distance-weighted scatter about the keypoint -> local frame
    w = jnp.where(use, jnp.maximum(radius - nbr.dist, 0.0), 0.0)
    wsum = jnp.maximum(jnp.sum(w, axis=1), 1e-12)
    cov = jnp.einsum("km,kma,kmb->kab", w, rel, rel) / wsum[:, None, None]
    _, vecs = eigh3x3(cov)

    # sign disambiguation (RoPS paper sec. 3.1 / SHOT-style): each axis points
    # toward the majority of the local surface, so the frame is repeatable
    # under rigid motion
    def orient(v):
        dots = jnp.einsum("kma,ka->km", rel, v)
        plus = jnp.sum(jnp.where(use, (dots >= 0).astype(dtype), 0.0), axis=1)
        minus = jnp.sum(use, axis=1) - plus
        return jnp.where((plus < minus)[:, None], -v, v)

    x_axis = orient(vecs[:, :, 2])
    z_axis = orient(vecs[:, :, 0])
    frame = jnp.stack([x_axis, jnp.cross(z_axis, x_axis), z_axis], axis=1)

    local = jnp.einsum("kab,kmb->kma", frame, rel)   # [K, M, 3]

    rots = _axis_rotations(dtype)                    # [9, 3, 3]
    rotated = jnp.einsum("tab,kmb->ktma", rots, local)  # [K, 9, M, 3]
    valid = jnp.broadcast_to(use[:, None, :], rotated.shape[:3])

    # three plane projections per rotation: (x,y), (x,z), (y,z)
    stats = []
    for (a, b) in ((0, 1), (0, 2), (1, 2)):
        stats.append(_distribution_stats(rotated[..., a], rotated[..., b],
                                         valid, dtype))   # [K, 9, 5]
    desc = jnp.concatenate(stats, axis=-1)           # [K, 9, 15]
    desc = desc.reshape(K, ROPS_LEN)

    n_nb = jnp.sum(use, axis=1)
    return ShotResult(descriptors=desc, valid=kp_mask & (n_nb >= min_neighbors))
