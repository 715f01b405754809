"""Additional local descriptors: BSHOT, SpinImage, PFH.

All batched over fixed-capacity neighbor blocks, jit-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp

from .neighbors import NeighborBlock
from .shot import ShotResult, _histogram_from_slots


# ---------------------------------------------------------------------------
# BSHOT: binarized SHOT (Prakhya et al.; reference features/features_bshot.cpp)
# ---------------------------------------------------------------------------

def bshot_binarize(shot: jnp.ndarray) -> jnp.ndarray:
    """Binarize SHOT-352 in groups of 4 (features_bshot.cpp:108-152):
    case A: all-zero group -> 0000; case B: one value > 0.9*sum -> that bit;
    case C: a pair sums > 0.9*sum -> those two bits (later pairs override
    earlier, preserving the reference's sequential assignment); case D:
    a triple > 0.9*sum; else 1111."""
    k, d = shot.shape
    g = shot.reshape(k, d // 4, 4)
    s = jnp.sum(g, axis=-1, keepdims=True)
    thr = 0.9 * s

    single = g > thr                                   # [K, G, 4]
    case_b = jnp.sum(single, axis=-1) == 1

    pair_masks = jnp.asarray([
        [1, 1, 0, 0], [1, 0, 1, 0], [1, 0, 0, 1],
        [0, 1, 1, 0], [0, 1, 0, 1], [0, 0, 1, 1]], jnp.float32)
    pair_sums = jnp.einsum("kgd,pd->kgp", g, pair_masks)
    pair_hit = pair_sums > thr                          # [K, G, 6]
    # last matching pair wins (sequential overwrite in the reference)
    pidx = jnp.arange(6)
    last_pair = jnp.max(jnp.where(pair_hit, pidx[None, None, :], -1), axis=-1)
    case_c = (last_pair >= 0) & ~case_b
    pair_bits = pair_masks[jnp.clip(last_pair, 0, 5)]   # [K, G, 4]

    triple_masks = jnp.asarray([
        [1, 1, 1, 0], [1, 1, 0, 1], [1, 0, 1, 1], [0, 1, 1, 1]], jnp.float32)
    tri_sums = jnp.einsum("kgd,td->kgt", g, triple_masks)
    tri_hit = tri_sums > thr
    last_tri = jnp.max(jnp.where(tri_hit, jnp.arange(4)[None, None, :], -1), axis=-1)
    case_d = (last_tri >= 0) & ~case_b & ~case_c
    tri_bits = triple_masks[jnp.clip(last_tri, 0, 3)]

    nonzero = s[..., 0] != 0
    case_e = nonzero & ~case_b & ~case_c & ~case_d

    out = jnp.zeros_like(g)
    out = jnp.where((case_b[..., None]) & single, 1.0, out)
    out = jnp.where(case_c[..., None], pair_bits, out)
    out = jnp.where(case_d[..., None], tri_bits, out)
    out = jnp.where(case_e[..., None], 1.0, out)
    return out.reshape(k, d)


# ---------------------------------------------------------------------------
# Spin images (Johnson; PCL SpinImageEstimation with image width 8 -> 153,
# reference features/features_spin_image.cpp)
# ---------------------------------------------------------------------------

SPIN_WIDTH = 8
SPIN_LEN = (SPIN_WIDTH + 1) * (2 * SPIN_WIDTH + 1)  # 153


def spin_image_descriptor(
    keypoints: jnp.ndarray,     # [K, 3]
    kp_normals: jnp.ndarray,    # [K, 3] spin axes (normals at keypoints)
    kp_mask: jnp.ndarray,
    points: jnp.ndarray,        # [N, 3]
    nbr: NeighborBlock,
    radius: float,
    min_neighbors: int = 5,
) -> ShotResult:
    """Cylindrical spin coordinates alpha = sqrt(|d|^2 - beta^2),
    beta = n.(q - p), bilinear-binned into a (2W+1) x (W+1) image,
    normalized to sum 1."""
    dtype = points.dtype
    use = nbr.valid & jnp.isfinite(nbr.dist)
    delta = points[nbr.idx] - keypoints[:, None, :]
    beta = jnp.einsum("kmd,kd->km", delta, kp_normals)
    d2 = jnp.sum(delta * delta, axis=-1)
    alpha = jnp.sqrt(jnp.maximum(d2 - beta * beta, 0.0))

    a_bin = alpha / radius * SPIN_WIDTH                   # [0, W]
    b_bin = (beta / radius + 1.0) * SPIN_WIDTH            # [0, 2W]
    use = use & (a_bin <= SPIN_WIDTH) & (b_bin >= 0) & (b_bin <= 2 * SPIN_WIDTH)
    a_bin = jnp.where(use, a_bin, 0.0)
    b_bin = jnp.where(use, b_bin, 0.0)

    a0 = jnp.clip(jnp.floor(a_bin).astype(jnp.int32), 0, SPIN_WIDTH - 1)
    b0 = jnp.clip(jnp.floor(b_bin).astype(jnp.int32), 0, 2 * SPIN_WIDTH - 1)
    fa = a_bin - a0
    fb = b_bin - b0

    stride = 2 * SPIN_WIDTH + 1
    base = a0 * stride + b0
    idx = jnp.stack([base, base + 1, base + stride, base + stride + 1], axis=-1)
    w = jnp.stack([(1 - fa) * (1 - fb), (1 - fa) * fb,
                   fa * (1 - fb), fa * fb], axis=-1)
    w = w * use.astype(dtype)[..., None]
    idx = jnp.where(use[..., None], idx, 0)

    hist = _histogram_from_slots(idx, w, SPIN_LEN)
    total = jnp.maximum(jnp.sum(hist, axis=1, keepdims=True), 1e-30)
    out = hist / total
    n_nb = jnp.sum(use, axis=1)
    valid = kp_mask & (n_nb >= min_neighbors)
    return ShotResult(descriptors=out, valid=valid)


# ---------------------------------------------------------------------------
# PFH-125 (Rusu; PCL PFHEstimation, reference features/features_pfh.cpp)
# ---------------------------------------------------------------------------

PFH_BINS = 5
PFH_LEN = PFH_BINS ** 3  # 125


def pfh_descriptor(
    keypoints: jnp.ndarray,     # [K, 3]
    kp_mask: jnp.ndarray,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    nbr: NeighborBlock,         # neighbors of each keypoint (capacity M)
    min_neighbors: int = 5,
) -> ShotResult:
    """Joint 5x5x5 histogram of Darboux pair features over ALL unordered
    neighbor pairs inside the support (PCL computePointPFHSignature with
    pcl::computePairFeatures' source/target swap), increment 100 / C(k, 2)
    (PCL precomputes the denominator, so skipped degenerate pairs still
    count in it).  Index packing b(f1 atan2) + 5*b(f2) + 25*b(f3), matching
    PCL's h_index accumulation.  O(K * M^2); cap the neighbor block
    accordingly (PCL itself is O(k^2)).  Oracle: tests/golden_ref.pfh_ref."""
    from .fpfh import pair_features_pcl
    dtype = points.dtype
    K, M = nbr.idx.shape
    p = points[nbr.idx]          # [K, M, 3]
    n = normals[nbr.idx]
    v = nbr.valid

    pi = p[:, :, None, :]        # [K, M, 1, 3]
    pj = p[:, None, :, :]        # [K, 1, M, 3]
    ni = n[:, :, None, :]
    nj = n[:, None, :, :]
    f1, f2, f3, f4, degenerate = pair_features_pcl(pi, ni, pj, nj)  # [K, M, M]

    pair_valid = v[:, :, None] & v[:, None, :]
    iu = jnp.triu_indices(M, k=1)
    f1 = f1[:, iu[0], iu[1]]
    f2 = f2[:, iu[0], iu[1]]
    f3 = f3[:, iu[0], iu[1]]
    f4 = f4[:, iu[0], iu[1]]
    deg = degenerate[:, iu[0], iu[1]] | (f4[:, :] == 0.0)
    pv = pair_valid[:, iu[0], iu[1]]

    b1 = jnp.clip((PFH_BINS * (f1 + jnp.pi) / (2 * jnp.pi)).astype(jnp.int32),
                  0, PFH_BINS - 1)
    b2 = jnp.clip((PFH_BINS * (f2 + 1.0) / 2.0).astype(jnp.int32), 0, PFH_BINS - 1)
    b3 = jnp.clip((PFH_BINS * (f3 + 1.0) / 2.0).astype(jnp.int32), 0, PFH_BINS - 1)
    idx = b1 + b2 * PFH_BINS + b3 * PFH_BINS * PFH_BINS

    # PCL: hist_incr = 100 / (k*(k-1)/2) with k = #neighbors -- the
    # denominator includes degenerate (skipped) pairs
    k_nb = jnp.sum(v, axis=1)
    n_pairs = jnp.maximum(k_nb * (k_nb - 1) // 2, 1)
    contrib = pv & ~deg
    w = jnp.where(contrib, 100.0 / n_pairs[:, None].astype(dtype), 0.0)
    idx = jnp.where(contrib, idx, 0)

    hist = _histogram_from_slots(idx[..., None], w[..., None], PFH_LEN)
    n_nb = jnp.sum(v, axis=1)
    valid = kp_mask & (n_nb >= min_neighbors)
    return ShotResult(descriptors=hist, valid=valid)
