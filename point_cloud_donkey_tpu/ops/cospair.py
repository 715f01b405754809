"""COSPAIR descriptor (Logoglu et al.; reference third_party/cospair +
features/features_cospair.cpp).

7 concentric shell levels (r_l = l/7 * R); per level three 9-bin histograms
of pcl::computePairFeatures angles between the keypoint and each shell
neighbor, plus three 9-bin CIELab color histograms of the neighbor color
(rgb_type 5 with the paper's normalization constants); each level normalized
by its pair count and scaled by the level index.  Total 7 * (27 + 27) = 378.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .color import rgb_to_cielab_normalized
from .fpfh import pair_features_pcl
from .neighbors import NeighborBlock
from .shot import ShotResult, _histogram_from_slots

COSPAIR_LEVELS = 7
COSPAIR_BINS = 9
COSPAIR_RGB_BINS = 9
COSPAIR_LEVEL_LEN = 3 * COSPAIR_BINS + 3 * COSPAIR_RGB_BINS  # 54
COSPAIR_LEN = COSPAIR_LEVELS * COSPAIR_LEVEL_LEN             # 378


def cospair_descriptor(
    keypoints: jnp.ndarray,     # [K, 3]
    kp_normals: jnp.ndarray,    # [K, 3]
    kp_rgb: jnp.ndarray,        # [K, 3] (unused for rgb_type 5 but kept)
    kp_mask: jnp.ndarray,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    rgb: jnp.ndarray,           # [N, 3] in [0, 1]
    nbr: NeighborBlock,
    radius: float,
    min_neighbors: int = 5,
) -> ShotResult:
    dtype = points.dtype
    K, M = nbr.idx.shape
    use = nbr.valid & jnp.isfinite(nbr.dist) & (nbr.dist > 1e-15)
    d = jnp.where(use, nbr.dist, radius * 2.0)

    q = points[nbr.idx]
    nq = normals[nbr.idx]
    f1, f2, f3, _, degen = pair_features_pcl(
        keypoints[:, None, :], kp_normals[:, None, :], q, nq)
    use = use & ~degen

    deg1 = jnp.degrees(f1) + 180.0
    deg2 = jnp.degrees(jnp.arccos(jnp.clip(f2, -1.0, 1.0)))
    deg3 = jnp.degrees(jnp.arccos(jnp.clip(f3, -1.0, 1.0)))
    b1 = jnp.clip((deg1 / (360.0 / COSPAIR_BINS)).astype(jnp.int32), 0, COSPAIR_BINS - 1)
    b2 = jnp.clip((deg2 / (180.0 / COSPAIR_BINS)).astype(jnp.int32), 0, COSPAIR_BINS - 1)
    b3 = jnp.clip((deg3 / (180.0 / COSPAIR_BINS)).astype(jnp.int32), 0, COSPAIR_BINS - 1)

    # CIELab of the neighbor, un-normalized then COSPAIR-normalized
    # (cospair.cpp:162-176)
    lab_n = rgb_to_cielab_normalized(rgb)[nbr.idx]
    L = lab_n[..., 0] * 100.0
    a = lab_n[..., 1] * 120.0
    b_ = lab_n[..., 2] * 120.0
    Ln = L / 100.0
    an = (a + 86.185) / 184.439
    bn = (b_ + 107.863) / 202.345
    br = jnp.clip((Ln * COSPAIR_RGB_BINS).astype(jnp.int32), 0, COSPAIR_RGB_BINS - 1)
    bg = jnp.clip((an * COSPAIR_RGB_BINS).astype(jnp.int32), 0, COSPAIR_RGB_BINS - 1)
    bb = jnp.clip((bn * COSPAIR_RGB_BINS).astype(jnp.int32), 0, COSPAIR_RGB_BINS - 1)

    # level of each neighbor: shells at l/LEVELS * R
    level = jnp.clip(jnp.ceil(d / radius * COSPAIR_LEVELS).astype(jnp.int32),
                     1, COSPAIR_LEVELS) - 1   # 0-based

    base = level * COSPAIR_LEVEL_LEN
    nb = COSPAIR_BINS
    idx = jnp.stack([
        base + b1, base + nb + b2, base + 2 * nb + b3,
        base + 3 * nb + br, base + 3 * nb + COSPAIR_RGB_BINS + bg,
        base + 3 * nb + 2 * COSPAIR_RGB_BINS + bb,
    ], axis=-1)
    w = jnp.broadcast_to(use[..., None].astype(dtype), idx.shape)
    idx = jnp.where(use[..., None], idx, 0)
    hist = _histogram_from_slots(idx, w, COSPAIR_LEN)

    # per-level normalization by pair count, scaled by level index
    # (cospair.cpp:269-283)
    level_onehot = jax.nn.one_hot(level, COSPAIR_LEVELS, dtype=dtype) \
        * use[..., None]
    counts = jnp.sum(level_onehot, axis=1)                    # [K, LEVELS]
    scale = jnp.where(counts > 0,
                      (jnp.arange(1, COSPAIR_LEVELS + 1, dtype=dtype)[None, :]
                       / jnp.maximum(counts, 1.0)), 0.0)
    hist = hist.reshape(K, COSPAIR_LEVELS, COSPAIR_LEVEL_LEN) * scale[..., None]
    hist = hist.reshape(K, COSPAIR_LEN)

    n_nb = jnp.sum(use, axis=1)
    valid = kp_mask & (n_nb >= min_neighbors)
    return ShotResult(descriptors=hist, valid=valid)
