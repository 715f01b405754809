"""CGF: Compact Geometric Features (Khoury, Zhou, Funkhouser ICCV'17).

Reference pipeline (features/features_cgf.cpp:31-113 + third_party/cgf):
C++ computes raw spherical histograms (17 radial-log x 11 polar x 12 azimuth
= 2244 bins, hard binning, density-normalized; LRF z flipped toward the
keypoint normal, third_party/cgf/cgf.cpp:100-165), dumps them via LZF, and a
Python/TensorFlow script applies a learned embedding to 32 dims from a
downloaded checkpoint.

TPU-native redesign: the raw histogram is one masked vectorized pass (no
subprocesses, no LZF round-trip), and the embedding is a jit-compiled MLP.
Checkpoint weights load from an npz (`CgfCheckpointPath` config key holding
{w0,b0,w1,b1,...}); without a checkpoint a deterministic seeded Gaussian
random projection to `CgfOutputDims` is used instead (documented divergence:
the reference hard-requires the downloaded TF checkpoint).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .neighbors import NeighborBlock
from .shot import ShotResult, _histogram_from_slots

CGF_R_BINS = 17
CGF_P_BINS = 11
CGF_A_BINS = 12
CGF_RAW_LEN = CGF_R_BINS * CGF_P_BINS * CGF_A_BINS  # 2244


def default_checkpoint_path() -> str:
    """The shipped synthetic-correspondence embedding
    (trained by cli/train_cgf_embedding.py)."""
    import os
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "cgf_embedding.npz")


def cgf_raw_histogram(
    keypoints: jnp.ndarray,     # [K, 3]
    kp_normals: jnp.ndarray,    # [K, 3] normals at keypoints (for z flip)
    frames: jnp.ndarray,        # [K, 3, 3]
    frame_valid: jnp.ndarray,   # [K]
    points: jnp.ndarray,        # [N, 3]
    nbr: NeighborBlock,
    radius: float,
    min_radius_rel: float = 0.05,   # "-m" = 0.05 * radius (features_cgf.cpp:51)
) -> jnp.ndarray:
    """[K, 2244] density-normalized raw CGF histograms."""
    dtype = points.dtype
    use = nbr.valid & (nbr.dist > 1e-15) & jnp.isfinite(nbr.dist)

    # invalid LRF -> identity frame (cgf.cpp:116-120); otherwise flip the
    # whole frame if z disagrees with the keypoint normal (cgf.cpp:121-128)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), frames.shape)
    fr = jnp.where(frame_valid[:, None, None], frames, eye)
    flip = jnp.sum(fr[:, 2, :] * kp_normals, axis=1) < 0
    flip = flip & frame_valid
    fr = jnp.where(flip[:, None, None], -fr, fr)

    delta = points[nbr.idx] - keypoints[:, None, :]
    x_l = jnp.einsum("kmd,kd->km", delta, fr[:, 0, :])
    y_l = jnp.einsum("kmd,kd->km", delta, fr[:, 1, :])
    z_l = jnp.einsum("kmd,kd->km", delta, fr[:, 2, :])

    r = jnp.sqrt(x_l * x_l + y_l * y_l + z_l * z_l)
    r = jnp.where(use, r, radius * 0.5)
    theta = jnp.degrees(jnp.arccos(jnp.clip(z_l / jnp.maximum(r, 1e-30), -1.0, 1.0)))
    phi = jnp.degrees(jnp.arctan2(y_l, x_l))

    # radius may be a traced scalar (global descriptors pass the cloud radius)
    rmin = min_radius_rel * radius
    ln_rmin = jnp.log(rmin)
    ln_span = jnp.log(radius / rmin)
    bin_r = ((CGF_R_BINS - 1) * (jnp.log(jnp.maximum(r, 1e-30)) - ln_rmin)
             / ln_span + 1.0).astype(jnp.int32)
    bin_r = jnp.clip(bin_r, 0, CGF_R_BINS - 1)
    bin_t = jnp.minimum((CGF_P_BINS * theta / 180.0).astype(jnp.int32), CGF_P_BINS - 1)
    bin_p = jnp.minimum((CGF_A_BINS * (phi + 180.0) / 360.0).astype(jnp.int32),
                        CGF_A_BINS - 1)
    idx = bin_r + bin_t * CGF_R_BINS + bin_p * CGF_R_BINS * CGF_P_BINS

    w = use.astype(dtype)
    hist = _histogram_from_slots(idx[..., None], w[..., None], CGF_RAW_LEN)
    count = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    return hist / count[:, None]


class CgfEmbedding:
    """MLP embedding (the reference's embedding.py TF model equivalent)."""

    def __init__(self, weights: List[Tuple[np.ndarray, np.ndarray]]):
        self.weights = [(jnp.asarray(w), jnp.asarray(b)) for w, b in weights]

    @classmethod
    def from_npz(cls, path: str) -> "CgfEmbedding":
        z = np.load(path)
        layers = []
        i = 0
        while f"w{i}" in z.files:
            layers.append((z[f"w{i}"], z[f"b{i}"]))
            i += 1
        if not layers:
            raise ValueError(f"{path}: no w0/b0... layers found")
        return cls(layers)

    @classmethod
    def random_projection(cls, out_dims: int, seed: int = 0) -> "CgfEmbedding":
        """Deterministic Gaussian projection fallback (JL lemma) when no
        trained checkpoint is available."""
        key = jax.random.PRNGKey(seed)
        w = jax.random.normal(key, (CGF_RAW_LEN, out_dims)) / np.sqrt(CGF_RAW_LEN)
        b = jnp.zeros(out_dims)
        return cls([(np.asarray(w), np.asarray(b))])

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, (w, b) in enumerate(self.weights):
            x = x @ w + b
            if i < len(self.weights) - 1:
                x = jax.nn.relu(x)
        return x


def cgf_descriptor(
    keypoints: jnp.ndarray,
    kp_normals: jnp.ndarray,
    frames: jnp.ndarray,
    frame_valid: jnp.ndarray,
    points: jnp.ndarray,
    nbr: NeighborBlock,
    radius: float,
    embedding: Optional[CgfEmbedding] = None,
    min_neighbors: int = 5,
) -> ShotResult:
    raw = cgf_raw_histogram(keypoints, kp_normals, frames, frame_valid,
                            points, nbr, radius)
    out = embedding(raw) if embedding is not None else raw
    n_neighbors = jnp.sum(nbr.valid & (nbr.dist > 1e-15), axis=1)
    valid = (n_neighbors >= min_neighbors) & jnp.all(jnp.isfinite(out), axis=1)
    return ShotResult(descriptors=out, valid=valid)
