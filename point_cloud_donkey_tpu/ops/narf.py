"""NARF keypoints + NARF-36 descriptor (Steder et al.; the reference wraps
pcl::NarfKeypoint / pcl::NarfDescriptor over a 640x480 planar range image
with Kinect intrinsics f=525 at features/features_narf.cpp:44-96, support
size = descriptor radius, rotation_invariant=true).  NARF ignores the
pipeline's keypoints and detects its own from range-image borders.

TPU formulation (functional variant; PCL's border taxonomy — veil/shadow/
obstacle classes — is condensed into a relative range-jump score, documented
divergence):
  * range image: host z-buffer of the planar projection (one pass per cloud),
  * keypoints: jitted interest score = local surface change (range gradient)
    gated away from borders, `reduce_window` non-max suppression, static
    top-K selection,
  * descriptor: 36 beams of a star pattern overlaid on the local range patch;
    each beam averages the distance-weighted range derivative along its ray
    (bilinear gathers), squashed by atan; rotation invariance by rolling the
    beams so the dominant response comes first.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

NARF_LEN = 36
_BEAM_STEPS = 10


def build_range_image(
    xyz: np.ndarray,
    width: int = 640,
    height: int = 480,
    focal: float = 525.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host z-buffer planar projection (pcl::RangeImagePlanar::
    createFromPointCloudWithFixedSize, sensor at the origin looking +z).
    Returns (range [H, W] float32 with +inf holes, scale) where scale is
    unused for real depth data; points with z <= 0 are behind the camera and
    skipped, like PCL."""
    rng_img = np.full((height, width), np.inf, np.float32)
    z = xyz[:, 2]
    ok = z > 1e-6
    u = np.round(focal * xyz[ok, 0] / z[ok] + width / 2.0).astype(np.int64)
    v = np.round(focal * xyz[ok, 1] / z[ok] + height / 2.0).astype(np.int64)
    r = np.linalg.norm(xyz[ok], axis=1).astype(np.float32)
    inside = (u >= 0) & (u < width) & (v >= 0) & (v < height)
    np.minimum.at(rng_img, (v[inside], u[inside]), r[inside])
    return rng_img, 1.0


class NarfKeypoints(NamedTuple):
    uv: jnp.ndarray      # [K, 2] (row, col) float
    xyz: jnp.ndarray     # [K, 3] back-projected positions
    score: jnp.ndarray   # [K]
    valid: jnp.ndarray   # [K]


def _finite(img):
    return jnp.isfinite(img)


def narf_keypoints(
    range_img: jnp.ndarray,   # [H, W] with +inf holes
    support_size: float,
    focal: float = 525.0,
    max_keypoints: int = 128,
    border_jump: float = 0.15,
    min_score: float = 0.02,
) -> NarfKeypoints:
    H, W = range_img.shape
    dtype = jnp.float32
    fin = _finite(range_img)
    r = jnp.where(fin, range_img, 0.0)

    def shift(img, dy, dx, fill):
        return jnp.roll(jnp.where(fin, img, fill), (dy, dx), (0, 1))

    # border score: largest relative range jump to a 4-neighbor (condenses
    # PCL's RangeImageBorderExtractor obstacle/shadow classification)
    jumps = []
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        nb = shift(range_img, dy, dx, jnp.inf)
        nb_fin = jnp.roll(fin, (dy, dx), (0, 1))
        rel = jnp.abs(nb - range_img) / jnp.maximum(range_img, 1e-6)
        jumps.append(jnp.where(nb_fin & fin, rel, 1.0))
    border = jnp.maximum(jnp.maximum(jumps[0], jumps[1]),
                         jnp.maximum(jumps[2], jumps[3]))

    # surface-change score: range gradient magnitude, lightly smoothed
    gx = (shift(r, 0, -1, 0.0) - shift(r, 0, 1, 0.0)) * 0.5
    gy = (shift(r, -1, 0, 0.0) - shift(r, 1, 0, 0.0)) * 0.5
    change = jnp.sqrt(gx * gx + gy * gy)
    kernel = jnp.ones((3, 3), dtype) / 9.0
    change = jax.lax.conv_general_dilated(
        change[None, None], kernel[None, None], (1, 1), "SAME")[0, 0]

    # interest: strong surface change away from borders, on valid pixels
    score = jnp.where(fin & (border < border_jump), change, 0.0)

    # non-max suppression over the projected support window
    win = 9
    pooled = jax.lax.reduce_window(score, -jnp.inf, jax.lax.max,
                                   (win, win), (1, 1), "SAME")
    is_max = (score >= pooled) & (score > min_score)
    flat = jnp.where(is_max, score, 0.0).reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat, max_keypoints)
    vv = (top_idx // W).astype(dtype)
    uu = (top_idx % W).astype(dtype)
    valid = top_scores > 0

    rr = range_img.reshape(-1)[top_idx]
    # back-project: direction from pixel via the pinhole model
    x = (uu - W / 2.0) / focal
    y = (vv - H / 2.0) / focal
    dir_vec = jnp.stack([x, y, jnp.ones_like(x)], axis=1)
    dir_vec = dir_vec / jnp.linalg.norm(dir_vec, axis=1, keepdims=True)
    xyz = dir_vec * jnp.where(valid, rr, 0.0)[:, None]
    return NarfKeypoints(uv=jnp.stack([vv, uu], axis=1), xyz=xyz,
                         score=top_scores, valid=valid)


def _bilinear(img, fin, vv, uu):
    """Bilinear sample with hole handling: invalid taps fall back to the
    nearest valid tap's value (weight renormalization)."""
    H, W = img.shape
    v0 = jnp.clip(jnp.floor(vv).astype(jnp.int32), 0, H - 2)
    u0 = jnp.clip(jnp.floor(uu).astype(jnp.int32), 0, W - 2)
    fv = vv - v0
    fu = uu - u0
    acc = 0.0
    wacc = 0.0
    for dv in (0, 1):
        for du in (0, 1):
            w = (fv if dv else 1 - fv) * (fu if du else 1 - fu)
            val = img[v0 + dv, u0 + du]
            ok = fin[v0 + dv, u0 + du]
            acc = acc + jnp.where(ok, w * val, 0.0)
            wacc = wacc + jnp.where(ok, w, 0.0)
    return acc / jnp.maximum(wacc, 1e-6), wacc > 1e-3


def narf_descriptor(
    range_img: jnp.ndarray,
    kp: NarfKeypoints,
    support_size: float,
    focal: float = 525.0,
    rotation_invariant: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[K, 36] NARF descriptors: beam b's value is the weighted mean range
    derivative along the ray at angle 2*pi*b/36, atan-squashed to
    (-0.5, 0.5); with rotation invariance the beams are rolled so the
    strongest response is beam 0."""
    fin = _finite(range_img)
    img = jnp.where(fin, range_img, 0.0)
    K = kp.uv.shape[0]

    rr = jnp.maximum(jnp.linalg.norm(kp.xyz, axis=1), 1e-3)
    pix_radius = focal * (support_size * 0.5) / rr          # [K]

    angles = jnp.arange(NARF_LEN) * (2.0 * jnp.pi / NARF_LEN)
    steps = (jnp.arange(_BEAM_STEPS) + 1.0) / _BEAM_STEPS   # (0, 1]
    # sample positions [K, 36, S]
    dv = jnp.sin(angles)[None, :, None] * steps[None, None, :] * \
        pix_radius[:, None, None]
    du = jnp.cos(angles)[None, :, None] * steps[None, None, :] * \
        pix_radius[:, None, None]
    vv = kp.uv[:, 0][:, None, None] + dv
    uu = kp.uv[:, 1][:, None, None] + du

    samples, ok = _bilinear(img, fin, vv, uu)               # [K, 36, S]
    center = _bilinear(img, fin, kp.uv[:, 0][:, None, None],
                       kp.uv[:, 1][:, None, None])[0]
    prev = jnp.concatenate([jnp.broadcast_to(center, samples[..., :1].shape),
                            samples[..., :-1]], axis=-1)
    deriv = samples - prev
    w = (1.0 - steps)[None, None, :] * ok.astype(jnp.float32)
    beam = jnp.sum(deriv * w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1e-6)
    desc = jnp.arctan(beam / jnp.maximum(support_size / NARF_LEN, 1e-6)) / jnp.pi

    if rotation_invariant:
        dom = jnp.argmax(jnp.abs(desc), axis=1)             # [K]
        idx = (dom[:, None] + jnp.arange(NARF_LEN)[None, :]) % NARF_LEN
        desc = jnp.take_along_axis(desc, idx, axis=1)

    valid = kp.valid & jnp.all(jnp.isfinite(desc), axis=1)
    return desc, valid
