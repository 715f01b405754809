"""Color conversion: sRGB -> normalized CIELab + color distance.

Spec: third_party/pcl_color_conversion/color_conversion.cpp (PCL cshot.hpp
lineage): sRGB gamma expansion, D65 XYZ, cube-root via the reference's
4000-entry LUT law (exact function, applied vectorized -- including the
LUT's index truncation so values match the reference bit-for-bit-ish),
L/a/b clamped to [0,100]/[-120,120] then normalized by 100/120/120.

Distance: (|dL| + (|da| + |db|)/2) / 3, clamped to [0,1]
(color_conversion.cpp:86-96).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _srgb_expand(c: jnp.ndarray) -> jnp.ndarray:
    """c in [0,1] (the reference indexes a 256-entry LUT by byte value)."""
    return jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)


def _xyz_f(t: jnp.ndarray) -> jnp.ndarray:
    """The reference's sXYZ_LUT law including index truncation:
    f = floor(t*4000)/4000, then t^(1/3) branch (power 0.3333 like PCL)."""
    f = jnp.floor(jnp.clip(t * 4000.0, 0.0, 3999.0)) / 4000.0
    return jnp.where(f > 0.008856, f ** 0.3333, 7.787 * f + 16.0 / 116.0)


def rgb_to_cielab_normalized(rgb: jnp.ndarray) -> jnp.ndarray:
    """rgb [..., 3] in [0, 1] -> normalized Lab [..., 3]
    (0<=L<=1, -1<=a,b<=1)."""
    f = _srgb_expand(rgb)
    fr, fg, fb = f[..., 0], f[..., 1], f[..., 2]
    x = fr * 0.412453 + fg * 0.357580 + fb * 0.180423
    y = fr * 0.212671 + fg * 0.715160 + fb * 0.072169
    z = fr * 0.019334 + fg * 0.119193 + fb * 0.950227

    vx = _xyz_f(x / 0.95047)
    vy = _xyz_f(y)
    vz = _xyz_f(z / 1.08883)

    L = jnp.minimum(116.0 * vy - 16.0, 100.0)
    a = jnp.clip(500.0 * (vx - vy), -120.0, 120.0)
    b = jnp.clip(200.0 * (vy - vz), -120.0, 120.0)
    return jnp.stack([L / 100.0, a / 120.0, b / 120.0], axis=-1)


def color_distance(lab1: jnp.ndarray, lab2: jnp.ndarray) -> jnp.ndarray:
    """Normalized Lab distance (color_conversion.cpp:86-96)."""
    d = jnp.abs(lab1 - lab2)
    dist = (d[..., 0] + (d[..., 1] + d[..., 2]) / 2.0) / 3.0
    return jnp.clip(dist, 0.0, 1.0)
