"""Closed-form batched symmetric 3x3 eigendecomposition (VPU-friendly).

General-purpose eigensolvers (jnp.linalg.eigh) lower to iterative batched
kernels; for the 3x3 covariance EVDs in normals/LRF estimation a closed-form
solution (trigonometric eigenvalues + row-cross eigenvectors, Eberly-style)
runs as pure elementwise arithmetic.

Returns eigenvalues ascending and eigenvectors as matrix columns, matching
jnp.linalg.eigh conventions (up to per-vector sign, which all consumers
disambiguate anyway -- PCL's LRF sign disambiguation does the same).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def eigvals3x3(a: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues (ascending) of symmetric [..., 3, 3] matrices via the
    trigonometric closed form."""
    a00, a01, a02 = a[..., 0, 0], a[..., 0, 1], a[..., 0, 2]
    a11, a12, a22 = a[..., 1, 1], a[..., 1, 2], a[..., 2, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    # near-spherical matrices (p ~ 0): all eigenvalues equal q; guard the
    # 0/0 in the trig formula (p^3 underflows f32 denormals)
    spherical = p < 1e-12
    p_safe = jnp.where(spherical, 1.0, p)

    # det(B)/2 with B = (A - qI)/p
    detb = (b00 * (b11 * b22 - a12 * a12)
            - a01 * (a01 * b22 - a12 * a02)
            + a02 * (a01 * a12 - b11 * a02))
    r = jnp.clip(detb / (2.0 * p_safe * p_safe * p_safe), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e2 = q + 2.0 * p * jnp.cos(phi)
    e0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e1 = 3.0 * q - e0 - e2
    e0 = jnp.where(spherical, q, e0)
    e1 = jnp.where(spherical, q, e1)
    e2 = jnp.where(spherical, q, e2)
    return jnp.stack([e0, e1, e2], axis=-1)


def _eigvec_for(a: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of symmetric [..., 3, 3] a for eigenvalue lam [...]:
    the largest-norm cross product of rows of (a - lam I) is orthogonal to
    both rows, i.e. parallel to the eigenvector."""
    eye = jnp.eye(3, dtype=a.dtype)
    m = a - lam[..., None, None] * eye
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.where(
        (n01 >= n02)[..., None] & (n01 >= n12)[..., None], c01,
        jnp.where((n02 >= n12)[..., None], c02, c12))
    nrm = jnp.linalg.norm(best, axis=-1, keepdims=True)
    # degenerate (repeated eigenvalue / zero matrix): fall back to e_x;
    # the caller orthogonalizes
    fallback = jnp.zeros_like(best).at[..., 0].set(1.0)
    return jnp.where(nrm > 1e-20, best / jnp.maximum(nrm, 1e-30), fallback)


def eigh3x3(a: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric 3x3 EVD.  a: [..., 3, 3] -> (eigvals asc [..., 3],
    eigvecs [..., 3, 3] with COLUMNS as eigenvectors)."""
    # scale for numerical conditioning
    scale = jnp.max(jnp.abs(a), axis=(-2, -1))
    s_safe = jnp.maximum(scale, 1e-30)
    an = a / s_safe[..., None, None]

    vals = eigvals3x3(an)
    v2 = _eigvec_for(an, vals[..., 2])  # largest
    v0 = _eigvec_for(an, vals[..., 0])  # smallest
    # orthogonalize v0 against v2 (robust under near-degeneracy)
    v0 = v0 - jnp.sum(v0 * v2, axis=-1, keepdims=True) * v2
    n0 = jnp.linalg.norm(v0, axis=-1, keepdims=True)
    # if v0 collapsed (triple/double degenerate), pick any vector orth. to v2
    alt = jnp.cross(v2, jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], a.dtype), v2.shape))
    alt_n = jnp.linalg.norm(alt, axis=-1, keepdims=True)
    alt2 = jnp.cross(v2, jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], a.dtype), v2.shape))
    alt = jnp.where(alt_n > 1e-6, alt / jnp.maximum(alt_n, 1e-30),
                    alt2 / jnp.maximum(jnp.linalg.norm(alt2, axis=-1, keepdims=True), 1e-30))
    v0 = jnp.where(n0 > 1e-6, v0 / jnp.maximum(n0, 1e-30), alt)
    v1 = jnp.cross(v2, v0)

    vecs = jnp.stack([v0, v1, v2], axis=-1)  # columns
    vals = vals * s_safe[..., None]
    return vals, vecs
