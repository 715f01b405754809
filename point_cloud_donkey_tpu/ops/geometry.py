"""Geometry primitives: quaternions, LRF rotations, bounding boxes, centroids.

Reference semantics (utils/utils.cpp):
  * An LRF is stored as a 3x3 row matrix ``[x_axis; y_axis; z_axis]``.
    ``rotateInto(v, frame)`` projects a world vector onto the LRF axes
    (utils.cpp:154-165 -- the quaternion there is built from the transposed
    matrix because Eigen is column-major, so the net effect is the row-matrix
    product), and ``rotateBack`` is the transpose (utils.cpp:167-178).
  * Bounding boxes carry ``position`` (center), ``size`` (extents) and a
    rotation quaternion mapping world -> box coordinates.
  * MVBB: the reference uses libgdiam's approximate minimum-volume bounding
    box (utils.cpp:242-297).  TPU-native equivalent here: PCA-initialized
    rotating-calipers refinement over candidate axis rotations, implemented
    with vectorized jnp reductions (no native library).

All functions are mask-aware so they compose with padded clouds under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BoundingBox(NamedTuple):
    position: jnp.ndarray  # [3] center
    size: jnp.ndarray      # [3] extents
    quat: jnp.ndarray      # [4] (w, x, y, z), rotates world -> box coords


# ---------------------------------------------------------------------------
# quaternions (w, x, y, z) -- matching boost::math::quaternion component order
# ---------------------------------------------------------------------------

def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-30)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion q (q * v * conj(q)),
    matching Utils::quatRotate (utils.cpp:568-574)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    qv = jnp.stack([x, y, z], axis=-1)
    t = 2.0 * jnp.cross(qv, v)
    return v + w[..., None] * t + jnp.cross(qv, t)


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """conj(q) * v * q (Utils::quatRotateInv, utils.cpp:560-566)."""
    return quat_rotate(quat_conjugate(q), v)


def matrix_to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z).  Branch-free Shepperd-style
    selection equivalent to the reference's Ogre-derived matrix2Quat
    (utils.cpp:342-382) up to sign (q and -q encode the same rotation)."""
    m = rot
    t = jnp.trace(m)
    # four candidate constructions
    qw = jnp.stack([
        1.0 + t,
        1.0 + m[0, 0] - m[1, 1] - m[2, 2],
        1.0 - m[0, 0] + m[1, 1] - m[2, 2],
        1.0 - m[0, 0] - m[1, 1] + m[2, 2],
    ])
    case = jnp.argmax(qw)
    s_all = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 2.0

    def c0(s):
        return jnp.stack([0.25 * s, (m[2, 1] - m[1, 2]) / s,
                          (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s])

    def c1(s):
        return jnp.stack([(m[2, 1] - m[1, 2]) / s, 0.25 * s,
                          (m[0, 1] + m[1, 0]) / s, (m[0, 2] + m[2, 0]) / s])

    def c2(s):
        return jnp.stack([(m[0, 2] - m[2, 0]) / s, (m[0, 1] + m[1, 0]) / s,
                          0.25 * s, (m[1, 2] + m[2, 1]) / s])

    def c3(s):
        return jnp.stack([(m[1, 0] - m[0, 1]) / s, (m[0, 2] + m[2, 0]) / s,
                          (m[1, 2] + m[2, 1]) / s, 0.25 * s])

    q = jax.lax.switch(case, [c0, c1, c2, c3], s_all[case])
    return quat_normalize(q)


def matrix_to_quat_batch_np(rot: "np.ndarray") -> "np.ndarray":
    """Vectorized host-numpy rotation-matrix -> quaternion for [F, 3, 3]
    batches; same Shepperd-case selection and f32 arithmetic as
    matrix_to_quat (training records quats per model on the host -- tiny
    math, and a device round-trip per model costs more than the work,
    especially through the axon tunnel where each new batch shape is a
    fresh ~0.5s compile)."""
    import numpy as np
    m = np.asarray(rot, np.float32)
    t = m[:, 0, 0] + m[:, 1, 1] + m[:, 2, 2]
    qw = np.stack([
        1.0 + t,
        1.0 + m[:, 0, 0] - m[:, 1, 1] - m[:, 2, 2],
        1.0 - m[:, 0, 0] + m[:, 1, 1] - m[:, 2, 2],
        1.0 - m[:, 0, 0] - m[:, 1, 1] + m[:, 2, 2],
    ], axis=1).astype(np.float32)
    case = np.argmax(qw, axis=1)
    s = (np.sqrt(np.maximum(qw[np.arange(len(m)), case], np.float32(1e-12)))
         * np.float32(2.0))
    cands = np.empty((len(m), 4, 4), np.float32)
    cands[:, 0, 0] = 0.25 * s
    cands[:, 0, 1] = (m[:, 2, 1] - m[:, 1, 2]) / s
    cands[:, 0, 2] = (m[:, 0, 2] - m[:, 2, 0]) / s
    cands[:, 0, 3] = (m[:, 1, 0] - m[:, 0, 1]) / s
    cands[:, 1, 0] = (m[:, 2, 1] - m[:, 1, 2]) / s
    cands[:, 1, 1] = 0.25 * s
    cands[:, 1, 2] = (m[:, 0, 1] + m[:, 1, 0]) / s
    cands[:, 1, 3] = (m[:, 0, 2] + m[:, 2, 0]) / s
    cands[:, 2, 0] = (m[:, 0, 2] - m[:, 2, 0]) / s
    cands[:, 2, 1] = (m[:, 0, 1] + m[:, 1, 0]) / s
    cands[:, 2, 2] = 0.25 * s
    cands[:, 2, 3] = (m[:, 1, 2] + m[:, 2, 1]) / s
    cands[:, 3, 0] = (m[:, 1, 0] - m[:, 0, 1]) / s
    cands[:, 3, 1] = (m[:, 0, 2] + m[:, 2, 0]) / s
    cands[:, 3, 2] = (m[:, 1, 2] + m[:, 2, 1]) / s
    cands[:, 3, 3] = 0.25 * s
    q = cands[np.arange(len(m)), case]
    n = np.maximum(np.linalg.norm(q, axis=1, keepdims=True),
                   np.float32(1e-30)).astype(np.float32)
    return (q / n).astype(np.float32)


def quat_multiply_np(q1: "np.ndarray", q2: "np.ndarray") -> "np.ndarray":
    """Host-numpy Hamilton product, broadcastable [..., 4]."""
    import numpy as np
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> rotation matrix (Utils::quat2Matrix, utils.cpp:396-434)."""
    q = quat_normalize(q)
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], dtype=q.dtype)


def quat_weighted_average(quats: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted quaternion average via the scatter-matrix eigenvector method
    (Utils::quatWeightedAverage, utils.cpp:617-665).

    quats: [M, 4], weights: [M] (zero-weight entries are ignored).
    """
    w = weights[:, None, None]
    scatter = jnp.sum(w * quats[:, :, None] * quats[:, None, :], axis=0)
    vals, vecs = jnp.linalg.eigh(scatter)  # ascending
    return vecs[:, -1]


# ---------------------------------------------------------------------------
# LRF rotations (frame: [3,3] with rows x_axis, y_axis, z_axis)
# ---------------------------------------------------------------------------

def rotate_into(v: jnp.ndarray, frame: jnp.ndarray) -> jnp.ndarray:
    """World vector -> LRF coordinates (Utils::rotateInto, utils.cpp:154-165).
    Supports batched frames/vectors via matching leading dims."""
    return jnp.einsum("...ij,...j->...i", frame, v)


def rotate_back(v: jnp.ndarray, frame: jnp.ndarray) -> jnp.ndarray:
    """LRF coordinates -> world vector (Utils::rotateBack, utils.cpp:167-178)."""
    return jnp.einsum("...ji,...j->...i", frame, v)


def frame_to_quat(frame: jnp.ndarray) -> jnp.ndarray:
    """Quaternion encoding of an LRF: rotates world coords into the frame
    (Utils::getRotQuaternion, utils.cpp:136-152 -- due to the column-major
    aliasing there, the encoded rotation is the row matrix itself)."""
    return matrix_to_quat(frame)


# ---------------------------------------------------------------------------
# centroids / radii / AABB
# ---------------------------------------------------------------------------

def masked_centroid(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(points.dtype)
    return jnp.sum(points * m[:, None], axis=0) / jnp.maximum(jnp.sum(m), 1.0)


def cloud_radius(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Max distance of any point to the centroid
    (Utils::computeCloudRadius, utils.cpp:301-321)."""
    c = masked_centroid(points, mask)
    d = jnp.linalg.norm(points - c, axis=1)
    return jnp.max(jnp.where(mask, d, 0.0))


def compute_aabb(points: jnp.ndarray, mask: jnp.ndarray) -> BoundingBox:
    """Axis-aligned bounding box (Utils::computeAABB, utils.cpp:221-233)."""
    big = jnp.asarray(jnp.inf, points.dtype)
    mn = jnp.min(jnp.where(mask[:, None], points, big), axis=0)
    mx = jnp.max(jnp.where(mask[:, None], points, -big), axis=0)
    size = mx - mn
    pos = mn + size / 2.0
    return BoundingBox(position=pos, size=size,
                       quat=jnp.array([1.0, 0.0, 0.0, 0.0], points.dtype))


# ---------------------------------------------------------------------------
# MVBB (TPU-native replacement for libgdiam's gdiam_approx_mvbb)
# ---------------------------------------------------------------------------

def _box_from_rotation(points: jnp.ndarray, mask: jnp.ndarray, rot: jnp.ndarray):
    """Given rotation matrix rows=axes, compute box extents in that frame."""
    local = points @ rot.T  # rotate_into for all points
    big = jnp.asarray(jnp.inf, points.dtype)
    mn = jnp.min(jnp.where(mask[:, None], local, big), axis=0)
    mx = jnp.max(jnp.where(mask[:, None], local, -big), axis=0)
    return mn, mx


def compute_mvbb(points: jnp.ndarray, mask: jnp.ndarray,
                 n_angles: int = 32) -> BoundingBox:
    """Approximate minimum-volume bounding box.

    TPU-native scheme (replaces gdiam_approx_mvbb, utils.cpp:242-297): start
    from the PCA frame of the cloud, then for each principal axis sweep
    ``n_angles`` in-plane rotations of the other two axes and keep the
    minimum-volume candidate.  All candidates are evaluated as one batched
    masked min/max reduction -- compiler-friendly, no data-dependent loops.

    Matches the reference's convention: ``quat`` rotates world->box, and
    ``position`` is expressed in *box* coordinates rotated back to world the
    same way the reference does (utils.cpp:286-291: position computed in box
    frame then quatRotateInv applied).
    """
    c = masked_centroid(points, mask)
    centered = points - c
    m = mask.astype(points.dtype)
    cov = jnp.einsum("n,ni,nj->ij", m, centered, centered) / jnp.maximum(m.sum(), 1.0)
    _, eigvecs = jnp.linalg.eigh(cov)
    base = eigvecs.T  # rows = axes

    angles = jnp.linspace(0.0, jnp.pi / 2.0, n_angles, endpoint=False)

    def rotations_about(axis_idx):
        """Rotate the two non-fixed axes of `base` about base[axis_idx]."""
        i, j = (axis_idx + 1) % 3, (axis_idx + 2) % 3
        cos, sin = jnp.cos(angles), jnp.sin(angles)  # [A]
        ai, aj, ak = base[i], base[j], base[axis_idx]
        new_i = cos[:, None] * ai + sin[:, None] * aj   # [A,3]
        new_j = -sin[:, None] * ai + cos[:, None] * aj
        rows = [None, None, None]
        rows[axis_idx] = jnp.broadcast_to(ak, new_i.shape)
        rows[i], rows[j] = new_i, new_j
        return jnp.stack(rows, axis=1)  # [A,3,3]

    cands = jnp.concatenate([rotations_about(k) for k in range(3)], axis=0)

    def box_volume(rot):
        mn, mx = _box_from_rotation(centered, mask, rot)
        size = mx - mn
        return jnp.prod(size)

    volumes = jax.vmap(box_volume)(cands)
    best = cands[jnp.argmin(volumes)]
    mn, mx = _box_from_rotation(points, mask, best)
    size = mx - mn
    pos_local = mn + size / 2.0
    quat = matrix_to_quat(best)
    # reference stores position rotated back to world via quatRotateInv
    pos_world = quat_rotate_inv(quat, pos_local)
    return BoundingBox(position=pos_world, size=size, quat=quat)
