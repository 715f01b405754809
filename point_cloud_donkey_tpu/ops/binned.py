"""Spatially-sorted windowed neighbor sweeps (binned candidate pruning).

Why: the serving pipeline's dense formulations sweep all N columns of a
cloud for every query even though only ~2-13% of points fall inside the
radius (PROFILE_TPU.md: mean 266 in-radius of 2048 dense columns at the
descriptor radius, far fewer at the normal radius).  The reference gets
neighborhood locality for free from kd-trees (implicit_shape_model.cpp:
940-1037, features_short_shot.cpp:108-155); the TPU redesign earns it
back with a *sorted-axis window*:

  1. sort each cloud's points along its principal axis (the projection
     with the largest spread -- one 3x3 EVD per cloud),
  2. for a tile of TQ consecutive sorted queries, every in-radius
     neighbor lies in a CONTIGUOUS index range of the sorted array
     (its projection is within [tile_min - r, tile_max + r]),
  3. sweep only a fixed-width window of the sorted points per tile,
     placed by searchsorted, instead of all N columns.

Shapes stay static under jit: the window width is a compile-time capacity
(like keypoint_capacity), and each call also returns an EXACTNESS flag --
True iff every tile's true candidate range fit its window.  Callers
calibrate the window on their workload (:func:`required_window`) and fall
back to the dense sweep when the flag trips, so results are never silently
approximate.

The sweep itself has two implementations: a pure-XLA path (portable; used
on CPU and as the fallback) and fused Pallas kernels with scalar-prefetch
window starts (ops/pallas/lrf_moments.py) on real TPU backends.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .eigh3 import eigh3x3

PARK = 1e9  # where invalid/padded points are parked (all gates fail)


def principal_axes(points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-cloud principal (largest-spread) axis [B, 3]."""
    m = mask.astype(points.dtype)
    cnt = jnp.maximum(m.sum(axis=1), 1.0)                       # [B]
    mean = jnp.sum(points * m[..., None], axis=1) / cnt[:, None]
    d = jnp.where(mask[..., None], points - mean[:, None, :], 0.0)
    cov = jnp.einsum("bnd,bne->bde", d, d) / cnt[:, None, None]
    _, vecs = eigh3x3(cov)
    return vecs[:, :, 2]                                        # largest


def principal_axis_keys(points: jnp.ndarray, mask: jnp.ndarray
                        ) -> jnp.ndarray:
    """Per-cloud sort keys: projection onto the principal (largest-spread)
    axis of the cloud.  points [B, N, 3], mask [B, N] -> keys [B, N];
    invalid points key to +PARK so they sort last."""
    axis = principal_axes(points, mask)
    keys = jnp.einsum("bnd,bd->bn", points, axis)
    return jnp.where(mask, keys, PARK)


def sort_clouds(points: jnp.ndarray, mask: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                           jnp.ndarray]:
    """Sort each cloud by its principal-axis key.  Returns
    (points_sorted [B, N, 3], mask_sorted [B, N], keys_sorted [B, N],
    order [B, N]) -- `order` lets callers co-sort extra per-point arrays
    (colors) with take_along_axis.

    The payload (coordinates, mask, original index) rides THROUGH one
    stable lax.sort instead of argsort + take_along_axis gathers: on v5e
    the three random-access gathers cost more than the sort itself
    (experiments/r6_sort.py: 6.4 ms for argsort + ONE gather vs 3.6 ms for
    the whole payload sort at the serving batch).  Stability makes the row
    order identical to stable argsort, so results are bit-equal."""
    keys = principal_axis_keys(points, mask)
    n = points.shape[1]
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32),
                            keys.shape)
    cols = [keys, points[..., 0], points[..., 1], points[..., 2],
            mask, iota]
    out = jax.lax.sort(cols, dimension=1, num_keys=1, is_stable=True)
    pts_s = jnp.stack(out[1:4], axis=-1)
    return pts_s, out[4], out[0], out[5]


def sort_clouds_ex(points: jnp.ndarray, mask: jnp.ndarray):
    """sort_clouds plus the per-cloud principal axis [B, 3] (for projecting
    OTHER query sets -- e.g. keypoints -- onto the same sort key)."""
    axis = principal_axes(points, mask)
    keys = jnp.where(mask, jnp.einsum("bnd,bd->bn", points, axis), PARK)
    n = points.shape[1]
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), keys.shape)
    cols = [keys, points[..., 0], points[..., 1], points[..., 2],
            mask, iota]
    out = jax.lax.sort(cols, dimension=1, num_keys=1, is_stable=True)
    pts_s = jnp.stack(out[1:4], axis=-1)
    return pts_s, out[4], out[0], out[5], axis


class WindowPlan(NamedTuple):
    starts: jnp.ndarray  # [T] int32 window start element per query tile
    exact: jnp.ndarray   # [] bool: every tile's candidate range fit
    span: jnp.ndarray    # [] int32 max candidate span over tiles (for
    #                         calibration; valid regardless of `exact`)


def window_starts(q_keys: jnp.ndarray,   # [Q] sorted query keys
                  q_mask: jnp.ndarray,   # [Q]
                  p_keys: jnp.ndarray,   # [N] sorted point keys
                  radius: float,
                  tile_q: int,
                  window: int,
                  align: int = 1) -> WindowPlan:
    """Per-query-tile window starts into the sorted point array.

    The window for tile t must cover every point with key in
    [min valid q key in tile - radius, max valid q key + radius].  Starts
    are aligned down to `align` elements (the Pallas block granularity)
    and clamped so the window stays inside [0, N]."""
    n = p_keys.shape[0]
    t = q_keys.shape[0] // tile_q
    qk = q_keys[: t * tile_q].reshape(t, tile_q)
    qm = q_mask[: t * tile_q].reshape(t, tile_q)
    big = jnp.asarray(PARK, q_keys.dtype)
    lo_key = jnp.min(jnp.where(qm, qk, big), axis=1)
    hi_key = jnp.max(jnp.where(qm, qk, -big), axis=1)
    any_valid = jnp.any(qm, axis=1)

    lo = jnp.searchsorted(p_keys, lo_key - radius, side="left")
    hi = jnp.searchsorted(p_keys, hi_key + radius, side="right")
    lo = jnp.where(any_valid, lo, 0)
    hi = jnp.where(any_valid, hi, 0)

    win = min(window, n)
    aligned_lo = (lo // align) * align
    start = jnp.clip(aligned_lo, 0, max(n - win, 0))
    # exactness: the window actually used covers [start, start + win) and
    # must reach hi.  (When start clamps to n - win coverage extends to n,
    # so large windows are always exact.)
    exact = jnp.all(jnp.where(any_valid, hi - start <= win, True))
    # calibration span: smallest window that would be exact at this
    # alignment -- measured from the UNCLAMPED aligned start (clamping
    # only ever extends coverage leftwards)
    span = jnp.max(jnp.where(any_valid, hi - aligned_lo, 0))
    return WindowPlan(starts=start.astype(jnp.int32), exact=exact,
                      span=span.astype(jnp.int32))


def required_window(points: jnp.ndarray, mask: jnp.ndarray, radius: float,
                    tile_q: int, align: int = 128,
                    q_points: jnp.ndarray = None,
                    q_mask: jnp.ndarray = None) -> int:
    """Calibrate the window capacity for a workload: the maximum candidate
    span over every tile of every cloud in the batch, rounded up to
    `align`.  Host-side convenience (one tiny jitted reduction); use it
    once per serving workload like keypoint_capacity sizing.  q_points
    defaults to the points themselves (self-LRF)."""
    pts_s, mask_s, keys_s, _, axis = sort_clouds_ex(points, mask)
    if q_points is None:
        q_keys, q_m = keys_s, mask_s
    else:
        # project the query set (e.g. keypoints) onto the same per-cloud
        # principal axis and sort it, exactly as the windowed descriptor
        # path does
        qk = jnp.where(q_mask, jnp.einsum("bqd,bd->bq", q_points, axis),
                       PARK)
        q_keys = jnp.sort(qk, axis=1)
        q_m = q_keys < PARK

    def one(qk, qm, pk):
        plan = window_starts(qk, qm, pk, radius, tile_q,
                             window=pk.shape[0], align=align)
        return plan.span

    spans = jax.jit(jax.vmap(one))(q_keys, q_m, keys_s)
    span = int(jax.device_get(jnp.max(spans)))
    return max(align, -(-span // align) * align)


class WindowedLRF(NamedTuple):
    frames: jnp.ndarray  # [Q, 3, 3] rows = x, y, z axes
    valid: jnp.ndarray   # [Q]
    exact: jnp.ndarray   # [] bool


def _windowed_moments_xla(q_s, q_mask, p_s, keys, radius, window, tile_q,
                          starts):
    """Shared XLA windowed sweep: weighted (SHOT) moments per query tile
    over its window.  q_s/p_s are centroid-shifted, invalid parked at PARK.
    Returns (in_r [T,tq,W], pw [T,W,3], n_in [Q], s0 [Q], cov [Q,3,3])."""
    n = p_s.shape[0]
    t = q_s.shape[0] // tile_q
    win_idx = starts[:, None] + jnp.arange(window)[None, :]      # [T, W]
    win_idx = jnp.minimum(win_idx, n - 1)
    pw = p_s[win_idx]                                            # [T, W, 3]
    qt = q_s.reshape(t, tile_q, 3)

    hi = jax.lax.Precision.HIGHEST
    # matmul-identity distances (parity with ops/neighbors.pairwise_sqdist)
    q2 = jnp.sum(qt * qt, axis=2)[:, :, None]
    p2 = jnp.sum(pw * pw, axis=2)[:, None, :]
    cross = jnp.einsum("tqd,twd->tqw", qt, pw, precision=hi)
    d2 = jnp.maximum(q2 + p2 - 2.0 * cross, 0.0)                 # [T,tq,W]
    in_r = d2 <= radius * radius
    w = jnp.where(in_r, radius - jnp.sqrt(d2), 0.0)

    n_in = jnp.sum(in_r, axis=2).reshape(-1)
    s0 = jnp.sum(w, axis=2).reshape(-1)
    s1 = jnp.einsum("tqw,twd->tqd", w, pw, precision=hi)
    xx = (pw[:, :, :, None] * pw[:, :, None, :]).reshape(t, window, 9)
    s2 = jnp.einsum("tqw,twx->tqx", w, xx,
                    precision=hi).reshape(-1, 3, 3)
    s1 = s1.reshape(-1, 3)

    s0_safe = jnp.maximum(s0, 1e-30)
    c = jnp.where(q_mask[:, None], q_s, 0.0)
    cov = (s2 - c[:, :, None] * s1[:, None, :]
           - s1[:, :, None] * c[:, None, :]
           + s0[:, None, None] * c[:, :, None] * c[:, None, :])
    cov = cov / s0_safe[:, None, None]
    return in_r, pw, qt, n_in, s0, cov


def shot_lrf_windowed_xla(queries: jnp.ndarray,  # [Q,3] SORTED by key
                          q_keys: jnp.ndarray,   # [Q]
                          q_mask: jnp.ndarray,   # [Q]
                          points: jnp.ndarray,   # [N,3] SORTED by key
                          p_keys: jnp.ndarray,   # [N]
                          mask: jnp.ndarray,     # [N]
                          radius: float,
                          window: int,
                          tile_q: int,
                          min_neighbors: int = 5,
                          z_only: bool = False) -> WindowedLRF:
    """SHOT LRF via the windowed sweep, pure XLA (ops/lrf.shot_lrf parity
    when `exact`; reduction order differs per tile so near-degenerate
    frames may settle on the other sign, same caveat as the fused Pallas
    kernels).  Q must divide by tile_q; window <= N.

    z_only skips the x-axis sign vote (the normals consumer reads only the
    z axis; x/y rows are then unspecified)."""
    window = min(window, points.shape[0])
    plan = window_starts(q_keys, q_mask, p_keys, radius, tile_q, window)

    m = mask.astype(points.dtype)
    shift = jnp.sum(points * m[:, None], axis=0) / jnp.maximum(m.sum(), 1.0)
    p_s = jnp.where(mask[:, None], points - shift, PARK)
    q_s = jnp.where(q_mask[:, None], queries - shift, PARK)

    in_r, pw, qt, n_in, s0, cov = _windowed_moments_xla(
        q_s, q_mask, p_s, p_keys, radius, window, tile_q, plan.starts)

    _, vecs = eigh3x3(cov)
    v1 = vecs[:, :, 2]
    v3 = vecs[:, :, 0]
    t = qt.shape[0]

    def windowed_flip(v):
        vt = v.reshape(t, tile_q, 3)
        dots = jnp.einsum("twd,tqd->tqw", pw, vt) \
            - jnp.einsum("tqd,tqd->tq", qt, vt)[:, :, None]
        plus = jnp.sum((dots >= 0) & in_r, axis=2).reshape(-1)
        return jnp.where((plus < n_in - plus)[:, None], -v, v)

    z_axis = windowed_flip(v3)
    if z_only:
        frames = jnp.stack([v1, jnp.cross(z_axis, v1), z_axis], axis=1)
    else:
        x_axis = windowed_flip(v1)
        frames = jnp.stack([x_axis, jnp.cross(z_axis, x_axis), z_axis],
                           axis=1)
    valid = q_mask & (n_in >= min_neighbors) & (s0 > 0)
    return WindowedLRF(frames=frames, valid=valid, exact=plan.exact)


def _use_pallas() -> bool:
    from .pallas import use_pallas
    return use_pallas()


def compute_normals_fast_windowed(
        points_sorted: jnp.ndarray,  # [B, N, 3] sorted by key
        mask_sorted: jnp.ndarray,    # [B, N]
        keys_sorted: jnp.ndarray,    # [B, N]
        radius: float,
        window: int,
        tile_q: int = 256) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Windowed serving fast path for ConsistentNormalsMethod 2 over a
    sorted batch: normal = inverted z-axis of the self SHOT LRF (only the
    z axis is computed/disambiguated), sweeping a per-tile window instead
    of all N columns (ops/normals.compute_normals_fast parity when exact).

    Returns (normals [B, N, 3] aligned to the SORTED order, exact []).
    On real TPU backends this rides the scalar-prefetch Pallas kernels
    over the flattened batch; elsewhere the XLA windowed sweep."""
    b, n, _ = points_sorted.shape
    window = min(window, n)
    if _use_pallas():
        from .pallas.lrf_moments import shot_lrf_pallas_windowed
        frames, valid, exact = shot_lrf_pallas_windowed(
            points_sorted, mask_sorted, keys_sorted, radius, window,
            tile_q, z_only=True)
    else:
        def one(pts, msk, keys):
            res = shot_lrf_windowed_xla(pts, keys, msk, pts, keys, msk,
                                        radius, window, tile_q, z_only=True)
            return res.frames, res.valid, res.exact

        frames, valid, exacts = jax.vmap(one)(points_sorted, mask_sorted,
                                              keys_sorted)
        exact = jnp.all(exacts)
    z = -frames[..., 2, :]
    up = jnp.zeros_like(z).at[..., 2].set(1.0)
    normals = jnp.where(valid[..., None], z, up)
    return normals, exact
