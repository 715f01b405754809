"""Scene-scale tiling: query-chunked, point-windowed kernels.

The reference handles 1e5-1e6-point RGB-D scenes with kd-tree locality
(implicit_shape_model.cpp:739-821).  The dense-masked TPU formulation in
ops/neighbors.py materializes [Q, N] distance blocks -- perfect up to ~32k
points, infeasible at scene scale.  This module keeps the same dense MXU/VPU
math but bounds memory to O(chunk * window):

  1. **Sort** the cloud along its longest axis on the host (cheap, once).
  2. **Chunk** the (equally sorted) queries into fixed-size groups.
  3. For each chunk, only the contiguous **window** of sorted points whose
     key could be within `radius` of the chunk participates; the host
     computes per-chunk window starts with two searchsorteds and a single
     static window size (bucketed so jit programs are reused).
  4. A `lax.map` over chunks runs the *same* dense kernels on
     [chunk, window] slices: no gathers, no dynamic shapes, contiguous
     `dynamic_slice` loads only.

Exactness: the window provably covers every in-radius neighbor (a neighbor
within `radius` differs by <= radius along the sort axis), so tiled results
equal the dense results up to fp summation order.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .neighbors import NeighborBlock, gather_radius_neighbors
from .normals import NormalsResult, compute_normals_at

# Clouds above this size take the tiled scene path in models/features.py.
SCENE_TILE_THRESHOLD = 32768

# Default chunk sizes (queries per lax.map step).
NORMALS_CHUNK = 2048
KEYPOINT_CHUNK = 256


class TilePlan(NamedTuple):
    """Host-computed window plan for one (queries, points) pairing."""
    starts: np.ndarray   # [C] int32 window start per query chunk
    window: int          # static window length (bucketed)
    chunk: int           # queries per chunk
    n_chunks: int


def sort_key_axis(xyz: np.ndarray) -> int:
    """Sort along the longest extent so windows are as tight as possible."""
    if len(xyz) == 0:
        return 0
    ext = xyz.max(axis=0) - xyz.min(axis=0)
    return int(np.argmax(ext))


def plan_tiles(
    q_key: np.ndarray,    # [Q] sort-axis coords of the queries, ASCENDING
    q_valid: np.ndarray,  # [Q] bool (padding False)
    p_key: np.ndarray,    # [N] sort-axis coords of the points, ASCENDING
    radius: float,
    chunk: int,
    min_window: int = 1024,
) -> TilePlan:
    """Compute per-chunk window starts and the (static) window size."""
    q = len(q_key)
    n = len(p_key)
    n_chunks = max(1, -(-q // chunk))
    pad = n_chunks * chunk - q
    if pad:
        q_key = np.concatenate([q_key, np.full(pad, np.inf, q_key.dtype)])
        q_valid = np.concatenate([q_valid, np.zeros(pad, bool)])
    keys = q_key.reshape(n_chunks, chunk)
    valid = q_valid.reshape(n_chunks, chunk)
    # chunk extents over valid queries only (empty chunks -> degenerate 0..0)
    kmin = np.where(valid, keys, np.inf).min(axis=1)
    kmax = np.where(valid, keys, -np.inf).max(axis=1)
    kmin = np.where(np.isfinite(kmin), kmin, 0.0)
    kmax = np.where(np.isfinite(kmax), kmax, 0.0)
    lo = np.searchsorted(p_key, kmin - radius, side="left")
    hi = np.searchsorted(p_key, kmax + radius, side="right")
    need = int(np.max(hi - lo)) if n_chunks else 0
    window = max(min_window, need)
    # bucket to the next power of two so jit programs are shared
    w = min_window
    while w < window:
        w *= 2
    window = min(w, n)
    starts = np.clip(lo, 0, max(n - window, 0)).astype(np.int32)
    return TilePlan(starts=starts, window=window, chunk=chunk,
                    n_chunks=n_chunks)


def _map_chunks(inner, q_arrays, p_arrays, starts, chunk, window, n_chunks):
    """lax.map over query chunks.  `inner(q_slices, p_slices)` gets per-chunk
    slices of every query array ([chunk, ...]) and point array ([window, ...])
    and returns a pytree of [chunk, ...] outputs; results concatenate to [Q]."""

    def body(args):
        i, s = args
        qs = tuple(jax.lax.dynamic_slice_in_dim(a, i * chunk, chunk)
                   for a in q_arrays)
        ps = tuple(jax.lax.dynamic_slice_in_dim(a, s, window)
                   for a in p_arrays)
        return inner(qs, ps, s)

    out = jax.lax.map(body, (jnp.arange(n_chunks), jnp.asarray(starts)))
    return jax.tree_util.tree_map(
        lambda o: o.reshape((n_chunks * chunk,) + o.shape[2:]), out)


# ---------------------------------------------------------------------------
# jitted tiled stages (cached per static shape signature)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _tiled_normals_stage(n: int, chunk: int, window: int, n_chunks: int,
                         radius: float, method: int):
    @jax.jit
    def run(points, mask, starts):
        m = mask.astype(points.dtype)
        centroid = jnp.sum(points * m[:, None], axis=0) / jnp.maximum(m.sum(), 1.0)

        def inner(qs, ps, s):
            q, qm = qs
            p, pm = ps
            return compute_normals_at(q, qm, p, pm, radius, method,
                                      centroid=centroid)

        return _map_chunks(inner, (points, mask), (points, mask),
                           starts, chunk, window, n_chunks)
    return run


def tiled_compute_normals(points, mask, plan: TilePlan, radius: float,
                          method: int) -> NormalsResult:
    """Normals for a z-sorted padded cloud ([N,3]/[N]) using plan windows.
    Queries are the points themselves; results are in sorted order."""
    run = _tiled_normals_stage(points.shape[0], plan.chunk, plan.window,
                               plan.n_chunks, float(radius), int(method))
    res = run(jnp.asarray(points), jnp.asarray(mask), plan.starts)
    n = points.shape[0]
    return NormalsResult(*(x[:n] for x in res))


@functools.lru_cache(maxsize=None)
def _tiled_moments_stage(q: int, n: int, chunk: int, window: int,
                         n_chunks: int, radius: float, weighting: str,
                         center: str):
    from .neighbors import radius_covariance

    @jax.jit
    def run(queries, q_mask, points, mask, starts):
        def inner(qs, ps, s):
            (qq,) = qs
            p, pm = ps
            return radius_covariance(qq, p, pm, radius,
                                     weighting=weighting, center=center)

        return _map_chunks(inner, (queries,), (points, mask),
                           starts, chunk, window, n_chunks)
    return run


def tiled_radius_moments(queries, points, mask, plan: TilePlan, radius: float,
                         weighting: str = "uniform", center: str = "mean"):
    """Windowed ops.neighbors.radius_covariance (queries/points both sorted
    along the same axis; plan built for this pairing)."""
    run = _tiled_moments_stage(queries.shape[0], points.shape[0], plan.chunk,
                               plan.window, plan.n_chunks, float(radius),
                               weighting, center)
    res = run(jnp.asarray(queries), None, jnp.asarray(points),
              jnp.asarray(mask), plan.starts)
    q = queries.shape[0]
    return jax.tree_util.tree_map(lambda x: x[:q], res)


@functools.lru_cache(maxsize=None)
def _tiled_gather_stage(q: int, n: int, chunk: int, window: int,
                        n_chunks: int, radius: float, capacity: int,
                        exclude_zero: bool):
    @jax.jit
    def run(queries, points, mask, starts):
        def inner(qs, ps, s):
            (qq,) = qs
            p, pm = ps
            nb = gather_radius_neighbors(qq, p, pm, radius, capacity,
                                         exclude_zero_dist=exclude_zero)
            # map window-local indices back to sorted-global indices
            return NeighborBlock(idx=nb.idx + s, dist=nb.dist, valid=nb.valid)

        return _map_chunks(inner, (queries,), (points, mask),
                           starts, chunk, window, n_chunks)
    return run


def tiled_gather_radius_neighbors(queries, points, mask, plan: TilePlan,
                                  radius: float, capacity: int,
                                  exclude_zero_dist: bool = False
                                  ) -> NeighborBlock:
    run = _tiled_gather_stage(queries.shape[0], points.shape[0], plan.chunk,
                              plan.window, plan.n_chunks, float(radius),
                              int(capacity), bool(exclude_zero_dist))
    res = run(jnp.asarray(queries), jnp.asarray(points), jnp.asarray(mask),
              plan.starts)
    q = queries.shape[0]
    return NeighborBlock(*(x[:q] for x in res))


# ---------------------------------------------------------------------------
# tiled preprocessing filters (ops/preprocess.py at scene scale)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _tiled_sor_stage(n: int, chunk: int, window: int, n_chunks: int,
                     mean_k: int):
    from .neighbors import pairwise_sqdist

    @jax.jit
    def run(points, mask, starts):
        def inner(qs, ps, s):
            q, qm = qs
            p, pm = ps
            d2 = pairwise_sqdist(q, p)
            d2 = jnp.where(pm[None, :], d2, jnp.inf)
            k = min(mean_k + 1, window)
            neg, _ = jax.lax.top_k(-d2, k)
            d = jnp.sqrt(jnp.maximum(-neg[:, 1:], 0.0))
            finite = jnp.isfinite(d)
            mean_d = jnp.sum(jnp.where(finite, d, 0.0), axis=1) / \
                jnp.maximum(jnp.sum(finite, axis=1), 1)
            return mean_d

        return _map_chunks(inner, (points, mask), (points, mask),
                           starts, chunk, window, n_chunks)
    return run


def tiled_statistical_outlier_removal(points, mask, plan: TilePlan,
                                      mean_k: int, stddev_mul: float):
    """Two-phase SOR: per-point mean kNN distance tiled, then the global
    mean/std threshold (PCL StatisticalOutlierRemoval semantics)."""
    run = _tiled_sor_stage(points.shape[0], plan.chunk, plan.window,
                           plan.n_chunks, int(mean_k))
    mean_d = run(jnp.asarray(points), jnp.asarray(mask), plan.starts)
    n = points.shape[0]
    mean_d = mean_d[:n]
    m = mask.astype(points.dtype)
    cnt = jnp.maximum(m.sum(), 1.0)
    g_mean = jnp.sum(jnp.where(mask, mean_d, 0.0)) / cnt
    g_var = jnp.sum(jnp.where(mask, (mean_d - g_mean) ** 2, 0.0)) / cnt
    thresh = g_mean + stddev_mul * jnp.sqrt(g_var)
    return mask & (mean_d <= thresh)


@functools.lru_cache(maxsize=None)
def _tiled_ror_stage(n: int, chunk: int, window: int, n_chunks: int,
                     radius: float):
    from .neighbors import pairwise_sqdist

    @jax.jit
    def run(points, mask, starts):
        def inner(qs, ps, s):
            q, qm = qs
            p, pm = ps
            d2 = pairwise_sqdist(q, p)
            in_r = (d2 <= radius * radius) & pm[None, :]
            return jnp.sum(in_r, axis=1) - 1  # exclude self

        return _map_chunks(inner, (points, mask), (points, mask),
                           starts, chunk, window, n_chunks)
    return run


def tiled_radius_outlier_removal(points, mask, plan: TilePlan, radius: float,
                                 min_neighbors: int):
    run = _tiled_ror_stage(points.shape[0], plan.chunk, plan.window,
                           plan.n_chunks, float(radius))
    count = run(jnp.asarray(points), jnp.asarray(mask), plan.starts)
    return mask & (count[:points.shape[0]] >= min_neighbors)


def tiled_mls_smooth(points, mask, plan: TilePlan, radius: float):
    """Order-1 MLS projection (ops/preprocess.mls_smooth), tiled."""
    from .eigh3 import eigh3x3
    mom = tiled_radius_moments(points, points, mask, plan, radius,
                               weighting="uniform", center="mean")
    _, vecs = eigh3x3(mom.cov)
    normal = vecs[..., 0]
    delta = points - mom.mean
    proj = points - jnp.sum(delta * normal, axis=1, keepdims=True) * normal
    ok = mom.count >= 3
    return jnp.where((mask & ok)[:, None], proj, points)


# ---------------------------------------------------------------------------
# tiled keypoint-culling stages (models/keypoints.py at scene scale)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _tiled_curvature_stage(q: int, n: int, chunk: int, window: int,
                           n_chunks: int, radius: float):
    from .curvature import principal_curvatures

    @jax.jit
    def run(queries, query_normals, points, normals, mask, starts):
        def inner(qs, ps, s):
            qq, qn = qs
            p, nr, pm = ps
            return principal_curvatures(qq, qn, p, nr, pm, radius)

        return _map_chunks(inner, (queries, query_normals),
                           (points, normals, mask),
                           starts, chunk, window, n_chunks)
    return run


def tiled_principal_curvatures(queries, query_normals, points, normals, mask,
                               plan: TilePlan, radius: float):
    """Windowed ops.curvature.principal_curvatures (PCL semantics; queries
    and points sorted along the same axis, plan built for this pairing)."""
    run = _tiled_curvature_stage(queries.shape[0], points.shape[0],
                                 plan.chunk, plan.window, plan.n_chunks,
                                 float(radius))
    res = run(jnp.asarray(queries), jnp.asarray(query_normals),
              jnp.asarray(points), jnp.asarray(normals), jnp.asarray(mask),
              plan.starts)
    q = queries.shape[0]
    return jax.tree_util.tree_map(lambda x: x[:q], res)


@functools.lru_cache(maxsize=None)
def _tiled_kpq_stage(q: int, n: int, chunk: int, window: int,
                     n_chunks: int, radius: float):
    from .neighbors import pairwise_sqdist

    @jax.jit
    def run(queries, points, k1, k2, mask, starts):
        def inner(qs, ps, s):
            (qq,) = qs
            p, w_k1, w_k2, pm = ps
            d2 = pairwise_sqdist(qq, p)
            in_r = (d2 <= radius * radius) & pm[None, :]
            kk = w_k1 * w_k2
            cnt = jnp.sum(in_r, axis=1)
            kk_sum = jnp.sum(jnp.where(in_r, kk[None, :], 0.0), axis=1)
            kk_max = jnp.max(jnp.where(in_r, kk[None, :], -jnp.inf), axis=1)
            kk_min = jnp.min(jnp.where(in_r, kk[None, :], jnp.inf), axis=1)
            k1_max = jnp.max(jnp.where(in_r, w_k1[None, :], -jnp.inf), axis=1)
            k2_min = jnp.min(jnp.where(in_r, w_k2[None, :], jnp.inf), axis=1)
            return cnt, kk_sum, kk_max, kk_min, k1_max, k2_min

        return _map_chunks(inner, (queries,), (points, k1, k2, mask),
                           starts, chunk, window, n_chunks)
    return run


def tiled_kpq_aggregate(queries, points, k1, k2, mask, plan: TilePlan,
                        radius: float):
    """Per-query KPQ support statistics over dense principal curvatures
    (count, sum K, max K, min K, max k1, min k2) -- the reference's
    computeKPQ accumulators (culling.cpp:441-471); the final formula with
    its FLT_MIN clamps runs on the host over the (small) keypoint set."""
    run = _tiled_kpq_stage(queries.shape[0], points.shape[0], plan.chunk,
                           plan.window, plan.n_chunks, float(radius))
    res = run(jnp.asarray(queries), jnp.asarray(points), jnp.asarray(k1),
              jnp.asarray(k2), jnp.asarray(mask), plan.starts)
    q = queries.shape[0]
    return tuple(x[:q] for x in res)


@functools.lru_cache(maxsize=None)
def _tiled_color_stage(q: int, n: int, chunk: int, window: int,
                       n_chunks: int, radius: float, max_dist: float):
    from .color import color_distance
    from .neighbors import pairwise_sqdist

    @jax.jit
    def run(queries, query_lab, points, points_lab, mask, starts):
        def inner(qs, ps, s):
            qq, ql = qs
            p, pl, pm = ps
            d2 = pairwise_sqdist(qq, p)
            in_r = (d2 <= radius * radius) & pm[None, :]
            dist = color_distance(ql[:, None, :], pl[None, :, :])
            distant = (dist > max_dist) & in_r
            return jnp.sum(in_r, axis=1), jnp.sum(distant, axis=1)

        return _map_chunks(inner, (queries, query_lab),
                           (points, points_lab, mask),
                           starts, chunk, window, n_chunks)
    return run


def tiled_color_counts(queries, query_lab, points, points_lab, mask,
                       plan: TilePlan, radius: float, max_dist: float):
    """Per-query (in-radius count, distant-CIELab count) for the
    color-distance culling score (culling.cpp:474-506)."""
    run = _tiled_color_stage(queries.shape[0], points.shape[0], plan.chunk,
                             plan.window, plan.n_chunks, float(radius),
                             float(max_dist))
    in_cnt, distant = run(jnp.asarray(queries), jnp.asarray(query_lab),
                          jnp.asarray(points), jnp.asarray(points_lab),
                          jnp.asarray(mask), plan.starts)
    q = queries.shape[0]
    return in_cnt[:q], distant[:q]


# ---------------------------------------------------------------------------
# tiled detector-keypoint stages (Harris3D / ISS3D at scene scale)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _tiled_payload_stage(q: int, n: int, p_dim: int, chunk: int, window: int,
                         n_chunks: int, radius: float):
    from .neighbors import pairwise_sqdist

    @jax.jit
    def run(queries, points, payload, mask, starts):
        def inner(qs, ps, s):
            (qq,) = qs
            p, pl, pm = ps
            d2 = pairwise_sqdist(qq, p)
            in_r = (d2 <= radius * radius) & pm[None, :]
            w = in_r.astype(qq.dtype)
            hi = jax.lax.Precision.HIGHEST
            return (jnp.sum(in_r, axis=1),
                    jnp.matmul(w, pl, precision=hi))

        return _map_chunks(inner, (queries,), (points, payload, mask),
                           starts, chunk, window, n_chunks)
    return run


def tiled_payload_moments(queries, points, payload, mask, plan: TilePlan,
                          radius: float):
    """Per-query (in-radius count, sum of neighbor payload rows [Q, P]).
    The generic accumulation behind the tiled Harris3D / ISS3D responses:
    any per-point payload (normal outer products, weighted positions, ...)
    sums over the in-radius support in O(chunk * window) memory."""
    run = _tiled_payload_stage(queries.shape[0], points.shape[0],
                               payload.shape[1], plan.chunk, plan.window,
                               plan.n_chunks, float(radius))
    cnt, sums = run(jnp.asarray(queries), jnp.asarray(points),
                    jnp.asarray(payload), jnp.asarray(mask), plan.starts)
    q = queries.shape[0]
    return cnt[:q], sums[:q]


@functools.lru_cache(maxsize=None)
def _tiled_value_max_stage(q: int, n: int, chunk: int, window: int,
                           n_chunks: int, radius: float, exclude_zero: bool):
    from .neighbors import pairwise_sqdist

    @jax.jit
    def run(queries, points, values, mask, starts):
        def inner(qs, ps, s):
            (qq,) = qs
            p, v, pm = ps
            d2 = pairwise_sqdist(qq, p)
            in_r = (d2 <= radius * radius) & pm[None, :]
            if exclude_zero:
                in_r = in_r & (d2 > 0)
            return (jnp.sum(in_r, axis=1),
                    jnp.max(jnp.where(in_r, v[None, :], -jnp.inf), axis=1))

        return _map_chunks(inner, (queries,), (points, values, mask),
                           starts, chunk, window, n_chunks)
    return run


def tiled_neighbor_max(queries, points, values, mask, plan: TilePlan,
                       radius: float, exclude_zero_dist: bool = False):
    """Per-query (in-radius count, max neighbor value) -- the non-max
    suppression primitive for the tiled keypoint detectors."""
    run = _tiled_value_max_stage(queries.shape[0], points.shape[0],
                                 plan.chunk, plan.window, plan.n_chunks,
                                 float(radius), bool(exclude_zero_dist))
    cnt, vmax = run(jnp.asarray(queries), jnp.asarray(points),
                    jnp.asarray(values), jnp.asarray(mask), plan.starts)
    q = queries.shape[0]
    return cnt[:q], vmax[:q]


@functools.lru_cache(maxsize=None)
def _tiled_gauss_smooth_stage(q: int, n: int, chunk: int, window: int,
                              n_chunks: int, sigma: float):
    from .neighbors import pairwise_sqdist

    @jax.jit
    def run(queries, points, values, mask, starts):
        def inner(qs, ps, s):
            (qq,) = qs
            p, v, pm = ps
            d2 = pairwise_sqdist(qq, p)
            K = jnp.exp(-0.5 * d2 / (sigma * sigma))
            K = jnp.where((d2 <= 9.0 * sigma * sigma) & pm[None, :], K, 0.0)
            ks = jnp.maximum(jnp.sum(K, axis=1), 1e-12)
            return (K @ v) / ks

        return _map_chunks(inner, (queries,), (points, values, mask),
                           starts, chunk, window, n_chunks)
    return run


def tiled_gaussian_smooth(queries, points, values, mask, plan: TilePlan,
                          sigma: float):
    """Gaussian-weighted mean of neighbor values truncated at 3*sigma --
    the smoothing pass of ops/keypoint_detectors.sift3d, windowed.  The
    query's own value participates when queries == points (d2 == 0 row),
    matching the dense program."""
    run = _tiled_gauss_smooth_stage(queries.shape[0], points.shape[0],
                                    plan.chunk, plan.window, plan.n_chunks,
                                    float(sigma))
    out = run(jnp.asarray(queries), jnp.asarray(points), jnp.asarray(values),
              jnp.asarray(mask), plan.starts)
    return out[:queries.shape[0]]


@functools.lru_cache(maxsize=None)
def _tiled_sift_extrema_stage(q: int, n: int, k: int, chunk: int, window: int,
                              n_chunks: int, radius: float):
    from .neighbors import pairwise_sqdist

    @jax.jit
    def run(queries, points, layers, mask, starts):
        def inner(qs, ps, s):
            (qq,) = qs
            p, lv, pm = ps
            d2 = pairwise_sqdist(qq, p)
            nb = (d2 <= radius * radius) & pm[None, :] & (d2 > 0)
            lo = jnp.min(jnp.where(nb[:, :, None], lv[None, :, :], jnp.inf),
                         axis=(1, 2))
            hi = jnp.max(jnp.where(nb[:, :, None], lv[None, :, :], -jnp.inf),
                         axis=(1, 2))
            return jnp.any(nb, axis=1), lo, hi

        return _map_chunks(inner, (queries,), (points, layers, mask),
                           starts, chunk, window, n_chunks)
    return run


def tiled_sift_extrema(queries, points, layers, mask, plan: TilePlan,
                       radius: float):
    """Per-query (has-neighbor flag, min, max) of the neighbors' DoG values
    across all `layers` columns within `radius`, excluding the query itself
    (d2 > 0) -- the scale-space extremum test of
    ops/keypoint_detectors.sift3d, windowed."""
    run = _tiled_sift_extrema_stage(queries.shape[0], points.shape[0],
                                    layers.shape[1], plan.chunk, plan.window,
                                    plan.n_chunks, float(radius))
    any_nb, lo, hi = run(jnp.asarray(queries), jnp.asarray(points),
                         jnp.asarray(layers), jnp.asarray(mask), plan.starts)
    q = queries.shape[0]
    return any_nb[:q], lo[:q], hi[:q]
