"""Neighborhood primitives, TPU-first.

The reference does per-point kd-tree radius searches (PCL kd-trees everywhere,
e.g. features/features_short_shot.cpp:85-123).  On TPU the speed-of-light
formulation is *dense masked reductions*: pairwise squared distances come from
one matmul on the MXU, and radius-weighted moments (counts, means, covariance)
are accumulated with further matmuls -- no gathers, no dynamic shapes.

For per-neighbor histogram kernels (SHOT et al.) we additionally provide a
fixed-capacity top-k neighbor gather, so the histogram stage works on a
[K, M] block instead of [K, N].

All functions take explicit validity masks and are jit-friendly.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def pairwise_sqdist(queries: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances [Q, N] via the (q^2 + p^2 - 2 q.p) matmul
    identity (MXU-friendly).  Clamped at 0 against rounding.

    Uses HIGHEST matmul precision: the TPU default (bf16 passes) rounds inputs
    to ~3 decimal digits, which corrupts nearest-neighbor ordering and radius
    gates; the fp32-accurate 6-pass mode keeps geometry exact."""
    q2 = jnp.sum(queries * queries, axis=1)[:, None]
    p2 = jnp.sum(points * points, axis=1)[None, :]
    cross = jnp.matmul(queries, points.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(q2 + p2 - 2.0 * cross, 0.0)


class RadiusMoments(NamedTuple):
    """Weighted neighborhood moments for a chunk of queries."""
    count: jnp.ndarray    # [Q] number of in-radius valid neighbors
    wsum: jnp.ndarray     # [Q] sum of weights
    mean: jnp.ndarray     # [Q, 3] weighted neighbor mean
    cov: jnp.ndarray      # [Q, 3, 3] weighted covariance about the query/mean


def radius_covariance(
    queries: jnp.ndarray,        # [Q, 3]
    points: jnp.ndarray,         # [N, 3]
    mask: jnp.ndarray,           # [N]
    radius: float,
    weighting: str = "uniform",  # "uniform" (PCL normals) | "shot" (R - d)
    center: str = "mean",        # covariance about neighbor "mean" or "query"
) -> RadiusMoments:
    """Radius-limited weighted covariance, computed without materializing
    [Q, N, 3] difference tensors:

      cov = S2 - c s1^T - s1 c^T + S0 c c^T   (c = chosen center)

    with S0 = sum w, s1 = sum w x, S2 = sum w x x^T -- each an MXU matmul.

    * PCL NormalEstimation uses uniform weights about the neighbor mean.
    * PCL SHOT LRF uses weights (R - d) about the query point
      (pcl::SHOTLocalReferenceFrameEstimation::getLocalRF).
    """
    # shift to the cloud centroid first: covariance is shift-invariant and the
    # moment identity below cancels catastrophically for far-from-origin data
    m = mask.astype(points.dtype)
    shift = jnp.sum(points * m[:, None], axis=0) / jnp.maximum(m.sum(), 1.0)
    points = points - shift
    queries = queries - shift

    d2 = pairwise_sqdist(queries, points)
    in_r = (d2 <= radius * radius) & mask[None, :]
    if weighting == "uniform":
        w = in_r.astype(points.dtype)
    elif weighting == "shot":
        d = jnp.sqrt(d2)
        w = jnp.where(in_r, radius - d, 0.0).astype(points.dtype)
    else:
        raise ValueError(f"unknown weighting {weighting}")

    hi = jax.lax.Precision.HIGHEST
    count = jnp.sum(in_r, axis=1)
    s0 = jnp.sum(w, axis=1)                                   # [Q]
    s1 = jnp.matmul(w, points, precision=hi)                  # [Q, 3]
    xx = (points[:, :, None] * points[:, None, :]).reshape(-1, 9)  # [N, 9]
    s2 = jnp.matmul(w, xx, precision=hi).reshape(-1, 3, 3)    # [Q, 3, 3]

    s0_safe = jnp.maximum(s0, 1e-30)
    if center == "mean":
        c = s1 / s0_safe[:, None]
    elif center == "query":
        c = queries
    else:
        raise ValueError(f"unknown center {center}")

    cov = (
        s2
        - c[:, :, None] * s1[:, None, :]
        - s1[:, :, None] * c[:, None, :]
        + s0[:, None, None] * c[:, :, None] * c[:, None, :]
    )
    cov = cov / s0_safe[:, None, None]
    mean = s1 / s0_safe[:, None] + shift  # undo the conditioning shift
    return RadiusMoments(count=count, wsum=s0, mean=mean, cov=cov)


class NeighborBlock(NamedTuple):
    """Fixed-capacity neighbor gather result."""
    idx: jnp.ndarray    # [Q, M] neighbor indices into points (0 where invalid)
    dist: jnp.ndarray   # [Q, M] euclidean distances (inf where invalid)
    valid: jnp.ndarray  # [Q, M] bool


def gather_radius_neighbors(
    queries: jnp.ndarray,   # [Q, 3]
    points: jnp.ndarray,    # [N, 3]
    mask: jnp.ndarray,      # [N]
    radius: float,
    capacity: int,
    exclude_zero_dist: bool = False,
) -> NeighborBlock:
    """Gather up to `capacity` nearest in-radius neighbors per query, sorted by
    ascending distance (the order PCL radiusSearch returns).  If more than
    `capacity` neighbors fall inside the radius, the farthest are dropped --
    size the capacity so this never matters for parity workloads."""
    d2 = pairwise_sqdist(queries, points)
    in_r = (d2 <= radius * radius) & mask[None, :]
    neg = jnp.where(in_r, -d2, -jnp.inf)
    cap = min(capacity, points.shape[0])
    top_negd2, idx = jax.lax.top_k(neg, cap)  # descending neg -> ascending d2
    valid = jnp.isfinite(top_negd2)
    # Recompute exact distances on the gathered block via direct differences:
    # the matmul identity leaves ~eps*|p|^2 absolute error in d2, which would
    # break the reference's exact zero-distance self-exclusion
    # (e.g. features_short_shot.cpp:127 tests squared dist > 1e-15).
    diff = points[idx] - queries[:, None, :]
    d2_exact = jnp.sum(diff * diff, axis=-1)
    valid = valid & (d2_exact <= radius * radius)
    if exclude_zero_dist:
        valid = valid & (d2_exact > 1e-15)
    dist = jnp.where(valid, jnp.sqrt(d2_exact), jnp.inf)
    idx = jnp.where(valid, idx, 0)
    return NeighborBlock(idx=idx, dist=dist, valid=valid)


def knn(
    queries: jnp.ndarray,   # [Q, D]
    database: jnp.ndarray,  # [C, D]
    db_mask: jnp.ndarray,   # [C]
    k: int,
    metric: str = "l2",
    exact: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Brute-force k-NN over descriptor space on the MXU.

    Replaces FLANN kd-tree indices (utils/flann_helper.cpp:21-80) -- exact by
    construction for "l2" and for "chisq" with exact=True.

    metric "l2" returns *squared* L2 (flann::L2 semantics) and "chisq" returns
    flann::ChiSquareDistance: sum (a-b)^2 / (a+b) over dims with a+b > 0.

    exact=False is the TPU analog of the reference's default APPROXIMATE
    FLANN search (FLANNExactMatch=false, SearchParams(128) kd-tree probing,
    implicit_shape_model.cpp:125): for the chi-square metric on accelerator
    backends it switches to the explicit-feature-map matmul
    (chi_square_distance_matrix_approx; 99.7% top-1 agreement, ~0.25% mean
    distance error on real SHOT descriptors -- within the recall regime of
    FLANN's own approximate search), which runs on the MXU instead of a
    division-bound VPU loop.  CPU always stays exact so test goldens are
    platform-stable; "l2" is a single matmul either way.

    Returns (distances [Q, k], indices [Q, k]); masked database entries get
    +inf distance.
    """
    if metric == "l2":
        d = pairwise_sqdist(queries, database)
    elif metric == "chisq":
        if not exact and jax.default_backend() not in ("cpu", "gpu"):
            d = chi_square_distance_matrix_approx(queries, database)
        else:
            d = chi_square_distance_matrix(queries, database)
    else:
        raise ValueError(f"unknown metric {metric}")
    d = jnp.where(db_mask[None, :], d, jnp.inf)
    neg_d, idx = jax.lax.top_k(-d, k)
    return -neg_d, idx


# Vedaldi & Zisserman (PAMI 2012) explicit feature map for the additive
# chi-square kernel: defaults tuned on real SHOT descriptors (n=5, L=0.4:
# top-1 agreement 99.75%, mean |d_hat - d|/d = 2.5e-3, max 1.4e-2).
CHI2_MAP_N = 5
CHI2_MAP_L = 0.4


def chi2_feature_map(x: jnp.ndarray, n: int = CHI2_MAP_N,
                     L: float = CHI2_MAP_L) -> jnp.ndarray:
    """Explicit feature map Psi with Psi(x) . Psi(y) ~= sum_i 2 x y/(x+y)
    (the additive chi-square kernel), Vedaldi & Zisserman PAMI 2012:
    Psi_0 = sqrt(L x), Psi_{2j-1,2j} = sqrt(2 L x sech(pi j L)) *
    (cos, sin)(j L log x).  x must be non-negative (histograms); x=0 maps
    to 0 exactly.  [..., D] -> [..., D*(2n+1)].

    cos/sin(j L log x) for j = 2..n come from the angle-addition
    recurrence off (cos, sin)(L log x) -- 2 transcendentals per element
    instead of 2n (the map build was 4.5 ms of the serving batch's votes
    stage on v5e; the recurrence is algebraically exact, fp drift ~1e-7
    over n=5 steps, far below the map's own truncation error)."""
    import math
    x = jnp.maximum(x, 0.0)
    lg = jnp.where(x > 0, jnp.log(jnp.maximum(x, 1e-30)), 0.0)
    sx = jnp.sqrt(x)
    comps = [sx * math.sqrt(L)]
    theta = L * lg
    c1, s1 = jnp.cos(theta), jnp.sin(theta)
    cj, sj = c1, s1
    for j in range(1, n + 1):
        if j > 1:
            cj, sj = cj * c1 - sj * s1, sj * c1 + cj * s1
        r = sx * math.sqrt(2.0 * L / math.cosh(math.pi * j * L))
        comps.append(r * cj)
        comps.append(r * sj)
    return jnp.concatenate(comps, axis=-1)


def chi_square_distance_matrix_approx(a: jnp.ndarray,
                                      b: jnp.ndarray) -> jnp.ndarray:
    """flann::ChiSquareDistance matrix via the identity
    d(x, y) = |x|_1 + |y|_1 - 2 k_chi2(x, y) and the explicit feature map:
    ONE MXU matmul [Q, D'] @ [D', C] instead of a division-bound VPU loop
    over [Q, C, D]: measured on v5e at [6144, 785, 352] 8.9 ms (exact VPU
    path) -> 2.9 ms, top-1 agreement 1.00 (0.996 at C=4096).  Precision
    HIGH (3-pass bf16): measured identical top-1/relative error to HIGHEST
    here -- the feature-map truncation (n=5) dominates the error, not the
    matmul -- at ~1.5x the speed.  Clamped at 0 (the approximation can dip
    epsilon-negative for near-identical inputs; downstream takes sqrt).

    PCD_CHI2_PREC=default|high|highest overrides the matmul precision
    (read at trace time).  DEFAULT (1 bf16 pass) measured on real SHOT
    descriptors vs the 458-codeword bench codebook: top-1 agreement with
    EXACT chi2 0.9972 vs 0.9987 at HIGH (experiments/r6_votes.py) --
    within the reference's own approximate-FLANN regime, but kept opt-in
    because HIGH's cost is no longer the stage bottleneck after the
    tile-compaction (votes stage ~2.5 ms/batch)."""
    import os
    hi = {"default": jax.lax.Precision.DEFAULT,
          "high": jax.lax.Precision.HIGH,
          "highest": jax.lax.Precision.HIGHEST}[
              os.environ.get("PCD_CHI2_PREC", "high").lower()]
    fa = chi2_feature_map(a)
    fb = chi2_feature_map(b)
    k2 = jax.lax.dot_general(fa, fb, (((1,), (1,)), ((), ())), precision=hi)
    d = jnp.sum(a, axis=-1)[:, None] + jnp.sum(b, axis=-1)[None, :] - 2.0 * k2
    return jnp.maximum(d, 0.0)


def chi_square_distance_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """flann::ChiSquareDistance matrix: d(x,y) = sum_i (x_i-y_i)^2/(x_i+y_i),
    terms with x_i+y_i <= 0 skipped.  O(Q*C*D) on the VPU; query-chunked via
    lax.map to bound the [chunk, C, D] intermediate.

    The optimization_barrier pins the (possibly scatter-built) inputs in
    memory: without it XLA fuses the producers into every chunk of the loop
    and recomputes them per chunk (measured 20x blowup on the serving path).

    PCD_PALLAS_CHISQ=1 routes to the VMEM-streaming Pallas kernel
    (ops/pallas/chisq.py) instead.  It is NOT auto-enabled: measured on v5e
    it only ties XLA (9.1 vs 8.9 ms at [6144, 785, 352]; the op is
    VPU-division-bound, not HBM-bound, so streaming does not help), and the
    MXU feature-map approximation (chi_square_distance_matrix_approx, the
    FLANNExactMatch=false default) is the path that actually wins (2.9 ms).
    """
    import os
    if os.environ.get("PCD_PALLAS_CHISQ") == "1":
        from .pallas.chisq import chi_square_distance_matrix_pallas
        return chi_square_distance_matrix_pallas(a, b)
    a, b = jax.lax.optimization_barrier((a, b))
    q, c = a.shape[0], b.shape[0]
    dim = a.shape[1]
    # chunk over queries so the intermediate stays ~16M elements
    chunk = max(1, min(q, max(1, (1 << 24) // max(c * dim, 1))))
    pad = (-q) % chunk
    a_pad = jnp.pad(a, ((0, pad), (0, 0)))

    def one_chunk(asub):
        s = asub[:, None, :] + b[None, :, :]
        diff = asub[:, None, :] - b[None, :, :]
        return jnp.sum(
            jnp.where(s > 0, diff * diff / jnp.where(s > 0, s, 1.0), 0.0),
            axis=-1)

    chunks = a_pad.reshape(-1, chunk, dim)
    out = jax.lax.map(one_chunk, chunks).reshape(-1, c)
    return out[:q]


def descriptor_distance(a: jnp.ndarray, b: jnp.ndarray, metric: str) -> jnp.ndarray:
    """Pairwise-free distance between two equal-shaped descriptor batches
    ([..., D] x [..., D] -> [...]).  Same metric semantics as :func:`knn`."""
    if metric == "l2":
        diff = a - b
        return jnp.sum(diff * diff, axis=-1)
    elif metric == "chisq":
        s = a + b
        diff = a - b
        return jnp.sum(jnp.where(s > 0, diff * diff / jnp.where(s > 0, s, 1.0), 0.0), axis=-1)
    raise ValueError(f"unknown metric {metric}")


def chi_square_distance_np(a, b, chunk_elems: int = 1 << 24):
    """Host-numpy flann::ChiSquareDistance matrix (terms with a_i+b_i <= 0
    skipped), row-chunked so the [chunk, B, D] broadcast temporaries stay
    ~chunk_elems elements (the naive full broadcast is A*B*D*4 bytes --
    tens of GB for a few thousand global descriptors).  Shared by the host
    SVM kernel and the codebook class-sigma estimate."""
    import numpy as np
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    A, D = a.shape
    B = b.shape[0]
    out = np.empty((A, B), np.float32)
    rows = max(1, min(A, chunk_elems // max(B * D, 1)))
    for i0 in range(0, A, rows):
        ab = a[i0:i0 + rows, None, :]
        diff2 = (ab - b[None, :, :]) ** 2
        s = ab + b[None, :, :]
        out[i0:i0 + rows] = np.where(
            s > 0, diff2 / np.where(s > 0, s, 1.0), 0.0).sum(axis=2)
    return out
