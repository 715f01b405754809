"""Descriptor clustering to codewords.

Reference: clustering/ -- types None / Agglomerative / KMeansCount /
KMeansFactor / KMeansThumbRule / KMeansHartigan (clustering_factory.h:25-41).

  * None: every feature is its own codeword (clustering_none.cpp:37-44).
  * KMeans*: the reference runs flann::hierarchicalClustering then assigns
    each feature to its nearest center (clustering_kmeans.h:53-131).  Here:
    deterministic k-means++ seeding + jit-compiled Lloyd iterations on the
    MXU + exact 1-NN assignment.
  * KMeansCount: k = ClusterCount (default 10); KMeansFactor: k =
    ClusterFactor * n (default 0.2); KMeansThumbRule: k = round(sqrt(n/2));
    KMeansHartigan: pick k in [1, MaxK] maximizing Hartigan's index
    ((W_k/W_{k+1} - 1) * (n - k - 1), clustering_kmeans_hartigan.cpp:42-77).
  * Agglomerative: average-linkage merging while similarity = 1/min_dist >=
    Threshold (default 1.2, clustering_agglomerative.cpp:17-80); host-side
    (inherently sequential; off the default hot path).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.neighbors import chi_square_distance_matrix, knn, pairwise_sqdist
from ..utils.config import ComponentConfig


@dataclass
class ClusteringParams:
    type: str = "None"
    cluster_count: int = 10
    cluster_factor: float = 0.2
    max_k: int = 10
    iterations: int = 1000
    agglo_threshold: float = 1.2

    @classmethod
    def from_config(cls, cfg: ComponentConfig) -> "ClusteringParams":
        return cls(
            type=cfg.type or "None",
            cluster_count=cfg.get("ClusterCount", 10),
            cluster_factor=cfg.get("ClusterFactor", 0.2),
            max_k=cfg.get("MaxK", 10),
            iterations=cfg.get("Iterations", 1000),
            agglo_threshold=cfg.get("Threshold", 1.2),
        )


def _dist_matrix(a: jnp.ndarray, b: jnp.ndarray, metric: str) -> jnp.ndarray:
    if metric == "l2":
        return pairwise_sqdist(a, b)
    return chi_square_distance_matrix(a, b)


def kmeans(descriptors: np.ndarray, k: int, metric: str,
           iterations: int = 100, seed: int = 0
           ) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic k-means: k-means++ seeding + Lloyd iterations.
    Returns (centers [k, D], assignment [N])."""
    n, d = descriptors.shape
    k = min(k, n)
    x = jnp.asarray(descriptors)

    # --- k-means++ seeding (deterministic PRNG) -----------------------------
    key = jax.random.PRNGKey(seed)
    first = jax.random.randint(key, (), 0, n)
    centers0 = jnp.zeros((k, d), x.dtype).at[0].set(x[first])

    def seed_body(i, state):
        centers, key = state
        dmat = _dist_matrix(x, centers, metric)  # [N, k]
        mask = jnp.arange(k) < i
        dmin = jnp.min(jnp.where(mask[None, :], dmat, jnp.inf), axis=1)
        key, sub = jax.random.split(key)
        probs = dmin / jnp.maximum(dmin.sum(), 1e-30)
        nxt = jax.random.choice(sub, n, p=probs)
        return centers.at[i].set(x[nxt]), key

    centers, _ = jax.lax.fori_loop(1, k, seed_body, (centers0, key))

    # --- Lloyd iterations ----------------------------------------------------
    def lloyd(_, centers):
        dmat = _dist_matrix(x, centers, metric)
        assign = jnp.argmin(dmat, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)  # [N, k]
        counts = onehot.sum(axis=0)
        sums = jnp.einsum("nk,nd->kd", onehot, x)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where((counts > 0)[:, None], new, centers)

    iters = min(iterations, 100)
    centers = jax.lax.fori_loop(0, iters, lloyd, centers)
    assign = jnp.argmin(_dist_matrix(x, centers, metric), axis=1)
    return np.asarray(centers), np.asarray(assign)


def agglomerative(descriptors: np.ndarray, metric: str,
                  threshold: float) -> Tuple[np.ndarray, np.ndarray]:
    """Average-linkage agglomerative clustering, merging while the similarity
    1/min_pair_distance >= threshold.  Cluster distance = distance between
    cluster mean descriptors (host-side)."""
    n = descriptors.shape[0]
    centers = [descriptors[i].copy() for i in range(n)]
    members = [[i] for i in range(n)]

    def dist(a, b):
        if metric == "l2":
            return float(((a - b) ** 2).sum())
        s = a + b
        diff = a - b
        return float(np.where(s > 0, diff * diff / np.where(s > 0, s, 1), 0).sum())

    while len(centers) > 1:
        best = (np.inf, -1, -1)
        for i in range(len(centers)):
            for j in range(len(centers)):
                if i == j:
                    continue
                dd = dist(centers[i], centers[j])
                if dd < best[0]:
                    best = (dd, i, j)
        min_dist, i, j = best
        if min_dist <= 0 or 1.0 / min_dist < threshold:
            break
        new_members = members[i] + members[j]
        new_center = descriptors[new_members].mean(axis=0)
        for idx in sorted((i, j), reverse=True):
            del centers[idx], members[idx]
        centers.append(new_center)
        members.append(new_members)

    assign = np.zeros(n, np.int32)
    for ci, mem in enumerate(members):
        for m in mem:
            assign[m] = ci
    return np.stack(centers).astype(np.float32), assign


def run_clustering(descriptors: np.ndarray, params: ClusteringParams,
                   metric: str) -> Tuple[np.ndarray, np.ndarray]:
    """Dispatch by Type.  Returns (cluster centers, per-feature indices);
    Type None returns the features themselves with identity assignment
    (clustering_none.cpp:37-44)."""
    n = descriptors.shape[0]
    t = params.type
    if t == "None" or n == 0:
        return descriptors.copy(), np.arange(n, dtype=np.int32)
    if t == "Agglomerative":
        return agglomerative(descriptors, metric, params.agglo_threshold)
    if t == "KMeansCount":
        return kmeans(descriptors, params.cluster_count, metric, params.iterations)
    if t == "KMeansFactor":
        k = max(1, int(params.cluster_factor * n))
        return kmeans(descriptors, k, metric, params.iterations)
    if t == "KMeansThumbRule":
        k = max(1, int(round(math.sqrt(n / 2.0))))
        return kmeans(descriptors, k, metric, params.iterations)
    if t == "KMeansHartigan":
        max_k = min(params.max_k, n)
        results = []
        disps = []
        for k in range(1, max_k + 1):
            c, a = kmeans(descriptors, k, metric, params.iterations)
            results.append((c, a))
            d = descriptors - c[a]
            if metric == "l2":
                disps.append(float((d * d).sum()))
            else:
                s = descriptors + c[a]
                disps.append(float(np.where(s > 0, d * d / np.where(s > 0, s, 1), 0).sum()))
        best_k, best_val = 1, 0.0
        for i in range(max_k - 1):
            denom = disps[i + 1] if disps[i + 1] > 0 else 1e-30
            idx = (disps[i] / denom - 1.0) * (n - (i + 1) - 1)
            if idx > best_val:
                best_val = idx
                best_k = i + 1
        return results[best_k - 1]
    raise ValueError(f"unknown clustering type {t!r}")
