"""Feature ranking ("redundancy-free codebooks", Seib2019B3S).

Reference: feature_ranking/ -- score every training feature, sort per class
ascending, keep the window [offset, offset + factor) of the ranked list
(extractSubsetFromRankedList, feature_ranking.cpp:160-202; ExtractFromList
front/center/back maps to offsets 0 / 0.5*(1-factor) / 1-factor,
feature_ranking.cpp:135-147).  All rankers measure with the chi-square
distance regardless of the configured DistanceType (hardcoded
flann::ChiSquareDistance in every ranker) -- preserved here.

Types:
  * Uniform: keep everything (ranking_uniform.h:19-22).
  * NaiveBayes: score = P(similar | class) / P(similar) with "similar" =
    k-NN within DistanceThreshold (ranking_naive_bayes.cpp).
  * Incremental: for each query, its k nearest neighbors (excluding the
    background distance d_{k+1}) accumulate (d_i - d_{k+1}) on the
    *neighbor's* score (ranking_incremental.cpp).
  * KNNActivation: neighbors accumulate activation counts, optionally scaled
    by exp(|centerDist difference|) and distance-based increment types 1-3
    (ranking_knn_activation.cpp:75-105).
  * Strangeness: score = (sum of kNN distances within own class) /
    (smallest such sum among other classes) (ranking_strangeness.cpp).
  * Similarity: intra-class and inter-class penalty accumulation with
    sigmoid scores, per-list normalization and front/center/back position
    transforms, summed (ranking_similarity.cpp).

All k-NN queries run as exact brute-force distance matmuls.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.neighbors import chi_square_distance_matrix, knn
from ..utils.config import ComponentConfig
from .types import FeatureSet


@dataclass
class RankingParams:
    type: str = "Uniform"
    k_search: int = 10
    dist_thresh: float = 0.1
    factor: float = 0.75
    extract_list: str = "invalid"
    extract_offset: float = 0.0
    use_feature_position: bool = False
    score_increment_type: int = 0
    similarity_update_type: str = "score"
    intra_pos: str = "center"
    inter_pos: str = "front"
    # FLANNExactMatch (implicit_shape_model.cpp:125; rankings honor it at
    # feature_ranking.cpp:340): False = the reference's default approximate
    # search; on accelerators the chi-square kNN then uses the MXU
    # feature-map approximation (CPU always exact).
    flann_exact: bool = False

    @classmethod
    def from_config(cls, cfg: ComponentConfig,
                    flann_exact: bool = False) -> "RankingParams":
        return cls(
            flann_exact=flann_exact,
            type=cfg.type or "Uniform",
            k_search=cfg.get("KSearch", 10),
            dist_thresh=cfg.get("DistanceThreshold", 0.1),
            factor=cfg.get("Factor", 0.75),
            extract_list=cfg.get("ExtractFromList", "invalid"),
            extract_offset=cfg.get("ExtractOffset", 0.0),
            use_feature_position=cfg.get("UseFeaturePosition", False),
            score_increment_type=cfg.get("ScoreIncrementType", 0),
            similarity_update_type=cfg.get("UpdateType", "score"),
            intra_pos=cfg.get("IntraPosition", "center"),
            inter_pos=cfg.get("InterPosition", "front"),
        )

    def resolved_offset(self) -> float:
        if self.extract_list != "invalid":
            if self.extract_list == "front":
                return 0.0
            if self.extract_list in ("center", "middle"):
                return 0.5 * (1.0 - self.factor)
            if self.extract_list == "back":
                return 1.0 - self.factor
        return self.extract_offset


def _knn_chi(queries: np.ndarray, db: np.ndarray, k: int,
             exact: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    k = min(k, db.shape[0])
    d, idx = knn(jnp.asarray(queries), jnp.asarray(db),
                 jnp.ones(db.shape[0], bool), k=k, metric="chisq",
                 exact=exact)
    return np.asarray(d), np.asarray(idx)


def rank_features(
    descriptors: np.ndarray,   # [F, D] all training features
    class_ids: np.ndarray,     # [F]
    center_dists: np.ndarray,  # [F] keypoint-to-centroid distances
    params: RankingParams,
) -> np.ndarray:
    """Returns a keep mask [F].  Scores are computed per the configured
    ranker; per class the ranked window [offset, offset+factor) is kept."""
    f = descriptors.shape[0]
    if params.type == "Uniform" or f == 0:
        return np.ones(f, bool)

    scores = _compute_scores(descriptors, class_ids, center_dists, params)

    keep = np.zeros(f, bool)
    offset = params.resolved_offset()
    for cid in np.unique(class_ids):
        sel = np.nonzero(class_ids == cid)[0]
        order = sel[np.argsort(scores[sel], kind="stable")]  # ascending
        n = len(order)
        lo = max(0.0, n * offset)
        hi = min(float(n), n * (params.factor + offset))
        for j, fi in enumerate(order):
            if lo <= j < hi:
                keep[fi] = True
    return keep


def _compute_scores(desc: np.ndarray, cls: np.ndarray, cdist: np.ndarray,
                    params: RankingParams) -> np.ndarray:
    t = params.type
    if t == "NaiveBayes":
        return _naive_bayes(desc, cls, params)
    if t == "Incremental":
        return _incremental(desc, cls, params)
    if t == "KNNActivation":
        return _knn_activation(desc, cls, cdist, params)
    if t == "Strangeness":
        return _strangeness(desc, cls, params)
    if t == "Similarity":
        return _similarity(desc, cls, params)
    raise ValueError(f"unknown ranking type {t!r}")


def _naive_bayes(desc, cls, params) -> np.ndarray:
    scores = np.zeros(len(desc), np.float32)
    for cid in np.unique(cls):
        own = np.nonzero(cls == cid)[0]
        other = np.nonzero(cls != cid)[0]
        if len(other) == 0:
            scores[own] = 1.0
            continue
        d_own, _ = _knn_chi(desc[own], desc[own], params.k_search,
                             exact=params.flann_exact)
        d_oth, _ = _knn_chi(desc[own], desc[other], params.k_search,
                             exact=params.flann_exact)
        num_pos = (d_own < params.dist_thresh).sum(axis=1).astype(np.float32)
        num_neg = (d_oth < params.dist_thresh).sum(axis=1).astype(np.float32)
        n_cur, n_oth = float(len(own)), float(len(other))
        pos_prob = num_pos / n_cur
        denom = (num_pos + num_neg) / (n_cur + n_oth)
        scores[own] = np.where(denom > 0, pos_prob / np.maximum(denom, 1e-30), 0.0)
    return scores


def _incremental(desc, cls, params) -> np.ndarray:
    scores = np.zeros(len(desc), np.float32)
    d, idx = _knn_chi(desc, desc, params.k_search + 1,
                      exact=params.flann_exact)
    # background distance = the (k+1)-th neighbor at each step
    for q in range(len(desc)):
        for j in range(d.shape[1] - 1):
            scores[idx[q, j]] += d[q, j] - d[q, j + 1]
    return scores


def _knn_activation(desc, cls, cdist, params) -> np.ndarray:
    scores = np.zeros(len(desc), np.float32)
    inc_type = params.score_increment_type
    if inc_type == 0 or inc_type > 3 or inc_type < 1:
        inc_type = 1
    d, idx = _knn_chi(desc, desc, params.k_search + 1,
                      exact=params.flann_exact)
    for q in range(len(desc)):
        for j in range(idx.shape[1] - 1):
            fi = idx[q, j]
            rate = np.exp(abs(cdist[fi] - cdist[q])) if params.use_feature_position else 1.0
            if inc_type == 1:
                scores[fi] += rate
            elif inc_type == 2:
                scores[fi] += rate / (d[q, j] + 1.0)
            else:
                scores[fi] += rate * np.exp(d[q, j])
    return scores


def _strangeness(desc, cls, params) -> np.ndarray:
    scores = np.zeros(len(desc), np.float32)
    classes = np.unique(cls)
    # per-class kNN distance sums for every feature
    sums = np.zeros((len(desc), len(classes)), np.float32)
    for ci, cid in enumerate(classes):
        members = np.nonzero(cls == cid)[0]
        d, _ = _knn_chi(desc, desc[members], params.k_search,
                        exact=params.flann_exact)
        sums[:, ci] = d.sum(axis=1)
    for q in range(len(desc)):
        own_ci = int(np.nonzero(classes == cls[q])[0][0])
        own = sums[q, own_ci]
        others = np.delete(sums[q], own_ci)
        best_other = np.sort(others)[0] if len(others) else 1.0
        scores[q] = own / max(best_other, 1e-30)
    return scores


def _sigmoid_score(distance: np.ndarray) -> np.ndarray:
    """2 * (1/(1+exp(-d)) - 0.5) (ranking_similarity.cpp:303-310)."""
    return 2.0 * (1.0 / (1.0 + np.exp(-distance)) - 0.5)


def _similarity(desc, cls, params) -> np.ndarray:
    n = len(desc)
    intra = np.zeros(n, np.float32)
    inter = np.zeros(n, np.float32)
    ut = params.similarity_update_type

    def update_value(dist):
        if ut == "count":
            return np.ones_like(dist)
        if ut == "dist":
            return -dist
        return -_sigmoid_score(dist)

    for cid in np.unique(cls):
        own = np.nonzero(cls == cid)[0]
        other = np.nonzero(cls != cid)[0]
        d_own, i_own = _knn_chi(desc[own], desc[own], params.k_search,
                                exact=params.flann_exact)
        upd = update_value(d_own)
        np.add.at(intra, own[i_own.reshape(-1)], upd.reshape(-1))
        if len(other):
            k_other = min(100, len(other))
            d_oth, i_oth = _knn_chi(desc[own], desc[other], k_other,
                                    exact=params.flann_exact)
            upd_o = update_value(d_oth)
            np.add.at(inter, other[i_oth.reshape(-1)], upd_o.reshape(-1))

    def transform(arr, pos):
        out = arr.copy()
        for cid in np.unique(cls):
            sel = np.nonzero(cls == cid)[0]
            vals = out[sel]
            if ut in ("score", "dist"):
                mn = vals.min()
                vals = np.where(vals == 0, mn * 1.1, vals)
            mn, mx = vals.min(), vals.max()
            rng_lo = abs(mx) + abs(mn) if mn < 0 else abs(mx) - abs(mn)
            rng_lo = rng_lo if rng_lo != 0 else 1.0
            if mn < 0:
                vals = (vals + abs(mn)) / rng_lo
            else:
                vals = (vals - abs(mn)) / rng_lo
            if pos == "back":
                vals = np.abs(vals - 1.0)
            elif pos == "center":
                median = np.sort(vals)[len(vals) // 2]
                vals = np.abs(vals - median)
            out[sel] = vals
        return out

    intra = transform(intra, params.intra_pos)
    inter = transform(inter, params.inter_pos)
    return intra + inter
