import numpy as np
import pytest

from point_cloud_donkey_tpu.models.ranking import RankingParams, rank_features
from point_cloud_donkey_tpu.models.clustering import ClusteringParams, run_clustering, kmeans


@pytest.fixture
def labeled_features(rng):
    # two well-separated classes in descriptor space (non-negative for chi2)
    a = np.abs(rng.normal(loc=1.0, scale=0.1, size=(40, 16))).astype(np.float32)
    b = np.abs(rng.normal(loc=3.0, scale=0.1, size=(40, 16))).astype(np.float32)
    desc = np.concatenate([a, b])
    cls = np.array([0] * 40 + [1] * 40, np.int32)
    cdist = rng.random(80).astype(np.float32)
    return desc, cls, cdist


def test_uniform_keeps_all(labeled_features):
    desc, cls, cdist = labeled_features
    keep = rank_features(desc, cls, cdist, RankingParams(type="Uniform"))
    assert keep.all()


@pytest.mark.parametrize("rtype", ["NaiveBayes", "Incremental", "KNNActivation",
                                   "Strangeness", "Similarity"])
def test_ranking_keeps_factor_per_class(labeled_features, rtype):
    desc, cls, cdist = labeled_features
    params = RankingParams(type=rtype, factor=0.5, extract_list="front")
    keep = rank_features(desc, cls, cdist, params)
    # each class keeps exactly factor * n features
    for cid in (0, 1):
        kept = keep[cls == cid].sum()
        assert kept == 20, f"{rtype}: kept {kept} of 40 for class {cid}"


def test_extract_positions(labeled_features):
    desc, cls, cdist = labeled_features
    for pos in ("front", "center", "back"):
        keep = rank_features(desc, cls, cdist,
                             RankingParams(type="Incremental", factor=0.25,
                                           extract_list=pos))
        assert keep.sum() == 2 * 10


def test_kmeans_separates_clusters(rng):
    a = rng.normal(loc=0.0, scale=0.05, size=(50, 8))
    b = rng.normal(loc=1.0, scale=0.05, size=(50, 8))
    desc = np.abs(np.concatenate([a, b])).astype(np.float32)
    centers, assign = kmeans(desc, 2, "l2", iterations=50)
    assert centers.shape == (2, 8)
    # all of group a in one cluster, all of b in the other
    assert len(set(assign[:50])) == 1
    assert len(set(assign[50:])) == 1
    assert assign[0] != assign[50]


def test_clustering_dispatch(rng):
    desc = np.abs(rng.normal(size=(30, 8))).astype(np.float32)
    for t, expected in [("None", 30), ("KMeansCount", 10), ("KMeansFactor", 6),
                        ("KMeansThumbRule", 4)]:
        params = ClusteringParams(type=t, cluster_count=10, cluster_factor=0.2)
        centers, idx = run_clustering(desc, params, "l2")
        assert len(centers) == expected, t
        assert idx.shape == (30,)
        assert idx.max() < len(centers)


def test_agglomerative_merges(rng):
    a = np.abs(rng.normal(loc=1.0, scale=0.01, size=(10, 4))).astype(np.float32)
    b = np.abs(rng.normal(loc=5.0, scale=0.01, size=(10, 4))).astype(np.float32)
    desc = np.concatenate([a, b])
    params = ClusteringParams(type="Agglomerative", agglo_threshold=1.2)
    centers, idx = run_clustering(desc, params, "l2")
    # near-identical points merge; the two groups stay apart
    assert len(centers) < 20
    assert len(set(idx[:10]) & set(idx[10:])) == 0


def test_hartigan_picks_k(rng):
    a = rng.normal(loc=0.0, scale=0.05, size=(30, 4))
    b = rng.normal(loc=2.0, scale=0.05, size=(30, 4))
    c = rng.normal(loc=4.0, scale=0.05, size=(30, 4))
    desc = np.abs(np.concatenate([a, b, c])).astype(np.float32)
    params = ClusteringParams(type="KMeansHartigan", max_k=6)
    centers, idx = run_clustering(desc, params, "l2")
    assert 2 <= len(centers) <= 6
