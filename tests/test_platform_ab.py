"""Tests for the platform-divergence A/B instrument (platform_ab.py) and
the pallas probe disk cache."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import platform_ab  # noqa: E402  (repo root)


def _dump(path, scores, desc, labels, vote_w=None):
    v, k, d = desc.shape
    t = 8
    np.savez_compressed(
        path,
        scores=scores,
        keypoints=np.zeros((v, k, 3), np.float32),
        descriptors=desc,
        desc_valid=np.ones((v, k), bool),
        vote_position=np.zeros((v, t, 3), np.float32),
        vote_weight=vote_w if vote_w is not None else np.ones((v, t), np.float32),
        vote_class=np.zeros((v, t), np.int32),
        vote_valid=np.ones((v, t), bool),
        labels=labels,
        platform=np.asarray("testA"),
        device=np.asarray("dev"))


def test_compare_identical_dumps(tmp_path):
    rng = np.random.default_rng(0)
    scores = rng.uniform(1, 10, size=(4, 3)).astype(np.float32)
    desc = rng.normal(size=(4, 6, 5)).astype(np.float32)
    labels = scores.argmax(1)
    a = str(tmp_path / "a.npz")
    b = str(tmp_path / "b.npz")
    _dump(a, scores, desc, labels)
    _dump(b, scores, desc, labels)
    rep = platform_ab.compare(a, b)
    assert rep["argmax_flips"] == []
    assert rep["accuracy_a"] == rep["accuracy_b"] == 1.0
    assert rep["stages"]["descriptors"]["max_abs_delta"] == 0.0
    assert rep["stages"]["scores"]["max_abs_delta"] == 0.0
    assert rep["decision_margin"]["min_per_view_margin_over_delta"] > 1.0


def test_compare_detects_flip_and_deltas(tmp_path):
    rng = np.random.default_rng(1)
    scores = rng.uniform(1, 10, size=(4, 3)).astype(np.float32)
    desc = rng.normal(size=(4, 6, 5)).astype(np.float32)
    labels = scores.argmax(1)
    scores_b = scores.copy()
    # flip view 2's decision and perturb descriptors slightly
    scores_b[2, labels[2]] = scores_b[2].min() - 1.0
    desc_b = desc + 1e-3
    a = str(tmp_path / "a.npz")
    b = str(tmp_path / "b.npz")
    _dump(a, scores, desc, labels)
    _dump(b, scores_b, desc_b, labels)
    rep = platform_ab.compare(a, b)
    assert rep["argmax_flips"] == [2]
    assert rep["accuracy_a"] == 1.0 and rep["accuracy_b"] == 0.75
    d = rep["stages"]["descriptors"]["max_abs_delta"]
    assert 0.9e-3 < d < 1.1e-3


def test_classify_intermediates_matches_classify_scores():
    """classify_scores delegates to classify_intermediates; pin the
    equivalence end-to-end anyway (the A/B's validity rests on it)."""
    import jax
    import jax.numpy as jnp

    import shapes
    from point_cloud_donkey_tpu.models.codebook import CodebookParams
    from point_cloud_donkey_tpu.models.pipeline_jit import (
        JitPipelineConfig, classify_intermediates, classify_scores)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "_graft", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    rng = np.random.default_rng(3)
    pts = shapes.make_instance(rng, 1, n=512, rotate=False)
    mask = np.ones(len(pts), bool)
    cfg = JitPipelineConfig(keypoint_capacity=128, num_classes=5)
    cb = graft._synthetic_codebook(dim=352, num_classes=5)
    params = CodebookParams(knn_k=1)
    s1 = jax.jit(lambda p, m: classify_scores(p, m, cb, cfg, params))(
        jnp.asarray(pts), jnp.asarray(mask))
    out = jax.jit(lambda p, m: classify_intermediates(p, m, cb, cfg, params))(
        jnp.asarray(pts), jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(out.scores))
    assert out.descriptors.shape[0] == cfg.keypoint_capacity


def test_pallas_probe_disk_cache(tmp_path, monkeypatch):
    """A conclusive cached verdict short-circuits the subprocess probe."""
    from point_cloud_donkey_tpu.ops import pallas as pallas_mod

    monkeypatch.setenv("HOME", str(tmp_path))
    path = pallas_mod._probe_cache_path()
    assert str(tmp_path) in path
    os.makedirs(os.path.dirname(path), exist_ok=True)

    def boom(*a, **k):  # any subprocess attempt = cache miss = test failure
        raise AssertionError("subprocess probe ran despite cached verdict")

    import subprocess
    monkeypatch.setattr(subprocess, "run", boom)
    with open(path, "w") as f:
        f.write("ok")
    assert pallas_mod.probe_pallas() is True
    with open(path, "w") as f:
        f.write("crash")
    assert pallas_mod.probe_pallas() is False
