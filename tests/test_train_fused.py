"""The fused one-dispatch training extraction (detect_batch.
_extract_local_features_fused_train, accelerator default) must reproduce
the staged path's training results: same per-cloud feature counts and
keypoint order, near-equal descriptors (dense vs gather formulations
re-associate sums), and identical classification decisions from the
trained model."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import shapes
from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
from point_cloud_donkey_tpu.utils.config import IsmConfig
from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd


CONFIG = {"ObjectConfig": {"Children": {
    "Clustering": {"Type": "None"},
    "Codebook": {"Children": {"ActivationStrategy": {
        "Parameters": {"K": 1}, "Type": "KNN"}}},
    "FeatureWeighting": {"Type": "Uniform"},
    "Features": {"Parameters": {"Radius": 0.6, "ReferenceFrameRadius": 0.5,
                                "ReferenceFrameType": "SHOT"},
                 "Type": "SHOT"},
    "GlobalFeatures": {"Type": "Dummy"},
    "Keypoints": {"Parameters": {"LeafSize": 0.35}, "Type": "VoxelGrid"},
    "Voting": {"Parameters": {"Bandwidth": 0.5, "SingleObjectMode": True,
                              "SingleObjectMaxType": "BandwidthVotes"},
               "Type": "MeanShift"}},
    "Parameters": {"DistanceType": "ChiSquared", "NormalRadius": 0.25,
                   "ConsistentNormalsMethod": 2, "BoundingBoxType": "AABB"}}}


def _train(monkeypatch, fused: bool, tmp, rng_seed=11, n=512, n_models=6):
    monkeypatch.setenv("PCD_TRAIN_FUSED", "1" if fused else "0")
    rng = np.random.default_rng(rng_seed)
    ism = ImplicitShapeModel(IsmConfig.from_json(CONFIG))
    for i in range(n_models):
        cid = i % 3
        pts = shapes.make_instance(rng, cid, n=n, rotate=True, noise=0.005)
        p = os.path.join(tmp, f"{'f' if fused else 's'}{i}.pcd")
        save_pcd(p, PointCloud(xyz=pts))
        ism.add_training_model(p, cid, cid)
    ism.train()
    return ism


def test_fused_training_matches_staged(monkeypatch):
    tmp = tempfile.mkdtemp()
    ism_f = _train(monkeypatch, True, tmp)
    ism_s = _train(monkeypatch, False, tmp)
    cb_f, cb_s = ism_f.state.codebook, ism_s.state.codebook

    # same codeword count and per-codeword vote structure
    assert cb_f.codewords.shape == cb_s.codewords.shape
    # dense vs gather descriptor formulations re-associate sums; the
    # descriptors must agree to high cosine in the SAME order
    a = cb_f.codewords / np.maximum(
        np.linalg.norm(cb_f.codewords, axis=1, keepdims=True), 1e-30)
    b = cb_s.codewords / np.maximum(
        np.linalg.norm(cb_s.codewords, axis=1, keepdims=True), 1e-30)
    cos = (a * b).sum(1)
    assert cos.min() > 0.999

    # identical classification decisions on fresh views
    rng = np.random.default_rng(77)
    ok = 0
    views = [(cid, shapes.make_instance(rng, cid, n=512, rotate=True))
             for cid in (0, 1, 2)]
    for cid, pts in views:
        mf, _ = ism_f.detect(pts)
        ms_, _ = ism_s.detect(pts)
        assert mf and ms_
        assert mf[0].class_id == ms_[0].class_id
        ok += int(mf[0].class_id == cid)
    assert ok >= 2


def test_fused_training_eligibility_gates(monkeypatch):
    from point_cloud_donkey_tpu.models.detect_batch import (
        train_fused_eligible)
    from point_cloud_donkey_tpu.models.features import FeatureConfig
    from point_cloud_donkey_tpu.models.keypoints import KeypointParams
    from point_cloud_donkey_tpu.utils.config import ComponentConfig

    kp = KeypointParams.from_config(
        ComponentConfig(type="VoxelGrid", params={"LeafSize": 0.3}))
    f_ok = FeatureConfig(type="SHOT", radius=0.6, ref_frame_radius=0.5,
                         ref_frame_type="SHOT")
    monkeypatch.setenv("PCD_TRAIN_FUSED", "1")
    assert train_fused_eligible(f_ok, kp, [None], 2)
    # provided normals -> staged
    assert not train_fused_eligible(f_ok, kp, [np.zeros((4, 3))], 2)
    # EMST orientation -> staged
    assert not train_fused_eligible(f_ok, kp, [None], 3)
    # unsupported descriptor -> staged
    f_bad = FeatureConfig(type="FPFH", radius=0.6, ref_frame_radius=0.5)
    assert not train_fused_eligible(f_bad, kp, [None], 2)
    # kill switch
    monkeypatch.setenv("PCD_TRAIN_FUSED", "0")
    assert not train_fused_eligible(f_ok, kp, [None], 2)
