"""Global verification: SVM + KNN classifiers and merge functions."""
import os
import numpy as np
import pytest

import shapes
from point_cloud_donkey_tpu.models.svm import train_svm, SVMModel, chi2_matrix
from point_cloud_donkey_tpu.models.classifier import merge_global_and_local
from point_cloud_donkey_tpu.models.voting import VotingMaximum, VotingParams
from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
from point_cloud_donkey_tpu.utils.config import IsmConfig
from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd


def make_svm_data(rng, n_per=15):
    a = np.abs(rng.normal(1.0, 0.15, (n_per, 8))).astype(np.float32)
    b = np.abs(rng.normal(2.5, 0.15, (n_per, 8))).astype(np.float32)
    c = np.abs(rng.normal(4.0, 0.15, (n_per, 8))).astype(np.float32)
    data = np.concatenate([a, b, c])
    labels = np.repeat([0, 1, 2], n_per)
    return data, labels


@pytest.mark.parametrize("one_vs_all", [False, True])
def test_svm_separable(rng, one_vs_all):
    data, labels = make_svm_data(rng)
    model = train_svm(data, labels, one_vs_all=one_vs_all, auto_train=False,
                      param_c=10.0, param_gamma=1.0)
    correct = 0
    for i in range(len(data)):
        label, score, all_scores = model.predict(data[i])
        correct += int(label == labels[i])
        assert len(all_scores) == 3
    assert correct / len(data) > 0.9, f"train acc {correct}/{len(data)}"


def test_svm_roundtrip(rng, tmp_path):
    data, labels = make_svm_data(rng)
    model = train_svm(data, labels, one_vs_all=True, auto_train=False,
                      param_c=10.0, param_gamma=1.0)
    np.savez(tmp_path / "svm.npz", **model.to_arrays())
    z = np.load(tmp_path / "svm.npz")
    model2 = SVMModel.from_arrays(z)
    for i in range(0, len(data), 7):
        l1, s1, _ = model.predict(data[i])
        l2, s2, _ = model2.predict(data[i])
        assert l1 == l2 and abs(s1 - s2) < 1e-6


def _maxima():
    m1 = VotingMaximum(class_id=1, instance_id=1, weight=0.6,
                       position=np.zeros(3, np.float32))
    m1.glob_class_id = 2; m1.glob_class_weight = 0.9
    m1.glob_instance_id = 2; m1.glob_instance_weight = 0.9
    m2 = VotingMaximum(class_id=2, instance_id=2, weight=0.4,
                       position=np.zeros(3, np.float32))
    m2.glob_class_id = 2; m2.glob_class_weight = 0.9
    m2.glob_instance_id = 2; m2.glob_instance_weight = 0.9
    return [m1, m2]


def test_merge_function_1():
    maxima = _maxima()
    p = VotingParams(merge_function=1, min_svm_score=0.7, single_object_mode=True)
    merge_global_and_local(maxima, p, np.zeros(3, np.float32))
    assert maxima[0].class_id == 2  # blind belief in good global score


def test_merge_function_3_rate_gate():
    maxima = _maxima()
    p = VotingParams(merge_function=3, rate_limit=0.6, single_object_mode=True)
    merge_global_and_local(maxima, p, np.zeros(3, np.float32))
    # global class 2 is among top classes (0.4 >= 0.6*0.6) -> switch
    assert maxima[0].class_id == 2


def test_merge_function_7_tconorm():
    maxima = _maxima()
    maxima[1].glob_class_id = 2
    p = VotingParams(merge_function=7, single_object_mode=True)
    merge_global_and_local(maxima, p, np.zeros(3, np.float32))
    # m2: class==glob -> S(0.4, 0.9) = 0.4+0.9-0.36 = 0.94
    assert abs(maxima[1].weight - 0.94) < 1e-6


def test_roi_radius_is_mean_training_global_radius(rng, tmp_path):
    """segmentROI uses the per-class MEAN of the training global features'
    globalDescriptorRadius (global_classifier.cpp:55-67, applied at :147) --
    NOT the median-bbox dimension (that one is only for maxima search radii,
    maxima_handler.cpp:509-522).  Pins the round-2 divergence fix."""
    config = {
        "ObjectConfig": {
            "Children": {
                "Clustering": {"Type": "None"},
                "Codebook": {"Children": {"ActivationStrategy": {
                    "Parameters": {"K": 1}, "Type": "KNN"}}},
                "FeatureWeighting": {"Type": "Uniform"},
                "Features": {"Parameters": {
                    "Radius": 0.6, "ReferenceFrameRadius": 0.5},
                    "Type": "SHORT_SHOT"},
                "GlobalFeatures": {"Type": "ESF"},
                "Keypoints": {"Parameters": {"LeafSize": 0.35},
                              "Type": "VoxelGrid"},
                "Voting": {"Parameters": {
                    "Bandwidth": 0.5, "UseGlobalFeatures": True,
                    "GlobalFeaturesStrategy": "KNN"},
                    "Type": "MeanShift"},
            },
            "Parameters": {"DistanceType": "ChiSquared",
                           "BoundingBoxType": "AABB"},
        }
    }
    ism = ImplicitShapeModel(IsmConfig.from_json(config))
    for cid in range(2):
        for j in range(2):
            # scale instances differently so mean-radius != any single radius
            pts = shapes.make_instance(rng, cid, n=600) * (1.0 + 0.5 * j)
            p = str(tmp_path / f"t{cid}_{j}.pcd")
            save_pcd(p, PointCloud(xyz=pts))
            ism.add_training_model(p, cid, cid)
    ism.train()

    from point_cloud_donkey_tpu.models.ism import _voting_params
    gc = ism._global_classifier(_voting_params(ism.config.child("Voting")))
    gcls = np.asarray(ism.state.global_classes)
    grad = np.asarray(ism.state.global_radii)
    for cid in (0, 1):
        expected = float(grad[gcls == cid].mean())
        assert gc.average_radii[cid] == pytest.approx(expected, rel=1e-6)
        # and it is NOT the old (buggy) median-bbox quantity
        bbox_median = ism.state.dims_map[cid][1]
        assert abs(gc.average_radii[cid] - bbox_median) > 1e-3

    # the radius choice changes a verification outcome: a maximum sitting at
    # the object center segments a different ROI under the two radii
    pts = shapes.make_instance(rng, 0, n=600) * 1.5
    center = pts.mean(axis=0).astype(np.float32)
    m = VotingMaximum(class_id=0, position=center)
    seg_correct, _ = gc.segment_roi(pts, None, m)
    wrong = dict(gc.average_radii)
    wrong[0] = ism.state.dims_map[0][1]
    gc_wrong = type(gc)(descriptors=gc.descriptors, classes=gc.classes,
                        instances=gc.instances, average_radii=wrong,
                        metric=gc.metric)
    seg_wrong, _ = gc_wrong.segment_roi(pts, None, m)
    assert len(seg_correct) != len(seg_wrong)


@pytest.mark.slow
def test_end_to_end_with_svm_verification(rng, tmp_path):
    config = {
        "ObjectConfig": {
            "Children": {
                "Clustering": {"Type": "None"},
                "Codebook": {"Children": {"ActivationStrategy": {
                    "Parameters": {"K": 1}, "Type": "KNN"}}},
                "FeatureWeighting": {"Type": "Uniform"},
                "Features": {"Parameters": {
                    "Radius": 0.6, "ReferenceFrameRadius": 0.5},
                    "Type": "SHORT_SHOT"},
                "GlobalFeatures": {"Parameters": {"ShortShotDims": 64,
                                                  "ReferenceFrameRadius": 2.0},
                                   "Type": "SHORT_SHOT_GLOBAL"},
                "Keypoints": {"Parameters": {"LeafSize": 0.35}, "Type": "VoxelGrid"},
                "Voting": {"Parameters": {
                    "Bandwidth": 0.5, "SingleObjectMode": True,
                    "SingleObjectMaxType": "None",
                    "UseGlobalFeatures": True,
                    "GlobalFeaturesStrategy": "SVM",
                    "GlobalFeatureInfluenceType": 3,
                    "GlobalParamRateLimit": 0.6},
                    "Type": "MeanShift"},
            },
            "Parameters": {"DistanceType": "ChiSquared",
                           "BoundingBoxType": "AABB",
                           "UseSvmTraining": True,
                           "SvmAutoTrain": False,
                           "SvmOneVsAllTraining": True,
                           "SvmParamC": 10.0, "SvmParamGamma": 2.0},
        }
    }
    ism = ImplicitShapeModel(IsmConfig.from_json(config))
    for cid in range(3):
        for j in range(2):
            pts = shapes.make_instance(rng, cid, n=800, rotate=(j > 0))
            p = str(tmp_path / f"t{cid}_{j}.pcd")
            save_pcd(p, PointCloud(xyz=pts))
            ism.add_training_model(p, cid, cid)
    ism.train()
    assert ism.state.svm is not None
    assert ism.state.global_descriptors.shape[0] == 6

    # save/load roundtrip keeps the SVM
    mp = str(tmp_path / "m.ism")
    ism.save(mp)
    ism2 = ImplicitShapeModel.load(mp)
    assert ism2.state.svm is not None

    correct = 0
    for cid in range(3):
        pts = shapes.make_instance(rng, cid, n=800, rotate=True)
        maxima, _ = ism2.detect(pts)
        assert maxima
        assert maxima[0].glob_class_weight > 0  # global hypothesis filled
        correct += int(maxima[0].class_id == cid)
    assert correct >= 2
