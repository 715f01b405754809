"""Comparison pipelines (reference src/eval_pipelines/): building blocks +
one end-to-end train/classify per pipeline on a tiny synthetic set."""
import numpy as np
import pytest

import shapes
from point_cloud_donkey_tpu.pipelines.building_blocks import (
    PipelineParams, absolute_orientation_ransac, cast_votes_and_find_maxima,
    cluster_correspondences_gc, dataset_preset, find_nn_correspondences,
    generate_classification_hypotheses, prepare_center_votes,
    self_adapted_hough_voting, train_pipeline_model)
from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe")
    rng = np.random.default_rng(0)
    files, labels = [], []
    makers = [shapes.ellipsoid, shapes.box, shapes.torus]
    for c, mk in enumerate(makers):
        for i in range(2):
            pts = np.asarray(mk(rng, 900), np.float32)
            f = str(d / f"train_{c}_{i}.pcd")
            save_pcd(f, PointCloud(xyz=pts))
            files.append(f)
            labels.append(c)
    tests, tlabels = [], []
    for c, mk in enumerate(makers):
        pts = np.asarray(mk(rng, 900), np.float32)
        f = str(d / f"test_{c}.pcd")
        save_pcd(f, PointCloud(xyz=pts))
        tests.append(f)
        tlabels.append(c)
    return files, labels, tests, tlabels, d


PARAMS = PipelineParams(normal_radius=0.25, reference_frame_radius=0.4,
                        feature_radius=0.6, keypoint_sampling_radius=0.3,
                        bin_size=0.5, rel_threshold=-0.1,
                        min_coord=-3.0, max_coord=3.0,
                        inlier_threshold=0.15)


def test_dataset_presets():
    p = dataset_preset("mn10")
    assert p.feature_type == "SHOT" and p.bin_size == 0.5
    p = dataset_preset("wash")
    assert p.feature_type == "CSHOT" and p.keypoint_sampling_radius == 0.02
    with pytest.raises(ValueError):
        dataset_preset("nope")


def test_hough_space_votes_and_maxima():
    votes = np.array([[0.0, 0, 0]] * 5 + [[2.0, 2, 2]] * 2, np.float64)
    maxima, ids = cast_votes_and_find_maxima(
        votes, np.ones(7), np.full(3, -3.0), np.full(3, 3.0),
        np.full(3, 1.0), -0.1)
    assert len(maxima) >= 1
    assert len(ids[0]) == 5          # strongest maximum collects the 5 votes
    assert maxima[0] > maxima[-1] or len(maxima) == 1


def test_absolute_orientation_recovers_rigid_motion():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(20, 3))
    R0 = np.asarray(shapes.random_rotation(rng))
    t0 = np.array([0.3, -0.2, 0.5])
    dst = src @ R0.T + t0
    dst[::5] += 5.0                  # 4 outliers
    R, t, inl = absolute_orientation_ransac(src, dst, 0.05, rng_seed=2)
    assert inl.sum() >= 14
    assert np.allclose(R, R0, atol=1e-5) and np.allclose(t, t0, atol=1e-5)


def test_gc_clustering():
    rng = np.random.default_rng(2)
    obj = rng.normal(size=(10, 3)).astype(np.float32)
    scn = obj + np.array([1.0, 0, 0], np.float32)     # rigid shift
    o = np.arange(10)
    s = np.arange(10)
    clusters = cluster_correspondences_gc(o, s, obj, scn, 0.05, 3)
    assert len(clusters) == 1 and len(clusters[0]) == 10


@pytest.mark.parametrize("name", ["lnbnn", "tombari", "aldoma", "zhou", "knopp"])
def test_pipeline_end_to_end(dataset, name, tmp_path):
    files, labels, tests, tlabels, d = dataset
    from point_cloud_donkey_tpu.cli.eval_pipeline import make_pipeline
    pipe = make_pipeline(name, "", 0, 0)
    if hasattr(pipe, "params"):
        pipe.params = PARAMS
    model = str(tmp_path / f"{name}_model")
    pipe.train(files, labels, labels, model)
    pipe.load_model(model)
    correct = 0
    for fn, gt in zip(tests, tlabels):
        res = pipe.classify(fn)
        if res and res[0][0] == gt:
            correct += 1
    # baselines on a 3-class toy set: demand better than chance
    assert correct >= 2, f"{name}: {correct}/3"


def test_self_adapted_hough_smoke():
    rng = np.random.default_rng(3)
    n = 30
    obj_kp = rng.normal(size=(n, 3)).astype(np.float32)
    scene_kp = obj_kp + np.array([0.5, 0, 0], np.float32)
    eye = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    o = np.arange(n)
    s = np.arange(n)
    d = rng.uniform(0.01, 0.09, n).astype(np.float32)
    maxima, ids, sel, bin_size = self_adapted_hough_voting(
        o, s, d, obj_kp, eye, scene_kp, eye)
    assert maxima and len(ids[0]) >= 3   # consistent rigid motion -> a peak
