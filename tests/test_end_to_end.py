"""End-to-end: train the ISM pipeline on synthetic shape classes and classify
held-out rotated instances (analogue of the reference's quick-start smoke
test, README.md:60-66)."""

import os

import numpy as np
import pytest

from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
from point_cloud_donkey_tpu.utils.config import IsmConfig
from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd

import shapes


QS_LIKE_CONFIG = {
    "ObjectConfig": {
        "Children": {
            "Clustering": {"Type": "None"},
            "Codebook": {
                "Children": {
                    "ActivationStrategy": {
                        "Parameters": {"K": 1, "UseDistanceRatio": False},
                        "Type": "KNN",
                    }
                },
                "Parameters": {},
            },
            "FeatureWeighting": {"Parameters": {}, "Type": "Uniform"},
            "Features": {
                "Parameters": {
                    "Radius": 0.6,
                    "ReferenceFrameRadius": 0.5,
                    "ReferenceFrameType": "SHOT",
                },
                "Type": "SHOT",
            },
            "GlobalFeatures": {"Type": "Dummy"},
            "Keypoints": {"Parameters": {"LeafSize": 0.35}, "Type": "VoxelGrid"},
            "Voting": {
                "Parameters": {
                    "Bandwidth": 0.5,
                    "SingleObjectMode": True,
                    "SingleObjectMaxType": "None",
                    "UseGlobalFeatures": False,
                    "MinThreshold": 0.0,
                    "BestK": -1,
                    "AverageRotation": True,
                },
                "Type": "MeanShift",
            },
        },
        "Parameters": {
            "DistanceType": "ChiSquared",
            "NormalRadius": 0.25,
            "ConsistentNormalsMethod": 2,
            "BoundingBoxType": "MVBB",
        },
    }
}


@pytest.fixture(scope="module")
def trained_model():
    rng = np.random.default_rng(123)
    ism = ImplicitShapeModel(IsmConfig.from_json(QS_LIKE_CONFIG))
    import tempfile
    tmp = tempfile.mkdtemp()
    for cid in range(5):
        pts = shapes.make_instance(rng, cid, n=1200, rotate=False, noise=0.005)
        path = os.path.join(tmp, f"train_{cid}.pcd")
        save_pcd(path, PointCloud(xyz=pts))
        ism.add_training_model(path, cid, cid)
    ism.train()
    return ism, rng


def test_training_built_codebook(trained_model):
    ism, _ = trained_model
    cb = ism.state.codebook
    assert cb.num_codewords > 50
    # with KNN k=1 + Clustering None every kept codeword holds exactly 1 vote
    per_cw = cb.vote_mask.sum(axis=1)
    assert np.all(per_cw[cb.cw_mask] == 1)
    assert len(ism.state.dims_map) == 5
    # class sigmas are positive variances
    assert np.all(cb.class_sigma > 0)


def test_classify_same_instances(trained_model):
    """Re-classifying the (unrotated, lightly noised) training shapes must be
    perfect -- the minimal sanity bar."""
    ism, rng = trained_model
    correct = 0
    for cid in range(5):
        pts = shapes.make_instance(rng, cid, n=1200, rotate=False, noise=0.005)
        maxima, _ = ism.detect(pts)
        assert maxima, f"no maxima for class {cid}"
        if maxima[0].class_id == cid:
            correct += 1
    assert correct == 5, f"only {correct}/5 training-like shapes correct"


def test_classify_rotated_instances(trained_model):
    """Rotated + noised held-out instances: the rotation-invariant pipeline
    should classify most correctly (reference gets high accuracy on its
    quick-start set)."""
    ism, rng = trained_model
    total, correct = 0, 0
    for cid in range(5):
        for _ in range(3):
            pts = shapes.make_instance(rng, cid, n=1200, rotate=True, noise=0.005)
            maxima, _ = ism.detect(pts)
            total += 1
            if maxima and maxima[0].class_id == cid:
                correct += 1
    assert correct / total >= 0.8, f"accuracy {correct}/{total}"


def test_save_load_roundtrip(trained_model, tmp_path):
    ism, rng = trained_model
    path = str(tmp_path / "model.ism")
    ism.save(path)
    ism2 = ImplicitShapeModel.load(path)
    cb1, cb2 = ism.state.codebook, ism2.state.codebook
    np.testing.assert_array_equal(cb1.codewords, cb2.codewords)
    np.testing.assert_array_equal(cb1.votes, cb2.votes)
    assert ism2.state.dims_map == ism.state.dims_map

    pts = shapes.make_instance(np.random.default_rng(7), 2, n=1200)
    m1, _ = ism.detect(pts)
    m2, _ = ism2.detect(pts)
    assert m1[0].class_id == m2[0].class_id
    np.testing.assert_allclose(m1[0].weight, m2[0].weight, rtol=1e-5)


def test_quickstart_scale_config(tmp_path):
    """The reference quick-start runs at mm scale (SHOT radius 60): verify
    the pipeline holds at large coordinate magnitudes (matmul-distance
    conditioning) with the qs parameter ratios."""
    import shapes
    from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
    from point_cloud_donkey_tpu.utils.config import IsmConfig
    from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd

    cfg = IsmConfig.template()
    cfg.child("Features").params.update(
        {"Radius": 60.0, "ReferenceFrameRadius": 50.0})
    cfg.child("Keypoints").params["LeafSize"] = 35.0
    cfg.root.params["NormalRadius"] = 25.0
    cfg.root.params["DistanceType"] = "ChiSquared"
    cfg.child("Voting").params.update(
        {"Bandwidth": 50.0, "SingleObjectMode": True,
         "SingleObjectMaxType": "BandwidthVotes"})
    rng = np.random.default_rng(7)
    ism = ImplicitShapeModel(cfg)
    makers = [shapes.ellipsoid, shapes.box, shapes.torus]
    for c, mk in enumerate(makers):
        pts = np.asarray(mk(rng, 1200), np.float32) * 100.0   # mm scale
        f = str(tmp_path / f"qs{c}.pcd")
        save_pcd(f, PointCloud(xyz=pts))
        ism.add_training_model(f, c, c)
    ism.train()
    correct = 0
    for c, mk in enumerate(makers):
        pts = np.asarray(mk(rng, 1200), np.float32) * 100.0
        f = str(tmp_path / f"qt{c}.pcd")
        save_pcd(f, PointCloud(xyz=pts))
        maxima, _ = ism.detect_file(f)
        if maxima and maxima[0].class_id == c:
            correct += 1
    assert correct == 3


@pytest.mark.slow
def test_fast_cli_matches_host_decisions(tmp_path):
    """--fast (batched jitted serving path) must reproduce the host path's
    per-file decisions through the eval CLI."""
    import json

    from point_cloud_donkey_tpu.cli.eval_classification import main as cls_main

    rng = np.random.default_rng(11)
    config = {"ObjectConfig": {"Children": {
        "Clustering": {"Type": "None"},
        "Codebook": {"Children": {"ActivationStrategy": {
            "Parameters": {"K": 1}, "Type": "KNN"}}},
        "FeatureWeighting": {"Type": "Uniform"},
        "Features": {"Parameters": {
            "Radius": 0.6, "ReferenceFrameRadius": 0.5}, "Type": "SHORT_SHOT"},
        "GlobalFeatures": {"Type": "Dummy"},
        "Keypoints": {"Parameters": {"LeafSize": 0.35}, "Type": "VoxelGrid"},
        "Voting": {"Parameters": {
            "Bandwidth": 0.5, "SingleObjectMode": True,
            "SingleObjectMaxType": "BandwidthVotes"}, "Type": "MeanShift"}},
        "Parameters": {"DistanceType": "ChiSquared",
                       "BoundingBoxType": "AABB"}}}
    cfg_path = str(tmp_path / "config.ism")
    json.dump(config, open(cfg_path, "w"))

    train, test = ["# train"], ["# test"]
    for cid, name in [(1, "box"), (2, "torus"), (3, "cyl")]:
        for j in range(2):
            pts = shapes.make_instance(rng, cid, n=1024, rotate=False)
            p = str(tmp_path / f"tr_{name}_{j}.pcd")
            save_pcd(p, PointCloud(xyz=pts))
            train.append(f"{p} {name}")
        for j in range(2):
            pts = shapes.make_instance(rng, cid, n=1024, rotate=True)
            p = str(tmp_path / f"te_{name}_{j}.pcd")
            save_pcd(p, PointCloud(xyz=pts))
            test.append(f"{p} {name}")
    (tmp_path / "train.txt").write_text("\n".join(train) + "\n")
    (tmp_path / "test.txt").write_text("\n".join(test) + "\n")

    assert cls_main(["-t", cfg_path, "-f", str(tmp_path / "train.txt"),
                     "-o", str(tmp_path / "model")]) == 0
    assert cls_main(["-d", str(tmp_path / "model.ism"),
                     "-f", str(tmp_path / "test.txt"),
                     "-o", str(tmp_path / "host")]) == 0
    assert cls_main(["-d", str(tmp_path / "model.ism"),
                     "-f", str(tmp_path / "test.txt"),
                     "-o", str(tmp_path / "fast"), "--fast"]) == 0

    host = [ln for ln in open(tmp_path / "host" / "summary.txt")
            if ln.startswith("file:")]
    fast = [ln for ln in open(tmp_path / "fast" / "summary.txt")
            if ln.startswith("file:")]
    assert host == fast and len(host) == 6


@pytest.mark.parametrize("instance_primary", [True, False])
def test_instance_labels_end_to_end(tmp_path, instance_primary):
    """'# train inst' lists: with InstanceLabelsPrimary (reference default)
    the instance labels drive the codebook and class results derive through
    instance_to_class; either way the summary reports class AND instance
    accuracy plus the right label-map blocks (eval_helpers.h:46-61,
    eval_classification.cpp:126-136, :469-473)."""
    import json

    from point_cloud_donkey_tpu.cli.eval_classification import main as cls_main

    rng = np.random.default_rng(5)
    config = {"ObjectConfig": {"Children": {
        "Clustering": {"Type": "None"},
        "Codebook": {"Children": {"ActivationStrategy": {
            "Parameters": {"K": 1}, "Type": "KNN"}}},
        "FeatureWeighting": {"Type": "Uniform"},
        "Features": {"Parameters": {
            "Radius": 0.6, "ReferenceFrameRadius": 0.5}, "Type": "SHORT_SHOT"},
        "GlobalFeatures": {"Type": "Dummy"},
        "Keypoints": {"Parameters": {"LeafSize": 0.35}, "Type": "VoxelGrid"},
        "Voting": {"Parameters": {
            "Bandwidth": 0.5, "SingleObjectMode": True,
            "SingleObjectMaxType": "BandwidthVotes"}, "Type": "MeanShift"}},
        "Parameters": {"DistanceType": "ChiSquared",
                       "InstanceLabelsPrimary": instance_primary,
                       "BoundingBoxType": "AABB"}}}
    cfg_path = str(tmp_path / "config.ism")
    json.dump(config, open(cfg_path, "w"))

    # 2 classes x 2 instances, each instance a distinct generator shape
    layout = [("classA", "inst_a1", 1), ("classA", "inst_a2", 3),
              ("classB", "inst_b1", 2), ("classB", "inst_b2", 4)]
    train, test = ["# train inst"], ["# test inst"]
    for cls_name, inst_name, cid in layout:
        for j in range(2):
            pts = shapes.make_instance(rng, cid, n=1024, rotate=False)
            p = str(tmp_path / f"tr_{inst_name}_{j}.pcd")
            save_pcd(p, PointCloud(xyz=pts))
            train.append(f"{p} {cls_name} {inst_name}")
        pts = shapes.make_instance(rng, cid, n=1024, rotate=True)
        p = str(tmp_path / f"te_{inst_name}.pcd")
        save_pcd(p, PointCloud(xyz=pts))
        test.append(f"{p} {cls_name} {inst_name}")
    (tmp_path / "train.txt").write_text("\n".join(train) + "\n")
    (tmp_path / "test.txt").write_text("\n".join(test) + "\n")

    assert cls_main(["-t", cfg_path, "-f", str(tmp_path / "train.txt"),
                     "-o", str(tmp_path / "model")]) == 0
    assert cls_main(["-d", str(tmp_path / "model.ism"),
                     "-f", str(tmp_path / "test.txt"),
                     "-o", str(tmp_path / "out")]) == 0

    summary = open(tmp_path / "out" / "summary.txt").read()
    if instance_primary:
        assert "used as primary labels" in summary
        assert "instance id to class id mapping:" in summary
    else:
        assert "instance id to instance name mapping:" in summary
    # class accuracy and instance accuracy both reported and high
    import re
    m = re.search(r" Accuracy: ([\d.]+) %", summary)
    assert m and float(m.group(1)) >= 75.0, summary[-800:]
    m = re.search(r" result: (\d+) of (\d+) instances recognized correctly",
                  summary)
    assert m and int(m.group(1)) >= 3 and int(m.group(2)) == 4, summary[-800:]


def test_cli_pointcloud_groundtruth_args(tmp_path):
    """-m/-c (training) and -p/-g (testing) replace the -f file lists
    (eval_classification.cpp:52-63)."""
    import json

    from point_cloud_donkey_tpu.cli.eval_classification import main as cls_main

    rng = np.random.default_rng(5)
    config = {"ObjectConfig": {"Children": {
        "Clustering": {"Type": "None"},
        "Codebook": {"Children": {"ActivationStrategy": {
            "Parameters": {"K": 1}, "Type": "KNN"}}},
        "FeatureWeighting": {"Type": "Uniform"},
        "Features": {"Parameters": {
            "Radius": 0.6, "ReferenceFrameRadius": 0.5}, "Type": "SHORT_SHOT"},
        "GlobalFeatures": {"Type": "Dummy"},
        "Keypoints": {"Parameters": {"LeafSize": 0.35}, "Type": "VoxelGrid"},
        "Voting": {"Parameters": {
            "Bandwidth": 0.5, "SingleObjectMode": True,
            "SingleObjectMaxType": "BandwidthVotes"}, "Type": "MeanShift"}},
        "Parameters": {"DistanceType": "ChiSquared",
                       "BoundingBoxType": "AABB"}}}
    cfg_path = str(tmp_path / "config.ism")
    json.dump(config, open(cfg_path, "w"))

    train_files, train_ids, test_files, test_ids = [], [], [], []
    for cid in (1, 2):
        for j in range(2):
            pts = shapes.make_instance(rng, cid, n=1024, rotate=False)
            p = str(tmp_path / f"tr_{cid}_{j}.pcd")
            save_pcd(p, PointCloud(xyz=pts))
            train_files.append(p)
            train_ids.append(str(cid))
        pts = shapes.make_instance(rng, cid, n=1024, rotate=True)
        p = str(tmp_path / f"te_{cid}.pcd")
        save_pcd(p, PointCloud(xyz=pts))
        test_files.append(p)
        test_ids.append(str(cid))

    assert cls_main(["-t", cfg_path, "-m", *train_files, "-c", *train_ids,
                     "-o", str(tmp_path / "model")]) == 0
    assert cls_main(["-d", str(tmp_path / "model.ism"),
                     "-p", *test_files, "-g", *test_ids,
                     "-o", str(tmp_path / "out")]) == 0
    lines = open(tmp_path / "out" / "summary.txt").read()
    assert lines.count("file:") == 2


def test_host_cli_file_chunking_matches_single_pass(tmp_path, monkeypatch):
    """The host eval path loads + detects in FILE_CHUNK slices (O(chunk)
    memory); a 4-file chunk over 6 files must produce the identical
    summary as one pass."""
    import json

    import point_cloud_donkey_tpu.cli.eval_classification as ec

    rng = np.random.default_rng(12)
    config = {"ObjectConfig": {"Children": {
        "Clustering": {"Type": "None"},
        "Codebook": {"Children": {"ActivationStrategy": {
            "Parameters": {"K": 1}, "Type": "KNN"}}},
        "FeatureWeighting": {"Type": "Uniform"},
        "Features": {"Parameters": {
            "Radius": 0.6, "ReferenceFrameRadius": 0.5}, "Type": "SHORT_SHOT"},
        "GlobalFeatures": {"Type": "Dummy"},
        "Keypoints": {"Parameters": {"LeafSize": 0.35}, "Type": "VoxelGrid"},
        "Voting": {"Parameters": {
            "Bandwidth": 0.5, "SingleObjectMode": True,
            "SingleObjectMaxType": "BandwidthVotes"}, "Type": "MeanShift"}},
        "Parameters": {"DistanceType": "ChiSquared",
                       "BoundingBoxType": "AABB"}}}
    cfg_path = str(tmp_path / "config.ism")
    json.dump(config, open(cfg_path, "w"))

    train, test = ["# train"], ["# test"]
    for cid, name in [(1, "box"), (2, "torus"), (3, "cyl")]:
        pts = shapes.make_instance(rng, cid, n=800, rotate=False)
        p = str(tmp_path / f"tr_{name}.pcd")
        save_pcd(p, PointCloud(xyz=pts))
        train.append(f"{p} {name}")
        for j in range(2):
            pts = shapes.make_instance(rng, cid, n=800, rotate=True)
            p = str(tmp_path / f"te_{name}_{j}.pcd")
            save_pcd(p, PointCloud(xyz=pts))
            test.append(f"{p} {name}")
    (tmp_path / "train.txt").write_text("\n".join(train) + "\n")
    (tmp_path / "test.txt").write_text("\n".join(test) + "\n")

    assert ec.main(["-t", cfg_path, "-f", str(tmp_path / "train.txt"),
                    "-o", str(tmp_path / "model")]) == 0
    assert ec.main(["-d", str(tmp_path / "model.ism"),
                    "-f", str(tmp_path / "test.txt"),
                    "-o", str(tmp_path / "one")]) == 0
    monkeypatch.setattr(ec, "FILE_CHUNK", 4)  # 6 files -> 2 chunks
    assert ec.main(["-d", str(tmp_path / "model.ism"),
                    "-f", str(tmp_path / "test.txt"),
                    "-o", str(tmp_path / "chunked")]) == 0

    one = [ln for ln in open(tmp_path / "one" / "summary.txt")
           if ln.startswith("file:")]
    chunked = [ln for ln in open(tmp_path / "chunked" / "summary.txt")
               if ln.startswith("file:")]
    assert one == chunked and len(one) == 6


def test_train_model_chunking_bit_identical(tmp_path, monkeypatch):
    """train() over MODEL_CHUNK-file slices (O(chunk) memory) must produce
    the same trained state as the single-pass run: integer/boolean arrays
    bit-identical, float arrays to ~1-ulp (padded-capacity reduction order
    shifts with the chunk layout; decisions cannot)."""
    import json

    import point_cloud_donkey_tpu.models.ism as ism_mod
    from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
    from point_cloud_donkey_tpu.utils.config import IsmConfig

    rng = np.random.default_rng(13)
    config = {"ObjectConfig": {"Children": {
        "Clustering": {"Type": "None"},
        "Codebook": {"Children": {"ActivationStrategy": {
            "Parameters": {"K": 1}, "Type": "KNN"}}},
        "FeatureWeighting": {"Type": "Uniform"},
        "Features": {"Parameters": {
            "Radius": 0.6, "ReferenceFrameRadius": 0.5}, "Type": "SHOT"},
        "GlobalFeatures": {"Type": "ESF"},
        "Keypoints": {"Parameters": {"LeafSize": 0.35}, "Type": "VoxelGrid"},
        "Voting": {"Parameters": {
            "Bandwidth": 0.5, "SingleObjectMode": True,
            "SingleObjectMaxType": "BandwidthVotes"}, "Type": "MeanShift"}},
        "Parameters": {"DistanceType": "ChiSquared",
                       "BoundingBoxType": "MVBB"}}}

    paths = []
    for j in range(6):
        pts = shapes.make_instance(rng, j % 3, n=700, rotate=False)
        p = str(tmp_path / f"m{j}.pcd")
        save_pcd(p, PointCloud(xyz=pts))
        paths.append((p, j % 3))

    def train_one():
        ism = ImplicitShapeModel(IsmConfig.from_json(config))
        for p, c in paths:
            ism.add_training_model(p, c, c)
        ism.train()
        return ism.state

    single = train_one()
    monkeypatch.setattr(ism_mod, "MODEL_CHUNK", 5)  # 6 models -> 5 + 1:
    # the trailing SIZE-1 chunk must take the same per-cloud-eligible
    # batched path as every other cloud (bit-identity regression)
    chunked = train_one()

    cb_s, cb_c = single.codebook, chunked.codebook
    for name in cb_s._fields:
        a = np.asarray(getattr(cb_s, name))
        b = np.asarray(getattr(cb_c, name))
        assert a.shape == b.shape, name
        if a.dtype.kind in "biu":
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6,
                                       err_msg=name)
    np.testing.assert_allclose(single.global_descriptors,
                               chunked.global_descriptors,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(single.global_radii, chunked.global_radii,
                               rtol=1e-5)


def test_serve_cli_classify_and_maxima(tmp_path, capsys):
    """The sharded serving CLI (classify + --maxima detection) end-to-end
    over the virtual 8-device mesh: correct predictions, maxima positions
    near the object centers, and the model's real activation params."""
    import json

    from point_cloud_donkey_tpu.cli.eval_classification import main as cls_main
    from point_cloud_donkey_tpu.cli.serve import main as serve_main

    rng = np.random.default_rng(21)
    config = {"ObjectConfig": {"Children": {
        "Clustering": {"Type": "None"},
        "Codebook": {"Children": {"ActivationStrategy": {
            "Parameters": {"K": 1}, "Type": "KNN"}}},
        "FeatureWeighting": {"Type": "Uniform"},
        "Features": {"Parameters": {
            "Radius": 0.6, "ReferenceFrameRadius": 0.5}, "Type": "SHORT_SHOT"},
        "GlobalFeatures": {"Type": "Dummy"},
        "Keypoints": {"Parameters": {"LeafSize": 0.35}, "Type": "VoxelGrid"},
        "Voting": {"Parameters": {
            "Bandwidth": 0.5, "SingleObjectMode": True,
            "SingleObjectMaxType": "BandwidthVotes"}, "Type": "MeanShift"}},
        "Parameters": {"DistanceType": "ChiSquared",
                       "BoundingBoxType": "AABB"}}}
    cfg_path = str(tmp_path / "config.ism")
    json.dump(config, open(cfg_path, "w"))

    train, test = ["# train"], ["# test"]
    centers = []
    for cid, name in [(1, "box"), (2, "torus")]:
        for j in range(2):
            pts = shapes.make_instance(rng, cid, n=1024, rotate=False)
            p = str(tmp_path / f"tr_{name}_{j}.pcd")
            save_pcd(p, PointCloud(xyz=pts))
            train.append(f"{p} {name}")
        pts = shapes.make_instance(rng, cid, n=1024, rotate=True)
        centers.append(pts.mean(axis=0))
        p = str(tmp_path / f"te_{name}.pcd")
        save_pcd(p, PointCloud(xyz=pts))
        test.append(f"{p} {name}")
    (tmp_path / "train.txt").write_text("\n".join(train) + "\n")
    (tmp_path / "test.txt").write_text("\n".join(test) + "\n")

    assert cls_main(["-t", cfg_path, "-f", str(tmp_path / "train.txt"),
                     "-o", str(tmp_path / "model")]) == 0

    assert serve_main(["-d", str(tmp_path / "model.ism"),
                       "-f", str(tmp_path / "test.txt"),
                       "--batch", "1", "--points", "1024"]) == 0
    out = capsys.readouterr().out
    assert "Accuracy: 100 %" in out

    assert serve_main(["-d", str(tmp_path / "model.ism"),
                       "-f", str(tmp_path / "test.txt"),
                       "--batch", "1", "--points", "1024", "--maxima"]) == 0
    out = capsys.readouterr().out
    assert "Accuracy: 100 %" in out
    max_lines = [ln for ln in out.splitlines() if "maximum (" in ln]
    assert len(max_lines) == 2
    for ln, center in zip(max_lines, centers):
        xyz = ln.split("maximum (")[1].rstrip(")").split()
        pos = np.array([float(v) for v in xyz])
        assert np.linalg.norm(pos - center) < 0.5, (pos, center)
