"""GUI analogs: offline renders (viz/) + scene composer / GT annotator
(reference src/training_gui, src/model_gui, src/ground_truth_gui)."""
import json
import os

import numpy as np

import shapes
from point_cloud_donkey_tpu.cli.scene_composer import compose, euler_to_matrix
from point_cloud_donkey_tpu.models.metrics import parse_annotation_file
from point_cloud_donkey_tpu.utils.io import PointCloud, load_cloud, save_pcd
from point_cloud_donkey_tpu.viz import (render_cloud, render_detections,
                                        render_trajectories,
                                        render_voting_space)


def test_scene_composer_and_annotations(tmp_path):
    rng = np.random.default_rng(0)
    mfile = str(tmp_path / "model.pcd")
    save_pcd(mfile, PointCloud(xyz=np.asarray(shapes.box(rng, 500), np.float32)))
    spec = {"output": str(tmp_path / "scene.pcd"),
            "annotation": str(tmp_path / "scene.txt"),
            "objects": [
                {"file": mfile, "class": "box", "position": [0, 0, 0],
                 "euler_deg": [0, 0, 45]},
                {"file": mfile, "class": "box", "position": [4, 0, 0],
                 "scale": 0.5}]}
    compose(spec)
    scene = load_cloud(spec["output"])
    assert len(scene) == 1000
    objs = parse_annotation_file(spec["annotation"])
    assert len(objs) == 2
    assert np.allclose(objs[1].position, [4, 0, 0])
    # scaled copy has half the extent of the rotated one in z
    assert objs[1].bb_extent[2] < objs[0].bb_extent[2]
    # quaternion encodes the 45 deg z rotation
    assert abs(objs[0].bb_quat[0] - np.cos(np.radians(22.5))) < 1e-4


def test_euler_matrix_orthonormal():
    R = euler_to_matrix(0.3, -0.5, 1.1)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1.0)


def test_renders_write_pngs(tmp_path):
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(300, 3)).astype(np.float32)
    p1 = render_cloud(str(tmp_path / "c.png"), xyz,
                      normals=np.tile([0, 0, 1.], (300, 1)),
                      keypoints=xyz[:5])
    p2 = render_voting_space(str(tmp_path / "v.png"), xyz, rng.random(300),
                             rng.integers(0, 3, 300), maxima=xyz[:2])
    p3 = render_trajectories(str(tmp_path / "t.png"), xyz[:50], xyz[50:100])

    class M:
        position = np.zeros(3)
        bbox_size = np.ones(3)
        bbox_quat = np.array([1., 0, 0, 0])
        class_id = 1
    p4 = render_detections(str(tmp_path / "d.png"), xyz, [M()])
    for p in (p1, p2, p3, p4):
        assert os.path.getsize(p) > 10000


def test_voting_analysis_dump(tmp_path):
    # EnableVotingAnalysis writes vote npz dumps during detect
    from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
    from point_cloud_donkey_tpu.utils.config import IsmConfig
    cfg = IsmConfig.template()
    cfg.root.params["EnableVotingAnalysis"] = True
    cfg.root.params["VotingAnalysisOutputPath"] = str(tmp_path / "va")
    cfg.child("Features").params.update(
        {"Radius": 0.6, "ReferenceFrameRadius": 0.5})
    cfg.child("Keypoints").params["LeafSize"] = 0.3
    cfg.root.params["NormalRadius"] = 0.25
    cfg.child("Voting").params.update({"Bandwidth": 0.6, "MinWeight": 0.0})
    rng = np.random.default_rng(2)
    ism = ImplicitShapeModel(cfg)
    files, labels = [], []
    for c, mk in enumerate([shapes.ellipsoid, shapes.box]):
        f = str(tmp_path / f"m{c}.pcd")
        save_pcd(f, PointCloud(xyz=np.asarray(mk(rng, 800), np.float32)))
        files.append(f)
        labels.append(c)
    for f, c in zip(files, labels):
        ism.add_training_model(f, c, c)
    ism.train()
    ism.detect_file(files[0])
    dumps = list((tmp_path / "va").glob("votes_*.npz"))
    assert len(dumps) == 1
    z = np.load(dumps[0])
    assert len(z["votes"]) > 0 and z["votes"].shape[1] == 3


def test_serve_cli(tmp_path, capsys):
    # batched/sharded serving CLI end-to-end on a tiny trained model
    from point_cloud_donkey_tpu.cli import serve
    from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
    from point_cloud_donkey_tpu.utils.config import IsmConfig
    import json
    cfg = IsmConfig.template()
    # the template defaults to CSHOT-1344; the 8-device virtual mesh runs
    # on one physical core, so use the cheap normal-free descriptor here
    cfg.child("Features").type = "SHORT_SHOT"
    cfg.child("Features").params.update(
        {"Radius": 0.6, "ReferenceFrameRadius": 0.5})
    cfg.child("Keypoints").params["LeafSize"] = 0.35
    cfg.root.params["NormalRadius"] = 0.25
    cfg.root.params["DistanceType"] = "ChiSquared"
    cfg.child("Voting").params["Bandwidth"] = 0.5
    rng = np.random.default_rng(4)
    ism = ImplicitShapeModel(cfg)
    names = []
    for c, mk in enumerate([shapes.ellipsoid, shapes.box]):
        f = str(tmp_path / f"m{c}.pcd")
        save_pcd(f, PointCloud(xyz=np.asarray(mk(rng, 1000), np.float32)))
        ism.add_training_model(f, c, c)
        names.append(f)
    ism.train()
    model = str(tmp_path / "model.ism")
    ism.save(model)
    lst = tmp_path / "test.txt"
    lst.write_text("# test\n" + "\n".join(
        f"{f} {c}" for c, f in enumerate(names)) + "\n")
    rc = serve.main(["-d", model, "-f", str(lst), "--points", "512",
                     "--devices", "2", "--batch", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Accuracy: 100 %" in out
