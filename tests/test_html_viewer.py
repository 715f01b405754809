"""Interactive HTML viewer (viz/html_viewer.py + cli/view.py)."""

import json
import re

import numpy as np

import shapes
from point_cloud_donkey_tpu.ops import geometry as geo
from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd
from point_cloud_donkey_tpu.viz.html_viewer import (write_scene_viewer,
                                                    write_voting_viewer)


def _extract_data(html: str) -> dict:
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    assert m, "embedded DATA not found"
    return json.loads(m.group(1))


def test_scene_viewer(rng, tmp_path):
    xyz = shapes.make_instance(rng, 1, n=500, rotate=False)
    cls = (xyz[:, 0] > 0).astype(np.int32)
    box = geo.BoundingBox(position=np.zeros(3), size=np.ones(3),
                          quat=np.array([1.0, 0, 0, 0]))
    out = str(tmp_path / "v.html")
    write_scene_viewer(out, xyz, class_ids=cls, boxes=[box],
                       box_labels=["box"], title="t")
    html = open(out).read()
    data = _extract_data(html)
    assert len(data["groups"]) == 2          # two classes
    assert sum(len(g["p"]) for g in data["groups"]) == 3 * 500
    assert data["boxes"][0]["label"] == "box"
    assert "quatRot" in html                  # renderer embedded
    assert "http" not in html.split("</title>")[1][:2000]  # self-contained


def test_voting_viewer_and_subsample(rng, tmp_path):
    from point_cloud_donkey_tpu.models.voting import VotingMaximum
    scene = rng.normal(size=(1000, 3)).astype(np.float32)
    votes = rng.normal(size=(300, 3)).astype(np.float32)
    w = rng.random(300).astype(np.float32)
    cls = rng.integers(0, 3, 300)
    m = VotingMaximum(class_id=1, position=np.zeros(3, np.float32),
                      weight=0.5, bb_size=np.ones(3, np.float32))
    out = str(tmp_path / "votes.html")
    write_voting_viewer(out, scene, votes, w, cls, maxima=[m],
                        max_points=120)
    data = _extract_data(open(out).read())
    assert data["groups"][0]["name"] == "scene"
    assert len(data["groups"][0]["p"]) == 3 * 120   # subsampled
    assert len(data["groups"]) == 1 + 3             # scene + 3 vote classes
    assert data["boxes"][0]["label"].startswith("class 1")


def test_view_cli(rng, tmp_path):
    from point_cloud_donkey_tpu.cli.view import main as view_main
    xyz = shapes.make_instance(rng, 2, n=400, rotate=False)
    pcd = str(tmp_path / "c.pcd")
    save_pcd(pcd, PointCloud(xyz=xyz))
    ann = tmp_path / "ann.txt"
    ann.write_text("torus (0.0) 0 0 0 1.0 1.0 0.5 1 0 0 0\n")
    out = str(tmp_path / "out.html")
    assert view_main([pcd, "-a", str(ann), "-o", out]) == 0
    data = _extract_data(open(out).read())
    assert data["boxes"] and data["boxes"][0]["label"] == "torus"


def test_progress_callbacks_and_live_view(rng, tmp_path):
    """The boost-signal analog (implicit_shape_model.h:256-261): a recording
    callback sees every stage event across one train+detect cycle, and the
    LiveHtmlProgress observer renders browser-refreshable pages."""
    import shapes
    from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
    from point_cloud_donkey_tpu.utils.config import IsmConfig
    from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd
    from point_cloud_donkey_tpu.viz.live import LiveHtmlProgress

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
        "Parameters": {"DistanceType": "ChiSquared", "BoundingBoxType": "AABB"}}}
    ism = ImplicitShapeModel(IsmConfig.from_json(config))
    events = []
    ism.connect(lambda ev, payload: events.append((ev, payload)))
    live = LiveHtmlProgress(str(tmp_path / "live"), min_interval_s=0.0)
    ism.connect(live)

    n_models = 2
    for cid in range(n_models):
        pts = shapes.make_instance(rng, cid, n=500)
        p = str(tmp_path / f"t{cid}.pcd")
        save_pcd(p, PointCloud(xyz=pts))
        ism.add_training_model(p, cid, cid)
    ism.train()

    names = [e for e, _ in events]
    for ev in ("point_cloud", "bounding_box", "normals", "features"):
        assert names.count(ev) == n_models, (ev, names)
    assert names.count("codebook") == 1
    assert names.count("train_complete") == 1
    # events interleave per model (cloud -> bbox -> normals -> features, the
    # reference's signal order) so live viewers pair model i's keypoints
    # with model i's cloud, not the last-loaded cloud
    stage_seq = [e for e in names if e in
                 ("point_cloud", "bounding_box", "normals", "features")]
    assert stage_seq == ["point_cloud", "bounding_box", "normals",
                         "features"] * n_models, stage_seq

    events.clear()
    maxima, _ = ism.detect(shapes.make_instance(rng, 0, n=500, rotate=True))
    names = [e for e, _ in events]
    for ev in ("point_cloud", "normals", "features", "votes", "maxima"):
        assert names.count(ev) == 1, (ev, names)
    # detect_batch emits the same per-cloud events
    events.clear()
    ism.detect_batch([shapes.make_instance(rng, 1, n=500, rotate=True)])
    names = [e for e, _ in events]
    for ev in ("point_cloud", "normals", "features", "votes", "maxima"):
        assert names.count(ev) == 1, (ev, names)

    # the live observer rendered all three pages
    for page in ("index.html", "model.html", "voting.html"):
        f = tmp_path / "live" / page
        assert f.exists() and f.stat().st_size > 0
    assert "maxima" in (tmp_path / "live" / "index.html").read_text()

    ism.disconnect(live)
