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
