"""Tests for the interactive scene editor (viz/editor.py, model_gui's
editing analog): data embedding and preview-math parity with the
composer."""

import json
import math
import re

import numpy as np

import shapes
from point_cloud_donkey_tpu.cli.scene_composer import euler_to_matrix
from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd
from point_cloud_donkey_tpu.viz.editor import write_scene_editor


def _spec(tmp_path, rng):
    for name, cid in (("a", 1), ("b", 2)):
        save_pcd(str(tmp_path / f"{name}.pcd"), PointCloud(
            xyz=shapes.make_instance(rng, cid, n=300, rotate=False)))
    return {"output": "scene.pcd", "objects": [
        {"file": "a.pcd", "class": "1", "instance": "a1",
         "position": [0, 0, 0]},
        {"file": "b.pcd", "class": "2", "instance": "b1",
         "position": [2, 0, 0], "euler_deg": [0, 0, 45], "scale": 1.5}]}


def test_editor_embeds_spec_and_points(tmp_path):
    rng = np.random.default_rng(0)
    spec = _spec(tmp_path, rng)
    out = str(tmp_path / "editor.html")
    write_scene_editor(out, spec, base_dir=str(tmp_path),
                       max_points_per_object=200)
    html = open(out).read()
    emb = json.loads(re.search(
        r"const SPEC = (.*?);\s*// the composer spec", html).group(1))
    pts = json.loads(re.search(
        r"const POINTS = (.*?);\s*// per-object", html).group(1))
    assert emb == spec
    assert len(pts) == 2
    assert all(len(p) % 3 == 0 and len(p) // 3 <= 200 for p in pts)
    # embedded points are centered (the composer centers before transforming,
    # so preview == composed output)
    for p in pts:
        a = np.asarray(p).reshape(-1, 3)
        assert np.abs(a.mean(axis=0)).max() < 0.05


def test_editor_js_euler_matches_composer():
    """The editor's JS preview rotation (Rz*Ry*Rx composite, transcribed
    here) must equal scene_composer.euler_to_matrix, or the browser preview
    would disagree with the composed scene."""
    def js_euler(deg):
        rx, ry, rz = [d * math.pi / 180 for d in deg]
        cx, sx = math.cos(rx), math.sin(rx)
        cy, sy = math.cos(ry), math.sin(ry)
        cz, sz = math.cos(rz), math.sin(rz)
        return np.array([
            [cz * cy, cz * sy * sx - sz * cx, cz * sy * cx + sz * sx],
            [sz * cy, sz * sy * sx + cz * cx, sz * sy * cx - cz * sx],
            [-sy, cy * sx, cy * cx]])

    for deg in ([0, 0, 45], [30, -20, 10], [90, 0, 0], [0, 90, 0],
                [12.5, 77, -133]):
        R_py = euler_to_matrix(*[math.radians(a) for a in deg])
        assert np.allclose(R_py, js_euler(deg), atol=1e-12)
