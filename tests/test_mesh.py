"""OFF mesh ingestion (utils/mesh.py + cli/modelnet.py): the ModelNet
preprocessing step for the BASELINE parity run."""
import os

import numpy as np
import pytest

from point_cloud_donkey_tpu.utils.mesh import (load_off, off_to_cloud,
                                               sample_surface)

CUBE_VERTS = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                       [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]],
                      np.float32)
CUBE_QUADS = [(0, 3, 2, 1), (4, 5, 6, 7), (0, 1, 5, 4),
              (2, 3, 7, 6), (1, 2, 6, 5), (0, 4, 7, 3)]


def _write_cube_off(path, glued_header=False, comments=False):
    with open(path, "w") as f:
        if glued_header:
            f.write("OFF8 6 12\n")            # ModelNet quirk: counts glued
        else:
            f.write("OFF\n")
            if comments:
                f.write("# a unit cube\n")
            f.write("8 6 12\n")
        for v in CUBE_VERTS:
            f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for q in CUBE_QUADS:
            f.write("4 " + " ".join(map(str, q)) + "\n")


@pytest.mark.parametrize("glued", [False, True])
def test_load_off_cube(tmp_path, glued):
    p = str(tmp_path / "cube.off")
    _write_cube_off(p, glued_header=glued, comments=not glued)
    verts, faces = load_off(p)
    assert verts.shape == (8, 3) and np.allclose(verts, CUBE_VERTS)
    assert faces.shape == (12, 3)             # 6 quads fan-triangulated


def test_load_off_rejects_non_off(tmp_path):
    p = str(tmp_path / "bad.off")
    with open(p, "w") as f:
        f.write("PLY\n3 1 0\n")
    with pytest.raises(ValueError):
        load_off(p)


def test_sample_surface_on_cube(tmp_path):
    p = str(tmp_path / "cube.off")
    _write_cube_off(p)
    verts, faces = load_off(p)
    pts = sample_surface(verts, faces, 2000, seed=1)
    assert pts.shape == (2000, 3) and pts.dtype == np.float32
    # every sample lies ON the cube surface: some coordinate is 0 or 1
    on_face = (np.isclose(pts, 0.0, atol=1e-6)
               | np.isclose(pts, 1.0, atol=1e-6)).any(axis=1)
    assert on_face.all()
    inside = ((pts >= -1e-6) & (pts <= 1 + 1e-6)).all()
    assert inside
    # deterministic under the same seed
    assert np.array_equal(pts, sample_surface(verts, faces, 2000, seed=1))


def test_sample_surface_area_weighting():
    """Two triangles with 100:1 area ratio draw samples proportionally."""
    verts = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0],     # area 50
                      [20, 0, 0], [21, 0, 0], [20, 1, 0]],   # area 0.5
                     np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    pts = sample_surface(verts, faces, 4000, seed=2)
    frac_small = (pts[:, 0] >= 19.5).mean()
    assert frac_small == pytest.approx(1.0 / 101.0, abs=5e-3)


def test_off_to_cloud_unit_sphere(tmp_path):
    p = str(tmp_path / "cube.off")
    _write_cube_off(p)
    cloud = off_to_cloud(p, n_points=512, seed=3)
    r = np.linalg.norm(cloud.xyz, axis=1)
    assert r.max() == pytest.approx(1.0, abs=1e-5)
    assert np.abs(cloud.xyz.mean(axis=0)).max() < 0.05


def test_load_cloud_dispatches_off(tmp_path, monkeypatch):
    from point_cloud_donkey_tpu.utils.io import load_cloud
    p = str(tmp_path / "cube.off")
    _write_cube_off(p)
    monkeypatch.setenv("PCD_OFF_POINTS", "256")
    cloud = load_cloud(p)
    assert cloud.xyz.shape == (256, 3)


def test_modelnet_cli_generates_lists_and_pcds(tmp_path):
    """End-to-end: a fake ModelNet tree -> PCDs + parseable file lists that
    train/classify through eval_classification's input layer."""
    from point_cloud_donkey_tpu.cli.modelnet import main
    from point_cloud_donkey_tpu.utils.io import load_cloud, parse_file_list
    root = tmp_path / "ModelNet2"
    for cls in ("chair", "table"):
        for split, n in (("train", 2), ("test", 1)):
            d = root / cls / split
            d.mkdir(parents=True)
            for i in range(n):
                _write_cube_off(str(d / f"{cls}_{i:04d}.off"))
    out = tmp_path / "out"
    assert main([str(root), str(out), "--n-points", "128", "--seed", "7"]) == 0
    fl = parse_file_list(str(out / "train.txt"))
    assert fl.mode == "train" and len(fl.filenames) == 4
    assert sorted(fl.class_map) == ["chair", "table"]
    fl_t = parse_file_list(str(out / "test.txt"), class_map=fl.class_map)
    assert fl_t.mode == "test" and len(fl_t.filenames) == 2
    for fn in fl.filenames + fl_t.filenames:
        assert os.path.exists(fn)
        assert load_cloud(fn).xyz.shape == (128, 3)


def _write_box_off(path, a, b, c):
    """An a x b x c box mesh (aspect survives unit-sphere normalization)."""
    v = CUBE_VERTS * np.array([a, b, c], np.float32)
    with open(path, "w") as f:
        f.write("OFF\n8 6 12\n")
        for vv in v:
            f.write(f"{vv[0]} {vv[1]} {vv[2]}\n")
        for q in CUBE_QUADS:
            f.write("4 " + " ".join(map(str, q)) + "\n")


def _write_tetra_off(path, h=1.0):
    v = np.array([[0, 0, 0], [1, 0, 0], [0.5, 0.9, 0], [0.5, 0.3, h]],
                 np.float32)
    faces = [(0, 2, 1), (0, 1, 3), (1, 2, 3), (2, 0, 3)]
    with open(path, "w") as f:
        f.write("OFF\n4 4 6\n")
        for vv in v:
            f.write(f"{vv[0]} {vv[1]} {vv[2]}\n")
        for fa in faces:
            f.write("3 " + " ".join(map(str, fa)) + "\n")


def test_modelnet_dress_rehearsal(tmp_path):
    """Full ModelNet-shaped chain on generated meshes: .off tree ->
    cli.modelnet lists -> eval_classification -t (train) -> -d (classify)
    -> summary.txt accuracy.  This is the exact command sequence a real
    ModelNet10/40 run uses (README 'ModelNet' section; the datasets
    themselves are not shipped in this environment)."""
    import json

    from point_cloud_donkey_tpu.cli import eval_classification as ec
    from point_cloud_donkey_tpu.cli.modelnet import main as modelnet_main

    root = tmp_path / "ModelNet3"
    makers = {
        "cube": lambda p, i: _write_box_off(p, 1.0, 1.0 + 0.03 * i,
                                            1.0 - 0.02 * i),
        "plank": lambda p, i: _write_box_off(p, 2.0 + 0.05 * i, 0.9,
                                             0.18 + 0.01 * i),
        "tetra": lambda p, i: _write_tetra_off(p, 0.9 + 0.05 * i),
    }
    for cls, mk in makers.items():
        for split, n in (("train", 3), ("test", 2)):
            d = root / cls / split
            d.mkdir(parents=True)
            for i in range(n):
                mk(str(d / f"{cls}_{i:04d}.off"), i)
    out = tmp_path / "lists"
    assert modelnet_main([str(root), str(out), "--n-points", "512",
                          "--seed", "5"]) == 0

    config = {"ObjectConfig": {"Children": {
        "Clustering": {"Type": "None"},
        "Codebook": {"Children": {"ActivationStrategy": {
            "Parameters": {"K": 1}, "Type": "KNN"}}},
        "FeatureWeighting": {"Type": "Uniform"},
        "Features": {"Parameters": {"Radius": 0.4,
                                    "ReferenceFrameRadius": 0.35},
                     "Type": "SHOT"},
        "GlobalFeatures": {"Type": "Dummy"},
        "Keypoints": {"Parameters": {"LeafSize": 0.25},
                      "Type": "VoxelGrid"},
        "Voting": {"Parameters": {
            "Bandwidth": 0.4, "SingleObjectMode": True,
            "SingleObjectMaxType": "BandwidthVotes"}, "Type": "MeanShift"}},
        "Parameters": {"DistanceType": "ChiSquared", "NormalRadius": 0.2,
                       "ConsistentNormalsMethod": 2,
                       "BoundingBoxType": "AABB"}}}
    cfg_path = tmp_path / "mn.ism"
    cfg_path.write_text(json.dumps(config))
    model = tmp_path / "mn_model"
    res = tmp_path / "results"
    assert ec.main(["-t", str(cfg_path), "-f", str(out / "train.txt"),
                    "-o", str(model)]) == 0
    assert ec.main(["-d", str(model) + ".ism", "-f", str(out / "test.txt"),
                    "-o", str(res)]) == 0
    summary = (res / "summary.txt").read_text()
    import re
    m = re.search(r"Accuracy: (\d+) %", summary)
    assert m, summary[:400]
    assert int(m.group(1)) == 100, summary[:800]
