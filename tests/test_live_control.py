"""Tests for the interactive run-control channel (viz/control.py)."""

import json
import os
import threading
import time
import urllib.request

import numpy as np
import pytest

from point_cloud_donkey_tpu.viz.control import LiveControl, StopRequested


def _ctl(tmp_path, **kw):
    return LiveControl(str(tmp_path / "control.json"), poll_s=0.01, **kw)


def test_pause_step_resume(tmp_path):
    ctl = _ctl(tmp_path)
    seen = []
    done = threading.Event()

    def run():
        for i in range(3):
            ctl(f"e{i}", {})
            seen.append(i)
        done.set()

    ctl.push("pause")
    t = threading.Thread(target=run, daemon=True)
    t.start()
    time.sleep(0.2)
    assert seen == []           # the gate blocks INSIDE event 0
    ctl.push("step")            # one event through, still paused
    time.sleep(0.2)
    assert seen == [0]
    ctl.push("resume")
    assert done.wait(2.0)
    assert seen == [0, 1, 2]
    status = json.load(open(str(tmp_path / "status.json")))
    assert status["n_events"] == 3 and status["paused"] is False


def test_file_command_consumed_once(tmp_path):
    ctl = _ctl(tmp_path)
    path = str(tmp_path / "control.json")
    with open(path, "w") as f:
        json.dump({"cmd": "dump"}, f)  # non-blocking command for this test
    ctl("e", {"x": 1})  # consumes the file and applies the command
    assert not os.path.exists(path)
    assert os.path.exists(str(tmp_path / "inspect.json"))
    ctl("e2", {})  # no file left: nothing re-applied
    d = json.load(open(str(tmp_path / "inspect.json")))
    assert d["event"] == "e"


def test_stop_raises(tmp_path):
    ctl = _ctl(tmp_path)
    ctl.push("stop")
    with pytest.raises(StopRequested):
        ctl("e", {})


def test_dump_inspect(tmp_path):
    ctl = _ctl(tmp_path)
    ctl.push("dump")
    ctl("features", {"xyz": np.arange(12.0).reshape(4, 3), "file": "a.pcd"})
    d = json.load(open(str(tmp_path / "inspect.json")))
    assert d["event"] == "features"
    assert d["payload"]["xyz"]["shape"] == [4, 3]
    assert d["payload"]["file"] == "a.pcd"


def test_http_endpoint(tmp_path):
    ctl = _ctl(tmp_path)
    port = ctl.serve(0)
    try:
        ctl("e", {})  # write a status
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/status", timeout=5) as r:
            st = json.loads(r.read())
        assert st["n_events"] == 1
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/cmd?c=pause", method="POST")
        with urllib.request.urlopen(req, timeout=5) as r:
            assert json.loads(r.read())["ok"] is True
        ctl.push("resume")  # neutralize for the next event
        ctl("e2", {})
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=5) as r:
            assert b"run control" in r.read()
    finally:
        ctl.close()


def test_abort_training_run(tmp_path):
    """`stop` aborts a real ImplicitShapeModel.train() via the event gate."""
    import shapes
    from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
    from point_cloud_donkey_tpu.utils.config import IsmConfig
    from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd

    config = {"ObjectConfig": {"Children": {
        "Clustering": {"Type": "None"},
        "Codebook": {"Children": {"ActivationStrategy": {
            "Parameters": {"K": 1}, "Type": "KNN"}}},
        "FeatureWeighting": {"Type": "Uniform"},
        "Features": {"Parameters": {
            "Radius": 0.6, "ReferenceFrameRadius": 0.5,
            "ReferenceFrameType": "SHOT"}, "Type": "SHOT"},
        "GlobalFeatures": {"Type": "Dummy"},
        "Keypoints": {"Parameters": {"LeafSize": 0.35}, "Type": "VoxelGrid"},
        "Voting": {"Parameters": {"Bandwidth": 0.5}, "Type": "MeanShift"}},
        "Parameters": {"DistanceType": "ChiSquared", "NormalRadius": 0.25,
                       "ConsistentNormalsMethod": 2,
                       "BoundingBoxType": "AABB"}}}
    rng = np.random.default_rng(0)
    ism = ImplicitShapeModel(IsmConfig.from_json(config))
    for cid in (1, 2):
        pts = shapes.make_instance(rng, cid, n=256, rotate=False)
        p = str(tmp_path / f"t{cid}.pcd")
        save_pcd(p, PointCloud(xyz=pts))
        ism.add_training_model(p, cid, cid)

    ctl = _ctl(tmp_path)
    ctl.push("stop")
    ism.connect(ctl)
    with pytest.raises(StopRequested):
        ism.train()
