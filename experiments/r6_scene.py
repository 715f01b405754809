"""Round-6: scene-stage variance check -- the shipped bench recorded
mean-shift scene detect at 44.2k pts/s vs 75.5k mid-round while Hough3D
(same feature extraction) got FASTER.  Re-measure both back ends N times
on the same scene/model to separate variance from regression, and A/B
the dense-vs-gather tiled descriptor routing (PCD_DENSE_DESC)."""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import shapes
import hard_shapes

from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
from point_cloud_donkey_tpu.utils.config import IsmConfig
from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd

T0 = time.perf_counter()
print(json.dumps({"device": str(jax.devices()[0])}), flush=True)


def stamp(msg):
    print(f"[exp {time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


rng = np.random.default_rng(42)
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         "bench_cache")
tmp = tempfile.mkdtemp()

scfg = {"ObjectConfig": {"Children": {
    "Clustering": {"Type": "None"},
    "Codebook": {"Children": {"ActivationStrategy": {
        "Parameters": {"K": 1}, "Type": "KNN"}}},
    "FeatureWeighting": {"Type": "Uniform"},
    "Features": {"Parameters": {
        "Radius": 0.6, "ReferenceFrameRadius": 0.5},
        "Type": "SHORT_SHOT"},
    "GlobalFeatures": {"Type": "Dummy"},
    "Keypoints": {"Parameters": {"LeafSize": 0.3}, "Type": "VoxelGrid"},
    "Voting": {"Parameters": {
        "Bandwidth": 0.6, "SingleObjectMode": False,
        "MinThreshold": -0.2, "MaxFilterType": "Merge",
        "MinVotesThreshold": 3}, "Type": "MeanShift"}},
    "Parameters": {"DistanceType": "ChiSquared",
                   "BoundingBoxType": "AABB"}}}
# replicate bench.py's scene model + scene EXACTLY (same rng draws order
# does not matter for the timing comparison; accuracy is asserted anyway)
ism_s = ImplicitShapeModel(IsmConfig.from_json(scfg))
s_clouds, s_labels = [], []
for cid in (2, 4):
    for j in range(2):
        pts = shapes.make_instance(rng, cid, n=2000, rotate=False)
        p = os.path.join(tmp, f"s{cid}{j}.pcd")
        save_pcd(p, PointCloud(xyz=pts))
        ism_s.add_training_model(p, cid, cid)
        s_clouds.append(pts)
        s_labels.append(cid)
ism_s = hard_shapes.load_or_train(ism_s, scfg, s_clouds, s_labels, cache_dir)

obj_specs = [(2, (0.0, 0.0, 0.0)), (2, (4.0, -2.5, 0.0)),
             (4, (5.0, 0.0, 0.0)), (4, (-3.5, 2.0, 0.0))]
parts, gts = [], []
for cid_o, off in obj_specs:
    pts_o = shapes.make_instance(rng, cid_o, n=10000, rotate=False) \
        + np.asarray(off, np.float32)
    parts.append(pts_o)
    gts.append((cid_o, pts_o.mean(0)))
gx = rng.uniform(-6, 9, 70000)
gy = rng.uniform(-6, 6, 70000)
ground = np.stack([gx, gy, np.full_like(gx, -1.2)
                   + rng.normal(scale=0.01, size=gx.shape)], 1)
clutter = rng.uniform(-3, 8, (10000, 3)) * [1, 1, 0.1] + [0, 4.5, 1.5]
scene = np.concatenate(parts + [ground, clutter]).astype(np.float32)
stamp("scene ready")

ism_s.detect(scene)  # compile
stamp("compiled")
for rep in range(4):
    t0 = time.perf_counter()
    maxima_s, _ = ism_s.detect(scene)
    dt = time.perf_counter() - t0
    found = sum(1 for cid_gt, pos_gt in gts
                if any(m.class_id == cid_gt
                       and np.linalg.norm(m.position - pos_gt) < 0.8
                       for m in maxima_s))
    print(json.dumps({"rep": rep, "pts_per_sec": round(len(scene) / dt, 0),
                      "recall": found / len(gts)}), flush=True)
    stamp(f"rep {rep}")
