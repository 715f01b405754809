"""Round-5: training-stage profile on the real TPU (bench geometry,
TRAIN_N=24 clouds, warm programs) -- the training analogue of
PROFILE_TPU.md (VERDICT r4 next #3)."""

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

from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
from point_cloud_donkey_tpu.utils.config import IsmConfig
from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd

N, TRAIN_N = 2048, 24
T0 = time.perf_counter()
print(json.dumps({"device": str(jax.devices()[0])}), flush=True)

config = {"ObjectConfig": {"Children": {
    "Clustering": {"Type": "None"},
    "Codebook": {"Children": {"ActivationStrategy": {
        "Parameters": {"K": 1}, "Type": "KNN"}}},
    "FeatureWeighting": {"Type": "Uniform"},
    "Features": {"Parameters": {"Radius": 0.6, "ReferenceFrameRadius": 0.5,
                                "ReferenceFrameType": "SHOT"},
                 "Type": "SHOT"},
    "GlobalFeatures": {"Type": "Dummy"},
    "Keypoints": {"Parameters": {"LeafSize": 0.35}, "Type": "VoxelGrid"},
    "Voting": {"Parameters": {"Bandwidth": 0.5, "SingleObjectMode": True,
                              "SingleObjectMaxType": "BandwidthVotes"},
               "Type": "MeanShift"}},
    "Parameters": {"DistanceType": "ChiSquared", "NormalRadius": 0.25,
                   "ConsistentNormalsMethod": 2, "BoundingBoxType": "AABB"}}}

rng = np.random.default_rng(42)
tmp = tempfile.mkdtemp()


def build(tag):
    ism = ImplicitShapeModel(IsmConfig.from_json(config))
    for i in range(TRAIN_N):
        cid = i % 5
        pts = shapes.make_instance(rng, cid, n=N, rotate=True, noise=0.005)
        p = os.path.join(tmp, f"{tag}{i}.pcd")
        save_pcd(p, PointCloud(xyz=pts))
        ism.add_training_model(p, cid, cid)
    return ism


# warm pass (compiles), then measured pass
ism_w = build("w")
ism_w.train()
print(json.dumps({"phase": "warm",
                  "stage_ms_per_cloud": {
                      k: round(v * 1000 / TRAIN_N, 2)
                      for k, v in sorted(ism_w.processing_times.items())
                      if k.startswith("train_")}}), flush=True)
print(f"[{time.perf_counter()-T0:6.1f}s] warm", file=sys.stderr, flush=True)

ism_t = build("t")
t0 = time.perf_counter()
ism_t.train()
dt = time.perf_counter() - t0
print(json.dumps({"phase": "measured",
                  "clouds_per_sec": round(TRAIN_N / dt, 2),
                  "stage_ms_per_cloud": {
                      k: round(v * 1000 / TRAIN_N, 2)
                      for k, v in sorted(ism_t.processing_times.items())
                      if k.startswith("train_")}}), flush=True)
print(f"[{time.perf_counter()-T0:6.1f}s] measured", file=sys.stderr,
      flush=True)
