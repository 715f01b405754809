"""Round-6: decompose the training activation stage (train_codebook) at
the bench workload -- kNN activation vs vote recording vs sigma stats vs
codebook assembly -- plus the fused feature-extraction stage pieces."""

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import shapes

from point_cloud_donkey_tpu.models import codebook as cbm
from point_cloud_donkey_tpu.models.detect_batch import (
    extract_local_features_batch)
from point_cloud_donkey_tpu.models.features import FeatureConfig
from point_cloud_donkey_tpu.models.codebook import (CodebookParams,
                                                    train_codebook,
                                                    training_activation)
from point_cloud_donkey_tpu.utils.config import ComponentConfig
from point_cloud_donkey_tpu.ops import geometry as geo

N, TRAIN_N = 2048, 24
T0 = time.perf_counter()
print(json.dumps({"device": str(jax.devices()[0])}), flush=True)


def stamp(msg):
    print(f"[exp {time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


os.environ["PCD_TRAIN_FUSED"] = "1"
rng = np.random.default_rng(42)
clouds = [shapes.make_instance(rng, i % 5, n=N, rotate=True, noise=0.005)
          for i in range(TRAIN_N)]
classes = [i % 5 for i in range(TRAIN_N)]

fcfg = FeatureConfig(type="SHOT", radius=0.6, ref_frame_radius=0.5,
                     ref_frame_type="SHOT")
kp_cfg = ComponentConfig(type="VoxelGrid", params={"LeafSize": 0.35})


def run_extract():
    t0 = time.perf_counter()
    fs = extract_local_features_batch(
        clouds, [None] * TRAIN_N, [None] * TRAIN_N, fcfg, kp_cfg,
        0.25, 2, is_training=True, chunk_width=TRAIN_N)
    return fs, (time.perf_counter() - t0) * 1000


fs_list, _ = run_extract()     # warm / compile
fs_list, ms = run_extract()
print(json.dumps({"stage": "features_fused", "ms": round(ms, 1),
                  "ms_per_cloud": round(ms / TRAIN_N, 2),
                  "n_features": int(sum(f.descriptors.shape[0]
                                        for f in fs_list))}), flush=True)
stamp("features")

# boxes (AABB host)
boxes = []
for c in clouds:
    lo, hi = c.min(0), c.max(0)
    boxes.append(geo.BoundingBox(position=(lo + hi) / 2.0, size=hi - lo,
                                 quat=np.array([1, 0, 0, 0], np.float32)))

all_desc = np.concatenate([f.descriptors for f in fs_list], axis=0)
centers = all_desc.copy()
cw_pos = np.concatenate([f.positions for f in fs_list], axis=0)
params = CodebookParams(knn_k=1)


def act_only():
    t0 = time.perf_counter()
    d, i = training_activation(all_desc, centers, params, "chisq")
    return (time.perf_counter() - t0) * 1000


act_only()
ms_act = act_only()
print(json.dumps({"stage": "knn_activation_only", "ms": round(ms_act, 1),
                  "ms_per_cloud": round(ms_act / TRAIN_N, 2),
                  "f": int(all_desc.shape[0])}), flush=True)
stamp("activation knn")


def full_cb():
    t0 = time.perf_counter()
    cb = train_codebook(fs_list, classes, classes, boxes, centers, cw_pos,
                        params, "chisq")
    return cb, (time.perf_counter() - t0) * 1000


cb, _ = full_cb()
cb, ms_full = full_cb()
print(json.dumps({"stage": "train_codebook_full", "ms": round(ms_full, 1),
                  "ms_per_cloud": round(ms_full / TRAIN_N, 2),
                  "rest_ms": round(ms_full - ms_act, 1),
                  "codewords": int(cb.codewords.shape[0])}), flush=True)
stamp("train_codebook")

import cProfile, pstats, io
pr = cProfile.Profile()
pr.enable()
cb, ms2 = full_cb()
pr.disable()
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(22)
print(json.dumps({"stage": "profile_ms", "ms": round(ms2, 1)}), flush=True)
for line in s.getvalue().splitlines()[4:30]:
    print(line, file=sys.stderr)
