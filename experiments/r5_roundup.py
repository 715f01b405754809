"""Round-5 roundup on the real TPU: votes stage with the recurrence
feature map, the fused-descriptor headline end-to-end, and the training
profile after fetch batching + wide chunks."""

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
import hard_shapes

B, N, K = 128, 2048, 192
ROUNDS = 8
T0 = time.perf_counter()


def stamp(msg):
    print(f"[exp {time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def timeit(name, fn, *args, extra=None):
    try:
        out = fn(*args)
        np.asarray(jax.device_get(out))
        t0 = time.perf_counter()
        for _ in range(ROUNDS):
            out = fn(*args)
        np.asarray(jax.device_get(out))
        ms = (time.perf_counter() - t0) / ROUNDS * 1000.0
        rec = {"stage": name, "ms": round(ms, 2),
               "clouds_per_sec": round(B * 1000.0 / ms, 1)}
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)
        stamp(name)
        return ms
    except Exception as e:
        print(json.dumps({"stage": name, "error": str(e)[:300]}), flush=True)
        stamp(f"{name} FAILED")
        return None


print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
rng = np.random.default_rng(42)
for cid in range(5):
    _ = shapes.make_instance(rng, cid, n=N, rotate=False, noise=0.005)
clouds = np.stack([shapes.make_instance(rng, i % 5, n=N, rotate=True)
                   for i in range(B)])
mask = np.ones((B, N), bool)
pts_j, mask_j = jnp.asarray(clouds), jnp.asarray(mask)
labels = np.arange(B) % 5

from point_cloud_donkey_tpu.models.codebook import CodebookParams
from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
from point_cloud_donkey_tpu.models.pipeline_jit import (
    JitPipelineConfig, classify_scores, classify_scores_batch,
    extract_features_jit)
from point_cloud_donkey_tpu.ops.neighbors import knn
from point_cloud_donkey_tpu.utils.config import IsmConfig
from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd

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
ism = ImplicitShapeModel(IsmConfig.from_json(config))
tmp = tempfile.mkdtemp()
tr_clouds, tr_labels = [], []
rng2 = np.random.default_rng(42)
for cid in range(5):
    pts = shapes.make_instance(rng2, cid, n=N, rotate=False, noise=0.005)
    p = os.path.join(tmp, f"t{cid}.pcd")
    save_pcd(p, PointCloud(xyz=pts))
    ism.add_training_model(p, cid, cid)
    tr_clouds.append(pts)
    tr_labels.append(cid)
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         "bench_cache")
ism = hard_shapes.load_or_train(ism, config, tr_clouds, tr_labels, cache_dir)
cb = jax.tree_util.tree_map(jnp.asarray, ism.state.codebook)
params = CodebookParams(knn_k=1)
cfg = JitPipelineConfig(
    descriptor="SHOT", radius=0.6, ref_frame_radius=0.5, leaf_size=0.35,
    normal_radius=0.25, normals_method=2, metric="chisq", knn_k=1,
    keypoint_capacity=K, neighbor_capacity=896, bandwidth=0.5,
    num_classes=5)
stamp("model ready")

# votes-stage knn with recurrence feature map
feat = jax.jit(lambda p, m: jax.vmap(
    lambda pp, mm: extract_features_jit(pp, mm, cfg))(p, m))
kp, fr, desc, valid = feat(pts_j, mask_j)
np.asarray(jax.device_get(valid))
timeit("knn_vmapped_recurrence", jax.jit(lambda d: jnp.sum(jax.vmap(
    lambda dd: knn(dd, cb.codewords, cb.cw_mask, 1, "chisq",
                   exact=False)[0])(d))), desc)

# headline baseline vs fused-descriptor end to end
timeit("full_classify_dense", jax.jit(lambda p, m: jnp.sum(jax.vmap(
    lambda pp, mm: classify_scores(pp, mm, cb, cfg, params))(p, m))),
    pts_j, mask_j)

cfg_f = cfg._replace(fused_descriptor=True)


def full_fused(p, m):
    scores, _ = classify_scores_batch(p, m, cb, cfg_f, params)
    return jnp.sum(scores)


timeit("full_classify_fused_desc", jax.jit(full_fused), pts_j, mask_j)

# accuracy sanity of the fused path on the benchmark batch
scores, _ = jax.jit(
    lambda p, m: classify_scores_batch(p, m, cb, cfg_f, params))(pts_j,
                                                                 mask_j)
acc = float((np.asarray(scores).argmax(1) == labels).mean())
print(json.dumps({"stage": "fused_accuracy", "acc": acc}), flush=True)
stamp("fused accuracy")

# --- training profile after fetch batching + wide chunks --------------------
TRAIN_N = 24


def build(tag):
    ism2 = ImplicitShapeModel(IsmConfig.from_json(config))
    for i in range(TRAIN_N):
        cid = i % 5
        pts = shapes.make_instance(rng, cid, n=N, rotate=True, noise=0.005)
        p = os.path.join(tmp, f"{tag}{i}.pcd")
        save_pcd(p, PointCloud(xyz=pts))
        ism2.add_training_model(p, cid, cid)
    return ism2


ism_w = build("w")
ism_w.train()
stamp("train warm")
ism_t = build("t")
t0 = time.perf_counter()
ism_t.train()
dt = time.perf_counter() - t0
print(json.dumps({"stage": "train", "clouds_per_sec": round(TRAIN_N / dt, 2),
                  "stage_ms_per_cloud": {
                      k: round(v * 1000 / TRAIN_N, 2)
                      for k, v in sorted(ism_t.processing_times.items())
                      if k.startswith("train_")}}), flush=True)
stamp("train measured")
