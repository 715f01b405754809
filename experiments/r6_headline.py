"""Round-6: end-to-end classify variants at the bench geometry on the
real chip: dense fused (round-5 headline) vs sorted-axis windowed normals
(lax.sort payload path) vs + windowed fused descriptors.  Prints one JSON
line per measurement."""

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

from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
from point_cloud_donkey_tpu.utils.config import IsmConfig
from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd
from point_cloud_donkey_tpu.models.codebook import CodebookParams
from point_cloud_donkey_tpu.models.pipeline_jit import (JitPipelineConfig,
                                                        classify_scores_batch)
from point_cloud_donkey_tpu.ops import binned
from point_cloud_donkey_tpu.ops.voxel_grid import voxel_grid

B, N = 128, 2048
ROUNDS = 8
T0 = time.perf_counter()
print(json.dumps({"device": str(jax.devices()[0])}), flush=True)


def stamp(msg):
    print(f"[exp {time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


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
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         "bench_cache")
ism = ImplicitShapeModel(IsmConfig.from_json(config))
tmp = tempfile.mkdtemp()
tr_clouds, tr_labels = [], []
for cid in range(5):
    pts = shapes.make_instance(rng, cid, n=N, rotate=False, noise=0.005)
    p = os.path.join(tmp, f"t{cid}.pcd")
    save_pcd(p, PointCloud(xyz=pts))
    ism.add_training_model(p, cid, cid)
    tr_clouds.append(pts)
    tr_labels.append(cid)
ism = hard_shapes.load_or_train(ism, config, tr_clouds, tr_labels, cache_dir)
cb = jax.tree_util.tree_map(jnp.asarray, ism.state.codebook)
params = CodebookParams(knn_k=1)
stamp("model ready")

clouds = np.stack([shapes.make_instance(rng, i % 5, n=N, rotate=True)
                   for i in range(B)])
mask = np.ones((B, N), bool)
labels = np.arange(B) % 5
pts_j, mask_j = jnp.asarray(clouds), jnp.asarray(mask)

# calibrate windows
nw = binned.required_window(pts_j, mask_j, 0.25, tile_q=256, align=128)
kres = jax.jit(jax.vmap(lambda p, m: voxel_grid(p, m, 0.35, capacity=192))
               )(pts_j, mask_j)
kp = jnp.where(kres.mask[..., None], kres.centroids[..., :3], 1e9)
dw = binned.required_window(pts_j, mask_j, 0.6, tile_q=8, align=128,
                            q_points=kp, q_mask=kres.mask)
print(json.dumps({"normals_window": int(nw), "descriptor_window": int(dw)}),
      flush=True)
stamp("calibrated")

base = JitPipelineConfig(
    descriptor="SHOT", radius=0.6, ref_frame_radius=0.5, leaf_size=0.35,
    normal_radius=0.25, normals_method=2, metric="chisq", knn_k=1,
    keypoint_capacity=192, neighbor_capacity=896, bandwidth=0.5,
    num_classes=5, fused_descriptor=True)

from point_cloud_donkey_tpu.ops.pallas.shot_fused import (
    required_tile_capacity)
t_cap = required_tile_capacity(np.asarray(kres.mask))
print(json.dumps({"tile_capacity": int(t_cap),
                  "dense_tiles": B * 192 // 8}), flush=True)

variants = [
    ("fused_dense_r5", base),
    ("fused_nwin", base._replace(normals_window=int(nw))),
    ("fused_compact", base._replace(descriptor_tile_capacity=int(t_cap))),
    ("fused_nwin_compact", base._replace(
        normals_window=int(nw), descriptor_tile_capacity=int(t_cap))),
]

for name, cfg in variants:
    try:
        step = jax.jit(lambda p, m, c=cfg: classify_scores_batch(
            p, m, cb, c, params))
        scores, exact = step(pts_j, mask_j)
        s = np.asarray(scores)
        ok = bool(np.asarray(exact))
        acc = float((s.argmax(1) == labels).mean())
        t0 = time.perf_counter()
        for _ in range(ROUNDS):
            scores, exact = step(pts_j, mask_j)
        np.asarray(scores)
        ms = (time.perf_counter() - t0) / ROUNDS * 1000.0
        print(json.dumps({"stage": name, "ms": round(ms, 2),
                          "clouds_per_sec": round(B / ms * 1000.0, 1),
                          "exact": ok, "acc": acc}), flush=True)
        stamp(name)
    except Exception as e:
        print(json.dumps({"stage": name, "error": str(e)[:400]}), flush=True)
        stamp(f"{name} FAILED")
