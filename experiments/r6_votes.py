"""Round-6: the votes stage is ~entirely the chi2 kNN feature-map matmul
(9.8 of 10.4 ms standalone, PROFILE_TPU.md).  Measure the map order n and
matmul precision against top-1 agreement with the EXACT chi2 distance on
real bench descriptors + codebook, then the full knn cost per variant.

Prints one JSON line per measurement."""

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
from point_cloud_donkey_tpu.models.pipeline_jit import (JitPipelineConfig,
                                                        extract_features_jit)
from point_cloud_donkey_tpu.ops import neighbors

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
cw = np.asarray(ism.state.codebook.codewords, np.float32) \
    if hasattr(ism.state.codebook, "codewords") else None
if cw is None:
    # find the descriptor matrix on the codebook state
    cb = ism.state.codebook
    for name in ("codewords", "descriptors", "codeword_data"):
        if hasattr(cb, name):
            cw = np.asarray(getattr(cb, name), np.float32)
            break
print(json.dumps({"codebook_shape": list(cw.shape)}), flush=True)
stamp("model ready")

cfg = JitPipelineConfig(
    descriptor="SHOT", radius=0.6, ref_frame_radius=0.5, leaf_size=0.35,
    normal_radius=0.25, normals_method=2, metric="chisq", knn_k=1,
    keypoint_capacity=192, neighbor_capacity=896, bandwidth=0.5,
    num_classes=5)

clouds = np.stack([shapes.make_instance(rng, i % 5, n=N, rotate=True)
                   for i in range(B)])
mask = np.ones((B, N), bool)

ext = jax.jit(jax.vmap(lambda p, m: extract_features_jit(p, m, cfg)))
kp, fr, desc, valid = ext(jnp.asarray(clouds), jnp.asarray(mask))
desc_h = np.asarray(desc).reshape(-1, desc.shape[-1])
valid_h = np.asarray(valid).reshape(-1)
print(json.dumps({"queries": int(valid_h.sum()),
                  "q_total": len(desc_h)}), flush=True)
stamp("descriptors ready")

q_j = jnp.asarray(desc_h)
cw_j = jnp.asarray(cw)
cmask = jnp.ones(cw.shape[0], bool)

# exact reference (host chunked -- only for agreement, not timed)
d_exact = neighbors.chi_square_distance_np(desc_h[valid_h], cw)
idx_exact = d_exact.argmin(1)
stamp("exact reference done")


def variant(n, prec):
    def f(q, db):
        fa = neighbors.chi2_feature_map(q, n=n)
        fb = neighbors.chi2_feature_map(db, n=n)
        k2 = jax.lax.dot_general(fa, fb, (((1,), (1,)), ((), ())),
                                 precision=prec)
        d = jnp.sum(q, axis=-1)[:, None] + jnp.sum(db, axis=-1)[None, :] \
            - 2.0 * k2
        d = jnp.maximum(d, 0.0)
        neg, idx = jax.lax.top_k(-d, 1)
        return -neg, idx
    return jax.jit(f)


for n in (5, 4, 3):
    for pname, prec in (("HIGH", jax.lax.Precision.HIGH),
                        ("DEFAULT", jax.lax.Precision.DEFAULT)):
        fn = variant(n, prec)
        d1, i1 = fn(q_j, cw_j)
        i_h = np.asarray(i1)[:, 0][valid_h]
        agree = float((i_h == idx_exact).mean())
        np.asarray(d1)
        t0 = time.perf_counter()
        for _ in range(ROUNDS):
            d1, i1 = fn(q_j, cw_j)
        np.asarray(d1[:1])
        ms = (time.perf_counter() - t0) / ROUNDS * 1000.0
        # mean relative distance error on the matched pairs
        dsel = np.asarray(d1)[:, 0][valid_h]
        derr = float(np.mean(np.abs(dsel - d_exact[np.arange(len(idx_exact)),
                                                   i_h])
                             / np.maximum(d_exact.min(1), 1e-9)))
        print(json.dumps({"stage": "knn", "n": n, "prec": pname,
                          "ms": round(ms, 2), "top1_agree": round(agree, 5),
                          "rel_dist_err": round(derr, 5)}), flush=True)
        stamp(f"n={n} {pname}")
