"""Round-6: stage anatomy of the NEW headline program (sorted batch +
windowed normals + tile-compacted fused SHOT + flat votes) with honest
scalar-sum sync, plus an in-pipeline A/B of the chi2 feature-map matmul
precision (PCD_CHI2_PREC) on the full headline.  Run on the real chip."""

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
from point_cloud_donkey_tpu.models.pipeline_jit import (
    JitPipelineConfig, classify_scores_batch, _pre_descriptor,
    _scores_from_features_flat)
from point_cloud_donkey_tpu.ops import binned
from point_cloud_donkey_tpu.ops.pallas.shot_fused import (
    required_tile_capacity, shot_descriptor_fused_compact)
from point_cloud_donkey_tpu.ops.voxel_grid import voxel_grid

B, N = 128, 2048
ROUNDS = 8
T0 = time.perf_counter()
print(json.dumps({"device": str(jax.devices()[0])}), flush=True)


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
        rec = {"stage": name, "ms": round(ms, 2)}
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)
        stamp(name)
    except Exception as e:
        print(json.dumps({"stage": name, "error": str(e)[:300]}), flush=True)
        stamp(f"{name} FAILED")


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

nw = binned.required_window(pts_j, mask_j, 0.25, tile_q=256, align=128)
kres = jax.jit(jax.vmap(lambda p, m: voxel_grid(p, m, 0.35, capacity=192))
               )(pts_j, mask_j)
tcap = required_tile_capacity(np.asarray(kres.mask))
print(json.dumps({"nwin": int(nw), "tcap": int(tcap)}), flush=True)

cfg = JitPipelineConfig(
    descriptor="SHOT", radius=0.6, ref_frame_radius=0.5, leaf_size=0.35,
    normal_radius=0.25, normals_method=2, metric="chisq", knn_k=1,
    keypoint_capacity=192, neighbor_capacity=896, bandwidth=0.5,
    num_classes=5, fused_descriptor=True, normals_window=int(nw),
    descriptor_tile_capacity=int(tcap))

# --- stage programs (each ends in a scalar sum; honest sync) ---------------
timeit("sort", jax.jit(
    lambda p, m: jnp.sum(binned.sort_clouds_ex(p, m)[0])), pts_j, mask_j)

pts_s, mask_s, keys_s, order, axis = jax.jit(binned.sort_clouds_ex)(
    pts_j, mask_j)
np.asarray(jax.device_get(pts_s))

timeit("normals_windowed", jax.jit(
    lambda p, m, k: jnp.sum(binned.compute_normals_fast_windowed(
        p, m, k, 0.25, int(nw))[0])), pts_s, mask_s, keys_s)

nrm_s, _ = jax.jit(lambda p, m, k: binned.compute_normals_fast_windowed(
    p, m, k, 0.25, int(nw)))(pts_s, mask_s, keys_s)
np.asarray(jax.device_get(nrm_s[0, 0]))

timeit("voxel", jax.jit(lambda p, m: jnp.sum(jax.vmap(
    lambda pp, mm: voxel_grid(pp, mm, 0.35, capacity=192).centroids
)(p, m))), pts_s, mask_s)


def pre_all(p, m, nr):
    def pre(pp, mm, nn):
        kp, _, lrf, nr2 = _pre_descriptor(pp, mm, cfg, None, nn)
        return kp, lrf.frames, lrf.valid, nr2
    return jax.vmap(pre)(p, m, nr)


timeit("voxel_plus_kplrf", jax.jit(
    lambda p, m, nr: jnp.sum(pre_all(p, m, nr)[1])), pts_s, mask_s, nrm_s)

kp, frames, f_valid, _ = jax.jit(pre_all)(pts_s, mask_s, nrm_s)
np.asarray(jax.device_get(kp[0, 0]))
kp_m = kp[..., 0] < 1e9

timeit("desc_compact", jax.jit(
    lambda kpx, fr, fv, km, p, nr, m: jnp.sum(
        shot_descriptor_fused_compact(kpx, fr, fv, km, p, nr, m, 0.6,
                                      int(tcap))[0])),
       kp, frames, f_valid, kp_m, pts_s, nrm_s, mask_s)

desc, valid, kp_f, fr_f, cloud_id, _ = jax.jit(
    lambda kpx, fr, fv, km, p, nr, m: shot_descriptor_fused_compact(
        kpx, fr, fv, km, p, nr, m, 0.6, int(tcap)))(
        kp, frames, f_valid, kp_m, pts_s, nrm_s, mask_s)
np.asarray(jax.device_get(desc[0, 0]))

timeit("votes_scores_flat", jax.jit(
    lambda p, m, k_, f_, d_, v_, c_: jnp.sum(_scores_from_features_flat(
        p, m, k_, f_, d_, v_, c_, B, cb, cfg, params))),
       pts_s, mask_s, kp_f, fr_f, desc, valid, cloud_id)

# --- full headline + chi2 precision A/B ------------------------------------
for prec in ("", "default"):
    if prec:
        os.environ["PCD_CHI2_PREC"] = prec
    else:
        os.environ.pop("PCD_CHI2_PREC", None)
    try:
        step = jax.jit(lambda p, m: classify_scores_batch(p, m, cb, cfg,
                                                          params))
        scores, exact = step(pts_j, mask_j)
        s0 = np.asarray(scores)
        acc = float((s0.argmax(1) == labels).mean())
        t0 = time.perf_counter()
        for _ in range(ROUNDS):
            scores, exact = step(pts_j, mask_j)
        np.asarray(scores)
        ms = (time.perf_counter() - t0) / ROUNDS * 1000.0
        print(json.dumps({"stage": f"headline_prec_{prec or 'high'}",
                          "ms": round(ms, 2),
                          "clouds_per_sec": round(B / ms * 1000, 1),
                          "acc": acc,
                          "exact": bool(np.asarray(exact))}), flush=True)
        stamp(f"headline {prec or 'high'}")
    except Exception as e:
        print(json.dumps({"stage": f"headline_prec_{prec or 'high'}",
                          "error": str(e)[:300]}), flush=True)
