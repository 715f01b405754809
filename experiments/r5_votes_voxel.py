"""Round-5: decompose the votes stage (~8-10 ms/batch) and the voxel
stage (~4.2 ms) of the headline program on the real TPU."""

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
        rec = {"stage": name, "ms": round(ms, 2)}
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

# --- voxel decomposition -----------------------------------------------------
from point_cloud_donkey_tpu.ops.voxel_grid import voxel_grid


def vox_sort_only(p, m):
    def one(pp, mm):
        mn = jnp.floor(jnp.min(jnp.where(mm[:, None], pp, jnp.inf), axis=0)
                       / 0.35)
        ijk = (jnp.floor(pp / 0.35) - mn[None, :]).astype(jnp.int32)
        ijk = jnp.where(mm[:, None], ijk, jnp.iinfo(jnp.int32).max)
        cols = ([ijk[:, 0], ijk[:, 1], ijk[:, 2]]
                + [pp[:, f] for f in range(3)] + [mm])
        out = jax.lax.sort(cols, num_keys=3, is_stable=True)
        return sum(jnp.sum(o) for o in out[3:6])
    return jnp.sum(jax.vmap(one)(p, m))


timeit("voxel_sort_only", jax.jit(vox_sort_only), pts_j, mask_j)
timeit("voxel_full", jax.jit(lambda p, m: jnp.sum(jax.vmap(
    lambda pp, mm: jnp.where(
        voxel_grid(pp, mm, 0.35, capacity=K).mask[:, None],
        voxel_grid(pp, mm, 0.35, capacity=K).centroids, 0.0))(p, m))),
    pts_j, mask_j)

# --- votes decomposition -----------------------------------------------------
import tempfile
from point_cloud_donkey_tpu.models.codebook import (CodebookParams,
                                                    cast_votes)
from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
from point_cloud_donkey_tpu.models.pipeline_jit import (JitPipelineConfig,
                                                        extract_features_jit)
from point_cloud_donkey_tpu.ops.neighbors import (chi2_feature_map,
                                                  chi_square_distance_matrix_approx,
                                                  knn)
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

# features once (inputs to the votes stage)
feat = jax.jit(lambda p, m: jax.vmap(
    lambda pp, mm: extract_features_jit(pp, mm, cfg))(p, m))
kp, fr, desc, valid = feat(pts_j, mask_j)
np.asarray(jax.device_get(valid))
stamp("features ready")

# knn per-cloud vmapped (the serving shape)
timeit("knn_vmapped", jax.jit(lambda d: jnp.sum(jax.vmap(
    lambda dd: knn(dd, cb.codewords, cb.cw_mask, 1, "chisq",
                   exact=False)[0])(d))), desc)

# feature-map build only
timeit("chi2_feature_map_only", jax.jit(
    lambda d: jnp.sum(chi2_feature_map(d))), desc)

# post-knn vote machinery (fixed idx: bypass knn)
def votes_post(d, v, k_, f_):
    def one(dd, vv, kk, ff):
        out = cast_votes(cb, dd, kk, ff, vv, params, "chisq")
        return jnp.sum(jnp.where(out.valid, out.weight, 0.0))
    return jnp.sum(jax.vmap(one)(d, v, k_, f_))


timeit("cast_votes_full_vmapped", jax.jit(votes_post), desc, valid, kp, fr)

# quat conversion alone (suspect: matrix_to_quat per keypoint)
from point_cloud_donkey_tpu.ops import geometry as geo
timeit("matrix_to_quat_only", jax.jit(lambda f: jnp.sum(jax.vmap(
    lambda ff: jax.vmap(geo.matrix_to_quat)(ff))(f))), fr)
