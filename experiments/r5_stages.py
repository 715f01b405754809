"""Round-5 experiment 2: honest standalone stage costs of the headline
classify program (scalar-sum sync, NO array fetches -- the r4 profile's
stage numbers carried ~3 MB host fetches over the tunnel), plus sort /
gather / windowed-kernel alternatives.  One JSON line per measurement."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import shapes
import hard_shapes

from point_cloud_donkey_tpu.ops import binned
from point_cloud_donkey_tpu.ops.normals import compute_normals_fast

B, N = 128, 2048
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

# --- sort & gather micro-benches --------------------------------------------
timeit("argsort_only", jax.jit(
    lambda p: jnp.sum(jnp.argsort(p[..., 0], axis=1))), pts_j)
timeit("sort_clouds", jax.jit(
    lambda p, m: jnp.sum(binned.sort_clouds(p, m)[0])), pts_j, mask_j)


def scatter_perm(p):
    # cost of inverting a permutation via scatter (counting-sort need)
    rank = jnp.argsort(p[..., 0], axis=1)  # stand-in permutation
    iota = jnp.broadcast_to(jnp.arange(N)[None, :], rank.shape)
    inv = jnp.zeros_like(rank).at[
        jnp.arange(B)[:, None], rank].set(iota)
    return jnp.sum(inv)


timeit("argsort_plus_scatter_invert", jax.jit(scatter_perm), pts_j)

# --- honest pipeline stage prefixes -----------------------------------------
from point_cloud_donkey_tpu.models.codebook import CodebookParams, cast_votes
from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
from point_cloud_donkey_tpu.models.pipeline_jit import (
    JitPipelineConfig, classify_scores, extract_features_jit)
from point_cloud_donkey_tpu.utils.config import IsmConfig
from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd
from point_cloud_donkey_tpu.ops.voxel_grid import voxel_grid
from point_cloud_donkey_tpu.ops.lrf import shot_lrf
from point_cloud_donkey_tpu.ops.shot import shot_descriptor_dense
import tempfile

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
stamp("model ready")

cfg = JitPipelineConfig(
    descriptor="SHOT", radius=0.6, ref_frame_radius=0.5, leaf_size=0.35,
    normal_radius=0.25, normals_method=2, metric="chisq", knn_k=1,
    keypoint_capacity=192, neighbor_capacity=896, bandwidth=0.5,
    num_classes=5)
params = CodebookParams(knn_k=1)


def stage_voxel(p, m):
    def one(pp, mm):
        k = voxel_grid(pp, mm, cfg.leaf_size, capacity=cfg.keypoint_capacity)
        return jnp.sum(jnp.where(k.mask[:, None], k.centroids[:, :3], 0.0))
    return jnp.sum(jax.vmap(one)(p, m))


def stage_kplrf(p, m):
    def one(pp, mm):
        k = voxel_grid(pp, mm, cfg.leaf_size, capacity=cfg.keypoint_capacity)
        kp = jnp.where(k.mask[:, None], k.centroids[:, :3], 1e9)
        lrf = shot_lrf(kp, k.mask, pp, mm, cfg.ref_frame_radius)
        return jnp.sum(jnp.where(lrf.valid[:, None, None], lrf.frames, 0.0))
    return jnp.sum(jax.vmap(one)(p, m))


def stage_normals(p, m):
    return jnp.sum(jax.vmap(
        lambda pp, mm: compute_normals_fast(pp, mm, cfg.normal_radius))(p, m))


def stage_features(p, m):
    def one(pp, mm):
        _, _, desc, valid = extract_features_jit(pp, mm, cfg)
        return jnp.sum(jnp.where(valid[:, None], desc, 0.0))
    return jnp.sum(jax.vmap(one)(p, m))


def stage_full(p, m):
    return jnp.sum(jax.vmap(
        lambda pp, mm: classify_scores(pp, mm, cb, cfg, params))(p, m))


ms_vox = timeit("voxel", jax.jit(stage_voxel), pts_j, mask_j)
ms_kplrf = timeit("voxel+kplrf", jax.jit(stage_kplrf), pts_j, mask_j)
ms_norm = timeit("normals_dense_standalone", jax.jit(stage_normals),
                 pts_j, mask_j)
ms_feat = timeit("voxel+kplrf+normals+desc", jax.jit(stage_features),
                 pts_j, mask_j)
ms_full = timeit("full_classify", jax.jit(stage_full), pts_j, mask_j)

# --- windowed normals with the block gather ---------------------------------
w = binned.required_window(pts_j, mask_j, 0.25, tile_q=256, align=128)
print(json.dumps({"calibrated_window": w}), flush=True)


def win_normals(p, m):
    ps, ms_, ks, _ = binned.sort_clouds(p, m)
    nrm, exact = binned.compute_normals_fast_windowed(ps, ms_, ks, 0.25, w,
                                                      256)
    return jnp.sum(nrm) + jnp.where(exact, 0.0, jnp.nan)


timeit("normals_windowed_sort+kernel", jax.jit(win_normals), pts_j, mask_j,
       extra={"window": w})


# kernel-only: pre-sorted inputs (isolates the sort cost)
ps0, ms0, ks0, _ = jax.jit(binned.sort_clouds)(pts_j, mask_j)
np.asarray(jax.device_get(jnp.sum(ps0)))
timeit("normals_windowed_kernel_only", jax.jit(
    lambda a, b, c: jnp.sum(binned.compute_normals_fast_windowed(
        a, b, c, 0.25, w, 256)[0])), ps0, ms0, ks0, extra={"window": w})

# --- full classify with windowed normals (end-to-end batched entry) ---------
from point_cloud_donkey_tpu.models.pipeline_jit import classify_scores_batch

cfg_w = cfg._replace(normals_window=w)


def full_win(p, m):
    scores, exact = classify_scores_batch(p, m, cb, cfg_w, params)
    return jnp.sum(scores) + jnp.where(exact, 0.0, jnp.nan)


timeit("full_classify_windowed", jax.jit(full_win), pts_j, mask_j,
       extra={"window": w})
