"""Round-5 experiment 3: fused SHOT descriptor kernel vs the XLA dense
path on the real TPU at bench geometry, plus votes-stage decomposition."""

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
        print(json.dumps({"stage": name, "error": str(e)[:400]}), flush=True)
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

from point_cloud_donkey_tpu.ops.voxel_grid import voxel_grid
from point_cloud_donkey_tpu.ops.lrf import shot_lrf
from point_cloud_donkey_tpu.ops.normals import compute_normals_fast
from point_cloud_donkey_tpu.ops.shot import shot_descriptor_dense
from point_cloud_donkey_tpu.ops.pallas.shot_fused import shot_descriptor_fused


def stages(p, m):
    nrm = compute_normals_fast(p, m, 0.25)
    kres = voxel_grid(p, m, 0.35, capacity=K)
    kp = jnp.where(kres.mask[:, None], kres.centroids[:, :3], 1e9)
    lrf = shot_lrf(kp, kres.mask, p, m, 0.5)
    return kp, lrf.frames, lrf.valid, nrm


# precompute upstream once (isolates the descriptor stage)
kp, fr, fv, nrm = jax.jit(jax.vmap(stages))(pts_j, mask_j)
np.asarray(jax.device_get(jnp.sum(kp)))
stamp("upstream ready")

timeit("desc_xla_dense", jax.jit(lambda a, b, c, d, e, f: jnp.sum(
    jax.vmap(lambda kk, ff, vv, pp, nn, mm: jnp.where(
        shot_descriptor_dense(kk, ff, vv, pp, nn, mm, 0.6).valid[:, None],
        shot_descriptor_dense(kk, ff, vv, pp, nn, mm, 0.6).descriptors,
        0.0))(a, b, c, d, e, f))), kp, fr, fv, pts_j, nrm, mask_j)

timeit("desc_fused_pallas", jax.jit(lambda a, b, c, d, e, f: jnp.sum(
    jnp.where(shot_descriptor_fused(a, b, c, d, e, f, 0.6)[1][..., None],
              shot_descriptor_fused(a, b, c, d, e, f, 0.6)[0], 0.0))),
       kp, fr, fv, pts_j, nrm, mask_j)

# parity on-chip
d_ref, v_ref = jax.jit(jax.vmap(
    lambda kk, ff, vv, pp, nn, mm: shot_descriptor_dense(
        kk, ff, vv, pp, nn, mm, 0.6)))(kp, fr, fv, pts_j, nrm, mask_j)
d_ref, v_ref = (np.asarray(jax.device_get(d_ref)),
                np.asarray(jax.device_get(v_ref)))
try:
    d_new, v_new = jax.jit(
        lambda a, b, c, d, e, f: shot_descriptor_fused(
            a, b, c, d, e, f, 0.6))(kp, fr, fv, pts_j, nrm, mask_j)
    d_new, v_new = (np.asarray(jax.device_get(d_new)),
                    np.asarray(jax.device_get(v_new)))
    both = v_ref & v_new
    cos = (d_new[both] * d_ref[both]).sum(-1)
    print(json.dumps({
        "stage": "fused_parity",
        "valid_agree": float((v_ref == v_new).mean()),
        "min_cos": float(cos.min()) if both.any() else None,
        "frac_cos_999": float((cos > 0.999).mean()) if both.any() else None}),
        flush=True)
except Exception as e:
    print(json.dumps({"stage": "fused_parity", "error": str(e)[:200]}),
          flush=True)
stamp("parity done")

# --- votes-stage decomposition ----------------------------------------------
import tempfile
import hard_shapes
from point_cloud_donkey_tpu.models.codebook import CodebookParams, cast_votes
from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
from point_cloud_donkey_tpu.models.pipeline_jit import JitPipelineConfig
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
stamp("model ready")
print(json.dumps({"num_codewords": int(ism.state.codebook.cw_mask.sum())}),
      flush=True)

timeit("knn_only", jax.jit(lambda d: jnp.sum(knn(
    d.reshape(-1, 352), cb.codewords, cb.cw_mask, 1, "chisq",
    exact=False)[0])), d_ref)


def votes_stage(desc, valid, kpb, frb):
    def one(dd, vv, kk, ff):
        v = cast_votes(cb, dd, kk, ff, vv, params, "chisq")
        return jnp.sum(jnp.where(v.valid, v.weight, 0.0)) + jnp.sum(
            jnp.where(v.valid[:, None], v.position, 0.0))
    return jnp.sum(jax.vmap(one)(desc, valid, kpb, frb))


timeit("cast_votes_full", jax.jit(votes_stage),
       jnp.asarray(d_ref), jnp.asarray(v_ref), kp, fr)
