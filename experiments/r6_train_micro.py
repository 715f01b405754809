"""Round-6: micro-profile of training feature extraction through the axon
tunnel -- where do 48.9 ms/cloud go?  Measures tunnel upload/fetch
bandwidth, per-dispatch latency, each staged-path stage in isolation, and
the fused single-dispatch alternative at the training chunk geometry
(mb=32, n=2048, SHOT-352).  Prints one JSON line per measurement."""

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

MB_, N = 32, 2048
T0 = time.perf_counter()
print(json.dumps({"device": str(jax.devices()[0])}), flush=True)


def stamp(msg):
    print(f"[exp {time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def emit(**kw):
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


rng = np.random.default_rng(42)
for cid in range(5):
    _ = shapes.make_instance(rng, cid, n=N, rotate=False, noise=0.005)
clouds = np.stack([shapes.make_instance(rng, i % 5, n=N, rotate=True,
                                        noise=0.005) for i in range(MB_)])
mask = np.ones((MB_, N), bool)

# --- tunnel primitives ------------------------------------------------------
for mb_bytes in (1, 4, 16):
    arr = np.zeros((mb_bytes * 256 * 1024,), np.float32)  # mb_bytes MB
    d = jnp.asarray(arr); np.asarray(d)  # warm
    t0 = time.perf_counter()
    for _ in range(4):
        d = jnp.asarray(arr + 1.0)
    np.asarray(d[:1])
    up = (time.perf_counter() - t0) / 4 * 1000
    dd = jnp.asarray(arr)
    t0 = time.perf_counter()
    for _ in range(4):
        h = np.asarray(dd)
    fetch = (time.perf_counter() - t0) / 4 * 1000
    emit(stage="tunnel", mb=mb_bytes, upload_ms=up, fetch_ms=fetch)
stamp("tunnel bw")

# dispatch latency: tiny program, sync every call vs pipelined
tinyf = jax.jit(lambda x: jnp.sum(x * 2.0))
xdev = jnp.asarray(np.ones((8, 8), np.float32))
np.asarray(tinyf(xdev))
t0 = time.perf_counter()
for _ in range(8):
    np.asarray(tinyf(xdev))
emit(stage="dispatch_sync_each", ms=(time.perf_counter() - t0) / 8 * 1000)
t0 = time.perf_counter()
outs = [tinyf(xdev) for _ in range(8)]
np.asarray(outs[-1])
emit(stage="dispatch_pipelined8", ms=(time.perf_counter() - t0) / 8 * 1000)
stamp("dispatch")

# --- staged path stage-by-stage (training geometry) -------------------------
from point_cloud_donkey_tpu.models.detect_batch import (
    _normals_batch_program, _voxel_batch_program, _descriptor_batch_program,
    build_fused_detect_fn, MB)
from point_cloud_donkey_tpu.models.features import FeatureConfig
from point_cloud_donkey_tpu.utils.config import ComponentConfig

fcfg = FeatureConfig(type="SHOT", radius=0.6, ref_frame_radius=0.5,
                     ref_frame_type="SHOT")

K_CAP = 256


def run_staged():
    t = {}
    t0 = time.perf_counter()
    pts_j, mask_j = jnp.asarray(clouds), jnp.asarray(mask)
    t["upload"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    nrm = np.asarray(_normals_batch_program(MB_, N, 0.25, 2)(pts_j, mask_j))
    t["normals"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    extra = jnp.asarray(nrm)
    cents, cmask = _voxel_batch_program(MB_, N, 3, 0.35)(pts_j, mask_j, extra)
    cents, cmask = np.asarray(cents), np.asarray(cmask)
    t["voxel"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    kp_b = np.full((MB_, K_CAP, 3), 1e9, np.float32)
    kpm_b = np.zeros((MB_, K_CAP), bool)
    for r in range(MB_):
        full = cents[r][cmask[r]]
        kk = min(len(full), K_CAP)
        kp_b[r, :kk] = full[:kk, :3]
        kpm_b[r, :kk] = True
    nrm_z = np.where(mask[..., None], nrm, 0.0).astype(np.float32)
    t["host_pack"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    zeros = np.zeros((MB_, N, 3), np.float32)
    zkp = np.zeros((MB_, K_CAP, 3), np.float32)
    packed = np.asarray(_descriptor_batch_program(MB_, N, K_CAP, fcfg)(
        jnp.asarray(kp_b), jnp.asarray(kpm_b), pts_j, mask_j,
        jnp.asarray(nrm_z), jnp.asarray(zeros), jnp.asarray(zkp),
        jnp.asarray(0.6, jnp.float32), jnp.asarray(0.5, jnp.float32)))
    t["descriptor"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    fs = []
    for r in range(MB_):
        desc = packed[r][:, :352]
        keep = (packed[r][:, 361] > 0) & np.all(np.isfinite(desc), axis=1) \
            & kpm_b[r]
        fs.append((desc[keep].copy(), kp_b[r][keep].copy()))
    t["host_compact"] = time.perf_counter() - t0
    return {k: round(v * 1000, 1) for k, v in t.items()}, packed.nbytes


tt, nbytes = run_staged()  # warm/compile
tt, nbytes = run_staged()
emit(stage="staged", ms=tt, packed_mb=round(nbytes / 1e6, 1),
     total_ms=round(sum(tt.values()), 1),
     ms_per_cloud=round(sum(tt.values()) / MB_, 2))
stamp("staged")

# --- fused single-dispatch program ------------------------------------------
fused_body = build_fused_detect_fn(N, K_CAP, fcfg, 0.35, 0.25, 2, False)
fused = jax.jit(jax.vmap(
    lambda p, m: fused_body(p, m, jnp.zeros_like(p),
                            jnp.asarray(0.6, jnp.float32),
                            jnp.asarray(0.5, jnp.float32))))


def run_fused():
    t = {}
    t0 = time.perf_counter()
    pts_j, mask_j = jnp.asarray(clouds), jnp.asarray(mask)
    t["upload"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    desc, kp, frames, keep, count = fused(pts_j, mask_j)
    desc = np.asarray(desc)
    kp, frames, keep = np.asarray(kp), np.asarray(frames), np.asarray(keep)
    t["fused_fetch"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    fs = [(desc[r][keep[r]].copy(), kp[r][keep[r]].copy())
          for r in range(MB_)]
    t["host_compact"] = time.perf_counter() - t0
    return {k: round(v * 1000, 1) for k, v in t.items()}


tf = run_fused()
tf = run_fused()
emit(stage="fused", ms=tf, total_ms=round(sum(tf.values()), 1),
     ms_per_cloud=round(sum(tf.values()) / MB_, 2))
stamp("fused")

# --- fused, device-resident (fetch only counts) -----------------------------
def run_fused_resident():
    t = {}
    t0 = time.perf_counter()
    pts_j, mask_j = jnp.asarray(clouds), jnp.asarray(mask)
    desc, kp, frames, keep, count = fused(pts_j, mask_j)
    counts = np.asarray(count)
    t["dispatch_counts"] = time.perf_counter() - t0
    return {k: round(v * 1000, 1) for k, v in t.items()}, counts


tr, counts = run_fused_resident()
tr, counts = run_fused_resident()
emit(stage="fused_resident", ms=tr, total_ms=round(sum(tr.values()), 1),
     ms_per_cloud=round(sum(tr.values()) / MB_, 2),
     kp_counts=[int(c) for c in counts[:5]])
stamp("fused resident")
