"""Round-5 experiment: windowed (sorted-axis pruned) normals vs dense on
the real TPU at the exact bench geometry.  Prints one JSON line per
measurement; run via `python experiments/r5_windowed.py`.

Timing sync is a host fetch of a scalar (axon's block_until_ready returns
without waiting, memory: axon-tpu-quirks)."""

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

from point_cloud_donkey_tpu.ops import binned
from point_cloud_donkey_tpu.ops.normals import compute_normals_fast

B, N = 128, 2048
ROUNDS = 8


def stamp(msg):
    print(f"[exp {time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def timeit(fn, *args):
    out = fn(*args)
    np.asarray(jax.device_get(out))  # warm + sync
    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        out = fn(*args)
    np.asarray(jax.device_get(out))
    return (time.perf_counter() - t0) / ROUNDS * 1000.0  # ms/batch


T0 = time.perf_counter()
print(json.dumps({"device": str(jax.devices()[0])}), flush=True)

rng = np.random.default_rng(42)
for cid in range(5):
    _ = shapes.make_instance(rng, cid, n=N, rotate=False, noise=0.005)
clouds = np.stack([shapes.make_instance(rng, i % 5, n=N, rotate=True)
                   for i in range(B)])
mask = np.ones((B, N), bool)
pts_j, mask_j = jnp.asarray(clouds), jnp.asarray(mask)

w = binned.required_window(pts_j, mask_j, 0.25, tile_q=256, align=128)
print(json.dumps({"calibrated_window": w, "frac": w / N}), flush=True)
stamp(f"calibrated window {w}")

# --- dense baseline --------------------------------------------------------
dense = jax.jit(lambda p, m: jnp.sum(
    jax.vmap(lambda pp, mm: compute_normals_fast(pp, mm, 0.25))(p, m)))
ms_dense = timeit(dense, pts_j, mask_j)
print(json.dumps({"stage": "normals_dense", "ms": round(ms_dense, 2)}),
      flush=True)
stamp("dense done")

# --- sort alone ------------------------------------------------------------
sort_only = jax.jit(lambda p, m: jnp.sum(binned.sort_clouds(p, m)[0]))
ms_sort = timeit(sort_only, pts_j, mask_j)
print(json.dumps({"stage": "sort_only", "ms": round(ms_sort, 2)}), flush=True)
stamp("sort done")


def windowed(window, z_only):
    def f(p, m):
        ps, ms_, ks, _ = binned.sort_clouds(p, m)
        from point_cloud_donkey_tpu.ops.pallas.lrf_moments import (
            shot_lrf_pallas_windowed)
        frames, valid, exact = shot_lrf_pallas_windowed(
            ps, ms_, ks, 0.25, window, 256, z_only=z_only)
        z = -frames[..., 2, :]
        nrm = jnp.where(valid[..., None], z,
                        jnp.zeros_like(z).at[..., 2].set(1.0))
        return jnp.sum(nrm), exact
    return jax.jit(f)


for window, z_only in ((w, True), (w, False), (min(w + 256, N), True)):
    try:
        fn = windowed(window, z_only)
        s, exact = fn(pts_j, mask_j)
        np.asarray(jax.device_get(s))
        ok = bool(jax.device_get(exact))
        t0 = time.perf_counter()
        for _ in range(ROUNDS):
            s, exact = fn(pts_j, mask_j)
        np.asarray(jax.device_get(s))
        ms = (time.perf_counter() - t0) / ROUNDS * 1000.0
        print(json.dumps({"stage": "normals_windowed", "window": window,
                          "z_only": z_only, "ms": round(ms, 2),
                          "exact": ok}), flush=True)
        stamp(f"windowed w={window} z_only={z_only} done")
    except Exception as e:
        print(json.dumps({"stage": "normals_windowed", "window": window,
                          "z_only": z_only, "error": str(e)[:300]}),
              flush=True)
        stamp(f"windowed w={window} z_only={z_only} FAILED")

# --- parity: windowed pallas vs dense (sign agreement) ----------------------
ps, ms_, ks, _ = binned.sort_clouds(pts_j, mask_j)
nrm_w, exact = binned.compute_normals_fast_windowed(ps, ms_, ks, 0.25, w, 256)
nrm_d = jax.jit(jax.vmap(lambda p, m: compute_normals_fast(p, m, 0.25)))(
    ps, ms_)
dots = np.asarray(jax.device_get(jnp.sum(nrm_w * nrm_d, axis=-1)))
print(json.dumps({
    "stage": "parity", "exact": bool(jax.device_get(exact)),
    "same_axis_frac": float((np.abs(dots) > 0.999).mean()),
    "same_sign_frac": float((dots > 0.999).mean())}), flush=True)
stamp("parity done")
