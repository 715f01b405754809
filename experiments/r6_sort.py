"""Round-6 experiment: what does the principal-axis sort ACTUALLY cost,
and can a bucket counting sort (or payload-through-lax.sort) beat the
argsort+gather formulation?  PROFILE_TPU.md round 5: the windowed normals
kernel wins standalone (8.9 vs 12.7 ms/batch) but `sort_clouds` costs
5.6-6.6 ms, flipping the end-to-end result negative.  This measures every
candidate replacement at the bench geometry (B=128, N=2048) on the real
chip, plus the voxel-grid lexsort alternative.

Prints one JSON line per measurement."""

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
from point_cloud_donkey_tpu.ops.voxel_grid import voxel_grid

B, N = 128, 2048
ROUNDS = 8
NB = 64  # buckets for the counting sort
T0 = time.perf_counter()


def stamp(msg):
    print(f"[exp {time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def timeit(name, fn, *args, extra=None):
    try:
        out = fn(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
        t0 = time.perf_counter()
        for _ in range(ROUNDS):
            out = fn(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
        ms = (time.perf_counter() - t0) / ROUNDS * 1000.0
        rec = {"stage": name, "ms": round(ms, 2)}
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)
        stamp(name)
        return out
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

# --- current path and its pieces -------------------------------------------
timeit("sort_clouds_current",
       jax.jit(lambda p, m: jnp.sum(binned.sort_clouds(p, m)[0])),
       pts_j, mask_j)

timeit("keys_only",
       jax.jit(lambda p, m: jnp.sum(binned.principal_axis_keys(p, m))),
       pts_j, mask_j)

timeit("argsort_only",
       jax.jit(lambda p, m: jnp.sum(
           jnp.argsort(binned.principal_axis_keys(p, m), axis=1))),
       pts_j, mask_j)


def _take3(p, m):
    keys = binned.principal_axis_keys(p, m)
    order = jnp.argsort(keys, axis=1)
    pts_s = jnp.take_along_axis(p, order[..., None], axis=1)
    return jnp.sum(pts_s)


timeit("argsort_plus_one_gather", jax.jit(_take3), pts_j, mask_j)


# --- lax.sort with payload columns (no gathers) ----------------------------
def _laxsort_payload(p, m):
    keys = binned.principal_axis_keys(p, m)
    cols = [keys, p[..., 0], p[..., 1], p[..., 2], m.astype(jnp.float32)]
    out = jax.lax.sort(cols, dimension=1, num_keys=1, is_stable=False)
    return jnp.sum(out[1]) + jnp.sum(out[0])


timeit("laxsort_payload", jax.jit(_laxsort_payload), pts_j, mask_j)


# --- counting sort ----------------------------------------------------------
def _counting_rank(keys, m):
    """keys [N] f32, m [N] -> (rank [N] i32 dest, edges [NB+1], width)."""
    vk = jnp.where(m, keys, jnp.inf)
    lo = jnp.min(vk)
    hi = jnp.max(jnp.where(m, keys, -jnp.inf))
    width = jnp.maximum((hi - lo) / NB, 1e-9)
    b = jnp.clip(jnp.floor((keys - lo) / width), 0, NB - 1).astype(jnp.int32)
    b = jnp.where(m, b, NB)                       # invalid -> final bucket
    oh = (b[:, None] == jnp.arange(NB + 1)[None, :]).astype(jnp.float32)
    within = jnp.cumsum(oh, axis=0)               # [N, NB+1] inclusive
    counts = within[-1]
    offs = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                            jnp.cumsum(counts)[:-1]])
    r_in = jnp.take_along_axis(within, b[:, None], axis=1)[:, 0] - 1.0
    rank = (offs[b] + r_in).astype(jnp.int32)
    return rank, lo, width, b


def _rank_only(p, m):
    keys = binned.principal_axis_keys(p, m)
    rank, _, _, _ = jax.vmap(_counting_rank)(keys, m)
    return jnp.sum(rank)


timeit("counting_rank_only", jax.jit(_rank_only), pts_j, mask_j)


def _counting_scatter_rows(p, m):
    keys = binned.principal_axis_keys(p, m)

    def one(pp, mm, kk):
        rank, lo, width, b = _counting_rank(kk, mm)
        surr = lo + b.astype(jnp.float32) * width          # lower edge
        surr = jnp.where(mm, surr, binned.PARK)
        payload = jnp.concatenate(
            [pp, mm[:, None].astype(jnp.float32), surr[:, None]], axis=1)
        out = jnp.zeros_like(payload).at[rank].set(
            payload, unique_indices=True)
        return out, width

    out, width = jax.vmap(one)(p, m, keys)
    return jnp.sum(out) + jnp.sum(width)


timeit("counting_scatter_rows", jax.jit(_counting_scatter_rows), pts_j, mask_j)


def _counting_invperm(p, m):
    keys = binned.principal_axis_keys(p, m)

    def one(pp, mm, kk):
        rank, lo, width, b = _counting_rank(kk, mm)
        src = jnp.zeros((N,), jnp.int32).at[rank].set(
            jnp.arange(N, dtype=jnp.int32), unique_indices=True)
        return src

    src = jax.vmap(one)(p, m, keys)
    pts_s = jnp.take_along_axis(p, src[..., None], axis=1)
    return jnp.sum(pts_s)


timeit("counting_invperm_gather", jax.jit(_counting_invperm), pts_j, mask_j)

# scatter primitive alone: [N, 6] rows to unique destinations
def _scatter_alone(p, m):
    def one(pp):
        rank = jnp.flip(jnp.arange(N, dtype=jnp.int32))  # fixed permutation
        payload = jnp.concatenate([pp, pp], axis=1)      # [N, 6]
        return jnp.zeros_like(payload).at[rank].set(payload,
                                                    unique_indices=True)
    return jnp.sum(jax.vmap(one)(p))


timeit("scatter_rows_alone", jax.jit(_scatter_alone), pts_j, mask_j)

# --- correctness: counting sort groups buckets contiguously ----------------
def _check(p, m):
    keys = binned.principal_axis_keys(p, m)

    def one(pp, mm, kk):
        rank, lo, width, b = _counting_rank(kk, mm)
        surr = jnp.where(mm, lo + b.astype(jnp.float32) * width, binned.PARK)
        payload = jnp.concatenate(
            [pp, mm[:, None].astype(jnp.float32), surr[:, None],
             kk[:, None]], axis=1)
        out = jnp.zeros_like(payload).at[rank].set(payload,
                                                   unique_indices=True)
        return out

    return jax.vmap(one)(p, m, keys)


out = np.asarray(jax.device_get(jax.jit(_check)(pts_j, mask_j)))
surr = out[:, :, 4]
true_keys = out[:, :, 5]
mono = bool(np.all(np.diff(surr, axis=1) >= 0))
# every true key within [surr, surr + width-ish]
ok_range = bool(np.all((true_keys >= surr - 1e-5) | (surr >= binned.PARK)))
print(json.dumps({"stage": "counting_parity", "surr_monotone": mono,
                  "keys_ge_edge": ok_range}), flush=True)

# --- voxel grid: current vs packed single-key unstable sort ----------------
timeit("voxel_current",
       jax.jit(lambda p, m: jnp.sum(jax.vmap(
           lambda pp, mm: voxel_grid(pp, mm, 0.35, capacity=192).centroids
       )(p, m))),
       pts_j, mask_j)


def _voxel_onehot(p, m, leaf=0.35, ncap=8, cap=192):
    def one(pp, mm):
        big = jnp.asarray(jnp.inf, pp.dtype)
        mn = jnp.floor(
            jnp.min(jnp.where(mm[:, None], pp, big), axis=0) / leaf)
        ijk = (jnp.floor(pp / leaf) - mn[None, :]).astype(jnp.int32)
        fits = jnp.all((ijk >= 0) & (ijk < ncap) | ~mm[:, None])
        lin = (ijk[:, 0] * ncap + ijk[:, 1]) * ncap + ijk[:, 2]
        nc = ncap ** 3
        lin = jnp.where(mm, jnp.clip(lin, 0, nc - 1), nc - 1)
        oh = (lin[:, None] == jnp.arange(nc)[None, :]).astype(jnp.float32)
        ohm = oh * mm[:, None]
        ext = jnp.concatenate([pp, jnp.ones((N, 1), pp.dtype)], axis=1)
        sums = jax.lax.dot_general(ohm, ext, (((0,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST)
        counts = sums[:, -1]                                  # [nc]
        occ = counts > 0
        csum = jnp.cumsum(occ.astype(jnp.int32))
        k = csum[-1]
        src = jnp.searchsorted(csum, jnp.arange(1, cap + 1))  # [cap]
        src = jnp.minimum(src, nc - 1)
        got = jnp.take(sums, src, axis=0)
        cnt = got[:, -1]
        valid = jnp.arange(cap) < k
        cent = got[:, :3] / jnp.maximum(cnt, 1.0)[:, None]
        return jnp.where(valid[:, None], cent, 0.0), valid, fits

    cents, valid, fits = jax.vmap(one)(p, m)
    return cents, valid, fits


timeit("voxel_onehot",
       jax.jit(lambda p, m: jnp.sum(_voxel_onehot(p, m)[0])),
       pts_j, mask_j)

# voxel one-hot parity vs current
cents, valid, fits = jax.jit(_voxel_onehot)(pts_j, mask_j)
cur = jax.jit(jax.vmap(lambda pp, mm: voxel_grid(pp, mm, 0.35, capacity=192)
                       ))(pts_j, mask_j)
c1 = np.asarray(jax.device_get(cents))
v1 = np.asarray(jax.device_get(valid))
f1 = np.asarray(jax.device_get(fits))
c0 = np.asarray(jax.device_get(cur.centroids))[..., :3]
v0 = np.asarray(jax.device_get(cur.mask))
same_counts = bool(np.all(v1.sum(1) == v0.sum(1)))
max_err = float(np.max(np.abs(np.where(v1[..., None], c1, 0)
                              - np.where(v0[..., None], c0, 0))))
print(json.dumps({"stage": "voxel_parity", "all_fit": bool(np.all(f1)),
                  "same_counts": same_counts,
                  "max_abs_err": round(max_err, 8)}), flush=True)
stamp("done")
