"""Cross-cloud batched feature extraction for the full-parity detect path.

The host-orchestrated ImplicitShapeModel.detect runs 4-5 device dispatches
per cloud (normals, voxel keypoints, descriptors, vote casting); through the
axon tunnel each dispatch pays a full round-trip, so per-cloud latency --
not compute -- dominates (round-2 bench: 3.7 clouds/s vs 1400/s for the
fused serving path).  This module batches the device stages across clouds:
each stage runs as ONE vmapped program per shape-group chunk, so a chunk of
MB clouds costs the same number of round-trips as a single cloud.

Numerical parity: every stage runs the same kernels on the same padded
inputs as models/features.extract_local_features (vmap only adds a batch
dimension), so per-cloud results match the unbatched path; decision
equality is pinned by tests/test_detection.py.

Reference hot path being accelerated: the per-cloud detect loop of the eval
tools (eval_tool.cpp main loop) over ImplicitShapeModel::detect
(implicit_shape_model.cpp:583-712).
"""

from __future__ import annotations

import functools
import time
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.normals import compute_normals
from ..ops.voxel_grid import voxel_grid
from ..utils.config import ComponentConfig
from .features import (FeatureConfig, _descriptor_fn, _unpack_descriptor_stage,
                       bucket_size, pad_cloud)
from .keypoints import KeypointParams
from .types import FeatureSet, make_feature_set

# chunk width: every batched program is compiled for exactly MB clouds
# (short chunks repeat their last cloud) so the number of distinct compiled
# variants stays small -- compile latency through the axon tunnel is the
# scarce resource, not FLOPs
MB = 8


def _to_dev(x, mesh):
    """Commit a [MB, ...] chunk array to the device(s): with a mesh, the
    leading (cloud) axis is sharded over 'data' -- jit propagates committed
    input shardings, so the SAME cached stage programs run mesh-sharded
    with unchanged per-example math (bit-identical results; pinned by
    tests/test_sharded.py).  Without a mesh this is jnp.asarray."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    x = jnp.asarray(x)
    if mesh is None or x.ndim == 0 or x.shape[0] % mesh.shape["data"]:
        return x
    return jax.device_put(x, NamedSharding(mesh, P("data")))


def _culling_plain(kp_params: KeypointParams, is_training: bool) -> bool:
    from .keypoints import culling_disabled
    return culling_disabled(kp_params, is_training)


def batch_supported(fcfg: FeatureConfig, kp_params: KeypointParams,
                    clouds: Sequence[np.ndarray],
                    is_training: bool = False) -> bool:
    """The batched path covers the standard pipeline; exotic cases fall back
    to the per-cloud host path (identical results, just slower)."""
    from ..ops.tiled import SCENE_TILE_THRESHOLD
    if fcfg.type in ("NARF", "GASD", "Dummy"):
        return False
    if kp_params.type not in ("VoxelGrid", "VoxelGridCulling"):
        return False
    if not _culling_plain(kp_params, is_training):
        # detection-time keypoint culling: scores run as one vmapped program
        # per chunk, thresholds/refinement on the host (shared with the
        # per-cloud path -- models/keypoints.py:apply_culling_host)
        geo = kp_params.filter_method_geometry.lower()
        col = kp_params.filter_method_color.lower()
        if geo not in ("none", "curvature", "gaussian", "kpq"):
            return False
        if col not in ("none", "colordistance"):
            return False
    if any(len(c) > SCENE_TILE_THRESHOLD for c in clouds):
        return False
    return True


def host_voxel_count(xyz: np.ndarray, leaf: float) -> int:
    """Exact occupied-voxel count of ops.voxel_grid on the host: floor(p /
    leaf) in float32 is the same IEEE computation numpy performs, so the
    count (= keypoint count for plain VoxelGrid) is known BEFORE dispatch.
    This lets the fused detect program fix its keypoint capacity without a
    device round-trip between the voxel and descriptor stages."""
    q = np.floor(xyz.astype(np.float32) / np.float32(leaf))
    return len(np.unique(q, axis=0))


def fused_supported(fcfg: FeatureConfig, kp_params: KeypointParams,
                    clouds: Sequence[np.ndarray],
                    normals_list: Sequence[Optional[np.ndarray]],
                    consistent_normals_method: int) -> bool:
    """The single-dispatch fused detect program additionally requires that
    normals are computed in-program: no caller-provided normals and no
    host-side EMST orientation (method 3)."""
    if not batch_supported(fcfg, kp_params, clouds):
        return False
    if not _culling_plain(kp_params, is_training=False):
        # culling thresholds/refinement are host-side heuristics; the fused
        # single-dispatch program requires plain voxel keypoints
        return False
    if fcfg.needs_normals():
        if any(nl is not None for nl in normals_list):
            return False
        if consistent_normals_method == 3:
            return False
    return True


def check_rgb_available(fcfg: FeatureConfig, rgb_list) -> None:
    """RGB-needing descriptors over colorless clouds must fail loudly, the
    same error every path raises (features.py pad path, the staged batch);
    the fused path calls this up front so it can never silently zero-fill
    color."""
    if fcfg.needs_rgb() and any(r is None for r in rgb_list):
        raise ValueError(f"{fcfg.type} needs RGB data but the cloud has none")


def build_fused_detect_fn(n: int, k_cap: int, fcfg: FeatureConfig,
                          leaf: float, normal_radius: float, n_method: int,
                          has_rgb: bool):
    """One-cloud body of the fused detect program: normals -> voxel-grid
    keypoints -> LRFs + descriptors, all inside one traced function.  The
    caller composes the vote-casting stage on top and jit+vmaps the whole
    chain, so a chunk of MB clouds costs ONE device dispatch instead of four
    (through the axon tunnel each dispatch pays a full round-trip; this is
    the host-detect latency lever after the staged batching).

    Parity with the staged path (extract_local_features_batch):
      - the voxel stage is the identical voxel_grid call; keypoints are
        compacted valid-first in original (linearized voxel key) order, the
        same order host boolean indexing produces;
      - k_cap must be >= the occupied-voxel count (host_voxel_count supplies
        it exactly), so no keypoint is ever truncated;
      - invalid descriptor rows are zeroed and frames reset to identity --
        byte-identical to the staged path's compact()+zero-pad before cast.

    Returns run(pts, mask, rgb, radius, frame_radius) ->
    (descriptors [k_cap, D], keypoints [k_cap, 3], frames [k_cap, 3, 3],
    keep [k_cap], kp_count [])."""
    fn = _descriptor_fn(n, fcfg)
    needs_n = fcfg.needs_normals()
    needs_rgb = fcfg.needs_rgb()

    def run(pts, mask, rgb, radius, frame_radius):
        if needs_n:
            nrm = compute_normals(pts, mask, normal_radius, n_method).normals
            # the staged path zero-fills normals beyond each cloud's length
            # (extract_local_features_batch nrm_bj); match it so padded rows
            # can never leak NaN into gathered neighborhoods
            nrm = jnp.where(mask[:, None], nrm, 0.0)
        else:
            nrm = jnp.zeros_like(pts)
        parts = []
        if needs_n:
            parts.append(nrm)
        if has_rgb:
            parts.append(rgb)
        extra = jnp.concatenate(parts, axis=1) if parts else None
        res = voxel_grid(pts, mask, leaf, features=extra)
        count = res.mask.sum()
        # stable valid-first compaction == cents[cmask] on the host
        order = jnp.argsort(jnp.logical_not(res.mask))
        sel = order[:k_cap]
        cent = res.centroids[sel]
        kpm = res.mask[sel]
        kp = jnp.where(kpm[:, None], cent[:, :3], 1e9)
        off = 3 + (3 if needs_n else 0)
        kp_rgb = cent[:, off:off + 3] if (has_rgb and needs_rgb) \
            else jnp.zeros((k_cap, 3), jnp.float32)
        rgb_in = rgb if needs_rgb else jnp.zeros_like(pts)
        desc, d_valid, frames, _f_valid = fn(
            kp, kpm, pts, mask, nrm, rgb_in, kp_rgb, radius, frame_radius)
        keep = d_valid & jnp.all(jnp.isfinite(desc), axis=1) & kpm
        desc = jnp.where(keep[:, None], desc, 0.0)
        frames = jnp.where(keep[:, None, None], frames,
                           jnp.eye(3, dtype=frames.dtype))
        kp = jnp.where(keep[:, None], kp, 0.0)
        return desc, kp, frames, keep, count
    return run


@functools.lru_cache(maxsize=None)
def _normals_batch_program(b: int, n: int, radius: float, method: int):
    @jax.jit
    def run(points, mask):   # [B, n, 3], [B, n]
        return jax.vmap(
            lambda p, m: compute_normals(p, m, radius, method).normals
        )(points, mask)
    return run


@functools.lru_cache(maxsize=None)
def _voxel_batch_program(b: int, n: int, e_dim: int, leaf: float):
    if e_dim:
        @jax.jit
        def run(points, mask, extra):
            res = jax.vmap(
                lambda p, m, e: voxel_grid(p, m, leaf, features=e)
            )(points, mask, extra)
            return res.centroids, res.mask
    else:
        @jax.jit
        def run(points, mask, extra=None):
            res = jax.vmap(
                lambda p, m: voxel_grid(p, m, leaf))(points, mask)
            return res.centroids, res.mask
    return run


@functools.lru_cache(maxsize=None)
def _culling_batch_program(b: int, n: int, k: int, geo: str, col: str,
                           leaf: float, max_col_dist: float):
    """Vmapped VoxelGridCulling scores: one dispatch computes the geometry +
    color keypoint-quality scores for a whole chunk (the per-cloud path runs
    the identical culling_scores body, so decisions match by construction)."""
    from .keypoints import culling_scores

    @jax.jit
    def run(kp, kp_mask, kp_normals, kp_rgb, pts, mask, normals, rgb):
        return jax.vmap(
            lambda a, b_, c, d, e, f, g, h: culling_scores(
                a, b_, c, d, e, f, g, h, geo, col, leaf, max_col_dist)
        )(kp, kp_mask, kp_normals, kp_rgb, pts, mask, normals, rgb)
    return run


@functools.lru_cache(maxsize=None)
def _descriptor_batch_program(b: int, n: int, k: int, fcfg: FeatureConfig):
    """Vmapped packed descriptor stage: same math as
    features._descriptor_stage, one [B, K, D+11] pull for the whole chunk."""
    fn = _descriptor_fn(n, fcfg)

    def one(kp, kp_mask, pts, mask, nrm, rgb, kp_rgb, radius, frame_radius):
        desc, d_valid, frames, f_valid = fn(kp, kp_mask, pts, mask, nrm,
                                            rgb, kp_rgb, radius, frame_radius)
        kk = desc.shape[0]
        return jnp.concatenate([
            desc, frames.reshape(kk, 9),
            d_valid[:, None].astype(desc.dtype),
            f_valid[:, None].astype(desc.dtype)], axis=1)

    @jax.jit
    def run(kp, kp_mask, pts, mask, nrm, rgb, kp_rgb, radius, frame_radius):
        return jax.vmap(
            lambda a, bm, p, m, nr, rg, kr: one(a, bm, p, m, nr, rg, kr,
                                                radius, frame_radius)
        )(kp, kp_mask, pts, mask, nrm, rgb, kp_rgb)
    return run


def _chunk_indices(order: List[int], width: int = MB) -> List[List[int]]:
    return [order[i:i + width] for i in range(0, len(order), width)]


# ---------------------------------------------------------------------------
# Fused training feature extraction: the staged path costs 3 dispatches +
# 3 multi-MB fetches per chunk AND routes descriptors through the
# gather/top_k formulation (measured 19 ms/cloud of pure device time at the
# training geometry, experiments/r6_train_micro.py -- lax.top_k over
# [K, N] dominates).  Training on accelerator backends instead runs ONE
# vmapped program per chunk (normals -> voxel keypoints -> SHOT LRF ->
# DENSE descriptors, the serving formulation) and fetches one packed
# array.  CPU keeps the staged path so golden-pinned trained states stay
# bit-stable; on accelerators training and serving now share the same
# dense descriptor math (the reference also uses one code path for both,
# implicit_shape_model.cpp:733-927).  PCD_TRAIN_FUSED=0/1 overrides.
# ---------------------------------------------------------------------------


def train_fused_eligible(fcfg: FeatureConfig, kp_params: KeypointParams,
                         normals_list, consistent_normals_method: int
                         ) -> bool:
    import os
    v = os.environ.get("PCD_TRAIN_FUSED")
    if v == "0":
        return False
    if v != "1" and jax.default_backend() == "cpu":
        return False
    if fcfg.type not in ("SHOT", "CSHOT", "SHORT_SHOT"):
        return False
    if fcfg.ref_frame_type != "SHOT":
        return False
    if not _culling_plain(kp_params, is_training=True):
        return False
    if any(nl is not None for nl in normals_list):
        return False
    if fcfg.needs_normals() and consistent_normals_method == 3:
        return False
    return True


@functools.lru_cache(maxsize=None)
def _fused_extract_dense_program(mb: int, n: int, k_cap: int,
                                 fcfg: FeatureConfig, leaf: float,
                                 normal_radius: float, n_method: int,
                                 has_rgb: bool):
    """jit(vmap) of the one-dispatch training extraction body.  Returns
    run(pts [mb,n,3], mask [mb,n], rgb [mb,n,3], radius, frame_radius) ->
    packed [mb, k_cap, D+13] (desc | kp(3) | frames(9) | keep(1)) with
    keypoints compacted valid-first in linearized voxel order (the staged
    path's host-boolean-indexing order)."""
    from ..ops.lrf import shot_lrf
    from ..ops.shot import cshot_descriptor_dense, shot_descriptor_dense
    from ..ops.short_shot import resolve_bins, short_shot_descriptor_dense

    needs_n = fcfg.needs_normals()
    if fcfg.type == "SHORT_SHOT":
        min_radius = 0.0
        if fcfg.use_min_radius:
            min_radius = fcfg.radius * fcfg.short_shot_min_radius
        elif fcfg.short_shot_log_radius:
            min_radius = fcfg.radius * 0.1
        _, rb, eb, ab = resolve_bins(
            fcfg.short_shot_dims, fcfg.short_shot_bin_type,
            fcfg.short_shot_r_bins, fcfg.short_shot_e_bins,
            fcfg.short_shot_a_bins)

    def one(pts, mask, rgb, radius, frame_radius):
        if needs_n:
            nrm = compute_normals(pts, mask, normal_radius, n_method).normals
            nrm = jnp.where(mask[:, None], nrm, 0.0)
        else:
            nrm = jnp.zeros_like(pts)
        parts = []
        if needs_n:
            parts.append(nrm)
        if has_rgb:
            parts.append(rgb)
        extra = jnp.concatenate(parts, axis=1) if parts else None
        res = voxel_grid(pts, mask, leaf, features=extra)
        order = jnp.argsort(jnp.logical_not(res.mask))
        sel = order[:k_cap]
        cent = res.centroids[sel]
        kpm = res.mask[sel]
        kp = jnp.where(kpm[:, None], cent[:, :3], 1e9)
        off = 3 + (3 if needs_n else 0)
        kp_rgb = cent[:, off:off + 3] if has_rgb \
            else jnp.zeros((k_cap, 3), jnp.float32)
        lrf = shot_lrf(kp, kpm, pts, mask, frame_radius)
        if fcfg.type == "SHOT":
            dres = shot_descriptor_dense(kp, lrf.frames, lrf.valid, pts,
                                         nrm, mask, radius)
        elif fcfg.type == "CSHOT":
            dres = cshot_descriptor_dense(kp, kp_rgb, lrf.frames, lrf.valid,
                                          pts, nrm, rgb, mask, radius)
        else:
            dres = short_shot_descriptor_dense(
                kp, lrf.frames, lrf.valid, pts, mask, radius, rb, eb, ab,
                min_radius, fcfg.short_shot_log_radius)
        desc = dres.descriptors
        keep = dres.valid & jnp.all(jnp.isfinite(desc), axis=1) & kpm
        desc = jnp.where(keep[:, None], desc, 0.0)
        frames = jnp.where(keep[:, None, None], lrf.frames,
                           jnp.eye(3, dtype=lrf.frames.dtype))
        kp = jnp.where(keep[:, None], kp, 0.0)
        return jnp.concatenate(
            [desc, kp, frames.reshape(k_cap, 9),
             keep[:, None].astype(desc.dtype)], axis=1)

    @jax.jit
    def run(pts, mask, rgb, radius, frame_radius):
        return jax.vmap(
            lambda p, m, r: one(p, m, r, radius, frame_radius)
        )(pts, mask, rgb)

    return run


class FusedChunkCache(NamedTuple):
    """Device-resident packed descriptor block of one fused training chunk
    (models/codebook.build_device_activation consumes these so activation
    never re-uploads descriptors that were computed on device)."""
    dev: object          # device array [mb, k_cap, d+13]
    chunk: List[int]     # real cloud indices of the chunk rows
    k_cap: int
    d: int
    keep: np.ndarray     # [len(chunk), k_cap] host keep masks


def _extract_local_features_fused_train(
        clouds, rgb_list, fcfg: FeatureConfig, kp_params: KeypointParams,
        normal_radius: float, consistent_normals_method: int, mesh,
        chunk_width: int, device_cache: Optional[list] = None
        ) -> List[FeatureSet]:
    """One-dispatch-per-chunk training extraction (see module-note above)."""
    # multiple-of-8 chunk width (NOT pow2): the dominant cost is the packed
    # result fetch through the tunnel, and padding a 24-cloud training set
    # to a 32-wide chunk pays 33% more transfer + compute for nothing
    mb = min(32, max(8, -(-chunk_width // 8) * 8))
    has_rgb = fcfg.needs_rgb()
    out: List[Optional[FeatureSet]] = [None] * len(clouds)

    groups: Dict[int, List[int]] = {}
    for i, xyz in enumerate(clouds):
        groups.setdefault(bucket_size(len(xyz)), []).append(i)

    for n, idxs in groups.items():
        # keypoint capacity: exact host voxel counts, bucketed group-wide
        # (multiple of 64 -- pow2 rounding cost 256 rows for a 157-voxel
        # workload, +33% on the fetch) so every chunk shares one compiled
        # program variant
        k_cap = max(64, -(-max(
            host_voxel_count(clouds[i], kp_params.leaf_size)
            for i in idxs) // 64) * 64)
        prog = _fused_extract_dense_program(
            mb, n, k_cap, fcfg, float(kp_params.leaf_size),
            float(normal_radius), int(consistent_normals_method), has_rgb)
        for chunk in _chunk_indices(idxs, width=mb):
            real = len(chunk)
            padded = chunk + [chunk[-1]] * (mb - real)
            pts_b = np.zeros((mb, n, 3), np.float32)
            mask_b = np.zeros((mb, n), bool)
            rgb_b = np.zeros((mb, n, 3), np.float32)
            for r, ci in enumerate(padded):
                p, m = pad_cloud(clouds[ci], bucket=n)
                pts_b[r], mask_b[r] = p, m
                if has_rgb:
                    rgb_b[r, :len(clouds[ci])] = rgb_list[ci]
            handle = prog(
                _to_dev(pts_b, mesh), _to_dev(mask_b, mesh),
                _to_dev(rgb_b, mesh),
                jnp.asarray(fcfg.radius, jnp.float32),
                jnp.asarray(fcfg.ref_frame_radius, jnp.float32))
            packed = np.asarray(handle)
            d = packed.shape[-1] - 13
            keeps = np.zeros((real, k_cap), bool)
            for r in range(real):
                ci = chunk[r]
                desc = packed[r][:, :d]
                kp = packed[r][:, d:d + 3]
                frames = packed[r][:, d + 3:d + 12].reshape(-1, 3, 3)
                keep = packed[r][:, d + 12] > 0
                keeps[r] = keep
                centroid = clouds[ci].mean(axis=0)
                center_dist = np.linalg.norm(kp - centroid, axis=1)
                out[ci] = make_feature_set(desc, kp, frames, keep,
                                           center_dist).compact()
            if device_cache is not None:
                device_cache.append(FusedChunkCache(
                    dev=handle, chunk=list(chunk), k_cap=k_cap, d=d,
                    keep=keeps))

    return [fs for fs in out]  # type: ignore[misc]


class _ChunkState(NamedTuple):
    """Front-stage results for one MB-wide chunk, held between the
    keypoint and descriptor passes so capacities can be group-wide."""
    chunk: List[int]
    padded: List[int]
    # host copies: re-uploaded per stage so device memory stays O(one
    # chunk), not O(group) (the stages are latency-bound, not H2D-bound)
    pts_b: np.ndarray
    mask_b: np.ndarray
    kps: List[np.ndarray]
    kp_rgbs: List[Optional[np.ndarray]]
    cloud_normals: List[Optional[np.ndarray]]
    cents: np.ndarray
    cmask: np.ndarray


def _batch_normals(padded: List[int], clouds: Sequence[np.ndarray],
                   normals_list: Sequence[Optional[np.ndarray]],
                   pts_j, mask_j, n: int, normal_radius: float,
                   consistent_normals_method: int) -> List[np.ndarray]:
    """Per-row oriented normals for one MB-wide chunk: provided normals are
    passed through, the rest come from ONE vmapped dispatch (+ host EMST
    orientation for method 3).  Shared by the local and global batch
    extractors so the provided/compute/orient rules cannot drift."""
    provided = [normals_list[ci] is not None
                and len(normals_list[ci]) == len(clouds[ci])
                for ci in padded]
    if not all(provided):
        m = 0 if consistent_normals_method == 3 \
            else consistent_normals_method
        comp = np.asarray(_normals_batch_program(
            MB, n, float(normal_radius), int(m))(pts_j, mask_j))
    out: List[np.ndarray] = []
    for r, ci in enumerate(padded):
        if provided[r]:
            out.append(np.asarray(normals_list[ci], np.float32))
        elif consistent_normals_method == 3:
            from ..ops.normals import orient_emst
            pca = comp[r][:len(clouds[ci])]
            out.append(orient_emst(clouds[ci], pca).astype(np.float32))
        else:
            out.append(comp[r][:len(clouds[ci])].astype(np.float32))
    return out


@functools.lru_cache(maxsize=None)
def _global_batch_program(b: int, n: int, fcfg: FeatureConfig,
                          has_rgb: bool):
    from .features import _whole_cloud_fn
    fn = _whole_cloud_fn(fcfg)

    # rgb=None vs an array changes the descriptor length for GASD
    # (features_gasd.cpp GasdWithColor); encode the branch in the program so
    # the batch path produces the same variant as the per-cloud path
    if has_rgb:
        @jax.jit
        def run(pts, mask, nrm, rgb, radius):
            return jax.vmap(lambda p, m, nr, rg: fn(p, m, nr, rg, radius))(
                pts, mask, nrm, rgb)
    else:
        @jax.jit
        def run(pts, mask, nrm, radius):
            return jax.vmap(lambda p, m, nr: fn(p, m, nr, None, radius))(
                pts, mask, nrm)
    return run


WHOLE_CLOUD_GLOBALS = ("ESF", "VFH", "GRSD", "GASD")


def extract_global_features_batch(
    clouds: Sequence[np.ndarray],
    normals_list: Sequence[Optional[np.ndarray]],
    rgb_list: Sequence[Optional[np.ndarray]],
    gcfg: FeatureConfig,
    normal_radius: float,
    consistent_normals_method: int,
) -> List[FeatureSet]:
    """Batched whole-cloud global descriptors (ESF / VFH / GRSD / GASD: one
    vmapped program per chunk); every other global type falls back to the
    per-cloud features.extract_global_features (identical results)."""
    from ..ops.tiled import SCENE_TILE_THRESHOLD
    from .features import extract_global_features

    if gcfg.type not in WHOLE_CLOUD_GLOBALS:
        return [extract_global_features(c, nl, gcfg, normal_radius,
                                        consistent_normals_method, rgb=rl)
                for c, nl, rl in zip(clouds, normals_list, rgb_list)]

    has_rgb = gcfg.type == "GASD" and gcfg.gasd_with_color
    if has_rgb and any(r is None for r in rgb_list):
        raise ValueError("GASD with color needs RGB data "
                         "(set GasdWithColor false)")

    out: List[Optional[FeatureSet]] = [None] * len(clouds)
    groups: Dict[int, List[int]] = {}
    for i, xyz in enumerate(clouds):
        if len(xyz) > SCENE_TILE_THRESHOLD:
            # scene-scale clouds use the per-cloud path, whose normals
            # route through the tiled kernels (features.py:compute_cloud_
            # normals); the dense batch program would build [n, n] sweeps
            out[i] = extract_global_features(
                xyz, normals_list[i], gcfg, normal_radius,
                consistent_normals_method, rgb=rgb_list[i])
            continue
        groups.setdefault(bucket_size(len(xyz)), []).append(i)

    for n, idxs in groups.items():
        for chunk in _chunk_indices(idxs):
            real = len(chunk)
            padded = chunk + [chunk[-1]] * (MB - real)
            pts_b = np.zeros((MB, n, 3), np.float32)
            mask_b = np.zeros((MB, n), bool)
            nrm_b = np.zeros((MB, n, 3), np.float32)
            rgb_b = np.zeros((MB, n, 3), np.float32)
            for r, ci in enumerate(padded):
                p, m = pad_cloud(clouds[ci], bucket=n)
                pts_b[r], mask_b[r] = p, m
                if has_rgb:
                    rgb_b[r, :len(clouds[ci])] = rgb_list[ci]
            pts_j, mask_j = jnp.asarray(pts_b), jnp.asarray(mask_b)
            if gcfg.needs_normals():
                rows = _batch_normals(padded, clouds, normals_list,
                                      pts_j, mask_j, n, normal_radius,
                                      consistent_normals_method)
                for r, ci in enumerate(padded):
                    nrm_b[r, :len(clouds[ci])] = rows[r]

            prog = _global_batch_program(MB, n, gcfg, has_rgb)
            args = (pts_j, mask_j, jnp.asarray(nrm_b))
            if has_rgb:
                args += (jnp.asarray(rgb_b),)
            desc_b = np.asarray(
                prog(*args, jnp.asarray(gcfg.radius, jnp.float32)))

            for r in range(real):
                ci = chunk[r]
                xyz = clouds[ci]
                desc = desc_b[r][None, :]
                centroid = xyz.mean(axis=0).astype(np.float32)
                radius = float(np.linalg.norm(xyz - centroid, axis=1).max())
                valid = np.asarray([np.all(np.isfinite(desc))])
                out[ci] = make_feature_set(
                    desc, centroid[None, :],
                    np.eye(3, dtype=np.float32)[None], valid,
                    np.zeros(1, np.float32), np.full(1, radius, np.float32))

    return [fs for fs in out]  # type: ignore[misc]


def extract_local_features_batch(
    clouds: Sequence[np.ndarray],
    normals_list: Sequence[Optional[np.ndarray]],
    rgb_list: Sequence[Optional[np.ndarray]],
    fcfg: FeatureConfig,
    keypoint_cfg: ComponentConfig,
    normal_radius: float,
    consistent_normals_method: int,
    times: Optional[Dict[str, float]] = None,
    is_training: bool = False,
    mesh=None,
    chunk_width: int = 0,
    device_cache: Optional[list] = None,
) -> List[FeatureSet]:
    """Batched analogue of features.extract_local_features over a list of
    clouds.  Clouds are grouped by padded bucket size; each group is
    processed in mb-wide chunks with one vmapped program per stage.
    is_training only affects eligibility (keypoint culling is disabled in
    training by default, making VoxelGridCulling behave as plain VoxelGrid).
    With `mesh` the chunk axis is sharded over the mesh's 'data' devices
    (_to_dev) -- multi-chip training feature extraction.  chunk_width
    overrides the mb chunk (bucketed to 8/16/32 for program reuse): every
    chunk pays several device round-trips, which dominate training feature
    extraction through the axon tunnel, so train() uses wide chunks."""
    if chunk_width:
        mb = 8 if chunk_width <= 8 else (16 if chunk_width <= 16 else 32)
    else:
        mb = MB
    kp_params = KeypointParams.from_config(keypoint_cfg)
    assert batch_supported(fcfg, kp_params, clouds, is_training)
    check_rgb_available(fcfg, rgb_list)

    if is_training and train_fused_eligible(fcfg, kp_params, normals_list,
                                            consistent_normals_method):
        return _extract_local_features_fused_train(
            clouds, rgb_list, fcfg, kp_params, normal_radius,
            consistent_normals_method, mesh, chunk_width or MB,
            device_cache=device_cache)

    out: List[Optional[FeatureSet]] = [None] * len(clouds)

    # group clouds by (n_bucket, has_rgb): all stage shapes depend on these
    groups: Dict[Tuple[int, bool], List[int]] = {}
    for i, xyz in enumerate(clouds):
        key = (bucket_size(len(xyz)), rgb_list[i] is not None)
        groups.setdefault(key, []).append(i)

    # gaussian/KPQ culling scores consume normals, so compute them even
    # when the descriptor doesn't need them.  NOTE: the per-cloud rule
    # (features.py:needs_culling_normals) also computes normals for
    # geo="curvature"; decisions still match because the curvature score
    # never reads them (voxel keypoint positions are unaffected by extra
    # averaged fields)
    culling_needs_normals = (
        not _culling_plain(kp_params, is_training)
        and kp_params.filter_method_geometry.lower() in ("gaussian", "kpq"))
    want_normals = fcfg.needs_normals() or culling_needs_normals

    for (n, has_rgb), idxs in groups.items():
        # front stages (normals / voxel) for every chunk first, so the
        # culling and descriptor stages below can use ONE group-wide
        # keypoint capacity -- one compiled program variant per group, not
        # one per chunk (compile latency through the axon tunnel is the
        # scarce resource)
        e_parts = (["normals"] if want_normals else []) \
            + (["rgb"] if has_rgb else [])
        staged = []
        for chunk in _chunk_indices(idxs, width=mb):
            real = len(chunk)
            padded = chunk + [chunk[-1]] * (mb - real)

            pts_b = np.zeros((mb, n, 3), np.float32)
            mask_b = np.zeros((mb, n), bool)
            for r, ci in enumerate(padded):
                p, m = pad_cloud(clouds[ci], bucket=n)
                pts_b[r], mask_b[r] = p, m
            pts_j = _to_dev(pts_b, mesh)
            mask_j = _to_dev(mask_b, mesh)

            # --- normals (one dispatch for the chunk) ----------------------
            cloud_normals: List[Optional[np.ndarray]] = [None] * mb
            if want_normals:
                t_n = time.perf_counter()
                cloud_normals = _batch_normals(
                    padded, clouds, normals_list, pts_j, mask_j, n,
                    normal_radius, consistent_normals_method)
                if times is not None:
                    times["normals"] = times.get("normals", 0.0) \
                        + time.perf_counter() - t_n

            # --- voxel-grid keypoints (one dispatch) -----------------------
            t_k = time.perf_counter()
            e_dim = 3 * len(e_parts)
            if e_dim:
                extra_b = np.zeros((mb, n, e_dim), np.float32)
                for r, ci in enumerate(padded):
                    off = 0
                    if "normals" in e_parts:
                        extra_b[r, :len(clouds[ci]), 0:3] = cloud_normals[r]
                        off = 3
                    if "rgb" in e_parts:
                        extra_b[r, :len(clouds[ci]), off:off + 3] = rgb_list[ci]
                cents, cmask = _voxel_batch_program(
                    mb, n, e_dim, float(kp_params.leaf_size))(
                        pts_j, mask_j, _to_dev(extra_b, mesh))
            else:
                cents, cmask = _voxel_batch_program(
                    mb, n, 0, float(kp_params.leaf_size))(pts_j, mask_j)
            cents, cmask = np.asarray(cents), np.asarray(cmask)

            kps, kp_rgbs = [], []
            for r in range(mb):
                full = cents[r][cmask[r]]
                kps.append(full[:, :3])
                off = 3 + (3 if "normals" in e_parts else 0)
                kp_rgbs.append(full[:, off:off + 3] if has_rgb else None)

            if times is not None:
                times["keypoints"] = times.get("keypoints", 0.0) \
                    + time.perf_counter() - t_k

            staged.append(_ChunkState(chunk, padded, pts_b, mask_b, kps,
                                      kp_rgbs, cloud_normals, cents, cmask))

        # --- detection-time keypoint culling (one dispatch per chunk, ONE
        # program): scores for the whole chunk vmapped (VoxelGridCulling,
        # culling.cpp:280-330), thresholds/refinement on the host via the
        # same apply_culling_host the per-cloud path uses; the keypoint
        # capacity is the GROUP max so every chunk shares a compiled variant
        if not _culling_plain(kp_params, is_training):
            from .keypoints import apply_culling_host
            geo_f = kp_params.filter_method_geometry.lower()
            col_f = kp_params.filter_method_color.lower()
            t_k = time.perf_counter()
            k_cap = max(bucket_size(max(len(kp), 1), minimum=64)
                        for st in staged for kp in st.kps)
            for st in staged:
                real = len(st.chunk)
                kps, kp_rgbs = st.kps, st.kp_rgbs
                if col_f == "colordistance" and any(
                        rgb_list[ci] is None for ci in st.chunk):
                    raise ValueError("color culling needs RGB data")
                kpc = np.full((mb, k_cap, 3), 1e9, np.float32)
                kpm = np.zeros((mb, k_cap), bool)
                knc = np.zeros((mb, k_cap, 3), np.float32)
                krc = np.zeros((mb, k_cap, 3), np.float32)
                nrm_c = np.zeros((mb, n, 3), np.float32)
                rgb_c = np.zeros((mb, n, 3), np.float32)
                for r, ci in enumerate(st.padded):
                    kk = len(kps[r])
                    kpc[r, :kk] = kps[r]
                    kpm[r, :kk] = True
                    if "normals" in e_parts:
                        knc[r, :kk] = st.cents[r][st.cmask[r]][:, 3:6]
                        nrm_c[r, :len(clouds[ci])] = st.cloud_normals[r]
                    if kp_rgbs[r] is not None:
                        krc[r, :kk] = kp_rgbs[r]
                    if rgb_list[ci] is not None:
                        rgb_c[r, :len(clouds[ci])] = rgb_list[ci]
                g_b, c_b = _culling_batch_program(
                    mb, n, k_cap, geo_f, col_f,
                    float(kp_params.leaf_size),
                    float(kp_params.max_similar_color_distance))(
                        _to_dev(kpc, mesh), _to_dev(kpm, mesh),
                        _to_dev(knc, mesh), _to_dev(krc, mesh),
                        _to_dev(st.pts_b, mesh), _to_dev(st.mask_b, mesh),
                        _to_dev(nrm_c, mesh), _to_dev(rgb_c, mesh))
                g_b, c_b = np.asarray(g_b), np.asarray(c_b)
                for r in range(real):
                    kk = len(kps[r])
                    if kk == 0:
                        continue
                    kps[r], kp_rgbs[r] = apply_culling_host(
                        kps[r], kp_rgbs[r], g_b[r][:kk], c_b[r][:kk],
                        kp_params, return_colors=True)
                for r in range(real, mb):
                    # padded rows duplicate the last real cloud; reuse its
                    # culled keypoints instead of re-running the host stage
                    kps[r], kp_rgbs[r] = kps[real - 1], kp_rgbs[real - 1]
            if times is not None:
                times["keypoints"] = times.get("keypoints", 0.0) \
                    + time.perf_counter() - t_k

        # --- descriptor stage (one dispatch per chunk, ONE program) --------
        k_bucket = max(bucket_size(len(kp), minimum=64)
                       for st in staged for kp in st.kps)
        for st in staged:
            chunk, padded = st.chunk, st.padded
            pts_j, mask_j = _to_dev(st.pts_b, mesh), _to_dev(st.mask_b, mesh)
            kps, kp_rgbs, cloud_normals = st.kps, st.kp_rgbs, \
                st.cloud_normals
            real = len(chunk)
            kp_b = np.full((mb, k_bucket, 3), 1e9, np.float32)
            kpm_b = np.zeros((mb, k_bucket), bool)
            kprgb_b = np.zeros((mb, k_bucket, 3), np.float32)
            nrm_bj = np.zeros((mb, n, 3), np.float32)
            rgb_bj = np.zeros((mb, n, 3), np.float32)
            for r, ci in enumerate(padded):
                kp_b[r, :len(kps[r])] = kps[r]
                kpm_b[r, :len(kps[r])] = True
                if fcfg.needs_rgb():
                    if rgb_list[ci] is None:
                        raise ValueError(
                            f"{fcfg.type} needs RGB data but the cloud has none")
                    rgb_bj[r, :len(clouds[ci])] = rgb_list[ci]
                    if kp_rgbs[r] is not None:
                        kprgb_b[r, :len(kps[r])] = kp_rgbs[r]
                if fcfg.needs_normals():
                    nrm_bj[r, :len(clouds[ci])] = cloud_normals[r]

            packed = np.asarray(_descriptor_batch_program(
                mb, n, k_bucket, fcfg)(
                    _to_dev(kp_b, mesh), _to_dev(kpm_b, mesh), pts_j, mask_j,
                    _to_dev(nrm_bj, mesh), _to_dev(rgb_bj, mesh),
                    _to_dev(kprgb_b, mesh),
                    jnp.asarray(fcfg.radius, jnp.float32),
                    jnp.asarray(fcfg.ref_frame_radius, jnp.float32)))

            for r in range(real):
                ci = chunk[r]
                desc, d_valid, frames, f_valid = \
                    _unpack_descriptor_stage(packed[r])
                finite = np.all(np.isfinite(desc), axis=1)
                keep = d_valid & finite & kpm_b[r]
                centroid = clouds[ci].mean(axis=0)
                center_dist = np.linalg.norm(kp_b[r] - centroid, axis=1)
                out[ci] = make_feature_set(desc, kp_b[r], frames, keep,
                                           center_dist).compact()

    return [fs for fs in out]  # type: ignore[misc]
