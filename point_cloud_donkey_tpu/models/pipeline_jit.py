"""Fully-jitted classification forward step (no host round-trips).

One XLA program: voxel-grid keypoints -> normals -> SHOT LRF -> SHOT
descriptors -> codebook kNN activation -> vote casting -> per-class vote
density scores.  This is the serving hot path used by the batched/sharded
runner (parallel/) and the compile-check entry point (__graft_entry__.py).

Compared to the host-orchestrated ImplicitShapeModel.detect (models/ism.py),
this path keeps keypoints padded (no compaction) and scores classes with the
single-object-mode centroid density query
(voting_mean_shift.cpp:124-156 semantics with max type BandwidthVotes) or a
full fixed-iteration mean-shift.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops.lrf import shot_lrf
from ..ops.neighbors import knn
from ..ops.normals import compute_normals, compute_normals_fast
from ..ops.shot import cshot_descriptor_dense, shot_descriptor_dense
from ..ops.short_shot import short_shot_descriptor_dense
from ..ops.voxel_grid import voxel_grid
from ..ops import mean_shift as ms
from .codebook import CastVotes, CodebookParams, cast_votes
from .features import FeatureConfig


class JitPipelineConfig(NamedTuple):
    """Static pipeline configuration (hashable, closes over the jit)."""
    descriptor: str = "SHOT"
    radius: float = 0.6
    ref_frame_radius: float = 0.5
    leaf_size: float = 0.35
    normal_radius: float = 0.25
    normals_method: int = 2
    metric: str = "chisq"
    knn_k: int = 1
    keypoint_capacity: int = 512
    neighbor_capacity: int = 1024
    bandwidth: float = 0.5
    num_classes: int = 5
    # sorted-axis windowed normals capacity (ops/binned.py); 0 = dense
    # sweep.  Calibrate per workload with ops.binned.required_window; the
    # batched entry (classify_scores_batch) reports an exactness flag and
    # callers fall back to dense when it trips.
    normals_window: int = 0
    # batched-entry descriptor stage via the fused Pallas SHOT kernel
    # (ops/pallas/shot_fused.py) instead of the XLA one-hot matmuls;
    # honored only for descriptor == "SHOT" on a pallas-viable backend
    # (PCD_FUSED_DESC_INTERPRET=1 forces the interpret-mode kernel for
    # CPU coverage of the integration glue)
    fused_descriptor: bool = False
    # sorted-axis window capacity for the fused descriptor stage (points
    # swept per 8-keypoint tile); 0 = all N columns.  Calibrate with
    # ops.binned.required_window(..., tile_q=8, q_points=keypoints); the
    # batched entry's exactness flag covers this window too, so callers
    # fall back to the dense sweep when it trips.  Requires
    # fused_descriptor.  NOTE: at the bench geometry (descriptor radius
    # 0.6 vs ~2 principal extents) the calibrated window is the full N --
    # axis pruning only pays at larger N or smaller radii
    # (experiments/r6_headline.py).
    descriptor_window: int = 0
    # global keypoint-TILE capacity for the tile-compacted fused
    # descriptor stage (ops/pallas/shot_fused.shot_descriptor_fused_
    # compact); 0 = off.  Valid keypoints are packed tile-aligned across
    # the batch (~55% row occupancy at the bench geometry means ~45% of
    # the padded keypoint tiles are pure waste), and the votes/scores
    # tail runs on the flat compacted layout.  Calibrate with
    # shot_fused.required_tile_capacity on a representative batch; the
    # exactness flag trips on overflow.  Requires fused_descriptor;
    # takes precedence over descriptor_window.
    descriptor_tile_capacity: int = 0


def _pre_descriptor(points: jnp.ndarray, mask: jnp.ndarray,
                    cfg: JitPipelineConfig, rgb: jnp.ndarray = None,
                    normals: jnp.ndarray = None):
    """Stages before the descriptor for one cloud: normals, voxel-grid
    keypoints, SHOT LRFs.  Returns (kp [K,3], kp_rgb, lrf, normals)."""
    needs_normals = not cfg.descriptor.startswith("SHORT_SHOT")
    if normals is not None:
        pass
    elif not needs_normals:
        normals = jnp.zeros_like(points)
    elif cfg.normals_method == 2:
        # serving fast path: skip the PCA pass (only the normal is consumed)
        normals = compute_normals_fast(points, mask, cfg.normal_radius)
    else:
        normals = compute_normals(points, mask, cfg.normal_radius,
                                  cfg.normals_method).normals

    with_rgb = cfg.descriptor == "CSHOT"
    kres = voxel_grid(points, mask, cfg.leaf_size,
                      capacity=cfg.keypoint_capacity,
                      features=rgb if with_rgb else None)
    kp = kres.centroids[:, :3]
    kp_rgb = kres.centroids[:, 3:6] if with_rgb else None
    kp_mask = kres.mask
    # park invalid keypoints far away (mask-aware ops don't need it, but it
    # keeps any numerical noise out of radius windows)
    kp = jnp.where(kp_mask[:, None], kp, 1e9)

    lrf = shot_lrf(kp, kp_mask, points, mask, cfg.ref_frame_radius)
    return kp, kp_rgb, lrf, normals


def extract_features_jit(points: jnp.ndarray, mask: jnp.ndarray,
                         cfg: JitPipelineConfig, rgb: jnp.ndarray = None,
                         normals: jnp.ndarray = None):
    """points [N,3], mask [N] -> (keypoints [K,3], frames [K,3,3],
    descriptors [K,D], valid [K]).  rgb [N,3] required for CSHOT.
    `normals` short-circuits the normal stage (the batched windowed entry
    computes them once over the whole sorted batch)."""
    kp, kp_rgb, lrf, normals = _pre_descriptor(points, mask, cfg, rgb,
                                               normals)
    if cfg.descriptor == "SHOT":
        # dense gather-free SHOT: the serving path never touches a random-
        # access neighbor gather (ops/shot.shot_descriptor_dense)
        res = shot_descriptor_dense(kp, lrf.frames, lrf.valid, points,
                                    normals, mask, cfg.radius)
    elif cfg.descriptor == "CSHOT":
        res = cshot_descriptor_dense(kp, kp_rgb, lrf.frames, lrf.valid,
                                     points, normals, rgb, mask, cfg.radius)
    elif cfg.descriptor == "SHORT_SHOT":
        res = short_shot_descriptor_dense(kp, lrf.frames, lrf.valid, points,
                                          mask, cfg.radius)
    else:
        raise ValueError(cfg.descriptor)
    valid = res.valid & jnp.all(jnp.isfinite(res.descriptors), axis=1)
    return kp, lrf.frames, res.descriptors, valid


class ClassifyIntermediates(NamedTuple):
    """Every stage output of the fused classification step, for the
    platform-divergence A/B instrument (platform_ab.py)."""
    scores: jnp.ndarray         # [num_classes]
    keypoints: jnp.ndarray      # [K, 3]
    descriptors: jnp.ndarray    # [K, D]
    desc_valid: jnp.ndarray     # [K]
    vote_position: jnp.ndarray  # [T, 3]
    vote_weight: jnp.ndarray    # [T]
    vote_class: jnp.ndarray     # [T]
    vote_valid: jnp.ndarray     # [T]


def classify_intermediates(points: jnp.ndarray, mask: jnp.ndarray, cb,
                           cfg: JitPipelineConfig,
                           cb_params: CodebookParams,
                           rgb: jnp.ndarray = None,
                           normals: jnp.ndarray = None
                           ) -> ClassifyIntermediates:
    """classify_scores plus all stage outputs.  classify_scores delegates
    here so the instrumented and serving paths can never drift; under jit
    XLA dead-code-eliminates whichever outputs the caller drops."""
    kp, frames, desc, valid = extract_features_jit(points, mask, cfg, rgb,
                                                   normals)
    votes = cast_votes(cb, desc, kp, frames, valid, cb_params, cfg.metric)

    m = mask.astype(points.dtype)
    centroid = jnp.sum(points * m[:, None], axis=0) / jnp.maximum(m.sum(), 1.0)

    d2 = jnp.sum((votes.position - centroid[None, :]) ** 2, axis=1)
    b2 = cfg.bandwidth * cfg.bandwidth
    in_r = (d2 <= b2) & votes.valid
    kern = jnp.exp(-0.5 * d2 / b2)
    w = jnp.where(in_r, kern * votes.weight, 0.0)
    scores = jax.ops.segment_sum(w, votes.class_id, num_segments=cfg.num_classes)
    return ClassifyIntermediates(
        scores=scores, keypoints=kp, descriptors=desc, desc_valid=valid,
        vote_position=votes.position, vote_weight=w,
        vote_class=votes.class_id, vote_valid=in_r)


def classify_scores(points: jnp.ndarray, mask: jnp.ndarray, cb,
                    cfg: JitPipelineConfig,
                    cb_params: CodebookParams,
                    rgb: jnp.ndarray = None,
                    normals: jnp.ndarray = None) -> jnp.ndarray:
    """Forward step: per-class scores [num_classes] for one cloud via the
    centroid density query (single-object mode)."""
    return classify_intermediates(points, mask, cb, cfg, cb_params, rgb,
                                  normals).scores


def _scores_from_features(points, mask, kp, frames, desc, valid, cb,
                          cfg: JitPipelineConfig,
                          cb_params: CodebookParams) -> jnp.ndarray:
    """Post-descriptor tail of classify_scores (votes + centroid density
    scores) for one cloud -- shared by the per-cloud path and the batched
    fused-descriptor entry."""
    votes = cast_votes(cb, desc, kp, frames, valid, cb_params, cfg.metric)
    m = mask.astype(points.dtype)
    centroid = jnp.sum(points * m[:, None], axis=0) / jnp.maximum(m.sum(), 1.0)
    d2 = jnp.sum((votes.position - centroid[None, :]) ** 2, axis=1)
    b2 = cfg.bandwidth * cfg.bandwidth
    in_r = (d2 <= b2) & votes.valid
    kern = jnp.exp(-0.5 * d2 / b2)
    w = jnp.where(in_r, kern * votes.weight, 0.0)
    return jax.ops.segment_sum(w, votes.class_id,
                               num_segments=cfg.num_classes)


def _scores_from_features_flat(points, mask, kp_flat, frames_flat,
                               desc_flat, valid_flat, cloud_id, b,
                               cb, cfg: JitPipelineConfig,
                               cb_params: CodebookParams) -> jnp.ndarray:
    """_scores_from_features over the FLAT tile-compacted keypoint layout:
    cast_votes is per-row, so it runs once over all clouds' compacted rows;
    scores come from one segment_sum keyed by cloud * C + class."""
    votes = cast_votes(cb, desc_flat, kp_flat, frames_flat, valid_flat,
                       cb_params, cfg.metric)
    m = mask.astype(points.dtype)
    centroid = jnp.sum(points * m[..., None], axis=1) \
        / jnp.maximum(m.sum(axis=1), 1.0)[:, None]          # [B, 3]
    t = votes.position.shape[0]
    rep = t // desc_flat.shape[0]
    vcloud = jnp.repeat(cloud_id, rep)
    cent = centroid[vcloud]
    d2 = jnp.sum((votes.position - cent) ** 2, axis=1)
    b2 = cfg.bandwidth * cfg.bandwidth
    in_r = (d2 <= b2) & votes.valid
    kern = jnp.exp(-0.5 * d2 / b2)
    w = jnp.where(in_r, kern * votes.weight, 0.0)
    seg = vcloud * cfg.num_classes + votes.class_id
    return jax.ops.segment_sum(
        w, seg, num_segments=b * cfg.num_classes
    ).reshape(b, cfg.num_classes)


def _use_fused_descriptor(cfg: JitPipelineConfig) -> Tuple[bool, bool]:
    """(enabled, interpret) for the batched fused-SHOT descriptor stage."""
    import os
    if not (cfg.fused_descriptor and cfg.descriptor == "SHOT"):
        return False, False
    if os.environ.get("PCD_FUSED_DESC_INTERPRET") == "1":
        return True, True
    from ..ops.pallas import use_pallas
    return use_pallas(), False


def classify_scores_batch(points: jnp.ndarray,  # [B, N, 3]
                          mask: jnp.ndarray,    # [B, N]
                          cb, cfg: JitPipelineConfig,
                          cb_params: CodebookParams,
                          rgb: jnp.ndarray = None):
    """Batched forward step.  With cfg.normals_window > 0 (and a normals-
    consuming descriptor at ConsistentNormalsMethod 2) the normal stage
    runs ONCE over the principal-axis-sorted batch through the windowed
    sweep (ops/binned.py) -- the headline's HBM/VPU hot spot cut by the
    window/N ratio -- and the per-cloud stages run on the sorted clouds
    (scores are point-order invariant).  Returns (scores [B, C], exact []):
    `exact` False means some tile's candidate range overflowed the window
    capacity; the caller must rerun with the dense path (bench.py does)."""
    from ..ops.binned import (PARK, compute_normals_fast_windowed,
                              sort_clouds_ex)

    needs_normals = not cfg.descriptor.startswith("SHORT_SHOT")
    windowed = (cfg.normals_window > 0 and needs_normals
                and cfg.normals_method == 2)
    fused, interp = _use_fused_descriptor(cfg)
    windowed_desc = fused and cfg.descriptor_window > 0

    if not windowed and not fused:
        scores = jax.vmap(
            lambda p, m, r: classify_scores(p, m, cb, cfg, cb_params, r),
            in_axes=(0, 0, None if rgb is None else 0))(points, mask, rgb)
        return scores, jnp.asarray(True)

    exact = jnp.asarray(True)
    normals = None
    keys_s = axis = None
    if windowed or windowed_desc:
        points, mask, keys_s, order, axis = sort_clouds_ex(points, mask)
        rgb = None if rgb is None else jnp.take_along_axis(
            rgb, order[..., None], axis=1)
    if windowed:
        normals, n_exact = compute_normals_fast_windowed(
            points, mask, keys_s, cfg.normal_radius, cfg.normals_window)
        exact = exact & n_exact

    if not fused:
        scores = jax.vmap(
            lambda p, m, r, nr: classify_scores(p, m, cb, cfg, cb_params,
                                                r, nr),
            in_axes=(0, 0, None if rgb is None else 0, 0))(
                points, mask, rgb, normals)
        return scores, exact

    # fused-descriptor path: per-cloud pre stages, ONE batch-level fused
    # SHOT kernel, per-cloud votes/scores
    from ..ops.pallas.shot_fused import (TK, shot_descriptor_fused,
                                         shot_descriptor_fused_compact,
                                         shot_descriptor_fused_windowed)

    def pre(p, m, nr):
        kp, _, lrf, nr2 = _pre_descriptor(p, m, cfg, None, nr)
        return kp, lrf.frames, lrf.valid, nr2

    kp, frames, f_valid, nrm = jax.vmap(
        pre, in_axes=(0, 0, None if normals is None else 0))(
            points, mask, normals)
    if cfg.descriptor_tile_capacity > 0:
        # tile-compacted layout: valid keypoints packed TK-aligned across
        # the batch; votes/scores run flat (no [B, K] padding downstream)
        kp_m = kp[..., 0] < 1e9          # voxel output is valid-first
        if kp.shape[1] % TK:
            pad = (-kp.shape[1]) % TK
            kp = jnp.pad(kp, ((0, 0), (0, pad), (0, 0)),
                         constant_values=1e9)
            kp_m = jnp.pad(kp_m, ((0, 0), (0, pad)))
            frames = jnp.pad(frames, ((0, 0), (0, pad), (0, 0), (0, 0)))
            f_valid = jnp.pad(f_valid, ((0, 0), (0, pad)))
        desc, valid, kp_f, fr_f, cloud_id, c_exact = \
            shot_descriptor_fused_compact(
                kp, frames, f_valid, kp_m, points, nrm, mask, cfg.radius,
                cfg.descriptor_tile_capacity, interpret=interp)
        exact = exact & c_exact
        scores = _scores_from_features_flat(
            points, mask, kp_f, fr_f, desc, valid, cloud_id,
            points.shape[0], cb, cfg, cb_params)
        return scores, exact
    if windowed_desc:
        # co-sort keypoints by the clouds' principal-axis key so each
        # TK-keypoint tile sweeps only a contiguous sorted-point window
        kp_m = kp[..., 0] < 1e9            # _pre_descriptor parks invalid
        kp_keys = jnp.where(kp_m, jnp.einsum("bkd,bd->bk", kp, axis), PARK)
        kp_order = jnp.argsort(kp_keys, axis=1)
        kp_keys = jnp.take_along_axis(kp_keys, kp_order, axis=1)
        kp = jnp.take_along_axis(kp, kp_order[..., None], axis=1)
        frames = jnp.take_along_axis(
            frames, kp_order[..., None, None], axis=1)
        f_valid = jnp.take_along_axis(f_valid, kp_order, axis=1)
        if kp.shape[1] % TK:
            pad = (-kp.shape[1]) % TK
            kp = jnp.pad(kp, ((0, 0), (0, pad), (0, 0)),
                         constant_values=1e9)
            kp_keys = jnp.pad(kp_keys, ((0, 0), (0, pad)),
                              constant_values=PARK)
            frames = jnp.pad(frames, ((0, 0), (0, pad), (0, 0), (0, 0)))
            f_valid = jnp.pad(f_valid, ((0, 0), (0, pad)))
        desc, valid, d_exact = shot_descriptor_fused_windowed(
            kp, kp_keys, frames, f_valid, points, keys_s, nrm, mask,
            cfg.radius, cfg.descriptor_window, interpret=interp)
        exact = exact & d_exact
    else:
        desc, valid = shot_descriptor_fused(kp, frames, f_valid, points,
                                            nrm, mask, cfg.radius,
                                            interpret=interp)
    scores = jax.vmap(
        lambda p, m, k, f, d, v: _scores_from_features(
            p, m, k, f, d, v, cb, cfg, cb_params))(
            points, mask, kp, frames, desc, valid)
    return scores, exact


def classify_scores_instances(points: jnp.ndarray, mask: jnp.ndarray, cb,
                              cfg: JitPipelineConfig,
                              cb_params: CodebookParams,
                              num_instances: int,
                              rgb: jnp.ndarray = None
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """classify_scores variant that also accumulates per-instance centroid
    densities (votes carry instance ids, codebook.cpp vote records), for the
    eval CLI's instance-accuracy metric in --fast mode."""
    kp, frames, desc, valid = extract_features_jit(points, mask, cfg, rgb)
    votes = cast_votes(cb, desc, kp, frames, valid, cb_params, cfg.metric)

    m = mask.astype(points.dtype)
    centroid = jnp.sum(points * m[:, None], axis=0) / jnp.maximum(m.sum(), 1.0)
    d2 = jnp.sum((votes.position - centroid[None, :]) ** 2, axis=1)
    b2 = cfg.bandwidth * cfg.bandwidth
    in_r = (d2 <= b2) & votes.valid
    kern = jnp.exp(-0.5 * d2 / b2)
    w = jnp.where(in_r, kern * votes.weight, 0.0)
    cls_scores = jax.ops.segment_sum(w, votes.class_id,
                                     num_segments=cfg.num_classes)
    inst_scores = jax.ops.segment_sum(w, votes.instance_id,
                                      num_segments=num_instances)
    return cls_scores, inst_scores


def _per_class_best_maximum(points, mask, cb, cfg: JitPipelineConfig,
                            cb_params: CodebookParams, seed_capacity: int,
                            max_iter: int):
    """Shared mean-shift serving body: features -> votes -> per-class
    mean-shift -> (best density [C], best center [C, 3], any-alive [C])."""
    kp, frames, desc, valid = extract_features_jit(points, mask, cfg)
    votes = cast_votes(cb, desc, kp, frames, valid, cb_params, cfg.metric)
    bw = jnp.asarray(cfg.bandwidth, points.dtype)

    def per_class(c):
        sel = votes.valid & (votes.class_id == c)
        w = jnp.where(sel, votes.weight, 0.0)
        pos = jnp.where(sel[:, None], votes.position, 1e9)
        seeds, _, seed_mask = ms.create_seeds(pos, w, sel, ms.seeds_range(bw),
                                              seed_capacity)
        centers, alive = ms.mean_shift(seeds, seed_mask, pos, w, sel, bw,
                                       max_iter=max_iter)
        dens = ms.estimate_density(centers, pos, w, sel, bw)
        dens = jnp.where(alive, dens, 0.0)
        best = jnp.argmax(dens)
        return dens[best], centers[best], jnp.any(alive)

    return jax.vmap(per_class)(jnp.arange(cfg.num_classes))


def classify_scores_mean_shift(points: jnp.ndarray, mask: jnp.ndarray, cb,
                               cfg: JitPipelineConfig,
                               cb_params: CodebookParams,
                               seed_capacity: int = 256,
                               max_iter: int = 100) -> jnp.ndarray:
    """Forward step with the full mean-shift per class: score of a class =
    density of its best maximum (classification decision parity with the
    DEFAULT single-object-mode path)."""
    dens, _, _ = _per_class_best_maximum(points, mask, cb, cfg, cb_params,
                                         seed_capacity, max_iter)
    return dens


def detect_maxima_jit(points: jnp.ndarray, mask: jnp.ndarray, cb,
                      cfg: JitPipelineConfig,
                      cb_params: CodebookParams,
                      seed_capacity: int = 256,
                      max_iter: int = 100):
    """Fused detection step: one program from raw points to the per-class
    best mean-shift maximum.  Returns (densities [C], positions [C, 3]) --
    the serving analogue of VotingMeanShift::findMaxima's top maximum per
    class (voting_mean_shift.cpp iFindMaxima); classes with no votes report
    density 0 at position 0."""
    dens, centers, any_alive = _per_class_best_maximum(
        points, mask, cb, cfg, cb_params, seed_capacity, max_iter)
    has = any_alive & (dens > 0)
    return dens, jnp.where(has[:, None], centers, 0.0)
