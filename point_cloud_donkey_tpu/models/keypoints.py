"""Keypoint detectors: VoxelGrid + VoxelGridCulling (keypoint selection).

Reference: keypoints/keypoints_voxel_grid.cpp (plain grid centroids) and
keypoints/keypoints_voxel_grid_culling.cpp (grid + keypoint-quality culling):

  * geometry scores: "curvature" (normal-estimation curvature recomputed at
    the keypoints with radius = leaf size), "gaussian" (pc1*pc2 principal
    curvatures at keypoints), "kpq" (Mian et al. keypoint quality over dense
    principal curvatures, culling.cpp:437-470);
  * color score: fraction of in-radius neighbors whose CIELab distance to the
    keypoint color exceeds MaxSimilarColorDistance (culling.cpp:474-506);
  * thresholds: "CutOff" (sorted-score quantile at FilterCutoffRatio),
    "Threshold" (fixed), "Auto" (histogram-step heuristic,
    culling.cpp:369-400);
  * combination: RequireOne / RequireBoth / RequireCombinedList with the
    reference's combined-score normalization (geo-gmin)/gmax (sic,
    culling.cpp:331-340);
  * optional position refinement to the best-scoring neighbor keypoint
    (culling.cpp:509-...);
  * culling disabled during training by default (DisableFilterInTraining).

Divergence note: for the "gaussian" method PCL's PrincipalCurvaturesEstimation
is fed keypoints as input but cloud-sized normals, so the projection normal it
uses is indexed out of correspondence (a PCL quirk the reference inherits);
here the keypoint's voxel-averaged normal is used instead (the evident intent).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.color import color_distance, rgb_to_cielab_normalized
from ..ops.curvature import principal_curvatures
from ..ops.neighbors import pairwise_sqdist
from ..ops.normals import pca_normals
from ..ops.voxel_grid import voxel_grid
from ..utils.config import ComponentConfig


@dataclass
class KeypointParams:
    type: str = "VoxelGrid"
    leaf_size: float = 0.1
    filter_method_geometry: str = "None"
    filter_type_geometry: str = "CutOff"
    filter_threshold_geometry: float = 0.005
    filter_method_color: str = "None"
    filter_type_color: str = "CutOff"
    filter_threshold_color: float = 0.02
    max_similar_color_distance: float = 0.01
    filter_cutoff_ratio: float = 0.5
    disable_filter_in_training: bool = True
    combine_filters: str = "RequireCombinedList"
    refine_position: bool = False
    # Harris3D (keypoints_harris3d.cpp:7-11)
    harris_threshold: float = 1e-4
    harris_nonmax: bool = True
    harris_refine: bool = True
    # ISS3D (keypoints_iss3d.cpp:7-13)
    iss_salient_radius: float = 0.1
    iss_nonmax_radius: float = 0.05
    iss_gamma21: float = 0.975
    iss_gamma32: float = 0.975
    iss_min_neighbors: int = 5
    # Harris3D / SIFT3D support radius (both call it "Radius")
    radius: float = 0.05

    @classmethod
    def from_config(cls, cfg: ComponentConfig) -> "KeypointParams":
        return cls(
            type=cfg.type or "VoxelGrid",
            leaf_size=cfg.get("LeafSize", 0.1),
            filter_method_geometry=cfg.get("FilterMethodGeometry", "None"),
            filter_type_geometry=cfg.get("FilterTypeGeometry", "CutOff"),
            filter_threshold_geometry=cfg.get("FilterThresholdGeometry", 0.005),
            filter_method_color=cfg.get("FilterMethodColor", "None"),
            filter_type_color=cfg.get("FilterTypeColor", "CutOff"),
            filter_threshold_color=cfg.get("FilterThresholdColor", 0.02),
            max_similar_color_distance=cfg.get("MaxSimilarColorDistance", 0.01),
            filter_cutoff_ratio=cfg.get("FilterCutoffRatio", 0.5),
            disable_filter_in_training=cfg.get("DisableFilterInTraining", True),
            combine_filters=cfg.get("CombineFilters", "RequireCombinedList"),
            refine_position=cfg.get("RefineKeypointPosition", False),
            harris_threshold=cfg.get("Threshold", 1e-4),
            harris_nonmax=cfg.get("NonMaxSupression", True),
            harris_refine=cfg.get("Refine", True),
            iss_salient_radius=cfg.get("SalientRadius", 0.1),
            iss_nonmax_radius=cfg.get("NonMaxRadius", 0.05),
            iss_gamma21=cfg.get("Gamma21", 0.975),
            iss_gamma32=cfg.get("Gamma32", 0.975),
            iss_min_neighbors=cfg.get("MinNeighbors", 5),
            radius=cfg.get("Radius", 0.05),
        )


@functools.lru_cache(maxsize=None)
def _detector_stage(n: int, kind: str, p1: float, p2: float, p3: float,
                    p4: float, p5: int, flag1: bool, flag2: bool):
    from ..ops.keypoint_detectors import harris3d, iss3d, sift3d

    @jax.jit
    def run(points, normals, intensity, mask):
        if kind == "Harris3D":
            return harris3d(points, normals, mask, p1, threshold=p2,
                            nonmax=flag1, refine=flag2)
        if kind == "ISS3D":
            return iss3d(points, mask, p1, p2, p3, p4, p5)
        return sift3d(points, intensity, mask, p1)
    return run


def culling_disabled(params: KeypointParams, is_training: bool) -> bool:
    """True when VoxelGridCulling behaves as a plain VoxelGrid
    (culling.cpp:76-87): plain type, culling disabled in training, or both
    filter methods None.  Single source of truth for the per-cloud path and
    detect_batch, so their keypoint decisions cannot drift."""
    geo = params.filter_method_geometry.lower()
    col = params.filter_method_color.lower()
    return (params.type == "VoxelGrid"
            or (is_training and params.disable_filter_in_training)
            or (geo == "none" and col == "none"))


def _detector_keypoints(points: np.ndarray, normals: Optional[np.ndarray],
                        params: KeypointParams) -> np.ndarray:
    """Harris3D / ISS3D / SIFT3D dispatch (PCL-wrapper keypoint types)."""
    from ..ops.tiled import SCENE_TILE_THRESHOLD
    if len(points) > SCENE_TILE_THRESHOLD:
        return _tiled_detector_keypoints(points, normals, params)
    from .features import pad_cloud
    pts, mask = pad_cloud(points)
    n = pts.shape[0]
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
    if params.type == "Harris3D" or params.type == "SIFT3D":
        # both need normals/curvature at the support radius
        nres = pca_normals(pts_j, mask_j, params.radius)
        nrm = nres.normals if normals is None or len(normals) != len(points)             else jnp.asarray(np.concatenate(
                [normals, np.zeros((n - len(points), 3), np.float32)]))
        # degenerate (<3-neighbor) covariances cancel to fp noise under the
        # moments identity, making lambda0/total garbage; a plane fit needs
        # 3 points (PCL returns NaN curvature there), so gate on validity
        intensity = jnp.where(nres.valid, nres.curvature, 0.0)
    else:
        nrm = jnp.zeros((n, 3), jnp.float32)
        intensity = jnp.zeros(n, jnp.float32)
    if params.type == "Harris3D":
        stage = _detector_stage(n, "Harris3D", float(params.radius),
                                float(params.harris_threshold), 0.0, 0.0, 0,
                                bool(params.harris_nonmax),
                                bool(params.harris_refine))
    elif params.type == "ISS3D":
        stage = _detector_stage(n, "ISS3D", float(params.iss_salient_radius),
                                float(params.iss_nonmax_radius),
                                float(params.iss_gamma21),
                                float(params.iss_gamma32),
                                int(params.iss_min_neighbors), False, False)
    else:
        stage = _detector_stage(n, "SIFT3D", float(params.radius),
                                0.0, 0.0, 0.0, 0, False, False)
    res = stage(pts_j, nrm, intensity, mask_j)
    keep = np.asarray(res.is_keypoint)
    return np.asarray(res.positions)[keep]


def _tiled_detector_keypoints(points: np.ndarray,
                              normals: Optional[np.ndarray],
                              params: KeypointParams) -> np.ndarray:
    """Harris3D / ISS3D / SIFT3D at scene scale: the same response math as
    ops/keypoint_detectors.py decomposed into windowed accumulation passes
    (ops/tiled.py) plus eager [N]-sized linear algebra; parity with the
    dense programs pinned by test.  SIFT3D's coarse-octave Gaussian supports
    are wide (3 * min_scale * 2^octaves), so its plans shrink the query
    chunk as the window grows to keep chunk*window memory bounded."""
    from ..ops.eigh3 import eigh3x3
    from ..ops.tiled import (NORMALS_CHUNK, plan_tiles, sort_key_axis,
                             tiled_neighbor_max, tiled_payload_moments,
                             tiled_radius_moments)

    axis = sort_key_axis(points)
    order = np.argsort(points[:, axis], kind="stable")
    pts_s = np.ascontiguousarray(points[order], dtype=np.float32)
    n = len(pts_s)
    p_mask = np.ones(n, bool)
    nq = max(1, -(-n // NORMALS_CHUNK)) * NORMALS_CHUNK
    q_pad = np.full((nq, 3), 1e9, np.float32)
    q_pad[:n] = pts_s
    q_valid = np.zeros(nq, bool)
    q_valid[:n] = True

    def _plan(radius):
        return plan_tiles(q_pad[:, axis], q_valid, pts_s[:, axis], radius,
                          NORMALS_CHUNK)

    if params.type == "SIFT3D":
        keep = _tiled_sift3d(q_pad, q_valid, pts_s, p_mask, axis,
                             float(params.radius))
        keep_full = np.zeros(n, bool)
        keep_full[order] = keep[:n]
        return points[keep_full].astype(np.float32)

    if params.type == "Harris3D":
        radius = float(params.radius)
        plan = _plan(radius)
        if normals is not None and len(normals) == n:
            nrm_s = np.ascontiguousarray(normals[order], dtype=np.float32)
        else:
            # pca_normals fallback (sign-irrelevant: Harris uses n n^T)
            mom = tiled_radius_moments(q_pad, pts_s, p_mask, plan, radius)
            _, vecs = eigh3x3(mom.cov)
            nrm_s = np.asarray(vecs[:n, :, 0])
        nn = np.einsum("ja,jb->jab", nrm_s, nrm_s).reshape(n, 9)
        nntp = np.einsum("jab,jb->ja", nn.reshape(n, 3, 3), pts_s)
        payload = np.concatenate([nn, nntp], axis=1).astype(np.float32)
        _, sums = tiled_payload_moments(q_pad, pts_s, payload, p_mask, plan,
                                        radius)
        sums = np.asarray(sums)[:n]
        C = jnp.asarray(sums[:, :9].reshape(n, 3, 3))
        det = np.asarray(jnp.linalg.det(C))
        tr = sums[:, 0] + sums[:, 4] + sums[:, 8]
        r = det - 0.04 * tr * tr
        keep = r > params.harris_threshold
        if params.harris_nonmax:
            _, neigh_max = tiled_neighbor_max(q_pad, pts_s,
                                              r.astype(np.float32),
                                              p_mask, plan, radius)
            keep = keep & (r >= np.asarray(neigh_max)[:n])
        pos = pts_s
        if params.harris_refine:
            b = jnp.asarray(sums[:, 9:12])
            ok = np.abs(det) > 1e-9
            A_safe = jnp.where(jnp.asarray(ok)[:, None, None], C,
                               jnp.eye(3, dtype=jnp.float32))
            x = np.asarray(jnp.linalg.solve(A_safe, b[..., None])[..., 0])
            near = ((x - pts_s) ** 2).sum(axis=1) <= radius * radius
            pos = np.where((ok & near)[:, None], x, pts_s)
        # back to original cloud order (the dense program's output order)
        keep_full = np.zeros(n, bool)
        keep_full[order] = keep
        pos_full = np.empty((n, 3), np.float32)
        pos_full[order] = pos
        return pos_full[keep_full]

    # ISS3D: pass 1 = per-point support counts, pass 2 = density-weighted
    # scatter, pass 3 = saliency NMS
    sal_r = float(params.iss_salient_radius)
    plan_s = _plan(sal_r)
    cnt, _ = tiled_payload_moments(q_pad, pts_s,
                                   np.ones((n, 1), np.float32), p_mask,
                                   plan_s, sal_r)
    cnt = np.maximum(np.asarray(cnt)[:n].astype(np.float32), 1.0)
    wj = 1.0 / cnt
    pp = np.einsum("ja,jb->jab", pts_s, pts_s).reshape(n, 9)
    payload = np.concatenate([wj[:, None], wj[:, None] * pts_s,
                              wj[:, None] * pp], axis=1).astype(np.float32)
    _, sums = tiled_payload_moments(q_pad, pts_s, payload, p_mask, plan_s,
                                    sal_r)
    sums = np.asarray(sums)[:n]
    wsum = np.maximum(sums[:, 0], 1e-12)
    S1 = sums[:, 1:4]
    S2 = sums[:, 4:13].reshape(n, 3, 3)
    q = pts_s
    cross = np.einsum("na,nb->nab", S1, q)
    outer_q = np.einsum("na,nb->nab", q, q)
    S = (S2 - cross - cross.transpose(0, 2, 1)
         + wsum[:, None, None] * outer_q) / wsum[:, None, None]
    vals, _ = eigh3x3(jnp.asarray(S))
    vals = np.asarray(vals)
    e1, e2, e3 = vals[:, 2], vals[:, 1], vals[:, 0]
    ok = (e2 / np.maximum(e1, 1e-12) < params.iss_gamma21) \
        & (e3 / np.maximum(e2, 1e-12) < params.iss_gamma32) & (e3 > 0)
    saliency = np.where(ok, e3, -np.inf).astype(np.float32)
    nm_r = float(params.iss_nonmax_radius)
    plan_nm = _plan(nm_r)
    n_nm, neigh_max = tiled_neighbor_max(q_pad, pts_s, saliency, p_mask,
                                         plan_nm, nm_r)
    keep = ok & (saliency >= np.asarray(neigh_max)[:n]) \
        & (np.asarray(n_nm)[:n] >= params.iss_min_neighbors)
    keep_full = np.zeros(n, bool)
    keep_full[order] = keep
    return points[keep_full].astype(np.float32)


def _tiled_sift3d(q_pad: np.ndarray, q_valid: np.ndarray, pts_s: np.ndarray,
                  p_mask: np.ndarray, axis: int, min_scale: float,
                  n_octaves: int = 4, scales_per_octave: int = 3,
                  min_contrast: float = 0.0) -> np.ndarray:
    """ops/keypoint_detectors.sift3d decomposed into windowed passes: per
    octave, tiled Gaussian smoothing of the curvature field at each sigma,
    host DoG differencing, then a tiled neighbor min/max extremum test per
    interior layer.  Coarse octaves have supports of 3 * min_scale * 2^o, so
    each plan shrinks the query chunk as the window grows (chunk * window
    <= 2^24 elements).  Returns keep flags in sorted-query order.

    Tiled results equal the dense program up to fp summation order; the
    strict-inequality extremum test binarizes that, so points whose DoG
    margin is at fp32 noise level can flip (measured: 3 of ~142 keypoints
    on a noise-dominated synthetic plane, 0 on smooth structure -- the
    pinned parity test uses a smooth fixture)."""
    from ..ops.eigh3 import eigvals3x3
    from ..ops.tiled import (NORMALS_CHUNK, plan_tiles, tiled_gaussian_smooth,
                             tiled_radius_moments, tiled_sift_extrema)
    n = len(pts_s)

    def _plan(radius):
        plan = plan_tiles(q_pad[:, axis], q_valid, pts_s[:, axis], radius,
                          NORMALS_CHUNK)
        chunk = NORMALS_CHUNK
        while chunk > 64 and chunk * plan.window > (1 << 24):
            chunk //= 2
        if chunk != NORMALS_CHUNK:
            plan = plan_tiles(q_pad[:, axis], q_valid, pts_s[:, axis],
                              radius, chunk)
        return plan

    # intensity = PCA curvature at the support radius (the dense path's
    # pca_normals(points, mask, radius).curvature, gated on >= 3 neighbors
    # exactly like the dense branch -- degenerate covariances cancel to fp
    # noise under the moments identity)
    mom = tiled_radius_moments(q_pad, pts_s, p_mask, _plan(min_scale),
                               min_scale)
    vals = np.asarray(eigvals3x3(mom.cov))
    total = vals.sum(axis=1)
    curv = np.where((total > 0) & (np.asarray(mom.count) >= 3),
                    vals[:, 0] / np.maximum(total, 1e-30),
                    0.0).astype(np.float32)
    intensity = curv[:n]

    keep = np.zeros(len(q_pad), bool)
    for o in range(n_octaves):
        base = min_scale * (2.0 ** o)
        sigmas = [base * (2.0 ** (s / scales_per_octave))
                  for s in range(scales_per_octave + 1)]
        smoothed = [np.asarray(tiled_gaussian_smooth(
            q_pad, pts_s, intensity, p_mask, _plan(3.0 * s), s))
            for s in sigmas]
        dogs = [smoothed[i + 1] - smoothed[i] for i in range(len(sigmas) - 1)]
        for li in range(1, len(dogs) - 1):
            sig = sigmas[li]
            layers = np.stack([dogs[li - 1][:n], dogs[li][:n],
                               dogs[li + 1][:n]], axis=1).astype(np.float32)
            any_nb, lo, hi = tiled_sift_extrema(q_pad, pts_s, layers, p_mask,
                                                _plan(sig), sig)
            any_nb, lo, hi = (np.asarray(any_nb), np.asarray(lo),
                              np.asarray(hi))
            dog = dogs[li]
            is_min = (dog < lo) & (dog < dogs[li - 1]) & (dog < dogs[li + 1])
            is_max = (dog > hi) & (dog > dogs[li - 1]) & (dog > dogs[li + 1])
            keep |= q_valid & (is_min | is_max) \
                & (np.abs(dog) >= min_contrast) & any_nb
    return keep


def _tiled_culling_scores(kp, kp_normals, kp_rgb, points, normals, rgb,
                          geo: str, col: str, leaf: float,
                          max_col_dist: float):
    """Scene-scale culling scores: sort cloud + keypoints along the longest
    axis and run the windowed stages (ops/tiled.py); same math as
    culling_scores, bounded to O(chunk * window) memory.  Returns compact
    [K] (geo_scores, color_scores) in keypoint order."""
    from ..ops.tiled import (KEYPOINT_CHUNK, NORMALS_CHUNK, plan_tiles,
                             sort_key_axis, tiled_color_counts,
                             tiled_kpq_aggregate, tiled_principal_curvatures,
                             tiled_radius_moments)
    k = len(kp)
    geo_scores = np.zeros(k, np.float32)
    color_scores = np.zeros(k, np.float32)

    axis = sort_key_axis(points)
    p_order = np.argsort(points[:, axis], kind="stable")
    pts_s = np.ascontiguousarray(points[p_order], dtype=np.float32)
    p_mask = np.ones(len(pts_s), bool)
    k_order = np.argsort(kp[:, axis], kind="stable")
    inv = np.argsort(k_order, kind="stable")
    n_chunks = max(1, -(-k // KEYPOINT_CHUNK))
    k_bucket = n_chunks * KEYPOINT_CHUNK
    kp_pad = np.full((k_bucket, 3), 1e9, np.float32)
    kp_pad[:k] = kp[k_order]
    kp_mask = np.zeros(k_bucket, bool)
    kp_mask[:k] = True
    plan_kp = plan_tiles(kp_pad[:, axis], kp_mask, pts_s[:, axis], leaf,
                         KEYPOINT_CHUNK)

    if geo == "curvature":
        from ..ops.eigh3 import eigvals3x3
        mom = tiled_radius_moments(kp_pad, pts_s, p_mask, plan_kp, leaf,
                                   weighting="uniform", center="mean")
        vals = eigvals3x3(mom.cov)
        total = jnp.sum(vals, axis=1)
        curv = jnp.where(total > 0, vals[:, 0] / jnp.maximum(total, 1e-30),
                         0.0)
        geo_scores = np.asarray(curv)[:k][inv]
    elif geo in ("gaussian", "kpq"):
        nrm_s = np.ascontiguousarray(normals[p_order], dtype=np.float32)
        if geo == "gaussian":
            kn_pad = np.zeros((k_bucket, 3), np.float32)
            kn_pad[:k] = kp_normals[k_order]
            res = tiled_principal_curvatures(kp_pad, kn_pad, pts_s, nrm_s,
                                             p_mask, plan_kp, leaf)
            geo_scores = np.asarray(res.pc1 * res.pc2)[:k][inv]
        else:
            # dense per-point curvatures (queries = the sorted cloud itself)
            nq = max(1, -(-len(pts_s) // NORMALS_CHUNK)) * NORMALS_CHUNK
            q_pad = np.full((nq, 3), 1e9, np.float32)
            q_pad[:len(pts_s)] = pts_s
            qn_pad = np.zeros((nq, 3), np.float32)
            qn_pad[:len(pts_s)] = nrm_s
            q_valid = np.zeros(nq, bool)
            q_valid[:len(pts_s)] = True
            plan_d = plan_tiles(q_pad[:, axis], q_valid, pts_s[:, axis],
                                leaf, NORMALS_CHUNK)
            dense = tiled_principal_curvatures(q_pad, qn_pad, pts_s, nrm_s,
                                               p_mask, plan_d, leaf)
            k1 = np.asarray(dense.pc1)[:len(pts_s)]
            k2 = np.asarray(dense.pc2)[:len(pts_s)]
            cnt, kk_sum, kk_max, kk_min, k1_max, k2_min = tiled_kpq_aggregate(
                kp_pad, pts_s, k1, k2, p_mask, plan_kp, leaf)
            cnt = np.asarray(cnt)[:k][inv]
            flt_min = np.float32(np.finfo(np.float32).tiny)
            kpq = (1000.0 * np.asarray(kk_sum)
                   + 100.0 * np.maximum(np.asarray(kk_max), flt_min)
                   + np.abs(100.0 * np.asarray(kk_min))
                   + 10.0 * np.maximum(np.asarray(k1_max), flt_min)
                   + np.abs(10.0 * np.asarray(k2_min)))[:k][inv]
            geo_scores = np.where(cnt > 0, kpq, 0.0).astype(np.float32)
    elif geo != "none":
        raise ValueError(f"unsupported keypoint filter method {geo!r}")

    if col == "colordistance":
        lab_cloud = np.asarray(rgb_to_cielab_normalized(jnp.asarray(rgb)))
        lab_kp = np.asarray(rgb_to_cielab_normalized(jnp.asarray(kp_rgb)))
        lab_s = np.ascontiguousarray(lab_cloud[p_order], dtype=np.float32)
        kl_pad = np.zeros((k_bucket, 3), np.float32)
        kl_pad[:k] = lab_kp[k_order]
        in_cnt, distant = tiled_color_counts(kp_pad, kl_pad, pts_s, lab_s,
                                             p_mask, plan_kp, leaf,
                                             max_col_dist)
        in_cnt = np.asarray(in_cnt)[:k][inv]
        distant = np.asarray(distant)[:k][inv]
        color_scores = (distant / np.maximum(in_cnt, 1)).astype(np.float32)
    elif col != "none":
        raise ValueError(f"unsupported color filter method {col!r}")

    return geo_scores, color_scores


def culling_scores(kp, kp_mask, kp_normals, kp_rgb, points, mask, normals,
                   rgb, geo: str, col: str, leaf: float,
                   max_col_dist: float):
    """Keypoint-quality scores over padded [K] keypoints vs a padded [N]
    cloud (pure jax; shared by the per-cloud program and the vmapped batched
    detect stage).  Padded/parked keypoint rows score 0.

    geometry (culling.cpp:156-195, 437-470): "curvature" = normal-estimation
    curvature recomputed at the keypoints with radius = leaf; "gaussian" =
    pc1*pc2 principal curvatures; "kpq" = Mian et al. keypoint quality over
    dense principal curvatures (the reference's 1000.0/num*num operator-
    precedence quirk evaluates to exactly 1000, kept).
    color (culling.cpp:474-506): fraction of in-radius neighbors whose
    CIELab distance to the keypoint color exceeds max_col_dist."""
    k = kp.shape[0]
    dtype = points.dtype
    geo_scores = jnp.zeros(k, dtype)
    color_scores = jnp.zeros(k, dtype)

    if geo == "curvature":
        from ..ops.eigh3 import eigvals3x3
        from ..ops.neighbors import radius_covariance
        mom = radius_covariance(kp, points, mask, leaf, weighting="uniform",
                                center="mean")
        vals = eigvals3x3(mom.cov)
        total = jnp.sum(vals, axis=1)
        geo_scores = jnp.where(total > 0,
                               vals[:, 0] / jnp.maximum(total, 1e-30), 0.0)
    elif geo == "gaussian":
        res_c = principal_curvatures(kp, kp_normals, points, normals, mask,
                                     leaf)
        geo_scores = res_c.pc1 * res_c.pc2
    elif geo == "kpq":
        dense = principal_curvatures(points, normals, points, normals, mask,
                                     leaf)
        k1, k2 = dense.pc1, dense.pc2                       # [N]
        kk = k1 * k2
        d2 = pairwise_sqdist(kp, points)
        in_r = (d2 <= leaf * leaf) & mask[None, :]          # [K, N]
        num = jnp.sum(in_r, axis=1)
        kk_sum = jnp.sum(jnp.where(in_r, kk[None, :], 0.0), axis=1)
        # the reference inits max_K / max_k1 with FLT_MIN (smallest POSITIVE
        # float), so an all-negative support clamps them to ~0 instead of
        # the true (negative) max (culling.cpp:444-458)
        flt_min = jnp.float32(np.finfo(np.float32).tiny)
        kk_max = jnp.maximum(
            jnp.max(jnp.where(in_r, kk[None, :], -jnp.inf), axis=1), flt_min)
        kk_min = jnp.min(jnp.where(in_r, kk[None, :], jnp.inf), axis=1)
        k1_max = jnp.maximum(
            jnp.max(jnp.where(in_r, k1[None, :], -jnp.inf), axis=1), flt_min)
        k2_min = jnp.min(jnp.where(in_r, k2[None, :], jnp.inf), axis=1)
        kpq = (1000.0 * kk_sum + 100.0 * kk_max + jnp.abs(100.0 * kk_min)
               + 10.0 * k1_max + jnp.abs(10.0 * k2_min))
        geo_scores = jnp.where(num > 0, kpq, 0.0)
    elif geo != "none":
        raise ValueError(f"unsupported keypoint filter method {geo!r}")

    if col == "colordistance":
        lab_cloud = rgb_to_cielab_normalized(rgb)
        lab_kp = rgb_to_cielab_normalized(kp_rgb)
        d2 = pairwise_sqdist(kp, points)
        in_r = (d2 <= leaf * leaf) & mask[None, :]
        dist = color_distance(lab_kp[:, None, :], lab_cloud[None, :, :])
        distant = (dist > max_col_dist) & in_r
        cnt = jnp.maximum(jnp.sum(in_r, axis=1), 1)
        color_scores = jnp.sum(distant, axis=1) / cnt
    elif col != "none":
        raise ValueError(f"unsupported color filter method {col!r}")

    kp_mask = kp_mask.astype(dtype)
    return geo_scores * kp_mask, color_scores * kp_mask


@functools.lru_cache(maxsize=None)
def _culling_program(n: int, k: int, geo: str, col: str, leaf: float,
                     max_col_dist: float):
    """Jitted per-cloud culling-score program, cached per padded shape."""
    @jax.jit
    def run(kp, kp_mask, kp_normals, kp_rgb, pts, mask, normals, rgb):
        return culling_scores(kp, kp_mask, kp_normals, kp_rgb, pts, mask,
                              normals, rgb, geo, col, leaf, max_col_dist)
    return run


def apply_culling_host(kp: np.ndarray, kp_rgb: Optional[np.ndarray],
                       geo_scores: np.ndarray, color_scores: np.ndarray,
                       params: "KeypointParams",
                       return_colors: bool = False):
    """Threshold + combine + refine stage of VoxelGridCulling over compact
    host arrays (culling.cpp:331-434, 509-...); shared by detect_keypoints
    and the batched detect path so their keypoint decisions are identical
    by construction."""
    geo = params.filter_method_geometry.lower()
    col = params.filter_method_color.lower()

    # combined scores with the reference's normalization (culling.cpp:331-340)
    gmin, gmax = float(geo_scores.min()), float(geo_scores.max())
    cmin, cmax = float(color_scores.min()), float(color_scores.max())
    combined = ((geo_scores - gmin) / gmax if gmax != 0 else geo_scores * 0) + \
        ((color_scores - cmin) / cmax if cmax != 0 else color_scores * 0)

    # ---- thresholds (culling.cpp:346-434) ----------------------------------
    # the reference inits all thresholds to FLT_MIN (smallest POSITIVE
    # float); geo/color are always overwritten below, but the combined
    # threshold keeps it unless both types are CutOff -- so under
    # RequireCombinedList a keypoint with combined score exactly 0 (the one
    # ranked last by both measures) is rejected
    t_geo = np.finfo(np.float32).tiny
    t_color = np.finfo(np.float32).tiny
    t_combined = np.finfo(np.float32).tiny
    gtype = params.filter_type_geometry.lower()
    ctype = params.filter_type_color.lower()
    if geo != "none" and gtype not in ("cutoff", "threshold", "auto"):
        raise ValueError(f"unsupported keypoint filter type {gtype!r}")
    if col != "none" and ctype not in ("cutoff", "threshold"):
        raise ValueError(f"unsupported keypoint color filter type {ctype!r}")
    if geo == "kpq" and gtype == "auto":
        # culling.cpp:102-106
        raise ValueError("filter type Auto is not supported with KPQ")

    if geo != "none" and gtype == "auto":
        t_geo = _auto_threshold(np.sort(geo_scores))
    if geo != "none" and gtype == "cutoff":
        srt = np.sort(geo_scores)
        t_geo = srt[min(int(params.filter_cutoff_ratio * len(srt)),
                        len(srt) - 1)]
    if col != "none" and ctype == "cutoff":
        srt = np.sort(color_scores)
        t_color = srt[min(int(params.filter_cutoff_ratio * len(srt)),
                          len(srt) - 1)]
    if geo != "none" and col != "none" and gtype == "cutoff" \
            and ctype == "cutoff":
        srt = np.sort(combined)
        t_combined = srt[min(int(params.filter_cutoff_ratio * len(srt)),
                             len(srt) - 1)]
    if geo != "none" and gtype == "threshold":
        t_geo = params.filter_threshold_geometry
    if col != "none" and ctype == "threshold":
        t_color = params.filter_threshold_color

    geo_passed = geo_scores >= t_geo if geo != "none" \
        else np.ones(len(kp), bool)
    color_passed = color_scores >= t_color if col != "none" \
        else np.ones(len(kp), bool)
    combined_passed = combined >= t_combined

    if geo != "none" and col != "none":
        if params.combine_filters == "RequireOne":
            accept = geo_passed | color_passed
        elif params.combine_filters == "RequireBoth":
            accept = geo_passed & color_passed
        else:  # RequireCombinedList
            accept = combined_passed
    else:
        accept = geo_passed & color_passed

    result = kp[accept]
    result_rgb = kp_rgb[accept] if kp_rgb is not None else None

    if params.refine_position and len(result):
        result, result_rgb = _refine_positions(
            kp, kp_rgb, accept, geo_scores, color_scores, combined,
            geo_passed, color_passed, geo, col, params)
    result = result.astype(np.float32)
    return (result, result_rgb) if return_colors else result


@functools.lru_cache(maxsize=None)
def _voxel_program(n: int, e_dim: int):
    """Jitted voxel grid per (padded cloud bucket, extra-feature width)."""
    if e_dim:
        @jax.jit
        def run(pts, mask, leaf, extra):
            return voxel_grid(pts, mask, leaf, features=extra)
    else:
        @jax.jit
        def run(pts, mask, leaf, extra=None):
            return voxel_grid(pts, mask, leaf)
    return run


def detect_keypoints(
    points: np.ndarray,            # [N, 3] clean points
    normals: Optional[np.ndarray],  # [N, 3] oriented normals (or None)
    rgb: Optional[np.ndarray],      # [N, 3] colors in [0,1] (or None)
    params: KeypointParams,
    is_training: bool = False,
    return_colors: bool = False,
):
    """Returns keypoint positions [K, 3] (host-side, compact); with
    return_colors=True returns (positions, voxel-averaged colors or None)."""
    if params.type in ("Harris3D", "ISS3D", "SIFT3D"):
        kp = _detector_keypoints(points, normals, params)
        if return_colors:
            return kp, None
        return kp

    geo = params.filter_method_geometry.lower()
    col = params.filter_method_color.lower()
    plain = culling_disabled(params, is_training)

    n = len(points)

    feats = []
    if normals is not None:
        feats.append(normals)
    if rgb is not None:
        feats.append(rgb)
    extra_np = np.concatenate(feats, axis=1).astype(np.float32) if feats \
        else None

    # bucketed + jitted voxel grid: the eager call costs dozens of device
    # dispatches per cloud (~200ms through the axon tunnel) and recompiles
    # per exact cloud size
    from .features import pad_cloud
    pts_pad, mask_pad = pad_cloud(points)
    npad = pts_pad.shape[0]
    e_dim = extra_np.shape[1] if extra_np is not None else 0
    if extra_np is not None:
        extra_pad = np.zeros((npad, e_dim), np.float32)
        extra_pad[:n] = extra_np
    run = _voxel_program(npad, e_dim)
    res = run(jnp.asarray(pts_pad), jnp.asarray(mask_pad),
              jnp.asarray(params.leaf_size, jnp.float32),
              jnp.asarray(extra_pad) if extra_np is not None else None)
    kp_all = np.asarray(res.centroids)
    kp_mask = np.asarray(res.mask)
    kp_full = kp_all[kp_mask]
    kp = kp_full[:, :3]
    off = 3
    kp_normals = None
    kp_rgb = None
    if normals is not None:
        kp_normals = kp_full[:, off:off + 3]
        off += 3
    if rgb is not None:
        kp_rgb = kp_full[:, off:off + 3]

    if plain:
        return (kp, kp_rgb) if return_colors else kp

    # ---- scores ------------------------------------------------------------
    leaf = params.leaf_size

    from ..ops.tiled import SCENE_TILE_THRESHOLD
    scene_scale = n > SCENE_TILE_THRESHOLD
    if geo in ("gaussian", "kpq") and normals is None:
        raise ValueError(f"{geo} keypoint culling needs normals")
    if col == "colordistance" and (rgb is None or kp_rgb is None):
        raise ValueError("color culling needs RGB data")

    if scene_scale:
        # windowed tiled stages bound memory to O(chunk * window); same
        # math as the dense program below (parity pinned by test)
        geo_scores, color_scores = _tiled_culling_scores(
            kp, kp_normals, kp_rgb, points, normals, rgb, geo, col,
            float(leaf), float(params.max_similar_color_distance))
    else:
        # one jitted program (shared with the batched detect path) computes
        # both score families; keypoints pad to a bucket so programs are
        # reused across clouds
        from .features import bucket_size as _bs
        k_pad = _bs(max(len(kp), 1), minimum=64)
        kp_p = np.full((k_pad, 3), 1e9, np.float32)
        kp_p[:len(kp)] = kp
        kp_m = np.arange(k_pad) < len(kp)
        kn_p = np.zeros((k_pad, 3), np.float32)
        if kp_normals is not None:
            kn_p[:len(kp)] = kp_normals
        kr_p = np.zeros((k_pad, 3), np.float32)
        if kp_rgb is not None:
            kr_p[:len(kp)] = kp_rgb
        # reuse the voxel stage's padded cloud (same pad_cloud output)
        nrm_pad = np.zeros_like(pts_pad)
        if normals is not None:
            nrm_pad[:n] = normals
        rgb_pad = np.zeros_like(pts_pad)
        if rgb is not None:
            rgb_pad[:n] = rgb
        prog = _culling_program(pts_pad.shape[0], k_pad, geo, col,
                                float(leaf),
                                float(params.max_similar_color_distance))
        g_j, c_j = prog(jnp.asarray(kp_p), jnp.asarray(kp_m),
                        jnp.asarray(kn_p), jnp.asarray(kr_p),
                        jnp.asarray(pts_pad), jnp.asarray(mask_pad),
                        jnp.asarray(nrm_pad), jnp.asarray(rgb_pad))
        geo_scores = np.asarray(g_j)[:len(kp)]
        color_scores = np.asarray(c_j)[:len(kp)]

    return apply_culling_host(kp, kp_rgb, geo_scores, color_scores, params,
                              return_colors=return_colors)


def _auto_threshold(sorted_scores: np.ndarray) -> float:
    """Histogram-step heuristic (culling.cpp:369-400)."""
    hist_size = 100
    lo, hi = sorted_scores[0], sorted_scores[-1]
    step = (hi - lo) / hist_size
    if step <= 0:
        return -np.inf
    hist = np.zeros(hist_size, int)
    bins = np.clip(((sorted_scores - lo) / step).astype(int), 0, hist_size - 1)
    np.add.at(hist, bins, 1)
    cutoff_index = 0
    for i in range(hist_size - 2):
        cutoff_index += hist[i]
        if (hist[i + 1] - hist[i]) * 2 < (hist[i + 2] - hist[i + 1]):
            cutoff_index += hist[i + 1]
            break
    cutoff_index = min(cutoff_index, len(sorted_scores) - 1)
    return float(sorted_scores[cutoff_index])


def _refine_positions(kp, kp_rgb, accept, geo_scores, color_scores, combined,
                      geo_passed, color_passed, geo, col,
                      params: KeypointParams):
    """Move each accepted keypoint to the MIDPOINT between itself and the
    best-scoring keypoint within 1.5*leaf (culling.cpp:509-607): the search
    runs over ALL voxel keypoints, the best index is consolidated from the
    geo/color/combined lists via the per-keypoint passed flags, and the
    refined point averages position AND color (reference truncates colors to
    uint8; kept as float here).  One output per accepted keypoint, in input
    order (the reference never dedupes)."""
    d2 = ((kp[:, None] - kp[None]) ** 2).sum(-1)
    r = params.leaf_size * 1.5
    close = d2 <= r * r
    both = geo != "none" and col != "none"

    def best_of(scores, idxs):
        # radiusSearch returns neighbors sorted by distance; the reference
        # keeps the FIRST strict maximum in that order
        order = idxs[np.argsort(d2[i][idxs], kind="stable")]
        return order[np.argmax(scores[order])]

    out, out_rgb = [], []
    for i in np.nonzero(accept)[0]:
        idxs = np.nonzero(close[i])[0]
        best_geo = best_of(geo_scores, idxs) if geo != "none" else -1
        best_col = best_of(color_scores, idxs) if col != "none" else -1
        if geo == "none":
            best = best_col
        elif col == "none":
            best = best_geo
        else:
            best = best_of(combined, idxs)
            if geo_passed[i] and not color_passed[i]:
                best = best_geo
            if color_passed[i] and not geo_passed[i]:
                best = best_col
            if color_passed[i] and geo_passed[i] and best_geo == best_col:
                best = best_geo
        out.append(0.5 * (kp[best] + kp[i]))
        if kp_rgb is not None:
            out_rgb.append(0.5 * (kp_rgb[best] + kp_rgb[i]))
    pos = np.asarray(out, np.float32).reshape(-1, 3)
    rgb = np.asarray(out_rgb, np.float32).reshape(-1, 3) \
        if kp_rgb is not None else None
    return pos, rgb
