"""Shared building blocks of the comparison pipelines (reference
src/eval_pipelines/pipeline_building_blocks/pipeline_building_blocks.cpp and
feature_processing.h).

The descriptor/LRF/kNN heavy lifting rides the framework's jitted TPU stages
(models/features, ops/neighbors); the per-maximum bookkeeping (Hough bins
with vote-id lists, greedy clustering, RANSAC loops over a handful of
correspondences) is small, data-dependent host work — these are evaluation
baselines, not the serving path."""

from __future__ import annotations

import os
from dataclasses import dataclass, replace
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..models.features import FeatureConfig, extract_local_features
from ..utils.config import ComponentConfig
from ..utils.io import load_cloud


# ---------------------------------------------------------------------------
# feature processing (feature_processing.h; dataset presets from
# eval_pipeline_tombari/hough3d.cpp:25-140 — shared by all five pipelines)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class PipelineParams:
    normal_radius: float = 0.05
    reference_frame_radius: float = 0.3
    feature_radius: float = 0.4
    keypoint_sampling_radius: float = 0.2
    normal_method: int = 1
    feature_type: str = "SHOT"
    # voting-space geometry
    bin_size: float = 0.5
    rel_threshold: float = -0.1
    min_coord: float = -2.0
    max_coord: float = 2.0
    use_mvbb: bool = True
    inlier_threshold: float = 0.03
    # aldoma ICP refinement + global hypothesis verification
    # (global_hv.cpp:469-496 fixed parameters, exposed here so datasets at a
    # different metric scale can rescale them coherently)
    icp_max_iterations: int = 100
    icp_max_corr_dist: float = 0.05
    hv_inlier_threshold: float = 0.01
    hv_occlusion_threshold: float = 0.02
    hv_regularizer: float = 1.0
    hv_clutter_regularizer: float = 5.0
    hv_radius_clutter: float = 0.1
    hv_detect_clutter: bool = True
    # PCL's HypothesisVerification voxel-downsamples the scene to
    # `resolution_` (default 0.005 m) before computing the cost model; the
    # explained/clutter balance only works when scene density is comparable
    # to the instance keypoint density
    hv_resolution: float = 0.005
    # detection-scene z passthrough (hough3d.cpp:289-300 / global_hv.cpp:
    # 273-283: points with z outside [0, cutoff] are dropped before feature
    # extraction; 0 = off; only the "wil" preset enables it)
    cutoff_distance_z: float = 0.0


def dataset_preset(dataset: str, bin_size: float = 0.0,
                   th: float = 0.0, pipeline: str = "tombari"
                   ) -> PipelineParams:
    """Per-dataset parameter blocks.  The base table is Tombari's
    (hough3d.cpp:31-140); the reference duplicates the table in each
    pipeline's source with per-pipeline tweaks, reproduced here as the
    `pipeline=` overrides:

    - aldoma: mn10-family keypoint sampling 0.25 (global_hv.cpp:53)
    - zhou: mn10-family keypoint sampling 0.25, washington/ycb correlation
      threshold -0.5, detection presets with reference_frame_radius =
      feature_radius = 0.05 and normal method 1 on dataset1
      (self_adapt_hghv.cpp:47-110); only dataset1/dataset5 detection exists
    - lnbnn: mn10-family keypoint sampling 0.25, a single
      washington/bigbird/ycb block with reference_frame_radius 0.04
      (lnbnn.cpp:24-38); classification only
    - knopp: FPFH features with feature_radius 0.4/0.05 and no LRF
      (pcl_ism.cpp:29-37); classification only

    Two deliberate leniency divergences from the reference CLIs:
    (a) zhou accepts the 'rav'/'kin' aliases for 'dataset1'/'dataset5'
        (self_adapt_hghv.cpp's constructor matches only the literal names);
        the produced parameter values are identical either way.
    (b) zhou/aldoma detection presets inherit tombari's bin/th fallbacks
        (bin_size or 0.01/0.05, -(th or 0.01/0.8)) -- the reference zhou/
        aldoma constructors use the raw CLI --bin/--th with NO fallback, so
        omitting them there silently yields 0.0 bins; the fallback here is
        intentional (a zero bin size is never a useful accumulator).
    """
    p = _tombari_preset(dataset, bin_size, th)
    if pipeline in ("tombari", ""):
        return p
    mn10 = dataset in ("aim", "mcgill", "mcg", "psb", "sh12", "mn10", "mn40")
    wash = dataset in ("washington", "wash", "bigbird", "bigb")
    ycb = dataset in ("wash-p", "ycb")
    detection = not (mn10 or wash or ycb)
    if pipeline == "aldoma":
        # global_hv.cpp:46-130: identical to tombari except the
        # classification keypoint sampling radius (0.25 vs 0.2)
        return replace(p, keypoint_sampling_radius=0.25) if mn10 else p
    if pipeline == "zhou":
        if mn10:
            return replace(p, keypoint_sampling_radius=0.25)
        if wash or ycb:
            # self_adapt_hghv.cpp:65/79: corr_threshold -0.5 (not -0.1)
            return replace(p, rel_threshold=-0.5)
        if dataset in ("dataset1", "rav"):
            # self_adapt_hghv.cpp:88-103: rfr = feature_radius = 0.05,
            # normal method 1 (tombari uses 2 here)
            return replace(p, reference_frame_radius=0.05,
                           feature_radius=0.05, normal_method=1)
        if dataset in ("dataset5", "kin"):
            return replace(p, reference_frame_radius=0.05,
                           feature_radius=0.05)
        raise ValueError(
            f"zhou has no preset for dataset {dataset!r} "
            "(self_adapt_hghv.cpp supports dataset1/dataset5 detection only)")
    if pipeline == "lnbnn":
        if detection:
            raise ValueError("lnbnn is classification-only (lnbnn.cpp)")
        if mn10:
            return replace(p, keypoint_sampling_radius=0.25)
        # lnbnn.cpp:32-38: one block for washington/bigbird/ycb, rfr 0.04
        return replace(p, reference_frame_radius=0.04)
    if pipeline == "knopp":
        if detection:
            raise ValueError("knopp is classification-only (pcl_ism.cpp)")
        if mn10:
            return replace(p, feature_type="FPFH")
        # pcl_ism.cpp:34-37: washington-family FPFH radius is 0.05
        return replace(p, feature_type="FPFH", feature_radius=0.05)
    raise ValueError(f"unknown pipeline {pipeline!r}")


def _tombari_preset(dataset: str, bin_size: float = 0.0,
                    th: float = 0.0) -> PipelineParams:
    """The Hough3d parameter table (hough3d.cpp:31-140)."""
    if dataset in ("aim", "mcgill", "mcg", "psb", "sh12", "mn10", "mn40"):
        return PipelineParams()
    if dataset in ("washington", "wash", "bigbird", "bigb"):
        return PipelineParams(
            normal_radius=0.005, reference_frame_radius=0.05,
            feature_radius=0.06, keypoint_sampling_radius=0.02,
            normal_method=0, feature_type="CSHOT",
            bin_size=0.02, min_coord=-1.0, max_coord=1.0, use_mvbb=False)
    if dataset in ("wash-p", "ycb"):
        return PipelineParams(
            normal_radius=0.005, reference_frame_radius=0.04,
            feature_radius=0.06, keypoint_sampling_radius=0.02,
            normal_method=0, feature_type="CSHOT",
            bin_size=0.02, min_coord=-1.0, max_coord=1.0, use_mvbb=False)
    if dataset in ("dataset1", "rav"):
        return PipelineParams(
            normal_radius=0.005, reference_frame_radius=0.03,
            feature_radius=0.06, keypoint_sampling_radius=0.02,
            normal_method=2, feature_type="SHOT",
            bin_size=bin_size or 0.01, rel_threshold=-(th or 0.01),
            min_coord=-1.0, max_coord=1.0)
    if dataset in ("dataset5", "kin", "cha", "wil", "tuw"):
        return PipelineParams(
            normal_radius=0.005, reference_frame_radius=0.03,
            feature_radius=0.06, keypoint_sampling_radius=0.02,
            normal_method=0, feature_type="CSHOT",
            bin_size=bin_size or 0.05, rel_threshold=-(th or 0.8),
            min_coord=-1.0, max_coord=1.0,
            use_mvbb=(dataset in ("dataset5", "kin")),
            cutoff_distance_z=(2.0 if dataset == "wil" else 0.0))
    raise ValueError(f"dataset preset {dataset!r} not supported")


def load_scene(filename: str, params: PipelineParams):
    """Detection-scene loader: load + NaN removal + the preset's z
    passthrough (hough3d.cpp:283-300; classification never filters)."""
    cloud = load_cloud(filename).remove_nan()
    z = params.cutoff_distance_z
    if z > 0.0:
        cloud = cloud.select((cloud.xyz[:, 2] >= 0.0)
                             & (cloud.xyz[:, 2] <= z))
    return cloud


class ProcessedCloud(NamedTuple):
    keypoints: np.ndarray      # [F, 3]
    descriptors: np.ndarray    # [F, D]
    lrfs: np.ndarray           # [F, 3, 3] rows = axes
    centroid: np.ndarray       # [3]


def process_point_cloud(xyz: np.ndarray, rgb: Optional[np.ndarray],
                        params: PipelineParams) -> ProcessedCloud:
    """processPointCloud (feature_processing.h:22): voxel keypoints + SHOT /
    CSHOT descriptors + LRFs, via the framework's jitted stages."""
    fcfg = FeatureConfig(type=params.feature_type,
                         radius=params.feature_radius,
                         ref_frame_radius=params.reference_frame_radius)
    kp_cfg = ComponentConfig(type="VoxelGrid",
                             params={"LeafSize": params.keypoint_sampling_radius})
    fs = extract_local_features(xyz, None, fcfg, kp_cfg,
                                params.normal_radius, params.normal_method,
                                rgb=rgb)
    return ProcessedCloud(fs.positions, fs.descriptors, fs.frames,
                          xyz.mean(axis=0).astype(np.float32))


# ---------------------------------------------------------------------------
# trained pipeline model (saveModelToFile/loadModelFromFile analogs)
# ---------------------------------------------------------------------------

class PipelineModel(NamedTuple):
    descriptors: np.ndarray       # [F, D] codebook = all training features
    keypoints: np.ndarray         # [F, 3]
    lrfs: np.ndarray              # [F, 3, 3]
    center_vectors: np.ndarray    # [F, 3] (centroid - kp) rotated INTO LRF
    class_ids: np.ndarray         # [F]
    instance_ids: np.ndarray      # [F]
    num_classes: int
    bbox_radii: np.ndarray        # [num_classes] average bbox half-diagonal

    def save(self, path: str) -> None:
        np.savez_compressed(path if path.endswith(".npz") else path + ".npz",
                            **self._asdict())

    @classmethod
    def load(cls, path: str) -> "PipelineModel":
        if not os.path.exists(path) and os.path.exists(path + ".npz"):
            path = path + ".npz"
        z = np.load(path)
        return cls(z["descriptors"], z["keypoints"], z["lrfs"],
                   z["center_vectors"], z["class_ids"], z["instance_ids"],
                   int(z["num_classes"]), z["bbox_radii"])


def train_pipeline_model(filenames: List[str], class_labels: List[int],
                         instance_labels: List[int],
                         params: PipelineParams) -> PipelineModel:
    """Shared training (hough3d.cpp:147-238, identical in aldoma/zhou):
    extract features per cloud, store vote = rotateInto(centroid - kp, LRF)."""
    desc, kps, lrfs, votes, cls, inst = [], [], [], [], [], []
    radii: Dict[int, List[float]] = {}
    for fn, c, i in zip(filenames, class_labels, instance_labels):
        cloud = load_cloud(fn).remove_nan()
        pc = process_point_cloud(cloud.xyz, cloud.rgb, params)
        rel = pc.centroid[None, :] - pc.keypoints
        v = np.einsum("fab,fb->fa", pc.lrfs, rel)       # rotateInto
        desc.append(pc.descriptors)
        kps.append(pc.keypoints)
        lrfs.append(pc.lrfs)
        votes.append(v)
        cls.append(np.full(len(v), c, np.int32))
        inst.append(np.full(len(v), i, np.int32))
        r = float(np.linalg.norm(cloud.xyz - pc.centroid, axis=1).max())
        radii.setdefault(c, []).append(r)
    ncls = max(class_labels) + 1
    bbox = np.zeros(ncls, np.float32)
    for c, rs in radii.items():
        bbox[c] = np.mean(rs)
    return PipelineModel(
        np.concatenate(desc), np.concatenate(kps), np.concatenate(lrfs),
        np.concatenate(votes), np.concatenate(cls), np.concatenate(inst),
        ncls, bbox)


# ---------------------------------------------------------------------------
# correspondences (pipeline_building_blocks.cpp:10-83)
# ---------------------------------------------------------------------------

def find_nn_correspondences(scene_desc: np.ndarray, model_desc: np.ndarray,
                            matching_threshold: float = np.inf,
                            k: int = 1) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """1-NN of every scene feature in the codebook (flann L2 = SQUARED
    euclidean).  Returns (object_idx, scene_idx, distances) of the
    correspondences below the threshold — object index first, matching the
    reference's swapped storage (pipeline_building_blocks.cpp:38-44)."""
    from ..ops.neighbors import knn
    d, idx = knn(jnp.asarray(scene_desc), jnp.asarray(model_desc),
                 jnp.ones(len(model_desc), bool), k=k, metric="l2")
    d = np.asarray(d)[:, 0]
    idx = np.asarray(idx)[:, 0]
    keep = d < matching_threshold
    scene_idx = np.where(keep)[0]
    return idx[keep], scene_idx, d[keep]


def prepare_center_votes(object_idx: np.ndarray, scene_idx: np.ndarray,
                         scene_kp: np.ndarray, scene_lrf: np.ndarray,
                         center_vectors: np.ndarray) -> np.ndarray:
    """Scene-space center hypotheses: kp + rotateBack(vote, scene LRF)
    (pipeline_building_blocks.cpp:85-102)."""
    v = center_vectors[object_idx]
    back = np.einsum("fba,fb->fa", scene_lrf[scene_idx], v)  # frame^T @ v
    return scene_kp[scene_idx] + back


# ---------------------------------------------------------------------------
# Hough space with vote-id lists (pcl::recognition::HoughSpace3D essence)
# ---------------------------------------------------------------------------

def cast_votes_and_find_maxima(
    votes: np.ndarray,            # [V, 3]
    weights: np.ndarray,          # [V]
    min_coord: np.ndarray, max_coord: np.ndarray, bin_size: np.ndarray,
    rel_threshold: float,
) -> Tuple[List[float], List[List[int]]]:
    """voteInt (trilinear spread over 8 bins) + findMaxima with 26-NMS and a
    relative (negative) or absolute threshold; returns maxima values plus the
    vote ids that touched each maximum bin
    (pipeline_building_blocks.cpp:105-133 + PCL hough_3d.cpp)."""
    min_coord = np.asarray(min_coord, np.float64)
    bin_size = np.asarray(bin_size, np.float64)
    dims = np.maximum(np.ceil((np.asarray(max_coord) - min_coord)
                              / bin_size).astype(int), 1)
    acc: Dict[Tuple[int, int, int], float] = {}
    ids: Dict[Tuple[int, int, int], List[int]] = {}
    if len(votes) == 0:
        return [], []
    rel = (votes - min_coord) / bin_size
    base = np.floor(rel - 0.5).astype(int)
    frac = rel - 0.5 - base
    for vid in range(len(votes)):
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    b = (base[vid, 0] + dx, base[vid, 1] + dy, base[vid, 2] + dz)
                    if not all(0 <= b[a] < dims[a] for a in range(3)):
                        continue
                    w = ((frac[vid, 0] if dx else 1 - frac[vid, 0])
                         * (frac[vid, 1] if dy else 1 - frac[vid, 1])
                         * (frac[vid, 2] if dz else 1 - frac[vid, 2]))
                    acc[b] = acc.get(b, 0.0) + w * float(weights[vid])
                    ids.setdefault(b, []).append(vid)
    if not acc:
        return [], []
    peak = max(acc.values())
    thresh = -rel_threshold * peak if rel_threshold < 0 else rel_threshold
    maxima, vote_indices = [], []
    for b, val in sorted(acc.items(), key=lambda kv: -kv[1]):
        if val < thresh:
            break
        is_max = all(acc.get((b[0] + i, b[1] + j, b[2] + k), -1.0) <= val
                     for i in (-1, 0, 1) for j in (-1, 0, 1)
                     for k in (-1, 0, 1) if (i, j, k) != (0, 0, 0))
        if is_max:
            maxima.append(val)
            vote_indices.append(sorted(set(ids[b])))
    return maxima, vote_indices


# ---------------------------------------------------------------------------
# correspondence clustering (pipeline_building_blocks.cpp:136-186):
# Hough (votes in center space) or geometric consistency
# ---------------------------------------------------------------------------

def cluster_correspondences_gc(object_idx, scene_idx, obj_kp, scene_kp,
                               gc_size: float, gc_threshold: int
                               ) -> List[np.ndarray]:
    """pcl::GeometricConsistencyGrouping essence: greedily grow clusters of
    correspondences whose pairwise distances agree between object and scene
    within gc_size; keep clusters of >= gc_threshold members."""
    n = len(object_idx)
    used = np.zeros(n, bool)
    d_obj = np.linalg.norm(obj_kp[object_idx][:, None, :]
                           - obj_kp[object_idx][None, :, :], axis=-1)
    d_scn = np.linalg.norm(scene_kp[scene_idx][:, None, :]
                           - scene_kp[scene_idx][None, :, :], axis=-1)
    consistent = np.abs(d_obj - d_scn) < gc_size
    clusters = []
    for seed in np.argsort(-consistent.sum(axis=1)):
        if used[seed]:
            continue
        members = [seed]
        for j in range(n):
            if j == seed or used[j]:
                continue
            if all(consistent[j, m] for m in members):
                members.append(j)
        if len(members) >= gc_threshold:
            clusters.append(np.asarray(members))
            used[members] = True
    return clusters


def generate_classification_hypotheses(clusters: List[np.ndarray],
                                       corr_class_ids: np.ndarray
                                       ) -> List[Tuple[int, float]]:
    """Majority class + its vote count per cluster
    (pipeline_building_blocks.cpp:209-251)."""
    results = []
    for cl in clusters:
        if len(cl) == 0:
            continue
        classes = corr_class_ids[cl]
        vals, counts = np.unique(classes, return_counts=True)
        best = int(np.argmax(counts))
        results.append((int(vals[best]), float(counts[best])))
    return results


# ---------------------------------------------------------------------------
# absolute orientation (RANSAC Kabsch; CorrespondenceRejectorSampleConsensus
# essence, pipeline_building_blocks.cpp:256-333)
# ---------------------------------------------------------------------------

def _kabsch(src: np.ndarray, dst: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    cs, cd = src.mean(0), dst.mean(0)
    H = (src - cs).T @ (dst - cd)
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    R = Vt.T @ np.diag([1.0, 1.0, d]) @ U.T
    return R, cd - R @ cs


def absolute_orientation_ransac(
    obj_pts: np.ndarray, scene_pts: np.ndarray,
    inlier_threshold: float, iterations: int = 200,
    refine: bool = True, rng_seed: int = 0,
) -> Tuple[Optional[np.ndarray], Optional[np.ndarray], np.ndarray]:
    """Best (R, t) with inlier mask; None when no sample reaches 3 inliers."""
    n = len(obj_pts)
    if n < 3:
        return None, None, np.zeros(n, bool)
    rng = np.random.default_rng(rng_seed)
    best_R, best_t, best_in = None, None, np.zeros(n, bool)
    for _ in range(iterations):
        sel = rng.choice(n, 3, replace=False)
        R, t = _kabsch(obj_pts[sel], scene_pts[sel])
        err = np.linalg.norm(scene_pts - (obj_pts @ R.T + t), axis=1)
        inl = err < inlier_threshold
        if inl.sum() > best_in.sum():
            best_R, best_t, best_in = R, t, inl
    if best_R is not None and refine and best_in.sum() >= 3:
        best_R, best_t = _kabsch(obj_pts[best_in], scene_pts[best_in])
        err = np.linalg.norm(scene_pts - (obj_pts @ best_R.T + best_t), axis=1)
        best_in = err < inlier_threshold
    return best_R, best_t, best_in


# ---------------------------------------------------------------------------
# ICP refinement (alignCloudsWithICP, pipeline_building_blocks.cpp:616-650:
# pcl::IterativeClosestPoint point-to-point, max iterations + max
# correspondence distance)
# ---------------------------------------------------------------------------

def icp_point_to_point(
    src: np.ndarray, dst: np.ndarray,
    max_iterations: int = 100, max_corr_dist: float = 0.05,
    transformation_eps: float = 1e-8,
) -> Tuple[np.ndarray, np.ndarray, bool, float]:
    """Point-to-point ICP of `src` onto `dst` (the reference runs
    pcl::IterativeClosestPoint with setMaximumIterations(100) and
    setMaxCorrespondenceDistance(0.05), pipeline_building_blocks.cpp:627-633).

    Each iteration matches every source point to its nearest destination
    point, drops pairs beyond max_corr_dist, and solves the rigid alignment
    in closed form (Kabsch/Umeyama — PCL's default
    TransformationEstimationSVD).  Stops early when the incremental motion
    falls below transformation_eps (PCL's transformation-epsilon criterion).

    Returns (R, t, converged, fitness): `converged` is False when an
    iteration finds fewer than 3 correspondences (PCL's
    CONVERGENCE_CRITERIA_NO_CORRESPONDENCES failure → hasConverged()==false,
    and the reference drops such instances, :639-645); fitness is the mean
    squared distance of the final correspondences (PCL's getFitnessScore).
    """
    R = np.eye(3)
    t = np.zeros(3)
    cur = src.astype(np.float64)
    dst = dst.astype(np.float64)
    fitness = np.inf
    for _ in range(max_iterations):
        d2 = ((cur[:, None, :] - dst[None, :, :]) ** 2).sum(-1)
        nn = d2.argmin(axis=1)
        nd2 = d2[np.arange(len(cur)), nn]
        keep = nd2 < max_corr_dist * max_corr_dist
        if keep.sum() < 3:
            return R, t, False, float("inf")
        dR, dt = _kabsch(cur[keep], dst[nn[keep]])
        cur = cur @ dR.T + dt
        R = dR @ R
        t = dR @ t + dt
        fitness = float(nd2[keep].mean())
        if np.abs(dR - np.eye(3)).max() < transformation_eps \
                and np.abs(dt).max() < transformation_eps:
            break
    return R, t, True, fitness


# ---------------------------------------------------------------------------
# Aldoma global hypothesis verification (runGlobalHV,
# pipeline_building_blocks.cpp:653-683 = pcl::GlobalHypothesesVerification;
# Aldoma et al., ECCV 2012 cost model over the hypothesis mask)
# ---------------------------------------------------------------------------

def voxel_downsample(xyz: np.ndarray, resolution: float) -> np.ndarray:
    """Per-voxel centroid downsampling (pcl::VoxelGrid essence) for the
    host-side HV cost model — PCL's HypothesisVerification downsamples the
    scene cloud to `resolution_` in initialize() before any explained/clutter
    computation."""
    if resolution <= 0 or len(xyz) == 0:
        return xyz
    keys = np.floor(xyz / resolution).astype(np.int64)
    _, inv = np.unique(keys, axis=0, return_inverse=True)
    n = inv.max() + 1
    sums = np.zeros((n, 3), np.float64)
    np.add.at(sums, inv, xyz)
    counts = np.bincount(inv, minlength=n).astype(np.float64)
    return sums / counts[:, None]


def run_global_hv(
    scene_xyz: np.ndarray,                    # [S, 3]
    instances: List[np.ndarray],              # per hypothesis: aligned model pts
    inlier_threshold: float = 0.01,
    occlusion_threshold: float = 0.02,
    regularizer: float = 1.0,
    clutter_regularizer: float = 5.0,
    radius_clutter: float = 0.1,
    detect_clutter: bool = True,
    scene_normals: Optional[np.ndarray] = None,
    occlusion_reasoning: bool = False,
    eps_angle_threshold: float = 0.25,
) -> List[bool]:
    """Select the subset of hypotheses minimizing the Aldoma ECCV'12 global
    cost (parameters mirror global_hv.cpp:469-496: inlier 0.01, occlusion
    0.02, regularizer 1.0, clutter regularizer 5.0, clutter radius 0.1,
    detect_clutter true).

    Per hypothesis h (aligned model cloud M_h):
      * explained scene points: scene points within inlier_threshold of M_h,
        with fit weight w = 1 - d^2/th^2;
      * outliers: model points without scene support within inlier_threshold,
        each costing `regularizer`.  With occlusion_reasoning (the reference
        passes occlusion reasoning OFF at addModels, :671) model points whose
        nearest scene distance exceeds occlusion_threshold are treated as
        occluded and excluded from the outlier count — a viewpoint-free
        stand-in for PCL's z-buffer reasoning, which needs organized clouds;
      * clutter: unexplained scene points within radius_clutter of an
        explained point cost (1 - (d/radius)^2), multiplied by
        clutter_regularizer when they continue the same smooth surface
        (normal angle below eps_angle_threshold rad — PCL's smooth-segment
        test collapsed to pairwise normals).

    Global cost of an active mask X:
        cost(X) = sum_h in X (regularizer * outliers_h + clutter_h)
                  + duplicity(X) - explained(X)
    where explained(X) credits each scene point its best active fit weight
    and duplicity(X) charges every additional active explanation (points
    claimed by multiple hypotheses).  The mask is optimized by greedy
    activation followed by single-flip local search — the deterministic
    counterpart of PCL's simulated-annealing metaheuristic.
    """
    H = len(instances)
    if H == 0:
        return []
    S = len(scene_xyz)
    th2 = inlier_threshold * inlier_threshold
    w_expl = np.zeros((H, S))            # fit weight per (hyp, scene point)
    outliers = np.zeros(H)
    clutter = np.zeros(H)
    for h, pts in enumerate(instances):
        d2 = ((scene_xyz[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        d2_scene = d2.min(axis=1)        # scene point -> nearest model point
        d2_model = d2.min(axis=0)        # model point -> nearest scene point
        expl = d2_scene < th2
        w_expl[h, expl] = 1.0 - d2_scene[expl] / th2
        out = d2_model >= th2
        if occlusion_reasoning:
            out &= d2_model < occlusion_threshold * occlusion_threshold
        outliers[h] = out.sum()
        if detect_clutter and expl.any() and (~expl).any():
            une = np.where(~expl)[0]
            d2_ep = ((scene_xyz[une][:, None, :]
                      - scene_xyz[expl][None, :, :]) ** 2).sum(-1).min(axis=1)
            near = d2_ep < radius_clutter * radius_clutter
            if near.any():
                w = 1.0 - d2_ep[near] / (radius_clutter * radius_clutter)
                if scene_normals is not None:
                    nn_e = ((scene_xyz[une][near][:, None, :]
                             - scene_xyz[expl][None, :, :]) ** 2
                            ).sum(-1).argmin(axis=1)
                    dots = np.einsum(
                        "ij,ij->i", scene_normals[une][near],
                        scene_normals[np.where(expl)[0][nn_e]])
                    smooth = dots > np.cos(eps_angle_threshold)
                    w = w * np.where(smooth, clutter_regularizer, 1.0)
                else:
                    w = w * clutter_regularizer
                clutter[h] = w.sum()

    def cost(active: np.ndarray) -> float:
        if not active.any():
            return 0.0
        w = w_expl[active]
        best = w.max(axis=0)
        explained = best.sum()
        duplicity = (w.sum(axis=0) - best).sum()
        return (float((regularizer * outliers[active]
                       + clutter[active]).sum())
                + duplicity - explained)

    active = np.zeros(H, bool)
    # greedy activation, then single-flip local search to a fixed point
    improved = True
    while improved:
        improved = False
        base = cost(active)
        best_gain, best_h = 0.0, -1
        for h in range(H):
            trial = active.copy()
            trial[h] = not trial[h]
            gain = base - cost(trial)
            if gain > best_gain + 1e-12:
                best_gain, best_h = gain, h
        if best_h >= 0:
            active[best_h] = not active[best_h]
            improved = True
    return list(active)


# ---------------------------------------------------------------------------
# self-adapted Hough voting (zhou; pipeline_building_blocks.cpp:682-919)
# ---------------------------------------------------------------------------

def self_adapted_hough_voting(
    object_idx: np.ndarray, scene_idx: np.ndarray, distances: np.ndarray,
    obj_kp: np.ndarray, obj_lrf: np.ndarray,
    scene_kp: np.ndarray, scene_lrf: np.ndarray,
    initial_bins: int = 5, initial_threshold: float = 0.0,
    rel_threshold: float = -0.1,
) -> Tuple[List[float], List[List[int]], np.ndarray, float]:
    """Zhou et al.'s 2D (rmse_E, rmse_T) Hough with self-adapted matching
    threshold and bin count.  Euler extraction uses the standard ZYX
    formulas; the reference reads Eigen elements out of bounds there
    (pipeline_building_blocks.cpp:840-863 indexes a 3x3 at (3,*)) — that UB
    cannot be reproduced, so correct indices are used (documented
    divergence)."""
    t_corr = initial_threshold
    n_all = len(object_idx)
    found_bin = 0.0
    while True:
        t_corr += 0.1
        sel = np.where(distances < t_corr)[0]
        if len(sel) >= 3:
            o, s = object_idx[sel], scene_idx[sel]
            R = np.einsum("fba,fbc->fac", scene_lrf[s], obj_lrf[o])
            # ZYX euler angles
            phi = np.arctan2(R[:, 2, 1], R[:, 2, 2])
            theta = np.arctan2(-R[:, 2, 0],
                               np.sqrt(R[:, 2, 1] ** 2 + R[:, 2, 2] ** 2))
            psi = np.arctan2(R[:, 1, 0], R[:, 0, 0])
            rot = np.stack([phi, theta, psi], axis=1)
            trn = scene_kp[s] - np.einsum("fab,fb->fa", R, obj_kp[o])
            w_raw = distances[sel].copy()
            mx = max(w_raw.max(), 1e-12)
            w = 1.0 - w_raw / mx
            E_c = (w[:, None] * rot).sum(0)
            T_c = (w[:, None] * trn).sum(0)
            rmse_e = np.sqrt(((rot - E_c) ** 2).sum(1) / 3.0)
            rmse_t = np.sqrt(((trn - T_c) ** 2).sum(1) / 3.0)
            h_n = initial_bins
            while h_n >= 3:
                b_l = max((rmse_e.max() - rmse_e.min()) / h_n, 1e-9)
                b_w = max((rmse_t.max() - rmse_t.min()) / h_n, 1e-9)
                found_bin = b_w
                votes = np.stack([rmse_e, rmse_t, np.zeros_like(rmse_e)], 1)
                maxima, vote_ids = cast_votes_and_find_maxima(
                    votes, np.ones(len(votes)),
                    np.array([0.0, 0.0, 0.0]),
                    np.array([rmse_e.max() + b_l, rmse_t.max() + b_w, 1.0]),
                    np.array([b_l, b_w, 1.0]), rel_threshold)
                keep = [(m, v) for m, v in zip(maxima, vote_ids)
                        if len(v) >= 3]
                if keep:
                    maxima = [m for m, _ in keep]
                    # map filtered ids back to the full correspondence list
                    vote_ids = [[int(sel[i]) for i in v] for _, v in keep]
                    return maxima, vote_ids, sel, found_bin
                h_n -= 1
        if n_all == 0 or len(sel) / n_all >= 0.5:
            return [], [], np.asarray([], int), found_bin
