"""ImplicitShapeModel orchestrator: end-to-end train / detect.

Reference: src/implicit_shape_model/implicit_shape_model.{h,cpp}.

train() (implicit_shape_model.cpp:252-500): per model -> load -> bbox
(MVBB/AABB) -> features + global features -> label injection -> [SVM] ->
forward boxes/radii + global features to voting -> feature ranking ->
clustering -> codewords -> FLANN index -> codebook activation.

detect() (implicit_shape_model.cpp:583-712): NaN filter -> normals check ->
features -> codebook castVotes -> Voting::findMaxima -> maxima.

Model persistence: the reference writes a JSON `.ism` + binary `.ismd`
(boost archive) (utils/json_object.cpp:41-95); here the trained state is the
same `.ism` JSON plus an `.ismd.npz` numpy archive.
"""

from __future__ import annotations

import json
import os
import time
import warnings
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry as geo
from ..utils.config import ComponentConfig, IsmConfig
from ..utils.io import PointCloud, load_cloud
from .codebook import (CastVotes, CodebookParams, TrainedCodebook, cast_votes,
                       train_codebook)
from .features import (FeatureConfig, extract_global_features,
                       extract_local_features)
from .types import FeatureSet, make_feature_set
from .voting import (VotingMaximum, VotingParams, filter_maxima, find_maxima,
                     normalize_weights, select_maxima)


import functools

# train() loads + extracts features in MODEL_CHUNK-file slices so peak host
# memory is O(chunk) clouds, not O(dataset); module-level so tests can
# shrink it to exercise chunk boundaries
MODEL_CHUNK = 128


@functools.lru_cache(maxsize=None)
def _mvbb_program(n: int):
    """Jitted MVBB over a padded [n, 3] cloud: one compile per cloud bucket
    instead of an eager rotation-sweep per model (expensive dispatches on
    the axon tunnel)."""
    @jax.jit
    def run(pts, mask):
        b = geo.compute_mvbb(pts, mask)
        return b.position, b.size, b.quat
    return run


def _mvbb_host(xyz: np.ndarray) -> "geo.BoundingBox":
    from .features import pad_cloud
    pts, mask = pad_cloud(xyz)
    pos, size, quat = _mvbb_program(pts.shape[0])(jnp.asarray(pts),
                                                  jnp.asarray(mask))
    return geo.BoundingBox(position=np.asarray(pos), size=np.asarray(size),
                           quat=np.asarray(quat))


@functools.lru_cache(maxsize=None)
def _mvbb_batch_program(b: int, n: int):
    @jax.jit
    def run(pts, mask):   # [B, n, 3], [B, n]
        def one(p, m):
            bb = geo.compute_mvbb(p, m)
            return bb.position, bb.size, bb.quat
        return jax.vmap(one)(pts, mask)
    return run


_MVBB_CHUNK = 8


def _mvbb_host_batch(clouds) -> list:
    """MVBB for many clouds with one vmapped dispatch per bucket chunk
    instead of one per model (training's per-model box pass dominates
    dispatch count when BoundingBoxType=MVBB, the reference default)."""
    from .features import pad_cloud
    groups: Dict[int, list] = {}
    for i, xyz in enumerate(clouds):
        pts, mask = pad_cloud(xyz)
        groups.setdefault(pts.shape[0], []).append((i, pts, mask))
    out = [None] * len(clouds)
    for n, items in groups.items():
        for j0 in range(0, len(items), _MVBB_CHUNK):
            chunk = items[j0:j0 + _MVBB_CHUNK]
            # pow-2 widths (same pattern as class_mean_shift_batch): a lone
            # cloud in a bucket costs a width-1 program, not 8x padded
            # rotation-sweep compute
            width = 1
            while width < len(chunk):
                width *= 2
            padded = chunk + [chunk[-1]] * (width - len(chunk))
            P = np.stack([p for _, p, _ in padded])
            M = np.stack([m for _, _, m in padded])
            pos, size, quat = _mvbb_batch_program(width, n)(
                jnp.asarray(P), jnp.asarray(M))
            pos, size, quat = map(np.asarray, (pos, size, quat))
            for k, (i, _, _) in enumerate(chunk):
                out[i] = geo.BoundingBox(position=pos[k], size=size[k],
                                         quat=quat[k])
    return out


def _voting_params(cfg: ComponentConfig) -> VotingParams:
    return VotingParams(
        min_threshold=cfg.get("MinThreshold", 0.0),
        min_votes_threshold=cfg.get("MinVotesThreshold", 1),
        best_k=cfg.get("BestK", -1),
        average_rotation=cfg.get("AverageRotation", False),
        radius_type=cfg.get("BinOrBandwidthType", "Config"),
        radius_factor=cfg.get("BinOrBandwidthFactor", 1.0),
        max_filter_type=cfg.get("MaxFilterType", "None"),
        single_object_max_type=cfg.get("SingleObjectMaxType", "Default"),
        single_object_mode=cfg.get("SingleObjectMode", False),
        voting_type=cfg.type or "MeanShift",
        use_interpolation=cfg.get("UseInterpolation", True),
        min_coord=tuple(cfg.params.get("MinCoord", [-5.0, -5.0, -5.0])),
        max_coord=tuple(cfg.params.get("MaxCoord", [5.0, 5.0, 5.0])),
        rel_threshold=cfg.get("RelThreshold", 0.8),
        bandwidth=cfg.get("Bandwidth", 0.2),
        threshold=cfg.get("Threshold", 1e-3),
        max_iter=cfg.get("MaxIter", 1000),
        kernel=cfg.get("Kernel", "Gaussian"),
        maxima_suppression=cfg.get("MaximaSuppression", "Average"),
        use_global_features=cfg.get("UseGlobalFeatures", False),
        global_feature_method=cfg.get("GlobalFeaturesStrategy", "KNN"),
        k_global_features=cfg.get("GlobalFeaturesK", 1),
        merge_function=cfg.get("GlobalFeatureInfluenceType", 3),
        min_svm_score=cfg.get("GlobalParamMinSvmScore", 0.70),
        rate_limit=cfg.get("GlobalParamRateLimit", 0.60),
        weight_factor=cfg.get("GlobalParamWeightFactor", 1.5),
        global_min_points=cfg.get("GlobalFeatureMinPoints", 500),
        use_ransac=cfg.get("RansacVoteFiltering", False),
        ransac_refine=cfg.get("RansacRefineModel", False),
        ransac_inlier_threshold=cfg.get("RansacInlierThreshold", 0.1),
        ransac_inlier_threshold_type=cfg.get("RansacInlierThresholdType", "Fixed"),
    )


def _codebook_params(cfg: ComponentConfig,
                     flann_exact: bool = False) -> CodebookParams:
    act = cfg.child("ActivationStrategy")
    return CodebookParams(
        flann_exact=flann_exact,
        use_class_weight=cfg.get("UseClassWeight", False),
        use_vote_weight=cfg.get("UseVoteWeight", False),
        use_matching_weight=cfg.get("UseMatchingWeight", False),
        use_codeword_weight=cfg.get("UseCodewordWeight", False),
        activation_type=act.type or "KNN",
        knn_k=act.get("K", 1),
        use_distance_ratio=act.get("UseDistanceRatio", False),
        distance_ratio_threshold=act.get("DistanceRatioThreshold", 0.8),
        threshold=act.get("Threshold", 1.0),
        threshold_capacity=act.get("TpuThresholdCapacity", 64),
        inn_iterations=act.get("Iterations", 5),
        inn_residual_weight=act.get("ResidualWeight", 0.01),
        use_partial_shot=cfg.get("UsePartialShot", False),
        partial_shot_type=cfg.get("PartialShotType", "front"),
    )


def _pad_feature_batch(fs: FeatureSet, fb: Optional[int] = None):
    """Pad a compact FeatureSet to a bucketed row count so the jitted cast
    program is reused across clouds of similar size."""
    from .features import bucket_size
    f = fs.descriptors.shape[0]
    fb = fb or bucket_size(max(f, 1), minimum=64)
    desc = np.zeros((fb, fs.descriptors.shape[1]), np.float32)
    desc[:f] = fs.descriptors
    pos = np.zeros((fb, 3), np.float32)
    pos[:f] = fs.positions
    frames = np.tile(np.eye(3, dtype=np.float32), (fb, 1, 1))
    frames[:f] = fs.frames
    fmask = np.arange(fb) < f
    return desc, pos, frames, fmask


def _unpack_cast(packed: np.ndarray) -> CastVotes:
    """Inverse of the packed [T, 20] cast layout (_cast_packed_fn)."""
    return CastVotes(
        position=packed[:, 0:3], weight=packed[:, 3],
        class_id=packed[:, 4].astype(np.int32),
        instance_id=packed[:, 5].astype(np.int32),
        keypoint=packed[:, 6:9], keypoint_training=packed[:, 9:12],
        bbox_size=packed[:, 12:15], bbox_quat=packed[:, 15:19],
        valid=packed[:, 19] > 0.5)


def preprocess_cloud(cloud: PointCloud, root: ComponentConfig) -> PointCloud:
    """Preprocessing chain (implicit_shape_model.cpp:739-821): statistical /
    radius outlier removal -> MLS smoothing -> voxel filter -> z cutoff."""
    from ..ops import preprocess as pp
    from .features import pad_cloud
    from ..ops.voxel_grid import voxel_grid as vg

    use_sor = root.get("UseStatisticalOutlierRemoval", False)
    use_ror = root.get("UseRadiusOutlierRemoval", False)
    use_mls = root.get("UseSmoothing", False)
    use_voxel = root.get("UseVoxelFiltering", False)
    z_cut = root.get("CutoffDistanceZAxis", 0.0)
    if not (use_sor or use_ror or use_mls or use_voxel or z_cut > 0):
        return cloud

    from ..ops.tiled import SCENE_TILE_THRESHOLD
    scene_scale = len(cloud.xyz) > SCENE_TILE_THRESHOLD
    if scene_scale and (use_sor or use_ror or use_mls):
        # scene-scale filters: sort along the longest axis once and run the
        # windowed variants (ops/tiled.py); xyz order changes, so per-point
        # attributes are re-ordered alongside
        from ..ops import tiled as tl
        order = np.argsort(cloud.xyz[:, tl.sort_key_axis(cloud.xyz)],
                           kind="stable")
        cloud = cloud.select(order)
        pts, mask = pad_cloud(cloud.xyz)
        axis_key = pts[:, tl.sort_key_axis(cloud.xyz)]
        pts_j = jnp.asarray(pts)
        mask_j = jnp.asarray(mask)
        if use_sor:
            mean_k = root.get("OutlierRemovalMeanK", 20)
            # kNN has no fixed radius; the 4096-point slab is a dense
            # superset of the ~20 nearest in any non-degenerate scene
            # (documented approximation at scene scale)
            plan = tl.plan_tiles(axis_key, mask, axis_key, 0.0,
                                 tl.NORMALS_CHUNK, min_window=4096)
            mask_j = tl.tiled_statistical_outlier_removal(
                pts_j, mask_j, plan, mean_k,
                root.get("OutlierRemovalStddevMul", 2.0))
        if use_ror:
            r = root.get("OutlierRemovalRadius", 0.005)
            plan = tl.plan_tiles(axis_key, mask, axis_key, r, tl.NORMALS_CHUNK)
            mask_j = tl.tiled_radius_outlier_removal(
                pts_j, mask_j, plan, r,
                root.get("OutlierRemovalMinNeighbors", 10))
        if use_mls:
            r = root.get("SmoothingRadius", 0.01)
            plan = tl.plan_tiles(axis_key, mask, axis_key, r, tl.NORMALS_CHUNK)
            pts_j = tl.tiled_mls_smooth(pts_j, mask_j, plan, r)
    else:
        pts, mask = pad_cloud(cloud.xyz)
        pts_j = jnp.asarray(pts)
        mask_j = jnp.asarray(mask)
        if use_sor:
            mask_j = pp.statistical_outlier_removal(
                pts_j, mask_j, root.get("OutlierRemovalMeanK", 20),
                root.get("OutlierRemovalStddevMul", 2.0))
        if use_ror:
            mask_j = pp.radius_outlier_removal(
                pts_j, mask_j, root.get("OutlierRemovalRadius", 0.005),
                root.get("OutlierRemovalMinNeighbors", 10))
        if use_mls:
            pts_j = pp.mls_smooth(pts_j, mask_j, root.get("SmoothingRadius", 0.01))
    if z_cut > 0:
        mask_j = pp.z_cutoff(pts_j, mask_j, z_cut)

    keep = np.asarray(mask_j)
    out = PointCloud(
        xyz=np.asarray(pts_j)[keep],
        normals=None if cloud.normals is None else _mask_orig(cloud.normals, keep),
        curvature=None if cloud.curvature is None else _mask_orig(cloud.curvature, keep),
        rgb=None if cloud.rgb is None else _mask_orig(cloud.rgb, keep),
    )

    if use_voxel:
        leaf = root.get("VoxelLeafSize", 0.0015)
        feats = []
        if out.normals is not None:
            feats.append(out.normals)
        if out.rgb is not None:
            feats.append(out.rgb)
        extra = jnp.asarray(np.concatenate(feats, 1)) if feats else None
        res = vg(jnp.asarray(out.xyz), jnp.ones(len(out.xyz), bool), leaf,
                 features=extra)
        got = np.asarray(res.centroids)[np.asarray(res.mask)]
        xyz = got[:, :3]
        off = 3
        nrm = rgbv = None
        if out.normals is not None:
            nrm = got[:, off:off + 3]
            off += 3
        if out.rgb is not None:
            rgbv = got[:, off:off + 3]
        out = PointCloud(xyz=xyz.astype(np.float32),
                         normals=None if nrm is None else nrm.astype(np.float32),
                         rgb=None if rgbv is None else rgbv.astype(np.float32))
    return out


def _mask_orig(arr: np.ndarray, keep: np.ndarray) -> np.ndarray:
    """Apply a padded-cloud keep mask to an original-length per-point array."""
    n = len(arr)
    return arr[keep[:n]]


@dataclass
class TrainedState:
    codebook: TrainedCodebook
    dims_map: Dict[int, Tuple[float, float]]       # class -> (radius, bbox median)
    variance_map: Dict[int, Tuple[float, float]]
    instance_to_class: Dict[int, int] = field(default_factory=dict)
    # global features from training, for the verification classifier
    global_descriptors: Optional[np.ndarray] = None  # [G, Dg]
    global_classes: Optional[np.ndarray] = None      # [G]
    global_instances: Optional[np.ndarray] = None    # [G]
    global_radii: Optional[np.ndarray] = None        # [G]
    svm: Optional[object] = None                     # models.svm.SVMModel


class ImplicitShapeModel:
    """The orchestrator.  Construct, read a config, add training models,
    train() or detect()."""

    def __init__(self, config: Optional[IsmConfig] = None, mesh=None):
        self.config = config or IsmConfig.from_json({"ObjectConfig": {}})
        self.state: Optional[TrainedState] = None
        self._training: List[Tuple[str, int, int]] = []  # (file, class, inst)
        self.processing_times: Dict[str, float] = {
            k: 0.0 for k in ("complete", "features", "keypoints", "normals",
                             "flann", "voting", "maxima")}
        self._cast_cache = {}
        self._gc_cache = None
        self._callbacks: List = []
        # optional explicit jax.sharding.Mesh for multi-chip training; when
        # None the UseDeviceMesh config param decides (Auto = use every
        # visible device when there is more than one)
        self.mesh = mesh

    def _training_mesh(self, cb_params: CodebookParams):
        """The mesh for codebook training, or None for the host path.
        Config param UseDeviceMesh: "Auto" (default; a mesh over all devices
        when more than one is visible), true (require it), false (never).
        INN activation is inherently sequential and stays on the host
        regardless (parallel/sharded.py rejects it)."""
        if cb_params.activation_type == "INN":
            return None
        if self.mesh is not None:
            return self.mesh
        want = self.root.get("UseDeviceMesh", "Auto")
        if want is False or (isinstance(want, str)
                             and want.lower() == "false"):
            return None
        n = len(jax.devices())
        if n <= 1:
            if want is True or (isinstance(want, str)
                                and want.lower() == "true"):
                raise ValueError("UseDeviceMesh=true needs more than one "
                                 f"device (found {n})")
            return None
        from ..parallel.sharded import make_mesh
        return make_mesh()

    # -- live progress signals ----------------------------------------------
    # The reference streams stage results over boost signals while running
    # (implicit_shape_model.h:256-261: m_signalPointCloud / BoundingBox /
    # Normals / Features / Codebook / Maxima); the training_gui renders them
    # live.  Here observers register a callback(event: str, payload: dict);
    # the same event names are used, plus "votes" (the voting-space pane
    # data) and "train_complete".  Wire viz.live.LiveHtmlProgress for a
    # browser-refreshed live view.
    def connect(self, callback) -> None:
        """Register callback(event: str, payload: dict) for stage events."""
        self._callbacks.append(callback)

    def disconnect(self, callback) -> None:
        self._callbacks.remove(callback)

    def _emit(self, event: str, **payload) -> None:
        for fn in list(self._callbacks):
            fn(event, payload)

    # -- config-derived accessors -------------------------------------------
    @property
    def root(self) -> ComponentConfig:
        return self.config.root

    @property
    def metric(self) -> str:
        dist = self.root.get("DistanceType", "Euclidean")
        return "chisq" if dist == "ChiSquared" else "l2"

    def _feature_cfg(self) -> FeatureConfig:
        return FeatureConfig.from_config(self.config.child("Features"))

    def _global_feature_cfg(self) -> FeatureConfig:
        return FeatureConfig.from_config(self.config.child("GlobalFeatures"))

    # -- training ------------------------------------------------------------
    def add_training_model(self, filename: str, class_id: int, instance_id: int):
        self._training.append((filename, class_id, instance_id, None))

    def add_training_models_with_boxes(self, filename: str, class_ids, instance_ids, boxes):
        """Detection training: one scene file contributes several objects,
        each cropped by its ground-truth box
        (implicit_shape_model.cpp:194-210, :300-320)."""
        for cid, iid, box in zip(class_ids, instance_ids, boxes):
            self._training.append((filename, int(cid), int(iid), box))

    def get_detection_threshold(self) -> Dict[int, float]:
        """Per-class distance thresholds for detection evaluation
        (implicit_shape_model.h:215-248): Fixed keeps the configured value;
        ObjectRadius / BoundingBoxMedian scale it by the trained per-class
        dimensions."""
        base = self.root.get("DistanceThresholdDetection", 0.05)
        ttype = self.root.get("DistanceThresholdType", "Fixed")
        out = {}
        for cid, (radius, median) in self.state.dims_map.items():
            v = base
            if ttype == "ObjectRadius":
                v *= radius
            elif ttype == "BoundingBoxMedian":
                v *= median
            out[cid] = v
        return out

    @staticmethod
    def _crop_box(cloud: PointCloud, box: geo.BoundingBox) -> PointCloud:
        """Crop points inside an oriented ground-truth box (CropBox
        semantics, implicit_shape_model.cpp:300-320)."""
        R = np.asarray(geo.quat_to_matrix(jnp.asarray(np.asarray(box.quat, np.float32))))
        local = (cloud.xyz - np.asarray(box.position)[None, :]) @ R
        half = np.asarray(box.size) / 2.0
        sel = np.all(np.abs(local) <= half[None, :] + 1e-6, axis=1)
        return cloud.select(sel)

    def _cached_local_features(self, filename, xyz, normals, fcfg, kp_cfg,
                               normal_radius, cn_method, rgb) -> FeatureSet:
        """Training-feature cache (the reference's writeFeaturesToDisk /
        readFeaturesFromDisk path, implicit_shape_model.cpp:1360-1644):
        enabled by CacheFeatures + CacheFeaturesFolder; keyed on the file
        and the descriptor config so stale entries never match."""
        import hashlib
        from .types import FeatureSet as FS
        if not self.root.get("CacheFeatures", False):
            return extract_local_features(xyz, normals, fcfg, kp_cfg,
                                          normal_radius, cn_method,
                                          rgb=rgb, is_training=True)
        folder = self.root.get("CacheFeaturesFolder", "ism_feature_cache")
        os.makedirs(folder, exist_ok=True)
        key = hashlib.sha1(repr((os.path.abspath(filename), fcfg,
                                 kp_cfg.to_json(), normal_radius, cn_method,
                                 len(xyz))).encode()).hexdigest()[:20]
        path = os.path.join(folder, key + ".npz")
        if os.path.exists(path):
            z = np.load(path)
            return FS(z["descriptors"], z["positions"], z["frames"],
                      z["mask"], z["center_dist"], z["global_radius"])
        fs = extract_local_features(xyz, normals, fcfg, kp_cfg,
                                    normal_radius, cn_method,
                                    rgb=rgb, is_training=True)
        np.savez_compressed(path, descriptors=fs.descriptors,
                            positions=fs.positions, frames=fs.frames,
                            mask=fs.mask, center_dist=fs.center_dist,
                            global_radius=fs.global_radius)
        return fs

    def train(self) -> None:
        # per-stage wall timers, the training analogue of the detect-path
        # processing_times map (summary/profile consumers read
        # train_* keys; implicit_shape_model.cpp logs stage walls at :499)
        _tt = {k: 0.0 for k in ("train_load", "train_features",
                                "train_global", "train_ranking",
                                "train_clustering", "train_activation",
                                "train_rest")}
        _t_all = time.perf_counter()
        fcfg = self._feature_cfg()
        gcfg = self._global_feature_cfg()
        kp_cfg = self.config.child("Keypoints")
        normal_radius = self.root.get("NormalRadius", 0.05)
        cn_method = self.root.get("ConsistentNormalsMethod", 2)
        bb_type = self.root.get("BoundingBoxType", "MVBB")

        features_per_model: List[FeatureSet] = []
        class_per_model: List[int] = []
        instance_per_model: List[int] = []
        boxes_per_model: List[geo.BoundingBox] = []
        radii_per_model: List[float] = []
        global_feats: List[Tuple[FeatureSet, int, int]] = []

        set_color_to_zero = self.root.get("SetColorToZero", False)

        # passes 1-3 run over MODEL_CHUNK-file slices so peak host memory is
        # O(chunk) clouds, not O(dataset) (the reference's per-model loop
        # frees each cloud too, implicit_shape_model.cpp:252-340); features
        # and boxes accumulate globally, raw clouds die with their chunk
        from .detect_batch import (batch_supported,
                                   extract_global_features_batch,
                                   extract_local_features_batch)
        from .keypoints import KeypointParams
        use_cache = self.root.get("CacheFeatures", False)

        # multi-chip training: the mesh decision is config-only, so resolve
        # it BEFORE the feature passes -- feature extraction (the actual
        # training hot loop, SURVEY.md section 3.5) shards its chunk axis
        # over the mesh's 'data' devices, and the activation stage reuses
        # the same mesh below
        cb_params = _codebook_params(self.config.child("Codebook"),
                             flann_exact=self.root.get("FLANNExactMatch", False))
        mesh = self._training_mesh(cb_params)

        # device-resident packed descriptor blocks from the fused training
        # extraction: when clustering is None and ranking keeps everything,
        # the activation stage runs directly on these (zero descriptor
        # re-upload -- codebook.build_device_activation)
        dev_cache: List = []
        dev_cache_seen = 0

        for base in range(0, len(self._training), MODEL_CHUNK):
            entries = self._training[base:base + MODEL_CHUNK]
            _t0 = time.perf_counter()

            # pass 1: load / preprocess / crop, boxes and radii
            clouds_xyz: List[np.ndarray] = []
            clouds_nrm: List[Optional[np.ndarray]] = []
            clouds_rgb: List[Optional[np.ndarray]] = []
            files: List[str] = []
            chunk_classes: List[int] = []
            chunk_instances: List[int] = []
            chunk_boxes: List[Optional[geo.BoundingBox]] = []
            for filename, class_id, instance_id, gt_box in entries:
                cloud = load_cloud(filename).remove_nan()
                cloud = preprocess_cloud(cloud, self.root)
                if gt_box is not None:
                    # crop the scene to the annotated object; skip tiny
                    # crops (implicit_shape_model.cpp:314-318)
                    cloud = self._crop_box(cloud, gt_box)
                    if len(cloud) < 500:
                        continue
                xyz = cloud.xyz
                normals = cloud.normals if cloud.has_normals() else None
                rgb = None if set_color_to_zero else cloud.rgb

                if gt_box is not None:
                    box = gt_box
                elif bb_type == "MVBB":
                    box = None   # deferred: batched after the loading pass
                else:
                    # AABB + radius are trivial reductions; host numpy
                    # avoids a per-model eager dispatch (utils.cpp:221-233)
                    mn, mx = xyz.min(axis=0), xyz.max(axis=0)
                    box = geo.BoundingBox(
                        position=(mn + (mx - mn) / 2.0).astype(np.float32),
                        size=(mx - mn).astype(np.float32),
                        quat=np.array([1.0, 0.0, 0.0, 0.0], np.float32))
                centroid = xyz.mean(axis=0)
                radius = float(np.linalg.norm(xyz - centroid, axis=1).max())
                clouds_xyz.append(xyz)
                clouds_nrm.append(normals)
                clouds_rgb.append(rgb)
                files.append(filename)
                chunk_classes.append(class_id)
                chunk_instances.append(instance_id)
                chunk_boxes.append(box)
                class_per_model.append(class_id)
                instance_per_model.append(instance_id)
                radii_per_model.append(radius)

            # deferred MVBBs: one vmapped dispatch per bucket chunk instead
            # of one per model
            mvbb_idx = [i for i, b in enumerate(chunk_boxes) if b is None]
            if mvbb_idx:
                for i, b in zip(mvbb_idx,
                                _mvbb_host_batch([clouds_xyz[i]
                                                  for i in mvbb_idx])):
                    chunk_boxes[i] = b
            boxes_per_model.extend(chunk_boxes)
            _tt["train_load"] += time.perf_counter() - _t0
            _t0 = time.perf_counter()

            # pass 2: local features -- batched across models when eligible
            # (same cross-cloud batching as detect_batch; one vmapped
            # program per stage per chunk instead of 3-4 dispatches/model).
            # Eligibility is decided PER CLOUD (type gates are
            # dataset-global, the scene-size gate per cloud) so the path a
            # cloud takes -- and therefore the trained state, bit for bit --
            # cannot depend on where MODEL_CHUNK boundaries fall.
            from ..ops.tiled import SCENE_TILE_THRESHOLD
            type_ok = (not use_cache and len(self._training) > 1
                       and batch_supported(
                           fcfg, KeypointParams.from_config(kp_cfg),
                           [], is_training=True))
            batch_idx = [i for i, c in enumerate(clouds_xyz)
                         if type_ok and len(c) <= SCENE_TILE_THRESHOLD]

            def _emit_model(i, fs):
                # the reference's boost signals interleave per model (cloud,
                # box, normals, then features) -- keep that pairing so live
                # viewers render model i's keypoints over model i's cloud
                self._emit("point_cloud", xyz=clouds_xyz[i],
                           rgb=clouds_rgb[i], file=files[i],
                           class_id=chunk_classes[i])
                self._emit("bounding_box", box=chunk_boxes[i])
                self._emit("normals", xyz=clouds_xyz[i],
                           normals=clouds_nrm[i])
                self._emit("features", features=fs)

            chunk_fs: List[Optional[FeatureSet]] = [None] * len(clouds_xyz)
            if batch_idx:
                sub = extract_local_features_batch(
                    [clouds_xyz[i] for i in batch_idx],
                    [clouds_nrm[i] for i in batch_idx],
                    [clouds_rgb[i] for i in batch_idx],
                    fcfg, kp_cfg, normal_radius, cn_method,
                    is_training=True, mesh=mesh,
                    chunk_width=len(batch_idx),
                    device_cache=dev_cache if mesh is None else None)
                for i, fs in zip(batch_idx, sub):
                    chunk_fs[i] = fs
                # remap cache rows from extract-call-local cloud indices to
                # GLOBAL model indices (the slice extends features_per_model
                # below; new entries are the tail of dev_cache)
                gbase = len(features_per_model)
                for e_i in range(dev_cache_seen, len(dev_cache)):
                    e = dev_cache[e_i]
                    dev_cache[e_i] = e._replace(
                        chunk=[gbase + batch_idx[j] for j in e.chunk])
                dev_cache_seen = len(dev_cache)
            for i in range(len(clouds_xyz)):
                if chunk_fs[i] is None:
                    chunk_fs[i] = self._cached_local_features(
                        files[i], clouds_xyz[i], clouds_nrm[i], fcfg,
                        kp_cfg, normal_radius, cn_method, clouds_rgb[i])
            if self._callbacks:
                for i, fs in enumerate(chunk_fs):
                    _emit_model(i, fs)
            features_per_model.extend(chunk_fs)
            _tt["train_features"] += time.perf_counter() - _t0
            _t0 = time.perf_counter()

            # pass 3: global features (whole-cloud ESF/VFH/GRSD/GASD
            # batched across models; other types per model)
            gfs_list = extract_global_features_batch(
                clouds_xyz, clouds_nrm, clouds_rgb, gcfg, normal_radius,
                cn_method)
            for gfs, class_id, instance_id in zip(gfs_list, chunk_classes,
                                                  chunk_instances):
                global_feats.append((gfs, class_id, instance_id))
            _tt["train_global"] += time.perf_counter() - _t0
            # raw clouds die here with the chunk's lists

        _t0 = time.perf_counter()
        # feature ranking (redundancy-free codebooks,
        # feature_ranking/feature_ranking.cpp:36-120)
        from .ranking import RankingParams, rank_features
        from .clustering import ClusteringParams, run_clustering

        order = sorted(range(len(features_per_model)),
                       key=lambda i: class_per_model[i])
        all_desc = np.concatenate(
            [features_per_model[i].descriptors for i in order], axis=0)
        all_cls = np.concatenate(
            [np.full(features_per_model[i].descriptors.shape[0],
                     class_per_model[i], np.int32) for i in order])
        all_cdist = np.concatenate(
            [features_per_model[i].center_dist for i in order])

        rank_params = RankingParams.from_config(
            self.config.child("FeatureWeighting"),
            flann_exact=self.root.get("FLANNExactMatch", False))
        keep = rank_features(all_desc, all_cls, all_cdist, rank_params)
        _tt["train_ranking"] = time.perf_counter() - _t0

        # apply the keep mask back to the per-model feature sets
        ranked_models: List[FeatureSet] = []
        off = 0
        for i in order:
            fs = features_per_model[i]
            n = fs.descriptors.shape[0]
            sel = keep[off:off + n]
            off += n
            ranked_models.append(FeatureSet(*(np.asarray(a)[sel] for a in fs)))

        all_desc_r = np.concatenate([f.descriptors for f in ranked_models], 0)
        all_pos_r = np.concatenate([f.positions for f in ranked_models], 0)

        # clustering -> codewords (None: one codeword per feature,
        # clustering_none.cpp:37-44; KMeans*/Agglomerative per models/clustering.py)
        clu_params = ClusteringParams.from_config(self.config.child("Clustering"))
        _t0 = time.perf_counter()
        centers, _indices = run_clustering(all_desc_r, clu_params, self.metric)
        _tt["train_clustering"] = time.perf_counter() - _t0
        # codeword feature positions: the reference takes the i-th feature's
        # position for the i-th cluster center (implicit_shape_model.cpp:465-475)
        cw_pos = all_pos_r[:len(centers)]

        _t0 = time.perf_counter()
        if mesh is not None:
            # multi-chip training from the product path: the device-heavy
            # activation stage runs sharded over the data x model mesh,
            # bit-identical to the host path (parallel/sharded.py:
            # train_codebook_sharded; pinned by tests/test_sharded.py)
            from ..parallel.sharded import train_codebook_sharded
            codebook = train_codebook_sharded(
                mesh, ranked_models,
                [class_per_model[i] for i in order],
                [instance_per_model[i] for i in order],
                [boxes_per_model[i] for i in order],
                centers, cw_pos, cb_params, self.metric)
        else:
            # activation over the device-resident descriptor blocks (no
            # re-upload) when the codewords ARE the features: clustering
            # produced one center per (all-kept) feature and every model
            # went through the fused extraction
            activation_fn = None
            if (dev_cache and bool(keep.all())
                    and len(centers) == len(all_desc_r)
                    and np.array_equal(centers, all_desc_r)):
                from .codebook import build_device_activation
                activation_fn = build_device_activation(
                    dev_cache, list(order), cb_params, self.metric)
            codebook = train_codebook(
                ranked_models,
                [class_per_model[i] for i in order],
                [instance_per_model[i] for i in order],
                [boxes_per_model[i] for i in order],
                centers, cw_pos, cb_params, self.metric,
                activation_fn=activation_fn)
        _tt["train_activation"] = time.perf_counter() - _t0
        _t0 = time.perf_counter()
        if self._callbacks:
            self._emit("codebook", codebook=codebook)

        # forwardBoxesAndRadii (voting.cpp:497-551): per-class mean object
        # radius and mean median-bbox-dimension (+ variances)
        dims_map: Dict[int, Tuple[float, float]] = {}
        var_map: Dict[int, Tuple[float, float]] = {}
        for cid in sorted(set(class_per_model)):
            idxs = [i for i, c in enumerate(class_per_model) if c == cid]
            meds, rads = [], []
            for i in idxs:
                size = np.asarray(boxes_per_model[i].size)
                meds.append(float(np.median(size)))
                rads.append(radii_per_model[i])
            meds, rads = np.array(meds), np.array(rads)
            dims_map[cid] = (float(rads.mean()), float(meds.mean()))
            var_map[cid] = (float((rads ** 2).mean() - rads.mean() ** 2),
                            float((meds ** 2).mean() - meds.mean() ** 2))

        g_desc, g_cls, g_inst, g_rad = [], [], [], []
        for gfs, cid, iid in global_feats:
            if gfs.descriptors.shape[0]:
                g_desc.append(gfs.descriptors)
                g_cls.extend([cid] * gfs.descriptors.shape[0])
                g_inst.extend([iid] * gfs.descriptors.shape[0])
                g_rad.extend(gfs.global_radius.tolist())

        self.state = TrainedState(
            codebook=codebook,
            dims_map=dims_map,
            variance_map=var_map,
            global_descriptors=np.concatenate(g_desc, 0) if g_desc else None,
            global_classes=np.array(g_cls, np.int32) if g_desc else None,
            global_instances=np.array(g_inst, np.int32) if g_desc else None,
            global_radii=np.array(g_rad, np.float32) if g_desc else None,
        )

        # SVM on global features (implicit_shape_model.cpp:424-428, :1310-1356)
        if self.root.get("UseSvmTraining", False) and g_desc:
            from .svm import train_svm
            self.state.svm = train_svm(
                self.state.global_descriptors,
                self.state.global_classes,
                one_vs_all=self.root.get("SvmOneVsAllTraining", False),
                auto_train=self.root.get("SvmAutoTrain", False),
                param_c=self.root.get("SvmParamC", 7.41),
                param_gamma=self.root.get("SvmParamGamma", 2.96),
                k_fold=self.root.get("SvmParamKfold", 10))

        _tt["train_rest"] = time.perf_counter() - _t0
        _tt["train_complete"] = time.perf_counter() - _t_all
        self.processing_times.update(_tt)
        if self._callbacks:
            self._emit("train_complete", state=self.state)

    # -- detection -----------------------------------------------------------
    def detect_file(self, filename: str) -> Tuple[List[VotingMaximum], Dict[str, float]]:
        cloud = load_cloud(filename).remove_nan()
        cloud = preprocess_cloud(cloud, self.root)
        normals = cloud.normals if cloud.has_normals() else None
        rgb = None if self.root.get("SetColorToZero", False) else cloud.rgb
        return self.detect(cloud.xyz, normals, rgb)

    def detect(self, xyz: np.ndarray, normals: Optional[np.ndarray] = None,
               rgb: Optional[np.ndarray] = None
               ) -> Tuple[List[VotingMaximum], Dict[str, float]]:
        assert self.state is not None, "not trained / loaded"
        if self.root.get("SetColorToZero", False):
            rgb = None  # same rule as detect_file/detect_batch
        t0 = time.perf_counter()
        fcfg = self._feature_cfg()
        kp_cfg = self.config.child("Keypoints")
        vparams = _voting_params(self.config.child("Voting"))
        cb_params = _codebook_params(self.config.child("Codebook"),
                             flann_exact=self.root.get("FLANNExactMatch", False))

        from .detect_batch import fused_supported
        from .keypoints import KeypointParams
        kp_params = KeypointParams.from_config(kp_cfg)
        cn_method = self.root.get("ConsistentNormalsMethod", 2)
        if (not self._callbacks
                and not getattr(self, "force_staged_detect", False)
                and fused_supported(fcfg, kp_params, [xyz], [normals],
                                    int(cn_method))):
            # single-cloud latency path: the whole normals -> voxel keypoints
            # -> descriptors -> vote-casting chain is ONE compiled B=1
            # program (build_fused_detect_fn) instead of 4-5 staged
            # dispatches, each of which pays a full tunnel round-trip.
            # Valid votes are bit-identical to the staged path (pinned by
            # tests/test_detection.py::test_fused_detect_votes_match_staged
            # and ::test_detect_fused_routing_matches_staged); the hot path
            # of the reference being accelerated is
            # implicit_shape_model.cpp:583-712.
            t_feat = time.perf_counter()
            votes = self._detect_votes_fused(
                [xyz], [rgb], fcfg, kp_params, cb_params, width=1)[0]
            self.processing_times["features"] += \
                time.perf_counter() - t_feat
        else:
            votes = self._detect_votes_staged(xyz, normals, rgb, fcfg,
                                              kp_cfg, cb_params)

        # per-class mean-shift batched across classes: one dispatch for all
        # of this cloud's classes instead of one per class
        ms_pre = self._precompute_mean_shift_batch([votes], vparams)[0]
        maxima = self._finish_detect(votes, xyz, normals, rgb, vparams,
                                     ms_pre=ms_pre)
        self.processing_times["complete"] += time.perf_counter() - t0
        return maxima, dict(self.processing_times)

    def _detect_votes_staged(self, xyz, normals, rgb, fcfg, kp_cfg,
                             cb_params: CodebookParams) -> CastVotes:
        """Per-cloud staged vote casting: separate dispatches for features
        and casting.  Fallback for configurations the fused program does not
        cover (provided normals, EMST orientation, detector keypoints,
        culling, scene-scale clouds) and for callback observers, which need
        the intermediate FeatureSet."""
        t_feat = time.perf_counter()
        stage_times: Dict[str, float] = {}
        fs = extract_local_features(
            xyz, normals, fcfg, kp_cfg,
            self.root.get("NormalRadius", 0.05),
            self.root.get("ConsistentNormalsMethod", 2),
            rgb=rgb, is_training=False, times=stage_times)
        # the reference times normals/keypoints inside computeFeatures and
        # subtracts them from the features total (implicit_shape_model.cpp:636-643)
        feat_total = time.perf_counter() - t_feat
        t_nrm = stage_times.get("normals", 0.0)
        t_kp = stage_times.get("keypoints", 0.0)
        self.processing_times["normals"] += t_nrm
        self.processing_times["keypoints"] += t_kp
        self.processing_times["features"] += feat_total - t_nrm - t_kp
        if self._callbacks:
            self._emit("point_cloud", xyz=xyz, rgb=rgb)
            self._emit("normals", xyz=xyz, normals=normals)
            self._emit("features", features=fs)

        t_vote = time.perf_counter()
        desc, pos, frames, fmask = _pad_feature_batch(fs)
        fb = desc.shape[0]

        key = (fb, self.metric)
        if key not in self._cast_cache:
            # building + compiling the cast program is the analog of the
            # reference's lazy FLANN index build over codewords
            # (implicit_shape_model.cpp:650-661, timed as "flann")
            t_flann = time.perf_counter()
            _cast = jax.jit(self._cast_packed_fn(cb_params))
            self._cast_cache[key] = _cast.lower(
                jnp.asarray(desc), jnp.asarray(pos), jnp.asarray(frames),
                jnp.asarray(fmask)).compile()
            flann_dt = time.perf_counter() - t_flann
            self.processing_times["flann"] += flann_dt
            t_vote += flann_dt  # keep the index-build out of the voting window
        packed = np.asarray(self._cast_cache[key](
            jnp.asarray(desc), jnp.asarray(pos), jnp.asarray(frames),
            jnp.asarray(fmask)))
        votes = _unpack_cast(packed)
        self.processing_times["voting"] += time.perf_counter() - t_vote
        return votes

    def detect_batch(self, clouds, normals_list=None, rgb_list=None
                     ) -> List[Tuple[List[VotingMaximum], Dict[str, float]]]:
        """Full-parity detection over a list of clouds with the device
        stages (normals, voxel keypoints, descriptors, vote casting) batched
        across clouds: one vmapped program dispatch per stage per chunk
        instead of one per cloud (models/detect_batch.py).  Per-cloud
        decisions match detect() (pinned by tests/test_detection.py); the
        returned per-cloud timing maps share the batch's stage totals.

        Falls back to the per-cloud path for configurations the batched
        extractor does not cover (NARF/GASD descriptors, detector
        keypoints, scene-scale clouds; VoxelGridCulling IS batched -- one
        vmapped scores dispatch per chunk + shared host thresholds)."""
        assert self.state is not None, "not trained / loaded"
        n = len(clouds)
        normals_list = list(normals_list) if normals_list else [None] * n
        rgb_list = list(rgb_list) if rgb_list else [None] * n
        if self.root.get("SetColorToZero", False):
            rgb_list = [None] * n

        fcfg = self._feature_cfg()
        kp_cfg = self.config.child("Keypoints")
        vparams = _voting_params(self.config.child("Voting"))
        cb_params = _codebook_params(self.config.child("Codebook"),
                             flann_exact=self.root.get("FLANNExactMatch", False))

        from .detect_batch import (batch_supported, fused_supported,
                                   extract_local_features_batch)
        from .keypoints import KeypointParams
        kp_params = KeypointParams.from_config(kp_cfg)
        if not batch_supported(fcfg, kp_params, []):
            # type gates (descriptor / keypoint / culling method) exclude
            # the whole list
            return [self.detect(c, nl, rl)
                    for c, nl, rl in zip(clouds, normals_list, rgb_list)]
        if not batch_supported(fcfg, kp_params, clouds):
            # eligible types but some clouds are scene-scale: batch the
            # eligible subset, per-cloud detect the scenes, preserve order
            from ..ops.tiled import SCENE_TILE_THRESHOLD
            small = [i for i, c in enumerate(clouds)
                     if len(c) <= SCENE_TILE_THRESHOLD]
            out: List = [None] * n
            if small:
                sub = self.detect_batch([clouds[i] for i in small],
                                        [normals_list[i] for i in small],
                                        [rgb_list[i] for i in small])
                for i, res in zip(small, sub):
                    out[i] = res
            for i in range(n):
                if out[i] is None:
                    out[i] = self.detect(clouds[i], normals_list[i],
                                         rgb_list[i])
            return out

        t0 = time.perf_counter()
        if not self._callbacks and fused_supported(
                fcfg, kp_params, clouds, normals_list,
                int(self.root.get("ConsistentNormalsMethod", 2))):
            # single-dispatch path: normals + voxel keypoints + descriptors
            # + vote casting fused into ONE program per chunk (the callback
            # path needs the intermediate FeatureSets, so it stays staged)
            t_feat = time.perf_counter()
            votes_list = self._detect_votes_fused(
                clouds, rgb_list, fcfg, kp_params, cb_params)
            self.processing_times["features"] += \
                time.perf_counter() - t_feat
            fss = None
        else:
            stage_times: Dict[str, float] = {}
            t_feat = time.perf_counter()
            fss = extract_local_features_batch(
                clouds, normals_list, rgb_list, fcfg, kp_cfg,
                self.root.get("NormalRadius", 0.05),
                self.root.get("ConsistentNormalsMethod", 2),
                times=stage_times)
            feat_total = time.perf_counter() - t_feat
            t_nrm = stage_times.get("normals", 0.0)
            t_kp = stage_times.get("keypoints", 0.0)
            self.processing_times["normals"] += t_nrm
            self.processing_times["keypoints"] += t_kp
            self.processing_times["features"] += feat_total - t_nrm - t_kp

            t_vote = time.perf_counter()
            votes_list = self._cast_votes_batch(fss, cb_params)
            self.processing_times["voting"] += time.perf_counter() - t_vote

        # single-object-mode verification classifies the WHOLE cloud once
        # per cloud (voting.cpp:240-261) -- batch those global descriptors
        # across clouds too when the type allows it
        gfs_list = [None] * n
        if vparams.use_global_features and vparams.single_object_mode:
            from .detect_batch import (WHOLE_CLOUD_GLOBALS,
                                       extract_global_features_batch)
            gcfg = self._global_feature_cfg()
            if gcfg.type in WHOLE_CLOUD_GLOBALS:
                gfs_list = extract_global_features_batch(
                    clouds, normals_list, rgb_list, gcfg,
                    self.root.get("NormalRadius", 0.05),
                    self.root.get("ConsistentNormalsMethod", 2))

        ms_pre_list = self._precompute_mean_shift_batch(votes_list, vparams)

        maxima_list = []
        for i in range(n):
            if self._callbacks:
                self._emit("point_cloud", xyz=clouds[i], rgb=rgb_list[i])
                self._emit("normals", xyz=clouds[i], normals=normals_list[i])
                self._emit("features", features=fss[i])
            maxima_list.append(
                self._finish_detect(votes_list[i], clouds[i],
                                    normals_list[i], rgb_list[i],
                                    vparams, precomputed_gfs=gfs_list[i],
                                    ms_pre=ms_pre_list[i]))
        # account the batch's wall time BEFORE snapshotting the per-cloud
        # times: callers keep the last snapshot as the run's timing map, and
        # it must include this batch under "complete" (detect() parity)
        self.processing_times["complete"] += time.perf_counter() - t0
        return [(m, dict(self.processing_times)) for m in maxima_list]

    def _cast_packed_fn(self, cb_params: CodebookParams):
        """The (unjitted) cast-votes body over one padded feature set,
        returning the packed [T, 20] vote array: each device->host transfer
        pays a full tunnel round-trip, so 9 per-field pulls would cost ~10x
        more than one packed pull."""
        cb_dev = jax.tree_util.tree_map(jnp.asarray, self.state.codebook)
        metric = self.metric

        def _cast(d, p, fr, m):
            v = cast_votes(cb_dev, d, p, fr, m, cb_params, metric)
            f32 = jnp.float32
            return jnp.concatenate([
                v.position,                              # 0:3
                v.weight[:, None],                       # 3
                v.class_id[:, None].astype(f32),         # 4
                v.instance_id[:, None].astype(f32),      # 5
                v.keypoint,                              # 6:9
                v.keypoint_training,                     # 9:12
                v.bbox_size,                             # 12:15
                v.bbox_quat,                             # 15:19
                v.valid[:, None].astype(f32),            # 19
            ], axis=1)
        return _cast

    def _cast_votes_batch(self, fss, cb_params: CodebookParams):
        """Vote casting for many feature sets: group by feature bucket,
        process MB-wide chunks through ONE vmapped cast program each."""
        from .detect_batch import MB, _chunk_indices
        from .features import bucket_size

        votes_out: List[Optional[CastVotes]] = [None] * len(fss)
        groups: Dict[int, List[int]] = {}
        for i, fs in enumerate(fss):
            groups.setdefault(
                bucket_size(max(fs.descriptors.shape[0], 1), minimum=64),
                []).append(i)

        for fb, idxs in groups.items():
            for chunk in _chunk_indices(idxs):
                padded = chunk + [chunk[-1]] * (MB - len(chunk))
                d_b, p_b, f_b, m_b = [], [], [], []
                for ci in padded:
                    d, p, fr, m = _pad_feature_batch(fss[ci], fb)
                    d_b.append(d); p_b.append(p); f_b.append(fr); m_b.append(m)
                args = tuple(jnp.asarray(np.stack(x))
                             for x in (d_b, p_b, f_b, m_b))
                key = ("batch", MB, fb, self.metric)
                if key not in self._cast_cache:
                    t_flann = time.perf_counter()
                    one = self._cast_packed_fn(cb_params)
                    prog = jax.jit(jax.vmap(one))
                    self._cast_cache[key] = prog.lower(*args).compile()
                    self.processing_times["flann"] += \
                        time.perf_counter() - t_flann
                packed = np.asarray(self._cast_cache[key](*args))
                for r, ci in enumerate(chunk):
                    votes_out[ci] = _unpack_cast(packed[r])
        return votes_out

    def _detect_votes_fused(self, clouds, rgb_list, fcfg,
                            kp_params, cb_params: CodebookParams,
                            width: Optional[int] = None):
        """Cast votes for many clouds with ONE device dispatch per
        `width`-wide chunk (default MB): the whole normals -> voxel keypoints
        -> descriptors -> cast chain runs as a single jitted program
        (models/detect_batch.py: build_fused_detect_fn).  The keypoint
        capacity is fixed host-side from the exact occupied-voxel count, so
        no intermediate pull is needed.  Valid votes are bit-identical to the
        staged path (pinned by tests/test_detection.py).  detect() calls
        this with width=1 so a single-cloud detection is ONE B=1 dispatch,
        not an 8x-padded chunk."""
        from .detect_batch import (MB, _chunk_indices, build_fused_detect_fn,
                                   check_rgb_available, host_voxel_count)
        from .features import bucket_size, pad_cloud

        check_rgb_available(fcfg, rgb_list)
        width = MB if width is None else width
        leaf = float(kp_params.leaf_size)
        nr = float(self.root.get("NormalRadius", 0.05))
        nm = int(self.root.get("ConsistentNormalsMethod", 2))

        votes_out: List[Optional[CastVotes]] = [None] * len(clouds)
        groups: Dict[Tuple[int, bool], List[int]] = {}
        for i, xyz in enumerate(clouds):
            key = (bucket_size(len(xyz)), rgb_list[i] is not None)
            groups.setdefault(key, []).append(i)

        for (n, has_rgb), idxs in groups.items():
            # chunk-invariant capacity (the max over the whole group) so one
            # compiled program serves every chunk of the group
            k_cap = max(bucket_size(host_voxel_count(clouds[ci], leaf),
                                    minimum=64) for ci in idxs)
            # sticky capacity: reuse an already-compiled program with a
            # larger capacity instead of compiling the exact bucket -- a
            # serving stream whose per-cloud voxel counts straddle a pow2
            # boundary would otherwise alternate between two programs and
            # pay a fresh 30-90s compile per flip (extra capacity rows are
            # invalid and zeroed, so results are unchanged)
            compiled = [k[3] for k in self._cast_cache
                        if isinstance(k, tuple) and k[0] == "fused"
                        and k[1:3] == (width, n) and k[4:] == (has_rgb,
                                                               self.metric)
                        and k[3] >= k_cap]
            if compiled:
                k_cap = min(compiled)
            for chunk in _chunk_indices(idxs, width):
                padded = chunk + [chunk[-1]] * (width - len(chunk))
                pts_b = np.zeros((width, n, 3), np.float32)
                mask_b = np.zeros((width, n), bool)
                rgb_b = np.zeros((width, n, 3), np.float32)
                for r, ci in enumerate(padded):
                    p, m = pad_cloud(clouds[ci], bucket=n)
                    pts_b[r], mask_b[r] = p, m
                    if has_rgb:
                        rgb_b[r, :len(clouds[ci])] = rgb_list[ci]
                args = (jnp.asarray(pts_b), jnp.asarray(mask_b),
                        jnp.asarray(rgb_b),
                        jnp.asarray(fcfg.radius, jnp.float32),
                        jnp.asarray(fcfg.ref_frame_radius, jnp.float32))

                def run_chunk(cap):
                    key2 = ("fused", width, n, cap, has_rgb, self.metric)
                    if key2 not in self._cast_cache:
                        # program build+compile billed as "flann" like the
                        # other lazy index builds
                        # (implicit_shape_model.cpp:650-661)
                        t_flann = time.perf_counter()
                        one = build_fused_detect_fn(
                            n, cap, fcfg, leaf, nr, nm, has_rgb)
                        cast = self._cast_packed_fn(cb_params)

                        def whole(pts, mask, rgb, radius, frame_radius):
                            desc, kp, frames, keep, count = one(
                                pts, mask, rgb, radius, frame_radius)
                            return cast(desc, kp, frames, keep), count

                        prog = jax.jit(jax.vmap(
                            whole, in_axes=(0, 0, 0, None, None)))
                        self._cast_cache[key2] = prog.lower(*args).compile()
                        self.processing_times["flann"] += \
                            time.perf_counter() - t_flann
                    return jax.device_get(self._cast_cache[key2](*args))

                packed, counts = run_chunk(k_cap)
                # host_voxel_count matches the device's f32 floor(p/leaf)
                # bit-for-bit on CPU (pinned by test); if an accelerator
                # backend ever rewrites the division and counts more
                # occupied voxels, recover by recompiling this chunk with
                # a doubled capacity instead of truncating keypoints
                while int(np.max(counts)) > k_cap:
                    k_cap = bucket_size(int(np.max(counts)), minimum=64)
                    warnings.warn(
                        "fused keypoint capacity underestimated by the host "
                        f"voxel count; recompiling with capacity {k_cap}")
                    packed, counts = run_chunk(k_cap)
                for r, ci in enumerate(chunk):
                    votes_out[ci] = _unpack_cast(np.asarray(packed[r]))
        return votes_out

    def _precompute_mean_shift_batch(self, votes_list, vparams: VotingParams):
        """Per-class mean-shift maxima for every cloud in one batched sweep:
        the (cloud, class) vote groups run through class_mean_shift_batch
        (one dispatch per 8-group chunk) instead of one dispatch per class
        per cloud inside find_maxima.  Returns one {class_id: m_pos} dict
        per cloud, or Nones when the config's maxima search does not use
        per-class mean-shift."""
        from .voting import class_mean_shift_batch, get_search_dist
        n = len(votes_list)
        if vparams.voting_type != "MeanShift":
            return [None] * n
        if vparams.single_object_mode and \
                vparams.single_object_max_type not in ("None", "Default"):
            return [None] * n
        items, owners = [], []
        for i, votes in enumerate(votes_list):
            valid = np.asarray(votes.valid)
            if not valid.any():
                continue
            pos = np.asarray(votes.position)[valid]
            w = np.asarray(votes.weight)[valid]
            cls = np.asarray(votes.class_id)[valid]
            for class_id in sorted(set(cls.tolist())):
                sel = cls == class_id
                bw = get_search_dist(class_id, vparams, self.state.dims_map)
                items.append((pos[sel], w[sel], bw))
                owners.append((i, class_id))
        if not items:
            return [None] * n
        t_max = time.perf_counter()
        res = class_mean_shift_batch(items, vparams)
        self.processing_times["maxima"] += time.perf_counter() - t_max
        out: List[Optional[Dict[int, np.ndarray]]] = \
            [{} for _ in range(n)]
        for (i, cid), m in zip(owners, res):
            out[i][cid] = m
        return out

    def _finish_detect(self, votes: CastVotes, xyz: np.ndarray,
                       normals: Optional[np.ndarray],
                       rgb: Optional[np.ndarray],
                       vparams: VotingParams,
                       precomputed_gfs: Optional[FeatureSet] = None,
                       ms_pre: Optional[Dict[int, np.ndarray]] = None
                       ) -> List[VotingMaximum]:
        """Maxima search + global verification + merge + selection for one
        cloud's cast votes (shared by detect and detect_batch).
        `precomputed_gfs` short-circuits the single-object-mode whole-cloud
        global descriptor (detect_batch computes those batched); `ms_pre`
        supplies batched per-class mean-shift maxima the same way."""
        if self._callbacks:
            self._emit("votes", votes=votes)
        # voting analysis dump (EnableVotingAnalysis / VotingAnalysisOutputPath,
        # implicit_shape_model.cpp:105-107; the GUI renders these live, here
        # they go to disk for offline visualization via viz/)
        if self.root.get("EnableVotingAnalysis", False):
            from ..utils.debug_utils import write_voting_space
            out = self.root.get("VotingAnalysisOutputPath", "voting_analysis")
            os.makedirs(out, exist_ok=True)
            self._voting_dump_idx = getattr(self, "_voting_dump_idx", 0) + 1
            v = votes.valid
            write_voting_space(
                os.path.join(out, f"votes_{self._voting_dump_idx:04d}.npz"),
                votes.position[v], votes.weight[v], votes.class_id[v])

        t_max = time.perf_counter()
        pts_pad = xyz.astype(np.float32)
        mask = np.ones(len(xyz), bool)
        maxima = find_maxima(votes, pts_pad, mask, vparams,
                             self.state.dims_map, ms_precomputed=ms_pre)

        # --- global-feature verification (voting.cpp:218-295) --------------
        roi_centroid = np.zeros(3, np.float32)
        if vparams.use_global_features:
            gc = self._global_classifier(vparams)
            gcfg = self._global_feature_cfg()
            nr = self.root.get("NormalRadius", 0.05)
            cn = self.root.get("ConsistentNormalsMethod", 2)
            if not vparams.single_object_mode:
                # per-maximum ROI segmentation (host numpy) + global
                # descriptors batched across the qualifying ROIs (one
                # vmapped program per chunk for the whole-cloud types
                # instead of one dispatch chain per maximum,
                # voting.cpp:218-230 hot path)
                segs, seg_rgbs, oks = [], [], []
                for m in maxima:
                    seg_pts, seg_nrm = gc.segment_roi(xyz, normals, m)
                    segs.append((seg_pts, seg_nrm))
                    oks.append(len(seg_pts) > vparams.global_min_points)
                    seg_rgbs.append(
                        rgb[np.linalg.norm(
                            xyz - m.position[None, :], axis=1)
                            <= gc.average_radii.get(m.class_id, 0.0)]
                        if (rgb is not None and oks[-1]) else None)
                idxs = [i for i, ok in enumerate(oks) if ok]
                if idxs:
                    from .detect_batch import extract_global_features_batch
                    gfs_rois = extract_global_features_batch(
                        [segs[i][0] for i in idxs],
                        [segs[i][1] for i in idxs],
                        [seg_rgbs[i] for i in idxs], gcfg, nr, cn)
                roi_iter = dict(zip(idxs, gfs_rois)) if idxs else {}
                for i, m in enumerate(maxima):
                    if oks[i]:
                        gc.classify(roi_iter[i].descriptors, m, True)
                        roi_centroid = segs[i][0].mean(axis=0).astype(
                            np.float32)
                    else:
                        gc.classify(np.zeros((0, 1), np.float32), m, False)
            else:
                # classify the whole cloud once (voting.cpp:240-261)
                gfs = precomputed_gfs if precomputed_gfs is not None else \
                    extract_global_features(xyz, normals, gcfg, nr, cn, rgb=rgb)
                probe = VotingMaximum()
                if gfs.descriptors.shape[0]:
                    gc.classify(gfs.descriptors, probe, True)
                for m in maxima:
                    m.glob_class_id = probe.glob_class_id
                    m.glob_class_weight = probe.glob_class_weight
                    m.glob_instance_id = probe.glob_instance_id
                    m.glob_instance_weight = probe.glob_instance_weight
                if not maxima and gfs.descriptors.shape[0]:
                    from ..ops import geometry as geo
                    g = VotingMaximum(
                        class_id=probe.glob_class_id,
                        instance_id=probe.glob_instance_id,
                        position=xyz.mean(axis=0).astype(np.float32),
                        weight=probe.glob_class_weight,
                        instance_weight=probe.glob_instance_weight)
                    g.glob_class_id = probe.glob_class_id
                    g.glob_class_weight = probe.glob_class_weight
                    g.glob_instance_id = probe.glob_instance_id
                    g.glob_instance_weight = probe.glob_instance_weight
                    box = _mvbb_host(xyz)
                    g.bb_size = np.asarray(box.size)
                    g.bb_quat = np.asarray(box.quat)
                    maxima.append(g)

        if not vparams.single_object_mode:
            maxima = filter_maxima(maxima, vparams, self.state.dims_map)

        maxima = sorted(maxima, key=lambda m: -m.weight)

        if vparams.use_global_features and maxima:
            from .classifier import merge_global_and_local
            # merge function 5 needs unnormalized weights (voting.cpp:275-281)
            if vparams.merge_function != 5:
                normalize_weights(maxima)
            merge_global_and_local(maxima, vparams, roi_centroid)
            maxima = sorted(maxima, key=lambda m: -m.weight)
            maxima = [m for m in maxima if m.weight != 0]

        normalize_weights(maxima)
        maxima = select_maxima(maxima, vparams)
        self.processing_times["maxima"] += time.perf_counter() - t_max
        if self._callbacks:
            self._emit("maxima", maxima=maxima)
        return maxima

    def _global_classifier(self, vparams: VotingParams):
        from .classifier import GlobalClassifier
        if getattr(self, "_gc_cache", None) is None:
            # ROI radius = per-class MEAN of the training global features'
            # globalDescriptorRadius (global_classifier.cpp:55-67, used for
            # segmentROI at :147).  The median-bbox dimension is only used
            # for maxima search radii (maxima_handler.cpp:509-522).
            if self.state.global_radii is not None and \
                    len(self.state.global_radii):
                gcls = np.asarray(self.state.global_classes)
                grad = np.asarray(self.state.global_radii)
                radii = {int(c): float(grad[gcls == c].mean())
                         for c in np.unique(gcls)}
            else:
                radii = {cid: dims[1]
                         for cid, dims in self.state.dims_map.items()}
            self._gc_cache = GlobalClassifier(
                descriptors=self.state.global_descriptors,
                classes=self.state.global_classes,
                instances=self.state.global_instances,
                average_radii=radii,
                metric=self.metric,
                method=vparams.global_feature_method
                if (vparams.global_feature_method != "SVM" or self.state.svm is not None)
                else "KNN",
                k=vparams.k_global_features,
                single_object_mode=vparams.single_object_mode,
                svm=self.state.svm)
        return self._gc_cache

    # -- persistence ----------------------------------------------------------
    def save(self, path: str) -> None:
        """Write `<path>` (.ism JSON config) + `<path>d.npz` (trained data),
        mirroring the reference's file pairing (utils/json_object.cpp:41-95)."""
        self.config.save(path)
        if self.state is None:
            return
        cb = self.state.codebook
        arrays = {f"cb_{k}": v for k, v in cb._asdict().items()}
        arrays["dims_keys"] = np.array(sorted(self.state.dims_map.keys()), np.int32)
        arrays["dims_vals"] = np.array(
            [self.state.dims_map[k] for k in sorted(self.state.dims_map.keys())],
            np.float32)
        arrays["var_vals"] = np.array(
            [self.state.variance_map[k] for k in sorted(self.state.variance_map.keys())],
            np.float32)
        if self.state.instance_to_class:
            items = sorted(self.state.instance_to_class.items())
            arrays["inst2cls"] = np.array(items, np.int32)
        label_maps = getattr(self, "label_maps", None)
        if label_maps:
            arrays["label_maps"] = np.array(json.dumps(label_maps))
        if self.state.global_descriptors is not None:
            arrays["glob_desc"] = self.state.global_descriptors
            arrays["glob_cls"] = self.state.global_classes
            arrays["glob_inst"] = self.state.global_instances
            arrays["glob_rad"] = self.state.global_radii
        if self.state.svm is not None:
            arrays.update(self.state.svm.to_arrays())
        np.savez_compressed(path + "d.npz", **arrays)

    def save_reference(self, path: str) -> None:
        """Write the reference implementation's file pairing: `.ism` JSON
        with an ObjectData key + boost binary `.ismd` blob readable by
        vseib/point-cloud-donkey (utils/json_object.cpp:50-95,
        utils/boost_archive.py documents the byte layout)."""
        from ..utils.boost_archive import state_to_ref_data, write_ismd
        data_name = os.path.basename(path) + "d"
        with open(path, "w") as f:
            json.dump({"ObjectConfig": self.config.root.to_json(),
                       "ObjectData": data_name}, f, indent=3, sort_keys=True)
        write_ismd(os.path.join(os.path.dirname(path) or ".", data_name),
                   state_to_ref_data(self.state,
                                     getattr(self, "label_maps", None)))

    @classmethod
    def load(cls, path: str) -> "ImplicitShapeModel":
        ism = cls(IsmConfig.load(path))
        import os
        data_path = path + "d.npz"
        if not os.path.exists(data_path):
            # reference pairing: the .ism JSON's ObjectData names a boost
            # binary blob (default `<path>d`, json_object.cpp:50-64)
            try:
                with open(path) as f:
                    cand = json.load(f).get("ObjectData")
            except Exception:
                cand = None
            candidates = [os.path.join(os.path.dirname(path), cand)] \
                if cand else []
            candidates.append(path + "d")
            for p in candidates:
                if os.path.exists(p):
                    from ..utils.boost_archive import (read_ismd,
                                                      ref_data_to_state)
                    state, label_maps = ref_data_to_state(read_ismd(p))
                    ism.state = state
                    ism.label_maps = label_maps
                    return ism
        if os.path.exists(data_path):
            z = np.load(data_path, allow_pickle=False)
            cb = TrainedCodebook(**{
                k[3:]: z[k] for k in z.files if k.startswith("cb_")})
            dims_keys = z["dims_keys"]
            dims_vals = z["dims_vals"]
            var_vals = z["var_vals"]
            state = TrainedState(
                codebook=cb,
                dims_map={int(k): (float(v[0]), float(v[1]))
                          for k, v in zip(dims_keys, dims_vals)},
                variance_map={int(k): (float(v[0]), float(v[1]))
                              for k, v in zip(dims_keys, var_vals)},
            )
            if "inst2cls" in z.files:
                state.instance_to_class = {int(a): int(b) for a, b in z["inst2cls"]}
            if "label_maps" in z.files:
                ism.label_maps = json.loads(str(z["label_maps"]))
            if "glob_desc" in z.files:
                state.global_descriptors = z["glob_desc"]
                state.global_classes = z["glob_cls"]
                state.global_instances = z["glob_inst"]
                state.global_radii = z["glob_rad"]
            from .svm import SVMModel
            state.svm = SVMModel.from_arrays(z)
            ism.state = state
        return ism
