"""Feature extraction pipeline: normals -> keypoints -> LRFs -> descriptors.

Mirrors ImplicitShapeModel::computeFeatures (implicit_shape_model.cpp:733-927)
+ Features::operator() (features/features.cpp:40-116):
  * normals are skipped when the cloud has them or the descriptor doesn't
    need them (SHORT_SHOT family, implicit_shape_model.cpp:852-867);
  * keypoints from the configured detector;
  * LRFs at keypoints; keypoints with invalid LRFs are discarded
    (features.cpp:64-81);
  * local descriptors at keypoints; global descriptors over the whole cloud
    with radius = cloud radius (features_short_shot_global.cpp:45).

TPU structure: each stage is a jitted static-shape program cached per
(bucket sizes, descriptor config); the host only compacts/pads between
stages.  Descriptor types are a registry keyed by the reference's `Type`
strings (features/features_factory.h:48-110).
"""

from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, replace
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry as geo
from ..ops.lrf import shot_lrf
from ..ops.neighbors import gather_radius_neighbors
from ..ops.normals import compute_normals
from ..ops.shot import shot_descriptor
from ..ops.short_shot import short_shot_descriptor, resolve_bins
from ..ops.voxel_grid import voxel_grid
from ..utils.config import ComponentConfig
from .types import FeatureSet, make_feature_set


def bucket_size(n: int, minimum: int = 256) -> int:
    """Round up to the next power of two (bounded below) so jit programs are
    reused across clouds of similar size.  Above 64k (scene scale) pow2
    padding wastes up to 2x memory, so buckets switch to multiples of 32768
    (still few distinct programs, far less padding)."""
    b = minimum
    while b < n and b < 65536:
        b *= 2
    if n <= b:
        return b
    return -(-n // 32768) * 32768


@dataclass(frozen=True)
class FeatureConfig:
    """Static descriptor configuration (hashable: keys jit caches)."""
    type: str = "SHOT"
    radius: float = 0.1
    ref_frame_radius: float = 0.2
    ref_frame_type: str = "SHOT"
    # SHORT_SHOT extras (features_short_shot.cpp:23-31)
    short_shot_dims: int = 32
    short_shot_bin_type: str = "auto"
    short_shot_r_bins: int = 2
    short_shot_e_bins: int = 2
    short_shot_a_bins: int = 8
    short_shot_log_radius: bool = False
    short_shot_min_radius: float = 0.0
    use_min_radius: bool = False
    # SHORT_CSHOT extras (features_short_cshot.cpp:23-34)
    short_color_shot_dims: int = 32
    short_color_hist_size: int = 15
    # CGF extras (features_cgf.cpp:24-52): embedding checkpoint (npz) or a
    # seeded random projection to cgf_output_dims
    cgf_checkpoint: str = ""
    cgf_output_dims: int = 32
    gasd_with_color: bool = True  # GasdWithColor (features_gasd.cpp)
    # CVFH / OURCVFH clustering (features_cvfh.cpp:47-53, PCL defaults)
    cvfh_cluster_tolerance: float = 0.015
    cvfh_eps_angle_deg: float = 10.0
    cvfh_curv_threshold: float = 1.0
    cvfh_min_points: int = 50
    ourcvfh_axis_ratio: float = 0.8
    rsd_use_hist: bool = True     # UseFullRSDHistogram (features_rsd.cpp)
    # NARF range-image geometry (features_narf.cpp:44-53 hardcodes Kinect)
    narf_image_width: int = 640
    narf_image_height: int = 480
    narf_focal: float = 525.0
    # TPU capacity knobs (not part of the reference schema)
    neighbor_capacity: int = 2048

    @classmethod
    def from_config(cls, cfg: ComponentConfig) -> "FeatureConfig":
        return cls(
            type=cfg.type or "SHOT",
            radius=cfg.get("Radius", 0.1),
            ref_frame_radius=cfg.get("ReferenceFrameRadius", 0.2),
            ref_frame_type=cfg.get("ReferenceFrameType", "SHOT"),
            short_shot_dims=cfg.get("ShortShotDims", 32),
            short_shot_bin_type=cfg.get("ShortShotBinType", "auto"),
            short_shot_r_bins=cfg.get("ShortShotRBins", 2),
            short_shot_e_bins=cfg.get("ShortShotEBins", 2),
            short_shot_a_bins=cfg.get("ShortShotABins", 8),
            short_shot_log_radius=cfg.get("ShortShotLogRadius", False),
            short_shot_min_radius=cfg.get("ShortShotMinRadius", 0.0),
            use_min_radius=cfg.get("UseMinRadius", False),
            short_color_shot_dims=cfg.get("ShortColorShotDims", 32),
            short_color_hist_size=cfg.get("ShortColorShotHistSize", 15),
            cgf_checkpoint=cfg.get("CgfCheckpointPath", ""),
            cgf_output_dims=cfg.get("CgfOutputDims", 32),
            gasd_with_color=cfg.get("GasdWithColor", True),
            cvfh_cluster_tolerance=cfg.get("CvfhClusterTolerance", 0.015),
            cvfh_eps_angle_deg=cfg.get("CvfhEpsAngle", 10.0),
            cvfh_curv_threshold=cfg.get("CvfhCurvatureThreshold", 1.0),
            cvfh_min_points=cfg.get("CvfhMinPoints", 50),
            ourcvfh_axis_ratio=cfg.get("OurcvfhAxisRatio", 0.8),
            rsd_use_hist=cfg.get("UseFullRSDHistogram", True),
            narf_image_width=cfg.get("NarfImageWidth", 640),
            narf_image_height=cfg.get("NarfImageHeight", 480),
            narf_focal=cfg.get("NarfFocalLength", 525.0),
            neighbor_capacity=cfg.get("TpuNeighborCapacity", 2048),
        )

    def needs_normals(self) -> bool:
        return self.type not in ("SHORT_SHOT", "SHORT_CSHOT", "SHORT_SHOT_PCL",
                                 "SHORT_SHOT_GLOBAL", "SHORT_CSHOT_GLOBAL",
                                 "ESF", "ESF_LOCAL", "GASD", "RoPS", "NARF", "Dummy")

    def needs_rgb(self) -> bool:
        return self.type in ("CSHOT", "CSHOT_GLOBAL", "SHORT_CSHOT",
                             "SHORT_CSHOT_GLOBAL", "RIFT", "COSPAIR")

    def descriptor_dim(self) -> int:
        if self.type in ("SHOT", "SHOT_GLOBAL", "SHORT_SHOT_PCL"):
            return 352
        if self.type in ("CSHOT", "CSHOT_GLOBAL"):
            return 1344
        if self.type in ("SHORT_SHOT", "SHORT_SHOT_GLOBAL"):
            dims, _, _, _ = resolve_bins(
                self.short_shot_dims, self.short_shot_bin_type,
                self.short_shot_r_bins, self.short_shot_e_bins,
                self.short_shot_a_bins)
            return dims
        if self.type in ("SHORT_CSHOT", "SHORT_CSHOT_GLOBAL"):
            from ..ops.short_shot import resolve_color_bins
            dims, _, _, _ = resolve_bins(
                self.short_shot_dims, self.short_shot_bin_type,
                self.short_shot_r_bins, self.short_shot_e_bins,
                self.short_shot_a_bins)
            cdims, _, _, _ = resolve_color_bins(self.short_color_shot_dims)
            return dims + cdims * self.short_color_hist_size
        if self.type == "FPFH":
            return 33
        if self.type == "CGF":
            return self.cgf_output_dims
        if self.type == "BSHOT":
            return 352
        if self.type == "SpinImage":
            return 153
        if self.type == "PFH":
            return 125
        if self.type in ("ESF", "ESF_LOCAL"):
            return 640
        if self.type in ("VFH", "CVFH", "OURCVFH"):
            return 308
        if self.type == "GRSD":
            return 21
        if self.type == "GASD":
            return 984 if self.gasd_with_color else 512
        if self.type in ("3DSC", "USC", "USC_GLOBAL"):
            return 1980
        if self.type == "RSD":
            return 25 if self.rsd_use_hist else 2
        if self.type == "RIFT":
            return 32
        if self.type == "COSPAIR":
            return 378
        if self.type == "RoPS":
            return 135
        if self.type == "NARF":
            return 36
        if self.type == "Dummy":
            return 1
        raise ValueError(f"unsupported descriptor type {self.type!r}")


# ---------------------------------------------------------------------------
# jitted stages (cached per static config)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _normals_stage(n: int, radius: float, method: int):
    @jax.jit
    def run(points, mask):
        return compute_normals(points, mask, radius, method)
    return run


@functools.lru_cache(maxsize=None)
def _keypoint_stage(n: int, leaf: float, capacity: int):
    @jax.jit
    def run(points, mask):
        return voxel_grid(points, mask, leaf, capacity=capacity)
    return run


@functools.lru_cache(maxsize=None)
def _descriptor_fn(n: int, fcfg: FeatureConfig):
    """The raw (unjitted) descriptor-stage body over a cloud of n points:
    run(keypoints, kp_mask, points, mask, normals, rgb, kp_rgb, radius,
    frame_radius) -> (descriptors, valid, frames, frame_valid).  Shared by
    the single-block jit (_descriptor_stage) and the scene-tiled lax.map
    (_descriptor_stage_tiled), where `points` is a window slab."""
    min_radius = 0.0
    if fcfg.type.startswith("SHORT_"):
        if fcfg.use_min_radius:
            min_radius = fcfg.radius * fcfg.short_shot_min_radius
        elif fcfg.short_shot_log_radius:
            min_radius = fcfg.radius * 0.1
        _, rb, eb, ab = resolve_bins(
            fcfg.short_shot_dims, fcfg.short_shot_bin_type,
            fcfg.short_shot_r_bins, fcfg.short_shot_e_bins, fcfg.short_shot_a_bins)
    if fcfg.type.startswith("SHORT_CSHOT"):
        from ..ops.short_shot import resolve_color_bins
        _, crb, ceb, cab = resolve_color_bins(fcfg.short_color_shot_dims)
    if fcfg.type == "CGF":
        from ..ops.cgf import CgfEmbedding, default_checkpoint_path
        if fcfg.cgf_checkpoint:
            # an explicit path must exist (the reference hard-requires its
            # downloaded TF checkpoint, features_cgf.cpp:46-68)
            cgf_embedding = CgfEmbedding.from_npz(fcfg.cgf_checkpoint)
        else:
            shipped = default_checkpoint_path()
            if os.path.exists(shipped):
                cgf_embedding = CgfEmbedding.from_npz(shipped)
            else:
                import warnings
                warnings.warn(
                    "CGF: no checkpoint (CgfCheckpointPath empty and the "
                    "shipped cgf_embedding.npz is missing) -- falling back "
                    "to a seeded random projection; descriptors are NOT "
                    "comparable to trained CGF. Train one with "
                    "python -m point_cloud_donkey_tpu.cli.train_cgf_embedding")
                cgf_embedding = CgfEmbedding.random_projection(
                    fcfg.cgf_output_dims)

    cap = min(fcfg.neighbor_capacity, n)

    def run(keypoints, kp_mask, points, mask, normals, rgb, kp_rgb,
            radius, frame_radius):
        rf_type = fcfg.ref_frame_type
        if rf_type == "SHOTNA":
            from ..ops.lrf import shot_na_lrf
            lrf = shot_na_lrf(keypoints, kp_mask, points, normals, mask,
                              frame_radius)
        elif rf_type == "FLARE":
            from ..ops.lrf import flare_lrf
            lrf = flare_lrf(keypoints, kp_mask, points, normals, mask,
                            frame_radius, frame_radius / 5.0)
        elif rf_type == "BOARD":
            from ..ops.lrf import board_lrf
            lrf = board_lrf(keypoints, kp_mask, points, normals, mask,
                            frame_radius)
        else:  # SHOT
            lrf = shot_lrf(keypoints, kp_mask, points, mask, frame_radius)

        # Dense [K, N] masked-reduction formulation for the SHOT family on
        # accelerator backends: the gathered-block path below is floored by
        # lax.top_k over [K, N] (~19 ms/cloud of device time at the
        # training geometry, experiments/r6_train_micro.py) while the dense
        # sweeps are the serving formulation (~0.2 ms/cloud).  CPU keeps
        # the gathered path so golden-pinned results stay bit-stable;
        # PCD_DENSE_DESC=0/1 overrides (read at trace time).  Numerics:
        # same statistical contract as the serving dense path (matmul-
        # identity distances can gate radius-boundary pairs differently;
        # no neighbor-capacity truncation).
        env_dense = os.environ.get("PCD_DENSE_DESC")
        use_dense = (env_dense == "1"
                     or (env_dense != "0"
                         and jax.default_backend() != "cpu")) \
            and fcfg.type in ("SHOT", "SHOT_GLOBAL", "SHORT_SHOT_PCL",
                              "CSHOT", "CSHOT_GLOBAL", "BSHOT",
                              "SHORT_SHOT", "SHORT_SHOT_GLOBAL")
        if use_dense:
            from ..ops.shot import (cshot_descriptor_dense,
                                    shot_descriptor_dense)
            from ..ops.short_shot import short_shot_descriptor_dense
            if fcfg.type in ("SHOT", "SHOT_GLOBAL"):
                res = shot_descriptor_dense(keypoints, lrf.frames,
                                            lrf.valid, points, normals,
                                            mask, radius)
            elif fcfg.type == "SHORT_SHOT_PCL":
                res = shot_descriptor_dense(keypoints, lrf.frames,
                                            lrf.valid, points,
                                            jnp.zeros_like(points), mask,
                                            radius)
            elif fcfg.type in ("CSHOT", "CSHOT_GLOBAL"):
                res = cshot_descriptor_dense(keypoints, kp_rgb, lrf.frames,
                                             lrf.valid, points, normals,
                                             rgb, mask, radius)
            elif fcfg.type == "BSHOT":
                from ..ops.descriptors_misc import bshot_binarize
                res = shot_descriptor_dense(keypoints, lrf.frames,
                                            lrf.valid, points, normals,
                                            mask, radius)
                res = res._replace(
                    descriptors=bshot_binarize(res.descriptors))
            else:
                res = short_shot_descriptor_dense(
                    keypoints, lrf.frames, lrf.valid, points, mask,
                    radius, rb, eb, ab, min_radius,
                    fcfg.short_shot_log_radius)
            return res.descriptors, res.valid, lrf.frames, lrf.valid

        nbr = gather_radius_neighbors(keypoints, points, mask, radius, cap)
        if fcfg.type in ("SHOT", "SHOT_GLOBAL"):
            res = shot_descriptor(keypoints, lrf.frames, lrf.valid,
                                  points, normals, nbr, radius)
        elif fcfg.type == "SHORT_SHOT_PCL":
            # the reference runs PCL SHOT with default-constructed ("fake")
            # normals (features_short_shot_pcl.cpp:42-53): the cosine channel
            # collapses, leaving the spatial histogram
            res = shot_descriptor(keypoints, lrf.frames, lrf.valid,
                                  points, jnp.zeros_like(points), nbr, radius)
        elif fcfg.type in ("CSHOT", "CSHOT_GLOBAL"):
            from ..ops.shot import cshot_descriptor
            res = cshot_descriptor(keypoints, kp_rgb, lrf.frames, lrf.valid,
                                   points, normals, rgb, nbr, radius)
        elif fcfg.type in ("SHORT_SHOT", "SHORT_SHOT_GLOBAL"):
            res = short_shot_descriptor(keypoints, lrf.frames, lrf.valid,
                                        points, nbr, radius,
                                        rb, eb, ab, min_radius,
                                        fcfg.short_shot_log_radius)
        elif fcfg.type in ("SHORT_CSHOT", "SHORT_CSHOT_GLOBAL"):
            from ..ops.short_shot import short_cshot_descriptor
            res = short_cshot_descriptor(keypoints, kp_rgb, lrf.frames,
                                         lrf.valid, points, rgb, nbr, radius,
                                         rb, eb, ab, crb, ceb, cab,
                                         fcfg.short_color_hist_size,
                                         min_radius,
                                         fcfg.short_shot_log_radius)
        elif fcfg.type == "FPFH":
            from ..ops.fpfh import fpfh_descriptor
            res = fpfh_descriptor(keypoints, kp_mask, points, normals, mask,
                                  radius, capacity=min(cap, 128))
        elif fcfg.type == "BSHOT":
            from ..ops.descriptors_misc import bshot_binarize
            res = shot_descriptor(keypoints, lrf.frames, lrf.valid,
                                  points, normals, nbr, radius)
            res = res._replace(descriptors=bshot_binarize(res.descriptors))
        elif fcfg.type == "SpinImage":
            from ..ops.descriptors_misc import spin_image_descriptor
            kp_nrm = normals[nbr.idx[:, 0]]
            res = spin_image_descriptor(keypoints, kp_nrm, kp_mask,
                                        points, nbr, radius)
        elif fcfg.type == "PFH":
            from ..ops.descriptors_misc import pfh_descriptor
            from ..ops.neighbors import gather_radius_neighbors as _grn
            nbr_small = _grn(keypoints, points, mask, radius, min(cap, 64))
            res = pfh_descriptor(keypoints, kp_mask, points, normals, nbr_small)
        elif fcfg.type in ("3DSC", "USC", "USC_GLOBAL"):
            from ..ops.shape_context import shape_context_descriptor
            res = shape_context_descriptor(keypoints, lrf.frames, lrf.valid,
                                           points, nbr, radius)
        elif fcfg.type == "RSD":
            from ..ops.shape_context import rsd_descriptor
            res = rsd_descriptor(keypoints, kp_mask, points, normals, nbr,
                                 radius, use_hist=fcfg.rsd_use_hist)
        elif fcfg.type == "RoPS":
            from ..ops.rops import rops_descriptor
            res = rops_descriptor(keypoints, kp_mask, points, nbr, radius)
        elif fcfg.type == "COSPAIR":
            from ..ops.cospair import cospair_descriptor
            kp_nrm = normals[nbr.idx[:, 0]]
            res = cospair_descriptor(keypoints, kp_nrm, kp_rgb, kp_mask,
                                     points, normals, rgb, nbr, radius)
        elif fcfg.type == "RIFT":
            from ..ops.shape_context import intensity_gradients, rift_descriptor
            intensity = jnp.mean(rgb, axis=1)  # PCL PointXYZI conversion
            grads = intensity_gradients(points, normals, intensity, mask, radius)
            res = rift_descriptor(keypoints, kp_mask, points, grads, nbr, radius)
        elif fcfg.type == "ESF_LOCAL":
            # ESF over each keypoint's radius neighborhood
            # (features_esf_local.cpp:36-83: flann radius search -> PCL ESF
            # per sub-cloud); here the gathered neighbor block IS the
            # sub-cloud and ESF is vmapped over keypoints
            from ..ops.global_descriptors import esf_descriptor
            from ..ops.shot import ShotResult
            npos = points[nbr.idx]
            desc = jax.vmap(lambda p, m: esf_descriptor(p, m))(npos, nbr.valid)
            cnt = jnp.sum(nbr.valid, axis=1)
            res = ShotResult(descriptors=desc, valid=kp_mask & (cnt >= 3))
        elif fcfg.type == "CGF":
            from ..ops.cgf import cgf_descriptor
            # the reference computes the CGF LRF with radius = 0.75 * support
            # (features_cgf.cpp:52) and flips it toward the keypoint normal
            lrf_cgf = shot_lrf(keypoints, kp_mask, points, mask, 0.75 * radius)
            kp_nrm = normals[nbr.idx[:, 0]]
            res = cgf_descriptor(keypoints, kp_nrm, lrf_cgf.frames,
                                 lrf_cgf.valid, points, nbr, radius,
                                 embedding=cgf_embedding)
            return res.descriptors, res.valid, lrf_cgf.frames, lrf_cgf.valid
        else:
            raise ValueError(f"unsupported descriptor type {fcfg.type!r}")
        return res.descriptors, res.valid, lrf.frames, lrf.valid
    return run


@functools.lru_cache(maxsize=None)
def _descriptor_stage(n: int, k: int, fcfg: FeatureConfig):
    """Jitted descriptor stage returning ONE packed [K, D+11] array
    (descriptors | frames flat | desc-valid | frame-valid): a single
    device->host transfer instead of four (round-trip latency dominates
    the host-orchestrated path).  Unpack with _unpack_descriptor_stage."""
    fn = _descriptor_fn(n, fcfg)

    def packed(*args):
        desc, d_valid, frames, f_valid = fn(*args)
        kk = desc.shape[0]
        return jnp.concatenate([
            desc, frames.reshape(kk, 9),
            d_valid[:, None].astype(desc.dtype),
            f_valid[:, None].astype(desc.dtype)], axis=1)

    return jax.jit(packed)


def _unpack_descriptor_stage(packed: np.ndarray):
    d = packed.shape[1] - 11
    desc = packed[:, :d]
    frames = packed[:, d:d + 9].reshape(-1, 3, 3)
    d_valid = packed[:, d + 9] > 0.5
    f_valid = packed[:, d + 10] > 0.5
    return desc, d_valid, frames, f_valid


@functools.lru_cache(maxsize=None)
def _descriptor_stage_tiled(window: int, k_chunk: int, n_chunks: int,
                            fcfg: FeatureConfig):
    """Scene-scale descriptor stage: keypoints (z-sorted, padded to
    n_chunks*k_chunk) processed in chunks, each against a contiguous window
    of the z-sorted cloud (ops/tiled.py).  Same math as _descriptor_stage,
    memory O(k_chunk * window)."""
    from ..ops.tiled import _map_chunks
    inner_fn = _descriptor_fn(window, fcfg)

    @jax.jit
    def run(keypoints, kp_mask, points, mask, normals, rgb, kp_rgb,
            radius, frame_radius, starts):
        def inner(qs, ps, s):
            kp, kpm, kprgb = qs
            p, m, nrm, rg = ps
            return inner_fn(kp, kpm, p, m, nrm, rg, kprgb,
                            radius, frame_radius)

        return _map_chunks(inner, (keypoints, kp_mask, kp_rgb),
                           (points, mask, normals, rgb),
                           starts, k_chunk, window, n_chunks)
    return run


# ---------------------------------------------------------------------------
# host orchestration
# ---------------------------------------------------------------------------

def pad_cloud(xyz: np.ndarray, bucket: Optional[int] = None
              ) -> Tuple[np.ndarray, np.ndarray]:
    n = len(xyz)
    b = bucket or bucket_size(n)
    pts = np.zeros((b, 3), np.float32)
    pts[:n] = xyz
    # park padding far away so it can never enter a radius window even
    # unmasked (defense in depth; all ops are mask-aware anyway)
    pts[n:] = 1e9
    mask = np.zeros(b, bool)
    mask[:n] = True
    return pts, mask


def compute_cloud_normals(
    xyz: np.ndarray,
    normals_in: Optional[np.ndarray],
    normal_radius: float,
    method: int,
) -> np.ndarray:
    """Cloud normals: pass through provided ones (the reference's normal
    check, implicit_shape_model.cpp:374-384) or compute with the configured
    consistent-orientation method."""
    if normals_in is not None and len(normals_in) == len(xyz):
        return np.asarray(normals_in, np.float32)
    from ..ops.tiled import SCENE_TILE_THRESHOLD
    if len(xyz) > SCENE_TILE_THRESHOLD:
        return _compute_normals_scene(xyz, normal_radius, method)
    pts, mask = pad_cloud(xyz)
    if method == 3:
        # EMST orientation runs on the host over PCA normals
        from ..ops.normals import orient_emst
        nres = _normals_stage(pts.shape[0], float(normal_radius), 0)(
            jnp.asarray(pts), jnp.asarray(mask))
        pca = np.asarray(nres.normals)[:len(xyz)]
        return orient_emst(xyz, pca).astype(np.float32)
    nres = _normals_stage(pts.shape[0], float(normal_radius), int(method))(
        jnp.asarray(pts), jnp.asarray(mask))
    return np.asarray(nres.normals)[:len(xyz)]


def _compute_normals_scene(xyz: np.ndarray, normal_radius: float,
                           method: int) -> np.ndarray:
    """Scene-scale normals: sort along the longest axis, window-tiled
    moments/LRFs (ops/tiled.py), un-permute.  Memory O(chunk * window)
    instead of O(N^2); exact up to fp summation order."""
    from ..ops.tiled import (NORMALS_CHUNK, plan_tiles, sort_key_axis,
                             tiled_compute_normals)
    n_real = len(xyz)
    axis = sort_key_axis(xyz)
    order = np.argsort(xyz[:, axis], kind="stable")
    xyz_s = xyz[order]
    pts, mask = pad_cloud(xyz_s)  # padding at 1e9 keeps ascending order
    key = pts[:, axis]
    plan = plan_tiles(key, mask, key, normal_radius, NORMALS_CHUNK)
    m = 0 if method == 3 else method  # EMST orients PCA normals on the host
    res = tiled_compute_normals(pts, mask, plan, normal_radius, m)
    nrm_s = np.asarray(res.normals)[:n_real]
    if method == 3:
        from ..ops.normals import orient_emst
        nrm_s = orient_emst(xyz_s, nrm_s).astype(np.float32)
    out = np.empty_like(nrm_s)
    out[order] = nrm_s
    return out


def extract_local_features(
    xyz: np.ndarray,                    # [N, 3] clean points (no NaN)
    normals: Optional[np.ndarray],      # [N, 3] or None -> computed
    fcfg: FeatureConfig,
    keypoint_cfg: ComponentConfig,
    normal_radius: float,
    consistent_normals_method: int,
    rgb: Optional[np.ndarray] = None,
    is_training: bool = False,
    times: Optional[Dict[str, float]] = None,
) -> FeatureSet:
    """Local feature pipeline for one cloud.  Returns a compacted FeatureSet.

    When `times` is given, the normal-estimation and keypoint-detection stage
    durations are accumulated into times["normals"] / times["keypoints"]
    (the reference times these separately inside computeFeatures and
    subtracts them from the "features" total,
    implicit_shape_model.cpp:636-643)."""
    from .keypoints import KeypointParams, detect_keypoints

    if fcfg.type == "NARF":
        # NARF ignores the configured keypoints and detects its own from
        # range-image borders (features_narf.cpp:70-81)
        return _narf_features(xyz, fcfg)

    if fcfg.type == "GASD":
        # GASD used as a *local* feature computes over the whole cloud and is
        # assigned the first valid keypoint's position/LRF (features.cpp:94-115
        # with features->size()==1; factory features_factory.h:104-105)
        return _gasd_local_features(xyz, rgb, fcfg, keypoint_cfg,
                                    normal_radius, consistent_normals_method,
                                    is_training)

    from ..ops.tiled import SCENE_TILE_THRESHOLD
    if len(xyz) > SCENE_TILE_THRESHOLD:
        return _extract_local_features_scene(
            xyz, normals, fcfg, keypoint_cfg, normal_radius,
            consistent_normals_method, rgb, is_training, times)

    pts, mask = pad_cloud(xyz)
    n = pts.shape[0]
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)

    kp_params = KeypointParams.from_config(keypoint_cfg)
    needs_culling_normals = (
        kp_params.type == "VoxelGridCulling"
        and not (is_training and kp_params.disable_filter_in_training)
        and kp_params.filter_method_geometry.lower() != "none")

    # normals
    cloud_normals = None
    if fcfg.needs_normals() or needs_culling_normals:
        t_n = time.perf_counter()
        cloud_normals = compute_cloud_normals(
            xyz, normals, normal_radius, consistent_normals_method)
        if times is not None:
            times["normals"] = times.get("normals", 0.0) \
                + time.perf_counter() - t_n
    if fcfg.needs_normals() and cloud_normals is not None:
        nrm = np.zeros((n, 3), np.float32)
        nrm[:len(xyz)] = cloud_normals
        nrm_j = jnp.asarray(nrm)
    else:
        nrm_j = jnp.zeros((n, 3), jnp.float32)

    # keypoints (VoxelGrid / VoxelGridCulling / Harris3D / ISS3D / SIFT3D)
    if kp_params.type not in ("VoxelGrid", "VoxelGridCulling", "Harris3D",
                              "ISS3D", "SIFT3D"):
        raise ValueError(f"unsupported keypoint type {kp_params.type!r}")
    t_k = time.perf_counter()
    kp, kp_rgb = detect_keypoints(xyz, cloud_normals, rgb, kp_params,
                                  is_training=is_training, return_colors=True)
    if times is not None:
        times["keypoints"] = times.get("keypoints", 0.0) \
            + time.perf_counter() - t_k
    k_bucket = bucket_size(len(kp), minimum=64)
    kp_pad = np.zeros((k_bucket, 3), np.float32)
    kp_pad[:len(kp)] = kp
    kp_pad[len(kp):] = 1e9
    kp_mask = np.zeros(k_bucket, bool)
    kp_mask[:len(kp)] = True

    if fcfg.needs_rgb():
        if rgb is None:
            raise ValueError(f"{fcfg.type} needs RGB data but the cloud has none")
        rgb_pad = np.zeros((n, 3), np.float32)
        rgb_pad[:len(xyz)] = rgb
        kp_rgb_pad = np.zeros((k_bucket, 3), np.float32)
        if kp_rgb is not None:
            kp_rgb_pad[:len(kp)] = kp_rgb
        rgb_j = jnp.asarray(rgb_pad)
        kp_rgb_j = jnp.asarray(kp_rgb_pad)
    else:
        rgb_j = jnp.zeros((n, 3), jnp.float32)
        kp_rgb_j = jnp.zeros((k_bucket, 3), jnp.float32)

    packed = np.asarray(_descriptor_stage(n, k_bucket, fcfg)(
        jnp.asarray(kp_pad), jnp.asarray(kp_mask), pts_j, mask_j, nrm_j,
        rgb_j, kp_rgb_j,
        jnp.asarray(fcfg.radius, jnp.float32),
        jnp.asarray(fcfg.ref_frame_radius, jnp.float32)))
    desc, d_valid, frames, f_valid = _unpack_descriptor_stage(packed)

    # NaN-descriptor removal (removeNaNFeatures, implicit_shape_model.cpp:1276-1308)
    finite = np.all(np.isfinite(desc), axis=1)
    keep = d_valid & finite & kp_mask

    centroid = xyz.mean(axis=0)
    center_dist = np.linalg.norm(kp_pad - centroid, axis=1)

    fs = make_feature_set(desc, kp_pad, frames, keep, center_dist)
    return fs.compact()


def _gasd_local_features(
    xyz: np.ndarray,
    rgb: Optional[np.ndarray],
    fcfg: FeatureConfig,
    keypoint_cfg: ComponentConfig,
    normal_radius: float,
    cn_method: int,
    is_training: bool,
) -> FeatureSet:
    """GASD configured as the local descriptor: one whole-cloud GASD-984/512
    feature carrying the first valid keypoint's position and LRF
    (features_gasd.cpp:34-100, features.cpp:98-115)."""
    from .keypoints import KeypointParams, detect_keypoints

    kp_params = KeypointParams.from_config(keypoint_cfg)
    kp = detect_keypoints(xyz, None, rgb, kp_params, is_training=is_training)
    pts, mask = pad_cloud(xyz)
    n = pts.shape[0]
    k_bucket = bucket_size(max(len(kp), 1), minimum=64)
    kp_pad = np.full((k_bucket, 3), 1e9, np.float32)
    kp_pad[:len(kp)] = kp
    kp_mask = np.zeros(k_bucket, bool)
    kp_mask[:len(kp)] = True
    lrf = _lrf_stage(n, k_bucket, float(fcfg.ref_frame_radius))(
        jnp.asarray(kp_pad), jnp.asarray(kp_mask),
        jnp.asarray(pts), jnp.asarray(mask))
    frames = np.asarray(lrf.frames)
    f_valid = np.asarray(lrf.valid)

    has_rgb = fcfg.gasd_with_color
    if has_rgb and rgb is None:
        raise ValueError("GASD with color needs RGB data (set GasdWithColor false)")
    rgb_pad = np.zeros((n, 3), np.float32)
    if rgb is not None:
        rgb_pad[:len(xyz)] = rgb
    run = _whole_cloud_stage(n, replace(fcfg, type="GASD"))
    desc = np.asarray(run(jnp.asarray(pts), jnp.asarray(mask),
                          jnp.zeros((n, 3), jnp.float32),
                          jnp.asarray(rgb_pad) if has_rgb else None,
                          jnp.asarray(fcfg.radius, jnp.float32)))[None, :]

    first = int(np.argmax(f_valid & kp_mask)) if (f_valid & kp_mask).any() else 0
    valid = np.asarray([np.all(np.isfinite(desc))])
    centroid = xyz.mean(axis=0)
    cd = np.linalg.norm(kp_pad[first] - centroid, keepdims=True)
    return make_feature_set(desc, kp_pad[first][None], frames[first][None],
                            valid, cd.astype(np.float32)).compact()


@functools.lru_cache(maxsize=None)
def _lrf_stage(n: int, k: int, frame_radius: float):
    @jax.jit
    def run(keypoints, kp_mask, points, mask):
        return shot_lrf(keypoints, kp_mask, points, mask, frame_radius)
    return run


def _extract_local_features_scene(
    xyz: np.ndarray,
    normals: Optional[np.ndarray],
    fcfg: FeatureConfig,
    keypoint_cfg: ComponentConfig,
    normal_radius: float,
    consistent_normals_method: int,
    rgb: Optional[np.ndarray],
    is_training: bool,
    times: Optional[Dict[str, float]] = None,
) -> FeatureSet:
    """Scene-scale local feature pipeline (reference detection scenes are
    1e5-1e6-point RGB-D clouds, implicit_shape_model.cpp:739-821): the cloud
    and keypoints are sorted along the longest axis and every [K, N] stage
    runs window-tiled (ops/tiled.py), bounding memory to O(chunk * window)."""
    from ..ops.tiled import KEYPOINT_CHUNK, plan_tiles, sort_key_axis
    from .keypoints import KeypointParams, detect_keypoints

    axis = sort_key_axis(xyz)
    order = np.argsort(xyz[:, axis], kind="stable")
    xyz_s = xyz[order]
    normals_s = None if normals is None else np.asarray(normals)[order]
    rgb_s = None if rgb is None else np.asarray(rgb)[order]

    kp_params = KeypointParams.from_config(keypoint_cfg)
    needs_culling_normals = (
        kp_params.type == "VoxelGridCulling"
        and not (is_training and kp_params.disable_filter_in_training)
        and kp_params.filter_method_geometry.lower() != "none")

    cloud_normals = None
    if fcfg.needs_normals() or needs_culling_normals:
        t_n = time.perf_counter()
        cloud_normals = compute_cloud_normals(
            xyz_s, normals_s, normal_radius, consistent_normals_method)
        if times is not None:
            times["normals"] = times.get("normals", 0.0) \
                + time.perf_counter() - t_n

    # detect_keypoints handles every type at scene scale (VoxelGrid /
    # VoxelGridCulling / Harris3D / ISS3D / SIFT3D via windowed tiled passes)
    t_k = time.perf_counter()
    kp, kp_rgb = detect_keypoints(xyz_s, cloud_normals, rgb_s, kp_params,
                                  is_training=is_training, return_colors=True)
    if times is not None:
        times["keypoints"] = times.get("keypoints", 0.0) \
            + time.perf_counter() - t_k

    # sort keypoints along the same axis so chunks get tight windows
    kp_order = np.argsort(kp[:, axis], kind="stable")
    kp = kp[kp_order]
    if kp_rgb is not None:
        kp_rgb = kp_rgb[kp_order]

    pts, mask = pad_cloud(xyz_s)
    n = pts.shape[0]
    k_chunk = KEYPOINT_CHUNK
    n_chunks = max(1, -(-len(kp) // k_chunk))
    k_bucket = n_chunks * k_chunk
    kp_pad = np.full((k_bucket, 3), 1e9, np.float32)
    kp_pad[:len(kp)] = kp
    kp_mask = np.zeros(k_bucket, bool)
    kp_mask[:len(kp)] = True

    # FPFH/RIFT compute per-neighbor quantities that need the neighbors'
    # own neighborhoods -> window margin doubles
    margin = 2.0 if fcfg.type in ("FPFH", "RIFT") else 1.0
    r_plan = margin * max(fcfg.radius, fcfg.ref_frame_radius)
    plan = plan_tiles(kp_pad[:, axis], kp_mask, pts[:, axis], r_plan,
                      k_chunk, min_window=4096)

    if fcfg.needs_normals() and cloud_normals is not None:
        nrm = np.zeros((n, 3), np.float32)
        nrm[:len(xyz_s)] = cloud_normals
        nrm_j = jnp.asarray(nrm)
    else:
        nrm_j = jnp.zeros((n, 3), jnp.float32)

    if fcfg.needs_rgb():
        if rgb_s is None:
            raise ValueError(f"{fcfg.type} needs RGB data but the cloud has none")
        rgb_pad = np.zeros((n, 3), np.float32)
        rgb_pad[:len(xyz_s)] = rgb_s
        kp_rgb_pad = np.zeros((k_bucket, 3), np.float32)
        if kp_rgb is not None:
            kp_rgb_pad[:len(kp)] = kp_rgb
        rgb_j = jnp.asarray(rgb_pad)
        kp_rgb_j = jnp.asarray(kp_rgb_pad)
    else:
        rgb_j = jnp.zeros((n, 3), jnp.float32)
        kp_rgb_j = jnp.zeros((k_bucket, 3), jnp.float32)

    run = _descriptor_stage_tiled(plan.window, k_chunk, plan.n_chunks, fcfg)
    desc, d_valid, frames, f_valid = run(
        jnp.asarray(kp_pad), jnp.asarray(kp_mask), jnp.asarray(pts),
        jnp.asarray(mask), nrm_j, rgb_j, kp_rgb_j,
        jnp.asarray(fcfg.radius, jnp.float32),
        jnp.asarray(fcfg.ref_frame_radius, jnp.float32), plan.starts)

    desc = np.asarray(desc)
    d_valid = np.asarray(d_valid)
    frames = np.asarray(frames)

    finite = np.all(np.isfinite(desc), axis=1)
    keep = d_valid & finite & kp_mask

    centroid = xyz.mean(axis=0)
    center_dist = np.linalg.norm(kp_pad - centroid, axis=1)

    fs = make_feature_set(desc, kp_pad, frames, keep, center_dist)
    return fs.compact()


@functools.lru_cache(maxsize=None)
def _narf_stage(h: int, w: int, support: float, focal: float):
    from ..ops.narf import narf_keypoints, narf_descriptor

    @jax.jit
    def run(range_img):
        kp = narf_keypoints(range_img, support, focal=focal)
        desc, valid = narf_descriptor(range_img, kp, support, focal=focal)
        return kp, desc, valid
    return run


def _narf_features(xyz: np.ndarray, fcfg: FeatureConfig) -> FeatureSet:
    from ..ops.narf import build_range_image
    range_img, _ = build_range_image(xyz, fcfg.narf_image_width,
                                     fcfg.narf_image_height, fcfg.narf_focal)
    kp, desc, valid = _narf_stage(
        range_img.shape[0], range_img.shape[1], float(fcfg.radius),
        float(fcfg.narf_focal))(jnp.asarray(range_img))
    k = desc.shape[0]
    frames = np.tile(np.eye(3, dtype=np.float32), (k, 1, 1))
    return make_feature_set(np.asarray(desc), np.asarray(kp.xyz), frames,
                            np.asarray(valid)).compact()


def extract_global_features(
    xyz: np.ndarray,
    normals: Optional[np.ndarray],
    fcfg: FeatureConfig,
    normal_radius: float,
    consistent_normals_method: int,
    rgb: Optional[np.ndarray] = None,
) -> FeatureSet:
    """Global descriptor over the whole cloud.  The *_GLOBAL descriptors are
    the local descriptor computed at the centroid with radius = cloud radius
    (features_short_shot_global.cpp:45, features.cpp *_global variants)."""
    if fcfg.type == "Dummy":
        return make_feature_set(
            np.zeros((0, 1), np.float32), np.zeros((0, 3), np.float32),
            np.zeros((0, 3, 3), np.float32), np.zeros(0, bool))

    # whole-cloud descriptors without a centroid keypoint / LRF
    if fcfg.type in ("ESF", "VFH", "GRSD", "GASD"):
        return _whole_cloud_global(xyz, normals, rgb, fcfg,
                                   normal_radius, consistent_normals_method)
    if fcfg.type in ("CVFH", "OURCVFH"):
        return _cvfh_global(xyz, normals, fcfg, normal_radius,
                            consistent_normals_method)

    pts, mask = pad_cloud(xyz)
    n = pts.shape[0]
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)

    centroid = xyz.mean(axis=0).astype(np.float32)
    radius = float(np.linalg.norm(xyz - centroid, axis=1).max())

    if fcfg.needs_normals():
        if normals is not None and len(normals) == len(xyz):
            nrm = np.zeros((n, 3), np.float32)
            nrm[:len(xyz)] = normals
            nrm_j = jnp.asarray(nrm)
        else:
            nres = _normals_stage(n, float(normal_radius),
                                  int(consistent_normals_method))(pts_j, mask_j)
            nrm_j = nres.normals
    else:
        nrm_j = jnp.zeros((n, 3), jnp.float32)

    kp = np.full((64, 3), 1e9, np.float32)
    kp[0] = centroid
    kp_mask = np.zeros(64, bool)
    kp_mask[0] = True

    # the global descriptor's radius is the cloud radius: every point is a
    # neighbor, so the gather capacity must cover the whole cloud
    fcfg = replace(fcfg, neighbor_capacity=n)

    if fcfg.needs_rgb():
        if rgb is None:
            raise ValueError(f"{fcfg.type} needs RGB data but the cloud has none")
        rgb_pad = np.zeros((n, 3), np.float32)
        rgb_pad[:len(xyz)] = rgb
        rgb_j = jnp.asarray(rgb_pad)
        kp_rgb = np.zeros((64, 3), np.float32)
        kp_rgb[0] = rgb.mean(axis=0)  # centroid keypoint gets the mean color
        kp_rgb_j = jnp.asarray(kp_rgb)
    else:
        rgb_j = jnp.zeros((n, 3), jnp.float32)
        kp_rgb_j = jnp.zeros((64, 3), jnp.float32)

    # radius is dynamic (cloud radius) -> passed as a traced scalar
    packed = np.asarray(_descriptor_stage(n, 64, fcfg)(
        jnp.asarray(kp), jnp.asarray(kp_mask), pts_j, mask_j, nrm_j,
        rgb_j, kp_rgb_j,
        jnp.asarray(radius, jnp.float32),
        jnp.asarray(fcfg.ref_frame_radius, jnp.float32)))
    desc_a, d_valid, frames_a, _ = _unpack_descriptor_stage(packed)

    desc = desc_a[:1]
    valid = d_valid[:1] & np.all(np.isfinite(desc), axis=1)
    fs = make_feature_set(
        desc, kp[:1], frames_a[:1], valid,
        np.zeros(1, np.float32), np.full(1, radius, np.float32))
    return fs.compact()


def _cvfh_global(xyz, normals_in, fcfg: FeatureConfig,
                 normal_radius: float, cn_method: int) -> FeatureSet:
    """CVFH / OUR-CVFH: one VFH-308 per smooth surface region (multi-row
    FeatureSet; features_cvfh.cpp / features_ourcvfh.cpp)."""
    import math
    from ..ops.cvfh import cvfh_descriptors
    pts, mask = pad_cloud(xyz)
    n = pts.shape[0]
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
    # curvature always comes from the normal stage (PCL estimates it with
    # the normals); provided normals are still honored for the angles
    nres = _normals_stage(n, float(normal_radius), int(cn_method))(pts_j, mask_j)
    curv = np.asarray(nres.curvature)[:len(xyz)]
    if normals_in is not None and len(normals_in) == len(xyz):
        nrm = np.asarray(normals_in, np.float32)
        nrm_pad = np.zeros((n, 3), np.float32)
        nrm_pad[:len(xyz)] = nrm
        nrm_j = jnp.asarray(nrm_pad)
    else:
        nrm_j = nres.normals
        nrm = np.asarray(nrm_j)[:len(xyz)]
    desc = cvfh_descriptors(
        xyz, nrm, curv, pts_j, nrm_j, mask_j,
        dist_tol=fcfg.cvfh_cluster_tolerance,
        eps_angle=math.radians(fcfg.cvfh_eps_angle_deg),
        curv_threshold=fcfg.cvfh_curv_threshold,
        min_points=fcfg.cvfh_min_points,
        with_sgurf=(fcfg.type == "OURCVFH"),
        axis_ratio=fcfg.ourcvfh_axis_ratio)
    g = desc.shape[0]
    centroid = xyz.mean(axis=0).astype(np.float32)
    radius = float(np.linalg.norm(xyz - centroid, axis=1).max())
    valid = np.all(np.isfinite(desc), axis=1)
    return make_feature_set(
        desc, np.tile(centroid, (g, 1)),
        np.tile(np.eye(3, dtype=np.float32), (g, 1, 1)), valid,
        np.zeros(g, np.float32), np.full(g, radius, np.float32))


def _whole_cloud_fn(fcfg: FeatureConfig):
    """Raw (unjitted) whole-cloud descriptor body; shared by the per-cloud
    jit (_whole_cloud_stage) and the cross-cloud vmapped batch program
    (models/detect_batch.py)."""
    from ..ops.global_descriptors import (esf_descriptor, gasd_descriptor,
                                          grsd_descriptor, vfh_descriptor)

    def run(points, mask, normals, rgb, radius):
        if fcfg.type == "ESF":
            return esf_descriptor(points, mask)
        if fcfg.type == "VFH":
            return vfh_descriptor(points, normals, mask)
        if fcfg.type == "GRSD":
            return grsd_descriptor(points, normals, mask, radius)
        if fcfg.type == "GASD":
            return gasd_descriptor(points, mask, rgb)
        raise ValueError(fcfg.type)
    return run


@functools.lru_cache(maxsize=None)
def _whole_cloud_stage(n: int, fcfg: FeatureConfig):
    return jax.jit(_whole_cloud_fn(fcfg))


def _whole_cloud_global(xyz, normals, rgb, fcfg: FeatureConfig,
                        normal_radius: float, cn_method: int) -> FeatureSet:
    """ESF / VFH / GRSD / GASD: one descriptor for the whole cloud
    (reference computes these via PCL whole-cloud estimators)."""
    pts, mask = pad_cloud(xyz)
    n = pts.shape[0]
    if fcfg.needs_normals():
        cn = compute_cloud_normals(xyz, normals, normal_radius, cn_method)
        nrm = np.zeros((n, 3), np.float32)
        nrm[:len(xyz)] = cn
    else:
        nrm = np.zeros((n, 3), np.float32)
    rgb_pad = np.zeros((n, 3), np.float32)
    has_rgb = (fcfg.type == "GASD" and fcfg.gasd_with_color)
    if has_rgb and rgb is None:
        raise ValueError("GASD with color needs RGB data (set GasdWithColor false)")
    if rgb is not None:
        rgb_pad[:len(xyz)] = rgb

    run = _whole_cloud_stage(n, fcfg)
    # GASD with/without color changes the output length -> encode in config
    desc = run(jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(nrm),
               jnp.asarray(rgb_pad) if has_rgb else None,
               jnp.asarray(fcfg.radius, jnp.float32))
    desc = np.asarray(desc)[None, :]
    centroid = xyz.mean(axis=0).astype(np.float32)
    radius = float(np.linalg.norm(xyz - centroid, axis=1).max())
    valid = np.asarray([np.all(np.isfinite(desc))])
    return make_feature_set(desc, centroid[None, :],
                            np.eye(3, dtype=np.float32)[None], valid,
                            np.zeros(1, np.float32),
                            np.full(1, radius, np.float32))
