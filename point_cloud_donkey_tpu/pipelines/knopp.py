"""knopp pipeline: port of pcl::ism::ImplicitShapeModelEstimation (Knopp et
al., ECCV 2010; reference eval_pipeline_knopp/pcl_ism.{h,cpp} drives the PCL
implementation with FPFH features, cluster rate 1.0, voxel sampling).

PCL's ISM: FPFH at voxel-sampled points, k-means codebook, per-class learned
statistical weights, votes toward the object center; classification finds the
strongest density peak per class with a Gaussian kernel of sigma = 8 * the
learned per-class sigma inside radius 10 * sigma (pcl_ism.cpp:113-150)."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from .building_blocks import PipelineModel, PipelineParams
from ..utils.io import load_cloud


class PclIsm:
    def __init__(self, params: PipelineParams = None):
        self.params = params or PipelineParams(
            normal_radius=0.05, feature_radius=0.4,
            keypoint_sampling_radius=0.2, feature_type="FPFH")
        self.model: PipelineModel = None
        self.sigmas: np.ndarray = None

    def _process(self, xyz):
        from ..models.features import FeatureConfig, extract_local_features
        from ..utils.config import ComponentConfig
        fcfg = FeatureConfig(type="FPFH", radius=self.params.feature_radius)
        kp_cfg = ComponentConfig(
            type="VoxelGrid",
            params={"LeafSize": self.params.keypoint_sampling_radius})
        return extract_local_features(xyz, None, fcfg, kp_cfg,
                                      self.params.normal_radius, 1)

    def train(self, filenames, class_labels, instance_labels, output_file):
        desc, kps, votes, cls = [], [], [], []
        sigmas: dict = {}
        for fn, c in zip(filenames, class_labels):
            cloud = load_cloud(fn).remove_nan()
            fs = self._process(cloud.xyz)
            centroid = cloud.xyz.mean(axis=0).astype(np.float32)
            desc.append(fs.descriptors)
            kps.append(fs.positions)
            votes.append(centroid[None, :] - fs.positions)  # world coords
            cls.append(np.full(len(fs.positions), c, np.int32))
            # PCL ISM sigma: a fraction of the object extent per class
            r = float(np.linalg.norm(cloud.xyz - centroid, axis=1).max())
            sigmas.setdefault(c, []).append(r)
        ncls = max(class_labels) + 1
        sig = np.zeros(ncls, np.float32)
        for c, rs in sigmas.items():
            sig[c] = np.mean(rs) / 10.0   # PCL heuristic scale
        self.model = PipelineModel(
            np.concatenate(desc), np.concatenate(kps),
            np.tile(np.eye(3, dtype=np.float32),
                    (sum(len(k) for k in kps), 1, 1)),
            np.concatenate(votes), np.concatenate(cls),
            np.zeros(sum(len(k) for k in kps), np.int32), ncls, sig)
        self.model.save(output_file)

    def load_model(self, path: str) -> None:
        self.model = PipelineModel.load(path)

    def classify(self, filename: str) -> List[Tuple[int, float]]:
        from ..ops.neighbors import knn
        cloud = load_cloud(filename).remove_nan()
        fs = self._process(cloud.xyz)
        if len(fs.descriptors) == 0:
            return []
        d, idx = knn(jnp.asarray(fs.descriptors),
                     jnp.asarray(self.model.descriptors),
                     jnp.ones(len(self.model.descriptors), bool),
                     k=1, metric="l2")
        idx = np.asarray(idx)[:, 0]
        votes = fs.positions + self.model.center_vectors[idx]
        vote_cls = self.model.class_ids[idx]
        results = []
        for c in range(self.model.num_classes):
            sel = vote_cls == c
            if not sel.any():
                continue
            pts = votes[sel]
            sigma = max(float(self.model.bbox_radii[c]) * 8.0, 1e-6)
            # strongest density peak with a Gaussian kernel (findStrongestPeaks)
            d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
            dens = np.exp(-d2 / (2.0 * sigma * sigma)).sum(axis=1)
            results.append((c, float(dens.max())))
        results.sort(key=lambda r: -r[1])
        return results
