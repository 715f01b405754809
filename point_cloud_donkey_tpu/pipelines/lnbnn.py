"""mccann pipeline: Local Naive Bayes Nearest Neighbor classification
(McCann & Lowe, CVPR 2012; reference eval_pipeline_mccann/lnbnn.{h,cpp})."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from .building_blocks import (PipelineModel, PipelineParams,
                              process_point_cloud, train_pipeline_model)
from ..utils.io import load_cloud


class Lnbnn:
    """k=11 NN over the pooled training features; each scene feature credits
    the first occurrence of every class among its k-1 nearest neighbors with
    (d_i - d_k), the k-th distance acting as the background term
    (lnbnn.cpp:174-230).  Lower accumulated distance = better class."""

    K_SEARCH = 11

    def __init__(self, params: PipelineParams = None):
        self.params = params or PipelineParams(
            normal_radius=0.005, reference_frame_radius=0.04,
            feature_radius=0.06, keypoint_sampling_radius=0.02,
            normal_method=0, feature_type="CSHOT")
        self.model: PipelineModel = None

    def train(self, filenames: List[str], class_labels: List[int],
              instance_labels: List[int], output_file: str) -> None:
        self.model = train_pipeline_model(filenames, class_labels,
                                          instance_labels, self.params)
        self.model.save(output_file)

    def load_model(self, path: str) -> None:
        self.model = PipelineModel.load(path)

    def classify(self, filename: str) -> List[Tuple[int, float]]:
        from ..ops.neighbors import knn
        cloud = load_cloud(filename).remove_nan()
        pc = process_point_cloud(cloud.xyz, cloud.rgb, self.params)
        if len(pc.descriptors) == 0:
            return []
        k = min(self.K_SEARCH, len(self.model.descriptors))
        d, idx = knn(jnp.asarray(pc.descriptors),
                     jnp.asarray(self.model.descriptors),
                     jnp.ones(len(self.model.descriptors), bool),
                     k=k, metric="l2")
        d, idx = np.asarray(d), np.asarray(idx)
        cls = self.model.class_ids[idx]                    # [F, k]
        scores = np.zeros(self.model.num_classes, np.float64)
        dist_b = d[:, -1]                                  # background term
        for fe in range(d.shape[0]):
            seen = set()
            for i in range(k - 1):
                c = int(cls[fe, i])
                if c not in seen:
                    scores[c] += d[fe, i] - dist_b[fe]
                    seen.add(c)
        order = np.argsort(scores)                         # smaller = better
        return [(int(c), float(scores[c])) for c in order]
