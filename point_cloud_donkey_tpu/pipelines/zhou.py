"""zhou pipeline: self-adaptive Hough-space hypothesis generation and
verification (Zhou et al., Computers & Graphics 2018; reference
eval_pipeline_zhou/self_adapt_hghv.{h,cpp})."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .building_blocks import (PipelineModel, PipelineParams,
                              absolute_orientation_ransac,
                              find_nn_correspondences,
                              generate_classification_hypotheses,
                              prepare_center_votes, process_point_cloud,
                              self_adapted_hough_voting, train_pipeline_model)
from .building_blocks import load_scene
from ..utils.io import load_cloud


class SelfAdaptHGHV:
    def __init__(self, params: PipelineParams = None,
                 initial_bins: int = 5):
        self.params = params or PipelineParams()
        self.initial_bins = initial_bins
        self.model: PipelineModel = None

    def train(self, filenames, class_labels, instance_labels, output_file):
        self.model = train_pipeline_model(filenames, class_labels,
                                          instance_labels, self.params)
        self.model.save(output_file)

    def load_model(self, path: str) -> None:
        self.model = PipelineModel.load(path)

    def _vote(self, filename: str, scene: bool = False):
        # detection scenes get the preset's z passthrough
        # (self_adapt_hghv.cpp's loader mirrors hough3d.cpp:289-300)
        cloud = (load_scene(filename, self.params) if scene
                 else load_cloud(filename).remove_nan())
        pc = process_point_cloud(cloud.xyz, cloud.rgb, self.params)
        o, s, d = find_nn_correspondences(pc.descriptors,
                                          self.model.descriptors)
        if len(o) == 0:
            return pc, o, s, [], []
        maxima, vote_ids, _, found_bin = self_adapted_hough_voting(
            o, s, d, self.model.keypoints, self.model.lrfs,
            pc.keypoints, pc.lrfs, initial_bins=self.initial_bins,
            rel_threshold=self.params.rel_threshold)
        self._found_bin = found_bin
        return pc, o, s, maxima, vote_ids

    def classify(self, filename: str) -> List[Tuple[int, float]]:
        """classifyObject (self_adapt_hghv.cpp:242-300): maxima of the
        self-adapted (rmse_E, rmse_T) Hough space -> majority class."""
        pc, o, s, maxima, vote_ids = self._vote(filename)
        if not maxima:
            return []
        cls = self.model.class_ids[o]
        clusters = [np.asarray(v) for v in vote_ids]
        results = generate_classification_hypotheses(clusters, cls)
        results.sort(key=lambda r: -r[1])
        return results

    def detect(self, filename: str) -> List[Tuple[int, float, np.ndarray]]:
        """findObjects (self_adapt_hghv.cpp:340-470): self-adapted Hough ->
        absolute orientation with inlier threshold = found bin size ->
        fitness-score verification."""
        pc, o, s, maxima, vote_ids = self._vote(filename, scene=True)
        if not maxima:
            return []
        cls = self.model.class_ids[o]
        centers = prepare_center_votes(o, s, pc.keypoints, pc.lrfs,
                                       self.model.center_vectors)
        inlier_th = max(getattr(self, "_found_bin", 0.0),
                        self.params.inlier_threshold)
        out = []
        for v in vote_ids:
            if len(v) < 3:
                continue
            v = np.asarray(v)
            R, t, inl = absolute_orientation_ransac(
                self.model.keypoints[o[v]], pc.keypoints[s[v]], inlier_th)
            if R is None or inl.sum() < 3:
                continue
            members = v[inl]
            # fitness score: mean residual of the aligned inliers (fs metric,
            # pipeline_building_blocks.cpp:922-960 essence)
            res = np.linalg.norm(
                pc.keypoints[s[members]]
                - (self.model.keypoints[o[members]] @ R.T + t), axis=1)
            fitness = float(np.exp(-res.mean() / max(inlier_th, 1e-9)))
            hyp = generate_classification_hypotheses(
                [np.arange(len(members))], cls[members])
            if not hyp:
                continue
            c, w = hyp[0]
            out.append((c, w * fitness, centers[members].mean(axis=0)))
        out.sort(key=lambda r: -r[1])
        return out
