"""tombari pipeline: Hough-3D correspondence grouping for classification and
detection (Tombari & Di Stefano, PSIVT 2010; reference
eval_pipeline_tombari/hough3d.{h,cpp})."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .building_blocks import (PipelineModel, PipelineParams,
                              absolute_orientation_ransac,
                              cast_votes_and_find_maxima,
                              find_nn_correspondences,
                              generate_classification_hypotheses,
                              prepare_center_votes, process_point_cloud,
                              train_pipeline_model)
from .building_blocks import load_scene
from ..utils.io import load_cloud


class Hough3d:
    def __init__(self, params: PipelineParams = None):
        self.params = params or PipelineParams()
        self.model: PipelineModel = None

    def train(self, filenames, class_labels, instance_labels, output_file):
        self.model = train_pipeline_model(filenames, class_labels,
                                          instance_labels, self.params)
        self.model.save(output_file)

    def load_model(self, path: str) -> None:
        self.model = PipelineModel.load(path)

    def _correspond(self, filename: str, scene: bool = False):
        # detection scenes get the preset's z passthrough
        # (hough3d.cpp:289-300); classification loads the raw cloud
        cloud = (load_scene(filename, self.params) if scene
                 else load_cloud(filename).remove_nan())
        pc = process_point_cloud(cloud.xyz, cloud.rgb, self.params)
        o, s, d = find_nn_correspondences(pc.descriptors,
                                          self.model.descriptors)
        centers = prepare_center_votes(o, s, pc.keypoints, pc.lrfs,
                                       self.model.center_vectors)
        return pc, o, s, d, centers

    def _hough(self, centers, rel_threshold):
        p = self.params
        return cast_votes_and_find_maxima(
            centers, np.ones(len(centers)),
            np.full(3, p.min_coord), np.full(3, p.max_coord),
            np.full(3, p.bin_size), rel_threshold)

    def classify(self, filename: str,
                 use_single_voting_space: bool = False
                 ) -> List[Tuple[int, float]]:
        """Separate voting spaces per class (hough3d.cpp:374-438) or one
        shared space with per-maximum majority labels (:439-480)."""
        pc, o, s, d, centers = self._correspond(filename)
        if len(o) == 0:
            return []
        cls = self.model.class_ids[o]
        results: List[Tuple[int, float]] = []
        if use_single_voting_space:
            maxima, vote_ids = self._hough(centers, self.params.rel_threshold)
            clusters = [np.asarray(v) for v in vote_ids]
            results = generate_classification_hypotheses(clusters, cls)
        else:
            for c in np.unique(cls):
                sel = cls == c
                maxima, _ = self._hough(centers[sel], self.params.rel_threshold)
                if maxima:
                    results.append((int(c), float(max(maxima))))
        results.sort(key=lambda r: -r[1])
        return results

    def detect(self, filename: str, use_hypothesis_verification: bool = True
               ) -> List[Tuple[int, float, np.ndarray]]:
        """findObjects (hough3d.cpp:485-560): Hough maxima -> per-maximum
        absolute orientation (RANSAC); detections are (class, weight,
        position)."""
        pc, o, s, d, centers = self._correspond(filename, scene=True)
        if len(o) == 0:
            return []
        maxima, vote_ids = self._hough(centers, self.params.rel_threshold)
        cls = self.model.class_ids[o]
        out = []
        for v in vote_ids:
            if len(v) < 3:
                continue
            v = np.asarray(v)
            obj_pts = self.model.keypoints[o[v]]
            scn_pts = pc.keypoints[s[v]]
            if use_hypothesis_verification:
                R, t, inl = absolute_orientation_ransac(
                    obj_pts, scn_pts, self.params.inlier_threshold)
                if R is None or inl.sum() < 3:
                    continue
                members = v[inl]
            else:
                members = v
            hyp = generate_classification_hypotheses(
                [np.arange(len(members))], cls[members])
            if not hyp:
                continue
            c, w = hyp[0]
            pos = centers[members].mean(axis=0)
            out.append((c, w, pos))
        out.sort(key=lambda r: -r[1])
        return out
