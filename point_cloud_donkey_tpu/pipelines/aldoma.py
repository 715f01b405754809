"""aldoma pipeline: correspondence grouping + global hypothesis verification
(Aldoma et al., ECCV 2012; reference eval_pipeline_aldoma/global_hv.{h,cpp})."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .building_blocks import (PipelineModel, PipelineParams,
                              absolute_orientation_ransac,
                              cast_votes_and_find_maxima,
                              cluster_correspondences_gc,
                              find_nn_correspondences,
                              generate_classification_hypotheses,
                              prepare_center_votes, process_point_cloud,
                              train_pipeline_model)
from ..utils.io import load_cloud


class GlobalHV:
    def __init__(self, params: PipelineParams = None):
        self.params = params or PipelineParams()
        self.model: PipelineModel = None

    def train(self, filenames, class_labels, instance_labels, output_file):
        self.model = train_pipeline_model(filenames, class_labels,
                                          instance_labels, self.params)
        self.model.save(output_file)

    def load_model(self, path: str) -> None:
        self.model = PipelineModel.load(path)

    def classify(self, filename: str, use_hough: bool = True
                 ) -> List[Tuple[int, float]]:
        """classifyObject (global_hv.cpp:360-409): cluster correspondences
        (Hough over center votes, or geometric consistency), then majority
        class per cluster."""
        cloud = load_cloud(filename).remove_nan()
        pc = process_point_cloud(cloud.xyz, cloud.rgb, self.params)
        o, s, d = find_nn_correspondences(pc.descriptors,
                                          self.model.descriptors)
        if len(o) == 0:
            return []
        cls = self.model.class_ids[o]
        p = self.params
        if use_hough:
            centers = prepare_center_votes(o, s, pc.keypoints, pc.lrfs,
                                           self.model.center_vectors)
            _, vote_ids = cast_votes_and_find_maxima(
                centers, np.ones(len(centers)),
                np.full(3, p.min_coord), np.full(3, p.max_coord),
                np.full(3, p.bin_size), p.rel_threshold)
            clusters = [np.asarray(v) for v in vote_ids]
        else:
            clusters = cluster_correspondences_gc(
                o, s, self.model.keypoints, pc.keypoints,
                gc_size=p.bin_size, gc_threshold=max(int(abs(p.rel_threshold)), 3))
        results = generate_classification_hypotheses(clusters, cls)
        results.sort(key=lambda r: -r[1])
        return results

    def detect(self, filename: str, use_global_hv: bool = True
               ) -> List[Tuple[int, float, np.ndarray]]:
        """findObjects (global_hv.cpp:411-520): cluster -> absolute
        orientation -> ICP-style refinement -> global verification by scene
        inlier support of the aligned model keypoints."""
        cloud = load_cloud(filename).remove_nan()
        pc = process_point_cloud(cloud.xyz, cloud.rgb, self.params)
        o, s, d = find_nn_correspondences(pc.descriptors,
                                          self.model.descriptors)
        if len(o) == 0:
            return []
        p = self.params
        centers = prepare_center_votes(o, s, pc.keypoints, pc.lrfs,
                                       self.model.center_vectors)
        _, vote_ids = cast_votes_and_find_maxima(
            centers, np.ones(len(centers)),
            np.full(3, p.min_coord), np.full(3, p.max_coord),
            np.full(3, p.bin_size), p.rel_threshold)
        cls = self.model.class_ids[o]
        out = []
        for v in vote_ids:
            if len(v) < 3:
                continue
            v = np.asarray(v)
            R, t, inl = absolute_orientation_ransac(
                self.model.keypoints[o[v]], pc.keypoints[s[v]],
                p.inlier_threshold)
            if R is None or inl.sum() < 3:
                continue
            members = v[inl]
            if use_global_hv:
                # global verification: fraction of aligned model keypoints
                # with a scene keypoint within the inlier threshold
                aligned = self.model.keypoints[o[v]] @ R.T + t
                d2 = np.linalg.norm(aligned[:, None, :]
                                    - pc.keypoints[None, :, :], axis=-1)
                support = (d2.min(axis=1) < p.inlier_threshold).mean()
                if support < 0.25:
                    continue
            hyp = generate_classification_hypotheses(
                [np.arange(len(members))], cls[members])
            if not hyp:
                continue
            c, w = hyp[0]
            out.append((c, w, centers[members].mean(axis=0)))
        out.sort(key=lambda r: -r[1])
        return out
