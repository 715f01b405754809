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
                              icp_point_to_point, prepare_center_votes,
                              process_point_cloud, run_global_hv,
                              train_pipeline_model, voxel_downsample)
from .building_blocks import load_scene
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
        """findObjects (global_hv.cpp:411-532): cluster correspondences ->
        per-cluster coarse alignment -> ICP refinement over the cluster's
        keypoint pair (alignCloudsWithICP, pipeline_building_blocks.cpp:616-
        650; 100 iterations, 0.05 correspondence distance) -> Aldoma
        ECCV'12 GLOBAL hypothesis verification over all registered instances
        jointly against the scene cloud (runGlobalHV, :653-683) -> for each
        surviving hypothesis, majority class over the cluster and centroid
        of the cluster's scene keypoints (global_hv.cpp:497-526).  Scenes
        get the preset's z passthrough (global_hv.cpp:273-283)."""
        cloud = load_scene(filename, self.params)
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

        # per cluster: RANSAC absolute orientation, keeping only the
        # consistent correspondences (PCL's Hough3DGrouping::recognize runs
        # CorrespondenceRejectorSampleConsensus per cluster and returns the
        # FILTERED corrs + transform — clustered_corrs in global_hv.cpp:441),
        # then ICP of the transformed object keypoints onto the cluster's
        # scene keypoints; non-converged instances are dropped
        # (pipeline_building_blocks.cpp:639-645)
        hyps: List[Tuple[np.ndarray, np.ndarray]] = []  # (members, registered)
        for v in vote_ids:
            if len(v) < 3:
                continue
            v = np.asarray(v)
            R, t, inl = absolute_orientation_ransac(
                self.model.keypoints[o[v]], pc.keypoints[s[v]],
                p.inlier_threshold)
            if R is None or inl.sum() < 3:
                continue
            v = v[inl]          # the RANSAC-consistent cluster subset
            inst_obj = self.model.keypoints[o[v]] @ R.T + t
            inst_scene = pc.keypoints[s[v]]
            Ri, ti, converged, _fit = icp_point_to_point(
                inst_obj, inst_scene,
                max_iterations=p.icp_max_iterations,
                max_corr_dist=p.icp_max_corr_dist)
            if not converged:
                continue
            hyps.append((v, inst_obj @ Ri.T + ti))
        if not hyps:
            return []

        if use_global_hv:
            # scene cloud for HV: PCL's HypothesisVerification voxel-
            # downsamples the scene to resolution_ in initialize() before the
            # cost model runs (the reference passes the full scene at
            # global_hv.cpp:491 and PCL downsamples internally); a stride cap
            # bounds the host-side O(S*M) distance work on huge scenes
            scene = voxel_downsample(np.asarray(cloud.xyz, np.float64),
                                     p.hv_resolution)
            if len(scene) > 20000:
                scene = scene[:: int(np.ceil(len(scene) / 20000))]
            # scene normals for the clutter smooth-surface gating: the
            # reference passes setRadiusNormals(fp::normal_radius) so PCL
            # computes them internally (runGlobalHV,
            # pipeline_building_blocks.cpp:676); rides the jitted stage
            import jax.numpy as jnp
            from ..ops.normals import compute_normals
            sj = jnp.asarray(scene, jnp.float32)
            nrm = np.asarray(compute_normals(
                sj, jnp.ones(len(scene), bool), p.normal_radius,
                method=0).normals, np.float64)
            mask = run_global_hv(
                np.asarray(scene, np.float64),
                [reg for _, reg in hyps],
                inlier_threshold=p.hv_inlier_threshold,
                occlusion_threshold=p.hv_occlusion_threshold,
                regularizer=p.hv_regularizer,
                clutter_regularizer=p.hv_clutter_regularizer,
                radius_clutter=p.hv_radius_clutter,
                detect_clutter=p.hv_detect_clutter,
                scene_normals=nrm)
        else:
            mask = [True] * len(hyps)

        out = []
        for keep, (v, _reg) in zip(mask, hyps):
            if not keep:
                continue
            hyp = generate_classification_hypotheses(
                [np.arange(len(v))], cls[v])
            if not hyp:
                continue
            c, w = hyp[0]
            # position: centroid of the cluster's scene keypoints
            # (findClassAndPointsFromCorrespondences + compute3DCentroid,
            # global_hv.cpp:506-520 with use_object_points=false)
            out.append((c, w, pc.keypoints[s[v]].mean(axis=0)))
        out.sort(key=lambda r: -r[1])
        return out
