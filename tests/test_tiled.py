"""Tiled (scene-scale) kernels == dense kernels, up to fp summation order.

The windowed formulation (ops/tiled.py) provably covers every in-radius
neighbor, so all results must match the dense [Q, N] path to fp tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import point_cloud_donkey_tpu.ops.tiled as tl
from point_cloud_donkey_tpu.ops.neighbors import (gather_radius_neighbors,
                                                  radius_covariance)
from point_cloud_donkey_tpu.ops.normals import compute_normals


def _cloud(n=3000, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts *= np.array([1.5, 1.0, 0.6], np.float32)
    pts += rng.normal(scale=0.01, size=pts.shape).astype(np.float32)
    order = np.argsort(pts[:, 0], kind="stable")
    return pts[order]


def _pad(pts, bucket):
    n = len(pts)
    out = np.full((bucket, 3), 1e9, np.float32)
    out[:n] = pts
    mask = np.zeros(bucket, bool)
    mask[:n] = True
    return out, mask


RADIUS = 0.35


def test_plan_tiles_covers_radius():
    pts = _cloud()
    p, m = _pad(pts, 3072)
    plan = tl.plan_tiles(p[:, 0], m, p[:, 0], RADIUS, chunk=512,
                         min_window=256)
    assert plan.n_chunks == 6
    # every chunk's window must contain all points within RADIUS along x
    for c in range(plan.n_chunks):
        q = p[c * 512:(c + 1) * 512]
        qv = m[c * 512:(c + 1) * 512]
        if not qv.any():
            continue
        lo, hi = q[qv, 0].min() - RADIUS, q[qv, 0].max() + RADIUS
        inside = np.nonzero((p[:, 0] >= lo) & (p[:, 0] <= hi) & m)[0]
        s = plan.starts[c]
        assert inside.min() >= s and inside.max() < s + plan.window


def test_tiled_moments_match_dense():
    pts = _cloud()
    p, m = _pad(pts, 3072)
    plan = tl.plan_tiles(p[:, 0], m, p[:, 0], RADIUS, chunk=512,
                         min_window=256)
    tiled = tl.tiled_radius_moments(jnp.asarray(p), jnp.asarray(p),
                                    jnp.asarray(m), plan, RADIUS,
                                    weighting="shot", center="query")
    dense = radius_covariance(jnp.asarray(p), jnp.asarray(p), jnp.asarray(m),
                              RADIUS, weighting="shot", center="query")
    np.testing.assert_array_equal(np.asarray(tiled.count)[m],
                                  np.asarray(dense.count)[m])
    np.testing.assert_allclose(np.asarray(tiled.cov)[m],
                               np.asarray(dense.cov)[m], rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(tiled.mean)[m],
                               np.asarray(dense.mean)[m], rtol=1e-4, atol=1e-5)


def test_tiled_gather_matches_dense():
    pts = _cloud()
    p, m = _pad(pts, 3072)
    plan = tl.plan_tiles(p[:, 0], m, p[:, 0], RADIUS, chunk=512,
                         min_window=256)
    cap = 64
    t = tl.tiled_gather_radius_neighbors(jnp.asarray(p), jnp.asarray(p),
                                         jnp.asarray(m), plan, RADIUS, cap)
    d = gather_radius_neighbors(jnp.asarray(p), jnp.asarray(p),
                                jnp.asarray(m), RADIUS, cap)
    tv, dv = np.asarray(t.valid), np.asarray(d.valid)
    np.testing.assert_array_equal(tv[m], dv[m])
    # same neighbor sets per query (order can differ on exact distance ties)
    ti, di = np.asarray(t.idx), np.asarray(d.idx)
    for q in np.nonzero(m)[0][::37]:
        assert set(ti[q][tv[q]]) == set(di[q][dv[q]])
    np.testing.assert_allclose(np.sort(np.where(tv, np.asarray(t.dist), 0), 1),
                               np.sort(np.where(dv, np.asarray(d.dist), 0), 1),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("method", [0, 1, 2])
def test_tiled_normals_match_dense(method):
    pts = _cloud()
    p, m = _pad(pts, 3072)
    plan = tl.plan_tiles(p[:, 0], m, p[:, 0], RADIUS, chunk=512,
                         min_window=256)
    t = tl.tiled_compute_normals(p, m, plan, RADIUS, method)
    d = compute_normals(jnp.asarray(p), jnp.asarray(m), RADIUS, method)
    tn, dn = np.asarray(t.normals)[m], np.asarray(d.normals)[m]
    # eigenvectors may flip sign when near-ties reorder; compare directions
    dots = np.abs(np.sum(tn * dn, axis=1))
    assert np.mean(dots > 0.999) > 0.995
    np.testing.assert_allclose(np.asarray(t.curvature)[m],
                               np.asarray(d.curvature)[m],
                               rtol=5e-3, atol=5e-5)


def test_tiled_preprocess_match_dense():
    from point_cloud_donkey_tpu.ops import preprocess as pp
    pts = _cloud(2000, seed=5)
    # inject outliers
    pts[::97] += 3.0
    order = np.argsort(pts[:, 0], kind="stable")
    pts = pts[order]
    p, m = _pad(pts, 2048)
    pj, mj = jnp.asarray(p), jnp.asarray(m)

    plan0 = tl.plan_tiles(p[:, 0], m, p[:, 0], 0.0, 512, min_window=2048)
    t_sor = np.asarray(tl.tiled_statistical_outlier_removal(pj, mj, plan0, 10, 1.0))
    d_sor = np.asarray(pp.statistical_outlier_removal(pj, mj, 10, 1.0))
    # window == full cloud here -> identical
    np.testing.assert_array_equal(t_sor, d_sor)

    plan = tl.plan_tiles(p[:, 0], m, p[:, 0], 0.2, 512, min_window=256)
    t_ror = np.asarray(tl.tiled_radius_outlier_removal(pj, mj, plan, 0.2, 5))
    d_ror = np.asarray(pp.radius_outlier_removal(pj, mj, 0.2, 5))
    np.testing.assert_array_equal(t_ror, d_ror)

    t_mls = np.asarray(tl.tiled_mls_smooth(pj, mj, plan, 0.2))
    d_mls = np.asarray(pp.mls_smooth(pj, mj, 0.2))
    np.testing.assert_allclose(t_mls[m], d_mls[m], rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_scene_scale_detection(tmp_path):
    """End-to-end detection on a >32k-point composed scene takes the tiled
    path (real SCENE_TILE_THRESHOLD) and still finds the objects -- the
    capability the reference exercises on RGB-D scene datasets
    (implicit_shape_model.cpp:739-821)."""
    import json
    import shapes
    from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
    from point_cloud_donkey_tpu.utils.config import IsmConfig
    from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd

    rng = np.random.default_rng(11)
    config = {
        "ObjectConfig": {
            "Children": {
                "Clustering": {"Type": "None"},
                "Codebook": {"Children": {"ActivationStrategy": {
                    "Parameters": {"K": 1}, "Type": "KNN"}}},
                "FeatureWeighting": {"Type": "Uniform"},
                "Features": {"Parameters": {
                    "Radius": 0.6, "ReferenceFrameRadius": 0.5},
                    "Type": "SHORT_SHOT"},
                "GlobalFeatures": {"Type": "Dummy"},
                "Keypoints": {"Parameters": {"LeafSize": 0.3},
                              "Type": "VoxelGrid"},
                "Voting": {"Parameters": {
                    "Bandwidth": 0.6, "SingleObjectMode": False,
                    "MinThreshold": -0.4, "MaxFilterType": "Merge",
                    "MinVotesThreshold": 3}, "Type": "MeanShift"},
            },
            "Parameters": {"DistanceType": "ChiSquared",
                           "BoundingBoxType": "AABB"},
        }
    }
    ism = ImplicitShapeModel(IsmConfig.from_json(config))
    for cid in (1, 2):
        for j in range(2):
            pts = shapes.make_instance(rng, cid, n=900, rotate=False)
            p = str(tmp_path / f"m_{cid}_{j}.pcd")
            save_pcd(p, PointCloud(xyz=pts))
            ism.add_training_model(p, cid, cid)
    ism.train()

    # scene: dense ground plane + box + torus + clutter, > tile threshold
    n_plane = 36000
    plane = np.stack([rng.uniform(-6, 6, n_plane),
                      rng.uniform(-6, 6, n_plane),
                      rng.normal(0, 0.01, n_plane)], 1).astype(np.float32)
    box_pts = shapes.make_instance(rng, 1, n=2500, rotate=False) + \
        np.array([-2.5, 0, 1.0], np.float32)
    torus_pts = shapes.make_instance(rng, 2, n=2500, rotate=False) + \
        np.array([2.5, 0, 1.0], np.float32)
    scene = np.concatenate([plane, box_pts, torus_pts]).astype(np.float32)
    assert len(scene) > tl.SCENE_TILE_THRESHOLD

    maxima, times = ism.detect(scene)
    assert maxima, "no maxima on the scene"
    found = {}
    for m in maxima:
        for cid, gt in ((1, box_pts.mean(0)), (2, torus_pts.mean(0))):
            if m.class_id == cid and np.linalg.norm(m.position - gt) < 0.9:
                found[cid] = True
    assert found.get(1) and found.get(2), \
        [(m.class_id, m.position, m.weight) for m in maxima[:6]]


def test_scene_feature_path_matches_dense(monkeypatch):
    """extract_local_features via the tiled scene path == the dense path."""
    from point_cloud_donkey_tpu.models.features import (FeatureConfig,
                                                        extract_local_features)
    from point_cloud_donkey_tpu.utils.config import ComponentConfig

    pts = _cloud(2500, seed=7)
    fcfg = FeatureConfig(type="SHOT", radius=0.4, ref_frame_radius=0.3,
                         neighbor_capacity=128)
    kp_cfg = ComponentConfig(type="VoxelGrid", params={"LeafSize": 0.25})

    dense = extract_local_features(pts, None, fcfg, kp_cfg, 0.2, 1)

    monkeypatch.setattr(tl, "SCENE_TILE_THRESHOLD", 512)
    monkeypatch.setattr(tl, "NORMALS_CHUNK", 512)
    monkeypatch.setattr(tl, "KEYPOINT_CHUNK", 64)
    tiled = extract_local_features(pts, None, fcfg, kp_cfg, 0.2, 1)

    assert dense.descriptors.shape == tiled.descriptors.shape
    # match keypoints by position (scene path reorders along the sort axis)
    dpos = {tuple(np.round(p, 5)): i for i, p in enumerate(dense.positions)}
    hits = 0
    for j, p in enumerate(tiled.positions):
        i = dpos.get(tuple(np.round(p, 5)))
        if i is None:
            continue
        hits += 1
        np.testing.assert_allclose(tiled.descriptors[j], dense.descriptors[i],
                                   rtol=5e-3, atol=1e-4)
    assert hits >= 0.98 * len(tiled.positions)


@pytest.mark.parametrize("kp_cfg_dict", [
    {"type": "ISS3D", "params": {"SalientRadius": 0.3, "NonMaxRadius": 0.2,
                                 "MinNeighbors": 4}},
    {"type": "VoxelGridCulling", "params": {
        "LeafSize": 0.25, "FilterMethodGeometry": "KPQ",
        "FilterTypeGeometry": "CutOff", "FilterCutoffRatio": 0.5,
        "DisableFilterInTraining": False}},
], ids=["iss3d", "kpq-culling"])
def test_scene_pipeline_reaches_tiled_keypoints(monkeypatch, kp_cfg_dict):
    """The scene PIPELINE (extract_local_features > threshold) must route
    ISS3D and VoxelGridCulling through the tiled keypoint paths end-to-end,
    not just detect_keypoints called directly (regression: the scene
    extractor used to reject non-voxel types before the tiled detectors
    could run)."""
    from point_cloud_donkey_tpu.models.features import (FeatureConfig,
                                                        extract_local_features)
    from point_cloud_donkey_tpu.utils.config import ComponentConfig

    pts = _cloud(2500, seed=7)
    fcfg = FeatureConfig(type="SHORT_SHOT", radius=0.4, ref_frame_radius=0.3,
                         neighbor_capacity=128)
    kp_cfg = ComponentConfig(type=kp_cfg_dict["type"],
                             params=kp_cfg_dict["params"])

    dense = extract_local_features(pts, None, fcfg, kp_cfg, 0.2, 1)

    monkeypatch.setattr(tl, "SCENE_TILE_THRESHOLD", 512)
    monkeypatch.setattr(tl, "KEYPOINT_CHUNK", 64)
    tiled = extract_local_features(pts, None, fcfg, kp_cfg, 0.2, 1)

    assert int(tiled.mask.sum()) > 3
    dpos = {tuple(np.round(p, 5)): i for i, p in enumerate(dense.positions)}
    hits = 0
    checked = 0
    for j, p in enumerate(tiled.positions):
        if not tiled.mask[j]:
            continue
        checked += 1
        i = dpos.get(tuple(np.round(p, 5)))
        if i is None:
            continue
        hits += 1
        np.testing.assert_allclose(tiled.descriptors[j], dense.descriptors[i],
                                   rtol=5e-3, atol=1e-4)
    assert hits >= 0.95 * checked
