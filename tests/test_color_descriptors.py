"""CSHOT and SHORT_CSHOT color descriptors."""
import numpy as np
import jax.numpy as jnp
import pytest

import shapes
from point_cloud_donkey_tpu.ops.lrf import shot_lrf
from point_cloud_donkey_tpu.ops.neighbors import gather_radius_neighbors
from point_cloud_donkey_tpu.ops.shot import cshot_descriptor, shot_descriptor, CSHOT_LEN
from point_cloud_donkey_tpu.ops.short_shot import short_cshot_descriptor
from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
from point_cloud_donkey_tpu.utils.config import IsmConfig
from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd


def setup_cloud(rng, n=900):
    pts = shapes.make_instance(rng, 1, n=n, rotate=False)  # box
    # color: one face red-ish, rest gray (position-dependent)
    rgb = np.full((n, 3), 0.5, np.float32)
    rgb[pts[:, 0] > 0.3] = [0.9, 0.1, 0.1]
    normals = pts / np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-6)
    return pts.astype(np.float32), rgb, normals.astype(np.float32)


def compute(pts, rgb, normals, fn, **kw):
    mask = np.ones(len(pts), bool)
    kp = pts[:12]
    kmask = np.ones(12, bool)
    lrf = shot_lrf(jnp.asarray(kp), jnp.asarray(kmask), jnp.asarray(pts),
                   jnp.asarray(mask), 0.5)
    nbr = gather_radius_neighbors(jnp.asarray(kp), jnp.asarray(pts),
                                  jnp.asarray(mask), 0.6, capacity=len(pts))
    return fn(kp=kp, lrf=lrf, nbr=nbr, pts=pts, rgb=rgb, normals=normals, **kw)


def test_cshot_shape_channel_matches_shot(rng):
    pts, rgb, normals = setup_cloud(rng)
    def run_cshot(kp, lrf, nbr, pts, rgb, normals):
        return cshot_descriptor(jnp.asarray(kp), jnp.asarray(rgb[:12]),
                                lrf.frames, lrf.valid, jnp.asarray(pts),
                                jnp.asarray(normals), jnp.asarray(rgb), nbr, 0.6)
    def run_shot(kp, lrf, nbr, pts, rgb, normals):
        return shot_descriptor(jnp.asarray(kp), lrf.frames, lrf.valid,
                               jnp.asarray(pts), jnp.asarray(normals), nbr, 0.6)
    rc = compute(pts, rgb, normals, run_cshot)
    rs = compute(pts, rgb, normals, run_shot)
    D = np.asarray(rc.descriptors)
    assert D.shape == (12, CSHOT_LEN)
    np.testing.assert_allclose(np.linalg.norm(D, axis=1), 1.0, atol=1e-4)
    # the shape channel (first 352 dims) must be proportional to plain SHOT
    shape_part = D[:, :352]
    s = np.asarray(rs.descriptors)
    for i in range(12):
        n1 = np.linalg.norm(shape_part[i])
        if n1 > 1e-5:
            np.testing.assert_allclose(shape_part[i] / n1, s[i],
                                       rtol=2e-2, atol=2e-3)


def test_cshot_color_sensitivity(rng):
    """Identical geometry, different colors -> different color channel."""
    pts, rgb, normals = setup_cloud(rng)
    gray = np.full_like(rgb, 0.5)
    def run(colors):
        def f(kp, lrf, nbr, pts, rgb, normals):
            return cshot_descriptor(jnp.asarray(kp), jnp.asarray(colors[:12]),
                                    lrf.frames, lrf.valid, jnp.asarray(pts),
                                    jnp.asarray(normals), jnp.asarray(colors),
                                    nbr, 0.6)
        return np.asarray(compute(pts, rgb, normals, f).descriptors)
    d1 = run(rgb)
    d2 = run(gray)
    assert np.abs(d1[:, 352:] - d2[:, 352:]).max() > 0.01


def test_short_cshot_properties(rng):
    pts, rgb, normals = setup_cloud(rng)
    def f(kp, lrf, nbr, pts, rgb, normals):
        return short_cshot_descriptor(jnp.asarray(kp), jnp.asarray(rgb[:12]),
                                      lrf.frames, lrf.valid, jnp.asarray(pts),
                                      jnp.asarray(rgb), nbr, 0.6)
    res = compute(pts, rgb, normals, f)
    D = np.asarray(res.descriptors)
    assert D.shape == (12, 32 + 32 * 15)
    np.testing.assert_allclose(np.linalg.norm(D, axis=1), 1.0, atol=1e-4)
    assert np.asarray(res.valid).any()


def test_end_to_end_cshot_classification(rng, tmp_path):
    """SHORT_CSHOT pipeline: color separates geometrically-identical classes."""
    config = {
        "ObjectConfig": {
            "Children": {
                "Clustering": {"Type": "None"},
                "Codebook": {"Children": {"ActivationStrategy": {
                    "Parameters": {"K": 1}, "Type": "KNN"}}},
                "FeatureWeighting": {"Type": "Uniform"},
                "Features": {"Parameters": {
                    "Radius": 0.6, "ReferenceFrameRadius": 0.5},
                    "Type": "SHORT_CSHOT"},
                "GlobalFeatures": {"Type": "Dummy"},
                "Keypoints": {"Parameters": {"LeafSize": 0.35}, "Type": "VoxelGrid"},
                "Voting": {"Parameters": {
                    "Bandwidth": 0.5, "SingleObjectMode": True,
                    "SingleObjectMaxType": "None"}, "Type": "MeanShift"},
            },
            "Parameters": {"DistanceType": "ChiSquared",
                           "BoundingBoxType": "AABB"},
        }
    }
    ism = ImplicitShapeModel(IsmConfig.from_json(config))
    # two classes: same box geometry, different color patterns
    for cid, color in [(0, [0.9, 0.1, 0.1]), (1, [0.1, 0.1, 0.9])]:
        pts = shapes.make_instance(rng, 1, n=800, rotate=False)
        rgb = np.full((800, 3), 0.5, np.float32)
        rgb[pts[:, 2] > 0] = color
        p = str(tmp_path / f"c{cid}.pcd")
        save_pcd(p, PointCloud(xyz=pts.astype(np.float32), rgb=rgb))
        ism.add_training_model(p, cid, cid)
    ism.train()

    correct = 0
    for cid, color in [(0, [0.9, 0.1, 0.1]), (1, [0.1, 0.1, 0.9])]:
        pts = shapes.make_instance(rng, 1, n=800, rotate=False)
        rgb = np.full((800, 3), 0.5, np.float32)
        rgb[pts[:, 2] > 0] = color
        maxima, _ = ism.detect(pts.astype(np.float32), None, rgb)
        if maxima and maxima[0].class_id == cid:
            correct += 1
    assert correct == 2, f"color classification failed: {correct}/2"
