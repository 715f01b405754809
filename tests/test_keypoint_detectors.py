"""Harris3D / ISS3D / SIFT3D keypoint detectors
(reference keypoints/keypoints_{harris3d,iss3d,sift3d}.cpp)."""
import numpy as np

import shapes
from point_cloud_donkey_tpu.models.keypoints import (KeypointParams,
                                                     detect_keypoints)


def _box(n=1500, seed=0):
    return np.asarray(shapes.box(np.random.default_rng(seed), n), np.float32)


def test_harris3d_finds_corners():
    pts = _box()
    p = KeypointParams(type="Harris3D", radius=0.3, harris_threshold=1e-4)
    kp = detect_keypoints(pts, None, None, p)
    assert 1 <= len(kp) <= 30
    # box extents (shapes.box: a=1.4, b=0.9, c=0.5 -> half 0.7/0.45/0.25);
    # corners are where all three coords are near the extents
    ratio = np.abs(kp) / np.array([0.7, 0.45, 0.25])
    assert np.all(ratio.max(axis=1) > 0.8)   # on/near the surface extremes


def test_harris3d_threshold_monotone():
    pts = _box()
    lo = detect_keypoints(pts, None, None, KeypointParams(
        type="Harris3D", radius=0.3, harris_threshold=1e-6))
    hi = detect_keypoints(pts, None, None, KeypointParams(
        type="Harris3D", radius=0.3, harris_threshold=1e-2))
    assert len(hi) <= len(lo)


def test_iss3d_nms_radius():
    pts = _box()
    small = detect_keypoints(pts, None, None, KeypointParams(
        type="ISS3D", iss_salient_radius=0.4, iss_nonmax_radius=0.1))
    large = detect_keypoints(pts, None, None, KeypointParams(
        type="ISS3D", iss_salient_radius=0.4, iss_nonmax_radius=0.5))
    assert len(large) <= len(small)
    assert len(small) >= 1
    # NMS guarantees pairwise separation >= nonmax radius... for the winner
    # set under equal saliency ties this can degenerate, so check the median
    if len(large) > 1:
        d = np.linalg.norm(large[:, None] - large[None, :], axis=-1)
        d = d[d > 0]
        assert np.median(d) > 0.25


def test_sift3d_on_curvature_field():
    pts = _box()
    p = KeypointParams(type="SIFT3D", radius=0.15)
    kp = detect_keypoints(pts, None, None, p)
    assert len(kp) >= 1
    # curvature extrema of a box live at edges/corners
    ratio = np.abs(kp) / np.array([0.7, 0.45, 0.25])
    assert np.all(ratio.max(axis=1) > 0.7)


def test_detector_in_full_pipeline():
    # Harris3D keypoints driving the whole local-feature pipeline
    from point_cloud_donkey_tpu.models.features import (FeatureConfig,
                                                        extract_local_features)
    from point_cloud_donkey_tpu.utils.config import ComponentConfig
    pts = _box()
    fcfg = FeatureConfig(type="SHOT", radius=0.6, ref_frame_radius=0.5)
    kp_cfg = ComponentConfig(type="Harris3D",
                             params={"Radius": 0.3, "Threshold": 1e-4})
    fs = extract_local_features(pts, None, fcfg, kp_cfg, 0.25, 1)
    assert fs.descriptors.shape[0] >= 1
    assert np.all(np.isfinite(fs.descriptors))
