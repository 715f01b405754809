"""The wider descriptor zoo: BSHOT, SpinImage, PFH, ESF, VFH, GRSD, GASD."""
import numpy as np
import jax.numpy as jnp
import pytest

import shapes
from point_cloud_donkey_tpu.models.features import (FeatureConfig,
                                                    extract_global_features,
                                                    extract_local_features)
from point_cloud_donkey_tpu.utils.config import ComponentConfig


@pytest.fixture(scope="module")
def cloud():
    pts = shapes.make_instance(np.random.default_rng(3), 1, n=800, rotate=False)
    rgb = np.full((800, 3), 0.5, np.float32)
    rgb[pts[:, 0] > 0] = [0.8, 0.2, 0.2]
    return pts.astype(np.float32), rgb


KP_CFG = ComponentConfig(type="VoxelGrid", params={"LeafSize": 0.35})


@pytest.mark.parametrize("dtype,dim", [
    ("BSHOT", 352), ("SpinImage", 153), ("PFH", 125)])
def test_local_descriptor_zoo(cloud, dtype, dim):
    pts, rgb = cloud
    fcfg = FeatureConfig(type=dtype, radius=0.6, ref_frame_radius=0.5)
    fs = extract_local_features(pts, None, fcfg, KP_CFG, 0.25, 1)
    assert fs.descriptors.shape[1] == dim == fcfg.descriptor_dim()
    assert fs.descriptors.shape[0] > 10
    assert np.all(np.isfinite(fs.descriptors))
    if dtype == "BSHOT":
        assert set(np.unique(fs.descriptors)) <= {0.0, 1.0}
    if dtype == "PFH":
        np.testing.assert_allclose(fs.descriptors.sum(1), 100.0, rtol=1e-3)


@pytest.mark.parametrize("dtype", ["ESF", "VFH", "GRSD", "GASD"])
def test_global_descriptor_zoo(cloud, dtype):
    pts, rgb = cloud
    fcfg = FeatureConfig(type=dtype, radius=0.2)
    gfs = extract_global_features(pts, None, fcfg, 0.25, 1, rgb=rgb)
    assert gfs.descriptors.shape == (1, fcfg.descriptor_dim())
    assert np.all(np.isfinite(gfs.descriptors))
    assert gfs.descriptors.sum() > 0


def test_global_descriptors_separate_shapes(rng):
    """ESF/VFH must distinguish a box from a torus: mean cross-class
    distance above mean within-class distance over a few noisy instances
    (single-pair margins are noise-dominated for histogram descriptors)."""
    for dtype in ("ESF", "VFH", "GASD"):
        fcfg = FeatureConfig(type=dtype, radius=0.2,
                             gasd_with_color=False)
        descs = {}
        for cid in (1, 2):
            ds = []
            for _ in range(3):
                pts = shapes.make_instance(rng, cid, n=900, rotate=False)
                gfs = extract_global_features(pts.astype(np.float32), None,
                                              fcfg, 0.25, 1)
                ds.append(gfs.descriptors[0])
            descs[cid] = ds
        intra = np.mean([np.linalg.norm(a - b)
                         for c in (1, 2)
                         for i, a in enumerate(descs[c])
                         for b in descs[c][i + 1:]])
        inter = np.mean([np.linalg.norm(a - b)
                         for a in descs[1] for b in descs[2]])
        assert inter > intra, f"{dtype}: inter {inter} <= intra {intra}"


def test_gasd_color_sensitivity(cloud):
    pts, rgb = cloud
    fcfg = FeatureConfig(type="GASD", gasd_with_color=True)
    d1 = extract_global_features(pts, None, fcfg, 0.25, 1, rgb=rgb).descriptors
    # hue histograms can't see achromatic colors (gray -> hue 0 like red),
    # so compare against a blue variant instead
    blue = rgb[:, ::-1].copy()
    d2 = extract_global_features(pts, None, fcfg, 0.25, 1, rgb=blue).descriptors
    assert d1.shape == (1, 984)
    np.testing.assert_allclose(d1[0, :216], d2[0, :216], atol=1e-6)  # shape part equal
    assert np.abs(d1[0, 216:] - d2[0, 216:]).max() > 1e-3  # color part differs


@pytest.mark.parametrize("dtype,dim", [("3DSC", 1980), ("USC", 1980),
                                       ("RSD", 25), ("RIFT", 32)])
def test_shape_context_family(cloud, dtype, dim):
    pts, rgb = cloud
    fcfg = FeatureConfig(type=dtype, radius=0.6, ref_frame_radius=0.5)
    fs = extract_local_features(pts, None, fcfg, KP_CFG, 0.25, 1,
                                rgb=rgb if dtype == "RIFT" else None)
    assert fs.descriptors.shape[1] == dim == fcfg.descriptor_dim()
    assert fs.descriptors.shape[0] > 5
    assert np.all(np.isfinite(fs.descriptors))
    assert fs.descriptors.sum() != 0


def test_rsd_two_value_variant(cloud):
    pts, rgb = cloud
    fcfg = FeatureConfig(type="RSD", radius=0.6, rsd_use_hist=False)
    fs = extract_local_features(pts, None, fcfg, KP_CFG, 0.25, 1)
    assert fs.descriptors.shape[1] == 2
    # r_min <= r_max
    assert np.all(fs.descriptors[:, 0] <= fs.descriptors[:, 1] + 1e-5)


def test_rift_color_gradient_sensitivity(rng):
    """RIFT must respond to intensity edges."""
    pts = shapes.make_instance(np.random.default_rng(5), 1, n=800, rotate=False).astype(np.float32)
    rgb_flat = np.full((800, 3), 0.5, np.float32)
    rgb_edge = rgb_flat.copy()
    rgb_edge[pts[:, 0] > 0] = 0.9
    fcfg = FeatureConfig(type="RIFT", radius=0.6)
    d_flat = extract_local_features(pts, None, fcfg, KP_CFG, 0.25, 1, rgb=rgb_flat)
    d_edge = extract_local_features(pts, None, fcfg, KP_CFG, 0.25, 1, rgb=rgb_edge)
    # flat intensity -> zero gradients -> empty histograms
    assert d_flat.descriptors.sum() < 1e-3
    assert d_edge.descriptors.sum() > 0.5


@pytest.mark.parametrize("rf", ["SHOT", "SHOTNA", "BOARD", "FLARE"])
def test_reference_frame_types(cloud, rf):
    pts, rgb = cloud
    fcfg = FeatureConfig(type="SHOT", radius=0.6, ref_frame_radius=0.5,
                         ref_frame_type=rf)
    fs = extract_local_features(pts, None, fcfg, KP_CFG, 0.25, 1)
    assert fs.descriptors.shape[0] > 5, rf
    assert np.all(np.isfinite(fs.descriptors))
    # frames orthonormal
    F = fs.frames
    eye = np.einsum("kij,klj->kil", F, F)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-3)


def test_cospair(cloud):
    pts, rgb = cloud
    fcfg = FeatureConfig(type="COSPAIR", radius=0.6, ref_frame_radius=0.5)
    fs = extract_local_features(pts, None, fcfg, KP_CFG, 0.25, 1, rgb=rgb)
    assert fs.descriptors.shape[1] == 378
    assert fs.descriptors.shape[0] > 5
    assert np.all(np.isfinite(fs.descriptors)) and fs.descriptors.sum() > 0


def test_short_shot_pcl(cloud):
    pts, rgb = cloud
    fcfg = FeatureConfig(type="SHORT_SHOT_PCL", radius=0.6, ref_frame_radius=0.5)
    fs = extract_local_features(pts, None, fcfg, KP_CFG, 0.25, 1)
    assert fs.descriptors.shape[1] == 352
    assert np.all(np.isfinite(fs.descriptors))


def _box_faces(n=1200, seed=0):
    rng = np.random.default_rng(seed)
    face = rng.integers(0, 6, n)
    uv = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    pts = np.zeros((n, 3), np.float32)
    for f in range(6):
        m = face == f
        ax = f // 2
        o = [a for a in range(3) if a != ax]
        pts[m, ax] = 1.0 if f % 2 == 0 else -1.0
        pts[m, o[0]] = uv[m, 0]
        pts[m, o[1]] = uv[m, 1]
    return pts


def test_cvfh_clusters_box_faces():
    pts = _box_faces()
    fcfg = FeatureConfig(type="CVFH", cvfh_cluster_tolerance=0.35,
                         cvfh_min_points=30)
    fs = extract_global_features(pts, None, fcfg, 0.4, 1)
    # the box's six flat faces are six smooth regions -> six descriptors
    assert fs.descriptors.shape == (6, 308)
    assert np.all(np.isfinite(fs.descriptors))
    # raw counts (NormalizeBins false): every angle histogram sums to N
    assert np.allclose(fs.descriptors[:, :45].sum(axis=1), len(pts))


def test_ourcvfh_sgurf_frames():
    pts = _box_faces()
    fcfg = FeatureConfig(type="OURCVFH", cvfh_cluster_tolerance=0.35,
                         cvfh_min_points=30)
    fs = extract_global_features(pts, None, fcfg, 0.4, 1)
    # >= one descriptor per face; ambiguous SGURF frames may add more
    assert fs.descriptors.shape[0] >= 6
    assert fs.descriptors.shape[1] == 308
    # shape distribution lives in the viewpoint slots: 104 used, tail zero
    assert np.all(fs.descriptors[:, 4 * 45 + 104:] == 0.0)
    assert np.all(fs.descriptors[:, 4 * 45:4 * 45 + 104].sum(axis=1) > 0)


def test_cvfh_fallback_single_region():
    # an ellipsoid has no flat region under a tight angle threshold ->
    # PCL falls back to one whole-cloud VFH
    pts = np.asarray(shapes.ellipsoid(np.random.default_rng(1), 800),
                 dtype=np.float32)
    fcfg = FeatureConfig(type="CVFH", cvfh_cluster_tolerance=0.02,
                         cvfh_min_points=700)
    fs = extract_global_features(pts, None, fcfg, 0.4, 1)
    assert fs.descriptors.shape == (1, 308)


def test_rops(cloud):
    pts, rgb = cloud
    fcfg = FeatureConfig(type="RoPS", radius=0.6, ref_frame_radius=0.5)
    fs = extract_local_features(pts, None, fcfg, KP_CFG, 0.25, 1)
    d = fs.descriptors
    assert d.shape[1] == 135
    assert np.all(np.isfinite(d))
    # entropy slots (every 5th element, offset 4) are positive for real
    # neighborhoods; moment slots are small but not all zero
    assert np.all(d[:, 4::5] > 0)
    assert np.abs(d[:, 0::5]).sum() > 0


def test_rops_rotation_invariance():
    import jax.numpy as jnp
    from point_cloud_donkey_tpu.ops.rops import rops_descriptor
    from point_cloud_donkey_tpu.ops.neighbors import gather_radius_neighbors
    rng = np.random.default_rng(3)
    pts = np.asarray(shapes.ellipsoid(rng, 1200), dtype=np.float32)
    kp = pts[:8].copy()
    R = np.asarray(shapes.random_rotation(np.random.default_rng(7)), np.float32)

    def run(p, k):
        pj, kj = jnp.asarray(p), jnp.asarray(k)
        m = jnp.ones(len(p), bool)
        nbr = gather_radius_neighbors(kj, pj, m, 0.6, 256)
        return np.asarray(rops_descriptor(
            kj, jnp.ones(len(k), bool), pj, nbr, 0.6).descriptors)

    d0 = run(pts, kp)
    d1 = run(pts @ R.T, kp @ R.T)
    # the LRF makes RoPS rotation-invariant; allow a few keypoints where the
    # majority-sign disambiguation tips the other way on near-symmetric spots
    err = np.abs(d0 - d1).max(axis=1)
    assert np.median(err) < 1e-3
    assert (err < 1e-2).sum() >= 6


def test_narf_on_depth_scene():
    # a synthetic depth scene: a wall at z=2.5 with a box sticking out --
    # the box edges are range discontinuities where NARF finds keypoints
    # organized-style dense sampling so the range image actually fills
    gx, gy = np.meshgrid(np.linspace(-1.2, 1.2, 180),
                         np.linspace(-0.9, 0.9, 140))
    wall = np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, 2.5)], axis=1)
    bx, by = np.meshgrid(np.linspace(-0.3, 0.3, 70),
                         np.linspace(-0.25, 0.25, 60))
    box = np.stack([bx.ravel(), by.ravel(), np.full(bx.size, 1.8)], axis=1)
    pts = np.concatenate([wall, box]).astype(np.float32)
    fcfg = FeatureConfig(type="NARF", radius=0.4, narf_image_width=160,
                         narf_image_height=120, narf_focal=130.0)
    fs = extract_local_features(pts, None, fcfg, KP_CFG, 0.25, 1)
    assert fs.descriptors.shape[1] == 36
    assert fs.descriptors.shape[0] > 0
    assert np.all(np.isfinite(fs.descriptors))
    assert np.all(np.abs(fs.descriptors) <= 0.5)
    # rotation invariance: beam 0 carries the dominant response
    assert np.allclose(np.abs(fs.descriptors).max(axis=1),
                       np.abs(fs.descriptors[:, 0]))
    # keypoints sit near the box edge depth range
    z = fs.positions[:, 2]
    assert np.all((z > 1.5) & (z < 2.7))


def test_esf_local_descriptor(cloud):
    """ESF_LOCAL: one 640-D ESF per keypoint neighborhood
    (features_esf_local.cpp:36-83)."""
    pts, rgb = cloud
    fcfg = FeatureConfig(type="ESF_LOCAL", radius=0.6, ref_frame_radius=0.5,
                         neighbor_capacity=256)
    fs = extract_local_features(pts, None, fcfg, KP_CFG, 0.25, 1)
    assert fs.descriptors.shape[1] == 640 == fcfg.descriptor_dim()
    assert fs.descriptors.shape[0] > 10
    assert np.all(np.isfinite(fs.descriptors))
    # each row is a normalized histogram
    np.testing.assert_allclose(fs.descriptors.sum(1), 1.0, rtol=1e-3)
    # neighborhoods differ -> descriptors differ
    assert np.std(fs.descriptors, axis=0).max() > 1e-4


def test_gasd_local_descriptor(cloud):
    """GASD as the *local* feature type: one whole-cloud descriptor assigned
    the first valid keypoint's position/LRF (features.cpp:98-115,
    features_factory.h:104-105)."""
    pts, rgb = cloud
    fcfg = FeatureConfig(type="GASD", gasd_with_color=True)
    fs = extract_local_features(pts, None, fcfg, KP_CFG, 0.25, 1, rgb=rgb)
    assert fs.descriptors.shape == (1, 984)
    assert np.all(np.isfinite(fs.descriptors))
    # position is a keypoint of the cloud, not the origin
    assert np.linalg.norm(fs.positions[0]) < 1e6
    # frame is a rotation matrix
    F = fs.frames[0]
    np.testing.assert_allclose(F @ F.T, np.eye(3), atol=1e-4)

    fcfg = FeatureConfig(type="GASD", gasd_with_color=False)
    fs = extract_local_features(pts, None, fcfg, KP_CFG, 0.25, 1)
    assert fs.descriptors.shape == (1, 512)
