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
def cloud(rng):
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
    """ESF/VFH must distinguish a box from a torus."""
    for dtype in ("ESF", "VFH", "GASD"):
        fcfg = FeatureConfig(type=dtype, radius=0.2,
                             gasd_with_color=False)
        descs = {}
        for cid in (1, 2):
            ds = []
            for _ in range(2):
                pts = shapes.make_instance(rng, cid, n=700, rotate=False)
                gfs = extract_global_features(pts.astype(np.float32), None,
                                              fcfg, 0.25, 1)
                ds.append(gfs.descriptors[0])
            descs[cid] = ds
        intra = np.linalg.norm(descs[1][0] - descs[1][1])
        inter = np.linalg.norm(descs[1][0] - descs[2][0])
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
