"""Tests for the sorted-axis windowed neighbor sweeps (ops/binned.py) and
the batched windowed classify entry.

Parity contract: when the exactness flag is True the windowed sweep gates
exactly the same neighbor pairs as the dense sweep; integer counts must
match exactly, while float moments may differ in reduction order, so frame
parity is statistical (same contract as the fused Pallas kernels,
tests/test_pallas_kernels.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import shapes
from point_cloud_donkey_tpu.ops import binned
from point_cloud_donkey_tpu.ops.normals import compute_normals_fast


def _batch(rng, b=4, n=512):
    pts = np.stack([
        shapes.make_instance(rng, i % 5, n=n, rotate=True) for i in range(b)
    ]).astype(np.float32)
    mask = np.ones((b, n), bool)
    return jnp.asarray(pts), jnp.asarray(mask)


def test_sort_clouds_orders_keys_and_parks_invalid():
    rng = np.random.default_rng(0)
    pts, mask = _batch(rng, b=2, n=256)
    mask = mask.at[0, 200:].set(False)
    pts_s, mask_s, keys_s, order = binned.sort_clouds(pts, mask)
    keys = np.asarray(keys_s)
    assert (np.diff(keys, axis=1) >= 0).all()
    # invalid points sort last and carry the PARK key
    ms = np.asarray(mask_s)
    assert not ms[0, 200:].any() and ms[0, :200].all()
    assert (keys[0, 200:] == binned.PARK).all()
    # order is a permutation reproducing the sorted points
    o = np.asarray(order)
    np.testing.assert_array_equal(
        np.asarray(pts)[0][o[0]], np.asarray(pts_s)[0])


def test_window_starts_exact_flag():
    # uniformly spread keys: a window of the full array is always exact,
    # a 1-element window cannot cover radius 0.2 at this density
    keys = jnp.linspace(0.0, 1.0, 256)
    qm = jnp.ones(256, bool)
    plan = binned.window_starts(keys, qm, keys, 0.2, tile_q=64, window=256)
    assert bool(plan.exact)
    plan2 = binned.window_starts(keys, qm, keys, 0.2, tile_q=64, window=64)
    assert not bool(plan2.exact)
    assert int(plan2.span) > 64


def test_required_window_calibrates():
    rng = np.random.default_rng(1)
    pts, mask = _batch(rng, b=4, n=512)
    w = binned.required_window(pts, mask, radius=0.25, tile_q=128,
                               align=128)
    assert w % 128 == 0 and 128 <= w <= 512
    # the calibrated window must report exact on the same batch
    pts_s, mask_s, keys_s, _ = binned.sort_clouds(pts, mask)
    _, exact = binned.compute_normals_fast_windowed(
        pts_s, mask_s, keys_s, 0.25, window=w, tile_q=128)
    assert bool(exact)


def test_windowed_normals_match_dense():
    """Calibrated window -> same oriented normals as the dense fast path
    (statistical: counts gate identically, so only fp reduction order can
    flip near-degenerate signs)."""
    rng = np.random.default_rng(2)
    pts, mask = _batch(rng, b=4, n=512)
    pts_s, mask_s, keys_s, _ = binned.sort_clouds(pts, mask)
    w = binned.required_window(pts, mask, radius=0.25, tile_q=128,
                               align=128)
    nrm_w, exact = binned.compute_normals_fast_windowed(
        pts_s, mask_s, keys_s, 0.25, window=w, tile_q=128)
    assert bool(exact)
    nrm_d = jax.vmap(lambda p, m: compute_normals_fast(p, m, 0.25))(
        pts_s, mask_s)
    dots = np.asarray(jnp.sum(nrm_w * nrm_d, axis=-1))
    assert (np.abs(dots) > 0.999).mean() > 0.99   # same axis
    assert (dots > 0.999).mean() > 0.97           # same sign (near-ties may flip)


def test_windowed_normals_padding_invariance():
    rng = np.random.default_rng(3)
    pts, mask = _batch(rng, b=2, n=384)
    # pad with garbage
    pad = jnp.full((2, 128, 3), 777.0)
    pts_p = jnp.concatenate([pts, pad], axis=1)
    mask_p = jnp.concatenate([mask, jnp.zeros((2, 128), bool)], axis=1)

    s, ms, ks, _ = binned.sort_clouds(pts, mask)
    sp, msp, ksp, _ = binned.sort_clouds(pts_p, mask_p)
    # valid points sort identically (garbage parks at the end)
    np.testing.assert_allclose(np.asarray(sp[:, :384]), np.asarray(s))
    w = binned.required_window(pts, mask, radius=0.3, tile_q=128, align=128)
    n1, e1 = binned.compute_normals_fast_windowed(s, ms, ks, 0.3, w, 128)
    n2, e2 = binned.compute_normals_fast_windowed(sp, msp, ksp, 0.3, w, 128)
    assert bool(e1) and bool(e2)
    # padding changes window clamping (n=512 vs 384) and hence fp reduction
    # ranges: same statistical contract as the other parity tests -- axes
    # identical, a rare near-tie may flip sign
    dots = np.asarray(jnp.sum(n2[:, :384] * n1, axis=-1))
    assert (np.abs(dots) > 0.999).all()
    assert (dots > 0.999).mean() > 0.99


def test_windowed_lrf_counts_match_dense_gate():
    """Integer in-radius counts from the windowed sweep == dense counts
    when exact (the gate semantics are identical)."""
    from point_cloud_donkey_tpu.ops.neighbors import pairwise_sqdist
    rng = np.random.default_rng(4)
    pts, mask = _batch(rng, b=1, n=512)
    pts_s, mask_s, keys_s, _ = binned.sort_clouds(pts, mask)
    p, k, m = pts_s[0], keys_s[0], mask_s[0]
    res = binned.shot_lrf_windowed_xla(p, k, m, p, k, m, radius=0.3,
                                       window=512, tile_q=128)
    assert bool(res.exact)
    # dense gate counts
    d2 = pairwise_sqdist(p, p)
    dense_counts = np.asarray(jnp.sum((d2 <= 0.09) & m[None, :], axis=1))
    # recompute windowed counts through the public moments (via valid: the
    # <5 neighbor rule) -- use the internal path for exact counts
    from point_cloud_donkey_tpu.ops.lrf import shot_lrf
    ref = shot_lrf(p, m, p, m, 0.3)
    assert (np.asarray(res.valid) == np.asarray(ref.valid)).all()
    dots = np.asarray(jnp.sum(res.frames[:, 2] * ref.frames[:, 2], axis=-1))
    assert (np.abs(dots) > 0.999).mean() > 0.99


@pytest.fixture(scope="module")
def small_model():
    """Tiny trained codebook + jit config for the fused classify paths."""
    import os
    import tempfile

    from point_cloud_donkey_tpu.models.codebook import CodebookParams
    from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
    from point_cloud_donkey_tpu.models.pipeline_jit import JitPipelineConfig
    from point_cloud_donkey_tpu.utils.config import IsmConfig
    from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd

    config = {"ObjectConfig": {"Children": {
        "Clustering": {"Type": "None"},
        "Codebook": {"Children": {"ActivationStrategy": {
            "Parameters": {"K": 1}, "Type": "KNN"}}},
        "FeatureWeighting": {"Type": "Uniform"},
        "Features": {"Parameters": {
            "Radius": 0.6, "ReferenceFrameRadius": 0.5}, "Type": "SHOT"},
        "GlobalFeatures": {"Type": "Dummy"},
        "Keypoints": {"Parameters": {"LeafSize": 0.35}, "Type": "VoxelGrid"},
        "Voting": {"Parameters": {
            "Bandwidth": 0.5, "SingleObjectMode": True,
            "SingleObjectMaxType": "BandwidthVotes"}, "Type": "MeanShift"}},
        "Parameters": {"DistanceType": "ChiSquared", "NormalRadius": 0.25,
                       "ConsistentNormalsMethod": 2,
                       "BoundingBoxType": "AABB"}}}
    rng = np.random.default_rng(99)
    ism = ImplicitShapeModel(IsmConfig.from_json(config))
    tmp = tempfile.mkdtemp()
    for cid in range(5):
        pts = shapes.make_instance(rng, cid, n=512, rotate=False,
                                   noise=0.005)
        p = os.path.join(tmp, f"bm{cid}.pcd")
        save_pcd(p, PointCloud(xyz=pts))
        ism.add_training_model(p, cid, cid)
    ism.train()
    cb = jax.tree_util.tree_map(jnp.asarray, ism.state.codebook)
    cfg = JitPipelineConfig(
        descriptor="SHOT", radius=0.6, ref_frame_radius=0.5, leaf_size=0.35,
        normal_radius=0.25, normals_method=2, metric="chisq", knn_k=1,
        keypoint_capacity=128, neighbor_capacity=512, bandwidth=0.5,
        num_classes=5)
    return cb, cfg, CodebookParams(knn_k=1)


def test_classify_scores_batch_matches_per_cloud(small_model):
    """Batched windowed entry == vmapped dense classify on the same model
    (argmax parity; scores allclose)."""
    cb, cfg0, params = small_model
    rng = np.random.default_rng(5)
    from point_cloud_donkey_tpu.models.pipeline_jit import (
        classify_scores, classify_scores_batch)
    pts, mask = _batch(rng, b=6, n=512)
    w = binned.required_window(pts, mask, radius=cfg0.normal_radius,
                               tile_q=256, align=256)
    cfg_w = cfg0._replace(normals_window=w)
    dense = jax.jit(jax.vmap(
        lambda p, m: classify_scores(p, m, cb, cfg0, params)))(pts, mask)
    batched, exact = jax.jit(
        lambda p, m: classify_scores_batch(p, m, cb, cfg_w, params))(
            pts, mask)
    assert bool(exact)
    d = np.asarray(dense)
    b = np.asarray(batched)
    # decision parity is the contract; raw scores shift a few percent when
    # a near-degenerate normal flips sign (sorting alone changes reduction
    # order, independent of the window -- see module docstring)
    assert (d.argmax(1) == b.argmax(1)).all()
    top = np.take_along_axis(b, d.argmax(1)[:, None], 1)[:, 0]
    ref = d.max(1)
    np.testing.assert_allclose(top, ref, rtol=0.15, atol=1e-3)


def test_classify_scores_batch_dense_fallback_path(small_model):
    """normals_window=0 routes through the plain vmapped path."""
    cb, cfg0, params = small_model
    from point_cloud_donkey_tpu.models.pipeline_jit import (
        classify_scores, classify_scores_batch)
    rng = np.random.default_rng(6)
    pts, mask = _batch(rng, b=2, n=512)
    batched, exact = classify_scores_batch(pts, mask, cb, cfg0, params)
    assert bool(exact)
    dense = jax.vmap(
        lambda p, m: classify_scores(p, m, cb, cfg0, params))(pts, mask)
    np.testing.assert_allclose(np.asarray(batched), np.asarray(dense),
                               rtol=1e-5, atol=1e-6)


def test_classify_scores_batch_fused_descriptor(small_model, monkeypatch):
    """fused_descriptor=True routes the batched entry through the fused
    SHOT kernel (interpret mode on CPU via PCD_FUSED_DESC_INTERPRET) with
    decision parity vs the plain path."""
    cb, cfg0, params = small_model
    from point_cloud_donkey_tpu.models.pipeline_jit import (
        classify_scores, classify_scores_batch)
    monkeypatch.setenv("PCD_FUSED_DESC_INTERPRET", "1")
    rng = np.random.default_rng(7)
    pts, mask = _batch(rng, b=4, n=512)
    cfg_f = cfg0._replace(fused_descriptor=True)
    fused, exact = classify_scores_batch(pts, mask, cb, cfg_f, params)
    assert bool(exact)
    dense = jax.vmap(
        lambda p, m: classify_scores(p, m, cb, cfg0, params))(pts, mask)
    d, f = np.asarray(dense), np.asarray(fused)
    assert (d.argmax(1) == f.argmax(1)).all()
    top = np.take_along_axis(f, d.argmax(1)[:, None], 1)[:, 0]
    np.testing.assert_allclose(top, d.max(1), rtol=0.05, atol=1e-3)


def test_classify_scores_batch_windowed_descriptor(small_model, monkeypatch):
    """descriptor_window routes the fused entry through the windowed SHOT
    kernel (interpret mode on CPU): decision parity vs the plain path and
    a working exactness flag."""
    cb, cfg0, params = small_model
    from point_cloud_donkey_tpu.models.pipeline_jit import (
        classify_scores, classify_scores_batch)
    monkeypatch.setenv("PCD_FUSED_DESC_INTERPRET", "1")
    rng = np.random.default_rng(8)
    pts, mask = _batch(rng, b=4, n=512)
    nw = binned.required_window(pts, mask, radius=cfg0.normal_radius,
                                tile_q=256, align=128)
    from point_cloud_donkey_tpu.ops.voxel_grid import voxel_grid
    kres = jax.vmap(lambda p, m: voxel_grid(p, m, cfg0.leaf_size,
                                            capacity=128))(pts, mask)
    kp = jnp.where(kres.mask[..., None], kres.centroids[..., :3], 1e9)
    dw = binned.required_window(pts, mask, radius=cfg0.radius, tile_q=8,
                                align=128, q_points=kp, q_mask=kres.mask)
    cfg_w = cfg0._replace(fused_descriptor=True, normals_window=nw,
                          descriptor_window=dw)
    got, exact = classify_scores_batch(pts, mask, cb, cfg_w, params)
    assert bool(exact)
    dense = jax.vmap(
        lambda p, m: classify_scores(p, m, cb, cfg0, params))(pts, mask)
    d, g = np.asarray(dense), np.asarray(got)
    assert (d.argmax(1) == g.argmax(1)).all()
    top = np.take_along_axis(g, d.argmax(1)[:, None], 1)[:, 0]
    np.testing.assert_allclose(top, d.max(1), rtol=0.15, atol=1e-3)
    # an absurdly small window must trip the exactness flag
    cfg_bad = cfg_w._replace(descriptor_window=128)
    _, exact_bad = classify_scores_batch(pts, mask, cb, cfg_bad, params)
    assert not bool(exact_bad)


def test_classify_scores_batch_compact_tiles(small_model, monkeypatch):
    """descriptor_tile_capacity routes the fused entry through the
    tile-compacted kernel + flat votes/scores: decision parity vs the
    plain path, scores allclose to the fused dense path."""
    cb, cfg0, params = small_model
    from point_cloud_donkey_tpu.models.pipeline_jit import (
        classify_scores, classify_scores_batch)
    monkeypatch.setenv("PCD_FUSED_DESC_INTERPRET", "1")
    rng = np.random.default_rng(9)
    pts, mask = _batch(rng, b=4, n=512)
    cfg_f = cfg0._replace(fused_descriptor=True)
    fused, _ = classify_scores_batch(pts, mask, cb, cfg_f, params)
    cfg_c = cfg_f._replace(descriptor_tile_capacity=4 * 128 // 8)
    got, exact = classify_scores_batch(pts, mask, cb, cfg_c, params)
    assert bool(exact)
    f, g = np.asarray(fused), np.asarray(got)
    np.testing.assert_allclose(g, f, rtol=1e-4, atol=1e-5)
    dense = jax.vmap(
        lambda p, m: classify_scores(p, m, cb, cfg0, params))(pts, mask)
    assert (np.asarray(dense).argmax(1) == g.argmax(1)).all()
    # overflow trips the flag
    cfg_bad = cfg_f._replace(descriptor_tile_capacity=8)
    _, exact_bad = classify_scores_batch(pts, mask, cb, cfg_bad, params)
    assert not bool(exact_bad)
