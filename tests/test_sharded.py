"""Multi-chip sharding equality tests on the virtual 8-CPU mesh.

Asserts the sharded paths in parallel/sharded.py produce bit-identical
outputs to the single-device pipeline (SURVEY.md section 2.4: DP over the
'data' axis is the reference's per-cloud OpenMP loop; 'model' shards the
codebook, the framework's weights).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from __graft_entry__ import _pipeline_cfg, _synthetic_codebook
from point_cloud_donkey_tpu.models.codebook import CodebookParams
from point_cloud_donkey_tpu.models.pipeline_jit import classify_scores
from point_cloud_donkey_tpu.parallel.sharded import (
    batched_classify, batched_training_step, make_mesh, shard_codebook)


def _batch(B=8, N=256, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(B, N, 3)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=2, keepdims=True)
    pts *= rng.uniform(0.5, 1.5, size=(B, 1, 3)).astype(np.float32)
    mask = np.ones((B, N), bool)
    mask[:, N - 16:] = False  # exercise padding masks
    return pts, mask


@pytest.mark.parametrize("n_data,n_model", [(8, 1), (4, 2)])
def test_batched_classify_matches_single_device(n_data, n_model):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    cfg = _pipeline_cfg(keypoint_capacity=64, neighbor_capacity=128)
    cb_host = _synthetic_codebook(num_codewords=64)
    params = CodebookParams(knn_k=1)

    pts, mask = _batch(B=n_data)
    # single-device reference: the SAME vmapped program, unsharded (isolates
    # the sharding as the only variable; vmap-vs-scalar fp reassociation is a
    # separate, looser comparison below)
    single_step = jax.jit(jax.vmap(
        lambda p, m: classify_scores(p, m, cb_host, cfg, params)))
    single = np.asarray(single_step(jnp.asarray(pts), jnp.asarray(mask)))

    cb = shard_codebook(cb_host, mesh)
    with mesh:
        step = batched_classify(mesh, cb, cfg, params)
        sharded = np.asarray(step(jnp.asarray(pts), jnp.asarray(mask)))

    assert sharded.shape == single.shape
    np.testing.assert_array_equal(sharded, single)


def test_sharded_codebook_pads_to_model_axis():
    mesh = make_mesh(n_data=4, n_model=2)
    cb = _synthetic_codebook(num_codewords=63)  # not divisible by 2
    scb = shard_codebook(cb, mesh)
    assert scb.codewords.shape[0] == 64
    # padding rows are masked out
    assert not np.asarray(scb.cw_mask)[63:].any()


def test_batched_training_step_matches_per_cloud():
    mesh = make_mesh(n_data=8, n_model=1)
    cfg = _pipeline_cfg(keypoint_capacity=64, neighbor_capacity=128)
    pts, mask = _batch(B=8, seed=3)
    labels = np.arange(8, dtype=np.int32) % cfg.num_classes

    with mesh:
        step = batched_training_step(mesh, cfg)
        desc_sum, desc_cnt = step(jnp.asarray(pts), jnp.asarray(mask),
                                  jnp.asarray(labels))
    desc_sum, desc_cnt = np.asarray(desc_sum), np.asarray(desc_cnt)

    # reference: unsharded jit of the same step
    from point_cloud_donkey_tpu.models.pipeline_jit import extract_features_jit

    ref_sum = np.zeros_like(desc_sum)
    ref_cnt = np.zeros_like(desc_cnt)
    for i in range(pts.shape[0]):
        _, _, desc, valid = jax.jit(extract_features_jit, static_argnums=2)(
            jnp.asarray(pts[i]), jnp.asarray(mask[i]), cfg)
        d = np.where(np.asarray(valid)[:, None], np.asarray(desc), 0.0)
        ref_sum[labels[i]] += d.sum(axis=0)
        ref_cnt[labels[i]] += np.asarray(valid).sum()

    np.testing.assert_allclose(desc_sum, ref_sum, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(desc_cnt, ref_cnt)


def _toy_feature_models(rng, n_models=6, f_per=40, d=32, num_classes=3):
    """Synthetic compacted FeatureSets + boxes for codebook training."""
    from point_cloud_donkey_tpu.models.types import make_feature_set
    from point_cloud_donkey_tpu.ops.geometry import BoundingBox

    fss, classes, instances, boxes = [], [], [], []
    for i in range(n_models):
        desc = np.abs(rng.normal(size=(f_per, d))).astype(np.float32)
        desc /= desc.sum(axis=1, keepdims=True)
        pos = rng.normal(size=(f_per, 3)).astype(np.float32)
        # random orthonormal frames
        q, _ = np.linalg.qr(rng.normal(size=(f_per, 3, 3)))
        fss.append(make_feature_set(desc, pos, q.astype(np.float32),
                                    np.ones(f_per, bool)))
        classes.append(i % num_classes)
        instances.append(i % num_classes)
        boxes.append(BoundingBox(
            position=rng.normal(size=3).astype(np.float32),
            size=np.abs(rng.normal(size=3)).astype(np.float32) + 0.5,
            quat=np.array([1, 0, 0, 0], np.float32)))
    return fss, classes, instances, boxes


@pytest.mark.parametrize("activation", [
    {"activation_type": "KNN", "knn_k": 1},
    {"activation_type": "KNN", "knn_k": 3},
    {"activation_type": "Threshold", "threshold": 0.5,
     "threshold_capacity": 8},
])
@pytest.mark.parametrize("n_data,n_model", [(4, 2), (8, 1)])
def test_sharded_codebook_training_bit_identical(n_data, n_model, activation):
    """The REAL training pipeline (train_codebook: activation, vote tables,
    sigmas, center weights, 9-step statistical weights) run with the
    mesh-sharded activation must produce a bit-identical TrainedCodebook
    (VERDICT r2 weak #5 / next #6)."""
    from point_cloud_donkey_tpu.models.codebook import train_codebook
    from point_cloud_donkey_tpu.parallel.sharded import (
        make_mesh, train_codebook_sharded)

    rng = np.random.default_rng(11)
    fss, classes, instances, boxes = _toy_feature_models(rng)
    # codewords = a subset of the features (Clustering None takes all;
    # a strided subset keeps multi-vote codewords for k>1)
    centers = np.concatenate([f.descriptors for f in fss])[::3]
    cw_pos = np.concatenate([f.positions for f in fss])[::3]

    params = CodebookParams(**activation)
    host = train_codebook(fss, classes, instances, boxes, centers, cw_pos,
                          params, "chisq")

    mesh = make_mesh(n_data=n_data, n_model=n_model)
    sharded = train_codebook_sharded(mesh, fss, classes, instances, boxes,
                                     centers, cw_pos, params, "chisq")

    for name in host._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(host, name)), np.asarray(getattr(sharded, name)),
            err_msg=f"field {name} differs")


def test_train_product_path_uses_mesh_bit_identical(tmp_path):
    """ImplicitShapeModel.train() (the product/CLI path) takes the sharded
    codebook trainer when a mesh is available (UseDeviceMesh Auto picks up
    the 8 virtual devices) and produces a TrainedState bit-identical to the
    forced host path (VERDICT r3 next #3)."""
    import sys
    sys.path.insert(0, "tests")
    import shapes
    from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
    from point_cloud_donkey_tpu.utils.config import IsmConfig
    from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd

    rng = np.random.default_rng(9)
    cfg = {"ObjectConfig": {"Children": {
        "Clustering": {"Type": "None"},
        "Codebook": {"Children": {"ActivationStrategy": {
            "Parameters": {"K": 2}, "Type": "KNN"}}},
        "FeatureWeighting": {"Type": "Uniform"},
        "Features": {"Parameters": {
            "Radius": 0.6, "ReferenceFrameRadius": 0.5}, "Type": "SHORT_SHOT"},
        "GlobalFeatures": {"Type": "Dummy"},
        "Keypoints": {"Parameters": {"LeafSize": 0.35}, "Type": "VoxelGrid"},
        "Voting": {"Parameters": {"Bandwidth": 0.5}, "Type": "MeanShift"}},
        "Parameters": {"DistanceType": "ChiSquared",
                       "BoundingBoxType": "AABB"}}}

    paths = []
    for cid in range(3):
        pts = shapes.make_instance(rng, cid, n=600, rotate=False, noise=0.005)
        p = str(tmp_path / f"t{cid}.pcd")
        save_pcd(p, PointCloud(xyz=pts))
        paths.append((p, cid))

    def trained(extra_params):
        c = {"ObjectConfig": {
            "Children": cfg["ObjectConfig"]["Children"],
            "Parameters": {**cfg["ObjectConfig"]["Parameters"],
                           **extra_params}}}
        ism = ImplicitShapeModel(IsmConfig.from_json(c))
        for p, cid in paths:
            ism.add_training_model(p, cid, cid)
        ism.train()
        return ism

    assert len(jax.devices()) >= 8
    auto = trained({})            # Auto: 8 virtual devices -> mesh path
    # the mesh really was taken: _training_mesh returns one for this config
    from point_cloud_donkey_tpu.models.ism import _codebook_params
    assert auto._training_mesh(
        _codebook_params(auto.config.child("Codebook"))) is not None
    host = trained({"UseDeviceMesh": False})
    assert host._training_mesh(
        _codebook_params(host.config.child("Codebook"))) is None

    for name in host.state.codebook._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(host.state.codebook, name)),
            np.asarray(getattr(auto.state.codebook, name)),
            err_msg=f"field {name} differs")
    assert host.state.dims_map == auto.state.dims_map


@pytest.mark.parametrize("n_data,n_model", [(8, 1), (4, 2)])
def test_batched_detect_matches_single_device(n_data, n_model):
    """Sharded full-detection step (features -> votes -> per-class
    mean-shift -> density argmax) == the same vmapped program unsharded,
    bit-for-bit; densities agree with classify_scores_mean_shift."""
    from point_cloud_donkey_tpu.models.pipeline_jit import (
        classify_scores_mean_shift, detect_maxima_jit)
    from point_cloud_donkey_tpu.parallel.sharded import batched_detect

    mesh = make_mesh(n_data=n_data, n_model=n_model)
    cfg = _pipeline_cfg(keypoint_capacity=64, neighbor_capacity=128)
    cb_host = _synthetic_codebook(num_codewords=64)
    params = CodebookParams(knn_k=1)

    pts, mask = _batch(B=n_data, seed=5)
    single_step = jax.jit(jax.vmap(
        lambda p, m: detect_maxima_jit(p, m, cb_host, cfg, params)))
    s_dens, s_pos = single_step(jnp.asarray(pts), jnp.asarray(mask))
    s_dens, s_pos = np.asarray(s_dens), np.asarray(s_pos)

    cb = shard_codebook(cb_host, mesh)
    with mesh:
        step = batched_detect(mesh, cb, cfg, params)
        dens, pos = step(jnp.asarray(pts), jnp.asarray(mask))
    dens, pos = np.asarray(dens), np.asarray(pos)

    assert dens.shape == (n_data, cfg.num_classes)
    assert pos.shape == (n_data, cfg.num_classes, 3)
    np.testing.assert_array_equal(dens, s_dens)
    np.testing.assert_array_equal(pos, s_pos)
    assert (dens > 0).any(), "degenerate: no class produced a maximum"

    ms_step = jax.jit(jax.vmap(
        lambda p, m: classify_scores_mean_shift(p, m, cb_host, cfg, params)))
    ms_scores = np.asarray(ms_step(jnp.asarray(pts), jnp.asarray(mask)))
    np.testing.assert_allclose(dens, ms_scores, rtol=1e-6)


def test_feature_extraction_sharded_bit_identical(tmp_path):
    """Training feature extraction under the mesh (VERDICT r4 next #3):
    extract_local_features_batch with a data mesh commits its chunk arrays
    sharded (verified via _to_dev) and produces FeatureSets bit-identical
    to the unsharded path."""
    import sys
    sys.path.insert(0, "tests")
    import shapes
    from jax.sharding import NamedSharding
    from point_cloud_donkey_tpu.models.detect_batch import (
        _to_dev, extract_local_features_batch)
    from point_cloud_donkey_tpu.models.features import FeatureConfig
    from point_cloud_donkey_tpu.utils.config import IsmConfig

    rng = np.random.default_rng(21)
    clouds = [shapes.make_instance(rng, cid, n=600, rotate=False)
              for cid in range(4)] * 2
    fcfg = FeatureConfig(type="SHORT_SHOT", radius=0.6, ref_frame_radius=0.5)
    kp_cfg = IsmConfig.from_json({"ObjectConfig": {"Children": {
        "Keypoints": {"Parameters": {"LeafSize": 0.35},
                      "Type": "VoxelGrid"}}}}).child("Keypoints")

    mesh = make_mesh(n_data=8, n_model=1)
    # the committed chunk arrays really are sharded over 'data'
    x = _to_dev(np.zeros((8, 16, 3), np.float32), mesh)
    assert isinstance(x.sharding, NamedSharding)
    assert x.sharding.spec == jax.sharding.PartitionSpec("data")

    nrm = [None] * len(clouds)
    rgb = [None] * len(clouds)
    host = extract_local_features_batch(clouds, nrm, rgb, fcfg, kp_cfg,
                                        0.25, 2, is_training=True)
    shrd = extract_local_features_batch(clouds, nrm, rgb, fcfg, kp_cfg,
                                        0.25, 2, is_training=True, mesh=mesh)
    for h, s in zip(host, shrd):
        for name in h._fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(h, name)), np.asarray(getattr(s, name)),
                err_msg=f"field {name} differs")
