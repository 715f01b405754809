"""Aux subsystems: partial-SHOT masking, debug dumps, resizing, exceptions,
feature cache, template config (reference utils/* + codebook.cpp:952-1036)."""
import json
import os

import numpy as np
import pytest

from point_cloud_donkey_tpu.models.codebook import (signature_mask,
                                                    partial_shot_columns)
from point_cloud_donkey_tpu.utils.config import IsmConfig
from point_cloud_donkey_tpu.utils.debug_utils import (write_ranked_indices,
                                                      write_feature_cloud,
                                                      write_voting_space)
from point_cloud_donkey_tpu.utils.exceptions import (IsmError, BadParamError,
                                                     JSONError)
from point_cloud_donkey_tpu.utils.io import PointCloud
from point_cloud_donkey_tpu.utils.resizing import resize_cloud, resize_to_radius


def test_signature_masks_match_reference_bins():
    # codebook.cpp:952-1036
    assert signature_mask("front")[8:24].all() and signature_mask("front").sum() == 16
    assert (signature_mask("back") == ~signature_mask("front")).all()
    assert signature_mask("left")[16:].all()
    assert (signature_mask("right") == ~signature_mask("left")).all()
    assert signature_mask("top")[1::2].all() and not signature_mask("top")[0::2].any()
    assert (signature_mask("bottom") == ~signature_mask("top")).all()
    assert signature_mask("dense_x_or_z").sum() == 24  # union of front+top
    assert signature_mask("dense_x_and_z").sum() == 8  # intersection
    assert signature_mask("front_turn_left")[12:28].all()
    assert signature_mask("front_turn_right")[4:20].all()
    assert signature_mask("bogus").all()  # unknown -> complete descriptor
    # aliases
    assert (signature_mask("dense_x") == signature_mask("front")).all()
    assert (signature_mask("sparse_z") == signature_mask("bottom")).all()


def test_partial_shot_columns():
    m = signature_mask("front")
    c = partial_shot_columns(m, 352)
    assert len(c) == 16 * 11 and c.min() == 88 and c.max() == 263
    c2 = partial_shot_columns(m, 1344)
    assert len(c2) == 16 * 11 + 16 * 31
    assert (c2[:176] == c).all() and c2[176] == 352 + 8 * 31


def test_partial_shot_cast_votes_shape():
    import jax.numpy as jnp
    from point_cloud_donkey_tpu.models.codebook import (TrainedCodebook,
                                                        CodebookParams,
                                                        cast_votes)
    rng = np.random.default_rng(0)
    C, MV, D, F = 6, 4, 352, 10
    cb = TrainedCodebook(
        codewords=rng.random((C, D), np.float32),
        cw_mask=np.ones(C, bool),
        cw_weight=np.ones(C, np.float32),
        cw_position=rng.random((C, 3), np.float32),
        votes=rng.random((C, MV, 3), np.float32),
        vote_mask=np.ones((C, MV), bool),
        vote_class=np.zeros((C, MV), np.int32),
        vote_instance=np.zeros((C, MV), np.int32),
        vote_weight=np.ones((C, MV), np.float32),
        class_weight=np.ones((C, MV), np.float32),
        bbox_size=np.ones((C, MV, 3), np.float32),
        bbox_quat=np.tile(np.array([1., 0, 0, 0], np.float32), (C, MV, 1)),
        class_sigma=np.full(2, 100.0, np.float32))
    params = CodebookParams(use_partial_shot=True, partial_shot_type="front")
    out = cast_votes(cb, jnp.asarray(rng.random((F, D), np.float32)),
                     jnp.asarray(rng.random((F, 3), np.float32)),
                     jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (F, 1, 1))),
                     jnp.ones(F, bool), params, "l2")
    assert bool(out.valid.any())


def test_debug_dumps(tmp_path):
    scores = np.array([0.3, 0.9, 0.1], np.float32)
    ranking = np.argsort(-scores)
    f = tmp_path / "ranked.txt"
    write_ranked_indices(str(f), scores, ranking, np.array([1, 0, 1]))
    lines = f.read_text().splitlines()
    rank0 = lines[1].split()
    assert rank0[0] == "0" and rank0[1] == "1"
    assert abs(float(rank0[2]) - 0.9) < 1e-6
    write_feature_cloud(str(tmp_path / "fc.npz"), np.zeros((3, 3)),
                        np.ones((3, 8)), extra={"classId": 2})
    z = np.load(tmp_path / "fc.npz")
    assert z["descriptors"].shape == (3, 8)
    assert json.load(open(tmp_path / "fc.npz.json"))["classId"] == 2
    write_voting_space(str(tmp_path / "vs.npz"), np.zeros((5, 3)),
                       np.ones(5), np.zeros(5, np.int32))
    assert np.load(tmp_path / "vs.npz")["weights"].sum() == 5


def test_resizing():
    pc = PointCloud(xyz=np.array([[1., 0, 0], [-1., 0, 0]], np.float32))
    out = resize_cloud(pc, 2.0)
    assert np.allclose(out.xyz, pc.xyz * 2)
    out2 = resize_to_radius(pc, 5.0)
    c = out2.xyz.mean(0)
    assert np.isclose(np.linalg.norm(out2.xyz - c, axis=1).max(), 5.0)


def test_exceptions_hierarchy():
    with pytest.raises(IsmError):
        raise BadParamError("Radius", -1)
    assert issubclass(JSONError, IsmError)
    e = BadParamError("K", 0)
    assert "K" in str(e)


def test_template_config_roundtrip(tmp_path):
    p = tmp_path / "tpl.ism"
    IsmConfig.template().save(str(p))
    c = IsmConfig.load(str(p))
    assert c.child("Features").type == "SHOT"
    assert c.child("Voting").get("Bandwidth", 0.0) == 0.1
    assert c.root.get("NormalRadius", 0.0) == 0.05


def test_feature_cache(tmp_path, monkeypatch):
    import shapes
    from point_cloud_donkey_tpu.models.features import FeatureConfig
    from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
    from point_cloud_donkey_tpu.utils.config import ComponentConfig
    cfg = IsmConfig.template()
    cfg.root.params["CacheFeatures"] = True
    cfg.root.params["CacheFeaturesFolder"] = str(tmp_path / "cache")
    cfg.child("Features").params["Radius"] = 0.5
    cfg.child("Features").params["ReferenceFrameRadius"] = 0.4
    cfg.child("Keypoints").params["LeafSize"] = 0.3
    ism = ImplicitShapeModel(cfg)
    rng = np.random.default_rng(0)
    xyz = np.asarray(shapes.ellipsoid(rng, 900), np.float32)
    fs1 = ism._cached_local_features("mem://a", xyz, None,
                                     ism._feature_cfg(),
                                     cfg.child("Keypoints"), 0.25, 1, None)
    files = list((tmp_path / "cache").glob("*.npz"))
    assert len(files) == 1
    fs2 = ism._cached_local_features("mem://a", xyz, None,
                                     ism._feature_cfg(),
                                     cfg.child("Keypoints"), 0.25, 1, None)
    assert np.allclose(fs1.descriptors, fs2.descriptors)


def test_native_lzf_compress_roundtrip():
    from point_cloud_donkey_tpu.utils.native import (lzf_compress,
                                                     lzf_decompress)
    data = (np.arange(30000, dtype=np.uint8) // 50).tobytes()
    c = lzf_compress(data)
    if c is None:   # native toolchain unavailable: graceful degradation
        pytest.skip("native lib unavailable")
    assert len(c) < len(data)
    assert lzf_decompress(c, len(data)) == data
    rng = np.random.default_rng(1)
    rnd = rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
    c2 = lzf_compress(rnd)
    if c2 is not None:
        assert lzf_decompress(c2, len(rnd)) == rnd


def test_reference_configs_parse():
    """The reference's shipped configs load unchanged (schema parity)."""
    import os
    base = "/root/reference/config"
    if not os.path.isdir(base):
        pytest.skip("reference configs not mounted")
    for f in ("qs_input_config.ism", "default.ism",
              "default_config_kinect.ism"):
        c = IsmConfig.load(os.path.join(base, f))
        assert c.child("Features").type in ("SHOT", "CSHOT")
        assert c.child("Voting").type == "MeanShift"
        assert c.child("Features").get("Radius", 0.0) > 0
    # quick-start: SHOT at radius 60 (mm-scale clouds), Dummy global
    qs = IsmConfig.load(os.path.join(base, "qs_input_config.ism"))
    assert qs.child("GlobalFeatures").type == "Dummy"
    assert qs.child("Features").get("Radius", 0.0) == 60.0


def test_pcd_binary_roundtrip(tmp_path):
    """save_pcd(binary=True) -> load_cloud parity with the ascii writer
    (pcl::savePCDFileBinary analog; loader handles ascii / binary /
    binary_compressed)."""
    import numpy as np
    from point_cloud_donkey_tpu.utils.io import PointCloud, load_cloud, save_pcd

    rng = np.random.default_rng(5)
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    nrm = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.random((100, 3)).astype(np.float32)
    cloud = PointCloud(xyz=xyz, normals=nrm, rgb=rgb)

    pa = str(tmp_path / "a.pcd")
    pb = str(tmp_path / "b.pcd")
    save_pcd(pa, cloud)
    save_pcd(pb, cloud, binary=True)
    ca, cb = load_cloud(pa), load_cloud(pb)
    np.testing.assert_array_equal(cb.xyz, xyz)  # binary is bit-exact
    np.testing.assert_allclose(ca.xyz, cb.xyz, atol=0)
    np.testing.assert_array_equal(cb.normals, nrm)
    np.testing.assert_allclose(cb.rgb, ca.rgb)


def test_boost_ismd_roundtrip_and_load(rng, tmp_path):
    """The reference `.ismd` boost-archive codec: byte-level roundtrip plus
    a trained model exported with save_reference and re-imported through
    ImplicitShapeModel.load (the ObjectData pairing, json_object.cpp:50-95)
    must reproduce the npz-loaded model's detection decisions."""
    import shapes
    from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
    from point_cloud_donkey_tpu.utils.boost_archive import (
        read_ismd, ref_data_to_state, state_to_ref_data, write_ismd)
    from point_cloud_donkey_tpu.utils.config import IsmConfig
    from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd

    config = {"ObjectConfig": {"Children": {
        "Clustering": {"Type": "None"},
        "Codebook": {"Children": {"ActivationStrategy": {
            "Parameters": {"K": 1}, "Type": "KNN"}}},
        "FeatureWeighting": {"Type": "Uniform"},
        "Features": {"Parameters": {
            "Radius": 0.6, "ReferenceFrameRadius": 0.5}, "Type": "SHORT_SHOT"},
        "GlobalFeatures": {"Type": "ESF"},
        "Keypoints": {"Parameters": {"LeafSize": 0.35}, "Type": "VoxelGrid"},
        "Voting": {"Parameters": {
            "Bandwidth": 0.5, "SingleObjectMode": True,
            "SingleObjectMaxType": "BandwidthVotes"}, "Type": "MeanShift"}},
        "Parameters": {"DistanceType": "ChiSquared",
                       "BoundingBoxType": "AABB"}}}
    ism = ImplicitShapeModel(IsmConfig.from_json(config))
    for cid in range(3):
        pts = shapes.make_instance(rng, cid, n=600)
        p = str(tmp_path / f"t{cid}.pcd")
        save_pcd(p, PointCloud(xyz=pts))
        ism.add_training_model(p, cid, cid)
    ism.train()
    ism.state.instance_to_class = {0: 0, 1: 1, 2: 2}
    ism.label_maps = {"class": {"0": "a", "1": "b", "2": "c"},
                      "instance": {}, "usage": "CLASS_ONLY"}

    # 1. codec roundtrip: write -> read -> write is byte-identical
    data = state_to_ref_data(ism.state, ism.label_maps)
    p1 = str(tmp_path / "m.ismd")
    write_ismd(p1, data)
    data2 = read_ismd(p1)
    p2 = str(tmp_path / "m2.ismd")
    write_ismd(p2, data2)
    assert open(p1, "rb").read() == open(p2, "rb").read()

    # the payload survives the array conversions
    st2, _ = ref_data_to_state(data2)
    cb1, cb2 = ism.state.codebook, st2.codebook
    np.testing.assert_allclose(cb1.codewords[cb1.cw_mask],
                               cb2.codewords[cb2.cw_mask], rtol=1e-6)
    np.testing.assert_array_equal(cb1.vote_mask, cb2.vote_mask)
    np.testing.assert_allclose(cb1.votes, cb2.votes, rtol=1e-6)
    np.testing.assert_allclose(cb1.class_sigma, cb2.class_sigma, rtol=1e-6)
    assert st2.dims_map.keys() == ism.state.dims_map.keys()

    # 2. save_reference -> load (boost path) reproduces decisions
    ref_path = str(tmp_path / "ref.ism")
    ism.save_reference(ref_path)
    assert (tmp_path / "ref.ismd").exists()
    ism2 = ImplicitShapeModel.load(ref_path)
    assert ism2.state is not None
    assert ism2.label_maps["class"]["1"] == "b"
    for cid in range(3):
        pts = shapes.make_instance(rng, cid, n=600, rotate=True)
        m1, _ = ism.detect(pts)
        m2, _ = ism2.detect(pts)
        assert [m.class_id for m in m1] == [m.class_id for m in m2]


def test_shipped_presets_load_and_construct():
    """configs/*.ism presets must parse and build a full component stack."""
    import glob
    import os
    from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
    from point_cloud_donkey_tpu.utils.config import IsmConfig
    root = os.path.join(os.path.dirname(__file__), os.pardir, "configs")
    paths = sorted(glob.glob(os.path.join(root, "*.ism")))
    assert len(paths) >= 3
    for p in paths:
        cfg = IsmConfig.load(p)
        ImplicitShapeModel(cfg)
        assert cfg.child("Features").type
