"""Regression guards for detect_batch's device-dispatch economy.

On the axon TPU tunnel each device dispatch pays a full host<->device
round-trip, so the batched detect path's whole value is its dispatch count:
ONE fused program per 8-cloud chunk for normals -> keypoints -> descriptors
-> vote casting, plus one batched mean-shift program per maxima chunk.
These tests pin that shape so a refactor can't silently reintroduce
per-cloud (or per-stage) dispatches.
"""
import numpy as np
import pytest

import shapes
from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
from point_cloud_donkey_tpu.utils.config import IsmConfig
from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd

from test_detection import _batch_cfg


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    rng = np.random.default_rng(7)
    tmp = tmp_path_factory.mktemp("dispatch")
    ism = ImplicitShapeModel(IsmConfig.from_json(_batch_cfg()))
    for cid in range(3):
        pts = shapes.make_instance(rng, cid, n=900, rotate=False, noise=0.005)
        p = str(tmp / f"t{cid}.pcd")
        save_pcd(p, PointCloud(xyz=pts))
        ism.add_training_model(p, cid, cid)
    ism.train()
    return ism, rng


def test_detect_batch_uses_fused_single_dispatch(trained, monkeypatch):
    """20 clouds in one detect_batch: the vote-casting stage must run as
    ceil(20/MB) AOT dispatches of the FUSED program (not the staged path),
    and the staged per-stage extractor must not run at all."""
    import jax._src.stages as stages
    from point_cloud_donkey_tpu.models import detect_batch as db
    from point_cloud_donkey_tpu.models import ism as ism_mod

    ism, rng = trained
    clouds = [shapes.make_instance(rng, i % 3, n=900, rotate=True)
              for i in range(20)]

    # warm every program so the counted run is dispatch-only
    ism.detect_batch(clouds)

    aot_calls = {"n": 0}
    orig_call = stages.Compiled.__call__

    def counting_call(self, *a, **k):
        aot_calls["n"] += 1
        return orig_call(self, *a, **k)

    monkeypatch.setattr(stages.Compiled, "__call__", counting_call)

    staged_calls = {"n": 0}
    orig_staged = db.extract_local_features_batch

    def counting_staged(*a, **k):
        staged_calls["n"] += 1
        return orig_staged(*a, **k)

    monkeypatch.setattr(ism_mod, "extract_local_features_batch",
                        counting_staged, raising=False)
    monkeypatch.setattr(db, "extract_local_features_batch", counting_staged)

    results = ism.detect_batch(clouds)

    assert staged_calls["n"] == 0, "fused-eligible batch fell back to staged"
    import math
    expected = math.ceil(len(clouds) / db.MB)
    assert aot_calls["n"] == expected, (
        f"expected {expected} fused dispatches for {len(clouds)} clouds, "
        f"saw {aot_calls['n']}")
    # sanity: the batch still classifies
    preds = [m[0].class_id if m else -1 for m, _ in results]
    assert preds.count(-1) == 0


def test_detect_batch_batches_mean_shift(tmp_path, monkeypatch):
    """The per-class maxima searches must go through class_mean_shift_batch
    (batched across clouds), never the per-class single program.  Uses a
    multi-object config: single-object BandwidthVotes skips mean-shift
    entirely (centroid query), so only the multi-object path exercises it."""
    from point_cloud_donkey_tpu.models import voting as voting_mod

    rng = np.random.default_rng(11)
    ism = ImplicitShapeModel(IsmConfig.from_json(_batch_cfg(
        {"SingleObjectMode": False, "MaxFilterType": "Merge",
         "MinVotesThreshold": 1})))
    for cid in range(3):
        pts = shapes.make_instance(rng, cid, n=900, rotate=False,
                                   noise=0.005)
        p = str(tmp_path / f"t{cid}.pcd")
        save_pcd(p, PointCloud(xyz=pts))
        ism.add_training_model(p, cid, cid)
    ism.train()
    clouds = [shapes.make_instance(rng, i % 3, n=900, rotate=True)
              for i in range(6)]
    ism.detect_batch(clouds)  # warm

    single_calls = {"n": 0}
    orig_single = voting_mod._class_mean_shift

    def counting_single(*a, **k):
        single_calls["n"] += 1
        return orig_single(*a, **k)

    monkeypatch.setattr(voting_mod, "_class_mean_shift", counting_single)

    batch_calls = {"n": 0}
    orig_batch = voting_mod.class_mean_shift_batch

    def counting_batch(*a, **k):
        batch_calls["n"] += 1
        return orig_batch(*a, **k)

    monkeypatch.setattr(voting_mod, "class_mean_shift_batch", counting_batch)
    # ism.py imports the symbol at call time from .voting -- patching the
    # module attribute is enough

    ism.detect_batch(clouds)
    assert batch_calls["n"] >= 1
    assert single_calls["n"] == 0, (
        "per-class mean-shift ran outside the batched path")


def test_fused_detect_rejects_missing_rgb(tmp_path):
    """An RGB-needing descriptor over colorless clouds must raise the same
    ValueError on the fused path as everywhere else -- never silently
    zero-fill color (review finding: fused path grouped rgb=None clouds as
    has_rgb=False and fed zero colors into CSHOT)."""
    rng = np.random.default_rng(13)
    cfg = _batch_cfg()
    cfg["ObjectConfig"]["Children"]["Features"] = {
        "Parameters": {"Radius": 0.6, "ReferenceFrameRadius": 0.5},
        "Type": "CSHOT"}
    ism = ImplicitShapeModel(IsmConfig.from_json(cfg))
    for cid in range(2):
        pts = shapes.make_instance(rng, cid, n=500, rotate=False,
                                   noise=0.005)
        rgb = rng.uniform(size=(len(pts), 3)).astype(np.float32)
        p = str(tmp_path / f"t{cid}.pcd")
        save_pcd(p, PointCloud(xyz=pts, rgb=rgb))
        ism.add_training_model(p, cid, cid)
    ism.train()
    clouds = [shapes.make_instance(rng, 0, n=500, rotate=True)]
    with pytest.raises(ValueError, match="needs RGB"):
        ism.detect_batch(clouds)  # no rgb_list -> colorless


def test_staged_descriptor_program_shared_across_chunks():
    """Chunks of one bucket group with different keypoint counts must share
    ONE compiled descriptor program (group-wide capacity): compile latency
    through the axon tunnel is the scarce resource, so per-chunk capacity
    variants are regressions."""
    import numpy as np
    import point_cloud_donkey_tpu.models.detect_batch as db
    from point_cloud_donkey_tpu.models.features import FeatureConfig
    from point_cloud_donkey_tpu.utils.config import ComponentConfig

    rng = np.random.default_rng(0)
    # same padded bucket (800 pts) but very different occupied-voxel counts:
    # tight balls (few keypoints) then spread shells (many keypoints)
    sparse = [rng.normal(scale=0.05, size=(800, 3)).astype(np.float32)
              for _ in range(8)]
    dense = []
    for _ in range(8):
        u = rng.normal(size=(800, 3)).astype(np.float32)
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        dense.append(u * rng.uniform(0.5, 2.0, (800, 1)).astype(np.float32))
    clouds = sparse + dense

    fcfg = FeatureConfig(type="SHORT_SHOT", radius=0.4, ref_frame_radius=0.3,
                         neighbor_capacity=128)
    kp_cfg = ComponentConfig(type="VoxelGrid", params={"LeafSize": 0.15})

    before = db._descriptor_batch_program.cache_info().misses
    out = db.extract_local_features_batch(
        clouds, [None] * 16, [None] * 16, fcfg, kp_cfg, 0.2, 1)
    after = db._descriptor_batch_program.cache_info().misses
    assert len(out) == 16 and all(fs is not None for fs in out)
    # sanity: the two halves really have different keypoint scales
    k_sparse = max(int(fs.mask.sum()) for fs in out[:8])
    k_dense = min(int(fs.mask.sum()) for fs in out[8:])
    assert k_sparse <= 64 < k_dense, (k_sparse, k_dense)
    assert after - before <= 1, \
        f"{after - before} descriptor program variants compiled for one group"
