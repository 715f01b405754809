import numpy as np
import jax.numpy as jnp
import pytest

from point_cloud_donkey_tpu.ops.color import rgb_to_cielab_normalized, color_distance
from point_cloud_donkey_tpu.ops.curvature import principal_curvatures
from point_cloud_donkey_tpu.ops import preprocess as pp
from point_cloud_donkey_tpu.models.keypoints import KeypointParams, detect_keypoints


def ref_rgb_to_lab(r, g, b):
    """Scalar reference implementation transcribed from
    color_conversion.cpp (LUT semantics)."""
    import math
    def srgb(i):
        f = i / 255.0
        return ((f + 0.055) / 1.055) ** 2.4 if f > 0.04045 else f / 12.92
    def xyzf(t):
        f = min(int(t * 4000), 3999) / 4000.0
        return f ** 0.3333 if f > 0.008856 else 7.787 * f + 16.0 / 116.0
    fr, fg, fb = srgb(r), srgb(g), srgb(b)
    x = fr * 0.412453 + fg * 0.357580 + fb * 0.180423
    y = fr * 0.212671 + fg * 0.715160 + fb * 0.072169
    z = fr * 0.019334 + fg * 0.119193 + fb * 0.950227
    vx, vy, vz = xyzf(x / 0.95047), xyzf(y), xyzf(z / 1.08883)
    L = min(116.0 * vy - 16.0, 100.0)
    a = max(min(500.0 * (vx - vy), 120.0), -120.0)
    b2 = max(min(200.0 * (vy - vz), 120.0), -120.0)
    return L / 100.0, a / 120.0, b2 / 120.0


def test_cielab_matches_reference(rng):
    vals = rng.integers(0, 256, (50, 3))
    lab = np.asarray(rgb_to_cielab_normalized(jnp.asarray(vals / 255.0, jnp.float32)))
    for (r, g, b), got in zip(vals, lab):
        want = ref_rgb_to_lab(int(r), int(g), int(b))
        np.testing.assert_allclose(got, want, atol=2e-3)


def test_color_distance_range(rng):
    lab1 = np.asarray(rgb_to_cielab_normalized(jnp.asarray(rng.random((10, 3)), jnp.float32)))
    lab2 = np.asarray(rgb_to_cielab_normalized(jnp.asarray(rng.random((10, 3)), jnp.float32)))
    d = np.asarray(color_distance(jnp.asarray(lab1), jnp.asarray(lab2)))
    assert np.all((d >= 0) & (d <= 1))
    d0 = np.asarray(color_distance(jnp.asarray(lab1), jnp.asarray(lab1)))
    np.testing.assert_allclose(d0, 0, atol=1e-7)


def test_principal_curvatures_plane_vs_sphere(rng):
    # plane: pc1*pc2 ~ 0 (all normals equal -> projected variance 0)
    xy = rng.uniform(-1, 1, (500, 2)).astype(np.float32)
    plane = np.concatenate([xy, np.zeros((500, 1), np.float32)], 1)
    n_plane = np.tile([0, 0, 1.0], (500, 1)).astype(np.float32)
    res_p = principal_curvatures(jnp.asarray(plane[:20]), jnp.asarray(n_plane[:20]),
                                 jnp.asarray(plane), jnp.asarray(n_plane),
                                 jnp.ones(500, bool), 0.4)
    assert np.all(np.asarray(res_p.pc1) < 1e-5)

    # sphere: normals vary -> pc1 > 0
    v = rng.normal(size=(1000, 3)); v /= np.linalg.norm(v, axis=1, keepdims=True)
    sph = v.astype(np.float32)
    res_s = principal_curvatures(jnp.asarray(sph[:20]), jnp.asarray(sph[:20]),
                                 jnp.asarray(sph), jnp.asarray(sph),
                                 jnp.ones(1000, bool), 0.4)
    assert np.all(np.asarray(res_s.pc1) > 1e-4)


def test_statistical_outlier_removal(rng):
    pts = rng.normal(size=(300, 3)).astype(np.float32) * 0.1
    pts[0] = [10, 10, 10]  # gross outlier
    mask = np.ones(300, bool)
    out = np.asarray(pp.statistical_outlier_removal(jnp.asarray(pts), jnp.asarray(mask), 10, 1.0))
    assert not out[0]
    assert out[1:].mean() > 0.8


def test_radius_outlier_removal(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32) * 0.1
    pts[0] = [5, 5, 5]
    out = np.asarray(pp.radius_outlier_removal(jnp.asarray(pts), jnp.ones(200, bool), 0.2, 3))
    assert not out[0]


def test_mls_smooth_plane(rng):
    xy = rng.uniform(-1, 1, (400, 2)).astype(np.float32)
    z = rng.normal(scale=0.02, size=(400, 1)).astype(np.float32)
    pts = np.concatenate([xy, z], 1)
    sm = np.asarray(pp.mls_smooth(jnp.asarray(pts), jnp.ones(400, bool), 0.4))
    assert np.abs(sm[:, 2]).std() < np.abs(pts[:, 2]).std() * 0.7


def test_keypoint_culling_curvature(rng):
    # half-plane (flat) + bumpy region: curvature culling with cutoff 0.5
    # must prefer keypoints in the bumpy half
    xy = rng.uniform(-1, 1, (3000, 2)).astype(np.float32)
    z = np.where(xy[:, 0] > 0, 0.12 * np.sin(8 * xy[:, 0]) * np.sin(8 * xy[:, 1]), 0.0)
    pts = np.stack([xy[:, 0], xy[:, 1], z], 1).astype(np.float32)
    normals = np.tile([0, 0, 1.0], (3000, 1)).astype(np.float32)
    params = KeypointParams(type="VoxelGridCulling", leaf_size=0.15,
                            filter_method_geometry="Curvature",
                            filter_type_geometry="CutOff",
                            filter_cutoff_ratio=0.5)
    kp_all = detect_keypoints(pts, normals, None, params, is_training=True)
    kp_culled = detect_keypoints(pts, normals, None, params, is_training=False)
    assert len(kp_culled) < len(kp_all)
    # culled keypoints should mostly be in the bumpy half
    assert (kp_culled[:, 0] > 0).mean() > 0.7


def test_activation_strategies_smoke(rng):
    """KNNRule / Threshold / INN activation paths produce valid votes."""
    import jax.numpy as jnp
    from point_cloud_donkey_tpu.models.codebook import (
        CodebookParams, cast_votes, training_activation)
    import runpy
    ge = runpy.run_path('/root/repo/__graft_entry__.py')
    cb = ge['_synthetic_codebook'](num_codewords=64, dim=16)
    desc = np.abs(rng.normal(size=(20, 16))).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    pos = rng.normal(size=(20, 3)).astype(np.float32)
    frames = np.tile(np.eye(3, dtype=np.float32), (20, 1, 1))
    mask = np.ones(20, bool)

    for strategy in ("KNN", "KNNRule", "Threshold", "INN"):
        params = CodebookParams(activation_type=strategy, knn_k=2,
                                threshold=5.0, threshold_capacity=8)
        d, idx = training_activation(desc, cb.codewords, params, "l2")
        assert idx.shape[0] == 20
        votes = cast_votes(cb, jnp.asarray(desc), jnp.asarray(pos),
                           jnp.asarray(frames), jnp.asarray(mask),
                           params, "l2")
        v = np.asarray(votes.valid)
        assert np.asarray(votes.position).shape[1] == 3
        assert np.all(np.isfinite(np.asarray(votes.position)[v])), strategy


def test_fpfh_properties(rng):
    import jax.numpy as jnp
    from point_cloud_donkey_tpu.ops.fpfh import fpfh_descriptor
    # plane: FPFH should concentrate in the "flat" bins and be consistent
    xy = rng.uniform(-1, 1, (800, 2)).astype(np.float32)
    pts = np.concatenate([xy, np.zeros((800, 1), np.float32)], 1)
    normals = np.tile([0, 0, 1.0], (800, 1)).astype(np.float32)
    kp = pts[:8]
    res = fpfh_descriptor(jnp.asarray(kp), jnp.ones(8, bool), jnp.asarray(pts),
                          jnp.asarray(normals), jnp.ones(800, bool), 0.3)
    D = np.asarray(res.descriptors)
    assert D.shape == (8, 33)
    assert np.asarray(res.valid).all()
    # each 11-bin block sums to ~100 (PCL normalization)
    np.testing.assert_allclose(D.reshape(8, 3, 11).sum(2), 100.0, rtol=1e-3)
    # flat surface: f1 ~ 0 -> middle bin dominates the first block
    assert np.argmax(D[:, :11], axis=1).tolist() == [5] * 8


def test_fpfh_distinguishes_plane_from_sphere(rng):
    import jax.numpy as jnp
    from point_cloud_donkey_tpu.ops.fpfh import fpfh_descriptor
    xy = rng.uniform(-1, 1, (800, 2)).astype(np.float32)
    plane = np.concatenate([xy, np.zeros((800, 1), np.float32)], 1)
    n_plane = np.tile([0, 0, 1.0], (800, 1)).astype(np.float32)
    v = rng.normal(size=(800, 3)); v /= np.linalg.norm(v, axis=1, keepdims=True)
    sphere = v.astype(np.float32)
    d1 = np.asarray(fpfh_descriptor(jnp.asarray(plane[:4]), jnp.ones(4, bool),
                                    jnp.asarray(plane), jnp.asarray(n_plane),
                                    jnp.ones(800, bool), 0.3).descriptors)
    d2 = np.asarray(fpfh_descriptor(jnp.asarray(sphere[:4]), jnp.ones(4, bool),
                                    jnp.asarray(sphere), jnp.asarray(sphere),
                                    jnp.ones(800, bool), 0.3).descriptors)
    assert np.abs(d1.mean(0) - d2.mean(0)).max() > 5.0


def test_cgf_raw_and_embedding(rng):
    import jax.numpy as jnp
    from point_cloud_donkey_tpu.ops.cgf import (CgfEmbedding, cgf_descriptor,
                                                cgf_raw_histogram, CGF_RAW_LEN)
    from point_cloud_donkey_tpu.ops.lrf import shot_lrf
    from point_cloud_donkey_tpu.ops.neighbors import gather_radius_neighbors
    pts = rng.normal(size=(600, 3)).astype(np.float32)
    pts *= np.array([1.5, 1.0, 0.6], np.float32)
    mask = np.ones(600, bool)
    kp = pts[:6]
    lrf = shot_lrf(jnp.asarray(kp), jnp.ones(6, bool), jnp.asarray(pts),
                   jnp.asarray(mask), 0.6)
    nbr = gather_radius_neighbors(jnp.asarray(kp), jnp.asarray(pts),
                                  jnp.asarray(mask), 0.8, capacity=600)
    normals = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    raw = np.asarray(cgf_raw_histogram(jnp.asarray(kp), jnp.asarray(normals[:6]),
                                       lrf.frames, lrf.valid, jnp.asarray(pts),
                                       nbr, 0.8))
    assert raw.shape == (6, CGF_RAW_LEN)
    # density normalization: each histogram sums to 1 (given >0 neighbors)
    np.testing.assert_allclose(raw.sum(1), 1.0, atol=1e-4)
    emb = CgfEmbedding.random_projection(32, seed=0)
    res = cgf_descriptor(jnp.asarray(kp), jnp.asarray(normals[:6]), lrf.frames,
                         lrf.valid, jnp.asarray(pts), nbr, 0.8, embedding=emb)
    assert np.asarray(res.descriptors).shape == (6, 32)
    assert np.asarray(res.valid).all()


def test_cgf_shipped_embedding_discriminative():
    """The shipped checkpoint (data/cgf_embedding.npz, trained on synthetic
    correspondences by cli/train_cgf_embedding.py) maps re-samplings of the
    same surface location closer together than different locations."""
    import os

    import jax
    import jax.numpy as jnp
    from point_cloud_donkey_tpu.ops.cgf import (CgfEmbedding, cgf_raw_histogram,
                                                default_checkpoint_path)
    from point_cloud_donkey_tpu.ops.lrf import shot_lrf
    from point_cloud_donkey_tpu.ops.neighbors import gather_radius_neighbors
    import shapes

    path = default_checkpoint_path()
    assert os.path.exists(path), "shipped CGF checkpoint missing"
    emb = CgfEmbedding.from_npz(path)
    rng = np.random.default_rng(99)  # own stream: keep the shared fixture's
    # draw order unchanged for the other tests

    radius = 0.6
    base = shapes.SHAPES[1](np.random.default_rng(5), 1024)  # box
    kp = base[::101][:8].astype(np.float32)

    def hist(sample_seed):
        pts = shapes.SHAPES[1](np.random.default_rng(sample_seed), 1024)
        pts = (pts + rng.normal(scale=0.008, size=pts.shape)).astype(np.float32)
        mask = jnp.ones(len(pts), bool)
        lrf = shot_lrf(jnp.asarray(kp), jnp.ones(len(kp), bool),
                       jnp.asarray(pts), mask, 0.75 * radius)
        nbr = gather_radius_neighbors(jnp.asarray(kp), jnp.asarray(pts), mask,
                                      radius, capacity=512)
        nrm = pts / np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
        return cgf_raw_histogram(jnp.asarray(kp), jnp.asarray(nrm[:len(kp)]),
                                 lrf.frames, lrf.valid, jnp.asarray(pts),
                                 nbr, radius)

    za = np.array(emb(hist(11)))
    zb = np.array(emb(hist(12)))
    za /= np.maximum(np.linalg.norm(za, axis=1, keepdims=True), 1e-9)
    zb /= np.maximum(np.linalg.norm(zb, axis=1, keepdims=True), 1e-9)
    sim = za @ zb.T
    same = np.diag(sim)
    other = (sim.sum(1) - same) / (len(kp) - 1)
    # correspondences beat the average non-correspondence for most keypoints
    assert (same > other).mean() >= 0.75, (same, other)
    assert same.mean() - other.mean() > 0.1


def test_native_loader_kernels(rng, tmp_path):
    """Native LZF + float parsing match the pure-Python paths."""
    from point_cloud_donkey_tpu.utils import native
    from point_cloud_donkey_tpu.utils.io import (PointCloud, _lzf_decompress,
                                                 load_pcd, save_pcd)
    # float parser vs numpy
    text = b" 1.5 -2.25 3e2\n4.125\t-0.5 "
    out = native.parse_floats(text, 10)
    if out is not None:
        np.testing.assert_allclose(out, [1.5, -2.25, 300.0, 4.125, -0.5])

    # ascii PCD round trip exercises the native parser end-to-end
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    p = str(tmp_path / "c.pcd")
    save_pcd(p, PointCloud(xyz=pts))
    c = load_pcd(p)
    np.testing.assert_allclose(c.xyz, pts, rtol=1e-6)

    # LZF: compress with a trivial literal-only encoder, decompress natively
    payload = rng.integers(0, 255, 1000).astype(np.uint8).tobytes()
    chunks = []
    for i in range(0, len(payload), 31):
        blk = payload[i:i + 31]
        chunks.append(bytes([len(blk) - 1]) + blk)
    comp = b"".join(chunks)
    ref = _lzf_decompress(comp, len(payload))
    assert ref == payload
    nat = native.lzf_decompress(comp, len(payload))
    if nat is not None:
        assert nat == payload


def test_cshot_dense_jit_pipeline():
    """CSHOT (the reference's default.ism descriptor) through the dense
    serving path, incl. the sharded batched_classify wrapper with RGB."""
    import shapes
    import jax
    import jax.numpy as jnp
    from point_cloud_donkey_tpu.models.pipeline_jit import (
        JitPipelineConfig, extract_features_jit)
    rng = np.random.default_rng(0)
    pts = np.asarray(shapes.torus(rng, 1024), np.float32)
    rgb = ((pts - pts.min(0)) / (pts.max(0) - pts.min(0))).astype(np.float32)
    cfg = JitPipelineConfig(descriptor="CSHOT", radius=0.6,
                            ref_frame_radius=0.5, leaf_size=0.35,
                            normal_radius=0.25, keypoint_capacity=128,
                            neighbor_capacity=512)
    kp, fr, desc, valid = jax.jit(
        lambda p, m, r: extract_features_jit(p, m, cfg, r))(
        jnp.asarray(pts), jnp.ones(len(pts), bool), jnp.asarray(rgb))
    assert desc.shape[1] == 1344
    assert int(valid.sum()) > 5
    assert bool(jnp.all(jnp.isfinite(desc)))
    # color part is populated (slots 352+)
    d = np.asarray(desc)[np.asarray(valid)]
    assert d[:, 352:].sum() > 0


def _synthetic_training_set(rng, n_models=5, n_classes=3, n_feat=16, dim=16):
    """Random FeatureSets + boxes for codebook-training A/B tests."""
    from point_cloud_donkey_tpu.models.types import FeatureSet
    from point_cloud_donkey_tpu.ops import geometry as geo

    def rand_frame():
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] = -q[:, 0]
        return q.astype(np.float32)

    feats, classes, insts, boxes = [], [], [], []
    for m in range(n_models):
        desc = np.abs(rng.normal(size=(n_feat, dim))).astype(np.float32)
        desc /= desc.sum(axis=1, keepdims=True)
        pos = rng.normal(size=(n_feat, 3)).astype(np.float32)
        frames = np.stack([rand_frame() for _ in range(n_feat)])
        fs = FeatureSet(desc, pos, frames, np.ones(n_feat, bool),
                        np.linalg.norm(pos, axis=1).astype(np.float32),
                        np.ones(n_feat, np.float32))
        feats.append(fs)
        classes.append(m % n_classes)
        insts.append(m)
        boxes.append(geo.BoundingBox(
            position=rng.normal(size=3).astype(np.float32),
            size=np.abs(rng.normal(size=3)).astype(np.float32) + 0.5,
            quat=np.array([1, 0, 0, 0], np.float32)))
    return feats, classes, insts, boxes


@pytest.mark.parametrize("activation,k", [("KNN", 1), ("KNN", 3),
                                          ("Threshold", 0),
                                          ("KNNRule", 0)])
def test_train_codebook_vectorized_matches_loop(rng, activation, k):
    """The vectorized train_codebook must reproduce the loop oracle
    bit-for-bit (codeword set, votes, weights, sigmas)."""
    from point_cloud_donkey_tpu.models.codebook import (
        CodebookParams, train_codebook, train_codebook_loop)

    feats, classes, insts, boxes = _synthetic_training_set(rng)
    all_desc = np.concatenate([f.descriptors for f in feats])
    # clustering None: codewords = features (subset for multi-vote groups)
    cw = all_desc[::2]
    cw_pos = np.concatenate([f.positions for f in feats])[::2]

    params = CodebookParams(activation_type=activation, knn_k=max(k, 1),
                            threshold=2.0, threshold_capacity=8,
                            use_class_weight=True)
    a = train_codebook(feats, classes, insts, boxes, cw, cw_pos, params, "chisq")
    b = train_codebook_loop(feats, classes, insts, boxes, cw, cw_pos,
                            params, "chisq")

    assert a.votes.shape == b.votes.shape
    for name in a._fields:
        av, bv = getattr(a, name), getattr(b, name)
        np.testing.assert_allclose(av, bv, rtol=1e-6, atol=1e-7,
                                   err_msg=f"field {name} differs")


def test_center_weight_self_reconstruction():
    """A k=1-cleaned codebook's vote weight must be exactly exp(0)=1: the
    vote reconstructs its own model center (keypoint + rotateBack(vote) ==
    center).  Guards the rotate-back convention in the center-weight
    computation (F is rows-are-axes: local = F @ world, world = F^T @ local)."""
    from point_cloud_donkey_tpu.models.codebook import (CodebookParams,
                                                        train_codebook)
    from point_cloud_donkey_tpu.models.types import FeatureSet
    from point_cloud_donkey_tpu.ops import geometry as geo

    rng = np.random.default_rng(3)
    n_feat = 8
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    frames = np.stack([np.linalg.qr(rng.normal(size=(3, 3)))[0]
                       for _ in range(n_feat)]).astype(np.float32)
    desc = np.abs(rng.normal(size=(n_feat, 16))).astype(np.float32)
    pos = rng.normal(size=(n_feat, 3)).astype(np.float32)
    fs = FeatureSet(desc, pos, frames, np.ones(n_feat, bool),
                    np.linalg.norm(pos, axis=1).astype(np.float32),
                    np.ones(n_feat, np.float32))
    box = geo.BoundingBox(position=rng.normal(size=3).astype(np.float32),
                          size=np.ones(3, np.float32),
                          quat=np.array([1, 0, 0, 0], np.float32))
    cb = train_codebook([fs], [0], [0], [box], desc, pos,
                        CodebookParams(knn_k=1), "l2")
    w = cb.vote_weight[cb.vote_mask]
    np.testing.assert_allclose(w, 1.0, atol=1e-5)
