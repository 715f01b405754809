"""Golden descriptor fixtures: value-level parity of the batched JAX kernels
against independent loop-based oracles (tests/golden_ref.py) on a fixed
cloud, pinned in tests/golden/descriptors.npz.

The fixture decouples two guarantees:
  1. oracle == fixture  -- pins the plain-Python algorithm transcription, so
     neither side can drift silently;
  2. JAX kernel == fixture -- any vectorization/masking/binning change in
     ops/ must reproduce the same numbers (within fp32 summation noise).

Regenerate after an *intentional* semantic change with:
    python tests/test_golden_descriptors.py regen
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
import golden_ref  # noqa: E402

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "descriptors.npz")

RADIUS = 0.6
N_KP = 6
NARF_SUPPORT = 0.5
NARF_FOCAL = 100.0
ESF_SAMPLES_TEST = 2000   # full 20000 would make the loop oracle minutes


def _esf_indices(pts):
    from point_cloud_donkey_tpu.ops.global_descriptors import \
        esf_sample_indices
    ia, ib, ic = esf_sample_indices(len(pts), jnp.ones(len(pts), bool),
                                    seed=0, samples=ESF_SAMPLES_TEST)
    return np.asarray(ia), np.asarray(ib), np.asarray(ic)


def _narf_fixture():
    """Small synthetic range image (smooth waves + a depth step + a hole
    block) and 4 keypoints; shared input for the NARF descriptor oracle the
    way `frames` is for SHOT."""
    H, W = 96, 128
    v, u = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = 2.0 + 0.3 * np.sin(u / 9.0) * np.cos(v / 7.0)
    img[:, 80:] += 0.6                       # depth step edge
    img[30:42, 20:34] = np.inf               # hole block
    img = img.astype(np.float32)
    kp_vu = np.array([[48.0, 40.0], [50.0, 78.0], [36.0, 40.0],
                      [70.0, 100.0]], np.float32)
    kp_xyz = []
    for vv, uu in kp_vu:
        d = np.array([(uu - W / 2.0) / NARF_FOCAL,
                      (vv - H / 2.0) / NARF_FOCAL, 1.0])
        d /= np.linalg.norm(d)
        kp_xyz.append(d * img[int(vv), int(uu)])
    return img, kp_vu, np.array(kp_xyz, np.float32)


def _fixture_cloud():
    """Fixed ellipsoid cloud with analytic normals, smooth position-derived
    colors, and 6 keypoints."""
    rng = np.random.default_rng(1234)
    a, b, c = 1.3, 0.8, 0.5
    v = rng.normal(size=(400, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = (v * np.array([a, b, c])).astype(np.float32)
    nrm = pts / np.array([a * a, b * b, c * c], np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    # byte-quantized colors (the reference indexes a 256-entry LUT by byte)
    rgb_f = 0.5 + 0.5 * np.stack([np.sin(3.0 * pts[:, 0]),
                                  np.cos(2.0 * pts[:, 1]),
                                  np.sin(4.0 * pts[:, 2])], axis=1)
    rgb = np.round(rgb_f * 255.0) / 255.0
    kp = pts[::67][:N_KP].copy()
    return pts, nrm.astype(np.float32), rgb.astype(np.float32), kp


def _compute_golden():
    pts, nrm, rgb, kp = _fixture_cloud()
    p64, n64, k64 = pts.astype(np.float64), nrm.astype(np.float64), \
        kp.astype(np.float64)
    rgb64 = rgb.astype(np.float64)
    kp_rgb64 = rgb64[::67][:N_KP].copy()
    frames = np.stack([golden_ref.shot_lrf_ref(k, p64, RADIUS) for k in k64])
    shot = np.stack([
        golden_ref.shot_ref(k, f, p64, n64, RADIUS)
        for k, f in zip(k64, frames)])
    sshot = np.stack([
        golden_ref.short_shot_ref(k, f, p64, RADIUS)
        for k, f in zip(k64, frames)])
    fpfh = np.stack([golden_ref.fpfh_ref(k, p64, n64, RADIUS) for k in k64])
    cshot = np.stack([
        golden_ref.cshot_ref(k, kr, f, p64, n64, rgb64, RADIUS)
        for k, kr, f in zip(k64, kp_rgb64, frames)])
    scshot = np.stack([
        golden_ref.short_cshot_ref(k, kr, f, p64, rgb64, RADIUS)
        for k, kr, f in zip(k64, kp_rgb64, frames)])
    pfh = np.stack([golden_ref.pfh_ref(k, p64, n64, RADIUS) for k in k64])
    spin = np.stack([
        golden_ref.spin_image_ref(k, n64[i * 67], p64, RADIUS)
        for i, k in enumerate(k64)])
    cospair = np.stack([
        golden_ref.cospair_ref(k, n64[i * 67], p64, n64, rgb64, RADIUS)
        for i, k in enumerate(k64)])
    sc3d = np.stack([
        golden_ref.shape_context_ref(k, f, p64, RADIUS)
        for k, f in zip(k64, frames)])
    bshot = np.stack([golden_ref.bshot_binarize_ref(s) for s in shot])
    rsd = np.stack([
        golden_ref.rsd_ref(k, n64[i * 67], p64, n64, RADIUS)
        for i, k in enumerate(k64)])
    # RIFT: gradients are a shared input (like frames for SHOT) so the
    # histogram stage is pinned independently of gradient estimation
    from point_cloud_donkey_tpu.ops.shape_context import intensity_gradients
    intensity = np.mean(rgb, axis=1).astype(np.float32)
    grads = np.asarray(intensity_gradients(
        jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(intensity),
        jnp.ones(len(pts), bool), RADIUS)).astype(np.float64)
    rift = np.stack([
        golden_ref.rift_ref(k, p64, grads, RADIUS) for k in k64])
    rops = np.stack([golden_ref.rops_ref(k, p64, RADIUS) for k in k64])
    cgf_raw = np.stack([
        golden_ref.cgf_raw_ref(k, n64[i * 67], f, p64, RADIUS)
        for i, (k, f) in enumerate(zip(k64, frames))])
    # SHORT_SHOT_PCL = PCL SHOT with default ("fake") zero normals
    # (features_short_shot_pcl.cpp:42-53) -> same oracle, zeroed normals
    shot_pcl = np.stack([
        golden_ref.shot_ref(k, f, p64, np.zeros_like(n64), RADIUS)
        for k, f in zip(k64, frames)])
    gasd = golden_ref.gasd_ref(p64)
    gasd_color = golden_ref.gasd_ref(p64, rgb64)
    n_img, n_vu, n_xyz = _narf_fixture()
    narf = np.stack([
        golden_ref.narf_ref(n_img.astype(np.float64), vu, x,
                            NARF_SUPPORT, NARF_FOCAL)
        for vu, x in zip(n_vu, n_xyz)])
    # ESF: the sampled index streams are shared inputs (like frames for
    # SHOT), pinning the grid / line-tracing / histogram structure
    esf_idx = np.stack(_esf_indices(pts))
    esf = golden_ref.esf_ref(p64, *esf_idx)
    vfh = golden_ref.vfh_ref(p64, n64)
    grsd_types = golden_ref.grsd_types_ref(p64, n64, RADIUS)
    grsd = golden_ref.grsd_ref(p64, n64, RADIUS, types=grsd_types)
    return {"points": pts, "normals": nrm, "rgb": rgb, "keypoints": kp,
            "kp_rgb": rgb[::67][:N_KP].copy(),
            "frames": frames, "shot": shot, "short_shot": sshot,
            "fpfh": fpfh, "cshot": cshot, "short_cshot": scshot,
            "pfh": pfh, "spin_image": spin, "cospair": cospair,
            "shape_context": sc3d, "bshot": bshot, "rsd": rsd,
            "gradients": grads.astype(np.float32), "rift": rift,
            "rops": rops, "cgf_raw": cgf_raw, "shot_pcl": shot_pcl,
            "gasd": gasd, "gasd_color": gasd_color,
            "narf_img": n_img, "narf_vu": n_vu, "narf_xyz": n_xyz,
            "narf": narf, "esf_idx": esf_idx, "esf": esf,
            "vfh": vfh, "grsd": grsd, "grsd_types": grsd_types}


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(GOLDEN_PATH), \
        "missing golden fixture; run: python tests/test_golden_descriptors.py regen"
    return dict(np.load(GOLDEN_PATH))


def test_oracle_matches_fixture(golden):
    """Pins the loop-based oracle itself: recompute and compare."""
    fresh = _compute_golden()
    for key in ("frames", "shot", "short_shot", "fpfh", "cshot",
                "short_cshot", "pfh", "spin_image", "cospair",
                "shape_context", "bshot", "rsd", "rift", "rops",
                "cgf_raw", "shot_pcl", "gasd", "gasd_color", "narf",
                "esf", "vfh", "grsd"):
        np.testing.assert_allclose(fresh[key], golden[key], atol=1e-12,
                                   err_msg=key)


def test_shot_lrf_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.lrf import shot_lrf
    pts, kp = golden["points"], golden["keypoints"]
    res = shot_lrf(jnp.asarray(kp), jnp.ones(len(kp), bool),
                   jnp.asarray(pts), jnp.ones(len(pts), bool), RADIUS)
    assert bool(np.all(res.valid))
    np.testing.assert_allclose(np.asarray(res.frames), golden["frames"],
                               atol=2e-3)


def test_shot_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.shot import shot_descriptor_dense
    pts, nrm, kp = golden["points"], golden["normals"], golden["keypoints"]
    frames = golden["frames"].astype(np.float32)  # decouple from LRF noise
    res = shot_descriptor_dense(
        jnp.asarray(kp), jnp.asarray(frames), jnp.ones(len(kp), bool),
        jnp.asarray(pts), jnp.asarray(nrm), jnp.ones(len(pts), bool), RADIUS)
    assert bool(np.all(res.valid))
    np.testing.assert_allclose(np.asarray(res.descriptors), golden["shot"],
                               atol=2e-3)


def test_short_shot_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.short_shot import short_shot_descriptor_dense
    pts, kp = golden["points"], golden["keypoints"]
    frames = golden["frames"].astype(np.float32)
    res = short_shot_descriptor_dense(
        jnp.asarray(kp), jnp.asarray(frames), jnp.ones(len(kp), bool),
        jnp.asarray(pts), jnp.ones(len(pts), bool), RADIUS)
    assert bool(np.all(res.valid))
    np.testing.assert_allclose(np.asarray(res.descriptors),
                               golden["short_shot"], atol=2e-3)


def test_fpfh_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.fpfh import fpfh_descriptor
    pts, nrm, kp = golden["points"], golden["normals"], golden["keypoints"]
    res = fpfh_descriptor(
        jnp.asarray(kp), jnp.ones(len(kp), bool), jnp.asarray(pts),
        jnp.asarray(nrm), jnp.ones(len(pts), bool), RADIUS,
        capacity=len(pts))
    assert bool(np.all(res.valid))
    # FPFH bins hold values up to ~100 -> absolute tolerance scales with that
    np.testing.assert_allclose(np.asarray(res.descriptors), golden["fpfh"],
                               atol=0.15)


def test_cshot_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.shot import cshot_descriptor_dense
    pts, nrm, rgb = golden["points"], golden["normals"], golden["rgb"]
    kp, kp_rgb = golden["keypoints"], golden["kp_rgb"]
    frames = golden["frames"].astype(np.float32)
    res = cshot_descriptor_dense(
        jnp.asarray(kp), jnp.asarray(kp_rgb), jnp.asarray(frames),
        jnp.ones(len(kp), bool), jnp.asarray(pts), jnp.asarray(nrm),
        jnp.asarray(rgb), jnp.ones(len(pts), bool), RADIUS)
    assert bool(np.all(res.valid))
    np.testing.assert_allclose(np.asarray(res.descriptors), golden["cshot"],
                               atol=2e-3)


def test_short_cshot_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.neighbors import gather_radius_neighbors
    from point_cloud_donkey_tpu.ops.short_shot import short_cshot_descriptor
    pts, rgb = golden["points"], golden["rgb"]
    kp, kp_rgb = golden["keypoints"], golden["kp_rgb"]
    frames = golden["frames"].astype(np.float32)
    nbr = gather_radius_neighbors(jnp.asarray(kp), jnp.asarray(pts),
                                  jnp.ones(len(pts), bool), RADIUS,
                                  capacity=len(pts))
    res = short_cshot_descriptor(
        jnp.asarray(kp), jnp.asarray(kp_rgb), jnp.asarray(frames),
        jnp.ones(len(kp), bool), jnp.asarray(pts), jnp.asarray(rgb),
        nbr, RADIUS)
    assert bool(np.all(res.valid))
    np.testing.assert_allclose(np.asarray(res.descriptors),
                               golden["short_cshot"], atol=2e-3)


def test_pfh_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.descriptors_misc import pfh_descriptor
    from point_cloud_donkey_tpu.ops.neighbors import gather_radius_neighbors
    pts, nrm, kp = golden["points"], golden["normals"], golden["keypoints"]
    nbr = gather_radius_neighbors(jnp.asarray(kp), jnp.asarray(pts),
                                  jnp.ones(len(pts), bool), RADIUS,
                                  capacity=len(pts))
    res = pfh_descriptor(jnp.asarray(kp), jnp.ones(len(kp), bool),
                         jnp.asarray(pts), jnp.asarray(nrm), nbr)
    assert bool(np.all(res.valid))
    # bins hold percentages (up to ~100)
    np.testing.assert_allclose(np.asarray(res.descriptors), golden["pfh"],
                               atol=0.15)


def test_spin_image_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.descriptors_misc import spin_image_descriptor
    from point_cloud_donkey_tpu.ops.neighbors import gather_radius_neighbors
    pts, nrm, kp = golden["points"], golden["normals"], golden["keypoints"]
    axes = nrm[::67][:N_KP]
    nbr = gather_radius_neighbors(jnp.asarray(kp), jnp.asarray(pts),
                                  jnp.ones(len(pts), bool), RADIUS,
                                  capacity=len(pts))
    res = spin_image_descriptor(jnp.asarray(kp), jnp.asarray(axes),
                                jnp.ones(len(kp), bool), jnp.asarray(pts),
                                nbr, RADIUS)
    assert bool(np.all(res.valid))
    np.testing.assert_allclose(np.asarray(res.descriptors),
                               golden["spin_image"], atol=2e-4)


def test_cospair_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.cospair import cospair_descriptor
    from point_cloud_donkey_tpu.ops.neighbors import gather_radius_neighbors
    pts, nrm, rgb = golden["points"], golden["normals"], golden["rgb"]
    kp = golden["keypoints"]
    kp_nrm = nrm[::67][:N_KP]
    kp_rgb = golden["kp_rgb"]
    nbr = gather_radius_neighbors(jnp.asarray(kp), jnp.asarray(pts),
                                  jnp.ones(len(pts), bool), RADIUS,
                                  capacity=len(pts))
    res = cospair_descriptor(jnp.asarray(kp), jnp.asarray(kp_nrm),
                             jnp.asarray(kp_rgb), jnp.ones(len(kp), bool),
                             jnp.asarray(pts), jnp.asarray(nrm),
                             jnp.asarray(rgb), nbr, RADIUS)
    assert bool(np.all(res.valid))
    np.testing.assert_allclose(np.asarray(res.descriptors),
                               golden["cospair"], atol=2e-3)


def test_shape_context_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.shape_context import shape_context_descriptor
    from point_cloud_donkey_tpu.ops.neighbors import gather_radius_neighbors
    pts, kp = golden["points"], golden["keypoints"]
    frames = golden["frames"].astype(np.float32)
    nbr = gather_radius_neighbors(jnp.asarray(kp), jnp.asarray(pts),
                                  jnp.ones(len(pts), bool), RADIUS,
                                  capacity=len(pts))
    res = shape_context_descriptor(jnp.asarray(kp), jnp.asarray(frames),
                                   jnp.ones(len(kp), bool), jnp.asarray(pts),
                                   nbr, RADIUS)
    assert bool(np.all(res.valid))
    np.testing.assert_allclose(np.asarray(res.descriptors),
                               golden["shape_context"], rtol=2e-3, atol=1e-4)


def test_rsd_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.neighbors import gather_radius_neighbors
    from point_cloud_donkey_tpu.ops.shape_context import rsd_descriptor
    pts, nrm, kp = golden["points"], golden["normals"], golden["keypoints"]
    nbr = gather_radius_neighbors(jnp.asarray(kp), jnp.asarray(pts),
                                  jnp.ones(len(pts), bool), RADIUS,
                                  capacity=len(pts))
    res = rsd_descriptor(jnp.asarray(kp), jnp.ones(len(kp), bool),
                         jnp.asarray(pts), jnp.asarray(nrm), nbr, RADIUS,
                         use_hist=True)
    assert bool(np.all(res.valid))
    np.testing.assert_allclose(np.asarray(res.descriptors), golden["rsd"],
                               atol=1e-5)


def test_rift_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.neighbors import gather_radius_neighbors
    from point_cloud_donkey_tpu.ops.shape_context import rift_descriptor
    pts, kp = golden["points"], golden["keypoints"]
    nbr = gather_radius_neighbors(jnp.asarray(kp), jnp.asarray(pts),
                                  jnp.ones(len(pts), bool), RADIUS,
                                  capacity=len(pts))
    res = rift_descriptor(jnp.asarray(kp), jnp.ones(len(kp), bool),
                          jnp.asarray(pts), jnp.asarray(golden["gradients"]),
                          nbr, RADIUS)
    assert bool(np.all(res.valid))
    np.testing.assert_allclose(np.asarray(res.descriptors), golden["rift"],
                               atol=2e-4)


def test_rops_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.neighbors import gather_radius_neighbors
    from point_cloud_donkey_tpu.ops.rops import rops_descriptor
    pts, kp = golden["points"], golden["keypoints"]
    nbr = gather_radius_neighbors(jnp.asarray(kp), jnp.asarray(pts),
                                  jnp.ones(len(pts), bool), RADIUS,
                                  capacity=len(pts))
    res = rops_descriptor(jnp.asarray(kp), jnp.ones(len(kp), bool),
                          jnp.asarray(pts), nbr, RADIUS)
    assert bool(np.all(res.valid))
    # hard 5x5 binning after an fp32 LRF: a single boundary flip moves a
    # moment by ~1/|support|; tolerance sits below that while still pinning
    # any systematic divergence
    np.testing.assert_allclose(np.asarray(res.descriptors), golden["rops"],
                               atol=5e-3)


def test_cgf_raw_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.cgf import cgf_raw_histogram
    from point_cloud_donkey_tpu.ops.neighbors import gather_radius_neighbors
    pts, nrm, kp = golden["points"], golden["normals"], golden["keypoints"]
    kp_nrm = nrm[::67][:N_KP]
    frames = golden["frames"].astype(np.float32)
    nbr = gather_radius_neighbors(jnp.asarray(kp), jnp.asarray(pts),
                                  jnp.ones(len(pts), bool), RADIUS,
                                  capacity=len(pts))
    out = cgf_raw_histogram(jnp.asarray(kp), jnp.asarray(kp_nrm),
                            jnp.asarray(frames), jnp.ones(len(kp), bool),
                            jnp.asarray(pts), nbr, RADIUS)
    np.testing.assert_allclose(np.asarray(out), golden["cgf_raw"], atol=2e-4)


def test_short_shot_pcl_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.shot import shot_descriptor_dense
    pts, kp = golden["points"], golden["keypoints"]
    frames = golden["frames"].astype(np.float32)
    res = shot_descriptor_dense(
        jnp.asarray(kp), jnp.asarray(frames), jnp.ones(len(kp), bool),
        jnp.asarray(pts), jnp.zeros_like(jnp.asarray(pts)),
        jnp.ones(len(pts), bool), RADIUS)
    assert bool(np.all(res.valid))
    np.testing.assert_allclose(np.asarray(res.descriptors),
                               golden["shot_pcl"], atol=2e-3)


def test_gasd_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.global_descriptors import gasd_descriptor
    pts, rgb = golden["points"], golden["rgb"]
    ones = jnp.ones(len(pts), bool)
    out = np.asarray(gasd_descriptor(jnp.asarray(pts), ones))
    # counts/N over hard grid bins: one fp32/fp64 boundary flip moves two
    # bins by 1/400 each
    np.testing.assert_allclose(out, golden["gasd"], atol=6e-3)
    out_c = np.asarray(gasd_descriptor(jnp.asarray(pts), ones,
                                       jnp.asarray(rgb)))
    np.testing.assert_allclose(out_c, golden["gasd_color"], atol=6e-3)


def test_narf_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.narf import NarfKeypoints, narf_descriptor
    kp_vu, kp_xyz = golden["narf_vu"], golden["narf_xyz"]
    kp = NarfKeypoints(uv=jnp.asarray(kp_vu), xyz=jnp.asarray(kp_xyz),
                       score=jnp.ones(len(kp_vu)),
                       valid=jnp.ones(len(kp_vu), bool))
    desc, valid = narf_descriptor(jnp.asarray(golden["narf_img"]), kp,
                                  NARF_SUPPORT, focal=NARF_FOCAL)
    assert bool(np.all(valid))
    np.testing.assert_allclose(np.asarray(desc), golden["narf"], atol=2e-4)


def test_esf_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.global_descriptors import esf_descriptor
    pts = golden["points"]
    idx = tuple(jnp.asarray(i) for i in golden["esf_idx"])
    out = np.asarray(esf_descriptor(jnp.asarray(pts),
                                    jnp.ones(len(pts), bool), indices=idx))
    # counts normalized over ~4x2000 samples; one fp32/fp64 voxel flip
    # moves two bins by ~1/8000
    np.testing.assert_allclose(out, golden["esf"], atol=1e-3)


def test_esf_padding_invariant(golden):
    """The sample-index streams draw over valid points only, so padding the
    cloud to a larger bucket must not change the descriptor."""
    from point_cloud_donkey_tpu.ops.global_descriptors import esf_descriptor
    pts = golden["points"]
    n = len(pts)
    base = np.asarray(esf_descriptor(jnp.asarray(pts), jnp.ones(n, bool)))
    pad = np.concatenate([pts, np.full((57, 3), 1e6, pts.dtype)])
    padded = np.asarray(esf_descriptor(jnp.asarray(pad),
                                       jnp.arange(n + 57) < n))
    np.testing.assert_allclose(padded, base, atol=0)

    # adversarial min-corner case: padding rows must NOT spuriously occupy
    # voxel (0,0,0) — the cloud has points near the min corner so traced
    # lines cross that cell and would flip IN/OUT classes if it were set
    rng = np.random.default_rng(8)
    corner = np.concatenate([
        np.array([[0.02, 0.0, 0.0], [0.0, 0.02, 0.02]], np.float32),
        rng.uniform(0.3, 1.0, (303, 3)).astype(np.float32)])
    m = len(corner)
    base_c = np.asarray(esf_descriptor(jnp.asarray(corner),
                                       jnp.ones(m, bool)))
    pad_c = np.concatenate([corner, np.full((50, 3), 1e6, np.float32)])
    padded_c = np.asarray(esf_descriptor(jnp.asarray(pad_c),
                                         jnp.arange(m + 50) < m))
    np.testing.assert_allclose(padded_c, base_c, atol=0)


def test_vfh_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.global_descriptors import vfh_descriptor
    pts, nrm = golden["points"], golden["normals"]
    out = np.asarray(vfh_descriptor(jnp.asarray(pts), jnp.asarray(nrm),
                                    jnp.ones(len(pts), bool)))
    # percentage-normalized counts (one count = 0.25 on the 400-pt cloud);
    # fp32 bin-edge flips would show as paired +/-0.25 moves
    np.testing.assert_allclose(out, golden["vfh"], atol=1e-3)


def test_grsd_matches_golden(golden):
    """Transition histogram pinned exactly given the oracle's surface
    classes (shared input); the fp32 class stage is pinned separately with
    a borderline allowance in test_grsd_types_near_oracle."""
    from point_cloud_donkey_tpu.ops.global_descriptors import grsd_descriptor
    pts, nrm = golden["points"], golden["normals"]
    out = np.asarray(grsd_descriptor(jnp.asarray(pts), jnp.asarray(nrm),
                                     jnp.ones(len(pts), bool), RADIUS,
                                     types=jnp.asarray(golden["grsd_types"])))
    # a few pairs at d ~= radius flip between the fp32 matmul distance and
    # the exact fp64 oracle distance; each moves a normalized count ~2e-4
    np.testing.assert_allclose(out, golden["grsd"], atol=1e-3)


def test_grsd_types_near_oracle(golden):
    """The fp32 surface classes agree with the fp64 oracle except for a
    small borderline fraction (the RSD radius d/(2 sin(ang/2)) amplifies
    precision noise for near-parallel normals around the thresholds)."""
    from point_cloud_donkey_tpu.ops.global_descriptors import (_rsd_radii,
                                                               _surface_type)
    pts, nrm = golden["points"], golden["normals"]
    r_min, r_max, has = _rsd_radii(jnp.asarray(pts), jnp.asarray(nrm),
                                   jnp.ones(len(pts), bool), RADIUS)
    t = np.asarray(jnp.where(has, _surface_type(r_min, r_max, RADIUS), 5))
    mismatch = np.mean(t != golden["grsd_types"])
    assert mismatch <= 0.05, f"{mismatch:.3f} of surface classes flipped"


def test_esf_local_matches_oracle_subclouds(golden):
    """ESF_LOCAL = the pinned ESF core over each keypoint's in-radius
    sub-cloud (features_esf_local.cpp:36-83: flann radius search -> PCL ESF
    per sub-cloud).  The sub-clouds are rebuilt independently in numpy
    (exact distances, ascending sort = the PCL radiusSearch order), so this
    pins the dispatch path's neighbor gather and count gating on top of the
    ESF core already pinned against the loop oracle."""
    from point_cloud_donkey_tpu.models.features import (FeatureConfig,
                                                        _descriptor_fn)
    from point_cloud_donkey_tpu.ops.global_descriptors import esf_descriptor
    pts, kp = golden["points"], golden["keypoints"]
    n, k = len(pts), len(kp)
    # one far-away keypoint: <3 neighbors must invalidate, not crash
    kp_all = np.concatenate([kp, [[50.0, 50.0, 50.0]]]).astype(pts.dtype)
    run = _descriptor_fn(n, FeatureConfig(type="ESF_LOCAL", radius=RADIUS))
    desc, valid, _, _ = run(jnp.asarray(kp_all), jnp.ones(k + 1, bool),
                            jnp.asarray(pts), jnp.ones(n, bool),
                            jnp.asarray(golden["normals"]),
                            jnp.zeros((n, 3), jnp.float32),
                            jnp.zeros((k + 1, 3), jnp.float32),
                            RADIUS, RADIUS)
    desc, valid = np.asarray(desc), np.asarray(valid)
    assert not valid[-1]
    for i in range(k):
        d = np.linalg.norm(pts - kp_all[i], axis=1)
        order = np.argsort(d, kind="stable")
        sub = pts[order[d[order] <= RADIUS]]
        assert valid[i] and len(sub) >= 3
        exp = np.asarray(esf_descriptor(jnp.asarray(sub),
                                        jnp.ones(len(sub), bool)))
        np.testing.assert_allclose(desc[i], exp, atol=1e-6, err_msg=f"kp {i}")


def test_bshot_matches_golden(golden):
    from point_cloud_donkey_tpu.ops.descriptors_misc import bshot_binarize
    out = np.asarray(bshot_binarize(jnp.asarray(golden["shot"],
                                                jnp.float32)))
    np.testing.assert_array_equal(out, golden["bshot"])


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez_compressed(GOLDEN_PATH, **_compute_golden())
        print(f"wrote {GOLDEN_PATH}")
    else:
        print("usage: python tests/test_golden_descriptors.py regen")
