"""Fused Pallas LRF kernels (ops/pallas/lrf_moments.py), validated in
interpreter mode on the CPU mesh (the axon TPU tunnel cannot execute
pallas_call -- see the module docstring)."""

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import jax.numpy as jnp

import shapes
from point_cloud_donkey_tpu.ops.lrf import shot_lrf
from point_cloud_donkey_tpu.ops.neighbors import radius_covariance
from point_cloud_donkey_tpu.ops.pallas.lrf_moments import (lrf_moments,
                                                           shot_lrf_pallas)


@pytest.fixture(scope="module")
def cloud():
    pts = shapes.make_instance(np.random.default_rng(7), 1, n=700,
                               rotate=False).astype(np.float32)
    return jnp.asarray(pts), jnp.ones(len(pts), bool)


def test_moments_match_matmul_path(cloud):
    """Fused moments == matmul-identity moments (both weightings)."""
    p, m = cloud
    kp = p[::9]
    km = jnp.ones(kp.shape[0], bool)
    with pltpu.force_tpu_interpret_mode():
        for weighting, center in (("shot", "query"), ("uniform", "mean")):
            cov, wsum, count = lrf_moments(kp, km, p, m, 0.4,
                                           weighting=weighting, center=center)
            ref = radius_covariance(kp, p, m, 0.4, weighting=weighting,
                                    center=center)
            np.testing.assert_allclose(np.asarray(wsum), np.asarray(ref.wsum),
                                       rtol=2e-4)
            # counts may differ by the odd exact-vs-matmul boundary point
            assert (np.abs(np.asarray(count) - np.asarray(ref.count))
                    <= 1).all()
            np.testing.assert_allclose(np.asarray(cov), np.asarray(ref.cov),
                                       atol=5e-4)


def test_lrf_frames_statistical_parity(cloud):
    """Full pallas LRF vs the matmul path: every validity flag equal, and
    >= 97% of frames bit-close (the rest are ambiguous near-degenerate
    neighborhoods where fp summation order legitimately picks the other
    sign -- the same instability the dense path has under its own noise)."""
    p, m = cloud
    with pltpu.force_tpu_interpret_mode():
        fr, va = shot_lrf_pallas(p, m, p, m, 0.3)
    ref = shot_lrf(p, m, p, m, 0.3)
    va, rv = np.asarray(va), np.asarray(ref.valid)
    assert (va == rv).all()
    fr, rf = np.asarray(fr), np.asarray(ref.frames)
    ok = va & rv
    err = np.abs(fr[ok] - rf[ok]).max(axis=(1, 2))
    assert (err < 2e-3).mean() >= 0.97, (err > 2e-3).sum()


def test_lrf_orthonormal_rotation_equivariant(cloud):
    """Pallas frames are right-handed orthonormal and rotation-covariant."""
    p, m = cloud
    with pltpu.force_tpu_interpret_mode():
        fr, va = shot_lrf_pallas(p, m, p, m, 0.35)
    fr = np.asarray(fr)[np.asarray(va)]
    gram = np.einsum("kij,klj->kil", fr, fr)
    np.testing.assert_allclose(gram, np.broadcast_to(np.eye(3), gram.shape),
                               atol=1e-3)
    det = np.linalg.det(fr)
    np.testing.assert_allclose(det, 1.0, atol=1e-3)


def test_shot_histogram_pallas_matches_2pass():
    """Opt-in SHOT-histogram kernel == the XLA 2-pass accumulation
    (interpreter mode; the kernel is a measured-slower negative result on
    real v5e -- see ops/pallas/shot_hist.py -- but parity is kept pinned
    so the opt-in path cannot rot)."""
    from point_cloud_donkey_tpu.ops.pallas.shot_hist import (
        shot_histogram_pallas)
    from point_cloud_donkey_tpu.ops.shot import _shot_histogram_2pass

    rng = np.random.default_rng(11)
    K, M, NB = 37, 700, 11
    ints = lambda hi: jnp.asarray(rng.integers(0, hi, (K, M)), jnp.int32)
    w = lambda: jnp.asarray((rng.random((K, M)) * 2), jnp.float32)
    desc, step, cos_bin = ints(32), ints(NB), ints(NB)
    rad_vol, incl_vol, az_vol = ints(32), ints(32), ints(32)
    cw, cosw, rw, iw, azw = w(), w(), w(), w(), w()
    ref = np.asarray(_shot_histogram_2pass(
        desc, step, cw, cos_bin, cosw, rad_vol, rw, incl_vol, iw,
        az_vol, azw, NB))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(shot_histogram_pallas(
            desc, step, cw, cos_bin, cosw, rad_vol, rw, incl_vol, iw,
            az_vol, azw, NB))
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_lrf_v2_mxu_kernels_match_v1(cloud, monkeypatch):
    """Opt-in v2 MXU kernels (PCD_PALLAS_LRF_V=2: moments + sign votes as
    dot_generals) == v1 VPU-reduction kernels (interpreter mode; v2 is a
    measured-neutral-to-slower negative result on real v5e -- see
    lrf_moments._kernel_version -- parity pinned so the opt-in path cannot
    rot).  Frames compared up to the ~0.3% near-tied sign flips the two
    summation orders legitimately disagree on."""
    p, m = cloud
    kp = p[::7]
    km = jnp.ones(kp.shape[0], bool)
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("PCD_PALLAS_LRF_V", "1")
        cov1, ws1, ct1 = lrf_moments(kp, km, p, m, 0.4, weighting="shot")
        fr1, va1 = shot_lrf_pallas(p, m, p, m, 0.3)
        monkeypatch.setenv("PCD_PALLAS_LRF_V", "2")
        cov2, ws2, ct2 = lrf_moments(kp, km, p, m, 0.4, weighting="shot")
        fr2, va2 = shot_lrf_pallas(p, m, p, m, 0.3)
    np.testing.assert_allclose(np.asarray(ws2), np.asarray(ws1), rtol=2e-4)
    assert (np.abs(np.asarray(ct2) - np.asarray(ct1)) <= 1).all()
    np.testing.assert_allclose(np.asarray(cov2), np.asarray(cov1), atol=5e-4)
    va1, va2 = np.asarray(va1), np.asarray(va2)
    assert (va1 == va2).all()
    fr1, fr2 = np.asarray(fr1)[va1], np.asarray(fr2)[va1]
    cos = np.abs(np.einsum("kij,kij->ki", fr1, fr2)).min(axis=1)
    assert (cos > 0.999).mean() >= 0.97
