"""Parity tests for the fused SHOT descriptor kernel
(ops/pallas/shot_fused.py) in pallas interpret mode (pure JAX, runs on
CPU): the kernel math must match ops/shot.shot_descriptor_dense
statistically (exact-coordinate distances vs the matmul identity can gate
radius-boundary pairs differently; bf16 one-hot weights round like the XLA
path's accelerator mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import shapes
from point_cloud_donkey_tpu.ops.lrf import shot_lrf
from point_cloud_donkey_tpu.ops.normals import compute_normals_fast
from point_cloud_donkey_tpu.ops.pallas.shot_fused import (_acos, _atan2,
                                                          shot_descriptor_fused)
from point_cloud_donkey_tpu.ops.shot import shot_descriptor_dense
from point_cloud_donkey_tpu.ops.voxel_grid import voxel_grid


def test_atan2_acos_polynomials():
    rng = np.random.default_rng(0)
    y = rng.normal(size=50000).astype(np.float32)
    x = rng.normal(size=50000).astype(np.float32)
    got = np.asarray(_atan2(jnp.asarray(y), jnp.asarray(x)))
    assert np.abs(got - np.arctan2(y, x)).max() < 1e-6
    c = rng.uniform(-1, 1, 50000).astype(np.float32)
    assert np.abs(np.asarray(_acos(jnp.asarray(c))) - np.arccos(c)).max() \
        < 2e-6
    # conventions
    assert float(_atan2(jnp.float32(0), jnp.float32(-1))) == pytest.approx(
        np.pi)
    assert float(_atan2(jnp.float32(0), jnp.float32(0))) == 0.0


def _upstream(pts_j, mask_j, k_cap):
    def per_cloud(p, m):
        nrm = compute_normals_fast(p, m, 0.25)
        kres = voxel_grid(p, m, 0.35, capacity=k_cap)
        kp = jnp.where(kres.mask[:, None], kres.centroids[:, :3], 1e9)
        lrf = shot_lrf(kp, kres.mask, p, m, 0.5)
        ref = shot_descriptor_dense(kp, lrf.frames, lrf.valid, p, nrm, m,
                                    0.6)
        return kp, lrf.frames, lrf.valid, nrm, ref.descriptors, ref.valid

    return jax.vmap(per_cloud)(pts_j, mask_j)


def test_fused_kernel_matches_dense_interpret():
    rng = np.random.default_rng(1)
    B, N, K = 2, 2048, 64
    pts = np.stack([shapes.make_instance(rng, i % 5, n=N, rotate=True)
                    for i in range(B)]).astype(np.float32)
    mask = np.ones((B, N), bool)
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
    kp, fr, fv, nrm, dref, vref = _upstream(pts_j, mask_j, K)
    dnew, vnew = shot_descriptor_fused(kp, fr, fv, pts_j, nrm, mask_j, 0.6,
                                       interpret=True)
    dref, vref, dnew, vnew = map(np.asarray, (dref, vref, dnew, vnew))
    assert (vref == vnew).all()
    both = vref & vnew
    cos = (dnew[both] * dref[both]).sum(-1)
    assert cos.min() > 0.999
    # statistical contract: a radius-boundary pair can gate differently
    # (exact diffs vs matmul-identity distances), moving one slot's soft
    # weights -- bound the FRACTION of affected slots, not the max
    frac_off = (np.abs(dnew[both] - dref[both]) > 1e-3).mean()
    assert frac_off < 1e-4


def test_fused_kernel_padding_and_masks_interpret():
    """Masked points are invisible; invalid frames yield invalid rows."""
    rng = np.random.default_rng(2)
    B, N, K = 1, 2048, 64
    base = shapes.make_instance(rng, 3, n=1500, rotate=False)
    pts = np.full((B, N, 3), 777.0, np.float32)
    pts[0, :1500] = base
    mask = np.zeros((B, N), bool)
    mask[0, :1500] = True
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
    kp, fr, fv, nrm, dref, vref = _upstream(pts_j, mask_j, K)
    dnew, vnew = shot_descriptor_fused(kp, fr, fv, pts_j, nrm, mask_j, 0.6,
                                       interpret=True)
    assert (np.asarray(vnew) == np.asarray(vref)).all()
    both = np.asarray(vref & vnew)
    cos = (np.asarray(dnew)[both] * np.asarray(dref)[both]).sum(-1)
    assert cos.min() > 0.999
    # flipping garbage in the masked region changes nothing
    pts2 = pts.copy()
    pts2[0, 1600:] = -55.0
    d2, v2 = shot_descriptor_fused(jnp.asarray(kp), fr, fv,
                                   jnp.asarray(pts2), nrm, mask_j, 0.6,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(vnew))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(dnew), atol=1e-6)
