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


def test_fused_windowed_matches_dense_interpret():
    """Windowed (sorted-axis pruned) fused SHOT == dense fused SHOT on the
    same sorted inputs when the calibrated window fits (exact=True)."""
    from point_cloud_donkey_tpu.ops import binned
    from point_cloud_donkey_tpu.ops.pallas.shot_fused import (
        shot_descriptor_fused_windowed)

    rng = np.random.default_rng(3)
    B, N, K = 2, 1024, 32
    pts = np.stack([shapes.make_instance(rng, i % 5, n=N, rotate=True)
                    for i in range(B)]).astype(np.float32)
    mask = np.ones((B, N), bool)
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
    pts_s, mask_s, keys_s, _, axis = binned.sort_clouds_ex(pts_j, mask_j)

    kp, fr, fv, nrm, _, _ = _upstream(pts_s, mask_s, K)
    kp_m = kp[..., 0] < 1e9
    kp_keys = jnp.where(kp_m, jnp.einsum("bkd,bd->bk", kp, axis),
                        binned.PARK)
    order = jnp.argsort(kp_keys, axis=1)
    kp_keys = jnp.take_along_axis(kp_keys, order, axis=1)
    kp_s = jnp.take_along_axis(kp, order[..., None], axis=1)
    fr_s = jnp.take_along_axis(fr, order[..., None, None], axis=1)
    fv_s = jnp.take_along_axis(fv, order, axis=1)

    window = binned.required_window(pts_j, mask_j, 0.6, tile_q=8,
                                    align=128, q_points=kp[..., :3],
                                    q_mask=kp_m)
    dref, vref = shot_descriptor_fused(kp_s, fr_s, fv_s, pts_s, nrm,
                                       mask_s, 0.6, interpret=True)
    dnew, vnew, exact = shot_descriptor_fused_windowed(
        kp_s, kp_keys, fr_s, fv_s, pts_s, keys_s, nrm, mask_s, 0.6,
        window, interpret=True)
    assert bool(exact)
    np.testing.assert_array_equal(np.asarray(vnew), np.asarray(vref))
    both = np.asarray(vref & vnew)
    np.testing.assert_allclose(np.asarray(dnew)[both],
                               np.asarray(dref)[both], atol=2e-6)
    # a too-small window must trip the exactness flag
    _, _, exact_small = shot_descriptor_fused_windowed(
        kp_s, kp_keys, fr_s, fv_s, pts_s, keys_s, nrm, mask_s, 0.6,
        128, interpret=True)
    assert not bool(exact_small)



def test_fused_compact_matches_dense_interpret():
    """Tile-compacted fused SHOT == dense fused SHOT row-for-row (the flat
    layout maps back by (cloud, row)); overflow trips the exactness flag."""
    from point_cloud_donkey_tpu.ops.pallas.shot_fused import (
        TK, required_tile_capacity, shot_descriptor_fused_compact)

    rng = np.random.default_rng(5)
    B, N, K = 2, 1024, 32
    pts = np.stack([shapes.make_instance(rng, i % 5, n=N, rotate=True)
                    for i in range(B)]).astype(np.float32)
    mask = np.ones((B, N), bool)
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
    kp, fr, fv, nrm, dref, vref = _upstream(pts_j, mask_j, K)
    kp_m = np.asarray(kp[..., 0] < 1e9)
    # voxel output is valid-first: check the precondition holds
    for b in range(B):
        c = kp_m[b].sum()
        assert kp_m[b, :c].all() and not kp_m[b, c:].any()
    t_cap = required_tile_capacity(kp_m)
    desc, valid, kp_f, fr_f, cloud_id, exact = shot_descriptor_fused_compact(
        kp, fr, fv, jnp.asarray(kp_m), pts_j, nrm, mask_j, 0.6, t_cap,
        interpret=True)
    assert bool(exact)
    desc, valid, kp_f, cloud_id = map(np.asarray,
                                      (desc, valid, kp_f, cloud_id))
    dref, vref, kp_h = map(np.asarray, (dref, vref, kp))
    # rebuild the flat index map and compare against the dense reference
    c = kp_m.sum(1)
    tiles = -(-c // TK)
    toff = np.concatenate([[0], np.cumsum(tiles)[:-1]])
    n_checked = 0
    for b in range(B):
        for r in range(int(c[b])):
            flat = (toff[b] + r // TK) * TK + r % TK
            assert cloud_id[flat] == b
            assert valid[flat] == vref[b, r]
            if vref[b, r]:
                cos = (desc[flat] * dref[b, r]).sum()
                assert cos > 0.9999
                n_checked += 1
    assert n_checked > 30
    # rows past each cloud's tile range are invalid
    assert valid.sum() == vref.sum()
    # capacity one tile short must trip the flag
    _, _, _, _, _, ex2 = shot_descriptor_fused_compact(
        kp, fr, fv, jnp.asarray(kp_m), pts_j, nrm, mask_j, 0.6,
        int(tiles.sum()) - 1, interpret=True)
    assert not bool(ex2)


def test_fused_compact_masked_and_empty_clouds():
    """Compact path with uneven keypoint counts including a nearly-empty
    cloud: rows map correctly, empty clouds contribute zero tiles."""
    from point_cloud_donkey_tpu.ops.pallas.shot_fused import (
        TK, required_tile_capacity, shot_descriptor_fused_compact)

    rng = np.random.default_rng(6)
    B, N, K = 3, 1024, 32
    pts = np.stack([shapes.make_instance(rng, i % 5, n=N, rotate=True)
                    for i in range(B)]).astype(np.float32)
    mask = np.ones((B, N), bool)
    # cloud 1: only 3 valid points -> voxel yields almost no keypoints and
    # every descriptor is invalid (min_neighbors)
    mask[1, 3:] = False
    pts[1, 3:] = 777.0
    pts_j, mask_j = jnp.asarray(pts), jnp.asarray(mask)
    kp, fr, fv, nrm, dref, vref = _upstream(pts_j, mask_j, K)
    kp_m = np.asarray(kp[..., 0] < 1e9)
    t_cap = required_tile_capacity(kp_m)
    desc, valid, kp_f, fr_f, cloud_id, exact = shot_descriptor_fused_compact(
        kp, fr, fv, jnp.asarray(kp_m), pts_j, nrm, mask_j, 0.6, t_cap,
        interpret=True)
    assert bool(exact)
    valid = np.asarray(valid)
    vref = np.asarray(vref)
    assert valid.sum() == vref.sum()
    # per-cloud valid counts match the dense reference
    cid = np.asarray(cloud_id)
    for b in range(B):
        assert valid[cid == b].sum() == vref[b].sum()
