"""Fully-fused SHOT-352 descriptor Pallas kernel.

Why: the XLA serving path (ops/shot.shot_descriptor_dense) is floored by
its one-hot matmul operands -- [K, M, 32] + [K, M, 11] bf16 one-/multi-hot
arrays materialized in HBM for BOTH histogram passes, ~67 MB per 2048-pt
cloud (~8.6 GB per 128-cloud batch, ~10.5 ms at v5e bandwidth), measured
17.1 ms for the whole stage (experiments/r5_stages.py).

This kernel computes everything per (8-keypoint, TM-point) tile in VMEM:
local-frame coordinates from packed lanes, the full PCL binning math
(ops/shot._shot_core_from_coords), the one-hot operands, and the histogram
as two BLOCK-DIAGONAL MXU dots -- [TK*32, TM] x [TK*16, TM] contractions
whose k-diagonal [32, 16] blocks are the per-keypoint histograms.  The
block-diagonal form wastes a factor TK of MXU FLOPs but keeps the dots at
full systolic-array shapes (the earlier per-keypoint formulation,
ops/pallas/shot_hist.py, ran tile-fragment dots at ~3% MXU utilization and
lost 20x).  Nothing [K, M]-sized ever touches HBM.

Numerics: distances are exact coordinate differences (the XLA dense path
uses the matmul identity), so radius-boundary pairs within ~1e-7 can gate
differently; histogram sums re-associate.  Same statistical parity
contract as the fused LRF kernels (tests/test_shot_fused.py).

Layouts:
  points operand  [8, B*M]: rows 0-2 xyz (centroid-shifted not required;
                  invalid parked at 1e9), rows 3-5 normals.
  keypoint operand [B*K, 16]: cols 0-8 frame (x,y,z axes row-major),
                  cols 9-11 keypoint xyz, col 12 frame-valid flag
                  (keypoints on sublanes -- Mosaic requires lane-dim
                  blocks of 128 or the full array width).
  outputs: histogram [B*K*32, 16] f32 (volume-major, bins 11-15 zero) and
                  in-radius counts [B*K, 128] f32 (lane 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TK = 8       # keypoints per tile (sublane tile)
TM = 2048    # points per tile
NR_BINS = 10
NR_SECTORS = 32
NB = 16      # padded bins per volume (11 used)

_RAD_45 = np.pi / 4.0
_RAD_90 = np.pi / 2.0
_RAD_135 = 3.0 * np.pi / 4.0
_RAD_PI_7_8 = np.pi * 7.0 / 8.0


def _atan01(z):
    """atan on [0, 1], float32 Cephes polynomial (~1 ulp): the second
    range reduction t = (z-1)/(z+1) keeps |t| <= tan(pi/8) where the
    degree-7 odd minimax polynomial is accurate."""
    import jax.numpy as jnp
    big = z > 0.4142135623730951
    t = jnp.where(big, (z - 1.0) / (z + 1.0), z)
    s = t * t
    p = ((((8.05374449538e-2 * s - 1.38776856032e-1) * s
           + 1.99777106478e-1) * s - 3.33329491539e-1) * s) * t + t
    return jnp.where(big, 0.7853981633974483 + p, p)


def _atan2(y, x):
    """atan2 built from _atan01 (Mosaic has no atan2/acos lowering):
    octant reduction via |y|/|x| min-max, then quadrant fixups.  Matches
    jnp.arctan2 to ~1e-7 including the (0, x<0) -> pi and (0, 0) -> 0
    conventions (signed zeros of y are not distinguished)."""
    import jax.numpy as jnp
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = jnp.where(hi > 0, lo / jnp.where(hi > 0, hi, 1.0), 0.0)
    r = _atan01(z)
    r = jnp.where(ay > ax, 1.5707963267948966 - r, r)
    r = jnp.where(x < 0, np.pi - r, r)
    return jnp.where(y < 0, -r, r)


def _acos(x):
    """acos(x) = atan2(sqrt(1 - x^2), x) for x in [-1, 1]."""
    import jax.numpy as jnp
    return _atan2(jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)), x)


def _shot_tile_body(r_ref, k_ref, p_ref, stage):
    """Shared per-(keypoint-tile, point-slab) SHOT body: returns
    (hist [TK*NR_SECTORS, NB], counts [TK, 128]) for the slab in p_ref.
    Used by the dense kernel (slab = TM-point tile of the full cloud,
    accumulated over the j grid axis) and the windowed kernel (slab = the
    tile's pre-gathered sorted-axis window, single shot)."""
    rad = r_ref[0, 0]
    r2 = r_ref[0, 1]
    px, py, pz = p_ref[0, :], p_ref[1, :], p_ref[2, :]
    nx, ny, nz = p_ref[3, :], p_ref[4, :], p_ref[5, :]
    fxs = [k_ref[:, i:i + 1] for i in range(9)]       # [TK, 1] each
    qx, qy, qz = (k_ref[:, 9:10], k_ref[:, 10:11], k_ref[:, 11:12])
    tm = p_ref.shape[1]

    # exact coordinate differences [TK, tm]
    dx = px[None, :] - qx
    dy = py[None, :] - qy
    dz = pz[None, :] - qz
    d2 = dx * dx + dy * dy + dz * dz
    use = (d2 <= r2) & (d2 > 1e-15)
    use = use & ((nx * 0.0 == 0.0) & (ny * 0.0 == 0.0)
                 & (nz * 0.0 == 0.0))[None, :]
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    d = jnp.where(use, d, rad * 0.5)

    # local-frame coords: (p - q) . axis
    x_l = dx * fxs[0] + dy * fxs[1] + dz * fxs[2]
    y_l = dx * fxs[3] + dy * fxs[4] + dz * fxs[5]
    z_l = dx * fxs[6] + dy * fxs[7] + dz * fxs[8]
    cos_desc = jnp.clip(nx[None, :] * fxs[6] + ny[None, :] * fxs[7]
                        + nz[None, :] * fxs[8], -1.0, 1.0)

    # --- PCL binning math (port of ops/shot._shot_core_from_coords) ---
    dtype = jnp.float32
    bin_dist = (1.0 + cos_desc) * (NR_BINS / 2.0)
    step = jnp.floor(bin_dist + 0.5).astype(jnp.int32)
    bd = bin_dist - step.astype(dtype)

    bit4 = ((y_l > 0) | ((y_l == 0.0) & (x_l < 0))).astype(jnp.int32)
    bit3_cond = (x_l > 0) | ((x_l == 0.0) & (y_l > 0))
    bit3 = jnp.where(bit3_cond, 1 - bit4, bit4)
    desc = ((bit4 << 3) + (bit3 << 2)) << 1
    inner_cond = (x_l * y_l > 0) | (x_l == 0.0)
    add4 = jnp.where(
        inner_cond,
        jnp.where(jnp.abs(x_l) >= jnp.abs(y_l), 0, 4),
        jnp.where(jnp.abs(x_l) > jnp.abs(y_l), 4, 0))
    desc = desc + add4 + (z_l > 0).astype(jnp.int32)
    r_half = rad / 2.0
    desc = desc + jnp.where(d > r_half, 2, 0)

    central_w = 1.0 - jnp.abs(bd)
    cos_bin = jnp.where(bd > 0, (step + 1) % NR_BINS,
                        (step - 1 + NR_BINS) % NR_BINS)
    cos_w = jnp.abs(bd)

    zero_i = jnp.zeros_like(desc)
    zero_f = jnp.zeros_like(central_w)
    if stage >= 2:
        r34, r14 = 3.0 * rad / 4.0, rad / 4.0
        rd_out = (d - r34) / r_half
        rd_in = (d - r14) / r_half
        outer = d > r_half
        rd = jnp.where(outer, rd_out, rd_in)
        # no bool-valued where: Mosaic's i1 select is the
        # remote-compiler crasher (bisect stage 2)
        has_rad = (outer & (d <= r34)) | (~outer & (d >= r14))
        central_w = central_w + jnp.where(
            outer,
            jnp.where(d > r34, 1.0 - rd_out, 1.0 + rd_out),
            jnp.where(d < r14, 1.0 + rd_in, 1.0 - rd_in))
        rad_w = jnp.where(has_rad, jnp.abs(rd), 0.0)
        rad_vol = jnp.where(has_rad, desc + jnp.where(outer, -2, 2), 0)
    else:
        rad_w, rad_vol = zero_f, zero_i

    if stage >= 3:
        incl_cos = jnp.clip(z_l / d, -1.0, 1.0)
        incl = _acos(incl_cos)
        lower = (incl > _RAD_90) | ((incl == _RAD_90) & (z_l <= 0))
        id_low = (incl - _RAD_135) / _RAD_90
        id_up = (incl - _RAD_45) / _RAD_90
        central_w = central_w + jnp.where(
            lower,
            jnp.where(incl > _RAD_135, 1.0 - id_low, 1.0 + id_low),
            jnp.where(incl < _RAD_45, 1.0 + id_up, 1.0 - id_up))
        has_incl = ((lower & (incl <= _RAD_135))
                    | (~lower & (incl >= _RAD_45)))
        incl_w = jnp.where(has_incl,
                           jnp.where(lower, jnp.abs(id_low),
                                     jnp.abs(id_up)), 0.0)
        incl_vol = jnp.where(has_incl, desc + jnp.where(lower, 1, -1), 0)
    else:
        incl_w, incl_vol = zero_f, zero_i

    if stage >= 4:
        has_az = (x_l != 0.0) | (y_l != 0.0)
        azimuth = _atan2(y_l, x_l)
        sel = desc >> 2
        az_dist = (azimuth
                   - (-_RAD_PI_7_8 + _RAD_45 * sel.astype(dtype))) \
            / _RAD_45
        az_dist = jnp.clip(az_dist, -0.5, 0.5)
        central_w = central_w + jnp.where(has_az,
                                          1.0 - jnp.abs(az_dist), 0.0)
        az_vol = jnp.where(az_dist > 0, (desc + 4) % NR_SECTORS,
                           (desc - 4 + NR_SECTORS) % NR_SECTORS)
        az_w = jnp.where(has_az, jnp.abs(az_dist), 0.0)
    else:
        az_w, az_vol = zero_f, zero_i

    usef = use.astype(dtype)
    central_w = central_w * usef
    cos_w = cos_w * usef
    rad_w = rad_w * usef
    incl_w = incl_w * usef
    az_w = az_w * usef

    # --- block-diagonal one-hot dots --------------------------------
    # pltpu.repeat TILES the block (row r = x[r % TK]), so the stacked
    # operands are VALUE-major: row r of [V*TK, tm] belongs to
    # keypoint r % TK with value r // TK
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (NR_SECTORS * TK, tm),
                                      0) // TK
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (NB * TK, tm),
                                      0) // TK

    def rep_v(x):
        return pltpu.repeat(x, NR_SECTORS, 0)

    def rep_b(x):
        return pltpu.repeat(x, NB, 0)

    dtypeb = jnp.bfloat16
    # pass A: volume one-hot (desc) x (central + cosine) weighted bins
    lhs_a = (rep_v(desc) == iota_v).astype(dtypeb)
    rhs_a = ((rep_b(step) == iota_b).astype(dtype) * rep_b(central_w)
             + (rep_b(cos_bin) == iota_b).astype(dtype) * rep_b(cos_w)
             ).astype(dtypeb)
    acc = jax.lax.dot_general(lhs_a, rhs_a, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    # pass B: (rad + incl + az) weighted volume multi-hot x bin one-hot
    lhs_b = ((rep_v(rad_vol) == iota_v).astype(dtype) * rep_v(rad_w)
             + (rep_v(incl_vol) == iota_v).astype(dtype) * rep_v(incl_w)
             + (rep_v(az_vol) == iota_v).astype(dtype) * rep_v(az_w)
             ).astype(dtypeb)
    rhs_b = (rep_b(step) == iota_b).astype(dtypeb)
    acc = acc + jax.lax.dot_general(lhs_b, rhs_b,
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    # acc [V*TK, NB*TK]: row v*TK+k, col b*TK+k' -- keypoint k's
    # histogram lives on the k == k' diagonal.  Zero the off-diagonal
    # k' entries with a 2-D index mask, then reduce each TK-lane group
    # with one tiny [128, NB] summing matmul (keeps everything 2-D --
    # Mosaic rejects the 3-D reshape formulation).
    row_k = jax.lax.broadcasted_iota(
        jnp.int32, (NR_SECTORS * TK, NB * TK), 0) % TK
    col_k = jax.lax.broadcasted_iota(
        jnp.int32, (NR_SECTORS * TK, NB * TK), 1) % TK
    masked = jnp.where(row_k == col_k, acc, 0.0)
    group = (jax.lax.broadcasted_iota(jnp.int32, (NB * TK, NB), 0) // TK
             == jax.lax.broadcasted_iota(jnp.int32, (NB * TK, NB), 1)
             ).astype(jnp.float32)
    hist = jax.lax.dot_general(masked, group, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    lane0 = jax.lax.broadcasted_iota(jnp.int32, (TK, 128), 1) == 0
    counts = jnp.where(lane0, jnp.sum(usef, axis=1)[:, None], 0.0)
    return hist, counts


@functools.partial(jax.jit, static_argnames=("m", "k_per_cloud",
                                             "interpret", "stage"))
def _shot_fused_call(kp_ops: jnp.ndarray,   # [BK, 16]
                     pt_ops: jnp.ndarray,   # [8, BM]
                     radius: jnp.ndarray,
                     m: int, k_per_cloud: int,
                     interpret: bool = False,
                     stage: int = 4):
    # `stage` gates kernel sections for compiler bisection (4 = full SHOT;
    # 3 = no azimuth, 2 = no inclination, 1 = no radial, 0 = volume bits
    # only).  Only stage=4 is a valid descriptor.
    bk = kp_ops.shape[0]
    rad_s = jnp.asarray(radius, jnp.float32)
    rr = jnp.stack([rad_s, rad_s * rad_s]).reshape(1, 2)
    mt = m // TM

    def kern(r_ref, k_ref, p_ref, hist_ref, cnt_ref):
        j = pl.program_id(1)
        hist, counts = _shot_tile_body(r_ref, k_ref, p_ref, stage)

        @pl.when(j == 0)
        def _():
            hist_ref[:] = hist
            cnt_ref[:] = counts

        @pl.when(j != 0)
        def _():
            hist_ref[:] = hist_ref[:] + hist
            cnt_ref[:] = cnt_ref[:] + counts

    grid = (bk // TK, mt)
    kpc = k_per_cloud

    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((bk * NR_SECTORS, NB), jnp.float32),
                   jax.ShapeDtypeStruct((bk, 128), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TK, 16), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TM), lambda i, j: (0, (i * TK // kpc) * mt + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TK * NR_SECTORS, NB), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(rr, kp_ops, pt_ops)


def shot_descriptor_fused(keypoints: jnp.ndarray,    # [B, K, 3]
                          frames: jnp.ndarray,       # [B, K, 3, 3]
                          frame_valid: jnp.ndarray,  # [B, K]
                          points: jnp.ndarray,       # [B, M, 3]
                          normals: jnp.ndarray,      # [B, M, 3]
                          mask: jnp.ndarray,         # [B, M]
                          radius,
                          min_neighbors: int = 5,
                          interpret: bool = False,
                          stage: int = 4):
    """Batched fused SHOT-352 (parity target: ops/shot.shot_descriptor_dense
    per cloud).  Returns (descriptors [B, K, 352], valid [B, K])."""
    b, k, _ = keypoints.shape
    m = points.shape[1]
    k0 = k
    if k % TK:
        pad = (-k) % TK
        keypoints = jnp.pad(keypoints, ((0, 0), (0, pad), (0, 0)),
                            constant_values=1e9)
        frames = jnp.pad(frames, ((0, 0), (0, pad), (0, 0), (0, 0)))
        frame_valid = jnp.pad(frame_valid, ((0, 0), (0, pad)))
        k += pad
    if m % TM:
        pad = (-m) % TM
        points = jnp.pad(points, ((0, 0), (0, pad), (0, 0)),
                         constant_values=1e9)
        normals = jnp.pad(normals, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        m += pad

    # pack operands
    kp_flat = keypoints.reshape(b * k, 3)
    fr_flat = frames.reshape(b * k, 9)
    kp_ops = jnp.zeros((b * k, 16), jnp.float32)
    kp_ops = kp_ops.at[:, 0:9].set(fr_flat)
    kp_ops = kp_ops.at[:, 9:12].set(kp_flat)
    kp_ops = kp_ops.at[:, 12].set(frame_valid.reshape(-1).astype(jnp.float32))

    pts = jnp.where(mask[..., None], points, 1e9).reshape(b * m, 3)
    nrm = jnp.where(mask[..., None], normals, 0.0).reshape(b * m, 3)
    pt_ops = jnp.zeros((8, b * m), jnp.float32)
    pt_ops = pt_ops.at[0:3, :].set(pts.T)
    pt_ops = pt_ops.at[3:6, :].set(nrm.T)

    hist16, counts = _shot_fused_call(kp_ops, pt_ops,
                                      jnp.asarray(radius, jnp.float32),
                                      m, k, interpret=interpret,
                                      stage=stage)
    # kernel tile layout: rows (tile, v, k_local) -> (b, k, v)
    hist = hist16.reshape(b * k // TK, NR_SECTORS, TK, NB)
    hist = jnp.transpose(hist, (0, 2, 1, 3)).reshape(
        b, k, NR_SECTORS, NB)[..., :NR_BINS + 1]
    hist = hist.reshape(b, k, NR_SECTORS * (NR_BINS + 1))
    n_in = counts[:, 0].reshape(b, k)

    norm = jnp.linalg.norm(hist, axis=-1, keepdims=True)
    descriptors = hist / jnp.maximum(norm, 1e-30)
    valid = (frame_valid & (n_in >= min_neighbors)
             & (norm[..., 0] > 0)
             & jnp.all(jnp.isfinite(descriptors), axis=-1))
    return descriptors[:, :k0], valid[:, :k0]


# ---------------------------------------------------------------------------
# Windowed (sorted-axis pruned) variant: clouds are principal-axis sorted
# (ops/binned.py) and keypoints are co-sorted by the same key, so a tile of
# TK consecutive keypoints only needs a contiguous window of the sorted
# points.  Windows are pre-gathered into [8, T * window] (whole 128-lane
# blocks along a middle axis -- same recipe as the windowed LRF kernels),
# and the kernel keeps a 1-D grid with window/TM of the dense per-step
# work.  Exactness is the caller's contract (ops/binned.window_starts).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("window", "interpret", "stage"))
def _shot_fused_call_windowed(kp_ops: jnp.ndarray,   # [BK, 16]
                              pwin: jnp.ndarray,     # [8, T * window]
                              radius: jnp.ndarray,
                              window: int,
                              interpret: bool = False,
                              stage: int = 4):
    bk = kp_ops.shape[0]
    rad_s = jnp.asarray(radius, jnp.float32)
    rr = jnp.stack([rad_s, rad_s * rad_s]).reshape(1, 2)

    def kern(r_ref, k_ref, p_ref, hist_ref, cnt_ref):
        hist, counts = _shot_tile_body(r_ref, k_ref, p_ref, stage)
        hist_ref[:] = hist
        cnt_ref[:] = counts

    return pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((bk * NR_SECTORS, NB), jnp.float32),
                   jax.ShapeDtypeStruct((bk, 128), jnp.float32)),
        grid=(bk // TK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TK, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, window), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TK * NR_SECTORS, NB), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(rr, kp_ops, pwin)


def shot_descriptor_fused_windowed(
        keypoints: jnp.ndarray,    # [B, K, 3] SORTED per cloud by key
        kp_keys: jnp.ndarray,      # [B, K] sorted keys (PARK for invalid)
        frames: jnp.ndarray,       # [B, K, 3, 3] co-sorted
        frame_valid: jnp.ndarray,  # [B, K]
        points: jnp.ndarray,       # [B, N, 3] SORTED per cloud by key
        keys: jnp.ndarray,         # [B, N] sorted point keys
        normals: jnp.ndarray,      # [B, N, 3] aligned to sorted order
        mask: jnp.ndarray,         # [B, N]
        radius,
        window: int,
        min_neighbors: int = 5,
        interpret: bool = False):
    """shot_descriptor_fused over principal-axis-sorted clouds with
    co-sorted keypoints: each TK-keypoint tile sweeps only its sorted-axis
    window instead of all N points.  Returns (descriptors [B, K, 352],
    valid [B, K], exact []) -- `exact` False means some tile's candidate
    range overflowed the window; the caller must rerun the dense kernel."""
    from ..binned import window_starts

    b, k, _ = keypoints.shape
    n = points.shape[1]
    window = min(window, n)
    if k % TK:
        raise ValueError(f"K={k} must divide by the keypoint tile {TK}")
    if window % 128:
        raise ValueError("window must be a multiple of the 128-lane tile")
    if (b * n) % 128:
        raise ValueError("B*N must be a multiple of the 128-lane tile")

    kp_mask = kp_keys < 1e9

    def plan_one(qk, qm, pk):
        return window_starts(qk, qm, pk, radius, TK, window, align=128)

    plans = jax.vmap(plan_one)(kp_keys, kp_mask, keys)
    base = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]
    starts = (plans.starts + base).reshape(-1)          # [B * K/TK] elems
    exact = jnp.all(plans.exact)

    # pack operands (same layout as the dense wrapper)
    kp_flat = keypoints.reshape(b * k, 3)
    fr_flat = frames.reshape(b * k, 9)
    kp_ops = jnp.zeros((b * k, 16), jnp.float32)
    kp_ops = kp_ops.at[:, 0:9].set(fr_flat)
    kp_ops = kp_ops.at[:, 9:12].set(kp_flat)
    kp_ops = kp_ops.at[:, 12].set(frame_valid.reshape(-1).astype(jnp.float32))

    pts = jnp.where(mask[..., None], points, 1e9).reshape(b * n, 3)
    nrm = jnp.where(mask[..., None], normals, 0.0).reshape(b * n, 3)
    pt_ops = jnp.zeros((8, b * n), jnp.float32)
    pt_ops = pt_ops.at[0:3, :].set(pts.T)
    pt_ops = pt_ops.at[3:6, :].set(nrm.T)

    # pre-gather per-tile windows as whole 128-lane blocks (lane-axis
    # gathers are pathological on TPU -- PROFILE_TPU.md round-5 lessons)
    lanes3 = pt_ops.reshape(8, (b * n) // 128, 128)
    blk = (starts // 128)[:, None] + jnp.arange(window // 128)[None, :]
    pwin = jnp.take(lanes3, blk.reshape(-1), axis=1
                    ).reshape(8, starts.shape[0] * window)

    hist16, counts = _shot_fused_call_windowed(
        kp_ops, pwin, jnp.asarray(radius, jnp.float32), window,
        interpret=interpret)
    hist = hist16.reshape(b * k // TK, NR_SECTORS, TK, NB)
    hist = jnp.transpose(hist, (0, 2, 1, 3)).reshape(
        b, k, NR_SECTORS, NB)[..., :NR_BINS + 1]
    hist = hist.reshape(b, k, NR_SECTORS * (NR_BINS + 1))
    n_in = counts[:, 0].reshape(b, k)

    norm = jnp.linalg.norm(hist, axis=-1, keepdims=True)
    descriptors = hist / jnp.maximum(norm, 1e-30)
    valid = (frame_valid & (n_in >= min_neighbors)
             & (norm[..., 0] > 0)
             & jnp.all(jnp.isfinite(descriptors), axis=-1))
    return descriptors, valid, exact


# ---------------------------------------------------------------------------
# Tile-compacted variant: keypoint capacity padding is the other structural
# waste -- at the serving geometry only ~55% of the [B, K] keypoint rows are
# valid (PROFILE_TPU.md occupancy), and the dense kernel sweeps every padded
# tile anyway.  Valid keypoints are compacted TILE-ALIGNED across the whole
# batch (per-cloud counts rounded up to TK, tiles never span clouds), the
# kernel runs over a static global tile capacity, and each tile's point slab
# is its cloud's full [8, N] block (pre-gathered, window = N -- composes
# with the sorted-axis window when that prunes).  Downstream consumes the
# FLAT row layout directly (votes/scores are per-row; no scatter back).
# ---------------------------------------------------------------------------


def required_tile_capacity(kp_mask: np.ndarray, tk: int = TK) -> int:
    """Tiles needed for a batch: sum of per-cloud ceil(valid / TK), rounded
    up to the next multiple of 8 for headroom-stable program shapes.  Use on
    a representative batch like keypoint_capacity sizing; the runtime
    exactness flag trips when a batch overflows the chosen capacity."""
    c = np.asarray(kp_mask).sum(axis=1)
    total = int(np.ceil(c / tk).sum())
    return max(8, -(-total // 8) * 8)


def shot_descriptor_fused_compact(
        keypoints: jnp.ndarray,    # [B, K, 3], valid rows FIRST per cloud
        frames: jnp.ndarray,       # [B, K, 3, 3]
        frame_valid: jnp.ndarray,  # [B, K]
        kp_mask: jnp.ndarray,      # [B, K] (valid-first, contiguous)
        points: jnp.ndarray,       # [B, N, 3]
        normals: jnp.ndarray,      # [B, N, 3]
        mask: jnp.ndarray,         # [B, N]
        radius,
        tile_capacity: int,
        min_neighbors: int = 5,
        interpret: bool = False):
    """Batched fused SHOT over tile-compacted keypoints.  Returns
    (descriptors [T*TK, 352], valid [T*TK], kp_flat [T*TK, 3],
    frames_flat [T*TK, 3, 3], cloud_id [T*TK], exact []) in the FLAT
    compacted layout; `exact` False means the batch's tile count overflowed
    `tile_capacity` (fall back to the dense kernel).  Requires the
    per-cloud keypoint arrays to be valid-first compacted (voxel_grid's
    padded output already is)."""
    b, k, _ = keypoints.shape
    n = points.shape[1]
    if k % TK:
        raise ValueError(f"K={k} must divide by the keypoint tile {TK}")
    if n % 128 or (b * n) % 128:
        raise ValueError("N must be a multiple of the 128-lane tile")

    c = jnp.sum(kp_mask, axis=1).astype(jnp.int32)            # [B]
    tiles = -(-c // TK)                                       # ceil
    tcum = jnp.cumsum(tiles)
    total = tcum[-1]
    exact = total <= tile_capacity
    toff = tcum - tiles

    tid = jnp.arange(tile_capacity, dtype=jnp.int32)
    cloud = jnp.searchsorted(tcum, tid, side="right").astype(jnp.int32)
    dead = tid >= total
    cloudc = jnp.clip(cloud, 0, b - 1)
    tin = tid - toff[cloudc]
    rows = tin[:, None] * TK + jnp.arange(TK, dtype=jnp.int32)[None, :]
    rows = jnp.clip(rows, 0, k - 1)                           # [T, TK]
    gidx = (cloudc[:, None] * k + rows).reshape(-1)           # [T*TK]

    # pack per-row operands, then gather the compacted rows
    kp_flat_full = keypoints.reshape(b * k, 3)
    fr_flat_full = frames.reshape(b * k, 9)
    fv_full = frame_valid.reshape(b * k)
    dead_row = jnp.repeat(dead, TK)
    kp_rows = jnp.where(dead_row[:, None], 1e9, kp_flat_full[gidx])
    fr_rows = fr_flat_full[gidx]
    fv_rows = jnp.where(dead_row, False, fv_full[gidx])

    kp_ops = jnp.zeros((tile_capacity * TK, 16), jnp.float32)
    kp_ops = kp_ops.at[:, 0:9].set(fr_rows)
    kp_ops = kp_ops.at[:, 9:12].set(kp_rows)
    kp_ops = kp_ops.at[:, 12].set(fv_rows.astype(jnp.float32))

    pts = jnp.where(mask[..., None], points, 1e9).reshape(b * n, 3)
    nrm = jnp.where(mask[..., None], normals, 0.0).reshape(b * n, 3)
    pt_ops = jnp.zeros((8, b * n), jnp.float32)
    pt_ops = pt_ops.at[0:3, :].set(pts.T)
    pt_ops = pt_ops.at[3:6, :].set(nrm.T)

    # per-tile slab = its cloud's whole [8, N] block (128-aligned gather)
    lanes3 = pt_ops.reshape(8, (b * n) // 128, 128)
    blk = (cloudc * (n // 128))[:, None] \
        + jnp.arange(n // 128, dtype=jnp.int32)[None, :]
    pwin = jnp.take(lanes3, blk.reshape(-1), axis=1
                    ).reshape(8, tile_capacity * n)

    hist16, counts = _shot_fused_call_windowed(
        kp_ops, pwin, jnp.asarray(radius, jnp.float32), n,
        interpret=interpret)
    tt = tile_capacity * TK
    hist = hist16.reshape(tile_capacity, NR_SECTORS, TK, NB)
    hist = jnp.transpose(hist, (0, 2, 1, 3)).reshape(
        tt, NR_SECTORS, NB)[..., :NR_BINS + 1]
    hist = hist.reshape(tt, NR_SECTORS * (NR_BINS + 1))
    n_in = counts[:, 0]

    norm = jnp.linalg.norm(hist, axis=-1, keepdims=True)
    descriptors = hist / jnp.maximum(norm, 1e-30)
    valid = (fv_rows & (n_in >= min_neighbors)
             & (norm[..., 0] > 0)
             & jnp.all(jnp.isfinite(descriptors), axis=-1))
    cloud_id = jnp.repeat(cloudc, TK)
    kp_out = jnp.where(valid[:, None], kp_rows, 0.0)
    fr_out = jnp.where(valid[:, None, None], fr_rows.reshape(tt, 3, 3),
                       jnp.eye(3, dtype=jnp.float32))
    return descriptors, valid, kp_out, fr_out, cloud_id, exact
