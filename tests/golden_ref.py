"""Independent loop-based numpy oracles for the descriptor kernels.

Each function is a direct per-point/per-neighbor transcription of the
published algorithm (PCL SHOT / SHOT-LRF / FPFH, and the reference's custom
SHORT_SHOT at features/features_short_shot.cpp:77-366) with no
vectorization, padding or masking tricks -- deliberately the *opposite*
implementation style from the batched JAX kernels, so any vectorization,
masking or binning bug in the kernels shows up as a numeric mismatch.

tests/test_golden_descriptors.py pins these oracles' outputs on a fixed
cloud into tests/golden/descriptors.npz and asserts the JAX kernels match.
"""

import numpy as np

# ---------------------------------------------------------------------------
# SHOT local reference frame (PCL SHOTLocalReferenceFrameEstimation)
# ---------------------------------------------------------------------------


def shot_lrf_ref(kp, points, radius, min_neighbors=5):
    """Weighted-covariance LRF with majority-vote sign disambiguation.
    Returns a [3, 3] frame (rows = x, y, z axes) or None if invalid."""
    d = np.linalg.norm(points - kp[None, :], axis=1)
    nb = np.nonzero(d <= radius)[0]
    if len(nb) < min_neighbors:
        return None
    dif = points[nb] - kp[None, :]
    w = radius - d[nb]
    cov = np.zeros((3, 3))
    for i in range(len(nb)):
        cov += w[i] * np.outer(dif[i], dif[i])
    cov /= w.sum()
    _, vecs = np.linalg.eigh(cov)
    x_axis = vecs[:, 2].copy()   # largest eigenvalue
    z_axis = vecs[:, 0].copy()   # smallest

    for v in (x_axis, z_axis):
        plus = sum(1 for i in range(len(nb)) if dif[i] @ v >= 0)
        if plus < len(nb) - plus:
            v *= -1.0
    y_axis = np.cross(z_axis, x_axis)
    return np.stack([x_axis, y_axis, z_axis])


# ---------------------------------------------------------------------------
# SHOT-352 (PCL SHOTEstimation::interpolateSingleChannel)
# ---------------------------------------------------------------------------

NR_BINS = 10
NR_SECTORS = 32


def shot_ref(kp, frame, points, normals, radius, min_neighbors=5):
    """[352] SHOT descriptor at one keypoint, or None if invalid."""
    hist = np.zeros(NR_SECTORS * (NR_BINS + 1))
    x_ax, y_ax, z_ax = frame
    r_half = radius / 2.0
    r14, r34 = radius / 4.0, 3.0 * radius / 4.0
    rad45, rad90, rad135 = np.pi / 4, np.pi / 2, 3 * np.pi / 4
    rad_pi_7_8 = np.pi * 7.0 / 8.0

    n_used = 0
    for j in range(len(points)):
        delta = points[j] - kp
        d2 = float(delta @ delta)
        if d2 > radius * radius or d2 <= 1e-15:
            continue
        if not np.all(np.isfinite(normals[j])):
            continue
        n_used += 1
        d = np.sqrt(d2)
        x_l, y_l, z_l = delta @ x_ax, delta @ y_ax, delta @ z_ax

        cos_desc = float(np.clip(normals[j] @ z_ax, -1.0, 1.0))
        bin_dist = (1.0 + cos_desc) * NR_BINS / 2.0
        step = int(np.floor(bin_dist + 0.5))
        bd = bin_dist - step

        # spatial volume (PCL bit pattern)
        bit4 = 1 if ((y_l > 0) or (y_l == 0.0 and x_l < 0)) else 0
        if (x_l > 0) or (x_l == 0.0 and y_l > 0):
            bit3 = 1 - bit4
        else:
            bit3 = bit4
        desc = ((bit4 << 3) + (bit3 << 2)) << 1
        if (x_l * y_l > 0) or (x_l == 0.0):
            desc += 0 if abs(x_l) >= abs(y_l) else 4
        else:
            desc += 4 if abs(x_l) > abs(y_l) else 0
        desc += 1 if z_l > 0 else 0
        desc += 2 if d > r_half else 0
        volume = desc * (NR_BINS + 1)

        central_w = 1.0 - abs(bd)

        # cosine interpolation (adjacent slot, modulo NR_BINS like PCL)
        if bd > 0:
            hist[volume + (step + 1) % NR_BINS] += abs(bd)
        else:
            hist[volume + (step - 1 + NR_BINS) % NR_BINS] += abs(bd)

        # radial interpolation (adjacent shell)
        if d > r_half:
            rd = (d - r34) / r_half
            if d > r34:
                central_w += 1.0 - rd
            else:
                central_w += 1.0 + rd
            if d <= r34:
                hist[(desc - 2) * (NR_BINS + 1) + step] += abs(rd)
        else:
            rd = (d - r14) / r_half
            if d < r14:
                central_w += 1.0 + rd
            else:
                central_w += 1.0 - rd
            if d >= r14:
                hist[(desc + 2) * (NR_BINS + 1) + step] += abs(rd)

        # inclination interpolation (adjacent elevation volume)
        incl = np.arccos(np.clip(z_l / d, -1.0, 1.0))
        if (incl > rad90) or (incl == rad90 and z_l <= 0):
            idn = (incl - rad135) / rad90
            if incl > rad135:
                central_w += 1.0 - idn
            else:
                central_w += 1.0 + idn
            if incl <= rad135:
                hist[(desc + 1) * (NR_BINS + 1) + step] += abs(idn)
        else:
            idn = (incl - rad45) / rad90
            if incl < rad45:
                central_w += 1.0 + idn
            else:
                central_w += 1.0 - idn
            if incl >= rad45:
                hist[(desc - 1) * (NR_BINS + 1) + step] += abs(idn)

        # azimuth interpolation (adjacent sector, +-4 mod 32)
        if x_l != 0.0 or y_l != 0.0:
            azimuth = np.arctan2(y_l, x_l)
            sel = desc >> 2
            azd = (azimuth - (-rad_pi_7_8 + rad45 * sel)) / rad45
            azd = float(np.clip(azd, -0.5, 0.5))
            central_w += 1.0 - abs(azd)
            if azd > 0:
                hist[((desc + 4) % NR_SECTORS) * (NR_BINS + 1) + step] += abs(azd)
            else:
                hist[((desc - 4 + NR_SECTORS) % NR_SECTORS)
                     * (NR_BINS + 1) + step] += abs(azd)

        hist[volume + step] += central_w

    if n_used < min_neighbors:
        return None
    norm = np.linalg.norm(hist)
    return hist / norm if norm > 0 else hist


# ---------------------------------------------------------------------------
# SHORT_SHOT (reference features_short_shot.cpp:77-366)
# ---------------------------------------------------------------------------


def _linear_interpolation(raw):
    dec = raw - int(raw)
    if dec <= 0.5:
        return dec + 0.5, -1
    return (1.0 - dec) + 0.5, 1


def _correct_bin(b, total, cyclic):
    if cyclic:
        if b < 0:
            return total - 1
        if b >= total:
            return 0
        return b
    return min(max(b, 0), total - 1)


def short_shot_ref(kp, frame, points, radius, r_bins=2, e_bins=2, a_bins=8,
                   min_radius=0.0, log_radius=False):
    """[r*e*a] SHORT_SHOT descriptor at one keypoint."""
    hist = np.zeros(r_bins * e_bins * a_bins)
    x_ax, y_ax, z_ax = frame
    ln_rmin = np.log(min_radius) if min_radius > 0 else 0.0
    ln_span = np.log(radius / min_radius) if min_radius > 0 else 0.0

    for j in range(len(points)):
        delta = points[j] - kp
        d2 = float(delta @ delta)
        if d2 > radius * radius or d2 <= 1e-15:
            continue
        x_l, y_l, z_l = delta @ x_ax, delta @ y_ax, delta @ z_ax
        r = np.sqrt(x_l * x_l + y_l * y_l + z_l * z_l)
        if min_radius > 0 and r < min_radius:
            continue
        theta = np.degrees(np.arccos(np.clip(z_l / r, -1.0, 1.0)))
        phi = np.degrees(np.arctan2(y_l, x_l))

        if log_radius:
            raw_r = (r_bins - 1) * (np.log(r) - ln_rmin) / ln_span + 1.0
        else:
            raw_r = r_bins * r / radius
        raw_t = e_bins * theta / 180.0
        raw_p = a_bins * (phi + 180.0) / 360.0

        bin_r = min(max(int(raw_r), 0), r_bins - 1)
        bin_t = min(int(raw_t), e_bins - 1)
        bin_p = min(int(raw_p), a_bins - 1)

        w_r, off_r = _linear_interpolation(raw_r)
        w_t, off_t = _linear_interpolation(raw_t)
        w_p, off_p = _linear_interpolation(raw_p)

        def lin(br, bt, bp):
            return br + bt * r_bins + bp * r_bins * e_bins

        hist[lin(bin_r, bin_t, bin_p)] += w_r + w_t + w_p
        if a_bins > 1:
            bin_p2 = _correct_bin(bin_p + off_p, a_bins, True)
            if bin_p2 != bin_p:
                hist[lin(bin_r, bin_t, bin_p2)] += w_r + w_t + (1.0 - w_p)
        if e_bins > 1:
            bin_t2 = _correct_bin(bin_t + off_t, e_bins, False)
            if bin_t2 != bin_t:
                hist[lin(bin_r, bin_t2, bin_p)] += w_r + (1.0 - w_t) + w_p
        if r_bins > 1:
            bin_r2 = _correct_bin(bin_r + off_r, r_bins, False)
            if bin_r2 != bin_r:
                hist[lin(bin_r2, bin_t, bin_p)] += (1.0 - w_r) + w_t + w_p

    norm = np.linalg.norm(hist)
    return hist / norm if norm > 0 else hist


# ---------------------------------------------------------------------------
# FPFH-33 (PCL FPFHEstimation)
# ---------------------------------------------------------------------------

FPFH_BINS = 11


def _spfh_ref(p, n_p, points, normals, radius):
    """Three 11-bin histograms of the Darboux pair features over p's
    in-radius neighbors (self excluded), each increment 100/#neighbors."""
    hist = np.zeros(3 * FPFH_BINS)
    nb = []
    for j in range(len(points)):
        delta = points[j] - p
        d2 = float(delta @ delta)
        if d2 <= radius * radius and d2 > 1e-15:
            nb.append(j)
    if not nb:
        return hist, 0
    incr = 100.0 / len(nb)
    for j in nb:
        d_vec = points[j] - p
        d = np.linalg.norm(d_vec)
        u = n_p
        v = np.cross(d_vec, u)
        vn = np.linalg.norm(v)
        v = v / max(vn, 1e-12)
        w = np.cross(u, v)
        f1 = float(v @ normals[j])
        f2 = float(u @ d_vec) / max(d, 1e-12)
        f3 = float(np.arctan2(w @ normals[j], u @ normals[j]))
        b1 = min(max(int(FPFH_BINS * (f1 + 1.0) / 2.0), 0), FPFH_BINS - 1)
        b2 = min(max(int(FPFH_BINS * (f2 + 1.0) / 2.0), 0), FPFH_BINS - 1)
        b3 = min(max(int(FPFH_BINS * (f3 + np.pi) / (2 * np.pi)), 0),
                 FPFH_BINS - 1)
        hist[b1] += incr
        hist[FPFH_BINS + b2] += incr
        hist[2 * FPFH_BINS + b3] += incr
    return hist, len(nb)


def fpfh_ref(kp, points, normals, radius, min_neighbors=5):
    """[33] FPFH descriptor at one keypoint: keypoint SPFH (with the nearest
    surface point's normal) + 1/d^2-weighted neighbor SPFH mean, each 11-bin
    block renormalized to sum 100."""
    d_all = np.linalg.norm(points - kp[None, :], axis=1)
    nb = [j for j in range(len(points))
          if d_all[j] <= radius and d_all[j] * d_all[j] > 1e-15]
    if len(nb) < min_neighbors:
        return None
    nearest = min(nb, key=lambda j: d_all[j])
    kp_normal = normals[nearest]

    spfh_kp, _ = _spfh_ref(kp, kp_normal, points, normals, radius)
    acc = spfh_kp.copy()
    wsum = np.zeros(3 * FPFH_BINS)
    for j in nb:
        spfh_j, _ = _spfh_ref(points[j], normals[j], points, normals, radius)
        d = max(d_all[j], 1e-6)
        wsum += spfh_j / (d * d)
    acc += wsum / len(nb)

    out = np.zeros(3 * FPFH_BINS)
    for b in range(3):
        blk = acc[b * FPFH_BINS:(b + 1) * FPFH_BINS]
        s = blk.sum()
        out[b * FPFH_BINS:(b + 1) * FPFH_BINS] = 100.0 * blk / max(s, 1e-30)
    return out
