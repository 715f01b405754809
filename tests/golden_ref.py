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
    """Three 11-bin histograms of the pcl::computePairFeatures pair features
    (incl. the source/target swap) over p's in-radius neighbors (self
    excluded), each increment 100/#neighbors; PCL block order f1 (atan2) |
    f2 (v.n_t) | f3 (cos); degenerate pairs skipped but counted in the
    denominator."""
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
        pf = pair_features_pcl_ref(p, n_p, points[j], normals[j])
        if pf is None:
            continue
        f1, f2, f3, _ = pf
        b1 = min(max(int(FPFH_BINS * (f1 + np.pi) / (2 * np.pi)), 0),
                 FPFH_BINS - 1)
        b2 = min(max(int(FPFH_BINS * (f2 + 1.0) / 2.0), 0), FPFH_BINS - 1)
        b3 = min(max(int(FPFH_BINS * (f3 + 1.0) / 2.0), 0), FPFH_BINS - 1)
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


# ---------------------------------------------------------------------------
# Color conversion (third_party/pcl_color_conversion/color_conversion.cpp,
# PCL cshot.hpp RGB2CIELAB lineage) -- scalar loop transcription
# ---------------------------------------------------------------------------


def rgb2cielab_norm_ref(rgb):
    """One color [3] in [0,1] -> normalized Lab (L in [0,1], a/b in [-1,1]),
    reproducing the reference's LUT laws: 256-entry sRGB expansion (byte
    index), 4000-entry cube-root LUT with index truncation."""
    def srgb(f):
        return ((f + 0.055) / 1.055) ** 2.4 if f > 0.04045 else f / 12.92

    fr, fg, fb = (srgb(c) for c in rgb)
    x = fr * 0.412453 + fg * 0.357580 + fb * 0.180423
    y = fr * 0.212671 + fg * 0.715160 + fb * 0.072169
    z = fr * 0.019334 + fg * 0.119193 + fb * 0.950227

    def f_lut(t):
        q = min(max(int(t * 4000.0), 0), 3999) / 4000.0
        return q ** 0.3333 if q > 0.008856 else 7.787 * q + 16.0 / 116.0

    vx, vy, vz = f_lut(x / 0.95047), f_lut(y), f_lut(z / 1.08883)
    L = min(116.0 * vy - 16.0, 100.0)
    a = min(max(500.0 * (vx - vy), -120.0), 120.0)
    b = min(max(200.0 * (vy - vz), -120.0), 120.0)
    return np.array([L / 100.0, a / 120.0, b / 120.0])


def color_distance_ref(lab1, lab2):
    """(|dL| + (|da| + |db|)/2) / 3 clamped to [0,1]
    (color_conversion.cpp:86-96 / PCL cshot.hpp)."""
    d = np.abs(np.asarray(lab1) - np.asarray(lab2))
    return float(min(max((d[0] + (d[1] + d[2]) / 2.0) / 3.0, 0.0), 1.0))


# ---------------------------------------------------------------------------
# CSHOT-1344 (PCL SHOTColorEstimation::interpolateDoubleChannel; reference
# wrapper features/features_cshot.cpp)
# ---------------------------------------------------------------------------

NR_COLOR_BINS = 30


def cshot_ref(kp, kp_rgb, frame, points, normals, rgb, radius,
              min_neighbors=5):
    """[1344] CSHOT at one keypoint: SHOT-352 shape channel + a 31-slot
    normalized-CIELab-distance histogram per spatial volume; the spatial
    (radial / elevation / azimuth) interpolation weights apply to both
    channels; joint L2 normalization."""
    shape_len = NR_SECTORS * (NR_BINS + 1)
    color_len = NR_SECTORS * (NR_COLOR_BINS + 1)
    hist = np.zeros(shape_len + color_len)
    x_ax, y_ax, z_ax = frame
    r_half = radius / 2.0
    r14, r34 = radius / 4.0, 3.0 * radius / 4.0
    rad45, rad90, rad135 = np.pi / 4, np.pi / 2, 3 * np.pi / 4
    rad_pi_7_8 = np.pi * 7.0 / 8.0
    lab_kp = rgb2cielab_norm_ref(kp_rgb)

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

        # shape channel coordinate
        cos_desc = float(np.clip(normals[j] @ z_ax, -1.0, 1.0))
        bin_s = (1.0 + cos_desc) * NR_BINS / 2.0
        step_s = int(np.floor(bin_s + 0.5))
        bd_s = bin_s - step_s

        # color channel coordinate
        cdist = color_distance_ref(lab_kp, rgb2cielab_norm_ref(rgb[j]))
        bin_c = cdist * NR_COLOR_BINS
        step_c = int(np.floor(bin_c + 0.5))
        bd_c = bin_c - step_c

        # spatial volume (same bit pattern as SHOT)
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
        vol_s = desc * (NR_BINS + 1)
        vol_c = shape_len + desc * (NR_COLOR_BINS + 1)

        w_s = 1.0 - abs(bd_s)
        w_c = 1.0 - abs(bd_c)

        # cosine / color-bin interpolation (adjacent slot, modulo bins)
        if bd_s > 0:
            hist[vol_s + (step_s + 1) % NR_BINS] += abs(bd_s)
        else:
            hist[vol_s + (step_s - 1 + NR_BINS) % NR_BINS] += abs(bd_s)
        if bd_c > 0:
            hist[vol_c + (step_c + 1) % NR_COLOR_BINS] += abs(bd_c)
        else:
            hist[vol_c + (step_c - 1 + NR_COLOR_BINS) % NR_COLOR_BINS] += abs(bd_c)

        # radial interpolation (shared spatial weight, both channels)
        if d > r_half:
            rd = (d - r34) / r_half
            spatial = (1.0 - rd) if d > r34 else (1.0 + rd)
            if d <= r34:
                hist[(desc - 2) * (NR_BINS + 1) + step_s] += abs(rd)
                hist[shape_len + (desc - 2) * (NR_COLOR_BINS + 1) + step_c] += abs(rd)
        else:
            rd = (d - r14) / r_half
            spatial = (1.0 + rd) if d < r14 else (1.0 - rd)
            if d >= r14:
                hist[(desc + 2) * (NR_BINS + 1) + step_s] += abs(rd)
                hist[shape_len + (desc + 2) * (NR_COLOR_BINS + 1) + step_c] += abs(rd)
        w_s += spatial
        w_c += spatial

        # inclination interpolation
        incl = np.arccos(np.clip(z_l / d, -1.0, 1.0))
        if (incl > rad90) or (incl == rad90 and z_l <= 0):
            idn = (incl - rad135) / rad90
            spatial = (1.0 - idn) if incl > rad135 else (1.0 + idn)
            if incl <= rad135:
                hist[(desc + 1) * (NR_BINS + 1) + step_s] += abs(idn)
                hist[shape_len + (desc + 1) * (NR_COLOR_BINS + 1) + step_c] += abs(idn)
        else:
            idn = (incl - rad45) / rad90
            spatial = (1.0 + idn) if incl < rad45 else (1.0 - idn)
            if incl >= rad45:
                hist[(desc - 1) * (NR_BINS + 1) + step_s] += abs(idn)
                hist[shape_len + (desc - 1) * (NR_COLOR_BINS + 1) + step_c] += abs(idn)
        w_s += spatial
        w_c += spatial

        # azimuth interpolation
        if x_l != 0.0 or y_l != 0.0:
            azimuth = np.arctan2(y_l, x_l)
            sel = desc >> 2
            azd = (azimuth - (-rad_pi_7_8 + rad45 * sel)) / rad45
            azd = float(np.clip(azd, -0.5, 0.5))
            w_s += 1.0 - abs(azd)
            w_c += 1.0 - abs(azd)
            if azd > 0:
                av = (desc + 4) % NR_SECTORS
            else:
                av = (desc - 4 + NR_SECTORS) % NR_SECTORS
            hist[av * (NR_BINS + 1) + step_s] += abs(azd)
            hist[shape_len + av * (NR_COLOR_BINS + 1) + step_c] += abs(azd)

        hist[vol_s + step_s] += w_s
        hist[vol_c + step_c] += w_c

    if n_used < min_neighbors:
        return None
    norm = np.linalg.norm(hist)
    return hist / norm if norm > 0 else hist


# ---------------------------------------------------------------------------
# SHORT_CSHOT (reference features_short_cshot.cpp:103-430)
# ---------------------------------------------------------------------------


def short_cshot_ref(kp, kp_rgb, frame, points, rgb, radius,
                    r_bins=2, e_bins=2, a_bins=8,
                    r_cbins=2, e_cbins=2, a_cbins=8, color_hist_size=15,
                    min_radius=0.0, log_radius=False):
    """Shape (SHORT_SHOT grid) + color (CIELab-distance histogram nested in
    its own spherical grid) descriptor; transcribes compute_shape_descriptor
    / compute_color_descriptor including the reference's c-secondary
    increment quirk ((1-w_c)+(1-w_r)+w_t+w_p, :424-426).  Joint L2 norm."""
    shape = np.zeros(r_bins * e_bins * a_bins)
    color = np.zeros(r_cbins * e_cbins * a_cbins * color_hist_size)
    x_ax, y_ax, z_ax = frame
    lab_kp = rgb2cielab_norm_ref(kp_rgb)
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

        # ---- shape part ----
        if log_radius:
            raw_r = (r_bins - 1) * (np.log(r) - ln_rmin) / ln_span + 1.0
        else:
            raw_r = r_bins * r / radius
        raw_t = e_bins * theta / 180.0
        raw_p = a_bins * (phi + 180.0) / 360.0
        b_r = min(max(int(raw_r), 0), r_bins - 1)
        b_t = min(int(raw_t), e_bins - 1)
        b_p = min(int(raw_p), a_bins - 1)
        w_r, o_r = _linear_interpolation(raw_r)
        w_t, o_t = _linear_interpolation(raw_t)
        w_p, o_p = _linear_interpolation(raw_p)

        def lin(br, bt, bp):
            return br + bt * r_bins + bp * r_bins * e_bins

        shape[lin(b_r, b_t, b_p)] += w_r + w_t + w_p
        if a_bins > 1:
            b_p2 = _correct_bin(b_p + o_p, a_bins, True)
            if b_p2 != b_p:
                shape[lin(b_r, b_t, b_p2)] += w_r + w_t + (1.0 - w_p)
        if e_bins > 1:
            b_t2 = _correct_bin(b_t + o_t, e_bins, False)
            if b_t2 != b_t:
                shape[lin(b_r, b_t2, b_p)] += w_r + (1.0 - w_t) + w_p
        if r_bins > 1:
            b_r2 = _correct_bin(b_r + o_r, r_bins, False)
            if b_r2 != b_r:
                shape[lin(b_r2, b_t, b_p)] += (1.0 - w_r) + w_t + w_p

        # ---- color part ----
        cdist = color_distance_ref(lab_kp, rgb2cielab_norm_ref(rgb[j]))
        if log_radius:
            raw_cr = (r_cbins - 1) * (np.log(r) - ln_rmin) / ln_span + 1.0
        else:
            raw_cr = r_cbins * r / radius
        raw_ct = e_cbins * theta / 180.0
        raw_cp = a_cbins * (phi + 180.0) / 360.0
        raw_c = cdist * color_hist_size
        cb_r = min(max(int(raw_cr), 0), r_cbins - 1)
        cb_t = min(int(raw_ct), e_cbins - 1)
        cb_p = min(int(raw_cp), a_cbins - 1)
        b_c = min(int(raw_c), color_hist_size - 1)
        cw_r, co_r = _linear_interpolation(raw_cr)
        cw_t, co_t = _linear_interpolation(raw_ct)
        cw_p, co_p = _linear_interpolation(raw_cp)
        w_c, o_c = _linear_interpolation(raw_c)

        def clin(bc, br, bt, bp):
            return (bc + br * color_hist_size
                    + bt * color_hist_size * r_cbins
                    + bp * color_hist_size * r_cbins * e_cbins)

        color[clin(b_c, cb_r, cb_t, cb_p)] += w_c + cw_r + cw_t + cw_p
        if a_cbins > 1:
            cb_p2 = _correct_bin(cb_p + co_p, a_cbins, True)
            if cb_p2 != cb_p:
                color[clin(b_c, cb_r, cb_t, cb_p2)] += w_c + cw_r + cw_t + (1.0 - cw_p)
        if e_cbins > 1:
            cb_t2 = _correct_bin(cb_t + co_t, e_cbins, False)
            if cb_t2 != cb_t:
                color[clin(b_c, cb_r, cb_t2, cb_p)] += w_c + cw_r + (1.0 - cw_t) + cw_p
        if r_cbins > 1:
            cb_r2 = _correct_bin(cb_r + co_r, r_cbins, False)
            if cb_r2 != cb_r:
                color[clin(b_c, cb_r2, cb_t, cb_p)] += w_c + (1.0 - cw_r) + cw_t + cw_p
        if color_hist_size > 1:
            b_c2 = _correct_bin(b_c + o_c, color_hist_size, False)
            if b_c2 != b_c:
                # reference quirk: the c-secondary increment also flips w_r
                # (features_short_cshot.cpp:424-426)
                color[clin(b_c2, cb_r, cb_t, cb_p)] += \
                    (1.0 - w_c) + (1.0 - cw_r) + cw_t + cw_p

    fused = np.concatenate([shape, color])
    norm = np.linalg.norm(fused)
    return fused / norm if norm > 0 else fused


# ---------------------------------------------------------------------------
# PFH-125 (PCL PFHEstimation::computePointPFHSignature + computePairFeatures
# incl. the source/target swap; reference wrapper features/features_pfh.cpp)
# ---------------------------------------------------------------------------

PFH_BINS = 5


def pair_features_pcl_ref(p1, n1, p2, n2):
    """pcl::computePairFeatures: the point whose normal has the smaller
    angle to the connecting line becomes the source.  Returns
    (f1 atan2, f2 = v.n2, f3 = cos angle, f4 = d) or None when degenerate."""
    dp = p2 - p1
    f4 = float(np.linalg.norm(dp))
    if f4 == 0.0:
        return None
    dpn = dp / f4
    a1 = float(n1 @ dpn)
    a2 = float(n2 @ dpn)
    if np.arccos(np.clip(abs(a1), 0, 1)) > np.arccos(np.clip(abs(a2), 0, 1)):
        # the connecting line flips with the swap, so f3 = n_source . d
        # becomes -a2 ("f3 = angle2 * (-1)"); keeps the features symmetric
        # in argument order
        n1c, n2c, dpc, f3 = n2, n1, -dpn, -a2
    else:
        n1c, n2c, dpc, f3 = n1, n2, dpn, a1
    v = np.cross(dpc, n1c)
    v_n = float(np.linalg.norm(v))
    if v_n < 1e-12:
        return None
    v = v / v_n
    w = np.cross(n1c, v)
    f2 = float(v @ n2c)
    f1 = float(np.arctan2(w @ n2c, n1c @ n2c))
    return f1, f2, f3, f4


def pfh_ref(kp, points, normals, radius, min_neighbors=5):
    """[125] PFH at one keypoint: joint 5x5x5 histogram over ALL unordered
    neighbor pairs inside the support; increment 100 / C(k,2) (denominator
    counts skipped degenerate pairs too, as PCL precomputes it); index
    packing f1 + 5*f2 + 25*f3 with f1 the atan2 feature."""
    d_all = np.linalg.norm(points - kp[None, :], axis=1)
    nb = [j for j in range(len(points)) if d_all[j] <= radius]
    if len(nb) < min_neighbors or len(nb) < 2:
        return None
    hist = np.zeros(PFH_BINS ** 3)
    incr = 100.0 / (len(nb) * (len(nb) - 1) / 2.0)
    for ii in range(1, len(nb)):
        for jj in range(ii):
            pf = pair_features_pcl_ref(points[nb[ii]], normals[nb[ii]],
                                       points[nb[jj]], normals[nb[jj]])
            if pf is None:
                continue
            f1, f2, f3, _ = pf
            b0 = min(max(int(PFH_BINS * (f1 + np.pi) / (2.0 * np.pi)), 0),
                     PFH_BINS - 1)
            b1 = min(max(int(PFH_BINS * (f2 + 1.0) / 2.0), 0), PFH_BINS - 1)
            b2 = min(max(int(PFH_BINS * (f3 + 1.0) / 2.0), 0), PFH_BINS - 1)
            hist[b0 + b1 * PFH_BINS + b2 * PFH_BINS * PFH_BINS] += incr
    return hist


# ---------------------------------------------------------------------------
# Spin image 153 (Johnson; PCL SpinImageEstimation with image width 8,
# reference wrapper features/features_spin_image.cpp) -- bilinear binning
# ---------------------------------------------------------------------------

SPIN_WIDTH = 8


def spin_image_ref(kp, axis, points, radius, min_neighbors=5):
    """[153] spin image at one keypoint: cylindrical coordinates
    beta = axis.(q-p) (signed height), alpha = in-plane distance, bilinear
    binning into a (W+1) x (2W+1) image, normalized to sum 1 (the kernel's
    documented convention; ops/descriptors_misc.py)."""
    W = SPIN_WIDTH
    stride = 2 * W + 1
    img = np.zeros((W + 1) * stride)
    n_nb = 0
    for j in range(len(points)):
        delta = points[j] - kp
        d2 = float(delta @ delta)
        if d2 > radius * radius:
            continue
        n_nb += 1
        beta = float(delta @ axis)
        alpha = np.sqrt(max(d2 - beta * beta, 0.0))
        a_bin = alpha / radius * W
        b_bin = (beta / radius + 1.0) * W
        if a_bin > W or b_bin < 0 or b_bin > 2 * W:
            continue
        a0 = min(max(int(np.floor(a_bin)), 0), W - 1)
        b0 = min(max(int(np.floor(b_bin)), 0), 2 * W - 1)
        fa, fb = a_bin - a0, b_bin - b0
        base = a0 * stride + b0
        img[base] += (1 - fa) * (1 - fb)
        img[base + 1] += (1 - fa) * fb
        img[base + stride] += fa * (1 - fb)
        img[base + stride + 1] += fa * fb
    if n_nb < min_neighbors:
        return None
    s = img.sum()
    return img / s if s > 0 else img


# ---------------------------------------------------------------------------
# COSPAIR (reference third_party/cospair/cospair.cpp:18-297, rgb_type 5)
# ---------------------------------------------------------------------------

COSPAIR_LEVELS = 7
COSPAIR_BINS = 9
COSPAIR_RGB_BINS = 9


def rgb2cielab_raw_ref(rgb):
    """PCL SHOTColorEstimation::RGB2CIELAB raw (clamped) L, a, b."""
    lab = rgb2cielab_norm_ref(rgb)
    return np.array([lab[0] * 100.0, lab[1] * 120.0, lab[2] * 120.0])


def cospair_ref(kp, n_kp, points, normals, rgb, radius, min_neighbors=5):
    """[378] COSPAIR at one keypoint (a cloud point): 7 concentric shells,
    per shell three 9-bin pcl::computePairFeatures angle histograms
    (source = keypoint, incl. the swap) + three 9-bin CIELab histograms of
    the neighbor color with the paper's normalization constants; each shell
    normalized by its pair count and scaled by the level index."""
    level_len = 3 * COSPAIR_BINS + 3 * COSPAIR_RGB_BINS
    hist = np.zeros(COSPAIR_LEVELS * level_len)
    counts = np.zeros(COSPAIR_LEVELS, int)

    for j in range(len(points)):
        delta = points[j] - kp
        d = float(np.linalg.norm(delta))
        if d * d <= 1e-15 or d > radius:
            continue
        # shell: smallest l with d <= l/7 * R (radiusSearch ring ranges)
        lvl = int(np.ceil(d / radius * COSPAIR_LEVELS))
        lvl = min(max(lvl, 1), COSPAIR_LEVELS) - 1

        pf = pair_features_pcl_ref(kp, n_kp, points[j], normals[j])
        if pf is None:
            continue
        f1, f2, f3, _ = pf
        counts[lvl] += 1
        deg1 = np.degrees(f1) + 180.0
        deg2 = np.degrees(np.arccos(np.clip(f2, -1.0, 1.0)))
        deg3 = np.degrees(np.arccos(np.clip(f3, -1.0, 1.0)))
        b1 = min(max(int(deg1 / (360.0 / COSPAIR_BINS)), 0), COSPAIR_BINS - 1)
        b2 = min(max(int(deg2 / (180.0 / COSPAIR_BINS)), 0), COSPAIR_BINS - 1)
        b3 = min(max(int(deg3 / (180.0 / COSPAIR_BINS)), 0), COSPAIR_BINS - 1)
        base = lvl * level_len
        hist[base + b1] += 1.0
        hist[base + COSPAIR_BINS + b2] += 1.0
        hist[base + 2 * COSPAIR_BINS + b3] += 1.0

        L, a, b = rgb2cielab_raw_ref(rgb[j])
        ln = L / 100.0
        an = (a + 86.185) / 184.439
        bn = (b + 107.863) / 202.345
        br = min(max(int(ln * COSPAIR_RGB_BINS), 0), COSPAIR_RGB_BINS - 1)
        bg = min(max(int(an * COSPAIR_RGB_BINS), 0), COSPAIR_RGB_BINS - 1)
        bb = min(max(int(bn * COSPAIR_RGB_BINS), 0), COSPAIR_RGB_BINS - 1)
        cbase = base + 3 * COSPAIR_BINS
        hist[cbase + br] += 1.0
        hist[cbase + COSPAIR_RGB_BINS + bg] += 1.0
        hist[cbase + 2 * COSPAIR_RGB_BINS + bb] += 1.0

    for lvl in range(COSPAIR_LEVELS):
        if counts[lvl]:
            s = slice(lvl * level_len, (lvl + 1) * level_len)
            hist[s] = hist[s] / counts[lvl] * (lvl + 1)
    if counts.sum() < min_neighbors:
        return None
    return hist


# ---------------------------------------------------------------------------
# 3DSC / USC shape context (pcl::ShapeContext3DEstimation geometry with the
# deterministic SHOT-LRF azimuth; 12 az x 11 el x 15 log-radial bins)
# ---------------------------------------------------------------------------

SC_AZ, SC_EL, SC_RAD = 12, 11, 15


def shape_context_ref(kp, frame, points, radius, min_radius_factor=0.1,
                      density_radius_factor=0.2, min_neighbors=5):
    """[1980] shape context at one keypoint: log-radial shells between
    radius/10 and radius, linear elevation/azimuth bins in the LRF, each
    neighbor weighted 1 / (local point density * cbrt(bin volume))."""
    hist = np.zeros(SC_AZ * SC_EL * SC_RAD)
    x_ax, y_ax, z_ax = frame
    rmin = min_radius_factor * radius
    dr = density_radius_factor * radius
    ln_span = np.log(radius / rmin)
    n_used = 0
    for j in range(len(points)):
        delta = points[j] - kp
        d2 = float(delta @ delta)
        if d2 <= 1e-15 or d2 > radius * radius:
            continue
        d = np.sqrt(d2)
        n_used += 1
        if d < rmin:
            continue
        x_l, y_l, z_l = delta @ x_ax, delta @ y_ax, delta @ z_ax
        az = (np.arctan2(y_l, x_l) + np.pi) / (2 * np.pi)
        el = np.arccos(np.clip(z_l / d, -1.0, 1.0)) / np.pi
        rb = np.log(max(d, rmin) / rmin) / ln_span
        b_az = min(max(int(az * SC_AZ), 0), SC_AZ - 1)
        b_el = min(max(int(el * SC_EL), 0), SC_EL - 1)
        b_r = min(max(int(rb * SC_RAD), 0), SC_RAD - 1)

        rho = sum(1 for q in points
                  if float((q - points[j]) @ (q - points[j])) <= dr * dr)
        r_lo = rmin * np.exp(b_r / SC_RAD * ln_span)
        r_hi = rmin * np.exp((b_r + 1) / SC_RAD * ln_span)
        el_lo = b_el / SC_EL * np.pi
        el_hi = (b_el + 1) / SC_EL * np.pi
        vol = ((r_hi ** 3 - r_lo ** 3) / 3.0) \
            * (np.cos(el_lo) - np.cos(el_hi)) * (2 * np.pi / SC_AZ)
        w = 1.0 / (rho * np.cbrt(vol))
        hist[(b_az * SC_EL + b_el) * SC_RAD + b_r] += w
    if n_used < min_neighbors:
        return None
    return hist


# ---------------------------------------------------------------------------
# BSHOT binarization (reference features_bshot.cpp:109-157)
# ---------------------------------------------------------------------------


def bshot_binarize_ref(shot_vec):
    """[352] -> [352] binary: per group of 4, case A (all zero) / B (one
    value > 0.9 sum) / C (pair, later pairs overwrite) / D (triple) /
    E (all ones)."""
    out = np.zeros_like(shot_vec)
    for g0 in range(0, len(shot_vec), 4):
        v = shot_vec[g0:g0 + 4]
        s = float(v.sum())
        result = [0, 0, 0, 0]
        if s != 0:
            for i in range(4):
                if v[i] > s * 0.9:
                    result[i] = 1
            case_b = sum(result) == 1
            case_c = False
            if not case_b:
                pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
                for i, j in pairs:
                    if v[i] + v[j] > s * 0.9:
                        result = [0, 0, 0, 0]
                        result[i] = result[j] = 1
                case_c = sum(result) == 2
            case_d = False
            if not case_b and not case_c:
                triples = [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]
                for t in triples:
                    if sum(v[i] for i in t) > s * 0.9:
                        result = [0, 0, 0, 0]
                        for i in t:
                            result[i] = 1
                case_d = sum(result) == 3
            if not case_b and not case_c and not case_d:
                result = [1, 1, 1, 1]
        out[g0:g0 + 4] = result
    return out


# ---------------------------------------------------------------------------
# RSD (radius-based surface descriptor, full-histogram variant;
# pcl::RSDEstimation with UseFullRSDHistogram, features_rsd.cpp)
# ---------------------------------------------------------------------------

RSD_SUBDIV = 5


def rsd_ref(kp, kp_normal, points, normals, radius, min_neighbors=5):
    """[25] joint (distance, normal-angle) 5x5 histogram over the keypoint's
    in-radius neighbors, count-normalized; the keypoint normal is the
    nearest surface point's normal (passed in)."""
    hist = np.zeros(RSD_SUBDIV * RSD_SUBDIV)
    n_nb = 0
    for j in range(len(points)):
        delta = points[j] - kp
        d2 = float(delta @ delta)
        if d2 <= 1e-15 or d2 > radius * radius:
            continue
        n_nb += 1
        d = np.sqrt(d2)
        ang = np.arccos(np.clip(normals[j] @ kp_normal, -1.0, 1.0))
        b_d = min(max(int(d / radius * RSD_SUBDIV), 0), RSD_SUBDIV - 1)
        b_a = min(max(int(ang / np.pi * RSD_SUBDIV), 0), RSD_SUBDIV - 1)
        hist[b_d * RSD_SUBDIV + b_a] += 1.0
    if n_nb < min_neighbors:
        return None
    return hist / max(n_nb, 1)


# ---------------------------------------------------------------------------
# RIFT-32 (PCL RIFTEstimation: distance rings x gradient-angle bins,
# bilinear, gradient-magnitude weighted; gradients passed in)
# ---------------------------------------------------------------------------

RIFT_DIST_BINS = 4
RIFT_ANGLE_BINS = 8


def rift_ref(kp, points, gradients, radius, min_neighbors=5):
    """[32] RIFT at one keypoint given per-point intensity gradients."""
    hist = np.zeros(RIFT_DIST_BINS * RIFT_ANGLE_BINS)
    n_nb = 0
    for j in range(len(points)):
        delta = points[j] - kp
        d2 = float(delta @ delta)
        if d2 <= 1e-15 or d2 > radius * radius:
            continue
        n_nb += 1
        d = np.sqrt(d2)
        radial = delta / d
        g = gradients[j]
        gmag = float(np.linalg.norm(g))
        gdir = g / max(gmag, 1e-12)
        theta = np.arccos(np.clip(radial @ gdir, -1.0, 1.0))

        db = d / radius * RIFT_DIST_BINS - 0.5
        ab = theta / np.pi * RIFT_ANGLE_BINS - 0.5
        d0 = min(max(int(np.floor(db)), 0), RIFT_DIST_BINS - 2)
        a0 = min(max(int(np.floor(ab)), 0), RIFT_ANGLE_BINS - 2)
        fd = min(max(db - d0, 0.0), 1.0)
        fa = min(max(ab - a0, 0.0), 1.0)
        base = d0 * RIFT_ANGLE_BINS + a0
        hist[base] += (1 - fd) * (1 - fa) * gmag
        hist[base + 1] += (1 - fd) * fa * gmag
        hist[base + RIFT_ANGLE_BINS] += fd * (1 - fa) * gmag
        hist[base + RIFT_ANGLE_BINS + 1] += fd * fa * gmag
    if n_nb < min_neighbors:
        return None
    s = hist.sum()
    return hist / s if s > 0 else hist


# ---------------------------------------------------------------------------
# RoPS (Guo et al. rotational projection statistics, point-sampled
# formulation documented in ops/rops.py: distance-weighted covariance LRF,
# 3 axes x 3 rotations x 3 plane projections x 5 statistics)
# ---------------------------------------------------------------------------

ROPS_BINS = 5
ROPS_ROTATIONS = 3


def _rops_stats(u, v):
    """5 statistics of one 2D projection: 5x5 distribution matrix over the
    points' bounding box -> central moments mu11/mu21/mu12/mu22 + entropy."""
    B = ROPS_BINS
    u_min, u_max = u.min(), u.max()
    v_min, v_max = v.min(), v.max()
    du = max(u_max - u_min, 1e-12)
    dv = max(v_max - v_min, 1e-12)
    hist = np.zeros((B, B))
    for ui, vi in zip(u, v):
        bu = min(max(int((ui - u_min) / du * B), 0), B - 1)
        bv = min(max(int((vi - v_min) / dv * B), 0), B - 1)
        hist[bu, bv] += 1.0
    p = hist / max(hist.sum(), 1e-12)
    coords = (np.arange(B) + 0.5) / B
    mi = float((p * coords[:, None]).sum())
    mj = float((p * coords[None, :]).sum())
    di, dj = coords - mi, coords - mj

    def mu(a, b):
        return float((p * np.outer(di ** a, dj ** b)).sum())

    ent = float(-(p[p > 0] * np.log(p[p > 0])).sum())
    return [mu(1, 1), mu(2, 1), mu(1, 2), mu(2, 2), ent]


def rops_ref(kp, points, radius, min_neighbors=5):
    """[135] RoPS at one keypoint.  Layout: rotation-major (axis x,y,z outer,
    angle step k=1..3 inner), then per rotation [xy stats, xz stats, yz
    stats] (ops/rops.py concatenation order)."""
    rel, wts = [], []
    for q in points:
        d = float(np.linalg.norm(q - kp))
        if d <= radius:
            rel.append(q - kp)
            wts.append(radius - d)
    rel = np.array(rel)
    w = np.array(wts)
    if len(rel) < min_neighbors:
        return None
    cov = np.zeros((3, 3))
    for wi, ri in zip(w, rel):
        cov += wi * np.outer(ri, ri)
    cov /= w.sum()
    _, vecs = np.linalg.eigh(cov)   # ascending eigenvalues, column vectors

    def orient(v):
        plus = sum(1 for ri in rel if ri @ v >= 0)
        return -v if plus < len(rel) - plus else v

    x_axis = orient(vecs[:, 2])
    z_axis = orient(vecs[:, 0])
    frame = np.stack([x_axis, np.cross(z_axis, x_axis), z_axis])  # rows
    local = rel @ frame.T

    desc = []
    step = np.pi / 2.0 / ROPS_ROTATIONS
    for axis in range(3):
        for k in range(1, ROPS_ROTATIONS + 1):
            a = step * k
            c, s = np.cos(a), np.sin(a)
            if axis == 0:
                R = np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
            elif axis == 1:
                R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            else:
                R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            rot = local @ R.T
            for (ai, bi) in ((0, 1), (0, 2), (1, 2)):
                desc.extend(_rops_stats(rot[:, ai], rot[:, bi]))
    return np.array(desc)


# ---------------------------------------------------------------------------
# CGF raw spherical histogram (third_party/cgf/cgf.cpp:100-165 binning:
# 17 log-radial x 11 polar x 12 azimuth, density-normalized; LRF z flipped
# toward the keypoint normal by negating the whole frame)
# ---------------------------------------------------------------------------

CGF_R_BINS = 17
CGF_P_BINS = 11
CGF_A_BINS = 12


def cgf_raw_ref(kp, kp_normal, frame, points, radius, min_radius_rel=0.05):
    """[2244] density-normalized raw CGF histogram at one keypoint with a
    precomputed (valid) LRF."""
    fr = np.array(frame, float)
    if fr[2] @ kp_normal < 0:
        fr = -fr
    rmin = min_radius_rel * radius
    ln_rmin = np.log(rmin)
    ln_span = np.log(radius / rmin)
    hist = np.zeros(CGF_R_BINS * CGF_P_BINS * CGF_A_BINS)
    count = 0
    for q in points:
        delta = q - kp
        d = float(np.linalg.norm(delta))
        if d <= 1e-15 or d > radius:
            continue
        count += 1
        x_l, y_l, z_l = fr @ delta
        theta = np.degrees(np.arccos(np.clip(z_l / d, -1.0, 1.0)))
        phi = np.degrees(np.arctan2(y_l, x_l))
        b_r = min(max(int((CGF_R_BINS - 1) * (np.log(d) - ln_rmin)
                          / ln_span + 1.0), 0), CGF_R_BINS - 1)
        b_t = min(int(CGF_P_BINS * theta / 180.0), CGF_P_BINS - 1)
        b_p = min(int(CGF_A_BINS * (phi + 180.0) / 360.0), CGF_A_BINS - 1)
        hist[b_r + b_t * CGF_R_BINS + b_p * CGF_R_BINS * CGF_P_BINS] += 1.0
    return hist / max(count, 1)


# ---------------------------------------------------------------------------
# GASD (Lima & Teichrieb; pcl::GASDEstimation layouts, with the repo's
# documented skewness sign rule replacing PCL's viewpoint flip)
# ---------------------------------------------------------------------------


def gasd_ref(points, rgb=None):
    """[512] shape-only (8^3 grid) or [984] with color (6^3 shape + 4^3 x 12
    hue): PCA frame with skewness-disambiguated axis signs, grid-normalized
    point-count histograms."""
    n = len(points)
    c = points.mean(axis=0)
    centered = points - c
    cov = centered.T @ centered / n
    _, vecs = np.linalg.eigh(cov)   # ascending

    def flip(v):
        return -v if float(((centered @ v) ** 3).sum()) < 0 else v

    a0, a2 = flip(vecs[:, 0]), flip(vecs[:, 2])
    axes = np.stack([a0, np.cross(a2, a0), a2])
    local = centered @ axes.T
    half = max(np.abs(local).max(), 1e-12)
    unit = np.clip((local / half + 1.0) / 2.0, 0.0, 1.0 - 1e-6)

    def grid_hist(g):
        h = np.zeros(g ** 3)
        for u in unit:
            i0, i1, i2 = (u * g).astype(int)
            h[(i0 * g + i1) * g + i2] += 1.0
        return h / n

    if rgb is None:
        return grid_hist(8)
    shape = grid_hist(6)
    color = np.zeros(4 ** 3 * 12)
    for u, (r, g_, b) in zip(unit, rgb):
        mx, mn_ = max(r, g_, b), min(r, g_, b)
        diff = max(mx - mn_, 1e-12)
        if mx == r:
            hue = (g_ - b) / diff
        elif mx == g_:
            hue = 2.0 + (b - r) / diff
        else:
            hue = 4.0 + (r - g_) / diff
        hue = (hue * 60.0) % 360.0
        hb = min(max(int(hue / 360.0 * 12), 0), 11)
        c4 = (u * 4).astype(int)
        color[((c4[0] * 4 + c4[1]) * 4 + c4[2]) * 12 + hb] += 1.0
    return np.concatenate([shape, color / n])


# ---------------------------------------------------------------------------
# NARF-36 descriptor (star-beam formulation documented in ops/narf.py:
# 36 beams x 10 steps of bilinear range samples with hole fallback,
# distance-weighted range derivative, atan squash, dominant-beam roll)
# ---------------------------------------------------------------------------

NARF_LEN = 36
NARF_BEAM_STEPS = 10


def narf_ref(range_img, kp_vu, kp_xyz, support_size, focal,
             rotation_invariant=True):
    """[36] NARF descriptor at one keypoint given the range image ([H, W]
    with +inf holes), its (row, col) pixel position and back-projected 3D
    position."""
    H, W = range_img.shape
    fin = np.isfinite(range_img)
    img = np.where(fin, range_img, 0.0)

    def bilinear(vv, uu):
        v0 = min(max(int(np.floor(vv)), 0), H - 2)
        u0 = min(max(int(np.floor(uu)), 0), W - 2)
        fv, fu = vv - v0, uu - u0
        acc = wacc = 0.0
        for dv in (0, 1):
            for du in (0, 1):
                w = (fv if dv else 1 - fv) * (fu if du else 1 - fu)
                if fin[v0 + dv, u0 + du]:
                    acc += w * img[v0 + dv, u0 + du]
                    wacc += w
        return acc / max(wacc, 1e-6), wacc > 1e-3

    rr = max(float(np.linalg.norm(kp_xyz)), 1e-3)
    pix_radius = focal * (support_size * 0.5) / rr
    center, _ = bilinear(kp_vu[0], kp_vu[1])
    desc = np.zeros(NARF_LEN)
    for b in range(NARF_LEN):
        a = 2.0 * np.pi * b / NARF_LEN
        prev = center
        num = den = 0.0
        for s in range(1, NARF_BEAM_STEPS + 1):
            t = s / NARF_BEAM_STEPS
            val, ok = bilinear(kp_vu[0] + np.sin(a) * t * pix_radius,
                               kp_vu[1] + np.cos(a) * t * pix_radius)
            w = (1.0 - t) * (1.0 if ok else 0.0)
            num += (val - prev) * w
            den += w
            prev = val
        beam = num / max(den, 1e-6)
        desc[b] = np.arctan(beam / max(support_size / NARF_LEN, 1e-6)) / np.pi
    if rotation_invariant:
        desc = np.roll(desc, -int(np.argmax(np.abs(desc))))
    return desc


# ---------------------------------------------------------------------------
# ESF-640 (Wohlkinger & Vincze; the sampled pair/triple index streams are
# shared inputs, like frames for SHOT, so the deterministic grid / line
# -tracing / histogram structure is what gets pinned)
# ---------------------------------------------------------------------------

ESF_GRID = 64
ESF_BINS = 64
ESF_LINE_STEPS = 16


def esf_ref(points, ia, ib, ic):
    """[640] ESF descriptor given the three sampled index streams."""
    mn, mx = points.min(axis=0), points.max(axis=0)
    scale = max(float((mx - mn).max()), 1e-12)
    unit = (points - mn) / scale

    occ = np.zeros((ESF_GRID, ESF_GRID, ESF_GRID), bool)
    for u in unit:
        c = np.clip((u * (ESF_GRID - 1)).astype(int), 0, ESF_GRID - 1)
        occ[c[0], c[1], c[2]] = True

    def line_class(p, q):
        hits = 0
        for s in range(1, ESF_LINE_STEPS + 1):
            t = s / (ESF_LINE_STEPS + 1)
            sm = p * (1 - t) + q * t
            c = np.clip((sm * (ESF_GRID - 1)).astype(int), 0, ESF_GRID - 1)
            if occ[c[0], c[1], c[2]]:
                hits += 1
        frac = hits / ESF_LINE_STEPS
        return (0 if frac > 0.9 else 1 if frac < 0.1 else 2), frac

    def bin_of(val, lo, hi):
        return min(max(int((val - lo) / (hi - lo) * ESF_BINS), 0),
                   ESF_BINS - 1)

    h_d2 = np.zeros((3, ESF_BINS))
    h_ratio = np.zeros(ESF_BINS)
    h_a3 = np.zeros((3, ESF_BINS))
    h_d3 = np.zeros((3, ESF_BINS))
    for a, b, c in zip(ia, ib, ic):
        pa, pb, pc = unit[a], unit[b], unit[c]
        cls_ab, frac_ab = line_class(pa, pb)
        cls_ac, _ = line_class(pa, pc)
        cls_bc, _ = line_class(pb, pc)

        d2 = float(np.linalg.norm(pa - pb))
        h_d2[cls_ab, bin_of(d2, 0.0, np.sqrt(3.0))] += 1.0
        h_ratio[bin_of(frac_ab, 0.0, 1.0)] += 1.0

        v1, v2 = pa - pb, pc - pb
        den = max(float(np.linalg.norm(v1) * np.linalg.norm(v2)), 1e-12)
        ang = float(np.arccos(np.clip(v1 @ v2 / den, -1.0, 1.0)))
        h_a3[cls_ac, bin_of(ang, 0.0, np.pi)] += 1.0

        area = 0.5 * float(np.linalg.norm(np.cross(pb - pa, pc - pa)))
        votes_in = (cls_ab == 0) + (cls_ac == 0) + (cls_bc == 0)
        votes_out = (cls_ab == 1) + (cls_ac == 1) + (cls_bc == 1)
        tri_cls = 0 if votes_in >= 2 else 1 if votes_out >= 2 else 2
        h_d3[tri_cls, bin_of(np.sqrt(area), 0.0,
                             np.sqrt(0.5 * np.sqrt(3.0)))] += 1.0

    full = np.concatenate([h_d2.reshape(-1), h_a3.reshape(-1),
                           h_d3.reshape(-1), h_ratio])
    return full / max(full.sum(), 1e-30)


# ---------------------------------------------------------------------------
# VFH-308 (Rusu et al.; features_vfh.cpp wrapper: NormalizeBins=true,
# NormalizeDistance=false -> the distance block holds d/max_d counts)
# ---------------------------------------------------------------------------

VFH_BINS = 45
VFH_VP_BINS = 128


def vfh_ref(points, normals, viewpoint=(0.0, 0.0, 0.0),
            normalize_bins=True):
    """[308] = 4 x 45 bins (f1 atan2 / f2 v.n / f3 cos / normalized
    distance) of pcl::computePairFeatures between the (centroid, averaged
    normal) pair and every point, + 128 viewpoint-angle bins; percentage
    normalization when normalize_bins."""
    n = len(points)
    c = points.mean(axis=0)
    n_avg = normals.sum(axis=0)
    n_avg = n_avg / np.linalg.norm(n_avg)
    vp = np.asarray(viewpoint, float)

    d_all = np.linalg.norm(points - c, axis=1)
    max_d = d_all.max()

    h = np.zeros((4, VFH_BINS))
    for i in range(n):
        pf = pair_features_pcl_ref(c, n_avg, points[i], normals[i])
        if pf is None:
            continue
        f1, f2, f3, f4 = pf
        dn = f4 / max_d
        for row, (val, lo, hi) in enumerate([
                (f1, -np.pi, np.pi), (f2, -1.0, 1.0), (f3, -1.0, 1.0),
                (dn, 0.0, 1.0)]):
            b = min(max(int((val - lo) / (hi - lo) * VFH_BINS), 0),
                    VFH_BINS - 1)
            h[row, b] += 1.0

    hvp = np.zeros(VFH_VP_BINS)
    for i in range(n):
        vdir = vp - points[i]
        vdir = vdir / max(np.linalg.norm(vdir), 1e-12)
        cos_vp = float(normals[i] @ vdir)
        b = min(max(int((cos_vp + 1.0) / 2.0 * VFH_VP_BINS), 0),
                VFH_VP_BINS - 1)
        hvp[b] += 1.0

    norm_fac = 100.0 / n if normalize_bins else 1.0
    return norm_fac * np.concatenate([h.reshape(-1), hvp])


# ---------------------------------------------------------------------------
# GRSD-21 (Marton et al.): upper triangle of the 6x6 surface-type
# transition matrix over neighboring points (type 5 free-space unobserved)
# ---------------------------------------------------------------------------


def grsd_types_ref(points, normals, radius):
    """Per-point surface classes (plane/cylinder/noise/sphere/edge/empty).
    Returned separately because the RSD radius estimate d/(2 sin(ang/2)) is
    precision-unstable near parallel normals -- the types are a shared
    input to the transition histogram, like frames for SHOT."""
    n = len(points)
    d = np.linalg.norm(points[:, None] - points[None], axis=-1)
    types = np.zeros(n, int)
    for i in range(n):
        r_min, r_max, has = np.inf, 0.0, False
        for j in range(n):
            if d[i, j] ** 2 <= 1e-12 or d[i, j] > radius:
                continue
            has = True
            ang = np.arccos(np.clip(normals[i] @ normals[j], -1.0, 1.0))
            r = d[i, j] / max(2.0 * np.sin(ang / 2.0), 1e-3)
            r = min(max(r, 0.0), 1e3)
            r_min, r_max = min(r_min, r), max(r_max, r)
        if not has:
            types[i] = 5
            continue
        if r_min > 2.0 * radius:
            types[i] = 0          # plane
        elif r_min < 2.0 * radius < r_max and r_min > 0.5 * radius:
            types[i] = 1          # cylinder
        elif r_max < 2.0 * radius and r_min > 0.5 * radius:
            types[i] = 3          # sphere
        elif r_min < 0.15 * radius:
            types[i] = 4          # edge
        else:
            types[i] = 2          # noise / corner
    return types


def grsd_ref(points, normals, radius, types=None):
    if types is None:
        types = grsd_types_ref(points, normals, radius)
    n = len(points)
    d = np.linalg.norm(points[:, None] - points[None], axis=-1)
    h = np.zeros(21)
    for i in range(n):
        for j in range(n):
            if d[i, j] ** 2 <= 1e-12 or d[i, j] > radius:
                continue
            lo, hi = min(types[i], types[j]), max(types[i], types[j])
            h[(lo * (11 - lo)) // 2 + (hi - lo)] += 1.0
    return h / max(h.sum(), 1e-30)
