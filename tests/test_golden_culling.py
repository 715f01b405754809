"""Golden loop-oracle for VoxelGridCulling keypoint selection.

Independent numpy transcription of the reference's culling pipeline
(keypoints/keypoints_voxel_grid_culling.cpp):

  * getScoresForKeypoints (:280-344): curvature / gaussian / KPQ geometry
    scores, CIELab color-distance score, combined-score normalization
    (x - min) / max (sic);
  * computeKPQ (:441-471) including the FLT_MIN inits of max_K / max_k1
    (an all-negative support clamps them to ~0, not the true max) and the
    1000/num*num precedence quirk (~= 1000);
  * computeThresholds (:346-432): CutOff quantile, fixed Threshold, and the
    "auto" histogram-step heuristic;
  * the accept logic (:204-257) for RequireOne / RequireBoth /
    RequireCombinedList;
  * refineKeypointPosition (:509-607): best-scoring neighbor keypoint within
    1.5*leaf consolidated via the per-keypoint passed flags, refined point =
    MIDPOINT of keypoint and best neighbor, colors averaged.

Principal curvatures transcribe PCL PrincipalCurvaturesEstimation::
computePointPrincipalCurvatures (principal_curvatures.hpp): project neighbor
normals with M = I - n n^T, demean, summed covariance, eigenvalues scaled by
1/indices.size().

Shared inputs (pinned by their own tests elsewhere): the voxel-grid keypoint
stage (positions + voxel-averaged normals/colors) and analytic cloud normals.
Documented divergences exercised as implemented: the gaussian projection
normal is the keypoint's voxel-averaged normal (the reference inherits a PCL
out-of-correspondence indexing quirk, see models/keypoints.py module
docstring), and colors stay float in [0,1] (no uint8 truncation).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from point_cloud_donkey_tpu.models.keypoints import (KeypointParams,
                                                     detect_keypoints)
from point_cloud_donkey_tpu.ops.voxel_grid import voxel_grid

from golden_ref import color_distance_ref, rgb2cielab_norm_ref

LEAF = 0.3
FLT_MIN = float(np.finfo(np.float32).tiny)


# ---------------------------------------------------------------------------
# loop oracles
# ---------------------------------------------------------------------------

def _neighbors(q, pts, radius):
    d2 = ((pts - q) ** 2).sum(axis=1)
    idxs = np.nonzero(d2 <= radius * radius)[0]
    return idxs[np.argsort(d2[idxs], kind="stable")]  # radiusSearch order


def principal_curvatures_ref(queries, query_normals, pts, nrm, radius):
    pc1 = np.zeros(len(queries))
    pc2 = np.zeros(len(queries))
    for i in range(len(queries)):
        idxs = _neighbors(queries[i], pts, radius)
        if len(idxs) == 0:
            continue
        n = query_normals[i]
        M = np.eye(3) - np.outer(n, n)
        proj = nrm[idxs] @ M.T
        dm = proj - proj.mean(axis=0)
        vals = np.linalg.eigvalsh(dm.T @ dm)
        pc1[i] = vals[2] / len(idxs)
        pc2[i] = vals[1] / len(idxs)
    return pc1, pc2


def curvature_score_ref(kp, pts, radius):
    """NormalEstimation curvature recomputed at the keypoints
    (culling.cpp:156-195): lambda0 / (sum lambda) of the neighbor-position
    covariance."""
    out = np.zeros(len(kp))
    for i in range(len(kp)):
        idxs = _neighbors(kp[i], pts, radius)
        if len(idxs) == 0:
            continue
        dm = pts[idxs] - pts[idxs].mean(axis=0)
        vals = np.linalg.eigvalsh(dm.T @ dm)
        total = vals.sum()
        out[i] = vals[0] / total if total > 0 else 0.0
    return out


def kpq_ref(kp, pts, nrm, radius):
    dense_pc1, dense_pc2 = principal_curvatures_ref(pts, nrm, pts, nrm,
                                                    radius)
    out = np.zeros(len(kp))
    for i in range(len(kp)):
        idxs = _neighbors(kp[i], pts, radius)
        if len(idxs) == 0:
            continue
        k1 = dense_pc1[idxs]
        k2 = dense_pc2[idxs]
        K = k1 * k2
        max_k1 = max(k1.max(), FLT_MIN)   # FLT_MIN inits, culling.cpp:444-446
        min_k2 = k2.min()
        max_K = max(K.max(), FLT_MIN)
        min_K = K.min()
        out[i] = (1000.0 * K.sum() + 100.0 * max_K + abs(100.0 * min_K)
                  + 10.0 * max_k1 + abs(10.0 * min_k2))
    return out


def color_score_ref(kp_rgb_i, idxs, rgb, max_dist):
    lab_ref = rgb2cielab_norm_ref(kp_rgb_i)
    cnt = 0
    for j in idxs:
        lab = rgb2cielab_norm_ref(rgb[j])
        if color_distance_ref(lab, lab_ref) > max_dist:
            cnt += 1
    return cnt / len(idxs) if len(idxs) else 0.0


def auto_threshold_ref(scores):
    srt = np.sort(scores)
    hist_size = 100
    step = (srt[-1] - srt[0]) / hist_size
    if step <= 0:
        return -np.inf
    hist = [0] * hist_size
    for val in srt:
        b = int((val - srt[0]) / step)
        b = min(max(b, 0), hist_size - 1)
        hist[b] += 1
    cutoff = 0
    for x in range(hist_size - 2):
        cutoff += hist[x]
        if (hist[x + 1] - hist[x]) * 2 < (hist[x + 2] - hist[x + 1]):
            cutoff += hist[x + 1]
            break
    return srt[min(cutoff, len(srt) - 1)]


def culling_oracle(kp, kp_n, kp_rgb, pts, nrm, rgb, p: KeypointParams):
    geo = p.filter_method_geometry.lower()
    col = p.filter_method_color.lower()
    k = len(kp)

    geo_scores = np.zeros(k)
    if geo == "curvature":
        geo_scores = curvature_score_ref(kp, pts, p.leaf_size)
    elif geo == "gaussian":
        pc1, pc2 = principal_curvatures_ref(kp, kp_n, pts, nrm, p.leaf_size)
        geo_scores = pc1 * pc2
    elif geo == "kpq":
        geo_scores = kpq_ref(kp, pts, nrm, p.leaf_size)

    color_scores = np.zeros(k)
    if col == "colordistance":
        for i in range(k):
            idxs = _neighbors(kp[i], pts, p.leaf_size)
            color_scores[i] = color_score_ref(
                kp_rgb[i], idxs, rgb, p.max_similar_color_distance)

    gmin, gmax = geo_scores.min(), geo_scores.max()
    cmin, cmax = color_scores.min(), color_scores.max()
    combined = ((geo_scores - gmin) / gmax if gmax != 0 else 0 * geo_scores) \
        + ((color_scores - cmin) / cmax if cmax != 0 else 0 * color_scores)

    t_geo = t_col = t_comb = FLT_MIN  # culling.cpp:351-353
    gtype = p.filter_type_geometry.lower()
    ctype = p.filter_type_color.lower()
    if geo != "none" and gtype == "auto":
        t_geo = auto_threshold_ref(geo_scores)
    if geo != "none" and gtype == "cutoff":
        srt = np.sort(geo_scores)
        t_geo = srt[min(int(p.filter_cutoff_ratio * k), k - 1)]
    if col != "none" and ctype == "cutoff":
        srt = np.sort(color_scores)
        t_col = srt[min(int(p.filter_cutoff_ratio * k), k - 1)]
    if geo != "none" and col != "none" and gtype == "cutoff" \
            and ctype == "cutoff":
        srt = np.sort(combined)
        t_comb = srt[min(int(p.filter_cutoff_ratio * k), k - 1)]
    if geo != "none" and gtype == "threshold":
        t_geo = p.filter_threshold_geometry
    if col != "none" and ctype == "threshold":
        t_col = p.filter_threshold_color

    geo_passed = geo_scores >= t_geo if geo != "none" else np.ones(k, bool)
    col_passed = color_scores >= t_col if col != "none" else np.ones(k, bool)
    comb_passed = combined >= t_comb

    if geo != "none" and col != "none":
        if p.combine_filters == "RequireOne":
            accept = geo_passed | col_passed
        elif p.combine_filters == "RequireBoth":
            accept = geo_passed & col_passed
        else:
            accept = comb_passed
    else:
        accept = geo_passed & col_passed

    if not p.refine_position:
        return kp[accept], (kp_rgb[accept] if kp_rgb is not None else None)

    # refineKeypointPosition
    out, out_rgb = [], []
    for i in np.nonzero(accept)[0]:
        idxs = _neighbors(kp[i], kp, p.leaf_size * 1.5)
        def first_max(scores):
            best, best_s = -1, -1.0
            for j in idxs:
                if scores[j] > best_s:
                    best, best_s = j, scores[j]
            return best
        bg = first_max(geo_scores) if geo != "none" else -1
        bc = first_max(color_scores) if col != "none" else -1
        if geo == "none":
            best = bc
        elif col == "none":
            best = bg
        else:
            best = first_max(combined)
            if geo_passed[i] and not col_passed[i]:
                best = bg
            if col_passed[i] and not geo_passed[i]:
                best = bc
            if col_passed[i] and geo_passed[i] and bg == bc:
                best = bg
        out.append(0.5 * (kp[best] + kp[i]))
        if kp_rgb is not None:
            out_rgb.append(0.5 * (kp_rgb[best] + kp_rgb[i]))
    pos = np.asarray(out, np.float64).reshape(-1, 3)
    return pos, (np.asarray(out_rgb, np.float64).reshape(-1, 3)
                 if kp_rgb is not None else None)


# ---------------------------------------------------------------------------
# fixtures: bumpy ellipsoid with analytic normals + smooth colors
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(7)
    n = 500
    u = rng.normal(size=(n, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    axes = np.array([1.4, 1.0, 0.7])
    bump = 1.0 + 0.15 * np.sin(4 * u[:, 0]) * np.cos(3 * u[:, 1])
    pts = (u * axes * bump[:, None]).astype(np.float32)
    # analytic-ish normals: ellipsoid gradient, unit length (shared input)
    nrm = (u / axes).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    rgb = (0.5 + 0.5 * np.stack([
        np.sin(3 * pts[:, 0]), np.cos(2 * pts[:, 1]),
        np.sin(pts[:, 2] + 1)], axis=1)).astype(np.float32) * 0.9
    return pts, nrm, rgb


@pytest.fixture(scope="module")
def voxel_stage(cloud):
    """Shared input: the voxel keypoint stage (positions + voxel-averaged
    normals / colors), pinned against PCL semantics by its own tests."""
    pts, nrm, rgb = cloud
    res = voxel_grid(jnp.asarray(pts), jnp.ones(len(pts), bool),
                     jnp.asarray(LEAF, jnp.float32),
                     features=jnp.asarray(np.concatenate([nrm, rgb], axis=1)))
    full = np.asarray(res.centroids)[np.asarray(res.mask)]
    return full[:, :3], full[:, 3:6], full[:, 6:9]


CASES = [
    dict(filter_method_geometry="Curvature", filter_type_geometry="Auto"),
    dict(filter_method_geometry="Curvature", filter_type_geometry="CutOff",
         filter_cutoff_ratio=0.4),
    dict(filter_method_geometry="KPQ", filter_type_geometry="CutOff",
         filter_cutoff_ratio=0.5, refine_position=True),
    dict(filter_method_geometry="Gaussian", filter_type_geometry="CutOff",
         filter_method_color="ColorDistance", filter_type_color="CutOff",
         filter_cutoff_ratio=0.3, max_similar_color_distance=0.05,
         combine_filters="RequireCombinedList"),
    dict(filter_method_geometry="Gaussian", filter_type_geometry="CutOff",
         filter_method_color="ColorDistance", filter_type_color="Threshold",
         filter_threshold_color=0.2, filter_cutoff_ratio=0.5,
         max_similar_color_distance=0.05, combine_filters="RequireOne",
         refine_position=True),
    dict(filter_method_geometry="KPQ", filter_type_geometry="CutOff",
         filter_method_color="ColorDistance", filter_type_color="CutOff",
         filter_cutoff_ratio=0.4, max_similar_color_distance=0.05,
         combine_filters="RequireBoth"),
    dict(filter_method_color="ColorDistance", filter_type_color="CutOff",
         filter_cutoff_ratio=0.5, max_similar_color_distance=0.05,
         refine_position=True),
    # RequireCombinedList with fixed thresholds: the combined threshold
    # keeps its FLT_MIN init (culling.cpp:351-353), so the keypoint ranked
    # last by BOTH measures (combined score exactly 0) is rejected
    dict(filter_method_geometry="Gaussian", filter_type_geometry="Threshold",
         filter_threshold_geometry=-1e30, filter_method_color="ColorDistance",
         filter_type_color="Threshold", filter_threshold_color=-1e30,
         max_similar_color_distance=0.05,
         combine_filters="RequireCombinedList"),
]


@pytest.mark.parametrize("case", CASES, ids=[
    "curv-auto", "curv-cutoff", "kpq-refine", "gauss-color-combined",
    "gauss-color-one-refine", "kpq-color-both", "color-only-refine",
    "combined-fltmin-quirk"])
def test_culling_matches_loop_oracle(cloud, voxel_stage, case):
    pts, nrm, rgb = cloud
    kp, kp_n, kp_rgb = voxel_stage
    params = KeypointParams(type="VoxelGridCulling", leaf_size=LEAF, **case)

    got, got_rgb = detect_keypoints(pts, nrm, rgb, params,
                                    return_colors=True)
    want, want_rgb = culling_oracle(kp.astype(np.float64),
                                    kp_n.astype(np.float64),
                                    kp_rgb.astype(np.float64),
                                    pts.astype(np.float64),
                                    nrm.astype(np.float64),
                                    rgb.astype(np.float64), params)

    assert got.shape == want.shape, \
        f"keypoint count {got.shape} vs oracle {want.shape}"
    np.testing.assert_allclose(got, want, atol=2e-5)
    if got_rgb is not None and want_rgb is not None:
        np.testing.assert_allclose(got_rgb, want_rgb, atol=2e-5)


@pytest.mark.parametrize("ktype", ["Harris3D", "ISS3D", "SIFT3D"])
def test_tiled_detector_keypoints_match_dense(cloud, ktype):
    """Harris3D / ISS3D / SIFT3D at scene scale (windowed passes) must
    reproduce the dense programs' keypoints."""
    import point_cloud_donkey_tpu.ops.tiled as tiled
    pts, nrm, _ = cloud
    if ktype == "Harris3D":
        # perturb the smooth analytic normals so corners exist
        rng = np.random.default_rng(3)
        nrm = nrm + 0.3 * rng.normal(size=nrm.shape).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        params = KeypointParams(type="Harris3D", radius=0.35,
                                harris_threshold=1e-6)
    elif ktype == "ISS3D":
        params = KeypointParams(type="ISS3D", iss_salient_radius=0.35,
                                iss_nonmax_radius=0.2, iss_min_neighbors=4)
    else:
        params = KeypointParams(type="SIFT3D", radius=0.2)
    dense = detect_keypoints(pts, nrm, None, params)
    orig = tiled.SCENE_TILE_THRESHOLD
    try:
        tiled.SCENE_TILE_THRESHOLD = 100
        scene = detect_keypoints(pts, nrm, None, params)
    finally:
        tiled.SCENE_TILE_THRESHOLD = orig
    assert len(dense) > 3, "degenerate test: almost no keypoints"
    assert dense.shape == scene.shape
    np.testing.assert_allclose(dense, scene, atol=2e-5)


def test_kpq_auto_rejected(cloud):
    """The reference exits on KPQ + Auto (culling.cpp:102-106); we raise."""
    pts, nrm, _ = cloud
    params = KeypointParams(type="VoxelGridCulling", leaf_size=LEAF,
                            filter_method_geometry="KPQ",
                            filter_type_geometry="Auto")
    with pytest.raises(ValueError, match="Auto is not supported"):
        detect_keypoints(pts, nrm, None, params)


@pytest.mark.parametrize("geo,col", [
    ("curvature", "none"), ("gaussian", "none"), ("kpq", "none"),
    ("none", "colordistance"), ("kpq", "colordistance")],
    ids=["curv", "gauss", "kpq", "color", "kpq-color"])
def test_tiled_culling_scores_match_dense(cloud, voxel_stage, geo, col):
    """The scene-scale windowed stages must reproduce the dense program's
    scores (same math, O(chunk*window) memory) -- compared at score level so
    fp-order epsilons can't flip a threshold."""
    from point_cloud_donkey_tpu.models.keypoints import (_tiled_culling_scores,
                                                         culling_scores)
    pts, nrm, rgb = cloud
    kp, kp_n, kp_rgb = voxel_stage
    g_d, c_d = culling_scores(
        jnp.asarray(kp), jnp.ones(len(kp), bool), jnp.asarray(kp_n),
        jnp.asarray(kp_rgb), jnp.asarray(pts), jnp.ones(len(pts), bool),
        jnp.asarray(nrm), jnp.asarray(rgb), geo, col, LEAF, 0.05)
    g_t, c_t = _tiled_culling_scores(kp, kp_n, kp_rgb, pts, nrm, rgb,
                                     geo, col, LEAF, 0.05)
    # fp32 summation order differs between the windowed and dense programs
    np.testing.assert_allclose(np.asarray(g_d), g_t, rtol=5e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_d), c_t, rtol=5e-3, atol=2e-5)


def test_scene_tiled_culling_end_to_end(cloud):
    """Lowering the tiling threshold routes detect_keypoints through the
    tiled stages; final keypoints must match the dense path for every
    method (reference supports culling at any cloud size)."""
    import point_cloud_donkey_tpu.ops.tiled as tiled
    pts, nrm, rgb = cloud
    orig = tiled.SCENE_TILE_THRESHOLD
    for case in [dict(filter_method_geometry="Curvature",
                      filter_type_geometry="CutOff", filter_cutoff_ratio=0.4),
                 dict(filter_method_geometry="Gaussian",
                      filter_type_geometry="CutOff", filter_cutoff_ratio=0.5),
                 dict(filter_method_geometry="KPQ",
                      filter_type_geometry="CutOff", filter_cutoff_ratio=0.5,
                      filter_method_color="ColorDistance",
                      filter_type_color="CutOff",
                      max_similar_color_distance=0.05)]:
        params = KeypointParams(type="VoxelGridCulling", leaf_size=LEAF,
                                **case)
        dense = detect_keypoints(pts, nrm, rgb, params)
        try:
            tiled.SCENE_TILE_THRESHOLD = 100
            scene = detect_keypoints(pts, nrm, rgb, params)
        finally:
            tiled.SCENE_TILE_THRESHOLD = orig
        assert dense.shape == scene.shape, case
        np.testing.assert_allclose(dense, scene, atol=1e-5)
