"""Voting: vote-space maxima search and hypothesis assembly.

Reference: voting/voting.cpp (driver), voting/voting_mean_shift.cpp (continuous
space), voting/maxima_handler.cpp (post-processing).

Flow per class (Voting::findMaxima, voting.cpp:79-328):
  1. iFindMaxima (mean-shift): seeds -> converge -> densities -> average ->
     suppress -> per-maximum density with sequential vote reweighting.
  2. Optional RANSAC vote filtering (not in the default configs; host-side).
  3. Per maximum: instance-id weight accumulation, bbox weighted average,
     optional quaternion averaging, weight = cluster density.
  4. Cross-class maxima filtering (None/Simple/Merge), weight normalization,
     min-threshold (negative = relative to best), best-k cut.

Single-object mode (voting_mean_shift.cpp:76-156): with max type DEFAULT the
full mean-shift still runs; with BANDWIDTH / MODEL_RADIUS / VOTING_SPACE the
single maximum is the cloud centroid and only the density bandwidth changes.

The class loop is host-side (few dozen classes); each class's heavy kernels
(seeding, mean-shift, densities) are jit programs from ops/mean_shift.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry as geo
from ..ops import mean_shift as ms
from .codebook import CastVotes


@dataclass
class VotingParams:
    """Voting parameters (voting/voting.cpp:28-50 + voting_mean_shift.cpp:22-26)."""
    min_threshold: float = 0.0
    min_votes_threshold: int = 1
    best_k: int = -1
    average_rotation: bool = False
    radius_type: str = "Config"        # BinOrBandwidthType
    radius_factor: float = 1.0
    max_filter_type: str = "None"
    single_object_max_type: str = "Default"
    single_object_mode: bool = False
    voting_type: str = "MeanShift"     # MeanShift | Hough3D
    # Hough3D parameters (voting_hough_3d.cpp:19-23)
    use_interpolation: bool = True
    min_coord: tuple = (-5.0, -5.0, -5.0)
    max_coord: tuple = (5.0, 5.0, 5.0)
    rel_threshold: float = 0.8
    bandwidth: float = 0.2
    threshold: float = 1e-3
    max_iter: int = 1000
    kernel: str = "Gaussian"
    maxima_suppression: str = "Average"
    # global feature verification (wired in a later stage)
    use_global_features: bool = False
    global_feature_method: str = "KNN"
    k_global_features: int = 1
    merge_function: int = 3
    min_svm_score: float = 0.70
    rate_limit: float = 0.60
    weight_factor: float = 1.5
    global_min_points: int = 500
    # ransac vote filtering
    use_ransac: bool = False
    ransac_refine: bool = False
    ransac_inlier_threshold: float = 0.1
    ransac_inlier_threshold_type: str = "Fixed"
    # capacities (TPU static shapes)
    seed_capacity: int = 1024
    max_maxima: int = 64


@dataclass
class VotingMaximum:
    """One detection hypothesis (voting/voting_maximum.h:51-88)."""
    class_id: int = 0
    instance_id: int = 0
    position: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    weight: float = 0.0
    instance_weight: float = 0.0
    bb_size: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    bb_quat: np.ndarray = field(default_factory=lambda: np.array([1, 0, 0, 0], np.float32))
    num_votes: int = 0
    vote_indices: Optional[np.ndarray] = None  # indices into the class vote list
    # global-classifier hypothesis (classifier stage)
    glob_class_id: int = -1
    glob_class_weight: float = 0.0
    glob_instance_id: int = -1
    glob_instance_weight: float = 0.0


def get_search_dist(class_id: int, params: VotingParams,
                    dims_map: Dict[int, Tuple[float, float]]) -> float:
    """MaximaHandler::getSearchDistForClass (maxima_handler.cpp:509-521)."""
    rt = params.radius_type
    if rt in ("Config", "Fixed"):
        return params.bandwidth
    if rt in ("FirstDim", "ObjectRadius"):
        return dims_map[class_id][0] * params.radius_factor
    if rt in ("SecondDim", "BoundingBoxMedian"):
        return dims_map[class_id][1] * params.radius_factor
    return params.bandwidth


import functools


def _mean_shift_body(seed_cap: int, suppression: str, threshold: float,
                     max_iter: int, kernel: str):
    """Unjitted mean-shift pipeline over one (padded) class vote set; shared
    by the per-class jit and the cross-(cloud, class) vmapped batch."""

    def run(v, w, valid, bw):
        seeds, _, seed_mask = ms.create_seeds(v, w, valid, ms.seeds_range(bw),
                                              seed_cap)
        centers, alive = ms.mean_shift(seeds, seed_mask, v, w, valid, bw,
                                       threshold, max_iter, kernel)
        dens = ms.estimate_density(centers, v, w, valid, bw, kernel)
        if suppression == "Average":
            centers2, owner_mask = ms.average_neighbor_maxima(centers, alive, dens, bw)
            dens2 = ms.estimate_density(centers2, v, w, valid, bw, kernel)
            keep = ms.suppress_neighbor_maxima(centers2, owner_mask, dens2, bw)
            return centers2, dens2, keep
        keep = ms.suppress_neighbor_maxima(centers, alive, dens, bw)
        return centers, dens, keep

    return run


@functools.lru_cache(maxsize=None)
def _mean_shift_program(v_cap: int, seed_cap: int, suppression: str,
                        threshold: float, max_iter: int, kernel: str):
    """Jitted mean-shift pipeline for one (padded) class vote set, cached per
    static shape/config so repeated detections reuse the compiled program."""
    return jax.jit(_mean_shift_body(seed_cap, suppression, threshold,
                                    max_iter, kernel))


@functools.lru_cache(maxsize=None)
def _mean_shift_batch_program(b: int, v_cap: int, seed_cap: int,
                              suppression: str, threshold: float,
                              max_iter: int, kernel: str):
    """Vmapped variant: one dispatch runs the mean-shift pipeline for b
    (cloud, class) vote groups at once; the bandwidth is a per-row input, so
    groups with different per-class search distances share the program."""
    return jax.jit(jax.vmap(_mean_shift_body(seed_cap, suppression,
                                             threshold, max_iter, kernel)))


def class_mean_shift_batch(items: List[Tuple[np.ndarray, np.ndarray, float]],
                           params: "VotingParams") -> List[np.ndarray]:
    """Mean-shift maxima positions for many (positions, weights, bandwidth)
    vote groups with ONE device dispatch per 8-group chunk (grouped by padded
    vote-count bucket).  Each output matches _class_mean_shift's first return
    (maxima in descending-density order); used by detect_batch to avoid one
    dispatch per class per cloud (the reference's per-class iFindMaxima loop,
    voting.cpp:130)."""
    from ..models.features import bucket_size
    mb = 8
    out: List[Optional[np.ndarray]] = [None] * len(items)
    buckets: Dict[int, List[int]] = {}
    for idx, (p, _w, _bw) in enumerate(items):
        buckets.setdefault(bucket_size(len(p), minimum=64), []).append(idx)

    for cap, idxs in buckets.items():
        seed_cap = min(params.seed_capacity, cap)
        for c0 in range(0, len(idxs), mb):
            chunk = idxs[c0:c0 + mb]
            # pow-2 widths: a lone group (e.g. single-class detect) costs a
            # width-1 program, not 8x padded compute; at most 4 width
            # variants per cap bucket
            width = 1
            while width < len(chunk):
                width *= 2
            prog = _mean_shift_batch_program(
                width, cap, seed_cap, params.maxima_suppression,
                params.threshold, params.max_iter, params.kernel)
            padded = chunk + [chunk[-1]] * (width - len(chunk))
            v = np.stack([_pad_rows(items[j][0], cap, 1e9) for j in padded])
            w = np.stack([_pad_rows(items[j][1], cap) for j in padded])
            val = np.stack([np.arange(cap) < len(items[j][0])
                            for j in padded])
            bw = np.asarray([items[j][2] for j in padded], np.float32)
            centers, dens, keep = jax.device_get(prog(
                jnp.asarray(v), jnp.asarray(w), jnp.asarray(val),
                jnp.asarray(bw)))
            for r, j in enumerate(chunk):
                kept_pos = centers[r][keep[r]]
                kept_dens = dens[r][keep[r]]
                order = np.argsort(-kept_dens, kind="stable")
                out[j] = kept_pos[order]
    return [m for m in out]  # type: ignore[misc]


@functools.lru_cache(maxsize=None)
def _reweight_program(m_cap: int, v_cap: int, kernel: str):
    @jax.jit
    def run(m_pos, m_mask, v, w, valid, bw):
        dens, final_w, membership = ms.density_and_reweight(
            m_pos, m_mask, v, w, valid, bw, kernel)
        # one packed device->host pull instead of three (tunnel round-trips
        # dominate the host detect path)
        return jnp.concatenate([
            dens, final_w, membership.astype(jnp.float32).reshape(-1)])
    return run


def _pad_rows(a: np.ndarray, cap: int, fill: float = 0.0) -> np.ndarray:
    out = np.full((cap,) + a.shape[1:], fill, a.dtype)
    out[:len(a)] = a
    return out


# below this many kernel evaluations, host numpy beats a device dispatch
_REWEIGHT_HOST_LIMIT = 1 << 20


def _reweight_host(m_pos: np.ndarray, v_pos: np.ndarray, v_w: np.ndarray,
                   bandwidth: float, kernel: str
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-numpy sequential estimateDensityAndReweightVotes: each maximum
    reweights the votes inside its window IN PLACE, so a later maximum with
    an overlapping window sees updated weights (voting_mean_shift.cpp:158-176,
    289-328).  Float32 math matching ops.mean_shift.density_and_reweight
    (equality pinned by tests/test_detection.py)."""
    b2 = np.float32(bandwidth) ** 2
    w = v_w.astype(np.float32).copy()
    membership = np.zeros((len(m_pos), len(v_pos)), bool)
    for mi in range(len(m_pos)):
        d2 = np.sum((v_pos.astype(np.float32)
                     - m_pos[mi].astype(np.float32)[None, :]) ** 2,
                    axis=1).astype(np.float32)
        in_r = d2 <= b2
        if kernel == "Gaussian":
            k = np.exp(np.float32(-0.5) * d2 / b2).astype(np.float32)
        else:
            k = np.ones_like(d2)
        w = np.where(in_r, (k * w).astype(np.float32), w)
        membership[mi] = in_r
    return w, membership


def _class_mean_shift(
    positions: np.ndarray,   # [V, 3] votes of this class
    weights: np.ndarray,     # [V]
    bandwidth: float,
    params: VotingParams,
) -> Tuple[np.ndarray, np.ndarray]:
    """Mean-shift + averaging + suppression for one class's votes.  Returns
    (maxima positions [M', 3] in descending-density order, densities)."""
    from ..models.features import bucket_size
    cap = bucket_size(len(positions), minimum=64)
    v = jnp.asarray(_pad_rows(positions, cap, 1e9))
    w = jnp.asarray(_pad_rows(weights, cap))
    valid = jnp.asarray(np.arange(cap) < len(positions))
    bw = jnp.asarray(bandwidth, jnp.float32)

    seed_cap = min(params.seed_capacity, cap)
    run = _mean_shift_program(cap, seed_cap, params.maxima_suppression,
                              params.threshold, params.max_iter, params.kernel)
    centers, dens, keep = run(v, w, valid, bw)
    centers_np = np.asarray(centers)
    dens_np = np.asarray(dens)

    keep_np = np.asarray(keep)
    kept_pos = centers_np[keep_np]
    kept_dens = dens_np[keep_np]
    # suppression emits maxima in descending-density order; the later
    # sequential reweighting is order-dependent (voting_mean_shift.cpp:158-176)
    order = np.argsort(-kept_dens, kind="stable")
    return kept_pos[order], kept_dens[order]


def find_maxima(
    votes: CastVotes,            # flat cast votes (np or jnp arrays)
    cloud_points: np.ndarray,    # [N, 3] scene points (without NaN normals)
    cloud_mask: np.ndarray,      # [N]
    params: VotingParams,
    dims_map: Dict[int, Tuple[float, float]],
    ms_precomputed: Optional[Dict[int, np.ndarray]] = None,
) -> List[VotingMaximum]:
    """Voting::findMaxima minus global-feature verification (wired by the
    orchestrator after this call).  ms_precomputed optionally supplies the
    per-class mean-shift maxima positions (already density-sorted) computed
    batched across clouds (class_mean_shift_batch); everything downstream
    (RANSAC, reweighting, assembly) is unchanged."""
    valid = np.asarray(votes.valid)
    if not valid.any():
        return []

    pos = np.asarray(votes.position)[valid]
    weight = np.asarray(votes.weight)[valid]
    cls = np.asarray(votes.class_id)[valid]
    inst = np.asarray(votes.instance_id)[valid]
    bsize = np.asarray(votes.bbox_size)[valid]
    bquat = np.asarray(votes.bbox_quat)[valid]
    v_scene_kp = np.asarray(votes.keypoint)[valid]
    v_train_kp = np.asarray(votes.keypoint_training)[valid]

    maxima: List[VotingMaximum] = []

    for class_id in sorted(set(cls.tolist())):
        sel = cls == class_id
        v_pos, v_w = pos[sel], weight[sel]
        v_inst, v_bs, v_bq = inst[sel], bsize[sel], bquat[sel]

        bandwidth = get_search_dist(class_id, params, dims_map)

        single = params.single_object_mode
        max_type = params.single_object_max_type
        hough_members = None
        if params.voting_type == "Hough3D":
            if single:
                import warnings
                warnings.warn("SingleObjectMode is not supported with Hough3D")
            m_pos, m_dens, hough_members = _class_hough_device(
                v_pos, v_w, bandwidth, params)
        elif ms_precomputed is not None and class_id in ms_precomputed \
                and ((not single)
                     or (single and max_type in ("None", "Default"))):
            m_pos = ms_precomputed[class_id]
        elif (not single) or (single and max_type in ("None", "Default")):
            m_pos, _ = _class_mean_shift(v_pos, v_w, bandwidth, params)
        else:
            # single object mode with special max type: centroid query
            m = cloud_mask.astype(np.float32)
            centroid = (cloud_points * m[:, None]).sum(0) / max(m.sum(), 1.0)
            if max_type == "ModelRadiusVotes":
                d = np.linalg.norm(cloud_points - centroid, axis=1)
                bandwidth = float(np.max(np.where(cloud_mask, d, 0.0)))
            elif max_type == "VotingSpaceVotes":
                bandwidth = float(np.linalg.norm(v_pos - centroid, axis=1).max()) \
                    if len(v_pos) else bandwidth
            # BandwidthVotes keeps the class search dist
            m_pos = centroid[None, :].astype(np.float32)

        if len(m_pos) == 0:
            continue

        if params.use_ransac and len(m_pos):
            # optional RANSAC vote filtering (voting.cpp:110-127):
            # inlier threshold may scale with trained per-class dims
            thr = params.ransac_inlier_threshold
            if params.ransac_inlier_threshold_type == "ObjectRadius":
                thr *= dims_map[class_id][0]
            elif params.ransac_inlier_threshold_type == "BoundingBoxMedian":
                thr *= dims_map[class_id][1]
            if hough_members is not None:
                mem0 = np.zeros((len(m_pos), len(v_pos)), bool)
                for mi, mm in enumerate(hough_members):
                    mem0[mi, mm] = True
            else:
                # pre-assembly membership = votes within bandwidth of center
                d_mv = np.linalg.norm(
                    m_pos[:, None, :] - v_pos[None, :, :], axis=2)
                mem0 = d_mv <= bandwidth
            # input-derived seed: varies across classes/vote sets (the
            # reference re-randomizes per run via rand(); a constant seed
            # would replay the identical sample sequence for every cluster
            # of every detection) while keeping runs reproducible
            seed = (len(v_pos) * 1000003 + len(m_pos) * 101
                    + int(class_id) * 7919) & 0x7FFFFFFF
            m_pos, mem_f = filter_votes_with_ransac(
                m_pos, mem0, v_scene_kp[sel], v_train_kp[sel],
                thr, params.min_votes_threshold, seed=seed)
            if hough_members is not None:
                hough_members = [np.nonzero(r)[0] for r in mem_f]

        if hough_members is not None:
            # Hough path: clusters and weights come straight from the
            # accumulator bins (voting_hough_3d.cpp:72-95); no reweighting
            final_w = v_w
            membership = np.zeros((len(m_pos), len(v_pos)), bool)
            for mi, mem in enumerate(hough_members):
                membership[mi, mem] = True
        elif len(m_pos) * len(v_pos) <= _REWEIGHT_HOST_LIMIT:
            # small problems: the sequential reweight runs as host numpy --
            # one device dispatch per class per cloud costs more tunnel
            # latency than the whole O(M*V) computation (round-2 host
            # detect was 5+ dispatches per cloud)
            final_w, membership = _reweight_host(
                m_pos, v_pos, v_w, bandwidth, params.kernel)
        else:
            # sequential density + vote reweighting over maxima (padded+jit)
            from ..models.features import bucket_size
            m_cap = bucket_size(len(m_pos), minimum=8)
            v_cap = bucket_size(len(v_pos), minimum=64)
            reweight = _reweight_program(m_cap, v_cap, params.kernel)
            packed = np.asarray(reweight(
                jnp.asarray(_pad_rows(m_pos, m_cap, 1e9)),
                jnp.asarray(np.arange(m_cap) < len(m_pos)),
                jnp.asarray(_pad_rows(v_pos, v_cap, 1e9)),
                jnp.asarray(_pad_rows(v_w, v_cap)),
                jnp.asarray(np.arange(v_cap) < len(v_pos)),
                jnp.asarray(bandwidth, jnp.float32)))
            final_w = packed[m_cap:m_cap + v_cap][:len(v_pos)]
            membership = (packed[m_cap + v_cap:]
                          .reshape(m_cap, v_cap) > 0.5)[:len(m_pos),
                                                        :len(v_pos)]

        for mi in range(len(m_pos)):
            members = membership[mi]
            n_votes = int(members.sum())
            if n_votes < max(params.min_votes_threshold, 1):
                continue
            w_members = final_w[members]
            inst_members = v_inst[members]

            # instance weights
            inst_w: Dict[int, float] = {}
            for iid, wv in zip(inst_members.tolist(), w_members.tolist()):
                inst_w[iid] = inst_w.get(iid, 0.0) + wv
            best_inst = max(inst_w, key=inst_w.get)

            max_weight = float(w_members.sum())
            bb = (v_bs[members] * w_members[:, None]).sum(0) / max(max_weight, 1e-30)

            m_out = VotingMaximum(
                class_id=int(class_id),
                instance_id=int(best_inst),
                position=m_pos[mi].astype(np.float32),
                weight=max_weight,
                instance_weight=float(inst_w[best_inst]),
                bb_size=bb.astype(np.float32),
                num_votes=n_votes,
                vote_indices=np.nonzero(members)[0],
            )
            m_out.glob_class_id = int(class_id)
            m_out.glob_instance_id = int(best_inst)
            m_out.glob_class_weight = max_weight
            m_out.glob_instance_weight = float(inst_w[best_inst])
            if params.average_rotation:
                q = geo.quat_weighted_average(
                    jnp.asarray(v_bq[members]),
                    jnp.asarray(w_members / max(max_weight, 1e-30)))
                m_out.bb_quat = np.asarray(q, np.float32)
            maxima.append(m_out)

    return maxima


# ---------------------------------------------------------------------------
# cross-class maxima filtering + final selection (maxima_handler.cpp:272-507)
# ---------------------------------------------------------------------------

def filter_maxima(maxima: List[VotingMaximum], params: VotingParams,
                  dims_map: Dict[int, Tuple[float, float]]) -> List[VotingMaximum]:
    ft = params.max_filter_type
    if ft == "None" or not maxima:
        return maxima
    if ft == "Simple":
        return _suppress_maxima2(maxima, params.bandwidth)
    if ft == "Merge":
        return _merge_and_filter(maxima, params, dims_map)
    return maxima


def _suppress_maxima2(maxima: List[VotingMaximum], radius: float) -> List[VotingMaximum]:
    """suppressNeighborMaxima2 (maxima_handler.cpp:228-269): greedy weight-
    ordered cross-class NMS."""
    out = []
    alive = np.ones(len(maxima), bool)
    weights = np.array([m.weight for m in maxima])
    positions = np.stack([m.position for m in maxima])
    while alive.any():
        i = int(np.argmax(np.where(alive, weights, -np.inf)))
        out.append(maxima[i])
        d = np.linalg.norm(positions - positions[i], axis=1)
        alive &= ~(d < radius)
    return out


def _merge_and_filter(maxima: List[VotingMaximum], params: VotingParams,
                      dims_map: Dict[int, Tuple[float, float]]) -> List[VotingMaximum]:
    """mergeAndFilterMaxima(merge=True) (maxima_handler.cpp:298-383)."""
    dirty = [False] * len(maxima)
    filtered: List[VotingMaximum] = []
    for i, mi in enumerate(maxima):
        if dirty[i]:
            continue
        search_dist = get_search_dist(mi.class_id, params, dims_map)
        close = []
        for j in range(i + 1, len(maxima)):
            if dirty[j]:
                continue
            mj = maxima[j]
            dist = float(np.linalg.norm(mj.position - mi.position))
            other_dist = get_search_dist(mj.class_id, params, dims_map)
            if dist < search_dist and other_dist <= search_dist:
                close.append(mj)
                dirty[j] = True
        if close:
            close.append(mi)
            by_class: Dict[int, List[VotingMaximum]] = {}
            for m in close:
                by_class.setdefault(m.class_id, []).append(m)
            merged = [merge_maxima(group) for group in by_class.values()]
            best = max(merged, key=lambda m: m.weight)
            filtered.append(best)
        else:
            filtered.append(mi)
    return filtered


def merge_maxima(max_list: List[VotingMaximum]) -> VotingMaximum:
    """mergeMaxima (maxima_handler.cpp:386-440): running weight-fused
    position/bbox/quat + accumulated instance weights."""
    result = VotingMaximum()
    inst_w: Dict[int, float] = {}
    glob_hyps = []
    for m in max_list:
        tot = result.weight + m.weight
        result.position = (result.position * result.weight + m.position * m.weight) / max(tot, 1e-30)
        result.bb_size = (result.bb_size * result.weight + m.bb_size * m.weight) / max(tot, 1e-30)
        q = geo.quat_weighted_average(
            jnp.asarray(np.stack([result.bb_quat, m.bb_quat])),
            jnp.asarray(np.array([result.weight, m.weight], np.float32)))
        result.bb_quat = np.asarray(q, np.float32)
        result.class_id = m.class_id
        result.weight = tot
        result.num_votes += m.num_votes
        inst_w[m.instance_id] = inst_w.get(m.instance_id, 0.0) + m.instance_weight
        best = max(inst_w, key=inst_w.get)
        result.instance_id = best
        result.instance_weight = inst_w[best]
        glob_hyps.append((m.glob_class_id, m.glob_class_weight,
                          m.glob_instance_id, m.glob_instance_weight))
    # merge global hypotheses (maxima_handler.cpp:442-507)
    cls_w: Dict[int, float] = {}
    for c, wv, _, _ in glob_hyps:
        cls_w[c] = cls_w.get(c, 0.0) + wv
    best_c = max(cls_w, key=cls_w.get)
    iw: Dict[int, float] = {}
    for c, _, iid, iwv in glob_hyps:
        if c == best_c:
            iw[iid] = iw.get(iid, 0.0) + iwv
    result.glob_class_id = best_c
    result.glob_class_weight = cls_w[best_c]
    if iw:
        best_i = max(iw, key=iw.get)
        result.glob_instance_id = best_i
        result.glob_instance_weight = iw[best_i]
    return result


def normalize_weights(maxima: List[VotingMaximum]) -> None:
    """Turn weights into probabilities (voting.cpp:441-462)."""
    s = sum(m.weight for m in maxima)
    si = sum(m.instance_weight for m in maxima)
    sg = sum(m.glob_class_weight for m in maxima)
    sgi = sum(m.glob_instance_weight for m in maxima)
    for m in maxima:
        m.weight = m.weight / s if s != 0 else 0.0
        m.instance_weight = m.instance_weight / si if si != 0 else 0.0
        m.glob_class_weight = m.glob_class_weight / sg if sg != 0 else 0.0
        m.glob_instance_weight = m.glob_instance_weight / sgi if sgi != 0 else 0.0


def select_maxima(maxima: List[VotingMaximum], params: VotingParams) -> List[VotingMaximum]:
    """Sort, threshold (negative = relative to best), best-k
    (voting.cpp:272, 297-323)."""
    maxima = sorted(maxima, key=lambda m: -m.weight)
    thresh = params.min_threshold
    if thresh < 0:
        best = maxima[0].weight if maxima else 0.0
        thresh = -thresh * best
    maxima = [m for m in maxima if m.weight >= thresh]
    if params.best_k > 0 and len(maxima) >= params.best_k:
        maxima = maxima[:params.best_k]
    return maxima


# ---------------------------------------------------------------------------
# Hough3D accumulator (voting/voting_hough_3d.cpp + PCL HoughSpace3D)
# ---------------------------------------------------------------------------

def _hough_nms(values_keys, rel_threshold: float):
    """Greedy 26-neighborhood non-max suppression over (value, key) bins,
    descending (PCL HoughSpace3D::findMaxima).  Bins are few; host-side."""
    if not values_keys:
        return []
    max_val = max(v for v, _ in values_keys)
    thresh = rel_threshold * max_val
    candidates = sorted(((v, k) for v, k in values_keys if v >= thresh),
                        reverse=True)
    accepted = []
    suppressed = set()
    for val, key in candidates:
        if key in suppressed:
            continue
        accepted.append((val, key))
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    suppressed.add((key[0] + dx, key[1] + dy, key[2] + dz))
    return accepted


def _class_hough_device(positions: np.ndarray, weights: np.ndarray,
                        bandwidth: float, params: VotingParams):
    """TPU-native variant of `_class_hough`: the O(V) accumulation (trilinear
    corner weights + scatter-add) runs as a jitted program (ops/hough.py);
    only the tiny candidate NMS and cluster assembly stay on the host.
    Semantics match the dict-based oracle `_class_hough` (tested equal)."""
    from ..ops.hough import hough_accumulate
    if len(positions) == 0:
        return np.zeros((0, 3), np.float32), np.zeros(0), []
    bin_size = 2.0 * bandwidth
    mn = np.asarray(params.min_coord, np.float32)
    grid, key_min, dims, keys, w8 = hough_accumulate(
        positions, weights, mn, bin_size, params.use_interpolation)

    dx, dy, dz = dims
    occupied = np.nonzero(grid != 0.0)[0]
    if len(occupied) == 0:
        return np.zeros((0, 3), np.float32), np.zeros(0), []
    kx = occupied // (dy * dz) + key_min[0]
    ky = (occupied // dz) % dy + key_min[1]
    kz = occupied % dz + key_min[2]
    values_keys = [(float(grid[f]), (int(x), int(y), int(z)))
                   for f, x, y, z in zip(occupied, kx, ky, kz)]
    accepted = _hough_nms(values_keys, params.rel_threshold)
    if not accepted:
        return np.zeros((0, 3), np.float32), np.zeros(0), []

    # vectorized voter membership: vote touches the bin through any corner
    # with positive interpolation weight (the oracle's voters map)
    local = keys - key_min[None, None, :]
    flat_keys = (local[..., 0] * dy + local[..., 1]) * dz + local[..., 2]
    touch = (w8 > 0) if params.use_interpolation else np.ones_like(w8, bool)
    acc_flat = np.array(
        [((k[0] - key_min[0]) * dy + (k[1] - key_min[1])) * dz
         + (k[2] - key_min[2]) for _, k in accepted])
    member = ((flat_keys[:, :, None] == acc_flat[None, None, :]) &
              touch[:, :, None]).any(axis=1)          # [V, M]

    m_pos, m_dens, members = [], [], []
    for mi, (val, _key) in enumerate(accepted):
        ids = np.nonzero(member[:, mi])[0]
        w = weights[ids]
        center = (positions[ids] * w[:, None]).sum(0) / max(w.sum(), 1e-30)
        m_pos.append(center)
        m_dens.append(val)
        members.append(ids)
    return np.asarray(m_pos, np.float32), np.asarray(m_dens), members


def _class_hough(positions: np.ndarray, weights: np.ndarray,
                 bandwidth: float, params: VotingParams):
    """Discrete Hough voting for one class (voting_hough_3d.cpp:33-95):
    bin edge = 2 * per-class search distance, bounds from config; optional
    trilinear interpolated voting; maxima = bins above
    rel_threshold * max_bin with 26-neighborhood non-max suppression;
    cluster center = weight-averaged positions of the bin's voters.

    Returns (maxima positions, bin densities, per-maximum vote index lists).
    Host-side numpy over the occupied-bin dictionary (vote counts per class
    are small; the accumulator grid itself is never materialized)."""
    if len(positions) == 0:
        return np.zeros((0, 3), np.float32), np.zeros(0), []
    bin_size = 2.0 * bandwidth
    mn = np.asarray(params.min_coord, np.float32)

    rel = (positions - mn[None, :]) / bin_size
    base = np.floor(rel).astype(np.int64)
    frac = rel - base

    bins: Dict[Tuple[int, int, int], float] = {}
    voters: Dict[Tuple[int, int, int], list] = {}

    if params.use_interpolation:
        # PCL HoughSpace3D::voteInt: trilinear spread over the 8 corners of
        # the cell around (rel - 0.5)
        base_i = np.floor(rel - 0.5).astype(np.int64)
        frac_i = (rel - 0.5) - base_i
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w8 = (np.abs(1 - dx - frac_i[:, 0])
                          * np.abs(1 - dy - frac_i[:, 1])
                          * np.abs(1 - dz - frac_i[:, 2])) * weights
                    keys = base_i + np.array([dx, dy, dz])
                    for vi, (key, wv) in enumerate(zip(map(tuple, keys), w8)):
                        if wv <= 0:
                            continue
                        bins[key] = bins.get(key, 0.0) + float(wv)
                        voters.setdefault(key, []).append(vi)
    else:
        for vi, (key, wv) in enumerate(zip(map(tuple, base), weights)):
            bins[key] = bins.get(key, 0.0) + float(wv)
            voters.setdefault(key, []).append(vi)

    if not bins:
        return np.zeros((0, 3), np.float32), np.zeros(0), []

    accepted = _hough_nms([(v, k) for k, v in bins.items()],
                          params.rel_threshold)

    m_pos, m_dens, members = [], [], []
    for val, key in accepted:
        ids = sorted(set(voters[key]))
        w = weights[ids]
        center = (positions[ids] * w[:, None]).sum(0) / max(w.sum(), 1e-30)
        m_pos.append(center)
        m_dens.append(val)
        members.append(np.asarray(ids))
    return np.asarray(m_pos, np.float32), np.asarray(m_dens), members


# ---------------------------------------------------------------------------
# RANSAC vote filtering (voting.cpp:356-433)
# ---------------------------------------------------------------------------

def filter_votes_with_ransac(
    m_pos: np.ndarray,            # [M, 3] cluster centers
    membership: np.ndarray,       # [M, V] bool
    scene_kp: np.ndarray,         # [V, 3] vote keypoints (scene)
    train_kp: np.ndarray,         # [V, 3] codeword training feature positions
    inlier_threshold: float,
    min_votes: int,
    iterations: int = 1000,
    seed: int = 0,
):
    """Per-cluster rigid-correspondence RANSAC
    (pcl::registration::CorrespondenceRejectorSampleConsensus analogue):
    estimate a rigid transform mapping the training keypoints of the
    cluster's votes onto their scene keypoints; keep the cluster if a
    non-identity transform with inliers exists, keeping only inlier votes.
    Deterministic seeded sampling with batched Kabsch estimation replaces
    PCL's rand() loop."""
    rng = np.random.default_rng(seed)
    kept_pos, kept_members = [], []
    for mi in range(len(m_pos)):
        ids = np.nonzero(membership[mi])[0]
        if len(ids) < max(min_votes, 3):
            continue
        src = train_kp[ids]   # object keypoints
        dst = scene_kp[ids]   # scene keypoints
        n = len(ids)
        s = min(iterations, 1000)
        tri = rng.integers(0, n, size=(s, 3))
        a = src[tri]          # [S, 3, 3]
        b = dst[tri]
        am = a.mean(axis=1, keepdims=True)
        bm = b.mean(axis=1, keepdims=True)
        H = np.einsum("sij,sik->sjk", a - am, b - bm)
        U, S_, Vt = np.linalg.svd(H)
        d = np.sign(np.linalg.det(np.einsum("sij,sjk->sik",
                                            np.transpose(Vt, (0, 2, 1)),
                                            np.transpose(U, (0, 2, 1)))))
        D = np.zeros((s, 3, 3))
        D[:, 0, 0] = 1.0
        D[:, 1, 1] = 1.0
        D[:, 2, 2] = d
        R = np.einsum("sij,sjk,skl->sil", np.transpose(Vt, (0, 2, 1)), D,
                      np.transpose(U, (0, 2, 1)))
        t = bm[:, 0, :] - np.einsum("sij,sj->si", R, am[:, 0, :])
        proj = np.einsum("sij,vj->svi", R, src) + t[:, None, :]
        err = np.linalg.norm(proj - dst[None], axis=2)    # [S, V']
        inliers = err < inlier_threshold
        counts = inliers.sum(axis=1)
        best = int(np.argmax(counts))
        if counts[best] >= 3:
            new_members = np.zeros(membership.shape[1], bool)
            new_members[ids[inliers[best]]] = True
            kept_pos.append(m_pos[mi])
            kept_members.append(new_members)
    if not kept_pos:
        return np.zeros((0, 3), np.float32), np.zeros((0, membership.shape[1]), bool)
    return np.stack(kept_pos), np.stack(kept_members)
