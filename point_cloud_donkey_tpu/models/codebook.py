"""Codebook: training-time activation + vote learning, and jit-compiled
detection-time vote casting.

Reference: codebook/codebook.cpp and codebook/codeword_distribution.cpp.

Training (host-orchestrated, heavy kernels in JAX):
  * Per class, activate every feature against the codeword set with the
    activation strategy (KNN k-NN over descriptors, codebook.cpp:109-164)
    and record a vote per (codeword, feature): vote vector = (bbox center -
    keypoint) rotated INTO the feature's LRF; bbox quat composed with the
    conjugated frame quat (codeword_distribution.cpp:37-71).
  * Class sigma: variance of distances between up-to-sqrt(F) class features
    and their activated codewords (codebook.cpp:94-193; stored as variance).
  * KNN k=1 cleanup: keep only codewords with exactly one vote
    ("redundancy-free" pruning, codebook.cpp:201-224).
  * Center weights: per vote, median over activating features of
    exp(-dist^2/sigma^2), sigma=0.5, dist = |keypoint + rotateBack(vote) -
    model_center| (codeword_distribution.cpp:171-243).
  * Statistical class weights in 9 steps (codebook.cpp:226-365):
    term1[c] = 1/#codewords voting for class c; term2[w] = 1/#votes of w;
    term3[c] (per codeword) = share of votes normalized across classes.

Serving state is a set of fixed-shape padded arrays ([C, MV] votes per
codeword); cast_votes is one jit program: exact kNN matmul + masked weight
computation + rotate-back, emitting a flat static-capacity vote tensor.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry as geo
from ..ops.neighbors import knn, descriptor_distance
from .types import FeatureSet


class TrainedCodebook(NamedTuple):
    """Serving-form codebook arrays (the .ismd-equivalent payload)."""
    codewords: np.ndarray        # [C, D] descriptor data
    cw_mask: np.ndarray          # [C]
    cw_weight: np.ndarray        # [C] codeword weight (uniform 1.0 in reference)
    cw_position: np.ndarray      # [C, 3] feature position (RANSAC filtering)
    votes: np.ndarray            # [C, MV, 3] vote vectors (in LRF coords)
    vote_mask: np.ndarray        # [C, MV]
    vote_class: np.ndarray       # [C, MV] int32
    vote_instance: np.ndarray    # [C, MV] int32
    vote_weight: np.ndarray      # [C, MV] learned center weight (median gauss)
    class_weight: np.ndarray     # [C, MV] statistical weight for the vote's class
    bbox_size: np.ndarray        # [C, MV, 3]
    bbox_quat: np.ndarray        # [C, MV, 4] (already composed with conj(frame))
    class_sigma: np.ndarray      # [num_classes] variance of feature<->codeword dists

    @property
    def num_codewords(self) -> int:
        return int(self.cw_mask.sum())


@dataclass
class CodebookParams:
    """Codebook + ActivationStrategy parameters
    (codebook.cpp:32-41, activation_strategy*.h)."""
    use_class_weight: bool = False
    use_vote_weight: bool = False
    use_matching_weight: bool = False
    use_codeword_weight: bool = False
    activation_type: str = "KNN"
    knn_k: int = 1
    use_distance_ratio: bool = False
    distance_ratio_threshold: float = 0.8
    threshold: float = 1.0   # ActivationStrategyThreshold distance
    threshold_capacity: int = 64  # TPU cap on within-threshold activations
    inn_iterations: int = 5       # ActivationStrategyINN
    inn_residual_weight: float = 0.01
    # partial SHOT/CSHOT matching (codebook.cpp:37-38, :416-475, :952-1036)
    use_partial_shot: bool = False
    partial_shot_type: str = "front"
    # FLANNExactMatch (implicit_shape_model.cpp:125, default false): the
    # reference's default is APPROXIMATE kd-tree search (SearchParams(128));
    # here exact=False selects the MXU feature-map chi-square approximation
    # on accelerator backends (ops/neighbors.knn).  CPU is always exact, so
    # goldens are platform-stable either way.
    flann_exact: bool = False


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def _gauss_dist(sigma_sqr: np.ndarray, dist: np.ndarray) -> np.ndarray:
    """gaussDist (codeword_distribution.cpp:23-26): normal pdf with the class
    *variance* passed straight in as sigma^2."""
    return (1.0 / np.sqrt(2.0 * np.pi * sigma_sqr)) * np.exp(
        -(dist ** 2) / (2.0 * sigma_sqr))


import functools


@functools.lru_cache(maxsize=None)
def _knn_program(qn: int, c: int, d: int, k: int, metric: str, exact: bool):
    @jax.jit
    def run(q, db, db_mask):
        return knn(q, db, db_mask, k=k, metric=metric, exact=exact)
    return run


@functools.lru_cache(maxsize=None)
def _knn_program_padded(q_real: int, qn: int, c: int, d: int, k: int,
                        metric: str, exact: bool):
    """_knn_program that pads the query block ON DEVICE: the host uploads
    only q_real rows (bucketed to 256) instead of a pow2-padded chunk --
    uploading an 8192-row pad for a 2.5k-feature training set tripled the
    activation stage's H2D bytes through the tunnel."""
    @jax.jit
    def run(q, db, db_mask):
        qp = jnp.pad(q, ((0, qn - q_real), (0, 0)))
        return knn(qp, db, db_mask, k=k, metric=metric, exact=exact)
    return run


def activate_knn_batch(descriptors: np.ndarray, codewords: np.ndarray,
                       k: int, metric: str, exact: bool = True
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Exact k-NN activation for a feature batch (replaces FLANN index
    queries in activation_strategy_knn.h:42-126).  Jitted and chunked with
    BOTH axes bucketed to powers of two (queries chunked, codewords padded +
    masked): the [chunk, C] distance block stays bounded and the compiled
    program is reused across training models, classes AND training sets of
    similar size -- with the persistent XLA cache this removes the
    per-training-run recompile that used to dominate train() wall time."""
    c, d = codewords.shape
    f = descriptors.shape[0]
    if c <= k:
        idx = np.tile(np.arange(c), (f, 1))
        dd = np.zeros_like(idx, np.float32)
        return dd, idx
    c_pad = 512
    while c_pad < c:
        c_pad *= 2
    # chunk so the [chunk, C] block stays ~64M elements; bucket to pow2
    chunk = max(64, min(8192, (1 << 26) // c_pad))
    b = 64
    while b < chunk:
        b *= 2
    chunk = b
    cw = np.zeros((c_pad, d), np.float32)
    cw[:c] = codewords
    run = _knn_program(chunk, c_pad, d, k, metric, exact)
    cw_j = jnp.asarray(cw)
    mask_j = jnp.arange(c_pad) < c      # padded entries -> +inf distance
    # dispatch every chunk, then ONE host fetch for all results (each
    # np.asarray is a full tunnel round-trip on axon).  Full chunks upload
    # as-is; the final partial chunk uploads only its real rows (bucketed
    # to 256) and pads ON DEVICE -- H2D bytes through the tunnel are the
    # stage cost, not the padded FLOPs.
    handles = []
    for i0 in range(0, f, chunk):
        qi = np.ascontiguousarray(descriptors[i0:i0 + chunk], np.float32)
        if len(qi) == chunk:
            handles.append(run(jnp.asarray(qi), cw_j, mask_j))
        else:
            q_real = -(-len(qi) // 256) * 256
            qpad = np.zeros((q_real, d), np.float32)
            qpad[:len(qi)] = qi
            runp = _knn_program_padded(q_real, chunk, c_pad, d, k, metric,
                                       exact)
            handles.append(runp(jnp.asarray(qpad), cw_j, mask_j))
    fetched = jax.device_get(handles)
    dists = np.concatenate([dd for dd, _ in fetched])[:f]
    idx = np.concatenate([ii for _, ii in fetched])[:f]
    return dists, idx


def build_device_activation(cache_entries, model_order: List[int],
                            params: "CodebookParams", metric: str):
    """Activation over DEVICE-RESIDENT training descriptors: when
    Clustering=None and ranking keeps every feature, the codewords ARE the
    features, and the packed per-chunk descriptor blocks from the fused
    training extraction (detect_batch.FusedChunkCache) are still on the
    device -- so activation needs ZERO descriptor upload.  The class-major
    row order of the host path is reproduced by a device gather, so kNN
    indices and tie-breaks are identical to training_activation on the
    same rows.  Returns activation_fn(all_desc) -> (dists, idx) for
    train_codebook, or None when the cache cannot serve this config
    (KNN/KNNRule only)."""
    if params.activation_type not in ("KNN", "KNNRule"):
        return None
    k = params.knn_k if params.activation_type == "KNN" else 1

    # flat packed row index of every kept feature, in class-major model
    # order (the order train() concatenates all_desc in)
    by_cloud = {}
    for e_id, e in enumerate(cache_entries):
        for r, ci in enumerate(e.chunk):
            by_cloud[ci] = (e_id, r)
    offs = np.cumsum([0] + [e.dev.shape[0] * e.k_cap
                            for e in cache_entries])
    perm_parts = []
    for ci in model_order:
        if ci not in by_cloud:
            return None
        e_id, r = by_cloud[ci]
        e = cache_entries[e_id]
        rows = np.nonzero(e.keep[r])[0]
        perm_parts.append(offs[e_id] + r * e.k_cap + rows)
    perm = np.concatenate(perm_parts) if perm_parts else np.zeros(0, np.int64)
    c = len(perm)
    # tiny sets keep the trivial host path; huge sets keep the chunked
    # upload path (the [C, C] block must stay device-memory bounded)
    if c <= k or c > 16384:
        return None
    d = cache_entries[0].d

    def activation_fn(all_desc: np.ndarray):
        assert all_desc.shape == (c, d), (all_desc.shape, c, d)
        # ONE bucketed jitted program does the gather + self-kNN: every
        # device op outside jit has run-dependent shapes (c varies per
        # training set), and each fresh small-op compile costs seconds
        # through the axon remote compiler (measured 166 ms/cloud from
        # exactly that; experiments/r5_train_profile.py).  The permutation
        # is padded to the 256 bucket and the valid count rides as a
        # traced scalar, so one compile serves every set in the bucket.
        c_pad = -(-c // 256) * 256
        perm_padded = np.zeros(c_pad, np.int32)
        perm_padded[:c] = perm
        shapes_key = tuple((tuple(e.dev.shape),) for e in cache_entries)
        run = _self_knn_program(shapes_key, c_pad, d, k, metric,
                                params.flann_exact)
        dd, ii = jax.device_get(run(jnp.asarray(perm_padded),
                                    jnp.asarray(c, jnp.int32),
                                    *[e.dev for e in cache_entries]))
        return dd[:c], ii[:c]

    return activation_fn


@functools.lru_cache(maxsize=None)
def _self_knn_program(shapes_key, c_pad: int, d: int, k: int, metric: str,
                      exact: bool):
    """Self-kNN (queries == database) over device-resident packed
    descriptor blocks: gathers the class-major rows via a padded
    permutation, masks the padded tail, and runs kNN -- one fused program,
    one compile per (entry-shapes, bucket).  Masked rows get +inf
    distance, so distances and tie-breaks equal an unpadded kNN over the
    first c rows."""
    @jax.jit
    def run(perm_padded, c_real, *entries):
        flat = jnp.concatenate(
            [e.reshape(-1, e.shape[-1])[:, :d] for e in entries], axis=0)
        dbp = flat[perm_padded]
        mask = jnp.arange(c_pad) < c_real
        return knn(dbp, dbp, mask, k=k, metric=metric, exact=exact)
    return run


def inn_refine_queries(descriptors: jnp.ndarray, codewords: jnp.ndarray,
                       cw_mask: jnp.ndarray, metric: str,
                       iterations: int, residual_weight: float,
                       exact: bool = True) -> jnp.ndarray:
    """INN activation's iterative query refinement
    (activation_strategy_inn.h:37-75): repeatedly find the 1-NN, then push
    the query away from its projection onto that neighbor."""
    def body(_, q):
        _, idx = knn(q, codewords, cw_mask, k=1, metric=metric, exact=exact)
        nb = codewords[idx[:, 0]]
        factor = jnp.sum(nb * q, axis=1, keepdims=True)
        return q + residual_weight * (q - factor * nb)

    return jax.lax.fori_loop(0, iterations, body, descriptors)


def training_activation(descriptors: np.ndarray, codewords: np.ndarray,
                        params: "CodebookParams", metric: str
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Training-time activation dispatch (codebook.cpp:109-142):
    KNN uses k; KNNRule trains like KNN k=1
    (activation_strategy_knn_rule.h: "for now use normal knn with k = 1
    during training"); INN refines queries then takes the 1-NN;
    Threshold keeps all codewords within the distance threshold (capped
    at threshold_capacity nearest, masked by distance; masked entries get
    index -1)."""
    t = params.activation_type
    ex = params.flann_exact
    if t in ("KNN",):
        return activate_knn_batch(descriptors, codewords, params.knn_k, metric,
                                  exact=ex)
    if t == "KNNRule":
        return activate_knn_batch(descriptors, codewords, 1, metric, exact=ex)
    if t == "INN":
        c = codewords.shape[0]
        q = inn_refine_queries(jnp.asarray(descriptors), jnp.asarray(codewords),
                               jnp.ones(c, bool), metric,
                               params.inn_iterations, params.inn_residual_weight,
                               exact=ex)
        d, idx = knn(q, jnp.asarray(codewords), jnp.ones(c, bool), 1, metric,
                     exact=ex)
        return np.asarray(d), np.asarray(idx)
    if t == "Threshold":
        cap = min(params.threshold_capacity, codewords.shape[0])
        d, idx = activate_knn_batch(descriptors, codewords, cap, metric,
                                    exact=ex)
        idx = np.where(d < params.threshold, idx, -1)
        return d, idx
    raise ValueError(f"unknown activation strategy {t!r}")


def train_codebook(
    features_per_model: List[FeatureSet],      # compacted per training model
    class_per_model: List[int],
    instance_per_model: List[int],
    boxes_per_model: List[geo.BoundingBox],    # numpy-backed BoundingBox
    codeword_data: np.ndarray,                 # [C, D] cluster centers
    codeword_positions: np.ndarray,            # [C, 3] feature position per codeword
    params: CodebookParams,
    metric: str,
    activation_fn=None,                        # override: sharded activation
) -> TrainedCodebook:
    """Vectorized codebook training (codebook.cpp:64-365): one batched
    activation + quat/rotation pass per model, numpy-grouped vote recording,
    batched center weights and statistical weights.  Bit-compatible with the
    loop oracle train_codebook_loop (tested in test_components.py).

    `activation_fn(descriptors) -> (dists, idx)` replaces the default
    training_activation when given (the multi-chip path passes the
    mesh-sharded activation, parallel/sharded.py)."""
    num_models = len(features_per_model)
    assert num_models == len(class_per_model) == len(boxes_per_model)

    classes = sorted(set(class_per_model))
    class_sigmas: Dict[int, float] = {}
    sigma_pending: Dict[int, tuple] = {}

    # --- step 0: activation for ALL models in one batch ---------------------
    # A per-model activation call costs a full device dispatch round-trip
    # each (the dominant training cost through the axon tunnel); kNN / INN /
    # Threshold activation are per-query independent, so one batched call
    # over the concatenated descriptors is bit-identical to per-model calls.
    sizes = [fs.descriptors.shape[0] for fs in features_per_model]
    act_nonzero = [i for i, s in enumerate(sizes) if s]
    act_per_model: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
    if act_nonzero:
        all_desc = np.concatenate(
            [features_per_model[i].descriptors for i in act_nonzero], axis=0)
        if activation_fn is not None:
            all_d, all_i = activation_fn(all_desc)
        else:
            all_d, all_i = training_activation(all_desc, codeword_data,
                                               params, metric)
        off = 0
        for i in act_nonzero:
            act_per_model[i] = (all_d[off:off + sizes[i]],
                                all_i[off:off + sizes[i]])
            off += sizes[i]

    # --- step 1: vote recording (vectorized per model) ----------------------
    rec_cw: List[np.ndarray] = []
    rec_vote: List[np.ndarray] = []
    rec_class: List[np.ndarray] = []
    rec_inst: List[np.ndarray] = []
    rec_pos: List[np.ndarray] = []
    rec_frame: List[np.ndarray] = []
    rec_center: List[np.ndarray] = []
    rec_bsize: List[np.ndarray] = []
    rec_bquat: List[np.ndarray] = []

    for class_id in classes:
        model_idx = [i for i, c in enumerate(class_per_model) if c == class_id]
        num_features = sum(int(features_per_model[i].mask.sum()) for i in model_idx)
        max_elements = int(math.isqrt(max(num_features, 0)))

        sample_feature_descs: List[np.ndarray] = []
        sample_cw_descs: List[np.ndarray] = []
        n_feat_acc = 0
        n_cw_acc = 0

        for mi in model_idx:
            fs = features_per_model[mi]
            box = boxes_per_model[mi]
            instance_id = instance_per_model[mi]
            n = fs.descriptors.shape[0]
            if n == 0:
                continue
            dists, idx = act_per_model[mi]
            center = np.asarray(box.position, np.float32)
            box_quat = np.asarray(box.quat, np.float32)

            # batched quats + vote rotation, all host numpy: the math is tiny
            # (F ~ 1e2) and per-model device calls recompile per distinct F
            # (vote = (center - keypoint) rotated INTO the LRF; bbox quat
            # composed with conj(frame), codeword_distribution.cpp:37-71)
            frames = np.asarray(fs.frames, np.float32)
            frame_quats = geo.matrix_to_quat_batch_np(frames)
            vote_world = center[None, :] - np.asarray(fs.positions, np.float32)
            vote_local = np.einsum("jab,jb->ja", frames, vote_world)
            conj = frame_quats * np.array([1, -1, -1, -1], np.float32)
            new_quat = geo.quat_multiply_np(box_quat[None, :], conj)

            jj, kk = np.nonzero(idx >= 0)  # Threshold: idx -1 outside cut
            rec_cw.append(idx[jj, kk].astype(np.int64))
            rec_vote.append(vote_local[jj].astype(np.float32))
            rec_class.append(np.full(len(jj), class_id, np.int32))
            rec_inst.append(np.full(len(jj), instance_id, np.int32))
            rec_pos.append(np.asarray(fs.positions, np.float32)[jj])
            rec_frame.append(frames[jj])
            rec_center.append(np.tile(center, (len(jj), 1)))
            rec_bsize.append(np.tile(np.asarray(box.size, np.float32),
                                     (len(jj), 1)))
            rec_bquat.append(new_quat[jj].astype(np.float32))

            # accumulate capped samples for the class sigma
            if n_feat_acc < max_elements:
                sample_feature_descs.append(np.asarray(fs.descriptors))
                n_feat_acc += n
            if n_cw_acc < max_elements:
                flat_idx = idx.reshape(-1)
                sample_cw_descs.append(codeword_data[flat_idx[flat_idx >= 0]])
                n_cw_acc += idx.size

        # --- class sigma (variance) over sampled feature x codeword pairs --
        if sample_feature_descs and sample_cw_descs:
            fd = np.concatenate(sample_feature_descs, axis=0)
            cd = np.concatenate(sample_cw_descs, axis=0)
            sigma_pending[class_id] = _pair_distance_stats_async(
                fd, cd, metric)
        else:
            class_sigmas[class_id] = 1.0

    if sigma_pending:
        # ONE host fetch for every class's (s, ss) scalars: per-class
        # float() resolves each paid a full tunnel round-trip (~25 ms on
        # axon -- 10 fetches dominated the measured 23 ms/cloud
        # activation stage, experiments/r5_train_profile.py)
        cids = list(sigma_pending)
        fetched = jax.device_get([(sigma_pending[c][0],
                                   sigma_pending[c][1]) for c in cids])
        for c, (s, ss) in zip(cids, fetched):
            n = sigma_pending[c][2]
            mean = float(s) / n
            var = (float(ss) - n * mean * mean) / max(n - 1, 1)
            class_sigmas[c] = max(var, 0.0)

    V = sum(len(a) for a in rec_cw)
    cw_arr = np.concatenate(rec_cw) if V else np.zeros(0, np.int64)
    vote_arr = np.concatenate(rec_vote) if V else np.zeros((0, 3), np.float32)
    class_arr = np.concatenate(rec_class) if V else np.zeros(0, np.int32)
    inst_arr = np.concatenate(rec_inst) if V else np.zeros(0, np.int32)
    pos_arr = np.concatenate(rec_pos) if V else np.zeros((0, 3), np.float32)
    frame_arr = np.concatenate(rec_frame) if V else np.zeros((0, 3, 3), np.float32)
    center_arr = np.concatenate(rec_center) if V else np.zeros((0, 3), np.float32)
    bsize_arr = np.concatenate(rec_bsize) if V else np.zeros((0, 3), np.float32)
    bquat_arr = np.concatenate(rec_bquat) if V else np.zeros((0, 4), np.float32)

    # group votes by codeword, preserving insertion order within a group
    order = np.argsort(cw_arr, kind="stable")
    cw_s = cw_arr[order]
    uniq_cw, group_start, group_size = np.unique(
        cw_s, return_index=True, return_counts=True)

    # --- KNN k=1 / INN cleanup: keep single-vote codewords only ------------
    clean_up = (params.activation_type == "KNN" and params.knn_k == 1) or \
               params.activation_type == "INN"
    if clean_up:
        keep_g = group_size == 1
        uniq_cw = uniq_cw[keep_g]
        group_start = group_start[keep_g]
        group_size = group_size[keep_g]

    # flat indices of the surviving votes, ordered (codeword asc, insertion)
    if len(uniq_cw):
        sel = np.concatenate([order[s:s + z]
                              for s, z in zip(group_start, group_size)])
    else:
        sel = np.zeros(0, np.int64)
    g_of_vote = np.repeat(np.arange(len(uniq_cw)), group_size)
    slot_of_vote = (np.arange(len(sel))
                    - np.repeat(np.cumsum(group_size) - group_size, group_size)) \
        if len(sel) else np.zeros(0, np.int64)

    vote_arr = vote_arr[sel]
    class_arr = class_arr[sel]
    inst_arr = inst_arr[sel]
    pos_arr = pos_arr[sel]
    frame_arr = frame_arr[sel]
    center_arr = center_arr[sel]
    bsize_arr = bsize_arr[sel]
    bquat_arr = bquat_arr[sel]

    # --- center weights (median gaussians), batched over groups ------------
    weight_arr = _center_weights_batched(vote_arr, pos_arr, frame_arr,
                                         center_arr, g_of_vote, group_size)

    # --- statistical class weights (9 steps), array form --------------------
    clsw_arr = _statistical_class_weights_arrays(
        np.repeat(uniq_cw, group_size), class_arr)

    # --- pack to serving arrays --------------------------------------------
    c_used = len(uniq_cw)
    mv = int(group_size.max()) if c_used else 1
    D = codeword_data.shape[1]
    num_classes = (max(classes) + 1) if classes else 1

    rows = max(c_used, 1)
    out = TrainedCodebook(
        codewords=np.zeros((rows, D), np.float32),
        cw_mask=np.zeros(rows, bool),
        cw_weight=np.ones(rows, np.float32),
        cw_position=np.zeros((rows, 3), np.float32),
        votes=np.zeros((rows, mv, 3), np.float32),
        vote_mask=np.zeros((rows, mv), bool),
        vote_class=np.zeros((rows, mv), np.int32),
        vote_instance=np.zeros((rows, mv), np.int32),
        vote_weight=np.zeros((rows, mv), np.float32),
        class_weight=np.ones((rows, mv), np.float32),
        bbox_size=np.zeros((rows, mv, 3), np.float32),
        bbox_quat=np.zeros((rows, mv, 4), np.float32),
        class_sigma=np.ones(num_classes, np.float32),
    )
    for cid, var in class_sigmas.items():
        out.class_sigma[cid] = var

    if c_used:
        out.codewords[:c_used] = codeword_data[uniq_cw]
        out.cw_mask[:c_used] = True
        out.cw_position[:c_used] = codeword_positions[uniq_cw]
        r, s = g_of_vote, slot_of_vote
        out.votes[r, s] = vote_arr
        out.vote_mask[r, s] = True
        out.vote_class[r, s] = class_arr
        out.vote_instance[r, s] = inst_arr
        out.vote_weight[r, s] = weight_arr
        out.class_weight[r, s] = clsw_arr
        out.bbox_size[r, s] = bsize_arr
        out.bbox_quat[r, s] = bquat_arr
    return out


def _center_weights_batched(vote, pos, frame, center, g_of_vote, group_size
                            ) -> np.ndarray:
    """Vectorized CodewordDistribution::computeWeights
    (codeword_distribution.cpp:171-243): weight of vote i = median over the
    votes j of the same codeword of exp(-|pos_j + R_j^T v_i - center_i|^2
    / 0.5^2).  Groups are padded to the max group size and batched; NaN
    padding + nanmedian reproduce numpy's even/odd midpoint rule."""
    sigma = 0.5
    V = len(vote)
    if V == 0:
        return np.zeros(0, np.float32)
    m = int(group_size.max())
    if m == 1:
        # the common (k=1 cleaned) case: each vote is its own median
        back = np.einsum("jab,ja->jb", frame, vote)  # F^T @ v (rotateBack)
        dist = np.linalg.norm(pos + back - center, axis=1)
        return np.exp(-(dist ** 2) / (sigma ** 2)).astype(np.float32)

    G = len(group_size)
    gi = np.full((G, m), -1, np.int64)
    slot = np.arange(V) - np.repeat(np.cumsum(group_size) - group_size,
                                    group_size)
    gi[g_of_vote, slot] = np.arange(V)
    valid = gi >= 0
    gi0 = np.where(valid, gi, 0)

    out = np.zeros(V, np.float32)
    # chunk over groups so the [chunk, m, m, 3] intermediate stays bounded
    gchunk = max(1, (1 << 22) // max(m * m, 1))
    for g0 in range(0, G, gchunk):
        gs = slice(g0, min(g0 + gchunk, G))
        idx = gi0[gs]
        val = valid[gs]
        P = pos[idx]        # [g, m, 3] (j)
        F = frame[idx]      # [g, m, 3, 3] (j)
        Vv = vote[idx]      # [g, m, 3] (i)
        Cc = center[idx]    # [g, m, 3] (i)
        back = np.einsum("gjab,gia->gijb", F, Vv)  # F^T @ v (rotateBack)
        world = P[:, None, :, :] + back
        dist = np.linalg.norm(world - Cc[:, :, None, :], axis=3)  # [g, i, j]
        w = np.exp(-(dist ** 2) / (sigma ** 2))
        w = np.where(val[:, None, :], w, np.nan)     # mask padded j
        med = np.nanmedian(w, axis=2)                # [g, i]
        out[idx[val]] = med[val].astype(np.float32)
    return out


def _statistical_class_weights_arrays(cw_of_vote: np.ndarray,
                                      class_of_vote: np.ndarray) -> np.ndarray:
    """Array form of the 9-step statistical weights (codebook.cpp:226-365);
    returns the per-vote weight term1[class] * term2[cw] * term3[cw, class].
    Same per-(codeword, class) semantics as _statistical_class_weights (the
    documented evident-intent divergence from the reference's last-codeword
    term3 quirk)."""
    V = len(cw_of_vote)
    if V == 0:
        return np.ones(0, np.float32)
    # compact ids
    u_cw, cw_id = np.unique(cw_of_vote, return_inverse=True)
    u_cls, cls_id = np.unique(class_of_vote, return_inverse=True)
    n_cw, n_cls = len(u_cw), len(u_cls)

    nfeat_cls = np.bincount(cls_id, minlength=n_cls).astype(np.float64)
    pair_key = cw_id.astype(np.int64) * n_cls + cls_id
    u_pair, pair_inv, nv_pair = np.unique(pair_key, return_inverse=True,
                                          return_counts=True)
    pair_cw = (u_pair // n_cls).astype(np.int64)
    pair_cls = (u_pair % n_cls).astype(np.int64)

    # sum_cw[cw] = sum over classes of nv(cw, cls) / nfeat(cls)
    sum_cw = np.zeros(n_cw, np.float64)
    np.add.at(sum_cw, pair_cw, nv_pair / nfeat_cls[pair_cls])

    # term1: 1 / #codewords voting for class
    ncw_cls = np.zeros(n_cls, np.int64)
    np.add.at(ncw_cls, pair_cls, 1)
    term1 = 1.0 / ncw_cls

    # term2: 1 / #votes of codeword
    nv_cw = np.bincount(cw_id, minlength=n_cw).astype(np.float64)
    term2 = 1.0 / nv_cw

    t3_pair = (nv_pair / nfeat_cls[pair_cls]) / sum_cw[pair_cw]
    w_pair = term1[pair_cls] * term2[pair_cw] * t3_pair
    return w_pair[pair_inv].astype(np.float32)


def train_codebook_loop(
    features_per_model: List[FeatureSet],      # compacted per training model
    class_per_model: List[int],
    instance_per_model: List[int],
    boxes_per_model: List[geo.BoundingBox],    # numpy-backed BoundingBox
    codeword_data: np.ndarray,                 # [C, D] cluster centers
    codeword_positions: np.ndarray,            # [C, 3] feature position per codeword
    params: CodebookParams,
    metric: str,
) -> TrainedCodebook:
    """Reference-oracle loop implementation of train_codebook (the round-1
    per-feature Python loop).  Kept ONLY as the A/B oracle for
    tests/test_components.py::test_train_codebook_vectorized_matches_loop;
    the production path is the vectorized train_codebook above."""
    num_models = len(features_per_model)
    assert num_models == len(class_per_model) == len(boxes_per_model)
    C = codeword_data.shape[0]

    # --- step 1: activation + vote recording, grouped per class ------------
    votes_by_cw: Dict[int, list] = {}
    class_sigmas: Dict[int, float] = {}
    sigma_pending: Dict[int, tuple] = {}

    classes = sorted(set(class_per_model))
    for class_id in classes:
        model_idx = [i for i, c in enumerate(class_per_model) if c == class_id]
        num_features = sum(int(features_per_model[i].mask.sum()) for i in model_idx)
        max_elements = int(math.isqrt(max(num_features, 0)))

        sample_feature_descs: List[np.ndarray] = []
        sample_cw_descs: List[np.ndarray] = []
        n_feat_acc = 0
        n_cw_acc = 0

        for mi in model_idx:
            fs = features_per_model[mi]
            box = boxes_per_model[mi]
            instance_id = instance_per_model[mi]
            n = fs.descriptors.shape[0]
            if n == 0:
                continue
            dists, idx = training_activation(fs.descriptors, codeword_data,
                                             params, metric)
            center = np.asarray(box.position, np.float32)
            box_quat = np.asarray(box.quat, np.float32)
            frame_quats = np.stack([
                np.asarray(geo.matrix_to_quat(jnp.asarray(f))) for f in fs.frames
            ]) if n else np.zeros((0, 4), np.float32)

            for j in range(n):
                vote_world = center - fs.positions[j]
                vote_local = fs.frames[j] @ vote_world
                # bbox rotated into the feature frame: q_box * conj(q_frame)
                new_quat = np.asarray(geo.quat_multiply(
                    jnp.asarray(box_quat),
                    geo.quat_conjugate(jnp.asarray(frame_quats[j]))))
                for kk in range(idx.shape[1]):
                    cw = int(idx[j, kk])
                    if cw < 0:  # Threshold activation: outside threshold
                        continue
                    votes_by_cw.setdefault(cw, []).append(dict(
                        vote=vote_local.astype(np.float32),
                        class_id=class_id,
                        instance_id=instance_id,
                        position=fs.positions[j].astype(np.float32),
                        frame=fs.frames[j].astype(np.float32),
                        model_center=center,
                        bbox_size=np.asarray(box.size, np.float32),
                        bbox_quat=new_quat.astype(np.float32),
                    ))

            # accumulate capped samples for the class sigma
            if n_feat_acc < max_elements:
                sample_feature_descs.append(np.asarray(fs.descriptors))
                n_feat_acc += n
            if n_cw_acc < max_elements:
                flat_idx = idx.reshape(-1)
                sample_cw_descs.append(codeword_data[flat_idx[flat_idx >= 0]])
                n_cw_acc += idx.size

        # --- class sigma (variance) over sampled feature x codeword pairs --
        if sample_feature_descs and sample_cw_descs:
            fd = np.concatenate(sample_feature_descs, axis=0)
            cd = np.concatenate(sample_cw_descs, axis=0)
            sigma_pending[class_id] = _pair_distance_stats_async(
                fd, cd, metric)
        else:
            class_sigmas[class_id] = 1.0

    for cid, handle in sigma_pending.items():
        class_sigmas[cid] = _resolve_pair_stats(handle)[1]

    # --- KNN k=1 / INN cleanup: keep single-vote codewords only ------------
    clean_up = (params.activation_type == "KNN" and params.knn_k == 1) or \
               params.activation_type == "INN"
    if clean_up:
        votes_by_cw = {cw: v for cw, v in votes_by_cw.items() if len(v) == 1}

    # --- center weights (median gaussians) per codeword --------------------
    for cw, votes in votes_by_cw.items():
        _compute_center_weights(votes)

    # --- statistical class weights (9 steps) -------------------------------
    class_weights_by_cw = _statistical_class_weights(votes_by_cw)

    # --- pack to serving arrays --------------------------------------------
    used = sorted(votes_by_cw.keys())
    c_used = len(used)
    mv = max((len(votes_by_cw[cw]) for cw in used), default=1)
    D = codeword_data.shape[1]
    num_classes = (max(classes) + 1) if classes else 1

    out = TrainedCodebook(
        codewords=np.zeros((max(c_used, 1), D), np.float32),
        cw_mask=np.zeros(max(c_used, 1), bool),
        cw_weight=np.ones(max(c_used, 1), np.float32),
        cw_position=np.zeros((max(c_used, 1), 3), np.float32),
        votes=np.zeros((max(c_used, 1), mv, 3), np.float32),
        vote_mask=np.zeros((max(c_used, 1), mv), bool),
        vote_class=np.zeros((max(c_used, 1), mv), np.int32),
        vote_instance=np.zeros((max(c_used, 1), mv), np.int32),
        vote_weight=np.zeros((max(c_used, 1), mv), np.float32),
        class_weight=np.ones((max(c_used, 1), mv), np.float32),
        bbox_size=np.zeros((max(c_used, 1), mv, 3), np.float32),
        bbox_quat=np.zeros((max(c_used, 1), mv, 4), np.float32),
        class_sigma=np.ones(num_classes, np.float32),
    )
    for cid, var in class_sigmas.items():
        out.class_sigma[cid] = var

    for row, cw in enumerate(used):
        votes = votes_by_cw[cw]
        out.codewords[row] = codeword_data[cw]
        out.cw_mask[row] = True
        out.cw_position[row] = codeword_positions[cw]
        cw_class_weights = class_weights_by_cw.get(cw, {})
        for vi, v in enumerate(votes):
            out.votes[row, vi] = v["vote"]
            out.vote_mask[row, vi] = True
            out.vote_class[row, vi] = v["class_id"]
            out.vote_instance[row, vi] = v["instance_id"]
            out.vote_weight[row, vi] = v["weight"]
            out.class_weight[row, vi] = cw_class_weights.get(v["class_id"], 1.0)
            out.bbox_size[row, vi] = v["bbox_size"]
            out.bbox_quat[row, vi] = v["bbox_quat"]
    return out


@functools.lru_cache(maxsize=None)
def _pair_stats_program(a_pad: int, b_pad: int, d: int, metric: str):
    from ..ops.neighbors import chi_square_distance_matrix, pairwise_sqdist

    @jax.jit
    def run(a, b, na, nb):
        if metric == "l2":
            dm = jnp.maximum(pairwise_sqdist(a, b), 0.0)
        else:
            dm = chi_square_distance_matrix(a, b)   # exact, like the host path
        valid = (jnp.arange(a_pad)[:, None] < na) \
            & (jnp.arange(b_pad)[None, :] < nb)
        dm = jnp.where(valid, dm, 0.0)
        return dm.sum(), (dm * dm).sum()
    return run


def _pair_distance_stats_async(a: np.ndarray, b: np.ndarray, metric: str):
    """Dispatch the class-sigma all-pairs stats on device (pow2-bucketed
    shapes so the program is reused across classes and training runs; the
    full matrix is never materialized on the host).  Returns (s, ss, n) with
    s/ss still device-resident -- resolve with _resolve_pair_stats so the
    per-class dispatches overlap and only ONE sync pays the link latency."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    A, D = a.shape
    B = b.shape[0]

    def bucket(n: int) -> int:
        p = 256
        while p < n:
            p *= 2
        return p

    ap, bp = bucket(A), bucket(B)
    qa = np.zeros((ap, D), np.float32)
    qa[:A] = a
    qb = np.zeros((bp, D), np.float32)
    qb[:B] = b
    s, ss = _pair_stats_program(ap, bp, D, metric)(
        jnp.asarray(qa), jnp.asarray(qb), A, B)
    return s, ss, A * B


def _resolve_pair_stats(handle) -> Tuple[float, float]:
    """(mean, variance) from an async stats handle (blocks on the device)."""
    s, ss, n = handle
    mean = float(s) / n
    var = (float(ss) - n * mean * mean) / max(n - 1, 1)
    return mean, max(var, 0.0)


def _pair_distance_stats(a: np.ndarray, b: np.ndarray, metric: str
                         ) -> Tuple[float, float]:
    return _resolve_pair_stats(_pair_distance_stats_async(a, b, metric))


def _compute_center_weights(votes: List[dict]) -> None:
    """CodewordDistribution::computeWeights (codeword_distribution.cpp:171-243):
    weight of vote i = median over all activating features j of
    exp(-|center_ij - model_center_i|^2 / 0.5^2) where center_ij = keypoint_j +
    rotateBack(vote_i, frame_j)."""
    sigma = 0.5
    n = len(votes)
    vote_vecs = np.stack([v["vote"] for v in votes])           # [n, 3]
    positions = np.stack([v["position"] for v in votes])       # [n, 3]
    frames = np.stack([v["frame"] for v in votes])             # [n, 3, 3]
    centers = np.stack([v["model_center"] for v in votes])     # [n, 3]
    # world center of vote i through feature j: pos_j + frames_j^T @ vote_i
    back = np.einsum("jab,ia->ijb", frames, vote_vecs)  # F^T @ v, [i, j, 3]
    world = positions[None, :, :] + back
    dist = np.linalg.norm(world - centers[:, None, :], axis=2)  # [i, j]
    weights = np.exp(-(dist ** 2) / (sigma ** 2))
    medians = np.median(weights, axis=1)
    # numpy median matches the reference's even/odd midpoint rule
    for i, v in enumerate(votes):
        v["weight"] = float(medians[i])


def _statistical_class_weights(votes_by_cw: Dict[int, list]) -> Dict[int, Dict[int, float]]:
    """The 9-step statistical weight computation (codebook.cpp:226-365).
    Returns {codeword: {class_id: weight}} with weight = term1 * term2 * term3."""
    # votes per (class, codeword)
    nvotes_cls_cw: Dict[int, Dict[int, int]] = {}
    for cw, votes in votes_by_cw.items():
        for v in votes:
            c = v["class_id"]
            nvotes_cls_cw.setdefault(c, {}).setdefault(cw, 0)
            nvotes_cls_cw[c][cw] += 1

    # number of features a class was learned from = total votes with that class
    nfeat_cls = {c: sum(m.values()) for c, m in nvotes_cls_cw.items()}

    # sum over classes of (votes in codeword / features of class)
    sum_cw: Dict[int, float] = {}
    for c, per_cw in nvotes_cls_cw.items():
        nf = float(nfeat_cls[c])
        for cw, nv in per_cw.items():
            sum_cw[cw] = sum_cw.get(cw, 0.0) + nv / nf

    # term1: 1 / #codewords voting for class
    ncw_cls: Dict[int, int] = {c: len(per_cw) for c, per_cw in nvotes_cls_cw.items()}
    term1 = {c: 1.0 / n for c, n in ncw_cls.items()}

    # term2: 1 / #votes of codeword; term3 per (class) in reference is written
    # into a per-class map while iterating codewords (codebook.cpp:327-341) --
    # we keep per-(codeword, class) semantics which is what the final product
    # uses per distribution entry.
    out: Dict[int, Dict[int, float]] = {}
    # NOTE: the reference's m_term3 is a per-class map overwritten per
    # codeword during step 8 and read in step 9 in a separate loop over the
    # same ordered map, so the value actually used for a codeword's class is
    # the LAST codeword's term3 for that class (a reference quirk).  We
    # implement the per-codeword value (the evident intent); with default
    # configs UseClassWeight=false so this path is off anyway.
    for cw, votes in votes_by_cw.items():
        t2 = 1.0 / len(votes)
        per_class: Dict[int, float] = {}
        for c in {v["class_id"] for v in votes}:
            nv = nvotes_cls_cw[c][cw]
            t3 = (nv / float(nfeat_cls[c])) / sum_cw[cw]
            per_class[c] = term1[c] * t2 * t3
        out[cw] = per_class
    return out


# ---------------------------------------------------------------------------
# detection: cast votes (jit)
# ---------------------------------------------------------------------------

class CastVotes(NamedTuple):
    """Flat static-capacity vote tensor for the voting stage.
    Leading axis = F * k * MV."""
    position: jnp.ndarray    # [T, 3] voted object center
    weight: jnp.ndarray      # [T]
    class_id: jnp.ndarray    # [T]
    instance_id: jnp.ndarray  # [T]
    keypoint: jnp.ndarray    # [T, 3] scene keypoint that cast the vote
    keypoint_training: jnp.ndarray  # [T, 3] codeword's training feature position
    bbox_size: jnp.ndarray   # [T, 3]
    bbox_quat: jnp.ndarray   # [T, 4]
    valid: jnp.ndarray       # [T]


def signature_mask(partial_type: str) -> np.ndarray:
    """[32] bool mask over SHOT signature bins (Codebook::getSignatureMask,
    codebook.cpp:952-1036).  Unknown types keep the complete descriptor."""
    m = np.zeros(32, bool)
    t = partial_type
    if t in ("front", "dense_x"):
        m[8:24] = True
    elif t in ("back", "sparse_x"):
        m[0:8] = True
        m[24:32] = True
    elif t in ("left", "positive_y"):
        m[16:32] = True
    elif t in ("right", "negative_y"):
        m[0:16] = True
    elif t in ("top", "dense_z"):
        m[1::2] = True
    elif t in ("bottom", "sparse_z"):
        m[0::2] = True
    elif t == "dense_x_or_z":
        m[8:24] = True
        m[1::2] = True
    elif t == "dense_x_and_z":
        m[9:24:2] = True
    elif t == "front_turn_left":
        m[12:28] = True
    elif t == "front_turn_right":
        m[4:20] = True
    else:
        return np.ones(32, bool)
    return m


def partial_shot_columns(mask: np.ndarray, dim: int) -> np.ndarray:
    """Descriptor column indices kept by the signature mask: SHOT-352 has 32
    signature bins x 11; CSHOT-1344 appends 32 x 31 color bins
    (codebook.cpp:418-422, :438-470)."""
    cols = [np.arange(s * 11, (s + 1) * 11) for s in range(32) if mask[s]]
    if dim > 352:
        cols += [352 + np.arange(s * 31, (s + 1) * 31)
                 for s in range(32) if mask[s]]
    return np.concatenate(cols)


def cast_votes(
    cb: TrainedCodebook,         # arrays may be np or jnp (weak-type ok)
    descriptors: jnp.ndarray,    # [F, D]
    positions: jnp.ndarray,      # [F, 3]
    frames: jnp.ndarray,         # [F, 3, 3]
    f_mask: jnp.ndarray,         # [F]
    params: CodebookParams,
    metric: str,
) -> CastVotes:
    """Codebook::castVotes (codebook.cpp:403-555) +
    CodewordDistribution::castVotes (codeword_distribution.cpp:73-167) as one
    static-shape program."""
    cw = jnp.asarray(cb.codewords)
    cw_mask_j = jnp.asarray(cb.cw_mask)
    strategy = params.activation_type

    # partial SHOT: reduce scene descriptors AND codewords to the masked
    # signature bins before matching (detection only; codebook.cpp:416-475
    # reduces the features, :614-617 swaps in the partial codewords)
    dim = int(descriptors.shape[1])
    if params.use_partial_shot and dim in (352, 1344):
        smask = signature_mask(params.partial_shot_type)
        if not smask.all():
            cols = jnp.asarray(partial_shot_columns(smask, dim))
            descriptors = descriptors[:, cols]
            cw = cw[:, cols]

    if strategy == "KNNRule":
        # detection-time 3-NN class-consistency rule
        # (activation_strategy_knn_rule.h:60-115)
        dists3, idx3 = knn(descriptors, cw, cw_mask_j,
                           k=min(3, cw.shape[0]), metric=metric,
                           exact=params.flann_exact)
        vc = jnp.asarray(cb.vote_class)[idx3, 0]   # class of each neighbor
        c0, c1, c2 = vc[:, 0], vc[:, 1], vc[:, 2]
        rt = params.distance_ratio_threshold
        r02 = dists3[:, 0] / jnp.maximum(dists3[:, 2], 1e-30)
        r01 = dists3[:, 0] / jnp.maximum(dists3[:, 1], 1e-30)
        all_same = (c0 == c1) & (c0 == c2)
        first_two = (c0 == c1) & (c0 != c2)
        last_two = (c0 != c1) & (c1 == c2)
        none_same = (c0 != c1) & (c1 != c2)
        accept_first = all_same | (first_two & (r02 < rt)) | (none_same & (r01 < rt))
        accept_second = last_two & (r01 >= rt)
        sel = jnp.where(accept_second, 1, 0)
        idx = jnp.take_along_axis(idx3, sel[:, None], axis=1)
        dists = jnp.take_along_axis(dists3, sel[:, None], axis=1)
        keep = (accept_first | accept_second)[:, None]
        k = 1
    elif strategy == "Threshold":
        # all codewords within the distance threshold, capped
        # (activation_strategy_threshold.cpp:27-44)
        k = min(params.threshold_capacity, cw.shape[0])
        dists, idx = knn(descriptors, cw, cw_mask_j, k=k, metric=metric,
                         exact=params.flann_exact)
        keep = dists < params.threshold
    elif strategy == "INN":
        q = inn_refine_queries(descriptors, cw, cw_mask_j, metric,
                               params.inn_iterations,
                               params.inn_residual_weight,
                               exact=params.flann_exact)
        dists, idx = knn(q, cw, cw_mask_j, k=1, metric=metric,
                         exact=params.flann_exact)
        keep = jnp.ones((descriptors.shape[0], 1), bool)
        k = 1
    else:  # KNN
        k = params.knn_k
        search_k = k + 1 if (params.use_distance_ratio and k == 1) else k
        dists, idx = knn(descriptors, cw, cw_mask_j,
                         k=min(search_k, cw.shape[0]), metric=metric,
                         exact=params.flann_exact)
        keep = jnp.ones((descriptors.shape[0], k), bool)
        if params.use_distance_ratio and k == 1 and dists.shape[1] >= 2:
            ratio_bad = dists[:, 0] / jnp.maximum(dists[:, 1], 1e-30) \
                > params.distance_ratio_threshold
            keep = (~ratio_bad)[:, None]
        dists = dists[:, :k]
        idx = idx[:, :k]
    keep = keep & f_mask[:, None]

    # NOTE (parity): the reference dedups (codeword, feature) pairs via the
    # featureIndices map (codebook.cpp:529-536); k-NN never returns duplicate
    # indices for one feature, and distinct features voting through the same
    # codeword are all kept there too, so behavior matches.

    # gather per-activation vote blocks: [F, k, MV, ...]
    votes = jnp.asarray(cb.votes)[idx]            # [F, k, MV, 3]
    v_mask = jnp.asarray(cb.vote_mask)[idx]       # [F, k, MV]
    v_class = jnp.asarray(cb.vote_class)[idx]
    v_inst = jnp.asarray(cb.vote_instance)[idx]
    v_weight = jnp.asarray(cb.vote_weight)[idx]
    v_clsw = jnp.asarray(cb.class_weight)[idx]
    b_size = jnp.asarray(cb.bbox_size)[idx]
    b_quat = jnp.asarray(cb.bbox_quat)[idx]
    cw_w = jnp.asarray(cb.cw_weight)[idx]         # [F, k]
    cw_pos = jnp.asarray(cb.cw_position)[idx]     # [F, k, 3]

    sigma = jnp.asarray(cb.class_sigma)[v_class]  # [F, k, MV] (variance)
    dist = dists[:, :, None]                      # [F, k, 1]

    matching_w = (1.0 / jnp.sqrt(2.0 * jnp.pi * sigma)) * jnp.exp(
        -(dist ** 2) / (2.0 * sigma))

    weight = jnp.ones_like(sigma)
    if params.use_class_weight:
        weight = weight * v_clsw
    if params.use_vote_weight:
        weight = weight * v_weight
    if params.use_matching_weight:
        weight = weight * matching_w
    if params.use_codeword_weight:
        weight = weight * cw_w[:, :, None]

    # the 2-sigma gate (codeword_distribution.cpp:131-135) and epsilon cut
    gate = jnp.abs(dist) <= 2.0 * sigma
    eps = jnp.finfo(jnp.float32).eps
    valid = v_mask & keep[:, :, None] & gate & (weight >= eps)

    # vote position: keypoint + rotateBack(vote, scene frame)
    back = jnp.einsum("fji,fkmj->fkmi", frames, votes)   # frames^T @ vote
    center = positions[:, None, None, :] + back

    # bbox quat composed back with the scene frame quat
    frame_quat = jax.vmap(geo.matrix_to_quat)(frames)    # [F, 4]
    out_quat = geo.quat_multiply(b_quat, frame_quat[:, None, None, :])

    F = descriptors.shape[0]
    MV = votes.shape[2]
    T = F * k * MV

    def flat(x):
        return x.reshape((T,) + x.shape[3:])

    return CastVotes(
        position=flat(center),
        weight=flat(weight),
        class_id=flat(v_class),
        instance_id=flat(v_inst),
        keypoint=flat(jnp.broadcast_to(positions[:, None, None, :], (F, k, MV, 3))),
        keypoint_training=flat(jnp.broadcast_to(cw_pos[:, :, None, :], (F, k, MV, 3))),
        bbox_size=flat(b_size),
        bbox_quat=flat(out_quat),
        valid=flat(valid),
    )
