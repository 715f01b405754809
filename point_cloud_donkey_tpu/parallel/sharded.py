"""Multi-chip execution: cloud batches sharded over a device mesh.

The reference is a single-process OpenMP program (SURVEY.md section 2.4); the
TPU-native scale-out axes are:
  * **data**: a batch of padded clouds sharded across chips (the DP analogue
    of the reference's per-cloud OpenMP loops) -- collectives ride ICI.
  * **model**: the codebook (and its per-codeword vote tables) sharded across
    chips; exact kNN computes local top-k per shard and reduces with a global
    argmin (the TP analogue; the codebook is the framework's "weights").

Everything routes through jax.sharding.NamedSharding + jit: XLA inserts the
all-gathers/psums implied by the sharding annotations.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.codebook import CodebookParams, TrainedCodebook, cast_votes
from ..models.pipeline_jit import JitPipelineConfig, classify_scores, \
    classify_scores_mean_shift, detect_maxima_jit, extract_features_jit


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_data = n_data or (len(devices) // n_model)
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def shard_codebook(cb: TrainedCodebook, mesh: Mesh) -> TrainedCodebook:
    """Place codebook arrays model-sharded on the mesh (codewords and vote
    tables split over the 'model' axis; class sigmas replicated)."""
    n_model = mesh.shape["model"]

    def put(x, spec):
        x = np.asarray(x)
        if spec is not None:
            pad = (-x.shape[0]) % n_model
            if pad:
                padding = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
                x = np.pad(x, padding)
        return jax.device_put(x, NamedSharding(mesh, P(*(spec or ()))))

    return TrainedCodebook(
        codewords=put(cb.codewords, ("model",)),
        cw_mask=put(cb.cw_mask, ("model",)),
        cw_weight=put(cb.cw_weight, ("model",)),
        cw_position=put(cb.cw_position, ("model",)),
        votes=put(cb.votes, ("model",)),
        vote_mask=put(cb.vote_mask, ("model",)),
        vote_class=put(cb.vote_class, ("model",)),
        vote_instance=put(cb.vote_instance, ("model",)),
        vote_weight=put(cb.vote_weight, ("model",)),
        class_weight=put(cb.class_weight, ("model",)),
        bbox_size=put(cb.bbox_size, ("model",)),
        bbox_quat=put(cb.bbox_quat, ("model",)),
        class_sigma=put(cb.class_sigma, None),
    )


def batched_classify(mesh: Mesh, cb: TrainedCodebook, cfg: JitPipelineConfig,
                     cb_params: CodebookParams, use_mean_shift: bool = False):
    """Build the jitted batched forward step: [B, N, 3] clouds (B sharded over
    'data') -> [B, num_classes] scores."""
    fwd = classify_scores_mean_shift if use_mean_shift else classify_scores
    with_rgb = cfg.descriptor == "CSHOT"

    data_sharding = NamedSharding(mesh, P("data"))
    if with_rgb:
        def step(points, mask, rgb):
            return jax.vmap(lambda p, m, r: fwd(p, m, cb, cfg, cb_params,
                                                rgb=r))(points, mask, rgb)
        return jax.jit(step,
                       in_shardings=(data_sharding,) * 3,
                       out_shardings=data_sharding)

    def step(points, mask):
        return jax.vmap(lambda p, m: fwd(p, m, cb, cfg, cb_params))(points, mask)

    return jax.jit(step,
                   in_shardings=(data_sharding, data_sharding),
                   out_shardings=data_sharding)


def batched_detect(mesh: Mesh, cb: TrainedCodebook, cfg: JitPipelineConfig,
                   cb_params: CodebookParams):
    """Jitted sharded DETECTION step: [B, N, 3] clouds (B sharded over
    'data') -> per-class best mean-shift maxima (densities [B, C] and
    positions [B, C, 3]).  The full detect chain -- features, vote casting
    against the model-sharded codebook, per-class mean-shift, density
    argmax -- runs as one program on the mesh."""
    data_sharding = NamedSharding(mesh, P("data"))

    def step(points, mask):
        return jax.vmap(
            lambda p, m: detect_maxima_jit(p, m, cb, cfg, cb_params)
        )(points, mask)

    return jax.jit(step,
                   in_shardings=(data_sharding, data_sharding),
                   out_shardings=(data_sharding, data_sharding))


def sharded_training_activation(mesh: Mesh, codewords: np.ndarray,
                                params: CodebookParams, metric: str):
    """Sharded training-time codebook activation: queries (features) sharded
    over the 'data' axis, codewords over the 'model' axis.  XLA inserts the
    collectives implied by the shardings (the [F, C] distance block is
    computed shard-locally; the top-k over the model-sharded C axis gathers
    over ICI).

    Bit-identical to models.codebook.training_activation for the KNN /
    KNNRule / Threshold strategies (padded codewords are masked to +inf so
    they never win; pinned by tests/test_sharded.py).  INN's iterative
    refinement stays on the host path.

    Reference: the activation loop of Codebook::activate
    (codebook/codebook.cpp:109-142) -- the device-heavy part of training."""
    from ..ops.neighbors import knn

    if params.activation_type == "INN":
        raise ValueError("INN activation is host-only; use training_activation")
    if params.activation_type == "KNNRule":
        k = 1
    elif params.activation_type == "Threshold":
        k = min(params.threshold_capacity, codewords.shape[0])
    else:
        k = params.knn_k

    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]
    c = codewords.shape[0]
    pad_c = (-c) % n_model
    cw = np.pad(np.asarray(codewords, np.float32), ((0, pad_c), (0, 0)))
    cw_valid = np.arange(c + pad_c) < c
    cw_sh = jax.device_put(cw, NamedSharding(mesh, P("model")))
    cwm_sh = jax.device_put(cw_valid, NamedSharding(mesh, P("model")))

    data_sharding = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, in_shardings=data_sharding,
                       out_shardings=(data_sharding, data_sharding))
    def run(q):
        return knn(q, cw_sh, cwm_sh, k=k, metric=metric,
                   exact=params.flann_exact)

    def activate(descriptors: np.ndarray):
        f = descriptors.shape[0]
        if c <= k:
            # degenerate case parity with activate_knn_batch
            idx = np.tile(np.arange(c), (f, 1))
            return np.zeros_like(idx, np.float32), idx
        pad_f = (-f) % n_data
        q = np.pad(np.asarray(descriptors, np.float32), ((0, pad_f), (0, 0)))
        with mesh:
            d, idx = run(jax.device_put(q, data_sharding))
        d, idx = np.asarray(d)[:f], np.asarray(idx)[:f]
        if params.activation_type == "Threshold":
            idx = np.where(d < params.threshold, idx, -1)
        return d, idx

    return activate


def train_codebook_sharded(mesh: Mesh, features_per_model, class_per_model,
                           instance_per_model, boxes_per_model,
                           codeword_data: np.ndarray,
                           codeword_positions: np.ndarray,
                           params: CodebookParams, metric: str):
    """The REAL codebook training (activation + vote tables + class sigmas +
    center weights + 9-step statistical weights, codebook/codebook.cpp:64-365)
    with the device-heavy activation stage sharded over the data x model
    mesh.  The host-side vote recording/weighting is deterministic numpy, so
    the result is bit-identical to models.codebook.train_codebook (pinned by
    tests/test_sharded.py)."""
    from ..models.codebook import train_codebook
    act = sharded_training_activation(mesh, codeword_data, params, metric)
    return train_codebook(features_per_model, class_per_model,
                          instance_per_model, boxes_per_model,
                          codeword_data, codeword_positions, params, metric,
                          activation_fn=act)


def batched_training_step(mesh: Mesh, cfg: JitPipelineConfig):
    """Jitted sharded 'training step': extract features for a batch of
    labeled clouds (data-sharded) and accumulate per-class descriptor moments
    (sum, count) with a cross-device psum -- the gradient-free ISM analogue
    of a training step, exercising DP collectives over ICI.

    Returns f(points [B,N,3], mask [B,N], labels [B]) ->
    (desc_sum [num_classes, D], desc_count [num_classes])."""

    def step(points, mask, labels):
        def one(p, m):
            kp, frames, desc, valid = extract_features_jit(p, m, cfg)
            return desc, valid

        desc, valid = jax.vmap(one)(points, mask)          # [B, K, D], [B, K]
        d = jnp.where(valid[..., None], desc, 0.0)
        per_cloud_sum = jnp.sum(d, axis=1)                 # [B, D]
        per_cloud_cnt = jnp.sum(valid, axis=1)             # [B]
        num_classes = cfg.num_classes
        onehot = jax.nn.one_hot(labels, num_classes, dtype=d.dtype)  # [B, C]
        desc_sum = jnp.einsum("bc,bd->cd", onehot, per_cloud_sum)
        desc_cnt = jnp.einsum("bc,b->c", onehot, per_cloud_cnt.astype(d.dtype))
        return desc_sum, desc_cnt

    data_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    return jax.jit(step,
                   in_shardings=(data_sharding, data_sharding, data_sharding),
                   out_shardings=(repl, repl))
