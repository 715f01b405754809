"""TPU-vs-CPU decision-divergence A/B over the hard 20-class benchmark.

VERDICT r3 weak #4 / next #8: the round-3 records showed a 2.5 pt platform
swing on `hard_accuracy_20class_extended` (0.95 TPU vs 0.975 CPU) with no
measurement of WHERE the platforms diverge.  This instrument quantifies the
inference-side divergence stage by stage:

  * the trained state is SHARED (trained once, saved to --model): both
    platforms load the identical codebook, so only inference numerics
    (fp reduction order, bf16 SHOT histogram operands, the approximate
    chi-square kNN feature map) contribute to the deltas;
  * the dumped intermediates come from `classify_intermediates`
    (models/pipeline_jit.py), which IS the serving program --
    `classify_scores` delegates to it, so the instrumented path cannot
    drift from the measured one;
  * the test set is bit-identical across platforms (same numpy seed and
    generation order as tests/hard_shapes.run_hard_benchmark).

Usage::

    # 1. train once on CPU (deterministic reference) + dump CPU stack
    PCD_PLATFORM=cpu python platform_ab.py --dump /tmp/ab_cpu.npz \
        --model /tmp/ab_model.ism
    # 2. dump the TPU stack from the SAME saved model
    python platform_ab.py --dump /tmp/ab_tpu.npz --model /tmp/ab_model.ism
    # 3. compare (pure numpy -- no device needed)
    python platform_ab.py --compare /tmp/ab_cpu.npz /tmp/ab_tpu.npz

The compare report prints one JSON object: per-stage max/rms deltas
(descriptors, vote weights, vote positions, scores), per-view decision
margins vs score deltas, and any argmax flips.  Findings live in
PLATFORM_DIVERGENCE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="platform_ab")
    p.add_argument("--dump", metavar="OUT_NPZ",
                   help="run the hard-set inference stack on the current "
                        "platform and save all intermediates")
    p.add_argument("--model", metavar="MODEL_ISM",
                   help="shared trained model path (trained+saved on first "
                        "use, loaded afterwards)")
    p.add_argument("--compare", nargs=2, metavar=("A_NPZ", "B_NPZ"),
                   help="compare two dumps and print the divergence report")
    # hard-benchmark knobs (defaults == tests/hard_shapes.run_hard_benchmark)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--n-train", type=int, default=3)
    p.add_argument("--n-test", type=int, default=2)
    p.add_argument("--points", type=int, default=2048)
    p.add_argument("--keep-frac", type=float, default=0.7)
    p.add_argument("--bite-frac", type=float, default=0.1)
    p.add_argument("--noise", type=float, default=0.015)
    return p


def dump(args) -> int:
    from point_cloud_donkey_tpu.cli import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp

    import hard_shapes
    from point_cloud_donkey_tpu.models.codebook import CodebookParams
    from point_cloud_donkey_tpu.models.ism import ImplicitShapeModel
    from point_cloud_donkey_tpu.models.pipeline_jit import (
        JitPipelineConfig, classify_intermediates)
    from point_cloud_donkey_tpu.utils.config import IsmConfig
    from point_cloud_donkey_tpu.utils.io import PointCloud, save_pcd

    num_classes = hard_shapes.NUM_HARD_CLASSES
    rng = np.random.default_rng(args.seed)

    # regenerate the training clouds EXACTLY as run_hard_benchmark does --
    # even when the model is already trained -- so the rng stream position
    # (and therefore the test set) is bit-identical on every platform
    config = {"ObjectConfig": {"Children": {
        "Clustering": {"Type": "None"},
        "Codebook": {"Children": {"ActivationStrategy": {
            "Parameters": {"K": 1}, "Type": "KNN"}}},
        "FeatureWeighting": {"Type": "Uniform"},
        "Features": {"Parameters": {
            "Radius": 0.6, "ReferenceFrameRadius": 0.5,
            "ReferenceFrameType": "SHOT"}, "Type": "SHOT"},
        "GlobalFeatures": {"Type": "Dummy"},
        "Keypoints": {"Parameters": {"LeafSize": 0.35}, "Type": "VoxelGrid"},
        "Voting": {"Parameters": {
            "Bandwidth": 0.5, "SingleObjectMode": True,
            "SingleObjectMaxType": "BandwidthVotes"}, "Type": "MeanShift"}},
        "Parameters": {"DistanceType": "ChiSquared", "NormalRadius": 0.25,
                       "ConsistentNormalsMethod": 2,
                       "BoundingBoxType": "AABB"}}}
    train = []
    for cid in range(num_classes):
        for j in range(args.n_train):
            train.append((cid, hard_shapes.make_hard_instance(
                rng, cid, n=args.points, rotate=True, noise=0.005,
                keep_frac=hard_shapes.train_keep_frac(j))))

    model_path = args.model or "/tmp/platform_ab_model.ism"
    if os.path.exists(model_path) and os.path.exists(model_path + "d.npz"):
        ism = ImplicitShapeModel.load(model_path)
    else:
        import tempfile
        ism = ImplicitShapeModel(IsmConfig.from_json(config))
        tmp = tempfile.mkdtemp()
        for i, (cid, pts) in enumerate(train):
            p = os.path.join(tmp, f"ab{i}.pcd")
            save_pcd(p, PointCloud(xyz=pts))
            ism.add_training_model(p, cid, cid)
        ism.train()
        ism.save(model_path)
    cb = jax.tree_util.tree_map(jnp.asarray, ism.state.codebook)

    tests, labels = [], []
    for cid in range(num_classes):
        for _ in range(args.n_test):
            tests.append(hard_shapes.make_hard_instance(
                rng, cid, n=args.points, rotate=True, noise=args.noise,
                keep_frac=args.keep_frac, bite_frac=args.bite_frac))
            labels.append(cid)

    cfg = JitPipelineConfig(
        descriptor="SHOT", radius=0.6, ref_frame_radius=0.5, leaf_size=0.35,
        normal_radius=0.25, normals_method=2, metric="chisq", knn_k=1,
        keypoint_capacity=384, neighbor_capacity=1024,
        bandwidth=0.5, num_classes=num_classes)
    params = CodebookParams(knn_k=1)
    step = jax.jit(jax.vmap(
        lambda p, m: classify_intermediates(p, m, cb, cfg, params)))

    m = max(len(t) for t in tests)
    batch = np.zeros((len(tests), m, 3), np.float32)
    mask = np.zeros((len(tests), m), bool)
    for i, t in enumerate(tests):
        batch[i, :len(t)] = t
        batch[i, len(t):] = 1e9
        mask[i, :len(t)] = True

    out = step(jnp.asarray(batch), jnp.asarray(mask))
    rec = {f: np.asarray(getattr(out, f)) for f in out._fields}
    rec["labels"] = np.asarray(labels)
    rec["platform"] = np.asarray(jax.default_backend())
    rec["device"] = np.asarray(str(jax.devices()[0]))
    np.savez_compressed(args.dump, **rec)
    acc = float((rec["scores"].argmax(1) == rec["labels"]).mean())
    print(json.dumps({"dumped": args.dump,
                      "platform": str(rec["platform"]),
                      "device": str(rec["device"]),
                      "views": len(tests), "accuracy": acc}))
    return 0


def compare(path_a: str, path_b: str) -> dict:
    """Pure-numpy divergence report between two dumps (importable for
    tests)."""
    a, b = np.load(path_a), np.load(path_b)

    def stage(name, xa, xb, valid=None):
        xa = xa.astype(np.float64)
        xb = xb.astype(np.float64)
        if valid is not None:
            xa = xa[valid]
            xb = xb[valid]
        d = np.abs(xa - xb)
        scale = max(float(np.abs(xa).max(initial=0.0)), 1e-30)
        return {
            "max_abs_delta": float(d.max(initial=0.0)),
            "rms_delta": float(np.sqrt((d ** 2).mean()) if d.size else 0.0),
            "max_rel_delta_vs_scale": float(d.max(initial=0.0) / scale),
        }

    # common-valid masks: a lane only counts when BOTH platforms produced it
    # (a validity flip is itself reported separately)
    kv = np.asarray(a["desc_valid"]) & np.asarray(b["desc_valid"])
    vv = np.asarray(a["vote_valid"]) & np.asarray(b["vote_valid"])

    sa, sb = np.asarray(a["scores"]), np.asarray(b["scores"])
    pred_a, pred_b = sa.argmax(1), sb.argmax(1)
    top2_a = np.sort(sa, axis=1)
    margin = top2_a[:, -1] - top2_a[:, -2]          # decision margin (A)
    sdelta = np.abs(sa - sb).max(axis=1)            # per-view score delta
    flips = np.nonzero(pred_a != pred_b)[0]

    labels = np.asarray(a["labels"])
    rep = {
        "platform_a": str(a["platform"]), "platform_b": str(b["platform"]),
        "views": int(sa.shape[0]),
        "accuracy_a": float((pred_a == labels).mean()),
        "accuracy_b": float((pred_b == labels).mean()),
        "argmax_flips": [int(i) for i in flips],
        "desc_validity_flips": int(
            (np.asarray(a["desc_valid"]) != np.asarray(b["desc_valid"])).sum()),
        "vote_validity_flips": int(
            (np.asarray(a["vote_valid"]) != np.asarray(b["vote_valid"])).sum()),
        "stages": {
            "keypoints": stage("keypoints", a["keypoints"], b["keypoints"],
                               kv),
            "descriptors": stage("descriptors", a["descriptors"],
                                 b["descriptors"], kv),
            "vote_position": stage("vote_position", a["vote_position"],
                                   b["vote_position"], vv),
            "vote_weight": stage("vote_weight", a["vote_weight"],
                                 b["vote_weight"], vv),
            "scores": stage("scores", sa, sb),
        },
        "decision_margin": {
            "min_margin": float(margin.min()),
            "median_margin": float(np.median(margin)),
            "max_score_delta": float(sdelta.max()),
            # the decisive robustness number: for each view, its OWN margin
            # vs its OWN platform delta; < 1 for any view would mean
            # platform noise can flip that decision
            "min_per_view_margin_over_delta": float(
                (margin / np.maximum(sdelta, 1e-30)).min()),
            # cross-view worst case (overly conservative: pairs the most
            # fragile view's margin with the noisiest view's delta)
            "min_margin_over_max_delta": float(
                margin.min() / max(sdelta.max(), 1e-30)),
        },
    }
    return rep


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.compare:
        print(json.dumps(compare(*args.compare), indent=1))
        return 0
    if args.dump:
        return dump(args)
    build_parser().error("need --dump or --compare")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
