"""eval_tool-compatible classification CLI.

Mirrors src/eval_tool/eval_classification.cpp: `-t <ism> -f <train list> -o
<out>` trains; `-d <ism> -f <test list> -o <out>` classifies and writes
`summary.txt` with per-file results, label maps, per-step times and
accuracy lines in the reference's format (eval_classification.cpp:311-558).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Dict, List

import numpy as np

from ..models.ism import ImplicitShapeModel
from ..utils.config import IsmConfig
from ..utils.io import parse_file_list

# host path: files loaded + detected per chunk so peak memory is O(chunk)
# clouds, not O(dataset); module-level so tests can shrink it
FILE_CHUNK = 256


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="eval_classification",
        description="ISM3D TPU classification eval tool")
    p.add_argument("-t", "--train", help="Input config file (training)")
    p.add_argument("-d", "--detect", help="Trained ism file (classification)")
    p.add_argument("-f", "--file", dest="inputfile",
                   help="File list with a '# train|test [inst]' header")
    p.add_argument("-o", "--output", help="Output folder / model file")
    p.add_argument("-i", "--inplace", action="store_true",
                   help="Overwrite the loaded ism file after training")
    p.add_argument("-m", "--models", nargs="*", help="Train: model files")
    p.add_argument("-c", "--classes", nargs="*", type=int,
                   help="Train: class ids for -m models")
    p.add_argument("-p", "--pointclouds", nargs="*",
                   help="Test: input point clouds (alternative to -f, "
                        "eval_classification.cpp:62)")
    p.add_argument("-g", "--groundtruth", nargs="*", type=int,
                   help="Test: ground-truth class ids for -p clouds")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="write a jax.profiler trace of the run to DIR")
    p.add_argument("--fast", action="store_true",
                   help="batched jitted classification (TPU serving path); "
                        "eligible for single-object-mode configs with "
                        "SHOT/CSHOT/SHORT_SHOT + VoxelGrid keypoints -- "
                        "orders of magnitude faster than the per-cloud host "
                        "path, same argmax decisions")
    p.add_argument("--fast-batch", type=int, default=32,
                   help="clouds per device step in --fast mode")
    p.add_argument("--template", metavar="OUT.ism",
                   help="Write a fully-populated default config and exit "
                        "(the reference emits one when an empty model is "
                        "written, implicit_shape_model.h:78-80)")
    return p


def resolve_labels(fl, instance_primary: bool):
    """Label usage decision (eval_helpers.h:46-61 +
    eval_classification.cpp:126-136)."""
    if not fl.using_instances:
        return "CLASS_ONLY", fl.class_labels, fl.class_labels
    if instance_primary:
        return "INSTANCE_PRIMARY", fl.instance_labels, fl.instance_labels
    return "CLASS_PRIMARY", fl.class_labels, fl.instance_labels


def run_training(args) -> int:
    ism_file = args.train or args.detect
    ism = ImplicitShapeModel(IsmConfig.load(ism_file))
    fl = None
    if args.inputfile:
        fl = parse_file_list(args.inputfile)
        usage, class_ids, instance_ids = resolve_labels(
            fl, ism.root.get("InstanceLabelsPrimary", True))
        files = fl.filenames
    elif args.models and args.classes:
        files = args.models
        class_ids = args.classes
        instance_ids = args.classes
        usage = "CLASS_ONLY"
        fl = None
    else:
        print("no training input given", file=sys.stderr)
        return 1

    for f, c, i in zip(files, class_ids, instance_ids):
        ism.add_training_model(f, c, i)
    ism.train()

    if fl is not None:
        ism.state.instance_to_class = dict(fl.instance_to_class)
        ism.label_maps = {
            "class": {str(v): k for k, v in fl.class_map.items()},
            "instance": {str(v): k for k, v in fl.instance_map.items()},
            "usage": usage,
        }

    if args.inplace:
        ism.save(ism_file)
    elif args.output:
        out = args.output
        if not out.endswith(".ism"):
            out = out + ".ism"
        ism.save(out)
    else:
        print("the trained ism is not saved", file=sys.stderr)
        return 1
    return 0


def _fast_classify(ism, filenames, batch_size):
    """Batched jitted classification over the file list (the TPU serving
    path).  Returns (results, times) with results[i] = (class_id,
    glob_class_id, instance_id), or None when the model config is not
    eligible for the fused single-object program."""
    import jax
    import jax.numpy as jnp

    from ..models.pipeline_jit import (JitPipelineConfig,
                                       classify_scores_instances)
    from ..models.ism import _codebook_params
    from ..utils.io import load_cloud
    from ..models.features import bucket_size

    fcfg = ism._feature_cfg()
    kp_cfg = ism.config.child("Keypoints")
    vcfg = ism.config.child("Voting")
    eligible = (
        fcfg.type in ("SHOT", "SHORT_SHOT", "CSHOT")
        and (kp_cfg.type or "VoxelGrid") == "VoxelGrid"
        and vcfg.get("SingleObjectMode", False)
        # only the fixed-bandwidth centroid query is reproduced by the
        # fused program (voting_mean_shift.cpp:124-156 BANDWIDTH mode)
        and vcfg.get("SingleObjectMaxType", "Default") == "BandwidthVotes"
        and not vcfg.get("UseGlobalFeatures", False))
    if not eligible:
        return None

    t_all = time.perf_counter()
    from ..models.ism import preprocess_cloud
    clouds, rgbs = [], []
    for fn in filenames:
        # same load path as the host flow (detect_file): NaN removal AND the
        # configured preprocessing chain (SOR/ROR/MLS/voxel/z-cut)
        pc = preprocess_cloud(load_cloud(fn).remove_nan(), ism.root)
        if pc.has_normals():
            # the fused program recomputes normals; stored cloud normals
            # would silently diverge from the host path -> fall back
            return None
        clouds.append(pc.xyz)
        rgbs.append(pc.rgb)
    if not clouds:
        return [], {k: 0.0 for k in ("complete", "features", "keypoints",
                                     "normals", "flann", "voting", "maxima")}
    with_rgb = fcfg.type == "CSHOT"
    if with_rgb and any(r is None for r in rgbs):
        return None

    n_bucket = bucket_size(max(len(c) for c in clouds), minimum=256)
    # exact keypoint-capacity bound from host-side voxel counting (the
    # same f32 computation the device performs -- detect_batch's helper)
    from ..models.detect_batch import host_voxel_count
    leaf = kp_cfg.get("LeafSize", 0.1)
    max_kp = max(host_voxel_count(c, leaf) for c in clouds)
    kp_cap = bucket_size(max(max_kp, 1), minimum=64)

    cb = jax.tree_util.tree_map(jnp.asarray, ism.state.codebook)
    cb_params = _codebook_params(ism.config.child("Codebook"))
    cfg = JitPipelineConfig(
        descriptor=fcfg.type, radius=fcfg.radius,
        ref_frame_radius=fcfg.ref_frame_radius, leaf_size=leaf,
        normal_radius=ism.root.get("NormalRadius", 0.05),
        normals_method=ism.root.get("ConsistentNormalsMethod", 2),
        metric=ism.metric, keypoint_capacity=kp_cap,
        bandwidth=vcfg.get("Bandwidth", 0.1),
        num_classes=int(ism.state.codebook.class_sigma.shape[0]))
    n_inst = int(np.max(ism.state.codebook.vote_instance)) + 1 \
        if ism.state.codebook.vote_instance.size else 1

    # one packed output per batch (a device->host pull per array costs a
    # full round-trip), and all batches dispatched before the first pull so
    # transfers overlap with compute
    def _packed(p, m, r):
        cls_s, inst_s = classify_scores_instances(
            p, m, cb, cfg, cb_params, n_inst, rgb=r if with_rgb else None)
        return jnp.concatenate([cls_s, inst_s])

    step = jax.jit(jax.vmap(_packed))
    n_cls = int(ism.state.codebook.class_sigma.shape[0])

    n = len(clouds)
    results = []
    times = {k: 0.0 for k in ("complete", "features", "keypoints", "normals",
                              "flann", "voting", "maxima")}
    t0 = time.perf_counter()
    pending = []
    for i0 in range(0, n, batch_size):
        chunk = clouds[i0:i0 + batch_size]
        b = len(chunk)
        pts = np.full((batch_size, n_bucket, 3), 1e9, np.float32)
        msk = np.zeros((batch_size, n_bucket), bool)
        rgb = np.zeros((batch_size, n_bucket, 3), np.float32)
        for j, c in enumerate(chunk):
            pts[j, :len(c)] = c
            msk[j, :len(c)] = True
            if with_rgb:
                rgb[j, :len(c)] = rgbs[i0 + j]
        pending.append((b, step(jnp.asarray(pts), jnp.asarray(msk),
                                jnp.asarray(rgb))))
    for b, out in pending:
        packed = np.asarray(out)[:b]
        cls_s = packed[:, :n_cls]
        inst_s = packed[:, n_cls:]
        for j in range(b):
            cid = int(cls_s[j].argmax()) if cls_s[j].max() > 0 else -1
            iid = int(inst_s[j].argmax()) if inst_s[j].max() > 0 else -1
            results.append((cid, cid, iid))
    t_exec = time.perf_counter() - t0
    # the fused program has no per-stage boundaries; report the device time
    # under "voting" and the host prep under "features"
    times["complete"] = time.perf_counter() - t_all
    times["voting"] = t_exec
    times["features"] = times["complete"] - t_exec
    return results, times


def _test_file_list(args):
    """The `-f` list, or one built from `-p`/`-g` (the reference's
    'replaces p and g in testing', eval_classification.cpp:52-63)."""
    from ..utils.io import FileList
    if args.inputfile:
        return parse_file_list(args.inputfile)
    if args.pointclouds and args.groundtruth:
        if len(args.pointclouds) != len(args.groundtruth):
            raise SystemExit("-p and -g must have the same length")
        ids = [int(g) for g in args.groundtruth]
        return FileList(mode="test", filenames=list(args.pointclouds),
                        class_labels=ids, instance_labels=list(ids),
                        using_instances=False,
                        class_map={str(c): c for c in ids},
                        instance_map={str(c): c for c in ids},
                        instance_to_class={c: c for c in ids})
    raise SystemExit("no test input given: use -f, or -p with -g")


def run_classification(args) -> int:
    ism_file = args.detect or args.train
    ism = ImplicitShapeModel.load(ism_file)
    fl = _test_file_list(args)
    usage, _, _ = resolve_labels(
        fl, ism.root.get("InstanceLabelsPrimary", True))
    # ground truth is ALWAYS in true-label space at test time: classified
    # instance ids are remapped instance->class below, and the reference
    # compares against the file list's class/instance columns directly
    # (eval_classification.cpp:293-309 gt_class_ids = class_labels even for
    # INSTANCE_PRIMARY; :421-425 remaps the prediction)
    gt_class_ids = fl.class_labels
    gt_instance_ids = fl.instance_labels
    inst2cls = ism.state.instance_to_class or fl.instance_to_class

    out_dir = args.output
    summary_lines: List[str] = []
    n = len(fl.filenames)
    num_correct = 0
    num_correct_inst = 0
    num_correct_global = 0
    num_both = 0
    num_only_global = 0
    per_class: Dict[int, List[int]] = {}

    wall0 = time.perf_counter()
    times: Dict[str, float] = {}

    fast_results = None
    if getattr(args, "fast", False):
        fast = _fast_classify(ism, fl.filenames, args.fast_batch)
        if fast is None:
            print("--fast: model config not eligible for the fused program "
                  "(needs SingleObjectMode + SHOT/CSHOT/SHORT_SHOT + "
                  "VoxelGrid, no global features); falling back to the "
                  "host path", file=sys.stderr)
        else:
            fast_results, times = fast

    host_maxima = None
    if fast_results is None:
        # full-parity host path, device stages batched across files in
        # chunks (models/detect_batch.py); same per-file decisions as the
        # per-cloud detect loop (pinned by tests/test_detection.py)
        from ..models.ism import preprocess_cloud
        from ..utils.io import load_cloud
        strip_color = ism.root.get("SetColorToZero", False)
        # load + detect in chunks of files to bound host memory at
        # O(chunk), not O(dataset); 256 files per chunk keeps the
        # bucket-boundary padding cost (one half-full 8-wide chunk per
        # bucket per call) negligible while a reference-scale RGB-D list
        # stays a few hundred MB resident instead of many GB
        host_maxima = []
        for lo in range(0, len(fl.filenames), FILE_CHUNK):
            clouds, nrms, rgbs = [], [], []
            for path in fl.filenames[lo:lo + FILE_CHUNK]:
                print(f"Processing file: {path}")
                pc = preprocess_cloud(load_cloud(path).remove_nan(), ism.root)
                clouds.append(pc.xyz)
                nrms.append(pc.normals if pc.has_normals() else None)
                rgbs.append(None if strip_color else pc.rgb)
            for maxima, times_i in ism.detect_batch(clouds, nrms, rgbs):
                host_maxima.append(maxima)
                # snapshots of ism.processing_times are CUMULATIVE across
                # chunks (only ever +=); keep the last one, never sum them
                times = dict(times_i)

    for idx, (path, true_cls, true_inst) in enumerate(
            zip(fl.filenames, gt_class_ids, gt_instance_ids)):
        if fast_results is not None:
            class_id, class_id_global, instance_id = fast_results[idx]
            if usage == "INSTANCE_PRIMARY":
                instance_id = class_id
                class_id = inst2cls.get(class_id, -1)
                class_id_global = inst2cls.get(class_id_global, -1)
        else:
            maxima = host_maxima[idx]

            class_id, class_id_global, instance_id = -1, -1, -1
            if maxima:
                class_id = maxima[0].class_id
                class_id_global = maxima[0].glob_class_id
                instance_id = maxima[0].instance_id
                if usage == "INSTANCE_PRIMARY":
                    instance_id = class_id
                    class_id = inst2cls.get(class_id, -1)
                    class_id_global = inst2cls.get(class_id_global, -1)

        line = (f"file: {path}, ground truth class: {true_cls}, "
                f"classified class: {class_id}")
        if class_id != class_id_global:
            line += f", global class: {class_id_global}"
        summary_lines.append(line)

        hit = int(true_cls == class_id)
        num_correct += hit
        per_class.setdefault(true_cls, [0, 0])
        per_class[true_cls][0] += hit
        per_class[true_cls][1] += 1
        num_correct_inst += int(true_inst == instance_id)
        num_correct_global += int(true_cls == class_id_global)
        num_both += int(true_cls == class_id and true_cls == class_id_global)
        num_only_global += int(true_cls != class_id and true_cls == class_id_global)

    wall = time.perf_counter() - wall0

    # label maps
    summary_lines.append("")
    summary_lines.append("")
    label_maps = getattr(ism, "label_maps", None) or {}
    if usage in ("CLASS_ONLY", "CLASS_PRIMARY"):
        summary_lines.append("class id to class name mapping:")
        for lbl, cid in sorted(fl.class_map.items(), key=lambda kv: kv[1]):
            summary_lines.append(f"{cid}: {lbl}")
    if usage == "INSTANCE_PRIMARY":
        # reference parity quirk: despite the header, the reference prints
        # the CLASS name map here (class_labels_rmap at
        # eval_classification.cpp:496-501)
        summary_lines.append("instance id to instance name mapping (used as primary labels, i.e. classes):")
        for lbl, cid in sorted(fl.class_map.items(), key=lambda kv: kv[1]):
            summary_lines.append(f"{cid}: {lbl}")
        summary_lines.append("")
        summary_lines.append("instance id to class id mapping:")
        for iid, cid in sorted(inst2cls.items()):
            summary_lines.append(f"{iid}: {cid}")
    if usage == "CLASS_PRIMARY":
        summary_lines.append("")
        summary_lines.append("instance id to instance name mapping:")
        for lbl, iid in sorted(fl.instance_map.items(), key=lambda kv: kv[1]):
            summary_lines.append(f"{iid}: {lbl}")

    # processing times (same step keys as the reference summary,
    # eval_classification.cpp:519-533)
    time_sum = sum(v for k, v in times.items() if k != "complete")
    summary_lines.append("")
    summary_lines.append("")
    summary_lines.append("")
    summary_lines.append(f"complete time: {times.get('complete', 0.0):.6g} [s], "
                         f"sum all steps: {time_sum:.6g} [s]")
    summary_lines.append("times per step:")
    for label, key in [("create flann index: ", "flann"),
                       ("compute normals:    ", "normals"),
                       ("compute keypoints:  ", "keypoints"),
                       ("compute features:   ", "features"),
                       ("cast votes:         ", "voting"),
                       ("find maxima:        ", "maxima")]:
        summary_lines.append(f"{label}{times.get(key, 0.0):10.6g} [s]")

    avg_pc_acc = float(np.mean([c / t for c, t in per_class.values()])) if per_class else 0.0
    acc = num_correct / n if n else 0.0
    summary_lines.append("")
    summary_lines.append("")
    summary_lines.append(f" Accuracy: {acc * 100.0:g} %, Average per Class Accuracy: "
                         f"{avg_pc_acc * 100.0:g} %")
    summary_lines.append("")
    summary_lines.append(f" result: {num_correct} of {n} clouds classified correctly ({acc * 100.0:g} %)")
    summary_lines.append(f" result: {num_correct_inst} of {n} instances recognized correctly ({num_correct_inst / n * 100.0 if n else 0:g} %)")
    summary_lines.append(f" result: {num_correct_global} of {n} clouds classified correctly with global descriptors ({num_correct_global / n * 100.0 if n else 0:g} %)")
    summary_lines.append("")
    summary_lines.append(f" both correct: {num_both} ({num_both / n * 100.0 if n else 0:g} %)")
    summary_lines.append(f" only global correct: {num_only_global} ({num_only_global / n * 100.0 if n else 0:g} %)")
    summary_lines.append("")
    summary_lines.append("")
    summary_lines.append(f" Total processing time: {wall:.4f} seconds ")

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "summary.txt"), "w") as f:
            f.write("\n".join(summary_lines) + "\n")
    else:
        print("no output file specified, detected maxima will not be saved",
              file=sys.stderr)
    print(f" Accuracy: {acc * 100.0:g} % ({num_correct}/{n})")
    return 0


def main(argv=None) -> int:
    from . import apply_platform_env
    apply_platform_env()
    args = build_parser().parse_args(argv)
    if args.template:
        IsmConfig.template().save(args.template)
        print(f"wrote template config to {args.template}")
        return 0
    mode = ""
    if args.inputfile:
        with open(args.inputfile) as f:
            header = f.readline().split()
        if len(header) >= 2 and header[0] == "#":
            mode = header[1]
        if len(header) >= 3 and header[2] == "detection":
            print("ERROR: You are using a detection data set with the "
                  "classification eval_tool! Use 'eval_detection' instead.",
                  file=sys.stderr)
            return 1

    run = None
    if (args.train and mode == "") or mode == "train":
        run = run_training
    elif (args.detect and mode == "") or mode == "test":
        run = run_classification
    if run is None:
        print("specify either -t (train) or -d (detect) with a matching file list",
              file=sys.stderr)
        return 1
    if args.profile:
        import jax
        with jax.profiler.trace(args.profile):
            return run(args)
    return run(args)


if __name__ == "__main__":
    sys.exit(main())
