"""Comparison-pipeline eval tool (reference eval_pipeline_{mccann,tombari,
aldoma,zhou,knopp}/eval_*.cpp: `main [dataset file] [model name]`; the
dataset file is the same '# train' / '# test' list the main eval tools use;
training writes the model, testing prints accuracy like
eval_lnbnn.cpp:84-210)."""

from __future__ import annotations

import argparse
import sys
from collections import defaultdict

from ..utils.io import parse_file_list

PIPELINES = ("lnbnn", "tombari", "aldoma", "zhou", "knopp")


def make_pipeline(name: str, dataset: str, bin_size: float, th: float):
    from ..pipelines.building_blocks import dataset_preset
    params = None
    if dataset:
        params = dataset_preset(dataset, bin_size, th, pipeline=name)
    if name == "lnbnn":
        from ..pipelines.lnbnn import Lnbnn
        return Lnbnn(params)
    if name == "tombari":
        from ..pipelines.tombari import Hough3d
        return Hough3d(params)
    if name == "aldoma":
        from ..pipelines.aldoma import GlobalHV
        return GlobalHV(params)
    if name == "zhou":
        from ..pipelines.zhou import SelfAdaptHGHV
        return SelfAdaptHGHV(params)
    if name == "knopp":
        from ..pipelines.knopp import PclIsm
        return PclIsm(params)
    raise ValueError(name)


def run_detection(args) -> int:
    """Detection eval (the reference's eval_hough3d_detection /
    eval_aldoma_detection / eval_zhou_detection mains): run pipe.detect()
    per scene, greedily match ground truth, print per-class P/R/AP."""
    import numpy as np
    from ..models.metrics import (DetectionObject, parse_annotation_file,
                                  compute_all_metrics)
    pipe = make_pipeline(args.pipeline, args.dataset, args.bin, args.th)
    if args.inlier > 0 and hasattr(pipe, "params"):
        from dataclasses import replace as _rep
        pipe.params = _rep(pipe.params, inlier_threshold=args.inlier)
    if not hasattr(pipe, "detect"):
        print(f"{args.pipeline} has no detection mode", file=sys.stderr)
        return 1
    with open(args.dataset_file) as f:
        lines = [ln.split() for ln in f.read().splitlines() if ln.split()]
    header = lines[0]
    if header[0] != "#" or header[1] != "test" or             (len(header) > 2 and header[2] != "detection"):
        print("expected a '# test detection' list", file=sys.stderr)
        return 1
    pipe.load_model(args.model)

    all_gt, all_det = [], []
    for row in lines[1:]:
        cloud_file, annot_file = row[0], row[1]
        gt = parse_annotation_file(annot_file, cloud_file)
        dets = pipe.detect(cloud_file)
        all_gt.extend(gt)
        for (c, w, pos) in dets:
            all_det.append(DetectionObject(
                class_label=str(c), instance_label=str(c),
                global_class_label=str(c),
                position=np.asarray(pos, np.float32),
                occlusion_ratio=0.0, confidence=float(w),
                filepath=annot_file, cloud_filepath=cloud_file,
                bb_extent=np.zeros(3, np.float32),
                bb_quat=np.array([1, 0, 0, 0], np.float32)))
        print(f"{cloud_file}: {len(dets)} detections / {len(gt)} gt objects")

    from ..models.metrics import rearrange_objects
    gt_by_class = rearrange_objects(all_gt)
    det_by_class = rearrange_objects(all_det)
    aps = []
    for label in sorted(gt_by_class):
        p_, r_, ap, *_ = compute_all_metrics(
            gt_by_class[label], det_by_class.get(label, []),
            args.dist_threshold)
        aps.append(ap)
        print(f" class {label}: precision {p_:.3f} recall {r_:.3f} "
              f"AP {ap:.3f}")
    if aps:
        print(f"\n mAP: {sum(aps) / len(aps):.3f}")
    return 0


def main(argv=None) -> int:
    from . import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(
        prog="eval_pipeline",
        description="Run one of the five comparison pipelines")
    p.add_argument("pipeline", choices=PIPELINES)
    p.add_argument("dataset_file", help="'# train' or '# test' file list")
    p.add_argument("model", help="model file (written in training, "
                                 "loaded in testing)")
    p.add_argument("--dataset", default="",
                   help="parameter preset name (aim/mcg/psb/sh12/mn10/mn40/"
                        "wash/bigbird/ycb/dataset1/dataset5/...)")
    p.add_argument("--bin", type=float, default=0.0, help="Hough bin size")
    p.add_argument("--th", type=float, default=0.0, help="rel. threshold")
    p.add_argument("--detect", action="store_true",
                   help="detection mode: the dataset file is a "
                        "'# test detection' list of (cloud, annotation) "
                        "pairs (tombari/aldoma/zhou only)")
    p.add_argument("--dist-threshold", type=float, default=0.3,
                   help="detection: GT matching distance threshold")
    p.add_argument("--inlier", type=float, default=0.0,
                   help="detection: RANSAC inlier threshold override")
    args = p.parse_args(argv)

    try:
        if args.detect:
            return run_detection(args)
        return run_classification(args)
    except ValueError as e:
        # bad preset/pipeline combinations (e.g. a classification-only
        # pipeline on a detection dataset) exit like the reference CLIs:
        # a clean stderr message, nonzero status, no traceback
        print(f"eval_pipeline: {e}", file=sys.stderr)
        return 1


def run_classification(args) -> int:
    fl = parse_file_list(args.dataset_file)
    pipe = make_pipeline(args.pipeline, args.dataset, args.bin, args.th)
    labels = (fl.instance_labels
              if fl.using_instances else fl.class_labels)

    if fl.mode == "train":
        pipe.train(fl.filenames, labels,
                   fl.instance_labels if fl.using_instances else labels,
                   args.model)
        print(f"{args.pipeline} training finished, model -> {args.model}")
        return 0

    pipe.load_model(args.model)
    correct = 0
    per_class = defaultdict(lambda: [0, 0])
    for fn, gt in zip(fl.filenames, labels):
        results = pipe.classify(fn)
        pred = results[0][0] if results else -1
        ok = pred == gt
        correct += ok
        per_class[gt][0] += ok
        per_class[gt][1] += 1
        print(f"{fn}: predicted {pred}, ground truth {gt} "
              f"{'OK' if ok else 'WRONG'}")
    n = len(fl.filenames)
    acc = 100.0 * correct / max(n, 1)
    avg = sum(c / t for c, t in per_class.values()) / max(len(per_class), 1)
    print(f"\n Accuracy: {acc:.0f} % ({correct}/{n}), "
          f"Average per Class Accuracy: {100.0 * avg:.0f} %")
    return 0


if __name__ == "__main__":
    sys.exit(main())
