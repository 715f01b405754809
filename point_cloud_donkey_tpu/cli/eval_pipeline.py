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
        params = dataset_preset(dataset, bin_size, th)
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


def main(argv=None) -> int:
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
    args = p.parse_args(argv)

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
