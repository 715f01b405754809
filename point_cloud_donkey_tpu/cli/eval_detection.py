"""eval_tool_detection-compatible CLI.

Reference: src/eval_tool/eval_detection.cpp + eval_helpers_detection.h +
logging_to_files.h.  Training takes either labeled whole clouds
(`# train detection [inst]`) or scene clouds with annotation files
(`# train detection boxes`); testing takes `(cloud, annotation)` pairs
(`# test detection`), runs multi-object detection, matches detections
against ground truth per class with per-class distance thresholds
(ImplicitShapeModel::getDetectionThreshold), and writes a summary with
per-class precision / recall / AP / f-score (+ global-classifier variants)
plus the dataset PR curve (logging_to_files.h:43-165).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..models.ism import ImplicitShapeModel
from ..models.metrics import (DetectionObject, compute_all_metrics,
                              parse_annotation_file, precision_recall_curve,
                              rearrange_objects)
from ..ops import geometry as geo
from ..utils.config import IsmConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="eval_detection",
                                description="ISM3D TPU detection eval tool")
    p.add_argument("-t", "--train", help="Input config file (training)")
    p.add_argument("-d", "--detect", help="Trained ism file (detection)")
    p.add_argument("-f", "--file", dest="inputfile", required=True)
    p.add_argument("-o", "--output", help="Output folder / model file")
    p.add_argument("-i", "--inplace", action="store_true")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="write a jax.profiler trace of the run to DIR")
    return p


def write_log_per_cloud(cloud_file: str, ism_file: str, gt_file: str,
                        out_path: str, maxima,
                        used_names: Optional[set] = None) -> None:
    """Per-cloud detection log, one line per maximum
    (logging_to_files.h:43-88 writeLogPerCloud format).  The reference keys
    by basename, which silently clobbers logs when different directories
    contain same-named clouds (scene_a/cloud.pcd, scene_b/cloud.pcd); pass
    `used_names` to get collision-suffixed filenames instead."""
    base = os.path.basename(cloud_file)
    if used_names is not None:
        candidate = base
        i = 1
        while candidate in used_names:
            candidate = f"{base}.{i}"
            i += 1
        used_names.add(candidate)
        base = candidate
    with open(os.path.join(out_path, base + ".txt"), "w") as f:
        f.write(f"ISM3D detection log, filename: {ism_file}, point cloud: "
                f"{cloud_file}, ground truth file: {gt_file}\n")
        f.write("number, classID, weight, instanceID, instance weight, "
                "num-votes, position X Y Z, bounding box size X Y Z, "
                "bounding Box rotation quaternion w x y z\n")
        for i, m in enumerate(maxima):
            pos = np.asarray(m.position, float)
            siz = np.asarray(m.bb_size, float)
            q = np.asarray(m.bb_quat, float)
            f.write(f"{i}, {m.class_id}, {m.weight:g}, {m.instance_id}, "
                    f"{m.instance_weight:g}, {m.num_votes}, "
                    f"{pos[0]:g}, {pos[1]:g}, {pos[2]:g}, "
                    f"{siz[0]:g}, {siz[1]:g}, {siz[2]:g}, "
                    f"{q[0]:g}, {q[1]:g}, {q[2]:g}, {q[3]:g}\n")


def parse_detection_list(path: str):
    """Returns (mode, entries, flags): for 'boxes' training and testing the
    entries are (cloud_file, annotation_file) pairs; otherwise
    (cloud_file, class_label[, instance_label]) rows
    (eval_helpers_detection.h:500-700)."""
    with open(path) as f:
        lines = [ln.split() for ln in f.read().splitlines() if ln.split()]
    header = lines[0]
    if header[0] != "#" or len(header) < 3 or header[2] != "detection":
        raise ValueError(f"{path}: expected '# train|test detection [inst|boxes]'")
    mode = header[1]
    flag = header[3] if len(header) > 3 else ""
    rows = [t for t in lines[1:] if not t[0].startswith("#")]
    return mode, flag, rows


def run_training(args) -> int:
    ism_file = args.train or args.detect
    ism = ImplicitShapeModel(IsmConfig.load(ism_file))
    mode, flag, rows = parse_detection_list(args.inputfile)
    if mode != "train":
        print("input file is not a training list", file=sys.stderr)
        return 1

    class_map: Dict[str, int] = {}
    instance_map: Dict[str, int] = {}
    inst2cls: Dict[int, int] = {}

    def conv(label, mapping):
        if label not in mapping:
            mapping[label] = len(mapping)
        return mapping[label]

    if flag == "boxes":
        for cloud_file, annot_file in rows:
            objs = parse_annotation_file(annot_file, cloud_file)
            class_ids, inst_ids, boxes = [], [], []
            for o in objs:
                cid = conv(o.class_label, class_map)
                iid = conv(o.instance_label, class_map)
                class_ids.append(cid)
                inst_ids.append(iid)
                inst2cls.setdefault(iid, cid)
                boxes.append(geo.BoundingBox(
                    position=o.position, size=o.bb_extent,
                    quat=o.bb_quat / max(np.linalg.norm(o.bb_quat), 1e-12)))
            ism.add_training_models_with_boxes(cloud_file, class_ids, inst_ids, boxes)
    else:
        use_inst = flag == "inst"
        instance_primary = ism.root.get("InstanceLabelsPrimary", True)
        for row in rows:
            cid = conv(row[1], class_map)
            if use_inst:
                iid = conv(row[2], instance_map)
                inst2cls.setdefault(iid, cid)
                if instance_primary:
                    ism.add_training_model(row[0], iid, iid)
                else:
                    ism.add_training_model(row[0], cid, iid)
            else:
                ism.add_training_model(row[0], cid, cid)
                inst2cls.setdefault(cid, cid)

    ism.train()
    ism.state.instance_to_class = inst2cls
    ism.label_maps = {
        "class": {str(v): k for k, v in class_map.items()},
        "instance": {str(v): k for k, v in (instance_map or class_map).items()},
        "usage": "detection",
    }

    out = ism_file if args.inplace else (args.output or "")
    if not out:
        print("the trained ism is not saved", file=sys.stderr)
        return 1
    if not out.endswith(".ism"):
        out += ".ism"
    ism.save(out)
    return 0


def run_detection(args) -> int:
    ism_file = args.detect or args.train
    ism = ImplicitShapeModel.load(ism_file)
    mode, flag, rows = parse_detection_list(args.inputfile)
    if mode != "test":
        print("input file is not a test list", file=sys.stderr)
        return 1

    label_maps = getattr(ism, "label_maps", {}) or {}
    cls_rmap = {int(k): v for k, v in label_maps.get("class", {}).items()}
    inst_rmap = {int(k): v for k, v in label_maps.get("instance", {}).items()} or cls_rmap
    inst2cls = ism.state.instance_to_class

    gt_objects: List[DetectionObject] = []
    det_objects: List[DetectionObject] = []
    times: Dict[str, float] = {}
    wall0 = time.perf_counter()

    if args.output:
        os.makedirs(args.output, exist_ok=True)
    log_names: set = set()
    # batched detection: load a chunk of scenes, run ONE detect_batch call
    # (device stages batched across clouds; scene-scale or exotic configs
    # fall back per-cloud inside detect_batch with identical results);
    # chunking bounds host memory for long scene lists
    from ..models.ism import preprocess_cloud
    from ..utils.io import load_cloud
    CHUNK = 16
    flat: List[Tuple[str, str, List, Dict[str, float]]] = []
    for c0 in range(0, len(rows), CHUNK):
        chunk_rows = rows[c0:c0 + CHUNK]
        clouds, nrms, rgbs = [], [], []
        for cloud_file, _gt in chunk_rows:
            print(f"Processing file: {cloud_file}")
            cloud = load_cloud(cloud_file).remove_nan()
            cloud = preprocess_cloud(cloud, ism.root)
            clouds.append(cloud.xyz)
            nrms.append(cloud.normals if cloud.has_normals() else None)
            rgbs.append(None if ism.root.get("SetColorToZero", False)
                        else cloud.rgb)
        results = ism.detect_batch(clouds, nrms, rgbs)
        for (cloud_file, gt_file), (maxima, times_i) in zip(chunk_rows,
                                                            results):
            flat.append((cloud_file, gt_file, maxima, times_i))

    for cloud_file, gt_file, maxima, times in flat:
        if args.output:
            write_log_per_cloud(cloud_file, ism_file, gt_file,
                                args.output, maxima, used_names=log_names)
        gt_objects.extend(parse_annotation_file(gt_file, cloud_file))
        for m in maxima:
            # convertMaxToObj (eval_helpers_detection.h:415-438)
            cid, gid, iid = m.class_id, m.glob_class_id, m.instance_id
            if label_maps.get("usage") == "INSTANCE_PRIMARY":
                cls_name = cls_rmap.get(inst2cls.get(cid, cid), str(cid))
                inst_name = inst_rmap.get(cid, str(cid))
                glob_name = cls_rmap.get(inst2cls.get(gid, gid), str(gid))
            else:
                cls_name = cls_rmap.get(cid, str(cid))
                inst_name = inst_rmap.get(iid, str(iid))
                glob_name = cls_rmap.get(gid, str(gid))
            det_objects.append(DetectionObject(
                class_label=cls_name, instance_label=inst_name,
                global_class_label=glob_name, position=np.asarray(m.position),
                confidence=m.weight, filepath=gt_file,
                cloud_filepath=cloud_file,
                bb_extent=np.asarray(m.bb_size), bb_quat=np.asarray(m.bb_quat)))
    wall = time.perf_counter() - wall0

    gt_map = rearrange_objects(gt_objects)
    det_map = rearrange_objects(det_objects)
    report_global = ism.config.child("Voting").get("UseGlobalFeatures", False)
    det_map_global = rearrange_objects(det_objects, use_global=True) \
        if report_global else {}

    class_name_to_id = {v: k for k, v in cls_rmap.items()}
    thresholds = ism.get_detection_threshold()

    lines = []
    lines.append("  class       num gt   tp    fp   precision  recall   AP      f-score")
    tps_per_class, fps_per_class = {}, {}
    g_tps, g_fps = {}, {}
    num_gt_total = cum_tp = cum_fp = 0
    per_class = {}
    g_per_class = {}
    for label in sorted(gt_map.keys()):
        gt_list = gt_map[label]
        cid = class_name_to_id.get(label, 0)
        thresh = thresholds.get(cid, ism.root.get("DistanceThresholdDetection", 0.05))
        det_list = det_map.get(label, [])
        p_, r_, ap, tp, fp, tpl, fpl = compute_all_metrics(gt_list, det_list, thresh)
        tps_per_class[label], fps_per_class[label] = tpl, fpl
        per_class[label] = (p_, r_, ap)
        num_gt_total += len(gt_list)
        cum_tp += tp
        cum_fp += fp
        f1 = 2 * p_ * r_ / (p_ + r_) if (p_ + r_) else 0.0
        line = (f"{cid:>3} {label:<12} {len(gt_list):>4} {tp:>5} {fp:>5} "
                f"{p_:>9.4f} {r_:>8.4f} {ap:>7.4f} {f1:>8.4f}")
        if report_global:
            gp, gr, gap, gtp, gfp, gtpl, gfpl = compute_all_metrics(
                gt_list, det_map_global.get(label, []), thresh)
            g_tps[label], g_fps[label] = gtpl, gfpl
            g_per_class[label] = (gp, gr, gap)
            gf1 = 2 * gp * gr / (gp + gr) if (gp + gr) else 0.0
            line += (f"   | global {gtp:>4} {gfp:>5} {gp:>9.4f} {gr:>8.4f} "
                     f"{gap:>7.4f} {gf1:>8.4f}")
        lines.append(line)

    _, _, overall_ap = precision_recall_curve(det_map, gt_map,
                                              tps_per_class, fps_per_class)

    vals = list(per_class.values()) or [(0, 0, 0)]
    m_prec = float(np.mean([v[0] for v in vals]))
    m_rec = float(np.mean([v[1] for v in vals]))
    m_ap = float(np.mean([v[2] for v in vals]))
    fscore = 2 * m_prec * m_rec / (m_prec + m_rec) if (m_prec + m_rec) else 0.0

    lines.append("-" * 69)
    lines.append(f"Overall: {num_gt_total:>11} {cum_tp:>5} {cum_fp:>5}")
    if report_global:
        gvals = list(g_per_class.values()) or [(0, 0, 0)]
        gp = float(np.mean([v[0] for v in gvals]))
        gr = float(np.mean([v[1] for v in gvals]))
        gap = float(np.mean([v[2] for v in gvals]))
        gfs = 2 * gp * gr / (gp + gr) if (gp + gr) else 0.0
        lines.append("")
        lines.append("global detector metrics:")
        lines.append(f"global mAP:            {gap:7.4f} ({gap*100:.2f} %)")
        lines.append(f"global mean precision: {gp:7.4f} ({gp*100:.2f} %)")
        lines.append(f"global mean recall:    {gr:7.4f} ({gr*100:.2f} %)")
        lines.append(f"global f-score:        {gfs:7.4f} ({gfs*100:.2f} %)")
    lines.append("")
    lines.append("main metrics:")
    lines.append(f"       mAP:            {m_ap:7.4f} ({m_ap*100:.2f} %)")
    lines.append(f"       mean precision: {m_prec:7.4f} ({m_prec*100:.2f} %)")
    lines.append(f"       mean recall:    {m_rec:7.4f} ({m_rec*100:.2f} %)")
    lines.append(f"       f-score:        {fscore:7.4f} ({fscore*100:.2f} %)")
    lines.append(f"overall AP (pooled):   {overall_ap:7.4f}")
    lines.append("")
    time_sum = sum(v for k, v in times.items() if k != "complete")
    lines.append(f"complete time: {times.get('complete', 0.0):.6g} [s], "
                 f"sum all steps: {time_sum:.6g} [s]")
    lines.append(f"total processing time: {wall:.4f} seconds ")

    if args.output:
        os.makedirs(args.output, exist_ok=True)
        with open(os.path.join(args.output, "summary.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
    print("\n".join(lines[-7:]))
    return 0


def main(argv=None) -> int:
    from . import apply_platform_env
    apply_platform_env()
    args = build_parser().parse_args(argv)
    mode, _, _ = parse_detection_list(args.inputfile)
    run = run_training if mode == "train" else run_detection
    if args.profile:
        import jax
        with jax.profiler.trace(args.profile):
            return run(args)
    return run(args)


if __name__ == "__main__":
    sys.exit(main())
