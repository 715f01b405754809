"""Scene composer + ground-truth annotator (headless analog of the
reference's model_gui — compose scenes from model clouds with move/scale/
rotate — and ground_truth_gui — write annotation files with oriented boxes;
src/model_gui/, src/ground_truth_gui/).

Input: a JSON spec
  {"output": "scene.pcd", "annotation": "scene.txt",
   "objects": [{"file": "chair.pcd", "class": "chair", "instance": "chair1",
                "position": [x, y, z], "euler_deg": [rx, ry, rz],
                "scale": 1.0}, ...]}
Output: the composed scene PCD and (optionally) the 12-token annotation
format eval_detection reads: class occlusion x y z ex ey ez qw qx qy qz
(models/metrics.parse_annotation_file; eval_helpers_detection.h:441-499)."""

from __future__ import annotations

import argparse
import json
import math
import sys
from typing import List

import numpy as np

from ..utils.io import PointCloud, load_cloud, save_pcd


def euler_to_matrix(rx: float, ry: float, rz: float) -> np.ndarray:
    cx, sx = math.cos(rx), math.sin(rx)
    cy, sy = math.cos(ry), math.sin(ry)
    cz, sz = math.cos(rz), math.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def matrix_to_quat(R: np.ndarray) -> np.ndarray:
    """(w, x, y, z) from a rotation matrix."""
    w = math.sqrt(max(1.0 + R[0, 0] + R[1, 1] + R[2, 2], 0.0)) / 2.0
    if w > 1e-8:
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:
        x, y, z = 1.0, 0.0, 0.0
    return np.array([w, x, y, z])


def compose(spec: dict) -> int:
    clouds: List[np.ndarray] = []
    colors: List[np.ndarray] = []
    ann_lines: List[str] = []
    for obj in spec["objects"]:
        pc = load_cloud(obj["file"]).remove_nan()
        xyz = np.asarray(pc.xyz, np.float64)
        centroid = xyz.mean(axis=0)
        xyz = xyz - centroid
        scale = float(obj.get("scale", 1.0))
        xyz *= scale
        eul = [math.radians(a) for a in obj.get("euler_deg", [0, 0, 0])]
        R = euler_to_matrix(*eul)
        xyz = xyz @ R.T
        pos = np.asarray(obj.get("position", [0, 0, 0]), np.float64)
        xyz = xyz + pos
        clouds.append(xyz.astype(np.float32))
        if pc.rgb is not None:
            colors.append(np.asarray(pc.rgb, np.float32))
        size = (xyz.max(axis=0) - xyz.min(axis=0))
        quat = matrix_to_quat(R)
        occl = obj.get("occlusion", 0.0)
        ann_lines.append(
            f"{obj.get('class', '0')} ({occl:g}) "
            + " ".join(f"{v:.6g}" for v in pos) + " "
            + " ".join(f"{v:.6g}" for v in size) + " "
            + " ".join(f"{v:.6g}" for v in quat))
    scene = np.concatenate(clouds)
    rgb = np.concatenate(colors) if len(colors) == len(clouds) else None
    save_pcd(spec["output"], PointCloud(xyz=scene, rgb=rgb))
    print(f"wrote scene with {len(scene)} points to {spec['output']}")
    if spec.get("annotation"):
        with open(spec["annotation"], "w") as f:
            f.write("\n".join(ann_lines) + "\n")
        print(f"wrote {len(ann_lines)} annotations to {spec['annotation']}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="scene_composer",
        description="Compose scenes from model clouds + write GT boxes")
    p.add_argument("spec", help="JSON scene spec (see module docstring)")
    p.add_argument("--edit", metavar="EDITOR_HTML",
                   help="instead of composing, emit the interactive browser "
                        "editor for this spec (model_gui editing analog; "
                        "viz/editor.py) -- move/rotate/scale objects, export "
                        "the edited spec, then compose it")
    args = p.parse_args(argv)
    with open(args.spec) as f:
        spec = json.load(f)
    if args.edit:
        import os

        from ..viz.editor import write_scene_editor
        write_scene_editor(args.edit, spec,
                           base_dir=os.path.dirname(os.path.abspath(args.spec)))
        print(f"wrote editor to {args.edit}")
        return 0
    return compose(spec)


if __name__ == "__main__":
    sys.exit(main())
