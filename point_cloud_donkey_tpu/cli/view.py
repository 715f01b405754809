"""Interactive viewer CLI (training_gui / ground_truth_gui analog).

Renders a cloud (+ optional annotation boxes, + optional voting-analysis
dump) into one self-contained HTML file -- open it in any browser, no
display server or extra assets needed.

    python -m point_cloud_donkey_tpu.cli.view scene.pcd -o viewer.html
    python -m point_cloud_donkey_tpu.cli.view scene.pcd -a scene_ann.txt
    python -m point_cloud_donkey_tpu.cli.view scene.pcd \
        --votes voting_analysis/votes_0001.npz -o votes.html
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..models.metrics import parse_annotation_file
from ..ops import geometry as geo
from ..utils.io import load_cloud
from ..viz.html_viewer import (viewer_from_voting_dump, write_scene_viewer)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="view", description="Write an interactive HTML viewer")
    p.add_argument("cloud", help="point cloud (.pcd/.ply)")
    p.add_argument("-a", "--annotations", default=None,
                   help="annotation file (detection ground-truth format)")
    p.add_argument("--votes", default=None,
                   help="voting-analysis npz dump (EnableVotingAnalysis)")
    p.add_argument("-o", "--out", default="viewer.html")
    p.add_argument("--max-points", type=int, default=80000)
    args = p.parse_args(argv)

    pc = load_cloud(args.cloud).remove_nan()

    if args.votes:
        viewer_from_voting_dump(args.out, args.votes, pc.xyz,
                                title=args.cloud)
    else:
        boxes, labels = [], []
        if args.annotations:
            for o in parse_annotation_file(args.annotations, args.cloud):
                q = np.asarray(o.bb_quat, float)
                q = q / max(np.linalg.norm(q), 1e-12)
                boxes.append(geo.BoundingBox(position=o.position,
                                             size=o.bb_extent, quat=q))
                labels.append(o.class_label)
        write_scene_viewer(args.out, pc.xyz, boxes=boxes, box_labels=labels,
                           title=args.cloud, max_points=args.max_points)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
