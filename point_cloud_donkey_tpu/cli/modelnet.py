"""ModelNet10/40 -> eval_classification, one command.

Walks a ModelNet root (<root>/<class>/<train|test>/*.off — the official
layout), samples each mesh to a point cloud (area-weighted, unit-sphere
normalized), writes PCDs mirroring the tree, and emits `train.txt` /
`test.txt` file lists in the reference's `# train` format
(eval_tool/eval_helpers.h:100-177).  Follow-up (documented in README):

    python -m point_cloud_donkey_tpu.cli.modelnet /data/ModelNet10 out/
    python -m point_cloud_donkey_tpu.cli.eval_classification \
        -t configs/modelnet.ism -f out/train.txt -o model
    python -m point_cloud_donkey_tpu.cli.eval_classification \
        -d model.ism -f out/test.txt -o results/
"""

from __future__ import annotations

import argparse
import os
import sys


def convert(root: str, out_dir: str, n_points: int, seed: int,
            keep_off: bool = False, limit_per_class: int = 0) -> int:
    from ..utils.io import PointCloud, save_pcd
    from ..utils.mesh import off_to_cloud

    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    if not classes:
        print(f"no class directories under {root}", file=sys.stderr)
        return 1
    lists = {"train": [], "test": []}
    n_files = 0
    for cls in classes:
        for split in ("train", "test"):
            src = os.path.join(root, cls, split)
            if not os.path.isdir(src):
                continue
            offs = sorted(f for f in os.listdir(src) if f.endswith(".off"))
            if limit_per_class:
                offs = offs[:limit_per_class]
            dst = os.path.join(out_dir, cls, split)
            os.makedirs(dst, exist_ok=True)
            for i, name in enumerate(offs):
                off_path = os.path.join(src, name)
                if keep_off:
                    lists[split].append((off_path, cls))
                    continue
                pcd_path = os.path.join(dst, name[:-4] + ".pcd")
                if not os.path.exists(pcd_path):
                    # per-file seed keeps views independent but reproducible
                    cloud = off_to_cloud(off_path, n_points=n_points,
                                         seed=seed + i)
                    save_pcd(pcd_path, PointCloud(xyz=cloud.xyz), binary=True)
                lists[split].append((pcd_path, cls))
                n_files += 1
    for split, entries in lists.items():
        if not entries:
            continue
        path = os.path.join(out_dir, f"{split}.txt")
        with open(path, "w") as f:
            f.write(f"# {split}\n")
            for fn, cls in entries:
                f.write(f"{fn} {cls}\n")
        print(f"{path}: {len(entries)} clouds, "
              f"{len(set(c for _, c in entries))} classes")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("root", help="ModelNet root (class/train|test/*.off)")
    ap.add_argument("out_dir", help="output directory for PCDs + file lists")
    ap.add_argument("--n-points", type=int, default=2048,
                    help="points sampled per mesh (default 2048)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--keep-off", action="store_true",
                    help="reference the .off files directly in the lists "
                         "(sampled on load) instead of writing PCDs")
    ap.add_argument("--limit-per-class", type=int, default=0,
                    help="cap files per class/split (quick parity runs)")
    a = ap.parse_args(argv)
    os.makedirs(a.out_dir, exist_ok=True)
    return convert(a.root, a.out_dir, a.n_points, a.seed, a.keep_off,
                   a.limit_per_class)


if __name__ == "__main__":
    sys.exit(main())
