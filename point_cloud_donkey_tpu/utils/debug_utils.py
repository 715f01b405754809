"""Offline-analysis dumps (reference utils/debug_utils.{h,cpp}: writes ranked
feature indices and feature clouds to disk for inspection)."""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np


def write_ranked_indices(path: str, scores: np.ndarray,
                         ranking: np.ndarray,
                         class_ids: Optional[np.ndarray] = None) -> None:
    """Dump per-feature ranking scores + order (DebugUtils::writeOutForDebug):
    one line per feature: rank, original index, score[, class]."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write("# rank index score" + (" class" if class_ids is not None else "") + "\n")
        for rank, idx in enumerate(np.asarray(ranking).tolist()):
            row = f"{rank} {idx} {float(scores[idx]):.8g}"
            if class_ids is not None:
                row += f" {int(class_ids[idx])}"
            f.write(row + "\n")


def write_feature_cloud(path: str, positions: np.ndarray,
                        descriptors: np.ndarray,
                        extra: Optional[dict] = None) -> None:
    """Dump keypoint positions + descriptors as an .npz next to a small JSON
    sidecar (DebugUtils::writeToFile analog; npz replaces the PCD+bin pair)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, positions=np.asarray(positions),
                        descriptors=np.asarray(descriptors))
    if extra:
        with open(path + ".json", "w") as f:
            json.dump(extra, f, indent=1)


def write_voting_space(path: str, votes_xyz: np.ndarray,
                       weights: np.ndarray, class_ids: np.ndarray) -> None:
    """Dump the cast votes for voting-space visualization (the reference GUI
    renders these live; here they go to disk for notebook plotting)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, votes=np.asarray(votes_xyz),
                        weights=np.asarray(weights),
                        classes=np.asarray(class_ids))
