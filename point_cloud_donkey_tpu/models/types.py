"""Shared data types: feature sets (struct-of-arrays ISMFeature equivalent)
and the trained-model state.

The reference's ISMFeature (utils/ism_feature.h:21-44) is a PCL point carrying
xyz + 9-float LRF + variable-length descriptor + centerDist +
globalDescriptorRadius + classId/instanceId.  Here a batch of features is a
struct of fixed-shape arrays with a validity mask -- the jit-friendly layout.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, NamedTuple, Optional

import numpy as np


class FeatureSet(NamedTuple):
    """A batch of local (or global) features for one cloud."""
    descriptors: np.ndarray   # [F, D]
    positions: np.ndarray     # [F, 3] keypoint positions
    frames: np.ndarray        # [F, 3, 3] LRFs (rows = axes)
    mask: np.ndarray          # [F] validity
    center_dist: np.ndarray   # [F] distance of keypoint to cloud centroid
    global_radius: np.ndarray  # [F] globalDescriptorRadius (global features)

    @property
    def dim(self) -> int:
        return int(self.descriptors.shape[-1])

    def compact(self) -> "FeatureSet":
        """Drop padded rows (host-side)."""
        m = np.asarray(self.mask)
        return FeatureSet(*(np.asarray(a)[m] for a in self))


def make_feature_set(descriptors, positions, frames, mask,
                     center_dist=None, global_radius=None) -> FeatureSet:
    f = np.asarray(mask).shape[0]
    if center_dist is None:
        center_dist = np.zeros(f, np.float32)
    if global_radius is None:
        global_radius = np.zeros(f, np.float32)
    return FeatureSet(np.asarray(descriptors), np.asarray(positions),
                      np.asarray(frames), np.asarray(mask),
                      np.asarray(center_dist), np.asarray(global_radius))
