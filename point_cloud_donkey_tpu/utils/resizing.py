"""Point-cloud rescaling (reference utils/point_cloud_resizing.{h,cpp}: used
by the GUI tooling to bring models to a common physical size)."""

from __future__ import annotations

import numpy as np

from .io import PointCloud


def resize_cloud(cloud: PointCloud, factor: float) -> PointCloud:
    """Uniform scale about the origin (PointCloudResizing::operator())."""
    return PointCloud(xyz=np.asarray(cloud.xyz) * float(factor),
                      normals=cloud.normals, curvature=cloud.curvature,
                      rgb=cloud.rgb)


def resize_to_radius(cloud: PointCloud, target_radius: float) -> PointCloud:
    """Scale so that max ||p - centroid|| == target_radius."""
    xyz = np.asarray(cloud.xyz)
    c = xyz.mean(axis=0)
    r = float(np.linalg.norm(xyz - c, axis=1).max())
    if r <= 0:
        return cloud
    return resize_cloud(cloud, target_radius / r)
