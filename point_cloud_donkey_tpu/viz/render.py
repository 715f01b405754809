"""Matplotlib renders of the artifacts the reference GUIs visualize
(training_gui/training_gui.cpp:149-154 wires ISM signals for normals,
features, votes, trajectories, maxima; vtk_utils/ renders scene+ortho
panes).  Each function writes a PNG and returns the path."""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _axes3d(title: str):
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    ax.set_title(title)
    return fig, ax


def render_cloud(path: str, xyz: np.ndarray,
                 rgb: Optional[np.ndarray] = None,
                 normals: Optional[np.ndarray] = None,
                 keypoints: Optional[np.ndarray] = None,
                 title: str = "cloud") -> str:
    """Scene/model render with optional normals (quiver) and keypoints —
    the training_gui 'show normals / show features' toggles."""
    fig, ax = _axes3d(title)
    c = rgb if rgb is not None else xyz[:, 2]
    ax.scatter(*xyz.T, c=c, s=1, alpha=0.5)
    if normals is not None:
        step = max(len(xyz) // 200, 1)
        ax.quiver(*xyz[::step].T, *normals[::step].T,
                  length=0.05, color="red", linewidth=0.5)
    if keypoints is not None and len(keypoints):
        ax.scatter(*keypoints.T, c="black", s=25, marker="x")
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def render_voting_space(path: str, votes: np.ndarray, weights: np.ndarray,
                        classes: np.ndarray,
                        maxima: Optional[np.ndarray] = None,
                        title: str = "voting space") -> str:
    """Votes colored by class, sized by weight, with maxima markers — the
    training_gui vote view; reads the npz written by EnableVotingAnalysis
    (utils/debug_utils.write_voting_space)."""
    fig, ax = _axes3d(title)
    w = np.asarray(weights, float)
    s = 2 + 30 * w / max(w.max(), 1e-12)
    ax.scatter(*np.asarray(votes).T, c=np.asarray(classes), s=s,
               cmap="tab10", alpha=0.6)
    if maxima is not None and len(maxima):
        ax.scatter(*np.asarray(maxima).T, c="red", s=200, marker="*",
                   edgecolors="black")
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def render_trajectories(path: str, starts: np.ndarray, ends: np.ndarray,
                        title: str = "mean-shift trajectories") -> str:
    """Seed -> converged-mode segments (the per-class trajectories the GUI
    keeps, voting_mean_shift.cpp:489-492)."""
    fig, ax = _axes3d(title)
    for a, b in zip(np.asarray(starts), np.asarray(ends)):
        ax.plot(*np.stack([a, b]).T, color="gray", linewidth=0.6)
    ax.scatter(*np.asarray(ends).T, c="red", s=12)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def _box_corners(position, size, quat_wxyz):
    w, x, y, z = quat_wxyz
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])
    h = np.asarray(size) / 2.0
    corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                        for sz in (-1, 1)]) * h
    return corners @ R.T + np.asarray(position)


_BOX_EDGES = [(0, 1), (0, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 7), (6, 7),
              (0, 4), (1, 5), (2, 6), (3, 7)]


def render_detections(path: str, xyz: np.ndarray,
                      maxima: Sequence, title: str = "detections") -> str:
    """Scene + detected maxima with oriented bounding boxes (the GUI's
    detect view).  `maxima` are VotingMaximum-likes with .position,
    .bbox_size, .bbox_quat, .class_id."""
    fig, ax = _axes3d(title)
    ax.scatter(*xyz.T, c="lightgray", s=1, alpha=0.4)
    for m in maxima:
        pos = np.asarray(m.position)
        ax.scatter(*pos, c="red", s=150, marker="*")
        size = getattr(m, "bbox_size", None)
        quat = getattr(m, "bbox_quat", None)
        if size is not None and quat is not None and np.all(np.isfinite(size)):
            corners = _box_corners(pos, size, np.asarray(quat))
            for i, j in _BOX_EDGES:
                ax.plot(*np.stack([corners[i], corners[j]]).T,
                        color="blue", linewidth=1.0)
        ax.text(*pos, f" c{int(m.class_id)}", fontsize=9)
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
