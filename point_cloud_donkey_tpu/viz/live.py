"""Live training/detection progress view (training_gui analog).

The reference's training_gui subscribes to ImplicitShapeModel's boost
signals and renders clouds, normals, features, voting spaces and maxima in
a Qt/VTK window WHILE train/detect runs (implicit_shape_model.h:256-261).
A TPU pod has no display server, so the live analog is a directory of
self-refreshing HTML pages: register a LiveHtmlProgress with
ImplicitShapeModel.connect and keep `index.html` open in a browser -- each
stage event rewrites the page it belongs to and the pages auto-reload.

Event -> page mapping:
  point_cloud / bounding_box / normals / features -> model.html
    (current cloud grey, keypoints highlighted, bounding box)
  votes / maxima -> voting.html (voting space, class-colored, maxima boxes)
  codebook / train_complete -> status line on index.html
"""

from __future__ import annotations

import html
import os
import time
from typing import Optional

import numpy as np

from .html_viewer import write_scene_viewer, write_voting_viewer

_REFRESH = '<meta http-equiv="refresh" content="{p}">'

_INDEX = """<!DOCTYPE html>
<html><head><meta charset="utf-8">{refresh}<title>ism live</title>
<style>body{{background:#14161a;color:#d8dce2;font:14px system-ui,sans-serif;
padding:24px}}a{{color:#4fc3f7}}</style></head><body>
<h2>point_cloud_donkey_tpu &mdash; live progress</h2>
<p>{status}</p>
<ul><li><a href="model.html" target="_blank">current model / cloud</a></li>
<li><a href="voting.html" target="_blank">voting space</a></li></ul>
<p style="color:#9aa3ad">updated {ts}; events seen: {n}</p>
</body></html>
"""


class LiveHtmlProgress:
    """Callback for ImplicitShapeModel.connect: renders stage events into
    auto-refreshing HTML pages under `out_dir`.

    `min_interval_s` throttles rewrites of the heavy pages (the event
    stream can be much faster than a browser refresh)."""

    def __init__(self, out_dir: str, refresh_s: float = 2.0,
                 min_interval_s: float = 0.5):
        self.out_dir = out_dir
        self.refresh_s = refresh_s
        self.min_interval = min_interval_s
        os.makedirs(out_dir, exist_ok=True)
        self._n_events = 0
        self._status = "waiting for events"
        self._last_write = {"model": 0.0, "voting": 0.0}
        self._cloud: Optional[np.ndarray] = None
        self._box = None
        self._features = None
        self._votes = None
        self._write_index()

    # -- the callback ------------------------------------------------------
    def __call__(self, event: str, payload: dict) -> None:
        self._n_events += 1
        if event == "point_cloud":
            self._cloud = np.asarray(payload["xyz"])
            self._box = None
            self._features = None
            self._status = f"processing cloud ({len(self._cloud)} points)"
            self._maybe_write_model()
        elif event == "bounding_box":
            self._box = payload["box"]
            self._maybe_write_model()
        elif event == "normals":
            pass  # carried for observers; the canvas view draws points only
        elif event == "features":
            self._features = payload["features"]
            self._status = (f"features: "
                            f"{int(np.sum(self._features.mask))} keypoints")
            self._maybe_write_model(force=True)
        elif event == "votes":
            self._votes = payload["votes"]
            self._maybe_write_voting()
        elif event == "maxima":
            maxima = payload["maxima"]
            self._status = f"{len(maxima)} maxima"
            self._maybe_write_voting(maxima=maxima, force=True)
        elif event == "codebook":
            cb = payload["codebook"]
            self._status = (f"codebook trained: "
                            f"{int(np.sum(cb.cw_mask))} codewords")
        elif event == "train_complete":
            self._status = "training complete"
        self._write_index()

    # -- page writers ------------------------------------------------------
    def _maybe_write_model(self, force: bool = False) -> None:
        if self._cloud is None:
            return
        now = time.monotonic()
        if not force and now - self._last_write["model"] < self.min_interval:
            return
        self._last_write["model"] = now
        boxes, labels = [], []
        if self._box is not None:
            boxes, labels = [self._box], ["bbox"]
        xyz = self._cloud
        class_ids = None
        if self._features is not None:
            kp = np.asarray(self._features.positions)[
                np.asarray(self._features.mask)]
            xyz = np.concatenate([xyz, kp])
            class_ids = np.concatenate(
                [np.zeros(len(self._cloud), np.int32),
                 np.ones(len(kp), np.int32)])
        path = os.path.join(self.out_dir, "model.html")
        write_scene_viewer(path, xyz, class_ids=class_ids, boxes=boxes,
                           box_labels=labels, title="current model")
        self._inject_refresh(path)

    def _maybe_write_voting(self, maxima=None, force: bool = False) -> None:
        if self._votes is None or self._cloud is None:
            return
        now = time.monotonic()
        if not force and now - self._last_write["voting"] < self.min_interval:
            return
        self._last_write["voting"] = now
        v = self._votes
        val = np.asarray(v.valid)
        path = os.path.join(self.out_dir, "voting.html")
        write_voting_viewer(path, self._cloud,
                            np.asarray(v.position)[val],
                            np.asarray(v.weight)[val],
                            np.asarray(v.class_id)[val],
                            maxima=maxima, title="voting space")
        self._inject_refresh(path)

    def _inject_refresh(self, path: str) -> None:
        with open(path) as f:
            content = f.read()
        content = content.replace(
            "<head>", "<head>" + _REFRESH.format(p=self.refresh_s), 1)
        with open(path, "w") as f:
            f.write(content)

    def _write_index(self) -> None:
        with open(os.path.join(self.out_dir, "index.html"), "w") as f:
            f.write(_INDEX.format(
                refresh=_REFRESH.format(p=self.refresh_s),
                status=html.escape(self._status),
                ts=time.strftime("%H:%M:%S"), n=self._n_events))
