"""Offline visualization (the reference's Qt/VTK training_gui renders
normals, features, votes, trajectories, and maxima live — this headless
analog renders the same artifacts to PNG from the eval tools' dumps)."""

from .render import (render_cloud, render_detections, render_voting_space,
                     render_trajectories)

__all__ = ["render_cloud", "render_detections", "render_voting_space",
           "render_trajectories"]
