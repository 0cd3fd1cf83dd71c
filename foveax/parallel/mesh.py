"""Mesh construction helpers.

Axes:
  ``space``  — spatial (image-row) sharding for the SAT scan; this is the
               project's sequence-parallel axis (SURVEY.md section 5: the
               2-D prefix scan's scan axis is the "sequence").
  ``data``   — client/gaze data parallelism: N concurrent viewers of one
               video, each with their own gaze (the reference runs one full
               engine stack per connection instead, reference:
               src/video_server.cc:62-73).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_space: int | None = None,
    n_data: int = 1,
    *,
    devices: list | None = None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_space is None:
        n_space = len(devices) // n_data
    n = n_space * n_data
    dev = np.asarray(devices[:n]).reshape(n_data, n_space)
    return Mesh(dev, axis_names=("data", "space"))
