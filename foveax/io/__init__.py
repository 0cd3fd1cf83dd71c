"""Host-side IO: video decode/encode, PNG, gaze traces, fragment muxing."""

from foveax.io.gaze import GazeViewPoint, GazeViewPoints
from foveax.io.png import load_png, save_png
from foveax.io.video import (
    SyntheticReader,
    VideoReader,
    VideoWriter,
    open_video,
)

__all__ = [
    "GazeViewPoint",
    "GazeViewPoints",
    "load_png",
    "save_png",
    "VideoReader",
    "VideoWriter",
    "SyntheticReader",
    "open_video",
]
