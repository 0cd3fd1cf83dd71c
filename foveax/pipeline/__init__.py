"""Per-frame pipeline functions and host-side runners."""

from foveax.pipeline.frames import FoveationPipeline

__all__ = ["FoveationPipeline"]
