"""Pure-JAX transform math.  Every function is shape-static and jit-able;
gaze centers enter as traced scalars so no recompilation happens per frame.
"""

from foveax.core.logrect import (
    LogRectGrid,
    delta_1d,
    lam,
    make_grid,
    make_point_grid,
)
from foveax.core.sat import build_sat, decode_sat
from foveax.core.sample import sample_rect_from_sat
from foveax.core.unwarp import unwarp_rect

__all__ = [
    "LogRectGrid",
    "delta_1d",
    "lam",
    "make_grid",
    "make_point_grid",
    "build_sat",
    "decode_sat",
    "sample_rect_from_sat",
    "unwarp_rect",
]
