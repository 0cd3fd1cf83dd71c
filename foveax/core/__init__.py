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
from foveax.core.direct import sample_rect_direct
from foveax.core.sat import build_sat, decode_sat
from foveax.core.sample import (
    expand_sampled_rect,
    sample_rect_from_sat,
    sample_rect_point,
)
from foveax.core.unwarp import unwarp_rect
from foveax.core.logpolar import (
    LogPolarGrid,
    build_pyramid,
    logpolar_gaussian_blur,
    make_logpolar_grid,
    sample_logpolar,
    sample_logpolar_pyramid,
    unwarp_logpolar,
)
from foveax.core.gnomonic import gnomonic_project
from foveax.core.metrics import (
    eccentricity_weighted_psnr,
    foveal_psnr,
    mse,
    psnr,
)
from foveax.core.svd_sat import (
    SVDSat,
    compress_sat,
    create_reduced_sat,
    reconstruct_sat,
    sample_from_reduced_sat,
)

__all__ = [
    "LogRectGrid",
    "delta_1d",
    "lam",
    "make_grid",
    "make_point_grid",
    "build_sat",
    "decode_sat",
    "sample_rect_from_sat",
    "sample_rect_point",
    "expand_sampled_rect",
    "unwarp_rect",
    "LogPolarGrid",
    "make_logpolar_grid",
    "sample_logpolar",
    "logpolar_gaussian_blur",
    "unwarp_logpolar",
    "build_pyramid",
    "sample_logpolar_pyramid",
    "gnomonic_project",
    "mse",
    "psnr",
    "foveal_psnr",
    "eccentricity_weighted_psnr",
    "SVDSat",
    "compress_sat",
    "reconstruct_sat",
    "create_reduced_sat",
    "sample_from_reduced_sat",
]
