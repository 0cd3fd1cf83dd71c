"""Chip-free Mosaic lowering checks for every Pallas kernel family.

``jax.export`` with ``platforms=["tpu"]`` runs the real Pallas->Mosaic
lowering pipeline (including the block-mapping validation in
``jax._src.pallas.mosaic.lowering``) on a CPU-only host — no TPU device
or tunnel needed.  Interpret-mode tests cannot see this class of
failure: the first on-chip run of the fused kernels was rejected with
"last two dimensions of your block shape [must be] divisible by 8 and
128 ... or equal to the respective dimensions" for the per-block
metadata vectors, which every interpret-mode parity test had happily
accepted.  This lane pins lowerability at every production shape so a
tunnel outage can never again hide an on-chip-only compile failure.

(What this cannot catch: Mosaic *compile*-stage failures such as scoped
VMEM exhaustion — those run in the backend at XLA compile time.  The
static VMEM audits in the kernel modules plus the ``-m tpu`` hardware
lane cover that layer.)
"""

import jax
import jax.numpy as jnp
import pytest
from jax import export

from foveax.config import reduced_dim
from foveax.core.logrect import make_grid

# (source_w, source_h, reduced_w, reduced_h) for every production size;
# 1080p uses the reference's fixed 1072x608 (parameters.h:8-9), larger
# sizes the 16*ceil(dim/1.8/16) rule (run_satlogrectilinear.cc:113-114).
SHAPES = [
    (1920, 1080, 1072, 608),
    (3840, 2160, reduced_dim(3840), reduced_dim(2160)),
    (7680, 4320, reduced_dim(7680), reduced_dim(4320)),
    (15360, 8640, reduced_dim(15360), reduced_dim(8640)),
]
IDS = ["1080p", "4k", "8k", "16k"]


def _lower_tpu(fn, *args):
    """Lower ``fn`` for the TPU platform (no device needed); raises on
    any Mosaic lowering rejection."""
    export.export(jax.jit(fn), platforms=["tpu"])(*args)


@pytest.mark.parametrize("sw,sh,rw,rh", SHAPES, ids=IDS)
def test_fused_sampler_lowers_for_tpu(sw, sh, rw, rh):
    from foveax.kernels.segreduce import sample_rect_fused

    grid = make_grid(rw, rh, sw, sh)

    def f(frame, center):
        return sample_rect_fused(
            frame, grid, center, in_layout="chw", out_layout="chw"
        )

    _lower_tpu(
        f,
        jax.ShapeDtypeStruct((3, sh, sw), jnp.uint8),
        jax.ShapeDtypeStruct((2,), jnp.float32),
    )


@pytest.mark.parametrize("sw,sh,rw,rh", SHAPES, ids=IDS)
def test_fused_unwarp_lowers_for_tpu(sw, sh, rw, rh):
    from foveax.kernels.unwarp_pl import unwarp_rect_fused

    def f(reduced, center):
        return unwarp_rect_fused(
            reduced, sw, sh, center, in_layout="chw", out_layout="chw"
        )

    _lower_tpu(
        f,
        jax.ShapeDtypeStruct((3, rh, rw), jnp.uint8),
        jax.ShapeDtypeStruct((2,), jnp.float32),
    )


@pytest.mark.parametrize("sw,sh,rw,rh", SHAPES[:2], ids=IDS[:2])
def test_sat_scan_lowers_for_tpu(sw, sh, rw, rh):
    # Chip-proven since round 1 — cheap insurance against block-spec
    # regressions when the scan is next touched.
    from foveax.kernels.scan2d import build_sat_pallas

    def f(frame):
        return build_sat_pallas(frame, in_layout="chw")

    _lower_tpu(f, jax.ShapeDtypeStruct((3, sh, sw), jnp.uint8))


@pytest.mark.parametrize("sw,sh,rw,rh", SHAPES[:2], ids=IDS[:2])
def test_batch_grid_sampler_lowers_for_tpu(sw, sh, rw, rh):
    # The round-5 grid-batched sampler adds gaze-decoding index maps
    # ((i // nbg) * nhb + j etc.) that only the real Mosaic block-mapping
    # validation checks — interpret-mode parity cannot see a rejection.
    from foveax.kernels.segreduce import sample_rect_fused_batch

    grid = make_grid(rw, rh, sw, sh)

    def f(frame, centers):
        return sample_rect_fused_batch(
            frame, grid, centers, in_layout="chw", out_layout="chw"
        )

    _lower_tpu(
        f,
        jax.ShapeDtypeStruct((3, sh, sw), jnp.uint8),
        jax.ShapeDtypeStruct((4, 2), jnp.float32),
    )
