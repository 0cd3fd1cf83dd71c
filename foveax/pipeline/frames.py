"""Jitted frame-level pipeline functions.

The reference's per-frame hot loop is: decode -> SAT build -> (pace) ->
gaze-sample -> encode on the server (reference: src/video_server.cc:287-427)
and decode -> unwarp -> render on the client (src/video_client.cc:275-366).
foveax packages the device portions as jitted, shape-static functions:

    foveate(frame, center)          server-side SAT build + sample
    sample(sat, center)             sample only (SAT built once per frame)
    unwarp(reduced, center)         client-side inverse
    roundtrip(frame, center)        foveate + unwarp (quality studies; the
                                    analog of `foveate_no_encoding`,
                                    reference: src/run_satlogrectilinear.cc:857-959)
    foveate_batch(frame, centers)   one SAT, N gazes — the multi-client
                                    batched launch (vmap over gaze)

Gaze centers are traced scalars: a moving gaze never recompiles.  All
functions are compiled once per (source, reduced) shape pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from foveax.config import FoveaxConfig
from foveax.core.direct import sample_rect_direct
from foveax.core.logrect import LogRectGrid, make_grid
from foveax.core.sample import sample_rect_from_sat
from foveax.core.sat import build_sat
from foveax.core.unwarp import unwarp_rect


class FoveationPipeline:
    """Compiled pipeline for one (source, reduced) shape configuration.

    This is the TPU analog of the reference's per-connection engine bundle
    (OpenCLManager + SATEncoder + SATDecoder + grid, reference:
    src/video_server.h:33-54) — except engines here are stateless compiled
    functions and ONE pipeline instance is safely shared by any number of
    connections (the grid is a device constant; there is no per-connection
    GPU context).
    """

    def __init__(
        self,
        config: FoveaxConfig | None = None,
        *,
        wrap_x: bool = True,
        use_pallas: bool | None = None,
        sampler: str = "auto",
    ):
        """``sampler``: "sat" (build SAT then 4-tap sample), "direct"
        (SAT-free banded sampler, foveax/core/direct.py), "fused"
        (SAT-free Pallas segment-reduce kernels,
        foveax/kernels/segreduce.py; interpret-mode on CPU), or "auto" —
        on accelerator backends: fused at every production shape (the
        round-4 on-chip stage table: fused wins the sample at 1080p
        1.73 vs direct 2.4 ms, at 4K 1.46 vs 2.57, at 8K 4.22 vs the
        SAT pair's 7.1, and carries the 16K full path 19 → 56 fps —
        the round-3 "fused can't compile ≥4K" gates were the tunnel
        wedge, falsified by the round-4 cold-cache bisect); SAT on CPU
        (interpret-mode Pallas).  All are bit-identical; batch
        (multi-gaze) paths resolve their own auto in batch_pair.  An
        auto-picked fused that fails the kernel's structural shape
        contract degrades to SAT at trace time."""
        self.config = config or FoveaxConfig()
        cfg = self.config
        self.grid: LogRectGrid = make_grid(
            cfg.reduced_width, cfg.reduced_height, cfg.source_width, cfg.source_height
        )
        self._wrap_x = wrap_x

        grid = self.grid
        sw, sh = cfg.source_width, cfg.source_height

        # Pallas single-pass SAT kernel where supported (TPU backend,
        # lane-aligned width); XLA cumsum otherwise.
        if use_pallas is None:
            use_pallas = (
                jax.default_backend() != "cpu" and sw % 128 == 0 and sh % 8 == 0
            )
        self.use_pallas = use_pallas
        if use_pallas:
            from foveax.kernels.scan2d import build_sat_pallas

            _build = build_sat_pallas

            def _build_chw(frame_chw):
                return build_sat_pallas(frame_chw, in_layout="chw")
        else:
            _build = build_sat

            def _build_chw(frame_chw):
                return build_sat(frame_chw.transpose(1, 2, 0))

        def _sample(sat, center):
            return sample_rect_from_sat(sat, grid, center, wrap_x=wrap_x)

        auto_fused = False
        if sampler == "auto":
            if jax.default_backend() == "cpu":
                sampler = "sat"
            else:
                # Round-4 measured policy: the fused segment-reduce
                # sampler wins at EVERY production shape (stage table,
                # BENCHMARKS.md round 4) now that the round-3 "compile
                # cliff" is root-caused as the tunnel wedge.  Ineligible
                # shapes degrade to the SAT pair at trace time.
                sampler, auto_fused = "fused", True
        self.sampler = sampler
        if sampler == "fused":
            from foveax.kernels.segreduce import sample_rect_fused

            # Mosaic lowering needs the real TPU backend; the CPU
            # backend runs the kernels in interpret mode (tests).
            _fused_interpret = jax.default_backend() == "cpu"

        def _foveate(frame, center):
            if sampler == "direct":
                return sample_rect_direct(
                    frame, grid, center, wrap_x=wrap_x, in_layout="hwc"
                )
            if sampler == "fused":
                try:
                    return sample_rect_fused(
                        frame, grid, center, wrap_x=wrap_x, in_layout="hwc",
                        interpret=_fused_interpret,
                    )
                except ValueError:
                    # Outside the kernel's structural shape contract:
                    # honor an explicit request loudly, degrade an auto
                    # pick to the always-eligible SAT pair.
                    if not auto_fused:
                        raise
            return _sample(_build(frame), center)

        def _unwarp(reduced, center):
            return unwarp_rect(reduced, sw, sh, center)

        # Client-latency variant: backend-tuned precision ("mm" on TPU,
        # "fast" on CPU), <= 1 LSB of exact, fovea bit-exact.  The
        # default `unwarp`/`roundtrip` keep the exact path — quality
        # studies report against it.
        def _unwarp_auto(reduced, center):
            return unwarp_rect(reduced, sw, sh, center, precision="auto")

        def _roundtrip(frame, center):
            reduced = _foveate(frame, center)
            return reduced, _unwarp(reduced, center)

        # Channel-planar (3, H, W) variants — the TPU-preferred layout for
        # the device-resident hot path (no size-3 lane axis, no boundary
        # transposes between stages).
        def _sample_chw(sat, center):
            return sample_rect_from_sat(
                sat, grid, center, wrap_x=wrap_x, out_layout="chw"
            )

        def _foveate_chw(frame, center):
            # frame is channel-planar (3, H, W) here — the builders'
            # default hwc layout would silently mis-read it.
            if sampler == "direct":
                return sample_rect_direct(
                    frame, grid, center, wrap_x=wrap_x, out_layout="chw"
                )
            if sampler == "fused":
                try:
                    return sample_rect_fused(
                        frame, grid, center, wrap_x=wrap_x, out_layout="chw",
                        interpret=_fused_interpret,
                    )
                except ValueError:
                    # Same degrade contract as _foveate: honor an explicit
                    # request loudly, degrade an auto pick to the SAT pair.
                    if not auto_fused:
                        raise
            return _sample_chw(_build_chw(frame), center)

        def _unwarp_chw(reduced_chw, center):
            return unwarp_rect(
                reduced_chw, sw, sh, center, in_layout="chw", out_layout="chw"
            )

        def _roundtrip_chw(frame, center):
            reduced = _foveate_chw(frame, center)
            return reduced, _unwarp_chw(reduced, center)

        def _foveate_batch(frame, centers):
            sat = _build(frame)
            return jax.vmap(lambda c: _sample(sat, c))(centers)

        # SAT-free batch variants (round 4): the SAT batch amortizes one
        # build but its vmapped gather sampling set the measured
        # 48-client knee; these trade the amortization for gather-free
        # streaming access per gaze (see sample_rect_direct_batch).
        def _sample_batch_direct(frame, centers):
            from foveax.core.direct import sample_rect_direct_batch

            return sample_rect_direct_batch(
                frame, grid, centers, wrap_x=wrap_x, in_layout="hwc"
            )

        def _sample_batch_fused(frame, centers):
            from foveax.kernels.segreduce import sample_rect_fused_batch

            return sample_rect_fused_batch(
                frame, grid, centers, wrap_x=wrap_x, in_layout="hwc",
                interpret=jax.default_backend() == "cpu",
            )

        def _roundtrip_batch(frame, centers):
            sat = _build(frame)

            def per_client(c):
                reduced = _sample(sat, c)
                return reduced, _unwarp(reduced, c)

            return jax.vmap(per_client)(centers)

        self.build_sat = jax.jit(_build)
        self.sample = jax.jit(_sample)
        # One SAT, a batch of gazes — the multi-client launch.  Compiled
        # per batch size; callers should pad to slot sizes to bound
        # recompiles.
        self.sample_batch = jax.jit(jax.vmap(_sample, in_axes=(None, 0)))
        self.sample_batch_direct = jax.jit(_sample_batch_direct)
        self.sample_batch_fused = jax.jit(_sample_batch_fused)
        self.foveate = jax.jit(_foveate)
        self.unwarp = jax.jit(_unwarp)
        self.unwarp_auto = jax.jit(_unwarp_auto)
        self.roundtrip = jax.jit(_roundtrip)
        self.foveate_batch = jax.jit(_foveate_batch)
        self.roundtrip_batch = jax.jit(_roundtrip_batch)
        self.sample_chw = jax.jit(_sample_chw)
        self.foveate_chw = jax.jit(_foveate_chw)
        self.unwarp_chw = jax.jit(_unwarp_chw)
        self.roundtrip_chw = jax.jit(_roundtrip_chw)

    # -- convenience -------------------------------------------------------

    def _fused_batch_eligible(self) -> bool:
        """Cached structural-eligibility probe for the fused batch
        sampler (shared fused_eligible, eval_shape only — no compile, no
        device) so an ineligible shape resolves auto to "sat" up front
        instead of raising mid-tick inside the serve loop."""
        cached = getattr(self, "_fused_ok", None)
        if cached is None:
            from foveax.kernels.segreduce import fused_eligible

            cfg = self.config
            cached = fused_eligible(
                self.grid,
                cfg.source_height,
                cfg.source_width,
                wrap_x=self._wrap_x,
                batch=True,
            )
            self._fused_ok = cached
        return cached

    def batch_pair(self, batch_sampler: str = "auto"):
        """The serve tick's device pair ``(prepare, sample_batch)``:
        ``prepare(frame_hwc)`` runs once per source frame,
        ``sample_batch(prepared, centers)`` once per member batch.

        "sat" amortizes one SAT build across the batch (the round-2
        serving design); "direct"/"fused" skip the SAT entirely —
        prepare is the identity (the staged frame IS the prepared
        state) and sampling is gather-free per gaze (the measured
        48-client knee was gather-bound).  All three are bit-identical.
        "auto": fused on accelerator backends where the shape is
        eligible — the round-4 on-chip sweep has it dominating past 16
        members (32 gazes: 4.40 ms vs the SAT batch's 13.11, 48: 8.44
        vs 19.90) and within noise below — "sat" on CPU (interpret-mode
        Pallas loses the amortization) or ineligible shapes.
        """
        if batch_sampler == "auto":
            batch_sampler = (
                "fused"
                if jax.default_backend() != "cpu" and self._fused_batch_eligible()
                else "sat"
            )
        if batch_sampler == "sat":
            return self.build_sat, self.sample_batch
        if batch_sampler == "direct":
            return _identity_jit, self.sample_batch_direct
        if batch_sampler == "fused":
            return _identity_jit, self.sample_batch_fused
        raise ValueError(f"unknown batch_sampler {batch_sampler!r}")

    def single_pair(self):
        """(prepare, sample) for the single-session serve loop: the SAT
        pair when this pipeline's resolved sampler is "sat" (prepare the
        SAT eagerly, sample at the gaze-late tick), else (stage,
        foveate) — the SAT-free samplers have no gaze-independent
        prepare stage, so all device work runs gaze-late."""
        if self.sampler == "sat":
            return self.build_sat, self.sample
        return _identity_jit, self.foveate

    def center(self, cx: float, cy: float) -> jax.Array:
        return jnp.asarray([cx, cy], dtype=jnp.float32)

    @property
    def reduced_shape(self) -> tuple[int, int, int]:
        return (self.config.reduced_height, self.config.reduced_width, 3)

    @property
    def source_shape(self) -> tuple[int, int, int]:
        return (self.config.source_height, self.config.source_width, 3)


@jax.jit
def _identity_jit(frame):
    # "prepare" of the SAT-free batch pairs: just stage the frame (the
    # jit device-puts and keeps the executor-call shape of build_sat).
    return frame


@functools.lru_cache(maxsize=8)
def default_pipeline() -> FoveationPipeline:
    return FoveationPipeline()
