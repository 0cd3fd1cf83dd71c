"""Pipeline layer: jitted functions, vmap batching, no per-gaze recompiles."""

import jax.numpy as jnp
import numpy as np

from foveax.config import FoveaxConfig
from foveax.pipeline import FoveationPipeline

CFG = FoveaxConfig(
    source_width=96, source_height=64, reduced_width=48, reduced_height=32
)


def test_shapes_and_roundtrip(small_frame):
    p = FoveationPipeline(CFG)
    frame = jnp.asarray(small_frame)
    c = p.center(0.5, 0.5)
    reduced, restored = p.roundtrip(frame, c)
    assert reduced.shape == (32, 48, 3)
    assert restored.shape == (64, 96, 3)
    # Fovea pixels survive exactly.
    np.testing.assert_array_equal(
        np.asarray(restored)[30:34, 46:50], small_frame[30:34, 46:50]
    )


def test_foveate_equals_sample_of_sat(small_frame):
    p = FoveationPipeline(CFG)
    frame = jnp.asarray(small_frame)
    c = p.center(0.3, 0.7)
    sat = p.build_sat(frame)
    np.testing.assert_array_equal(
        np.asarray(p.foveate(frame, c)), np.asarray(p.sample(sat, c))
    )


def test_batch_matches_loop(small_frame):
    p = FoveationPipeline(CFG)
    frame = jnp.asarray(small_frame)
    centers = jnp.asarray(
        [[0.5, 0.5], [0.2, 0.3], [0.8, 0.9], [0.05, 0.5]], dtype=jnp.float32
    )
    batch = np.asarray(p.foveate_batch(frame, centers))
    assert batch.shape == (4, 32, 48, 3)
    for i in range(4):
        single = np.asarray(p.foveate(frame, centers[i]))
        np.testing.assert_array_equal(batch[i], single)


def test_no_recompile_across_gazes(small_frame):
    p = FoveationPipeline(CFG)
    frame = jnp.asarray(small_frame)
    p.roundtrip(frame, p.center(0.5, 0.5))
    n0 = p.roundtrip._cache_size()
    for c in [(0.1, 0.1), (0.9, 0.9), (0.33, 0.66)]:
        p.roundtrip(frame, p.center(*c))
    assert p.roundtrip._cache_size() == n0


def test_fused_sampler_pipeline_matches_sat():
    """sampler="fused" (Pallas segment-reduce, interpret-mode on CPU) is
    bit-identical to the SAT pipeline.  Needs a lane-aligned source width
    (the kernels' width-block rule), hence a separate config."""
    cfg = FoveaxConfig(
        source_width=256, source_height=64, reduced_width=128, reduced_height=32
    )
    rng = np.random.default_rng(11)
    frame = jnp.asarray(rng.integers(0, 256, (64, 256, 3), np.uint8))
    p_sat = FoveationPipeline(cfg, sampler="sat")
    p_fus = FoveationPipeline(cfg, sampler="fused")
    for c in [(0.5, 0.5), (0.03, 0.9), (1.0, 0.0)]:
        cj = p_sat.center(*c)
        np.testing.assert_array_equal(
            np.asarray(p_sat.foveate(frame, cj)),
            np.asarray(p_fus.foveate(frame, cj)),
        )
        np.testing.assert_array_equal(
            np.asarray(p_sat.foveate_chw(frame.transpose(2, 0, 1), cj)),
            np.asarray(p_fus.foveate_chw(frame.transpose(2, 0, 1), cj)),
        )


def test_direct_sampler_pipeline_matches_sat(small_frame):
    """sampler="direct" is bit-identical to the SAT pipeline (the TPU
    auto-selection at <= 4K must be behavior-invisible)."""
    import numpy as np

    p_sat = FoveationPipeline(CFG, sampler="sat")
    p_dir = FoveationPipeline(CFG, sampler="direct")
    frame = jnp.asarray(small_frame)
    for c in [(0.5, 0.5), (0.03, 0.9), (1.0, 0.0)]:
        cj = p_sat.center(*c)
        np.testing.assert_array_equal(
            np.asarray(p_sat.foveate(frame, cj)),
            np.asarray(p_dir.foveate(frame, cj)),
        )
        np.testing.assert_array_equal(
            np.asarray(p_sat.foveate_chw(frame.transpose(2, 0, 1), cj)),
            np.asarray(p_dir.foveate_chw(frame.transpose(2, 0, 1), cj)),
        )


def test_auto_policies_resolve_sat_on_cpu():
    """On the CPU backend every auto resolves to the XLA SAT paths
    (interpret-mode Pallas loses outright there)."""
    p = FoveationPipeline(CFG, sampler="auto")
    assert p.sampler == "sat"
    prepare, sample_b = p.batch_pair("auto")
    assert prepare is p.build_sat and sample_b is p.sample_batch


def test_auto_policies_resolve_fused_on_accelerator(monkeypatch):
    """On an accelerator backend (round-4 measured policy) auto picks the
    fused pair; batch auto additionally gates on the eval_shape
    structural-eligibility probe so an ineligible shape lands on SAT up
    front, never as a mid-tick trace error."""
    import jax

    from foveax.pipeline import frames as frames_mod

    monkeypatch.setattr(frames_mod.jax, "default_backend", lambda: "tpu")

    # Eligible shape (lane-aligned width): single and batch both fused.
    cfg = FoveaxConfig(
        source_width=256, source_height=64, reduced_width=128, reduced_height=32
    )
    p = FoveationPipeline(cfg, sampler="auto")
    assert p.sampler == "fused"
    prepare, sample_b = p.batch_pair("auto")
    assert sample_b is p.sample_batch_fused
    assert p._fused_ok is True  # probe ran and cached

    # Ineligible shape (96-wide fails the kernel's width-block contract):
    # batch auto degrades to the SAT pair via the probe, and the
    # auto-picked single-gaze fused degrades to SAT at trace time with
    # bit-identical output.
    p2 = FoveationPipeline(CFG, sampler="auto")
    assert p2.sampler == "fused"  # picked, but degrades at trace time
    prepare2, sample_b2 = p2.batch_pair("auto")
    assert prepare2 is p2.build_sat and sample_b2 is p2.sample_batch
    assert p2._fused_ok is False


def test_auto_pick_degrades_bit_identically(small_frame, monkeypatch):
    """An auto-picked fused sampler on a structurally ineligible shape
    must fall back to the SAT pair with bit-identical results (the
    degrade path in _foveate/_foveate_chw), not raise."""
    from foveax.pipeline import frames as frames_mod

    monkeypatch.setattr(frames_mod.jax, "default_backend", lambda: "tpu")
    p_auto = FoveationPipeline(CFG, sampler="auto")
    p_sat = FoveationPipeline(CFG, sampler="sat")
    frame = jnp.asarray(small_frame)
    cj = p_sat.center(0.3, 0.7)
    np.testing.assert_array_equal(
        np.asarray(p_auto.foveate(frame, cj)),
        np.asarray(p_sat.foveate(frame, cj)),
    )
    np.testing.assert_array_equal(
        np.asarray(p_auto.foveate_chw(frame.transpose(2, 0, 1), cj)),
        np.asarray(p_sat.foveate_chw(frame.transpose(2, 0, 1), cj)),
    )


def test_single_pair_resolution(small_frame):
    """single_pair (the serve loop's prepare/sample split): SAT
    pipelines keep the eager build + gaze-late sample; SAT-free
    pipelines get an identity prepare (stage only) with all device work
    gaze-late — and both halves compose to the identical reduced
    frame."""
    p_sat = FoveationPipeline(CFG, sampler="sat")
    prepare, sample_one = p_sat.single_pair()
    assert prepare is p_sat.build_sat and sample_one is p_sat.sample
    frame = jnp.asarray(small_frame)
    c = p_sat.center(0.4, 0.6)
    want = np.asarray(sample_one(prepare(frame), c))

    p_direct = FoveationPipeline(CFG, sampler="direct")
    prepare_d, sample_d = p_direct.single_pair()
    assert sample_d is p_direct.foveate
    staged = prepare_d(frame)
    np.testing.assert_array_equal(np.asarray(staged), small_frame)
    np.testing.assert_array_equal(np.asarray(sample_d(staged, c)), want)
