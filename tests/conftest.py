"""Test configuration: force an 8-device virtual CPU platform so sharding
tests run without TPU hardware and all kernel tests exercise the same code
paths CI would.

Note: env vars (JAX_PLATFORMS / XLA_FLAGS) are NOT sufficient in this
sandbox — the TPU-tunnel site hook calls jax.config.update("jax_platforms",
...) at interpreter start, so we must override via jax.config too.

TPU-parity lane: ``FOVEAX_TPU_TESTS=1 pytest -m tpu tests/`` keeps the
real backend (the tunnel admits ONE process — run it alone, not alongside
a server/bench) and runs only the ``@pytest.mark.tpu`` hardware-parity
tests; the default run forces CPU and skips them.
"""

import os

TPU_LANE = os.environ.get("FOVEAX_TPU_TESTS") == "1"

if not TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# Persistent compilation cache: compiles are slow in this sandbox; caching
# makes repeat test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/foveax_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    on_accel = TPU_LANE and jax.default_backend() != "cpu"
    skip_tpu = pytest.mark.skip(
        reason="TPU-parity lane: run FOVEAX_TPU_TESTS=1 pytest -m tpu "
        "with the real backend (alone — the tunnel admits one process)"
    )
    skip_cpu_only = pytest.mark.skip(
        reason="CPU-lane test skipped in the TPU-parity lane"
    )
    for item in items:
        if item.get_closest_marker("tpu"):
            if not on_accel:
                item.add_marker(skip_tpu)
        elif TPU_LANE:
            # The TPU lane runs ONLY the hardware-parity tests: the rest
            # assume 8 virtual CPU devices and must not monopolize the
            # single-process tunnel for minutes.
            item.add_marker(skip_cpu_only)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def small_frame(rng):
    """A 96x64 RGB uint8 frame with structure (gradients + noise)."""
    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w]
    frame = np.stack(
        [
            (xx * 255 // w),
            (yy * 255 // h),
            ((xx + yy) * 255 // (w + h)),
        ],
        axis=-1,
    ).astype(np.uint8)
    noise = rng.integers(0, 32, size=frame.shape, dtype=np.uint8)
    return np.clip(frame.astype(np.int32) + noise, 0, 255).astype(np.uint8)
