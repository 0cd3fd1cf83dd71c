"""Test configuration: force an 8-device virtual CPU platform so sharding
tests run without TPU hardware and all kernel tests exercise the same code
paths CI would.

Note: env vars (JAX_PLATFORMS / XLA_FLAGS) are NOT sufficient in this
sandbox — the TPU-tunnel site hook calls jax.config.update("jax_platforms",
...) at interpreter start, so we must override via jax.config too.
"""

import os

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

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


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
