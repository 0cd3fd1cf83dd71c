"""The README's library example must stay runnable verbatim."""

import numpy as np


def test_readme_library_snippet(small_frame):
    import jax.numpy as jnp

    from foveax import FoveaxConfig
    from foveax.pipeline import FoveationPipeline

    frame = jnp.asarray(
        np.broadcast_to(small_frame, (64, 96, 3))
    )  # stand-in for a decoded frame
    cfg = FoveaxConfig(
        source_width=96, source_height=64, reduced_width=48, reduced_height=32
    )
    p = FoveationPipeline(cfg)
    reduced, restored = p.roundtrip(frame, p.center(0.42, 0.5))
    centers = jnp.asarray([[0.2, 0.3], [0.8, 0.7]], jnp.float32)
    batch = p.foveate_batch(frame, centers)
    assert reduced.shape == (32, 48, 3)
    assert restored.shape == (64, 96, 3)
    assert batch.shape == (2, 32, 48, 3)
