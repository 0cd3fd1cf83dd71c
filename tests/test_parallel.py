"""Mesh sharding: blocked SAT scan with carry exchange, multi-client step.
Runs on the 8-device virtual CPU mesh from conftest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from foveax.core.logrect import make_grid
from foveax.core.sample import sample_rect_from_sat
from foveax.core.sat import build_sat
from foveax.core.unwarp import unwarp_rect
from foveax.parallel import make_mesh, multi_client_step, sharded_build_sat


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(n_space=8, n_data=1)


@pytest.fixture(scope="module")
def mesh2x4():
    return make_mesh(n_space=4, n_data=2)


def test_sharded_sat_matches_single_device(small_frame, mesh8):
    frame = jnp.asarray(small_frame)
    ref = np.asarray(build_sat(frame))
    sharded = np.asarray(sharded_build_sat(frame, mesh8))
    np.testing.assert_array_equal(sharded, ref)


def test_sharded_sat_on_2d_mesh(small_frame, mesh2x4):
    frame = jnp.asarray(small_frame)
    ref = np.asarray(build_sat(frame))
    sharded = np.asarray(sharded_build_sat(frame, mesh2x4))
    np.testing.assert_array_equal(sharded, ref)


def test_multi_client_step_matches_local(small_frame, mesh2x4):
    h, w, _ = small_frame.shape
    grid = make_grid(48, 32, w, h)
    frame = jnp.asarray(small_frame)
    centers = jnp.asarray(
        [[0.5, 0.5], [0.25, 0.75], [0.9, 0.1], [0.1, 0.9]], dtype=jnp.float32
    )
    reduced, restored = multi_client_step(frame, centers, grid, mesh2x4)
    assert reduced.shape == (4, 32, 48, 3)
    assert restored.shape == (4, h, w, 3)

    sat = build_sat(frame)
    for i in range(4):
        r_ref = sample_rect_from_sat(sat, grid, centers[i])
        np.testing.assert_array_equal(np.asarray(reduced[i]), np.asarray(r_ref))
        u_ref = unwarp_rect(r_ref, w, h, centers[i])
        np.testing.assert_array_equal(np.asarray(restored[i]), np.asarray(u_ref))


def test_multi_client_step_jits(small_frame, mesh2x4):
    h, w, _ = small_frame.shape
    grid = make_grid(48, 32, w, h)
    frame = jnp.asarray(small_frame)
    centers = jnp.zeros((2, 2), dtype=jnp.float32) + 0.5
    fn = jax.jit(
        lambda f, c: multi_client_step(f, c, grid, mesh2x4, unwarp=False)
    )
    (reduced,) = fn(frame, centers)
    assert reduced.shape == (2, 32, 48, 3)


def test_frame_parallel_roundtrip(small_frame, mesh2x4):
    from foveax.parallel import frame_parallel_roundtrip

    h, w, _ = small_frame.shape
    grid = make_grid(48, 32, w, h)
    rng2 = np.random.default_rng(3)
    frames = jnp.asarray(
        np.stack([np.roll(small_frame, i * 5, axis=1) for i in range(8)])
    )
    centers = jnp.asarray(rng2.uniform(0.2, 0.8, (8, 2)).astype(np.float32))
    reduced, restored = frame_parallel_roundtrip(frames, centers, grid, mesh2x4)
    assert reduced.shape == (8, 32, 48, 3)
    assert restored.shape == (8, h, w, 3)
    # Parity with the unsharded path for one frame.
    sat = build_sat(frames[3])
    ref = sample_rect_from_sat(sat, grid, centers[3])
    np.testing.assert_array_equal(np.asarray(reduced[3]), np.asarray(ref))
    ref_u = unwarp_rect(ref, w, h, centers[3])
    np.testing.assert_array_equal(np.asarray(restored[3]), np.asarray(ref_u))


def test_sharded_serve_parts_match_local(small_frame, mesh2x4):
    """The split build/sample closures (the broadcast server's sharded
    mode) must reproduce the single-device pipeline exactly — integer
    SAT math end to end."""
    from foveax.parallel.sharded import jit_serve_parts

    h, w, _ = small_frame.shape
    grid = make_grid(48, 32, w, h)
    build, sample = jit_serve_parts(grid, mesh2x4)
    frame = jnp.asarray(small_frame)
    centers = jnp.asarray(
        [[0.5, 0.5], [0.25, 0.75], [0.9, 0.1], [0.02, 0.97]], dtype=jnp.float32
    )
    sat_sharded = build(frame)
    reduced = np.asarray(sample(sat_sharded, centers))
    assert reduced.shape == (4, 32, 48, 3)

    sat = build_sat(frame)
    for i in range(4):
        ref = np.asarray(sample_rect_from_sat(sat, grid, centers[i]))
        np.testing.assert_array_equal(reduced[i], ref)


def test_broadcast_serve_with_mesh(small_frame):
    """End-to-end loopback: broadcast server with a (2, 4) mesh serves
    two clients; frames arrive and decode (ROADMAP scale-out item — the
    client batch sharded over `data`, the SAT scan over `space`)."""
    import asyncio
    import socket

    from foveax.config import FoveaxConfig
    from foveax.parallel import make_mesh
    from foveax.serve.client import FoveaxClient
    from foveax.serve.server import FoveaxServer

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    cfg = FoveaxConfig(
        source_width=96, source_height=64, reduced_width=48, reduced_height=32
    )
    server = FoveaxServer(
        cfg, max_frames=8, broadcast=True, mesh=make_mesh(n_space=4, n_data=2)
    )

    def make_client(gx):
        return FoveaxClient(
            f"ws://127.0.0.1:{port}",
            video="synthetic://96x64@30/20",
            config=cfg,
            gaze_source=lambda i: (gx, 0.5),
            max_frames=4,
        )

    async def main():
        import websockets

        clients = [make_client(0.3), make_client(0.7)]
        async with websockets.serve(
            server.handle, "127.0.0.1", port, max_size=64 * 1024 * 1024
        ):
            return await asyncio.wait_for(
                asyncio.gather(*(c.run() for c in clients)), timeout=120
            )

    stats = asyncio.run(main())
    assert all(s.frames == 4 for s in stats)


def test_sharded_fused_batch_matches_sat(mesh2x4):
    """The round-4 fused knee path sharded over ``data``: bit-identical
    to the single-device SAT reference at every gaze.  The frame is
    replicated (crosses ICI once at placement, not per tick) and each
    data shard samples its local gaze batch gather-free with zero
    per-tick collectives — the multi-chip extension of the measured
    192-clients-per-chip serving point."""
    from foveax.kernels.segreduce import fused_eligible
    from foveax.parallel import sharded_sample_batch_fused

    rng = np.random.default_rng(11)
    frame_np = rng.integers(0, 256, (64, 256, 3), np.uint8)
    grid = make_grid(128, 32, 256, 64)
    assert fused_eligible(grid, 64, 256, batch=True)
    frame = jnp.asarray(frame_np)
    centers = jnp.asarray(
        rng.uniform(0.05, 0.95, (4, 2)).astype(np.float32)
    )
    fn = jax.jit(
        lambda f, c: sharded_sample_batch_fused(f, c, grid, mesh2x4)
    )
    out = np.asarray(fn(frame, centers))
    sat = build_sat(frame)
    assert out.shape == (4, 32, 128, 3)
    for i in range(4):
        np.testing.assert_array_equal(
            out[i], np.asarray(sample_rect_from_sat(sat, grid, centers[i]))
        )


def test_broadcast_serve_with_mesh_fused(small_frame):
    """End-to-end loopback: broadcast server with a (2, 4) mesh and an
    explicit --batch-sampler fused serves two clients through the
    SAT-free data-parallel pair (jit_serve_parts_fused) — the fused
    source must satisfy the kernels' structural contract, hence the
    256-wide source."""
    import asyncio
    import socket

    from foveax.config import FoveaxConfig
    from foveax.parallel import make_mesh
    from foveax.serve.client import FoveaxClient
    from foveax.serve.server import FoveaxServer

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    cfg = FoveaxConfig(
        source_width=256,
        source_height=64,
        reduced_width=128,
        reduced_height=32,
    )
    server = FoveaxServer(
        cfg,
        max_frames=8,
        broadcast=True,
        mesh=make_mesh(n_space=4, n_data=2),
        batch_sampler="fused",
    )

    def make_client(gx):
        return FoveaxClient(
            f"ws://127.0.0.1:{port}",
            video="synthetic://256x64@30/20",
            config=cfg,
            gaze_source=lambda i: (gx, 0.5),
            max_frames=4,
        )

    async def main():
        import websockets

        clients = [make_client(0.3), make_client(0.7)]
        async with websockets.serve(
            server.handle, "127.0.0.1", port, max_size=64 * 1024 * 1024
        ):
            return await asyncio.wait_for(
                asyncio.gather(*(c.run() for c in clients)), timeout=120
            )

    stats = asyncio.run(main())
    assert all(s.frames == 4 for s in stats)
