"""The five staged validation configs (BASELINE.md "Rebuild targets").

  1. single 1080p frame log-rectilinear warp at a fixed gaze
  2. SAT encode -> decode round-trip (exact)
  3. 30 fps 1080p streaming with a dynamic gaze trace, recompile-free
  4. 4K full path: SAT -> sample -> unwarp -> gnomonic viewport
     (>= 60 fps target)
  5. 8 concurrent gaze streams batched in one fused launch on 4K frames

Run: ``python -m foveax.cli.main stages``.  Prints one PASS/FAIL line per
stage plus the measured numbers.
"""

from __future__ import annotations

import asyncio
import socket
import time

import numpy as np


def _result(name: str, ok: bool, detail: str, *, partial: bool = False) -> bool:
    """``partial`` marks a pass whose perf claim could not be measured in
    this environment (parity still verified) — rendered distinctly so a
    PASS line never overstates what was checked."""
    status = "FAIL" if not ok else ("PASS*" if partial else "PASS")
    print(f"[{status}] {name}: {detail}")
    return ok


def stage1_single_frame_warp() -> bool:
    import jax.numpy as jnp

    from foveax.config import FoveaxConfig
    from foveax.pipeline.frames import FoveationPipeline

    cfg = FoveaxConfig()
    p = FoveationPipeline(cfg)
    rng = np.random.default_rng(1)
    frame = rng.integers(0, 256, (1080, 1920, 3), np.uint8)
    t0 = time.perf_counter()
    reduced = np.asarray(p.foveate(jnp.asarray(frame), p.center(0.37, 0.61)))
    dt = time.perf_counter() - t0
    ok = reduced.shape == (608, 1072, 3) and reduced.any()
    return _result(
        "stage1 single-frame warp", ok, f"1080p->1072x608 in {dt:.1f}s (cold)"
    )


def stage2_sat_roundtrip() -> bool:
    import jax.numpy as jnp

    from foveax.core.sat import build_sat, decode_sat

    rng = np.random.default_rng(2)
    frame = rng.integers(0, 256, (1080, 1920, 3), np.uint8)
    back = np.asarray(decode_sat(build_sat(jnp.asarray(frame))))
    ok = np.array_equal(back, frame)
    return _result("stage2 SAT round-trip", ok, "exact uint32 reconstruction")


def stage3_streaming_dynamic_gaze() -> bool:
    import websockets

    from foveax.config import FoveaxConfig
    from foveax.serve.client import FoveaxClient
    from foveax.serve.server import FoveaxServer

    cfg = FoveaxConfig()
    # Bind the listening socket ourselves and hand it to websockets.serve:
    # probing a free port and rebinding it is a TOCTOU race.
    lsock = socket.socket()
    lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    lsock.bind(("127.0.0.1", 0))
    port = lsock.getsockname()[1]

    n_frames = 30
    server = FoveaxServer(cfg, max_frames=n_frames + 5)
    gaze_trace = [(0.3 + 0.01 * i, 0.5 + 0.005 * i) for i in range(64)]
    client = FoveaxClient(
        f"ws://127.0.0.1:{port}",
        video=f"synthetic://1920x1080@30/{n_frames + 5}",
        config=cfg,
        gaze_source=lambda i: gaze_trace[i % len(gaze_trace)],
        max_frames=n_frames,
    )

    async def main():
        async with websockets.serve(
            server.handle, sock=lsock, max_size=64 * 1024 * 1024
        ):
            return await asyncio.wait_for(client.run(), timeout=600)

    # Recompile-free check: the sample function's jit cache must not grow
    # while the gaze moves.
    pipeline = server._pipeline_for(1920, 1080)
    stats = asyncio.run(main())
    n_compiles = pipeline.sample._cache_size()
    a = stats.averages()
    ok = stats.frames == n_frames and n_compiles <= 1
    return _result(
        "stage3 30fps 1080p dynamic-gaze stream",
        ok,
        f"{stats.frames} frames, {n_compiles} sample compile(s), "
        f"recv {a['avg_receive_ms']:.1f}ms unwarp {a['avg_unwarp_ms']:.1f}ms",
    )


def stage4_4k_full_path() -> bool:
    import jax
    import jax.numpy as jnp

    from foveax.config import reduced_dim
    from foveax.core.logrect import make_grid
    from foveax.core.sample import sample_rect_from_sat
    from foveax.core.unwarp import unwarp_rect

    w, h = 3840, 2160
    grid = make_grid(reduced_dim(w), reduced_dim(h), w, h)
    use_pallas = jax.default_backend() != "cpu"
    if use_pallas:
        from foveax.kernels.scan2d import build_sat_pallas as build
    else:
        from foveax.core.sat import build_sat as build

    from foveax.core.gnomonic import gnomonic_project

    @jax.jit
    def step(f, c):
        sat = build(f, in_layout="chw") if use_pallas else build(
            f.transpose(1, 2, 0)
        )
        red = sample_rect_from_sat(sat, grid, c, out_layout="chw")
        restored = unwarp_rect(
            red, w, h, c, in_layout="chw", out_layout="chw", precision="auto"
        )
        # BASELINE config 4 includes the viewport projection stage.
        view = gnomonic_project(restored.transpose(1, 2, 0), 1920, 1080, c)
        return restored, view

    rng = np.random.default_rng(4)
    frame = jax.device_put(rng.integers(0, 256, (3, h, w), np.uint8))
    centers = [
        jax.device_put(np.asarray([0.3 + 0.01 * i, 0.5], np.float32))
        for i in range(26)
    ]

    def chain(n):
        y = frame
        view = None
        t0 = time.perf_counter()
        for i in range(n):
            y, view = step(y, centers[i])
        float(jnp.sum(view.astype(jnp.uint32)))
        return time.perf_counter() - t0

    chain(2)
    base = chain(2)
    total = chain(22)
    fps = 20 / max(total - base, 1e-9)
    # The >=60 fps target applies on TPU; CPU runs just check execution.
    ok = fps >= 60.0 if jax.default_backend() != "cpu" else fps > 0
    return _result(
        "stage4 4K full path (incl. viewport projection)",
        ok,
        f"{fps:.1f} fps (target >= 60 on TPU)",
    )


def stage5_batched_clients(n_clients: int = 8) -> bool:
    import jax
    import jax.numpy as jnp

    from foveax.config import FoveaxConfig
    from foveax.pipeline.frames import FoveationPipeline

    # BASELINE config 5 batches gaze streams over 4K frames.
    cfg = FoveaxConfig().with_source(3840, 2160)
    p = FoveationPipeline(cfg)
    rng = np.random.default_rng(5)
    frame = jnp.asarray(rng.integers(0, 256, (2160, 3840, 3), np.uint8))
    centers = jnp.asarray(
        rng.uniform(0.1, 0.9, (n_clients, 2)).astype(np.float32)
    )
    batch = p.foveate_batch(frame, centers)
    batch_np = np.asarray(batch)
    ok = batch_np.shape == (n_clients, 1200, 2144, 3)
    # Parity with per-client launches.
    for i in range(n_clients):
        single = np.asarray(p.foveate(frame, centers[i]))
        if not np.array_equal(batch_np[i], single):
            ok = False
            break

    def chain(n):
        cs = centers
        t0 = time.perf_counter()
        b = batch
        for _ in range(n):
            b = p.foveate_batch(frame, cs)
            cs = jnp.remainder(
                cs + b[0, 0, 0, 0].astype(jnp.float32) * 1e-9 + 0.003, 1.0
            )
        float(jnp.sum(cs))
        return time.perf_counter() - t0

    chain(4)
    base = min(chain(4) for _ in range(2))
    total = min(chain(24) for _ in range(2))
    per = (total - base) / 20 * 1000
    if per > 0.05:
        detail = (
            f"{n_clients} streams in one fused launch, {per:.1f} ms/frame "
            f"({1000 / per * n_clients:.0f} client-fps), bitwise == per-client"
        )
        return _result("stage5 8-gaze batched launch", ok, detail)
    # Timing was unmeasurable through this transport: parity alone was
    # verified — a PASS* (partial), never a silent full PASS.
    detail = (
        f"{n_clients} streams in one fused launch, bitwise == per-client; "
        "perf claim NOT validated here (timing unstable through this "
        "transport — see `perf --clients` on the bench chip)"
    )
    return _result("stage5 8-gaze batched launch", ok, detail, partial=True)


def stage6_direct_sampler() -> bool:
    """SAT-free direct sampler (the <= 4K hot path): bit-equality vs the
    SAT path on the live backend at 4K, two gazes."""
    import jax
    import jax.numpy as jnp

    from foveax.config import reduced_dim
    from foveax.core.direct import sample_rect_direct
    from foveax.core.logrect import make_grid
    from foveax.core.sample import sample_rect_from_sat
    from foveax.core.sat import build_sat

    w, h = 3840, 2160
    grid = make_grid(reduced_dim(w), reduced_dim(h), w, h)
    rng = np.random.default_rng(6)
    frame = jax.device_put(rng.integers(0, 256, (3, h, w), np.uint8))

    sat_fn = jax.jit(
        lambda f, c: sample_rect_from_sat(
            build_sat(f.transpose(1, 2, 0)), grid, c, out_layout="chw"
        )
    )
    dir_fn = jax.jit(
        lambda f, c: sample_rect_direct(f, grid, c, out_layout="chw")
    )
    ok = True
    for cxy in [(0.5, 0.5), (0.97, 0.06)]:
        c = jnp.asarray(cxy, jnp.float32)
        a = np.asarray(sat_fn(frame, c))
        b = np.asarray(dir_fn(frame, c))
        if not np.array_equal(a, b):
            ok = False
            break
    return _result(
        "stage6 direct sampler == SAT path (4K, on device)",
        ok,
        "bit-identical" if ok else "MISMATCH",
    )


def run_all() -> int:
    results = [
        stage1_single_frame_warp(),
        stage2_sat_roundtrip(),
        stage3_streaming_dynamic_gaze(),
        stage4_4k_full_path(),
        stage5_batched_clients(),
        stage6_direct_sampler(),
    ]
    print(f"{sum(results)}/{len(results)} stages passed")
    return 0 if all(results) else 1
