"""foveax CLI.

Subcommands mirror the reference's three executables:
  serve                 <- driver.x (reference: src/driver.cc)
  client                <- client_driver.x (reference: src/client_driver.cc)
  single_frame, interpolate_sampled, encode_bitrate, decode,
  foveate_no_encoding   <- run_satlogrectilinear.x subcommands
                           (reference: src/run_satlogrectilinear.cc:55-69)
"""

from __future__ import annotations

import argparse
import asyncio
import dataclasses
import logging
import sys
import time
from pathlib import Path

import numpy as np


def _center(arg: str):
    x, y = arg.split(",")
    return float(x), float(y)


def _add_io_args(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--gaze-trace",
        help="360_em-format gaze trace file, or 'synthetic[:seed]' for a "
        "generated pursuit+saccade trace",
    )
    p.add_argument(
        "--gaze", type=_center, default=(0.5, 0.5), help="fixed gaze 'x,y' in [0,1]"
    )


def _gaze_fn(args):
    trace = getattr(args, "gaze_trace", None)
    if trace:
        from foveax.io.gaze import GazeViewPoints, synthetic_trace

        if trace == "synthetic" or trace.startswith("synthetic:"):
            # Reproducible recorded-style moving gaze (smooth pursuit +
            # saccades) without needing a dataset file on disk —
            # "synthetic" or "synthetic:<seed>".
            try:
                seed = int(trace.split(":", 1)[1]) if ":" in trace else 0
            except ValueError:
                raise SystemExit(
                    f"invalid --gaze-trace {trace!r}: expected "
                    "'synthetic' or 'synthetic:<integer seed>'"
                )
            gvp = GazeViewPoints.from_text(
                synthetic_trace(3600, seed=seed, saccades=True)
            )
        else:
            gvp = GazeViewPoints(trace)
        return lambda i: gvp.gaze_for_frame(i)
    fixed = args.gaze
    return lambda i: fixed


def cmd_serve(args) -> int:
    from foveax.config import FoveaxConfig
    from foveax.serve.server import FoveaxServer

    logging.basicConfig(level=logging.INFO)
    cfg = FoveaxConfig(fps=args.fps)
    mesh = None
    if args.mesh:
        import jax
        import numpy as _np
        from jax.sharding import Mesh

        if not args.broadcast:
            # server.mesh is consumed only by BroadcastChannel — silently
            # serving unsharded would defeat the flag's whole point.
            print("--mesh requires --broadcast", file=sys.stderr)
            return 1
        try:
            data, space = (int(v) for v in args.mesh.split("x"))
            if data < 1 or space < 1:
                raise ValueError
        except ValueError:
            print(
                f"bad --mesh {args.mesh!r}: expected DATAxSPACE, e.g. 2x4",
                file=sys.stderr,
            )
            return 1
        devs = jax.devices()
        if len(devs) < data * space:
            print(
                f"--mesh {args.mesh} needs {data * space} devices, have "
                f"{len(devs)}",
                file=sys.stderr,
            )
            return 1
        mesh = Mesh(
            _np.asarray(devs[: data * space]).reshape(data, space),
            ("data", "space"),
        )
    server = FoveaxServer(
        cfg,
        video_dir=args.video_dir,
        jpeg_quality=args.quality,
        broadcast=args.broadcast,
        loop_videos=args.loop,
        predict_gaze=args.predict_gaze,
        allow_paths=args.allow_paths,
        wire_codec=args.wire_codec,
        wire_bitrate=args.wire_bitrate,
        wire_crf=args.wire_crf,
        wire_preset=args.wire_preset,
        sat_compression=args.sat_compression,
        svd_wire_compress=args.svd_wire_compress,
        mesh=mesh,
        adapt_rate=args.adapt_rate,
        place_videos=args.place_videos,
        batch_sampler=args.batch_sampler,
        readback_deadline_s=args.readback_deadline,
    )
    logging.getLogger("foveax.serve").info("wire codec: %s", server.wire_codec)
    if args.http_port:
        _start_web_server(args.http_port, args.port)
    try:
        asyncio.run(server.run(args.port))
    except KeyboardInterrupt:
        pass
    return 0


def _start_web_server(http_port: int, ws_port: int):
    """Serve the browser viewer (foveax/web) on a daemon thread; returns
    the ThreadingHTTPServer (callers use its bound port and shutdown()).

    The viewer is static files; the websocket protocol itself stays on
    the main server port (the reference's client is a native SDL binary,
    src/client_driver.cc — the browser viewer is foveax's analog)."""
    import functools
    import http.server
    import threading
    from pathlib import Path

    web_dir = Path(__file__).resolve().parent.parent / "web"
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(web_dir)
    )
    httpd = http.server.ThreadingHTTPServer(("0.0.0.0", http_port), handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    logging.getLogger("foveax.serve").info(
        "browser viewer: http://localhost:%d/viewer.html"
        "?ws=ws%%3A%%2F%%2Flocalhost%%3A%d&video=<name>",
        httpd.server_address[1],
        ws_port,
    )
    return httpd


def cmd_client(args) -> int:
    from foveax.config import FoveaxConfig
    from foveax.io.png import save_png
    from foveax.serve.client import FoveaxClient

    logging.basicConfig(level=logging.INFO)
    cfg = FoveaxConfig()
    if args.source_size:
        w, h = (int(v) for v in args.source_size.split("x"))
        cfg = cfg.with_source(w, h)

    sink = None
    if getattr(args, "display", False):
        import cv2

        def sink(frame, meta):
            cv2.imshow("foveax", frame[:, :, ::-1])
            cv2.waitKey(1)

    elif args.out_dir:
        out_dir = Path(args.out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)

        def sink(frame, meta):
            save_png(out_dir / f"frame_{meta.frameNum:03d}.png", frame)

    client = FoveaxClient(
        args.uri,
        video=args.video,
        config=cfg,
        gaze_source=_gaze_fn(args),
        frame_sink=sink,
        max_frames=args.max_frames,
    )
    stats = asyncio.run(client.run())
    print(stats.report())
    return 0


def cmd_gaze_eval(args) -> int:
    """Compare gaze predictors on a recorded or synthetic trace (the
    dataset's pred_* fields are the zero-order baseline, reference:
    src/gaze_view_points.cc:25-31)."""
    from foveax.io.gaze import GazeViewPoints, synthetic_trace
    from foveax.serve.gazepred import evaluate_predictors

    if args.trace:
        gvp = GazeViewPoints(args.trace)
        label = args.trace
    else:
        kind = "saccades" if args.saccades else "smooth"
        gvp = GazeViewPoints.from_text(
            synthetic_trace(args.frames, saccades=args.saccades)
        )
        label = f"synthetic {kind}, {len(gvp)} frames"
    gazes = gvp.gaze_array()
    if len(gazes) < 3:
        print("trace too short", file=sys.stderr)
        return 1
    res = evaluate_predictors(gazes)
    print(f"trace: {label}")
    for mode, err in res.items():
        print(f"  {mode:<7} mean one-tick prediction error: {err:.5f}")
    print(f"  best: {min(res, key=res.get)}")
    return 0


def _open_reader(source: str):
    from foveax.io.video import open_video

    return open_video(source)


def _skip_to(reader, frame_idx: int):
    """Frame at ``frame_idx`` or None if the clip is shorter (silently
    clamping to the last frame would foveate the wrong frame)."""
    frame = reader.read()
    for _ in range(frame_idx):
        frame = reader.read()
        if frame is None:
            return None
    return frame


def cmd_single_frame(args) -> int:
    """Foveate one frame with a chosen technique, save source + reduced
    PNGs (reference: src/run_satlogrectilinear.cc:173-242; the log-polar
    and point-sample baselines come from the reference's ImageSampler,
    src/image_sampler.cc)."""
    import jax.numpy as jnp

    from foveax.config import FoveaxConfig
    from foveax.io.png import save_png
    from foveax.pipeline.frames import FoveationPipeline

    with _open_reader(args.video) as r:
        frame = _skip_to(r, args.frame)
        if frame is None:
            print("no such frame", file=sys.stderr)
            return 1
        cfg = FoveaxConfig().with_source(r.width, r.height)

    fj = jnp.asarray(frame)
    c = jnp.asarray(args.gaze, dtype=jnp.float32)
    tech = args.technique
    if tech == "logrect":
        p = FoveationPipeline(cfg)
        reduced = np.asarray(p.foveate(fj, c))
    elif tech == "logrect_point":
        from foveax.core.logrect import make_point_grid
        from foveax.core.sample import sample_rect_point

        g = make_point_grid(
            cfg.reduced_width, cfg.reduced_height, r.width, r.height
        )
        reduced = np.asarray(sample_rect_point(fj, g, c))
    elif tech in ("logpolar", "logpolar_pyramid"):
        from foveax.core.logpolar import (
            build_pyramid,
            logpolar_gaussian_blur,
            make_logpolar_grid,
            sample_logpolar,
            sample_logpolar_pyramid,
        )

        g = make_logpolar_grid(
            cfg.reduced_width, cfg.reduced_height, r.width, r.height
        )
        if tech == "logpolar":
            sampled = sample_logpolar(fj, g, c)
        else:
            pyr = build_pyramid(fj, args.pyramid_levels)
            sampled = sample_logpolar_pyramid(pyr, g, c, args.pyramid_levels)
        reduced = np.asarray(logpolar_gaussian_blur(sampled))
    else:
        print(f"unknown technique {tech}", file=sys.stderr)
        return 1

    save_png(f"{args.out_prefix}_source.png", np.asarray(frame))
    save_png(f"{args.out_prefix}_foveated.png", reduced)
    print(f"wrote {args.out_prefix}_source.png and _foveated.png ({tech})")
    return 0


def cmd_viewport(args) -> int:
    """Gnomonic rectilinear viewport from an equirect frame (reference:
    src/projections.cc:51-86 — a standalone capability never wired into a
    reference driver)."""
    import jax.numpy as jnp

    from foveax.core.gnomonic import gnomonic_project
    from foveax.io.png import save_png

    with _open_reader(args.video) as r:
        frame = _skip_to(r, args.frame)
        if frame is None:
            print("no such frame", file=sys.stderr)
            return 1
    out = np.asarray(
        gnomonic_project(
            jnp.asarray(frame),
            args.width,
            args.height,
            jnp.asarray(args.gaze, dtype=jnp.float32),
        )
    )
    save_png(args.output, out)
    print(f"wrote {args.output}")
    return 0


def cmd_doctor(args) -> int:
    """Environment diagnostic: JAX platform/devices, Pallas availability,
    native library, codec support."""
    import jax

    print(f"jax {jax.__version__}")
    try:
        devs = jax.devices()
        print(f"devices: {devs} (backend: {jax.default_backend()})")
    except Exception as e:
        print(f"devices: UNAVAILABLE ({e})")
        return 1

    try:
        import jax.numpy as jnp

        x = jnp.arange(8, dtype=jnp.float32)
        print(f"compute: sum(arange(8)) = {float(x.sum()):.0f} (expect 28)")
    except Exception as e:
        print(f"compute: FAILED ({str(e)[:120]})")

    try:
        from foveax.kernels.scan2d import build_sat_pallas

        f = jnp.zeros((16, 128, 3), jnp.uint8)
        interpret = jax.default_backend() == "cpu"
        build_sat_pallas(f, block_rows=8, interpret=interpret).block_until_ready()
        print(f"pallas: OK ({'interpret' if interpret else 'compiled'})")
    except Exception as e:
        print(f"pallas: FAILED ({str(e)[:120]})")

    try:
        from foveax import native

        print(f"native muxer: {'OK' if native.available() else 'unavailable'}")
    except Exception as e:
        print(f"native muxer: FAILED ({e})")

    try:
        import cv2

        print(f"opencv {cv2.__version__}: decode/encode available")
        from foveax.io.video import encode_jpeg

        import numpy as _np

        encode_jpeg(_np.zeros((8, 8, 3), _np.uint8))
        print("jpeg codec: OK")
    except Exception as e:
        print(f"opencv: FAILED ({e})")

    try:
        import websockets

        print(f"websockets {websockets.__version__}")
    except Exception as e:
        print(f"websockets: FAILED ({e})")

    if getattr(args, "probe_transfers", False):
        # Host<->device transfer health.  Remote-attached transports
        # (the TPU tunnel) can wedge their device->host path while
        # uploads and compute still work — a server then stalls at
        # frame readback with no error.  Each probe runs in a daemon
        # thread with a deadline so a wedged path reports WEDGED
        # instead of hanging the diagnostic.
        import threading

        import jax.numpy as jnp  # noqa: F811

        def timed(label, fn, deadline_s=20.0):
            out = {}

            def run():
                t0 = time.perf_counter()
                try:
                    fn()
                    out["ms"] = (time.perf_counter() - t0) * 1e3
                except Exception as e:  # pragma: no cover
                    out["err"] = str(e)[:120]

            t = threading.Thread(target=run, daemon=True)
            t.start()
            t.join(deadline_s)
            if t.is_alive():
                print(f"{label}: WEDGED (no completion in {deadline_s:.0f}s)")
                return False
            if "err" in out:
                print(f"{label}: FAILED ({out['err']})")
                return False
            print(f"{label}: {out['ms']:.1f} ms")
            return True

        buf = np.zeros((608, 1072, 3), np.uint8)
        dev = {}

        def upload():
            # Fence via a dependent scalar readback, not
            # block_until_ready — the relay does not reliably fence the
            # latter (CLAUDE.md), so a wedged upload direction would
            # otherwise report healthy and misattribute the stall.
            dev["x"] = jax.device_put(buf)
            float(jnp.sum(dev["x"][:1, :1].astype(jnp.uint32)))

        ok = timed("upload 2MB (+scalar fence)", upload)
        ok = ok and timed(
            "scalar readback",
            lambda: float(jnp.sum(dev["x"].astype(jnp.uint32))),
        )
        ok = ok and timed("2MB readback", lambda: np.asarray(dev["x"]))
        if not ok:
            print(
                "transfer path unhealthy: device compute may still work "
                "(dependency-chained benches), but serving/readback will "
                "stall — retry later or restart the device transport"
            )
            return 1
    return 0


def cmd_montage(args) -> int:
    """Four-panel comparison image: source (gaze marked) | transmitted |
    log-rectilinear restoration | log-polar baseline restoration."""
    import cv2
    import jax.numpy as jnp

    from foveax.config import FoveaxConfig
    from foveax.core.logpolar import (
        logpolar_gaussian_blur,
        make_logpolar_grid,
        sample_logpolar,
        unwarp_logpolar,
    )
    from foveax.pipeline.frames import FoveationPipeline

    with _open_reader(args.video) as r:
        frame = _skip_to(r, args.frame)
        if frame is None:
            print("no such frame", file=sys.stderr)
            return 1
        cfg = FoveaxConfig().with_source(r.width, r.height)

    p = FoveationPipeline(cfg)
    c = p.center(*args.gaze)
    fj = jnp.asarray(frame)
    reduced, restored = p.roundtrip(fj, c)
    g = make_logpolar_grid(cfg.reduced_width, cfg.reduced_height, r.width, r.height)
    lp = logpolar_gaussian_blur(sample_logpolar(fj, g, c))
    lp_restored = unwarp_logpolar(lp, r.width, r.height, c)

    pw, ph = r.width // 2, r.height // 2

    def panel(img, text, interp=cv2.INTER_AREA):
        im = cv2.resize(np.asarray(img), (pw, ph), interpolation=interp)
        im = np.ascontiguousarray(im[:, :, ::-1])
        cv2.putText(im, text, (12, 34), cv2.FONT_HERSHEY_SIMPLEX, 1.0, (0, 0, 0), 5)
        cv2.putText(im, text, (12, 34), cv2.FONT_HERSHEY_SIMPLEX, 1.0, (255, 255, 255), 2)
        return im

    src = np.ascontiguousarray(np.asarray(frame)[:, :, ::-1])
    gx, gy = int(args.gaze[0] * r.width), int(args.gaze[1] * r.height)
    cv2.circle(src, (gx, gy), max(12, r.height // 45), (0, 255, 0), 3)
    top = np.concatenate(
        [
            panel(src[:, :, ::-1], "source (gaze circled)"),
            panel(reduced, "transmitted (log-rect)", cv2.INTER_NEAREST),
        ],
        axis=1,
    )
    bottom = np.concatenate(
        [
            panel(restored, "restored (log-rect)"),
            panel(lp_restored, "restored (log-polar baseline)"),
        ],
        axis=1,
    )
    out = np.concatenate([top, bottom], axis=0)
    cv2.imwrite(args.output, out, [cv2.IMWRITE_JPEG_QUALITY, 88])
    print(f"wrote {args.output}")
    return 0


def cmd_svd_bench(args) -> int:
    """SVD-compressed SAT benchmark: factorize, reconstruct, time it
    (reference: src/eigen_sat_generate.cc — the Eigen CPU benchmark)."""
    import jax
    import jax.numpy as jnp

    from foveax.core.sat import build_sat
    from foveax.core.svd_sat import compress_sat, reconstruct_sat

    with _open_reader(args.video) as r:
        frame = _skip_to(r, args.frame)
        if frame is None:
            print("no such frame", file=sys.stderr)
            return 1
    sat = build_sat(jnp.asarray(frame))
    t0 = time.perf_counter()
    svd = compress_sat(sat, args.rank)
    t_compress = time.perf_counter() - t0

    # Dependency-chained device loop ending in a scalar readback —
    # block_until_ready is not a reliable fence through remote-attached
    # transports (CLAUDE.md / bench.py).
    def rec_loop(svd, iters):
        # Each iteration's input depends on the carry (acc * 0 is not
        # folded for floats: NaN/Inf semantics), so XLA's while-loop
        # invariant code motion cannot hoist the reconstruction out of
        # the loop and t_rec measures `iters` real reconstructions.
        def body(i, acc):
            s = svd.s + acc * jnp.float32(0)
            out = reconstruct_sat(dataclasses.replace(svd, s=s))
            return acc + out[0, 0, 0]
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    j = jax.jit(rec_loop, static_argnums=1)
    float(j(svd, 2))  # compile + warm
    t0 = time.perf_counter()
    float(j(svd, args.iters))
    t_rec = (time.perf_counter() - t0) / args.iters
    out = jax.jit(reconstruct_sat)(svd)

    err = float(
        jnp.abs(out - sat.astype(jnp.float32)).mean()
        / jnp.maximum(sat.astype(jnp.float32).mean(), 1.0)
    )
    print(
        f"rank={args.rank} compress={t_compress * 1000:.1f}ms "
        f"reconstruct={t_rec * 1000:.2f}ms rel_err={err:.2e}"
    )
    return 0


def cmd_quality(args) -> int:
    """Foveate+unwarp quality study over a clip: full-frame, foveal, and
    eccentricity-weighted PSNR per gaze trace (the paper's evaluation axis;
    the repo itself stores no numbers — SURVEY.md section 6)."""
    import jax.numpy as jnp

    from foveax.config import FoveaxConfig
    from foveax.core.metrics import (
        eccentricity_weighted_psnr,
        foveal_psnr,
        foveal_ssim,
        psnr,
        ssim,
        ws_psnr,
    )
    from foveax.pipeline.frames import FoveationPipeline

    gaze = _gaze_fn(args)
    techniques = args.techniques or ["logrect"]
    with _open_reader(args.video) as r:
        cfg = FoveaxConfig().with_source(r.width, r.height)
        p = FoveationPipeline(cfg)
        frames = []
        for i, frame in enumerate(r):
            frames.append(frame)
            if args.max_frames and len(frames) >= args.max_frames:
                break

    # Optional codec-in-the-loop mode: foveate the whole clip, push the
    # reduced stream through the real file codec, then unwarp what a
    # client would actually decode (the paper's end-to-end experiment;
    # reference offline chain: encode_bitrate then decode,
    # src/run_satlogrectilinear.cc:660-855).
    def codec_roundtrip_reduced(reduced_frames):
        import tempfile

        from foveax.io.video import VideoReader, VideoWriter

        with tempfile.TemporaryDirectory() as td:
            path = f"{td}/reduced.mp4"
            with VideoWriter(
                path,
                cfg.reduced_width,
                cfg.reduced_height,
                fps=30.0,
                quality=args.codec_quality,
            ) as w:
                for rf in reduced_frames:
                    w.write(rf)
            with VideoReader(path) as rr:
                return [f for f in rr]

    for tech in techniques:
        full, fov, ecc, ws, ssims, fov_ssims = [], [], [], [], [], []
        decoded = None
        if args.through_codec and tech != "logrect":
            print(
                f"note: --through-codec applies to logrect only; {tech} "
                "runs the in-memory roundtrip",
                file=sys.stderr,
            )
        if args.through_codec and tech == "logrect":
            reduced_all = [
                np.asarray(p.foveate(jnp.asarray(f), p.center(*gaze(i))))
                for i, f in enumerate(frames)
            ]
            decoded = codec_roundtrip_reduced(reduced_all)
            if len(decoded) < len(frames):
                # Some codec backends drop trailing frames on flush.
                print(
                    f"note: codec returned {len(decoded)}/{len(frames)} "
                    "frames; truncating",
                    file=sys.stderr,
                )
                frames = frames[: len(decoded)]
        for i, frame in enumerate(frames):
            c = p.center(*gaze(i))
            fj = jnp.asarray(frame)
            if tech == "logrect" and decoded is not None:
                restored = p.unwarp(jnp.asarray(decoded[i]), c)
            elif tech == "logrect":
                _, restored = p.roundtrip(fj, c)
            elif tech == "logpolar":
                from foveax.core.logpolar import (
                    logpolar_gaussian_blur,
                    make_logpolar_grid,
                    sample_logpolar,
                    unwarp_logpolar,
                )

                g = make_logpolar_grid(
                    cfg.reduced_width, cfg.reduced_height, r.width, r.height
                )
                red = logpolar_gaussian_blur(sample_logpolar(fj, g, c))
                restored = unwarp_logpolar(red, r.width, r.height, c)
            else:
                print(f"unknown technique {tech}", file=sys.stderr)
                return 1
            full.append(float(psnr(restored, fj)))
            ws.append(float(ws_psnr(restored, fj)))
            fov.append(float(foveal_psnr(restored, fj, c)))
            ecc.append(float(eccentricity_weighted_psnr(restored, fj, c)))
            # SSIM columns (structural twin of the PSNR set): PSNR
            # flatters the box-filtered periphery's blur, SSIM's local
            # contrast terms do not — foveal-advantage readings need both.
            ssims.append(float(ssim(restored, fj)))
            fov_ssims.append(float(foveal_ssim(restored, fj, c)))
        n = len(full)
        mode = " (through codec)" if decoded is not None else ""
        print(
            f"{tech}{mode}: frames={n} psnr={sum(full) / n:.2f}dB "
            f"ws-psnr={sum(ws) / n:.2f}dB "
            f"foveal={sum(fov) / n:.2f}dB ecc-weighted={sum(ecc) / n:.2f}dB "
            f"ssim={sum(ssims) / n:.4f} foveal-ssim={sum(fov_ssims) / n:.4f}"
        )
    return 0


def cmd_ladder(args) -> int:
    """Bitrate ladder: bandwidth-vs-quality per technique through a real
    rate-controlled encode (the paper's headline comparison; reference
    chain: src/run_satlogrectilinear.cc:660-763 + src/video_encoder.cc:
    210-342).  Prints a markdown table."""
    from foveax.cli.ladder import format_table, run_ladder
    from foveax.config import FoveaxConfig
    from foveax.io.wirecodec import available_wire_codecs

    if args.codec not in available_wire_codecs():
        print(
            f"codec {args.codec!r} unavailable (native shim not built)",
            file=sys.stderr,
        )
        return 1
    gaze = _gaze_fn(args)
    with _open_reader(args.video) as r:
        cfg = FoveaxConfig().with_source(r.width, r.height)
        fps = r.fps
        frames = []
        for frame in r:
            frames.append(frame)
            if args.max_frames and len(frames) >= args.max_frames:
                break
    rungs = run_ladder(
        frames,
        gaze,
        cfg,
        bitrates_kbps=args.bitrates,
        techniques=args.techniques,
        fps=fps,
        codec=args.codec,
    )
    print(format_table(rungs))
    return 0


def cmd_interpolate_sampled(args) -> int:
    """Foveate + unwarp one frame, save all three stages (reference:
    src/run_satlogrectilinear.cc:330-417)."""
    import jax.numpy as jnp

    from foveax.config import FoveaxConfig
    from foveax.io.png import save_png
    from foveax.pipeline.frames import FoveationPipeline

    with _open_reader(args.video) as r:
        frame = _skip_to(r, args.frame)
        if frame is None:
            print("no such frame", file=sys.stderr)
            return 1
        cfg = FoveaxConfig().with_source(r.width, r.height)
    p = FoveationPipeline(cfg)
    c = p.center(*args.gaze)
    reduced, restored = p.roundtrip(jnp.asarray(frame), c)
    save_png(f"{args.out_prefix}_source.png", np.asarray(frame))
    save_png(f"{args.out_prefix}_foveated.png", np.asarray(reduced))
    save_png(f"{args.out_prefix}_restored.png", np.asarray(restored))
    print(f"wrote {args.out_prefix}_{{source,foveated,restored}}.png")
    return 0


def _transcode(args, mode: str) -> int:
    """Shared offline transcode loop (reference:
    src/run_satlogrectilinear.cc:660-763 encode_bitrate, :765-855 decode,
    :857-959 foveate_no_encoding)."""
    import jax.numpy as jnp

    from foveax.config import FoveaxConfig
    from foveax.io.video import open_video_writer
    from foveax.pipeline.frames import FoveationPipeline

    gaze = _gaze_fn(args)
    t0 = time.perf_counter()
    with _open_reader(args.video) as r:
        cfg = FoveaxConfig().with_source(r.width, r.height)
        if mode == "decode":
            # Input is already foveated at reduced size; unwarp to full.
            out_w = args.width or cfg.source_width
            out_h = args.height or cfg.source_height
            cfg = FoveaxConfig().with_source(out_w, out_h)
            if (r.width, r.height) != (cfg.reduced_width, cfg.reduced_height):
                print(
                    f"note: input {r.width}x{r.height} != reduced "
                    f"{cfg.reduced_width}x{cfg.reduced_height} for "
                    f"{out_w}x{out_h}",
                    file=sys.stderr,
                )
            out_size = (out_w, out_h)
        elif mode == "encode":
            out_size = (cfg.reduced_width, cfg.reduced_height)
        else:  # foveate_no_encoding: roundtrip at full size
            out_size = (cfg.source_width, cfg.source_height)

        p = FoveationPipeline(cfg)
        if mode == "encode":
            process = p.foveate
        elif mode == "decode":
            process = p.unwarp
        else:
            process = lambda f, c: p.roundtrip(f, c)[1]

        from foveax.pipeline.profiling import StageTimer
        from foveax.pipeline.runner import run_transcode

        # --bitrate selects the native rate-controlled encoder (the
        # reference's encode_bitrate takes an explicit bits/s argument,
        # src/run_satlogrectilinear.cc:669-676); --quality keeps the
        # OpenCV writer.
        with open_video_writer(
            args.output,
            out_size[0],
            out_size[1],
            fps=r.fps,
            bitrate=getattr(args, "bitrate", None),
            quality=args.quality,
            codec=getattr(args, "codec", None),
        ) as w:
            timer = run_transcode(
                r,
                process,
                gaze,
                lambda frame, i: w.write(frame),
                max_frames=args.max_frames,
                timer=StageTimer(),
            )
            n = w.n_written
    dt = time.perf_counter() - t0
    print(f"{mode}: {n} frames -> {args.output} in {dt:.1f}s ({n / dt:.1f} fps)")
    if getattr(w, "bytes_written", 0) and n:
        kbps = w.bytes_written * 8 * r.fps / n / 1e3
        print(f"achieved rate: {kbps:.0f} kbit/s at {r.fps:.0f} fps")
    if getattr(args, "profile", False):
        print(timer.report(), file=sys.stderr)
    return 0


def cmd_encode_bitrate(args) -> int:
    return _transcode(args, "encode")


def cmd_decode(args) -> int:
    return _transcode(args, "decode")


def cmd_foveate_no_encoding(args) -> int:
    return _transcode(args, "roundtrip")


def cmd_encode_ladder(args) -> int:
    """Encode-cost ladder: per-frame ms, wire kbit/s, and PSNR for every
    (codec, preset, size, rate mode) on THIS host — the encode half of
    the composed serving-capacity model (BENCHMARKS.md).  The reference
    offloads encode to NVENC silicon (src/video_encoder.cc:3-78) so it
    never needs this table; software encode makes the preset the
    members-per-core lever.  members/core = floor(tick / encode_ms),
    the count one core sustains at the tick without decimation."""
    import time

    import numpy as np

    from foveax.io.wirecodec import (
        WIRE_PRESETS,
        available_wire_codecs,
        make_wire_decoder,
        make_wire_encoder,
        probe_frame,
    )

    avail = available_wire_codecs()
    tick_ms = 1e3 / args.fps
    sizes = []
    for s in args.sizes:
        w, h = (int(v) for v in s.split("x"))
        sizes.append((w, h))

    def run_point(codec, preset, w, h, bitrate, crf):
        enc = make_wire_encoder(
            codec, w, h, args.fps, bitrate=bitrate, crf=crf, preset=preset,
            jpeg_quality=args.jpeg_quality,
        )
        dec = make_wire_decoder(
            getattr(enc, "sample_format", None),
            getattr(enc, "codec_config", None),
            size_hint=(w, h),
        )
        try:
            times, nbytes, sq, n_px = [], 0, 0.0, 0
            for i in range(args.frames + 1):
                frame = probe_frame(w, h, i)
                t0 = time.perf_counter()
                sample, _ = enc.encode(frame)
                if not i:
                    dec.decode(sample)
                    continue  # keyframe + lazy init excluded from median
                times.append(time.perf_counter() - t0)
                nbytes += len(sample)
                out = dec.decode(sample)
                if out is not None:
                    d = out.astype(np.float64) - frame.astype(np.float64)
                    sq += float(np.sum(d * d))
                    n_px += d.size
            ms = sorted(times)[len(times) // 2] * 1e3
            kbitps = nbytes * 8 / args.frames * args.fps / 1e3
            mse = sq / n_px if n_px else float("inf")
            psnr = 10 * np.log10(255.0**2 / mse) if mse > 0 else float("inf")
            return ms, kbitps, psnr
        finally:
            enc.close()
            dec.close()

    modes = [("crf", 0, args.crf)]
    if args.bitrate > 0:
        modes.append(("abr", args.bitrate, args.crf))
    points = []
    for codec in args.codecs:
        if codec not in avail:
            print(f"# {codec}: unavailable on this host, skipped")
            continue
        presets = [""] if codec == "jpeg" else list(args.presets)
        for w, h in sizes:
            for mode_name, bitrate, crf in modes if codec != "jpeg" else [modes[0]]:
                for preset in presets:
                    ms, kbitps, psnr = run_point(codec, preset, w, h, bitrate, crf)
                    members = int(tick_ms // ms) if ms > 0 else 0
                    points.append((codec, preset or "-", f"{w}x{h}", mode_name,
                                   ms, kbitps, psnr, members))

    print(f"# {args.frames} frames of moving probe content, fps={args.fps:g} "
          f"(tick {tick_ms:.1f} ms), crf={args.crf}"
          + (f", abr={args.bitrate}" if args.bitrate > 0 else ""))
    print(f"{'codec':7s} {'preset':10s} {'size':10s} {'mode':5s} "
          f"{'ms/frame':>9s} {'kbit/s':>9s} {'PSNR':>6s} {'members/core':>12s}")
    for codec, preset, size, mode, ms, kbitps, psnr, members in points:
        print(f"{codec:7s} {preset:10s} {size:10s} {mode:5s} "
              f"{ms:9.2f} {kbitps:9.0f} {psnr:6.2f} {members:12d}")
    if points:
        import os

        cores = os.cpu_count() or 1
        best = max(points, key=lambda p: p[7])
        print(f"# composed capacity at {sizes[0][0]}x{sizes[0][1]}: "
              f"min(240/chip device knee, {best[7]}/core x {cores} cores "
              f"encode half [{best[0]} {best[1]}]) — see BENCHMARKS.md "
              f"'Composed serving capacity'")
    return 0


def cmd_encode_capacity(args) -> int:
    """Members one host sustains at the tick, encode half only: replays
    the serve loop's exact encode structure (asyncio.gather of
    per-member encodes into a bounded executor, one inter-frame encoder
    per member — serve/server.py broadcast tick) against real encoders
    at the production reduced size, and reports the largest N whose p90
    per-tick encode batch fits 90% of the tick — the same threshold at
    which the channel's saturation decimation engages.  The composed
    serving capacity is min(device knee, this x cores): BENCHMARKS.md
    'Composed serving capacity'."""
    import asyncio as aio
    import time
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    from foveax.io.wirecodec import make_wire_encoder, probe_frame

    import os

    tick_ms = 1e3 / args.fps
    budget = 0.9 * tick_ms
    w, h = (int(v) for v in args.size.split("x"))
    if args.workers is None:  # the serve loop's executor sizing
        args.workers = min(32, (os.cpu_count() or 1) + 4)

    async def run_n(n):
        encs = [
            make_wire_encoder(
                args.codec, w, h, args.fps,
                bitrate=args.bitrate, crf=args.crf, preset=args.preset,
            )
            for _ in range(n)
        ]
        ex = ThreadPoolExecutor(max_workers=args.workers)
        loop = aio.get_running_loop()
        try:
            ticks = []
            for i in range(args.ticks + 2):
                frame = probe_frame(w, h, i)
                t0 = time.perf_counter()
                await aio.gather(*(
                    loop.run_in_executor(ex, e.encode, frame) for e in encs
                ))
                if i >= 2:  # keyframe + warmup ticks excluded
                    ticks.append((time.perf_counter() - t0) * 1e3)
            return float(np.percentile(ticks, 90))
        finally:
            ex.shutdown(wait=True)
            for e in encs:
                e.close()

    print(f"# {args.codec} preset={args.preset or '(default)'} {w}x{h} "
          f"fps={args.fps:g} (budget {budget:.1f} ms = 90% tick), "
          f"workers={args.workers}, {args.ticks} ticks")
    best = 0
    for n in range(1, args.max_members + 1):
        p90 = aio.run(run_n(n))
        fits = p90 <= budget
        print(f"members={n:3d}  p90 tick encode {p90:7.2f} ms  "
              f"{'OK' if fits else 'DECIMATES'}")
        if fits:
            best = n
        elif n > best + 1:
            break
    cores = os.cpu_count() or 1
    print(f"# sustained: {best} members/host at the {args.fps:g} fps tick "
          f"({cores} core(s)); composed capacity = min(240/chip device "
          f"knee, {best} encode half)")
    return 0


def cmd_perf(args) -> int:
    """Device-path throughput across resolutions (1080p/4K/8K) using the
    dependency-chained methodology of bench.py.  With --clients N, also
    measures the batched multi-gaze serve step (one SAT, N sampled gaze
    streams in one fused launch — BASELINE staged config 5)."""
    import jax
    import jax.numpy as jnp

    from foveax.config import FoveaxConfig, reduced_dim
    from foveax.core.direct import sample_rect_direct
    from foveax.core.logrect import make_grid
    from foveax.core.sample import sample_rect_from_sat
    from foveax.core.unwarp import unwarp_rect
    from foveax.core.sat import build_sat as build_xla

    resolutions = {
        "1080p": (1920, 1080),
        "4k": (3840, 2160),
        "8k": (7680, 4320),
        # 16K equirect: the resolution-scaling stress point (SURVEY's
        # "long context" axis).  The SAT's mod-2^32 wrap engages (total
        # pixel sum 3.4e10 > 2^32) and stays correct for 4-tap boxes.
        "16k": (15360, 8640),
    }
    names = args.resolutions or ["1080p", "4k"]
    rng = np.random.default_rng(0)
    for name in names:
        w, h = resolutions[name]
        rw, rh = reduced_dim(w), reduced_dim(h)
        grid = make_grid(rw, rh, w, h)
        # One chw-in SAT builder regardless of backend, so the step/batch
        # jits below stay single definitions (copies of these functions
        # diverged once before; the only legitimate difference is this
        # line).
        if w % 128 == 0 and jax.default_backend() != "cpu":
            from foveax.kernels.scan2d import build_sat_pallas

            build_fn = lambda f: build_sat_pallas(f, in_layout="chw")
        else:
            build_fn = lambda f: build_xla(f.transpose(1, 2, 0))

        # Single-gaze sampler: round-4 measured policy — the fused
        # segment-reduce sampler wins at every accelerator shape
        # (BENCHMARKS.md round-4 stage table: 1.46 ms vs direct 2.57 at
        # 4K, 7.70 vs the SAT pair's 28.5 at 16K); "auto" mirrors
        # FoveationPipeline's pick, degrading to the SAT pair when the
        # shape fails the kernel's structural contract (eval_shape
        # probe — no compile, no device).
        use_direct = args.sampler == "direct"
        use_fused = args.sampler == "fused" or (
            args.sampler == "auto" and jax.default_backend() != "cpu"
        )
        if use_fused:
            from foveax.kernels.segreduce import (
                fused_eligible,
                sample_rect_fused,
            )

            fused_interp = jax.default_backend() == "cpu"
            if args.sampler == "auto" and not fused_eligible(grid, h, w):
                use_fused = False

        @jax.jit
        def step(f, c, build_fn=build_fn, grid=grid, w=w, h=h,
                 use_direct=use_direct, use_fused=use_fused):
            if use_fused:
                red = sample_rect_fused(
                    f, grid, c, out_layout="chw", interpret=fused_interp
                )
            elif use_direct:
                red = sample_rect_direct(f, grid, c, out_layout="chw")
            else:
                sat = build_fn(f)
                red = sample_rect_from_sat(sat, grid, c, out_layout="chw")
            return unwarp_rect(
                red, w, h, c, in_layout="chw", out_layout="chw",
                precision=args.precision,
            )

        frame = jax.device_put(rng.integers(0, 256, (3, h, w), np.uint8))
        centers = [
            jax.device_put(np.asarray([0.3 + 0.01 * i, 0.5], np.float32))
            for i in range(args.frames + 4)
        ]

        def chain(n):
            y = frame
            t0 = time.perf_counter()
            for i in range(n):
                y = step(y, centers[i])
            float(jnp.sum(y.astype(jnp.uint32)))
            return time.perf_counter() - t0

        chain(2)
        base = chain(2)
        total = chain(args.frames + 2)
        per = (total - base) / args.frames * 1000
        if per <= 0:
            print(
                f"{name}: timing noise exceeded the measured span — "
                "increase --frames",
                file=sys.stderr,
            )
        else:
            print(
                f"{name}: {w}x{h} -> {rw}x{rh}  {per:.2f} ms/frame  "
                f"{1000 / per:.1f} fps"
            )

        batch_kind = getattr(args, "batch_sampler", "auto")
        if batch_kind == "auto":
            # Mirror FoveationPipeline.batch_pair's round-4 policy:
            # fused on eligible accelerator shapes (the measured knee
            # move, BENCHMARKS.md), SAT otherwise.
            from foveax.kernels.segreduce import fused_eligible

            batch_kind = (
                "fused"
                if jax.default_backend() != "cpu"
                and fused_eligible(grid, h, w, batch=True)
                else "sat"
            )
        for n_c in args.clients or []:
            if n_c <= 0:  # "--clients 0" stays a documented no-op
                continue

            if batch_kind == "direct":
                from foveax.core.direct import sample_rect_direct_batch

                @jax.jit
                def batch_step(f, cs, grid=grid):
                    return sample_rect_direct_batch(
                        f, grid, cs, in_layout="chw", out_layout="chw"
                    )

            elif batch_kind == "fused":
                from foveax.kernels.segreduce import sample_rect_fused_batch

                b_interp = jax.default_backend() == "cpu"

                @jax.jit
                def batch_step(f, cs, grid=grid):
                    return sample_rect_fused_batch(
                        f, grid, cs, in_layout="chw", out_layout="chw",
                        interpret=b_interp,
                    )

            else:

                @jax.jit
                def batch_step(f, cs, build_fn=build_fn, grid=grid):
                    sat = build_fn(f)
                    return jax.vmap(
                        lambda c: sample_rect_from_sat(
                            sat, grid, c, out_layout="chw"
                        )
                    )(cs)

            cs0 = jax.device_put(
                rng.uniform(0.1, 0.9, (n_c, 2)).astype(np.float32)
            )

            def chain_b(n, cs0=cs0, batch_step=batch_step):
                y, cs = frame, cs0
                t0 = time.perf_counter()
                for i in range(n):
                    reds = batch_step(y, cs)
                    y = y ^ reds[0, :, :1, :1]
                    cs = jnp.remainder(cs + 0.003, 1.0)
                float(jnp.sum(y.astype(jnp.uint32)))
                return time.perf_counter() - t0

            chain_b(2)
            base = chain_b(2)
            total = chain_b(args.frames + 2)
            per = (total - base) / args.frames * 1000
            if per <= 0:
                print(
                    f"{name} x{n_c} clients: timing noise exceeded the "
                    "measured span — increase --frames",
                    file=sys.stderr,
                )
                continue
            label = (
                "one SAT, batched sample"
                if batch_kind == "sat"
                else f"SAT-free {batch_kind}, batched"
            )
            print(
                f"{name} x{n_c} clients ({label}): "
                f"{per:.2f} ms/frame  {1000 / per * n_c:.1f} client-fps"
            )
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="foveax")
    from foveax import __version__

    ap.add_argument(
        "--version", action="version", version=f"foveax {__version__}"
    )
    ap.add_argument(
        "--platform",
        choices=["cpu", "axon", "tpu"],
        default=None,
        help="force the JAX platform (e.g. cpu for a client co-located "
        "with a server that holds the TPU)",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("serve", help="run the streaming server")
    p.add_argument("--port", type=int, default=9562)
    p.add_argument("--video-dir", default="1080p_videos")
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--quality", type=int, default=90)
    p.add_argument(
        "--loop", action="store_true", help="loop videos when they end"
    )
    p.add_argument(
        "--allow-paths", action="store_true",
        help="allow videoRequest names to be filesystem paths (trusted "
        "deployments only; default confines requests to --video-dir)",
    )
    p.add_argument(
        "--predict-gaze", nargs="?", const="linear", default="off",
        choices=["off", "linear", "kalman"],
        help="extrapolate the gaze one tick ahead to hide latency "
        "(bare flag = linear; kalman adds pursuit filtering with "
        "saccade-aware reset, see foveax/serve/gazepred.py)",
    )
    p.add_argument(
        "--broadcast",
        action="store_true",
        help="viewers of one video share a frame clock; gazes sample as "
        "one batched launch",
    )
    p.add_argument(
        "--wire-codec",
        default="auto",
        choices=["auto", "jpeg", "h264", "vp9", "mpeg4"],
        help="streaming sample codec (auto = h264 when the native shim is "
        "built, else jpeg)",
    )
    p.add_argument(
        "--wire-bitrate", type=int, default=0,
        help="rate-targeted encode, bits/s (0 = quality-targeted via --wire-crf)",
    )
    p.add_argument(
        "--wire-crf", type=int, default=25,
        help="quality target for the wire codec (reference runs cq 25, "
        "src/video_encoder.cc:43)",
    )
    p.add_argument(
        "--wire-preset", default="auto",
        help="software-encoder speed preset (x264 names, ultrafast..medium; "
        "vp9 maps onto cpu-used): auto = slowest preset whose measured "
        "per-frame cost on this host fits 40%% of the tick — the serving "
        "capacity lever, see `encode_ladder` and BENCHMARKS.md "
        "'Composed serving capacity'; '' = codec default (veryfast)",
    )
    p.add_argument(
        "--adapt-rate", action="store_true",
        help="AIMD the per-session wire bitrate on backlog drops "
        "(requires --wire-bitrate > 0; re-negotiates the encoder and "
        "re-sends the stream header live)",
    )
    p.add_argument(
        "--sat-compression", default="none", choices=["none", "svd"],
        help="svd: stream rank-r SAT factors + residual; clients foveate "
        "locally with their own gaze (zero gaze latency, one stream "
        "serves all gazes)",
    )
    p.add_argument(
        "--svd-wire-compress", default="rle",
        choices=["rle", "deflate", "none"],
        help="SVD-wire residual coding: rle = zlib Z_RLE + inter-frame "
        "delta (default), deflate = zlib level-1 + delta, none = raw "
        "(see BENCHMARKS.md 'SVD wire v2')",
    )
    p.add_argument(
        "--mesh", default="",
        help="shard broadcast serving over a DATAxSPACE device mesh, e.g. "
        "2x4 (requires --broadcast and data*space jax devices; the client "
        "batch shards over `data` either way — with the SAT batch sampler "
        "the scan also shards over `space` rows, with the fused sampler "
        "the frame replicates once per tick and sampling is "
        "collective-free)",
    )
    p.add_argument(
        "--place-videos", default="default",
        choices=["default", "round_robin"],
        help="round_robin: place each video's pipeline (SAT build + "
        "sample) on its own local device, scaling the VIDEO SET across "
        "chips (the other multi-chip serving axis; --mesh shards one "
        "video's client batch instead — the two are mutually exclusive)",
    )
    p.add_argument(
        "--batch-sampler", default="auto",
        choices=["auto", "sat", "direct", "fused"],
        help="broadcast-tick sampling strategy: sat = amortize one SAT "
        "across the member batch; direct/fused = SAT-free gather-free "
        "per-gaze sampling (bit-identical; auto = fused on eligible "
        "accelerator shapes — the round-4 measured winner, 192 "
        "clients/chip at the 30 fps tick — sat otherwise)",
    )
    p.add_argument(
        "--readback-deadline", type=float, default=120.0,
        help="deadline (s) on per-tick device->host readbacks: a wedged "
        "transport degrades to skipped frames instead of a hung channel, "
        "and cadence recovers when the transfer completes (must exceed a "
        "first-tick jit compile, 15-40 s here; <= 0 disables)",
    )
    p.add_argument(
        "--http-port", type=int, default=0,
        help="also serve the browser viewer (foveax/web) over HTTP on "
        "this port (0 = off); open /viewer.html?video=NAME",
    )
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser(
        "gaze_eval",
        help="compare gaze predictors (zero/linear/kalman) on a trace",
    )
    p.add_argument("--trace", help="360_em-format gaze trace file")
    p.add_argument("--frames", type=int, default=600)
    p.add_argument(
        "--saccades", action="store_true",
        help="synthetic trace with ballistic saccades every 2 s",
    )
    p.set_defaults(fn=cmd_gaze_eval)

    p = sub.add_parser("client", help="run the headless streaming client")
    p.add_argument("--uri", default="ws://localhost:9562")
    p.add_argument("--video", default="03_drone_d5d4gnuAJLo")
    p.add_argument("--max-frames", type=int)
    p.add_argument("--out-dir", help="dump received frames as PNGs")
    p.add_argument(
        "--display", action="store_true",
        help="show frames in an OpenCV window (needs a display)",
    )
    p.add_argument("--source-size", help="e.g. 1920x1080")
    _add_io_args(p)
    p.set_defaults(fn=cmd_client)

    p = sub.add_parser("single_frame", help="foveate one frame to PNG")
    p.add_argument("video")
    p.add_argument("frame", type=int)
    p.add_argument("out_prefix")
    p.add_argument(
        "--technique",
        choices=["logrect", "logrect_point", "logpolar", "logpolar_pyramid"],
        default="logrect",
    )
    p.add_argument("--pyramid-levels", type=int, default=4)
    _add_io_args(p)
    p.set_defaults(fn=cmd_single_frame)

    p = sub.add_parser("viewport", help="gnomonic viewport from equirect")
    p.add_argument("video")
    p.add_argument("frame", type=int)
    p.add_argument("output")
    p.add_argument("--width", type=int, default=960)
    p.add_argument("--height", type=int, default=540)
    _add_io_args(p)
    p.set_defaults(fn=cmd_viewport)

    p = sub.add_parser(
        "stages", help="run the five staged validation configs (BASELINE.md)"
    )
    p.set_defaults(fn=lambda a: __import__(
        "foveax.cli.stages", fromlist=["run_all"]
    ).run_all())

    p = sub.add_parser("quality", help="PSNR quality study over a clip")
    p.add_argument("video")
    p.add_argument("--max-frames", type=int, default=30)
    p.add_argument(
        "--techniques", nargs="*", choices=["logrect", "logpolar"], default=None
    )
    p.add_argument(
        "--through-codec", action="store_true",
        help="push the reduced stream through the real file codec before "
        "unwarping (the paper's end-to-end chain)",
    )
    p.add_argument("--codec-quality", type=float, default=None)
    _add_io_args(p)
    p.set_defaults(fn=cmd_quality)

    p = sub.add_parser(
        "ladder", help="bitrate-vs-PSNR ladder through a real encoder"
    )
    p.add_argument("video")
    p.add_argument("--max-frames", type=int, default=30)
    p.add_argument(
        "--bitrates", nargs="*", type=float,
        default=[500, 1000, 2000, 4000, 8000], help="ladder rungs, kbit/s",
    )
    p.add_argument(
        "--techniques", nargs="*",
        choices=["logrect", "logpolar", "downsample"],
        default=["logrect", "logpolar", "downsample"],
    )
    p.add_argument(
        "--codec", default="h264", choices=["h264", "vp9", "mpeg4"]
    )
    _add_io_args(p)
    p.set_defaults(fn=cmd_ladder)

    p = sub.add_parser(
        "encode_ladder",
        help="encode cost/bitrate/PSNR per (codec, preset, size, mode) on "
        "this host — the encode half of serving capacity",
    )
    p.add_argument("--codecs", nargs="*", default=["h264", "vp9", "jpeg"])
    p.add_argument(
        "--presets", nargs="*",
        default=["ultrafast", "superfast", "veryfast", "faster", "fast"],
    )
    p.add_argument("--sizes", nargs="*", default=["1072x608", "2144x1200"])
    p.add_argument("--frames", type=int, default=12)
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--crf", type=int, default=25)
    p.add_argument(
        "--bitrate", type=int, default=2_000_000,
        help="also measure rate-targeted (ABR) mode at this target "
        "(0 = crf only)",
    )
    p.add_argument("--jpeg-quality", type=int, default=90)
    p.set_defaults(fn=cmd_encode_ladder)

    p = sub.add_parser(
        "encode_capacity",
        help="members/host sustained at the tick through the serve "
        "loop's encode structure (real encoders, bounded executor)",
    )
    p.add_argument("--codec", default="h264")
    p.add_argument("--preset", default="ultrafast")
    p.add_argument("--size", default="1072x608")
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--crf", type=int, default=25)
    p.add_argument("--bitrate", type=int, default=2_000_000)
    p.add_argument("--ticks", type=int, default=60)
    p.add_argument("--max-members", type=int, default=16)
    p.add_argument(
        "--workers", type=int, default=None,
        help="executor threads (default: the serve loop's sizing)",
    )
    p.set_defaults(fn=cmd_encode_capacity)

    p = sub.add_parser("perf", help="device-path fps across resolutions")
    p.add_argument(
        "--sampler",
        choices=["auto", "sat", "direct", "fused"],
        default="auto",
        help="single-gaze downsampler: SAT 4-tap, SAT-free direct, or "
        "fused Pallas segment-reduce "
        "(auto = direct <= 4K on TPU, the measured crossover)",
    )
    p.add_argument(
        "--resolutions", nargs="*", choices=["1080p", "4k", "8k", "16k"], default=None
    )
    p.add_argument("--frames", type=int, default=20)
    p.add_argument(
        "--clients", type=int, nargs="*", default=None,
        help="also bench the batched N-gaze serve step (one SAT); pass "
        "several values (e.g. --clients 8 32 128) to sweep for the "
        "marginal-cost knee",
    )
    p.add_argument(
        "--precision",
        choices=["exact", "fast", "mm", "fused", "auto"], default="auto",
        help="unwarp path: fast = rounded vertical blend + pair-u16 "
        "gathers; mm = slab + integer-numerator MXU dots; fused = the "
        "mm math in Pallas kernels (all <=1 LSB of exact)",
    )
    p.add_argument(
        "--batch-sampler", choices=["auto", "sat", "direct", "fused"],
        default="auto",
        help="--clients batch path: sat = one SAT amortized across the "
        "batch (vmapped gather sampling — the measured 48-client knee "
        "was gather-bound); direct/fused = SAT-free gather-free per-gaze "
        "sampling (bit-identical outputs); auto = fused on eligible "
        "accelerator shapes (the round-4 measured winner), sat otherwise",
    )
    p.set_defaults(fn=cmd_perf)

    p = sub.add_parser("doctor", help="environment diagnostic")
    p.add_argument(
        "--probe-transfers", action="store_true",
        help="time host<->device transfers with a deadline (detects a "
        "wedged tunnel readback path without hanging)",
    )
    p.set_defaults(fn=cmd_doctor)

    p = sub.add_parser("montage", help="4-panel comparison image")
    p.add_argument("video")
    p.add_argument("frame", type=int)
    p.add_argument("output")
    _add_io_args(p)
    p.set_defaults(fn=cmd_montage)

    p = sub.add_parser("svd_bench", help="SVD-compressed SAT benchmark")
    p.add_argument("video")
    p.add_argument("--frame", type=int, default=0)
    p.add_argument("--rank", type=int, default=30)
    p.add_argument("--iters", type=int, default=5)
    p.set_defaults(fn=cmd_svd_bench)

    p = sub.add_parser(
        "interpolate_sampled", help="foveate+unwarp one frame to PNGs"
    )
    p.add_argument("video")
    p.add_argument("frame", type=int)
    p.add_argument("out_prefix")
    _add_io_args(p)
    p.set_defaults(fn=cmd_interpolate_sampled)

    for name, fn, hlp in [
        ("encode_bitrate", cmd_encode_bitrate, "offline foveated transcode"),
        ("decode", cmd_decode, "unwarp an already-foveated video"),
        (
            "foveate_no_encoding",
            cmd_foveate_no_encoding,
            "foveate+unwarp transcode without intermediate codec",
        ),
    ]:
        p = sub.add_parser(name, help=hlp)
        p.add_argument("video")
        p.add_argument("output")
        p.add_argument("--quality", type=float, default=None)
        p.add_argument(
            "--bitrate", type=int, default=None,
            help="explicit bits/s via the native rate-controlled encoder "
            "(reference: src/run_satlogrectilinear.cc:669-676)",
        )
        p.add_argument(
            "--codec", default=None,
            choices=["mp4v", "h264", "vp9", "mpeg4"],
            help="output codec (non-mp4v selects the native writer)",
        )
        p.add_argument("--max-frames", type=int)
        p.add_argument("--width", type=int)
        p.add_argument("--height", type=int)
        p.add_argument("--profile", action="store_true", help="print stage timings")
        _add_io_args(p)
        p.set_defaults(fn=fn)

    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if getattr(args, "platform", None):
        # Must run before any jax operation.  The TPU tunnel admits a
        # single process; a client sharing a host with the server runs on
        # CPU (env vars alone are overridden by the tunnel's site hook).
        import jax

        jax.config.update("jax_platforms", args.platform)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
