"""Two-process serving demo: device-holding server + CPU client over a
real socket boundary (VERDICT round-1 item #10).

Evidence for the SURVEY section-5 design point: pixels never cross the
process/network boundary unencoded — the only traffic is JSON gaze
messages client->server and encoded fMP4 fragments server->client.  The
server process owns the accelerator (on the bench host, the TPU tunnel
admits exactly one process); the client runs with the CPU backend forced,
as a second host would.

Measures and prints:
  * gaze fan-in latency: frameRequest sent -> first frame whose echoed
    center matches (the gaze round trip through the server's tick);
  * client receive/decode/unwarp averages;
  * wire bytes per second (from the client's socket, i.e. the DCN cost).

Run (from the repo root):
    python scripts/two_process_demo.py [--frames 60] [--resolution 640x360]
By default both processes force CPU so the demo runs anywhere; pass
--server-device to let the server keep the machine's real backend.
"""

import argparse
import asyncio
import os
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


async def run_client(port: int, video: str, w: int, h: int, frames: int,
                     unwarp: str = "auto"):
    from foveax.config import FoveaxConfig
    from foveax.serve.client import FoveaxClient

    cfg = FoveaxConfig().with_source(w, h)
    client = FoveaxClient(
        f"ws://127.0.0.1:{port}",
        video=video,
        config=cfg,
        gaze_source=lambda i: ((0.3 + 0.01 * i) % 1.0, 0.5),
        max_frames=frames,
        unwarp=unwarp,
    )
    return await client.run()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    # Default small enough that a CPU client sustains the 30 fps tick —
    # the gaze fan-in measurement is only meaningful when the client
    # keeps up (a lagging client measures its own backlog, not the
    # server's gaze application).
    ap.add_argument("--resolution", default="320x180")
    ap.add_argument(
        "--server-device", action="store_true",
        help="let the server keep the real backend (default: force CPU "
        "so the demo runs anywhere)",
    )
    ap.add_argument("--wire-codec", default="auto")
    ap.add_argument(
        "--predict-gaze", default="off", choices=["off", "linear", "kalman"],
        help="server-side gaze prediction (note: with prediction on, the "
        "echoed center is the predicted one, so the matched gaze-apply "
        "metric reads n/a — compare delivered quality instead)",
    )
    ap.add_argument(
        "--client-unwarp", default="auto", choices=["auto", "off"],
        help="off: the client skips the restore — fan-in then measures "
        "the gaze round trip through the production wire even on a host "
        "whose software unwarp cannot sustain the wire rate (the render "
        "half is measured separately: BENCHMARKS stage table)",
    )
    ap.add_argument(
        "--server-args", default="",
        help="extra args appended to the serve command, e.g. "
        "'--readback-deadline 5' for a TPU-held run where a mid-stream "
        "tunnel wedge should degrade to skipped frames quickly",
    )
    args = ap.parse_args()
    w, h = (int(v) for v in args.resolution.split("x"))
    port = free_port()
    video = f"synthetic://{w}x{h}@30/100000"

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    server_cmd = [sys.executable, "-m", "foveax.cli.main"]
    if not args.server_device:
        server_cmd += ["--platform", "cpu"]
    server_cmd += [
        "serve", "--port", str(port), "--loop",
        "--wire-codec", args.wire_codec,
        "--predict-gaze", args.predict_gaze,
    ]
    if args.server_args:
        server_cmd += args.server_args.split()
    print(f"[demo] starting server process: {' '.join(server_cmd)}")
    server = subprocess.Popen(
        server_cmd, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        # Wait for the listen line.
        deadline = time.time() + 60
        while time.time() < deadline:
            line = server.stdout.readline()
            if "Listening" in line:
                break
            if server.poll() is not None:
                print(server.stdout.read())
                raise SystemExit("server died during startup")
        else:
            raise SystemExit("server never started listening")

        # The client always forces CPU (a second process must not touch
        # the single-process device tunnel).
        import jax

        jax.config.update("jax_platforms", "cpu")

        t0 = time.perf_counter()
        stats = asyncio.run(
            run_client(port, video, w, h, args.frames, args.client_unwarp)
        )
        dt = time.perf_counter() - t0
        a = stats.averages()
        print(f"[demo] frames: {a['frames']} in {dt:.1f}s "
              f"({a['frames'] / dt:.1f} fps end-to-end)")
        print(f"[demo] avg receive gap: {a['avg_receive_ms']:.1f} ms")
        print(f"[demo] avg decode: {a['avg_decode_ms']:.2f} ms")
        print(f"[demo] avg unwarp: {a['avg_unwarp_ms']:.2f} ms")
        if stats.gaze_apply_ms:
            g = sorted(stats.gaze_apply_ms)
            p = lambda q: g[min(int(q * len(g)), len(g) - 1)]
            print(f"[demo] gaze fan-in latency (request -> echoed frame): "
                  f"mean {a['avg_gaze_apply_ms']:.1f} ms  "
                  f"p50 {p(0.5):.1f}  p90 {p(0.9):.1f}  max {g[-1]:.1f} "
                  f"(n={len(g)})")
        print(f"[demo] wire: {stats.wire_bytes} bytes in {dt:.1f}s = "
              f"{stats.wire_bytes * 8 / dt / 1e3:.0f} kbit/s "
              f"({stats.wire_bytes * 8 / max(a['frames'], 1) / 1e3:.1f} "
              f"kbit/frame)")
        print("[demo] traffic: JSON gaze messages up, encoded fMP4 down — "
              "no unencoded pixels crossed the process boundary")
        server.terminate()
        try:
            rest = server.stdout.read()
        except Exception:
            rest = ""
        for line in (rest or "").splitlines():
            # Server-side gaze-apply percentiles (arrival -> sampling
            # tick): the apply-at-tick number independent of the
            # client/transport half.
            if "gaze_apply" in line:
                print(f"[demo] server {line.strip()}")
        return 0
    finally:
        server.terminate()
        try:
            server.wait(timeout=10)
        except subprocess.TimeoutExpired:
            server.kill()


if __name__ == "__main__":
    raise SystemExit(main())
