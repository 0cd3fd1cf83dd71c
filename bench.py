"""Headline benchmark: 4K foveated full-path frames/sec on one chip.

Measures the complete device compute path per frame — gaze-centered
log-rectilinear box-filter downsample of a 3840x2160 equirect frame to the
reduced frame (16*ceil(dim/1.8/16) rule) and the inverse bilinear unwarp
back to 4K — with the gaze moving every frame (no recompilation).  Two
bit-compatible configurations are measured and the better one reported:
(a) the SAT-free direct XLA sampler (foveax/core/direct.py; bit-identical
to the SAT path, ~1.5x faster end-to-end at 4K — 462 vs 319 fps
same-window) + the integer-numerator mm unwarp, and (b) the kernel-
resident Pallas pair (segment-reduce sampler + fused unwarp), guarded so
a lowering failure falls back to (a).  The SAT path remains the
multi-gaze serving amortization (BENCHMARKS.md "Stage costs").  Frames
are pre-staged in HBM; host video decode is a separate, overlappable
pipeline stage (see foveax.pipeline.runner) exactly as in the reference,
where decode runs on the host while the GPU builds the SAT (reference:
src/video_server.cc:287-335).

Baseline: the reference server is hard-paced at 30 fps at 1080p on a
desktop GPU (reference: src/video_server.cc:314); the rebuild target is
>=60 fps at 4K (BASELINE.md).  vs_baseline reports value/60.0 against that
target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Hang containment: Pallas/Mosaic candidates are measured in a KILLABLE
subprocess (`bench.py --fused-probe`) before the main process touches
jax — an on-chip Mosaic compile that neither fails nor returns (observed
for the 4K segment-reduce sampler through this relay) must never hang
the headline run.  The subprocess prints one `cand-fps <name> <fps>`
line per candidate as it lands; the parent takes the max over whatever
arrived, with the known-good XLA direct+mm path measured in-process as
the floor.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


def wait_for_device(window: float | None = None) -> None:
    """Bounded wait for a healthy device before initializing jax in-process.

    The TPU tunnel in this environment intermittently wedges at device
    init (see CLAUDE.md): the first jax op then blocks forever with no
    client-side recovery.  Initializing jax in the main process during an
    outage would hang this benchmark indefinitely; instead, probe device
    init in a killable subprocess and retry across a bounded window, then
    fail fast with a diagnostic.  A probe also naturally waits out a
    concurrent tunnel holder (the tunnel admits one process at a time).
    """
    probe_timeout = float(os.environ.get("FOVEAX_BENCH_PROBE_TIMEOUT", "120"))
    if window is None:
        window = float(os.environ.get("FOVEAX_BENCH_PROBE_WINDOW", "2400"))
    allow_cpu = os.environ.get("FOVEAX_BENCH_ALLOW_CPU", "") == "1"
    code = (
        "import jax, jax.numpy as jnp\n"
        "print('probe-ok', int(jnp.arange(8).sum()), jax.default_backend())\n"
    )
    deadline = time.monotonic() + window
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                timeout=probe_timeout,
                capture_output=True,
                text=True,
            )
            if r.returncode == 0 and "probe-ok" in r.stdout:
                # The site hook registers platforms as "axon,cpu", so a
                # failed device init (wedged tunnel, or another process
                # holding the one-process tunnel) falls through to the CPU
                # backend and the probe still exits 0.  Gate on the backend
                # token the probe printed: a cpu-backed probe means "no
                # device yet", and must keep retrying, not start an
                # hours-long CPU run of the 4K path.
                backend = r.stdout.split()[-1].strip()
                if backend != "cpu" or allow_cpu:
                    return
                detail = ["probe fell back to cpu backend (no device)"]
            else:
                detail = (r.stderr or r.stdout).strip().splitlines()[-1:]
        except subprocess.TimeoutExpired:
            detail = [f"device init hung > {probe_timeout:.0f}s (wedged tunnel?)"]
        remaining = deadline - time.monotonic()
        print(
            f"# bench: device probe {attempt} failed ({'; '.join(detail)}); "
            f"{max(remaining, 0):.0f}s left in retry window",
            file=sys.stderr,
        )
        if remaining <= 0:
            print(
                "# bench: no healthy device within the retry window; aborting "
                "rather than hanging at jax init",
                file=sys.stderr,
            )
            raise SystemExit(3)
        time.sleep(min(60.0, max(remaining, 1.0)))


def probe_pallas_candidates() -> dict[str, float]:
    """Measure the Pallas candidates in a killable subprocess.

    Returns {candidate_name: fps} for every candidate whose line arrived
    before the bound — on timeout the child is killed and the partial
    stdout is still parsed, so a hang in the SECOND candidate cannot
    discard the first one's result.

    A probe that lands ZERO candidates is the wedged-tunnel signature
    (every fused compile is 0.1 s from the persistent cache and the run
    itself is ~2 s, so an empty 480 s window is transport, not Mosaic —
    observed in the round-4 batch-D window, where the one-shot probe
    silently cost the headline 979→442).  Retry once by default after
    re-probing device health with a short bounded window; partial
    results are never retried away.
    """
    bound = float(os.environ.get("FOVEAX_BENCH_FUSED_TIMEOUT", "480"))
    retries = int(os.environ.get("FOVEAX_BENCH_FUSED_RETRIES", "1"))
    # Retry attempts use a tighter bound: with the persistent cache warm
    # a healthy probe lands in well under a minute, so the retry exists
    # to catch a HEALED tunnel, not to out-wait a wedge twice.
    retry_bound = float(
        os.environ.get("FOVEAX_BENCH_FUSED_RETRY_TIMEOUT", "240")
    )
    for attempt in range(retries + 1):
        fps = _probe_pallas_once(bound if attempt == 0 else retry_bound)
        if fps or attempt >= retries:
            return fps
        print(
            "# bench: empty pallas probe (wedged window?); re-probing "
            "device health, then retrying",
            file=sys.stderr,
        )
        try:
            wait_for_device(
                window=float(
                    os.environ.get("FOVEAX_BENCH_RETRY_HEALTH_WINDOW", "300")
                )
            )
        except SystemExit:
            # No healthy device inside the retry window: hand back the
            # empty result and let the floor path decide (it waited for a
            # device once already and may still land a measurement).
            return fps
    return fps


def _probe_pallas_once(bound: float) -> dict[str, float]:
    out = ""
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--fused-probe"],
            timeout=bound,
            capture_output=True,
            text=True,
        )
        out = r.stdout or ""
        if r.returncode != 0:
            tail = (r.stderr or "").strip().splitlines()[-1:]
            print(
                f"# bench: pallas probe exited rc={r.returncode} "
                f"({'; '.join(tail)})"[:200],
                file=sys.stderr,
            )
    except subprocess.TimeoutExpired as e:
        out = (
            e.stdout.decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
        )
        err = (
            e.stderr.decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
        )
        # The child narrates its progress to stderr ("# probe: backend
        # ...", "# probe: measuring <name>"); surface the tail so a
        # killed probe says WHERE it hung (attach vs compile vs run).
        tail = "; ".join(err.strip().splitlines()[-2:])
        print(
            f"# bench: pallas probe killed at {bound:.0f}s "
            f"(last: {tail or 'no output — hung at device attach?'}); "
            "using lines that landed",
            file=sys.stderr,
        )
    fps: dict[str, float] = {}
    for line in out.splitlines():
        parts = line.split()
        if len(parts) == 3 and parts[0] == "cand-fps":
            try:
                fps[parts[1]] = float(parts[2])
            except ValueError:
                pass
    return fps


def main(fused_probe: bool = False) -> None:
    # The probe CHILD must not run wait_for_device: its health probes are
    # yet another process each (the tunnel admits one at a time, and a
    # probe killed mid-attach can poison the next attach), and under a
    # flapping tunnel they can eat the child's entire kill bound before a
    # single candidate runs — observed in the round-4 batch-C/D/E windows,
    # where the child died at its 240 s bound with zero candidate lines
    # while the parent's floor measured fine seconds later.  A hung child
    # attach is exactly what the parent's kill-timeout contains; a
    # cpu-backend fallback is gated in-process below.
    if not fused_probe:
        wait_for_device()

    # Pallas candidates ride a killable subprocess BEFORE this process
    # initializes jax (the tunnel admits one process at a time).
    pallas_fps = {} if fused_probe else probe_pallas_candidates()

    # Persistent compilation cache: remote compiles cost 15-40 s per jit
    # shape through the relay; caching makes driver re-runs and retries
    # after a partial failure start measuring almost immediately.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/foveax_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

    import jax
    import jax.numpy as jnp

    if fused_probe:
        # In-process replacement for the child's former wait_for_device:
        # a cpu-backend fallback (wedged tunnel, or the tunnel held by
        # another process) must exit loudly, not run 4K interpret-mode
        # Pallas for hours.  Device init itself may hang here — the
        # parent's kill bound contains that.
        print(f"# probe: backend {jax.default_backend()}", file=sys.stderr)
        if (
            jax.default_backend() == "cpu"
            and os.environ.get("FOVEAX_BENCH_ALLOW_CPU", "") != "1"
        ):
            print("# probe: cpu backend (no device); bailing", file=sys.stderr)
            raise SystemExit(4)

    from foveax.config import FoveaxConfig, reduced_dim
    from foveax.core.direct import sample_rect_direct
    from foveax.core.logrect import make_grid
    from foveax.core.unwarp import unwarp_rect

    src_w, src_h = 3840, 2160
    red_w, red_h = reduced_dim(src_w), reduced_dim(src_h)
    cfg = FoveaxConfig(
        source_width=src_w,
        source_height=src_h,
        reduced_width=red_w,
        reduced_height=red_h,
    )
    grid = make_grid(red_w, red_h, src_w, src_h)

    # Channel-planar end-to-end: the size-3 channel axis never lands on
    # the vector lanes, and no transposes sit between stages.  Frames
    # are device-resident planar; production ingest (H2D + one layout
    # transpose per decoded frame) overlaps device compute via async
    # dispatch (see foveax.pipeline.runner).
    @jax.jit
    def step_direct_mm(frame_chw, center):
        reduced = sample_rect_direct(frame_chw, grid, center, out_layout="chw")
        # precision="mm" EXPLICITLY (not "auto", which resolves to the
        # fused Pallas unwarp at 4K): this in-process step is the
        # known-good pure-XLA floor — every Pallas/Mosaic compile must
        # stay in the killable probe subprocess so a non-returning
        # Mosaic compile can never hang the headline run.
        restored = unwarp_rect(
            reduced,
            src_w,
            src_h,
            center,
            in_layout="chw",
            out_layout="chw",
            precision="mm",
        )
        return reduced, restored

    @jax.jit
    def step_direct_fused_unwarp(frame_chw, center):
        # Hybrid candidate: XLA direct sampler + kernel-resident fused
        # unwarp (foveax/kernels/unwarp_pl.py) — measured 1.85 vs mm's
        # 2.5 ms/frame at 4K on chip (stage loops, round 3).
        from foveax.kernels.unwarp_pl import unwarp_rect_fused

        reduced = sample_rect_direct(frame_chw, grid, center, out_layout="chw")
        restored = unwarp_rect_fused(
            reduced, src_w, src_h, center,
            in_layout="chw", out_layout="chw",
        )
        return reduced, restored

    @jax.jit
    def step_fused(frame_chw, center):
        # Kernel-resident candidate: Pallas segment-reduce sampler + fused
        # unwarp (foveax/kernels/segreduce.py, unwarp_pl.py) — sampler
        # bit-identical to the path above, unwarp <= 1 LSB of exact.
        from foveax.kernels.segreduce import sample_rect_fused
        from foveax.kernels.unwarp_pl import unwarp_rect_fused

        reduced = sample_rect_fused(frame_chw, grid, center, out_layout="chw")
        restored = unwarp_rect_fused(
            reduced, src_w, src_h, center,
            in_layout="chw", out_layout="chw",
        )
        return reduced, restored

    def make_fused_step():
        # A fresh @jax.jit per env-knob candidate: the kernels read the
        # knobs at trace time, so each candidate needs its own function
        # object (its own trace) with the env set around measure().
        @jax.jit
        def step(frame_chw, center):
            from foveax.kernels.segreduce import sample_rect_fused
            from foveax.kernels.unwarp_pl import unwarp_rect_fused

            reduced = sample_rect_fused(
                frame_chw, grid, center, out_layout="chw"
            )
            restored = unwarp_rect_fused(
                reduced, src_w, src_h, center,
                in_layout="chw", out_layout="chw",
            )
            return reduced, restored

        return step

    rng = np.random.default_rng(0)
    frame = jax.device_put(
        rng.integers(0, 256, size=(3, src_h, src_w), dtype=np.uint8)
    )

    # Gaze trace: a smooth scan path, one gaze per frame.
    n_iters = 30
    t = np.linspace(0.0, 1.0, n_iters + 2)
    gaze = np.stack(
        [0.5 + 0.45 * np.sin(2 * np.pi * t), 0.5 + 0.3 * np.cos(2 * np.pi * t)],
        axis=-1,
    ).astype(np.float32)
    centers = [jax.device_put(g) for g in gaze]

    # Timing methodology: chain each frame's restored output into the next
    # frame's input (a data dependency) and force completion with a scalar
    # readback.  Plain block_until_ready is not a reliable fence through
    # remote-attached device transports, so async-loop timings can under-
    # report; the dependency chain bounds true serialized device time.
    def run_chain(step, n: int) -> float:
        y = frame
        t0 = time.perf_counter()
        for i in range(n):
            _, y = step(y, centers[i])
        float(jnp.sum(y.astype(jnp.uint32)))
        return time.perf_counter() - t0

    def measure(step) -> float:
        run_chain(step, 2)  # warm-up / compile
        # Paired-difference timing with a median over 3 samples per side:
        # relay RPC hiccups of 100+ ms are routine through this tunnel, so
        # a single hiccup landing in the short base run can exceed the
        # whole 32-frame run and flip the subtraction negative (observed:
        # a clamped dt reported 3e10 "fps" for fused_full, 2026-08-19).
        # The plausibility floor: the 4K full path writes >= 25 MB of u8
        # output per frame, so even at 2x HBM speed-of-light a frame
        # costs > 12 us — a smaller delta is a measurement artifact.
        # Retry the whole triple up to 3x before giving up: the headline
        # path must emit its JSON line even through a noisy window (a
        # probe candidate may raise; main() catches the final failure).
        last = None
        for _ in range(3):
            bases = sorted(run_chain(step, 2) for _ in range(3))
            totals = sorted(run_chain(step, n_iters + 2) for _ in range(3))
            dt = totals[1] - bases[1]
            if dt > n_iters * 12e-6:
                return n_iters / dt
            last = dt
            print(
                f"# bench: implausible delta {dt * 1e3:.3f} ms over "
                f"{n_iters} frames — retrying (relay noise?)",
                file=sys.stderr,
            )
        raise RuntimeError(
            f"implausible timing delta {last * 1e3:.3f} ms over "
            f"{n_iters} frames after 3 attempts (relay noise?)"
        )

    if fused_probe:
        # Child mode: measure each Pallas candidate, emitting its line as
        # soon as it lands (the parent parses partial output after a
        # kill, so candidate order = value order: the proven-on-chip
        # hybrid first, the full-fused pipeline second).
        candidates = [("direct+fused_unwarp", step_direct_fused_unwarp)]
        # Round 4 root-caused the round-3 ">420 s 4K Mosaic compile" as
        # the TUNNEL WEDGE, not Mosaic: the full fused sampler compiles
        # in 3.0 s cold and 0.1 s from the persistent cache
        # (BENCHMARKS.md "root-caused").  The full-fused candidate is
        # therefore on by default — still inside this killable probe
        # (the wedge itself remains real), with partial output honored.
        # FOVEAX_BENCH_TRY_FUSED_FULL=0 opts out.
        candidate_env: dict[str, dict[str, str]] = {}
        if os.environ.get("FOVEAX_BENCH_TRY_FUSED_FULL", "1") == "1":
            # Default config is now xy-order + int8 unwarp dots (the
            # round-5 same-window ladder winner); the conservative
            # yx/f32 variant stays as a parity-gated candidate so the
            # headline can still take it in a window where the winner
            # regresses.
            candidates.append(("fused_full", step_fused))
            if os.environ.get("FOVEAX_BENCH_TRY_INT8", "1") == "1":
                candidates.append(("fused_full_yxf32", make_fused_step()))
                candidate_env["fused_full_yxf32"] = {
                    "FOVEAX_SEGREDUCE_INT8": "0",
                    "FOVEAX_UNWARP_INT8": "0",
                    "FOVEAX_UNWARP_ORDER": "yx",
                }
                candidates.append(("fused_full_sampi8", make_fused_step()))
                candidate_env["fused_full_sampi8"] = {
                    "FOVEAX_SEGREDUCE_INT8": "1",
                }
        def knob_parity_ok(step) -> bool:
            # The env-knob candidates (s8 dots, xy order) are A/B variants
            # whose Mosaic lowering is chip-dependent: a lowering that
            # *runs* but miscomputes must not take the headline on speed.
            # Contract: sampler bit-identical to the knobs-off fused pair;
            # unwarp <= 1 LSB of exact each, so <= 2 LSB between two
            # variants.  One extra frame + scalar readbacks (~2 ms + RPC).
            r_ref, u_ref = step_fused(frame, centers[0])
            r_c, u_c = step(frame, centers[0])
            samp_bad = int(jnp.sum((r_ref != r_c).astype(jnp.int32)))
            unw_err = int(
                jnp.max(
                    jnp.abs(
                        u_ref.astype(jnp.int32) - u_c.astype(jnp.int32)
                    )
                )
            )
            print(
                f"# probe: knob parity samp_mismatch={samp_bad} "
                f"unwarp_maxerr={unw_err}",
                file=sys.stderr, flush=True,
            )
            return samp_bad == 0 and unw_err <= 2

        for name, step in candidates:
            try:
                print(f"# probe: measuring {name}", file=sys.stderr, flush=True)
                env = candidate_env.get(name, {})
                os.environ.update(env)
                try:
                    fps_val = measure(step)
                    if env and not knob_parity_ok(step):
                        print(
                            f"# candidate {name} DISCARDED: knob parity "
                            "check failed", file=sys.stderr,
                        )
                        continue
                    print(f"cand-fps {name} {fps_val:.2f}", flush=True)
                finally:
                    for kn in env:
                        os.environ.pop(kn, None)
            except Exception as e:  # pragma: no cover - toolchain dependent
                print(f"# candidate {name} failed: {e!r}"[:160], file=sys.stderr)
        return

    # The known-good XLA path is the floor, measured in-process; the
    # Pallas candidates (subprocess, bounded) may beat it but can never
    # cost the headline — neither by a Mosaic lowering failure nor by a
    # non-returning compile.  Conversely a relay-noise floor failure
    # must not cost the headline when a plausible candidate exists.
    try:
        fps = measure(step_direct_mm)
    except RuntimeError as e:
        if not pallas_fps:
            raise
        print(f"# bench: floor measurement failed ({e}); "
              "headline from probe candidates", file=sys.stderr)
        fps = 0.0
    for name, cand in pallas_fps.items():
        # Belt-and-braces vs the child's plausibility floor: never let a
        # physically impossible probe line (HBM roofline at 4K is ~48k
        # fps) become the headline.
        if cand > 2e4:
            print(f"# bench: discarding implausible {name}: {cand:.2f} fps",
                  file=sys.stderr)
            continue
        if cand > fps:
            print(f"# bench: pallas candidate {name} leads: {cand:.2f} fps",
                  file=sys.stderr)
        fps = max(fps, cand)

    if fps <= 0.0:
        raise RuntimeError("no plausible measurement from floor or probes")
    print(
        json.dumps(
            {
                "metric": "foveated_4k_full_path_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 60.0, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main(fused_probe="--fused-probe" in sys.argv[1:]))
