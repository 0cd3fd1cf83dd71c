"""Gaze prediction: hide one frame of gaze-to-photon latency.

The server applies the latest gaze at the next 30 fps tick (reference:
src/video_server.cc:325-328), so the frame a client sees was sampled at a
gaze one tick old.  A predictor extrapolates the gaze one tick ahead.
The 360_em dataset's own ``pred_*`` fields model exactly this one-frame
lag (reference: src/gaze_view_points.cc:25-31 — they carry the PREVIOUS
frame's value, a zero-order hold).

Three predictors, evaluated against traces by :func:`evaluate_predictors`:

  * ``zero``   — hold the latest gaze (the reference's behavior).
  * ``linear`` — one-step constant-velocity extrapolation from the last
    two gazes (foveax round 1; shipped as ``--predict-gaze``).
  * ``kalman`` — per-axis constant-velocity Kalman filter with
    saccade-aware reset: eye movement alternates smooth pursuit (where
    filtering the velocity beats raw differencing) and ballistic saccades
    (where any extrapolation of the OLD motion is wrong — a large
    innovation resets the filter to the measurement with zero velocity,
    so post-saccade frames do not overshoot).

The x axis lives on the 360-degree seam: all differences/innovations use
the wrap-shortest delta, and positions are kept in [0, 1) mod 1.
"""

from __future__ import annotations

import numpy as np


def _wrap_delta(a: float, b: float) -> float:
    """Shortest signed delta a - b on the unit circle."""
    d = a - b
    if d > 0.5:
        d -= 1.0
    elif d < -0.5:
        d += 1.0
    return d


class ZeroPredictor:
    """Hold the latest gaze (the reference server's behavior)."""

    def update(self, cx: float, cy: float) -> None:
        self.c = (cx, cy)

    def predict(self) -> tuple[float, float]:
        return getattr(self, "c", (0.5, 0.5))


class LinearPredictor:
    """One-step extrapolation from the last two gazes (x wraps)."""

    def __init__(self):
        self.prev = (0.5, 0.5)
        self.cur = (0.5, 0.5)

    def update(self, cx: float, cy: float) -> None:
        self.prev = self.cur
        self.cur = (cx, cy)

    def predict(self) -> tuple[float, float]:
        cx, cy = self.cur
        dx = _wrap_delta(cx, self.prev[0])
        nx = (cx + dx) % 1.0
        ny = min(max(cy + (cy - self.prev[1]), 0.0), 1.0)
        return (nx, ny)


class _Kalman1D:
    """Constant-velocity Kalman filter on one axis (optionally circular).

    State [position, velocity] per tick; F = [[1, 1], [0, 1]].  Tuned for
    normalized gaze units at 30 Hz: measurement noise ~ mouse/eye-tracker
    jitter, process noise ~ pursuit acceleration.
    """

    def __init__(self, wrap: bool, q: float = 4e-5, r: float = 4e-4,
                 saccade: float = 0.08):
        self.wrap = wrap
        self.q, self.r = q, r
        self.saccade = saccade
        self.x = np.array([0.5, 0.0])
        self.p = np.diag([1.0, 1.0])
        self._seen = False

    def _norm(self, v: float) -> float:
        return v % 1.0 if self.wrap else min(max(v, 0.0), 1.0)

    def update(self, z: float) -> None:
        if not self._seen:
            self._seen = True
            self.x = np.array([z, 0.0])
            self.p = np.diag([self.r, 1e-2])
            return
        # Predict.
        f = np.array([[1.0, 1.0], [0.0, 1.0]])
        x = f @ self.x
        x[0] = self._norm(x[0])
        # Piecewise-white-acceleration process noise.
        q = self.q * np.array([[0.25, 0.5], [0.5, 1.0]])
        p = f @ self.p @ f.T + q

        innov = _wrap_delta(z, x[0]) if self.wrap else z - x[0]
        if abs(innov) > self.saccade:
            # Ballistic saccade: the pursuit model is invalid — restart at
            # the measurement with zero velocity and loose covariance.
            self.x = np.array([z, 0.0])
            self.p = np.diag([self.r, 1e-2])
            return
        s = p[0, 0] + self.r
        k = p[:, 0] / s
        self.x = x + k * innov
        self.x[0] = self._norm(self.x[0])
        self.p = p - np.outer(k, p[0, :])

    def predict(self) -> float:
        return self._norm(self.x[0] + self.x[1])


class KalmanPredictor:
    """Saccade-aware constant-velocity Kalman, per axis (x circular)."""

    def __init__(self):
        self.kx = _Kalman1D(wrap=True)
        self.ky = _Kalman1D(wrap=False)

    def update(self, cx: float, cy: float) -> None:
        self.kx.update(cx)
        self.ky.update(cy)

    def predict(self) -> tuple[float, float]:
        return (self.kx.predict(), self.ky.predict())


_MODES = {"zero": ZeroPredictor, "linear": LinearPredictor, "kalman": KalmanPredictor}


def make_predictor(mode: str):
    if mode not in _MODES:
        raise ValueError(f"unknown gaze predictor {mode!r}")
    return _MODES[mode]()


def evaluate_predictors(gazes: np.ndarray, modes=("zero", "linear", "kalman")):
    """Mean wrap-aware prediction error (normalized units) of each mode
    over a (N, 2) gaze trace: at step i the predictor has seen gazes
    [0..i] and is scored against gaze i+1 — the latency the serving loop
    actually hides."""
    gazes = np.asarray(gazes, dtype=np.float64)
    out = {}
    for mode in modes:
        p = make_predictor(mode)
        errs = []
        for i in range(len(gazes) - 1):
            p.update(*gazes[i])
            px, py = p.predict()
            tx, ty = gazes[i + 1]
            errs.append(
                float(np.hypot(_wrap_delta(px, tx), py - ty))
            )
        out[mode] = float(np.mean(errs)) if errs else 0.0
    return out
