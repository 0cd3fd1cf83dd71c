"""Gaze predictors (foveax/serve/gazepred.py): accuracy orderings on the
two eye-movement regimes, saccade reset, 360 wrap, server integration."""

import numpy as np
import pytest

from foveax.io.gaze import GazeViewPoints, synthetic_trace
from foveax.serve.gazepred import (
    KalmanPredictor,
    evaluate_predictors,
    make_predictor,
)


def _trace(saccades=False, n=600):
    return GazeViewPoints.from_text(
        synthetic_trace(n, saccades=saccades)
    ).gaze_array()


def test_kalman_best_on_noisy_pursuit():
    res = evaluate_predictors(_trace())
    assert res["kalman"] < res["zero"], res
    # Raw one-step differencing amplifies measurement noise — the round-1
    # linear extrapolator LOSES to zero-hold on jittery traces, which is
    # what motivates the filter.
    assert res["kalman"] < res["linear"], res


def test_kalman_best_with_saccades():
    res = evaluate_predictors(_trace(saccades=True))
    assert res["kalman"] < res["zero"], res
    assert res["kalman"] < res["linear"], res


def test_kalman_tracks_clean_pursuit_velocity():
    """On noise-free constant-velocity pursuit the filter must converge to
    near-zero prediction error while zero-hold pays one tick of lag."""
    n = 120
    g = np.stack([0.2 + 0.004 * np.arange(n), np.full(n, 0.5)], axis=1)
    res = evaluate_predictors(g)
    assert res["kalman"] < 0.25 * res["zero"], res


def test_saccade_reset_no_overshoot():
    """After a ballistic jump the filter restarts at the measurement with
    zero velocity: the next prediction must sit near the new fixation,
    not extrapolate the jump."""
    p = KalmanPredictor()
    for i in range(30):
        p.update(0.3 + 0.002 * i, 0.5, t=i / 30)
    p.update(0.75, 0.5, t=31 / 30)  # saccade
    px, py = p.predict(1 / 30)
    assert abs(px - 0.75) < 0.02, px
    p.update(0.75, 0.5, t=32 / 30)
    px, _ = p.predict(1 / 30)
    assert abs(px - 0.75) < 0.02, px


def test_wrap_prediction_across_seam():
    """Pursuit moving right across x = 1 predicts across the seam."""
    p = KalmanPredictor()
    xs = (np.arange(40) * 0.01 + 0.8) % 1.0  # 0.8 ... 1.0 ... 0.19
    for i, x in enumerate(xs):
        p.update(float(x), 0.5, t=i / 30)
    px, _ = p.predict(1 / 30)
    want = (xs[-1] + 0.01) % 1.0
    d = abs(px - want)
    assert min(d, 1.0 - d) < 0.02, (px, want)


def test_kalman_horizon_independent_of_message_rate():
    """The prediction horizon is the SERVER tick, not the client's
    message interval: a 200 Hz mousemove stream moving at constant
    velocity must still predict one 33 ms tick ahead (a per-message-step
    filter would predict only 5 ms ahead and leave ~85% of the lag)."""
    v = 0.3  # units/second
    p = KalmanPredictor()
    for i in range(400):
        t = i / 200.0
        p.update(0.1 + v * t, 0.5, t=t)
    t_last = 399 / 200.0
    px, _ = p.predict(1 / 30)
    want = 0.1 + v * (t_last + 1 / 30)
    assert abs(px - want) < 0.004, (px, want)


def test_make_predictor_rejects_unknown():
    with pytest.raises(ValueError):
        make_predictor("psychic")


def test_server_modes_and_back_compat():
    from foveax.config import FoveaxConfig
    from foveax.serve.server import FoveaxServer, Session

    cfg = FoveaxConfig(
        source_width=96, source_height=64, reduced_width=48, reduced_height=32
    )
    assert FoveaxServer(cfg, predict_gaze=True).predict_gaze == "linear"
    assert FoveaxServer(cfg, predict_gaze=False).predict_gaze == "off"
    with pytest.raises(ValueError):
        FoveaxServer(cfg, predict_gaze="psychic")

    server = FoveaxServer(cfg, predict_gaze="kalman")
    s = Session(ws=None, server=server)
    assert s.effective_center() == (0.5, 0.5)  # no updates yet
    s.update_gaze(0.3, 0.5)
    s.update_gaze(0.32, 0.5)
    cx, cy = s.effective_center()
    assert 0.0 <= cx <= 1.0 and 0.0 <= cy <= 1.0
    assert abs(cx - 0.32) < 0.05  # near the pursuit, one tick ahead
