"""Unit tests for bench.py's wedge-resilient Pallas probe retry.

The headline benchmark measures its Pallas candidates in a killable
subprocess; a probe window that lands ZERO candidates is the wedged
tunnel's signature (a healthy probe lands in seconds off the persistent
cache).  The retry logic must re-probe once after a device-health check
— but never discard partial results, and never raise out of a failed
health check (the floor path still gets its chance).  Pure host-side
logic: no jax, no device.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # noqa: E402


def test_empty_probe_retries_once_after_health_check(monkeypatch):
    calls = []
    monkeypatch.setattr(
        bench, "_probe_pallas_once",
        lambda bound: calls.append(bound) or ({} if len(calls) == 1 else {"fused_full": 900.0}),
    )
    health = []
    monkeypatch.setattr(
        bench, "wait_for_device", lambda window=None: health.append(window)
    )
    assert bench.probe_pallas_candidates() == {"fused_full": 900.0}
    assert len(calls) == 2
    # Retry bound is the tighter default, not the primary one.
    assert calls[0] == 480.0 and calls[1] == 240.0
    # The health re-probe ran with its short bounded window.
    assert health == [300.0]


def test_partial_results_are_never_retried_away(monkeypatch):
    calls = []
    monkeypatch.setattr(
        bench, "_probe_pallas_once",
        lambda bound: calls.append(bound) or {"direct+fused_unwarp": 500.0},
    )
    monkeypatch.setattr(
        bench, "wait_for_device",
        lambda window=None: pytest.fail("health check must not run"),
    )
    assert bench.probe_pallas_candidates() == {"direct+fused_unwarp": 500.0}
    assert len(calls) == 1


def test_failed_health_check_returns_empty_not_raise(monkeypatch):
    monkeypatch.setattr(bench, "_probe_pallas_once", lambda bound: {})

    def no_device(window=None):
        raise SystemExit(3)

    monkeypatch.setattr(bench, "wait_for_device", no_device)
    assert bench.probe_pallas_candidates() == {}


def test_retries_env_zero_disables_retry(monkeypatch):
    monkeypatch.setenv("FOVEAX_BENCH_FUSED_RETRIES", "0")
    calls = []
    monkeypatch.setattr(
        bench, "_probe_pallas_once", lambda bound: calls.append(bound) or {}
    )
    monkeypatch.setattr(
        bench, "wait_for_device",
        lambda window=None: pytest.fail("health check must not run"),
    )
    assert bench.probe_pallas_candidates() == {}
    assert len(calls) == 1
