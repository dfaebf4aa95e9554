"""Bench self-adjudication logic (bench_scaled.adjudicate) — pure-logic
tests with probes and load monkeypatched, no Spark session.

VERDICT r6 #1: a ``regressed`` verdict may only be issued from a quiet
box; when the 1-min load around any probe exceeds the hot threshold the
adjudicator must emit ``environment_hot`` instead (r6 committed a false
``regressed`` for text_bm25_topk from a load-7+ box that a quiet probe
refuted at better-than-reference).
"""

from __future__ import annotations

import bench_scaled


def _run(monkeypatch, *, interleaved, ref, probes, loads, hot="8"):
    """Drive adjudicate with scripted solo-probe minima and load samples."""
    probe_iter = iter(probes)
    load_iter = iter(loads)
    monkeypatch.setenv("SPARK_GRAFT_HOT_LOAD", hot)
    monkeypatch.setenv("SPARK_GRAFT_PROBE_BACKOFF", "0")
    monkeypatch.setattr(
        bench_scaled, "solo_probe", lambda d, n, r: next(probe_iter)
    )
    monkeypatch.setattr(
        bench_scaled.os, "getloadavg", lambda: (next(load_iter), 0.0, 0.0)
    )
    timings = {"q": interleaved}
    verdicts = bench_scaled.adjudicate(".", timings, {"q": ref})
    return timings, verdicts


def test_within_threshold_is_not_probed(monkeypatch):
    timings, verdicts = _run(
        monkeypatch, interleaved=1.0, ref=1.0, probes=[], loads=[]
    )
    assert verdicts == {} and timings["q"] == 1.0


def test_recovering_probe_is_noise_and_replaces_timing(monkeypatch):
    timings, verdicts = _run(
        monkeypatch,
        interleaved=9.0,
        ref=2.0,
        probes=[2.1],
        loads=[1.0, 1.2],
    )
    assert verdicts["q"]["verdict"] == "noise"
    assert timings["q"] == 2.1
    assert verdicts["q"]["loads"] == [[1.0, 1.2]]


def test_confirmed_regression_on_quiet_box_is_regressed(monkeypatch):
    timings, verdicts = _run(
        monkeypatch,
        interleaved=9.0,
        ref=2.0,
        probes=[8.0, 7.5],
        loads=[1.0, 1.1, 1.0, 1.2],
    )
    assert verdicts["q"]["verdict"] == "regressed"
    assert timings["q"] == 7.5
    assert len(verdicts["q"]["loads"]) == 2


def test_hot_box_cannot_emit_regressed(monkeypatch):
    # same probe minima as the regression case, but load 9 on a
    # threshold-8 box around the first probe -> environment_hot
    _, verdicts = _run(
        monkeypatch,
        interleaved=9.0,
        ref=2.0,
        probes=[8.0, 7.5],
        loads=[9.0, 9.5, 1.0, 1.0],
    )
    assert verdicts["q"]["verdict"] == "environment_hot"
    assert verdicts["q"]["hot_load_threshold"] == 8.0


def test_probe_failure_is_visible(monkeypatch):
    _, verdicts = _run(
        monkeypatch,
        interleaved=9.0,
        ref=2.0,
        probes=[None],
        loads=[1.0, 1.0],
    )
    assert verdicts["q"]["verdict"] == "probe_failed"
