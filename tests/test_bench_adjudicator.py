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


def _run(
    monkeypatch, *, interleaved, ref, probes, loads, hot="8", top=0
):
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
    if isinstance(interleaved, dict):
        timings, refs = dict(interleaved), dict(ref)
    else:
        timings, refs = {"q": interleaved}, {"q": ref}
    verdicts = bench_scaled.adjudicate(
        ".", timings, refs, always_probe_top=top
    )
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

# --- r9 calibration (VERDICT r8 What's-wrong #2 / next-round #3) ---------


def test_cold_floor_absorbs_fresh_jvm_startup(monkeypatch):
    # sub-second ref: 1.5x ref = 0.9, but a fresh JVM cannot measure
    # below ~1.5s — a 1.4s probe is cold-start scatter, not a regression
    timings, verdicts = _run(
        monkeypatch,
        interleaved=5.0,
        ref=0.6,
        probes=[1.4],
        loads=[1.0, 1.0],
    )
    assert verdicts["q"]["verdict"] == "noise"
    assert timings["q"] == 1.4


def test_small_ref_tightens_hot_criterion(monkeypatch):
    # ref < 2s: the quiet criterion is min(hot_load, 3.0). Load 4.5 is
    # quiet for the global cpus/4=8 threshold but NOT for a small query
    # whose probe is mostly fixed overhead -> environment_hot, never
    # regressed (the r8 flag-escape mode: sim_pq_topk probed at load 16).
    _, verdicts = _run(
        monkeypatch,
        interleaved=9.0,
        ref=1.2,
        probes=[8.0, 7.5],
        loads=[4.5, 4.4, 4.5, 4.6],
        hot="8",
    )
    assert verdicts["q"]["verdict"] == "environment_hot"
    assert verdicts["q"]["hot_load_threshold"] == 3.0


def test_large_ref_keeps_global_hot_criterion(monkeypatch):
    # ref >= 2s at the same load-4.5 box: probes count as quiet
    _, verdicts = _run(
        monkeypatch,
        interleaved=30.0,
        ref=8.0,
        probes=[28.0, 27.0],
        loads=[4.5, 4.4, 4.5, 4.6],
        hot="8",
    )
    assert verdicts["q"]["verdict"] == "regressed"
    assert verdicts["q"]["hot_load_threshold"] == 8.0


def test_top_n_forced_probes_fire_without_trigger(monkeypatch):
    # nothing exceeded 1.5x ref, but the 2 most expensive queries by ref
    # still get fresh-JVM telemetry; verdict forced_probe_ok, and a
    # better solo min replaces the reported timing
    timings, verdicts = _run(
        monkeypatch,
        interleaved={"big": 20.0, "mid": 5.0, "small": 1.0},
        ref={"big": 19.0, "mid": 5.0, "small": 1.0},
        probes=[18.5, 4.8],
        loads=[1.0, 1.0, 1.0, 1.0],
        top=2,
    )
    assert set(verdicts) == {"big", "mid"}
    assert verdicts["big"]["verdict"] == "forced_probe_ok"
    assert verdicts["big"]["forced"] is True
    assert timings["big"] == 18.5 and timings["mid"] == 4.8
    assert "small" not in verdicts  # not in the top-2 by ref


def test_forced_probe_exceeding_limit_escalates(monkeypatch):
    # a forced probe that lands above threshold x ref runs the normal
    # two-probe confirmation and can yield a quiet-box regressed verdict
    _, verdicts = _run(
        monkeypatch,
        interleaved={"big": 20.0},
        ref={"big": 19.0},
        probes=[40.0, 39.0],
        loads=[1.0, 1.0, 1.0, 1.0],
        top=1,
    )
    assert verdicts["big"]["verdict"] == "regressed"
    assert verdicts["big"]["forced"] is True


def test_triggered_query_not_probed_twice_when_in_top_n(monkeypatch):
    # a query that already tripped the trigger is excluded from the
    # forced list: exactly one probe sequence runs
    timings, verdicts = _run(
        monkeypatch,
        interleaved={"big": 40.0},
        ref={"big": 19.0},
        probes=[18.0],
        loads=[1.0, 1.0],
        top=1,
    )
    assert verdicts["big"]["verdict"] == "noise"
    assert verdicts["big"]["forced"] is False
    assert timings["big"] == 18.0


def test_bench_ref_refuses_foreign_cpu_count(tmp_path, monkeypatch):
    """A ref measured on a different core count must disable
    adjudication (per-query minima move with hardware), while a
    matching or absent host_cpus field keeps it enabled."""
    import json

    from bench_scaled import load_bench_ref

    monkeypatch.setenv("SPARK_GRAFT_CPUS", "32")
    ref = {
        "round": 11,
        "host_cpus": 32,
        "headline_sf": 0.1,
        "headline": {"q1": 1.0},
    }
    p = tmp_path / "ref.json"
    p.write_text(json.dumps(ref))
    assert load_bench_ref("headline", 0.1, path=str(p)) == {"q1": 1.0}

    ref["host_cpus"] = 16  # measured on another box
    p.write_text(json.dumps(ref))
    assert load_bench_ref("headline", 0.1, path=str(p)) == {}

    del ref["host_cpus"]  # pre-r12 ref: accepted for compatibility
    p.write_text(json.dumps(ref))
    assert load_bench_ref("headline", 0.1, path=str(p)) == {"q1": 1.0}


def test_load_gate_warn_and_quiet(monkeypatch):
    """VERDICT r12 #7: the gate must flag a hot box in the artifact
    (hot=True + a human-readable warning) and stay silent on a quiet
    one; the threshold follows SPARK_GRAFT_HOT_LOAD."""
    import bench_scaled

    monkeypatch.setenv("SPARK_GRAFT_CPUS", "32")
    monkeypatch.delenv("SPARK_GRAFT_HOT_LOAD", raising=False)
    quiet = bench_scaled.load_gate(1.3)
    assert quiet == {
        "threshold": 8.0,
        "load_1min": 1.3,
        "hot": False,
        "warning": None,
    }
    hot = bench_scaled.load_gate(12.7)
    assert hot["hot"] and hot["threshold"] == 8.0
    assert "12.7" in hot["warning"] and "WARNING" in hot["warning"]
    monkeypatch.setenv("SPARK_GRAFT_HOT_LOAD", "2.0")
    assert bench_scaled.load_gate(2.5)["hot"]
    assert not bench_scaled.load_gate(1.5)["hot"]


def test_always_probe_by_name_fires_regardless_of_rank(monkeypatch):
    # r13 blind spot: dedup_cc_star drifted +19% over two rounds while
    # below both the top-N cutoff and the 1.5x trigger — named legs in
    # always_probe get forced telemetry anyway (and are not probed
    # twice when they already ranked or triggered)
    probe_iter = iter([18.5, 2.9])  # probe order: top-N (big), then named (cc)
    monkeypatch.setenv("SPARK_GRAFT_HOT_LOAD", "8")
    monkeypatch.setenv("SPARK_GRAFT_PROBE_BACKOFF", "0")
    monkeypatch.setattr(
        bench_scaled, "solo_probe", lambda d, n, r: next(probe_iter)
    )
    monkeypatch.setattr(
        bench_scaled.os, "getloadavg", lambda: (1.0, 0.0, 0.0)
    )
    timings = {"cc": 3.2, "big": 20.0, "small": 1.0}
    refs = {"cc": 3.0, "big": 19.0, "small": 1.0}
    verdicts = bench_scaled.adjudicate(
        ".", timings, refs, always_probe_top=1, always_probe=("cc", "big")
    )
    # cc: neither triggered (3.2 < 1.5x3.0) nor top-1 (big is) — still
    # probed by name; big probed once only (as the top-1 entry)
    assert set(verdicts) == {"cc", "big"}
    assert verdicts["cc"]["forced"] is True
    assert verdicts["cc"]["verdict"] == "forced_probe_ok"
    assert timings["cc"] == 2.9
    assert verdicts["big"]["verdict"] == "forced_probe_ok"
