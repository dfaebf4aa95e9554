"""PageRank operator vs a pure-Python power-method reference."""

from __future__ import annotations

from collections import Counter

import pytest

from home_credit_data_engineering_spark.operators.graph import pagerank


def _ref(edges, iterations=3, d=0.85):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    deg = Counter(s for s, _ in edges)
    n = float(len(nodes))
    r = {v: round(1.0 / n, 9) for v in nodes}
    for _ in range(iterations):
        recv = {v: 0.0 for v in nodes}
        for s, t in edges:
            recv[t] += round(r[s] / deg[s], 9)
        dang = sum(round(r[v], 9) for v in nodes if deg[v] == 0)
        r = {
            v: round((1.0 - d) / n + d * (recv[v] + dang / n), 9)
            for v in nodes
        }
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, schema="src string, dst string")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_two_cycle_is_uniform_fixed_point(spark):
    got = _run(spark, [("a", "b"), ("b", "a")], iterations=4)
    assert got["a"] == pytest.approx(0.5, abs=1e-8)
    assert got["b"] == pytest.approx(0.5, abs=1e-8)


def test_matches_python_reference_with_dangling(spark):
    # b and d are dangling sinks; c has out-degree 2
    edges = [("a", "b"), ("c", "b"), ("c", "d"), ("a", "d"), ("e", "a")]
    got = _run(spark, edges, iterations=3)
    ref = _ref(edges, iterations=3)
    assert set(got) == set(ref)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=5e-9), v


def test_rank_mass_is_conserved(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")]
    got = _run(spark, edges, iterations=5)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-6)


def test_sink_accumulates_more_than_source(spark):
    # everyone points at 'hub'; hub dangles
    edges = [("a", "hub"), ("b", "hub"), ("c", "hub")]
    got = _run(spark, edges, iterations=3)
    assert got["hub"] > got["a"] == got["b"] == got["c"]


def test_zero_iterations_is_uniform(spark):
    got = _run(spark, [("a", "b"), ("b", "c")], iterations=0)
    for v in ("a", "b", "c"):
        assert got[v] == pytest.approx(1 / 3, abs=1e-9)


def test_negative_iterations_rejected(spark):
    df = spark.createDataFrame([("a", "b")], schema="src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, iterations=-1)
