"""Misra-Gries heavy-hitter guarantees on constructed streams (the
engine-level certificate is oracle-verified in test_oracle_parity via
text_heavy_hitters_mg / combo_approx_sketches)."""

from __future__ import annotations

from collections import Counter

import pytest

from home_credit_data_engineering_spark.operators.sketch import (
    mg_heavy_hitters,
    mg_partition_summaries,
)


def _stream_df(spark, items, partitions=4):
    return spark.createDataFrame(
        [(x,) for x in items], schema="item string"
    ).repartition(partitions)


def _zipfish(n_hot=3, hot=400, tail=200):
    items = []
    for h in range(n_hot):
        items += [f"hot{h}"] * hot
    items += [f"tail{i}" for i in range(tail)]
    return items


def test_guarantees_on_skewed_stream(spark):
    items = _zipfish()
    k = 10
    n = len(items)
    exact = Counter(items)
    got = {
        r["item"]: (r["est"], r["err_bound"])
        for r in mg_heavy_hitters(_stream_df(spark, items), "item", k).collect()
    }
    assert len(got) <= k
    bound = n / (k + 1)
    for item, (est, err) in got.items():
        assert err == pytest.approx(bound)
        assert est <= exact[item]  # undercount only
        assert est >= exact[item] - bound - 1e-9
    # containment: every item with true count > N/(k+1) is present
    for item, c in exact.items():
        if c > bound:
            assert item in got, item


def test_no_compaction_means_exact(spark):
    # distinct <= k: the summary never compacts, estimates are exact
    items = ["a"] * 5 + ["b"] * 3 + ["c"] * 2
    got = {
        r["item"]: r["est"]
        for r in mg_heavy_hitters(_stream_df(spark, items), "item", 10).collect()
    }
    assert got == {"a": 5, "b": 3, "c": 2}


def test_partition_summaries_bounded(spark):
    items = [f"w{i % 50}" for i in range(2000)]
    k = 7
    rows = mg_partition_summaries(
        _stream_df(spark, items, partitions=5), "item", k
    ).collect()
    per_part = Counter()
    # can't see partition ids from the result; bound the total instead
    assert len(rows) <= 5 * k
    assert all(r["cnt"] >= 1 for r in rows)


def test_validation(spark):
    df = _stream_df(spark, ["a"])
    with pytest.raises(ValueError):
        mg_heavy_hitters(df, "item", 0)
    with pytest.raises(ValueError):
        mg_partition_summaries(df, "item", 0)


def test_bigint_items_supported(spark):
    # schema-derived item type: a bigint stream round-trips
    df = spark.createDataFrame(
        [(i % 5,) for i in range(100)], schema="item bigint"
    ).repartition(3)
    got = {r["item"]: r["est"] for r in mg_heavy_hitters(df, "item", 10).collect()}
    assert set(got) == {0, 1, 2, 3, 4}
    assert all(est == 20 for est in got.values())
