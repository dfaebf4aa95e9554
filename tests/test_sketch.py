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


# ---------------------------------------------------------------------------
# KMV distinct sketch
# ---------------------------------------------------------------------------

from home_credit_data_engineering_spark.operators.sketch import (
    cms_counters,
    cms_estimate,
    kmv_distinct,
)


def test_kmv_exact_path_below_k(spark):
    df = spark.range(0, 50).selectExpr("CAST(id AS STRING) AS item")
    row = kmv_distinct(df, "item", k=128).collect()[0]
    assert row["n_kept"] == 50
    assert row["theta"] is None
    assert row["est"] == 50.0


def test_kmv_estimator_within_bound(spark):
    n = 5000
    df = spark.range(0, n * 3).selectExpr(
        "CAST(id % 5000 AS STRING) AS item"  # heavy duplication
    )
    row = kmv_distinct(df, "item", k=128).collect()[0]
    assert row["n_kept"] == 128 and row["theta"] is not None
    # 4-sigma at k=128: ~36% relative error
    assert abs(row["est"] - n) / n < 0.4


def test_kmv_partitioning_invariant(spark):
    df = spark.range(0, 2000).selectExpr("CAST(id AS STRING) AS item")
    a = kmv_distinct(df.repartition(1), "item", k=64).collect()[0]
    b = kmv_distinct(df.repartition(7), "item", k=64).collect()[0]
    assert a == b


def test_kmv_is_pure_function_of_item_set(spark):
    base = spark.range(0, 1000).selectExpr("CAST(id AS STRING) AS item")
    dup = base.union(base).union(base)  # multiplicity must not matter
    a = kmv_distinct(base, "item", k=64).collect()[0]
    b = kmv_distinct(dup, "item", k=64).collect()[0]
    assert a == b


def test_kmv_rejects_tiny_k(spark):
    import pytest as _pt

    df = spark.range(3).selectExpr("CAST(id AS STRING) AS item")
    with _pt.raises(ValueError):
        kmv_distinct(df, "item", k=1).collect()


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_cms_overcount_only_and_exact_when_sparse(spark):
    # 20 distinct items in a 4x512 grid: overcount requires all 4 rows
    # to collide, essentially impossible — estimates are exact here (and
    # deterministic, so this assertion is stable).
    rows = [(f"item{i}",) for i in range(20) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, schema="item string")
    counters = cms_counters(df, "item", depth=4, width=512)
    probes = df.select("item").distinct()
    est = {
        r["item"]: r["est"]
        for r in cms_estimate(
            counters, probes, "item", depth=4, width=512
        ).collect()
    }
    for i in range(20):
        assert est[f"item{i}"] == i + 1


def test_cms_narrow_grid_overcounts_never_undercounts(spark):
    # width 2 forces collisions; the min-over-rows estimate must still
    # dominate the true count for every item.
    rows = [(f"w{i % 7}",) for i in range(200)]
    df = spark.createDataFrame(rows, schema="item string")
    true = {f"w{i}": len([r for r in rows if r[0] == f"w{i}"]) for i in range(7)}
    counters = cms_counters(df, "item", depth=3, width=2)
    probes = df.select("item").distinct()
    for r in cms_estimate(counters, probes, "item", depth=3, width=2).collect():
        assert r["est"] >= true[r["item"]]


def test_cms_absent_item_estimates_bounded_by_cell_mass(spark):
    df = spark.createDataFrame([("a",)] * 5, schema="item string")
    counters = cms_counters(df, "item", depth=4, width=512)
    probes = spark.createDataFrame([("zz",)], schema="item string")
    [r] = cms_estimate(counters, probes, "item", depth=4, width=512).collect()
    assert r["est"] in (0, 5)  # 0 unless all 4 rows collide with 'a'
    assert r["est"] == 0  # deterministic md5 grid: stable assertion


def test_cms_counters_merge_cellwise(spark):
    a = spark.createDataFrame([("x",)] * 3 + [("y",)] * 2, "item string")
    b = spark.createDataFrame([("x",)] * 4 + [("z",)] * 1, "item string")
    from pyspark.sql import functions as F

    ca = cms_counters(a, "item", depth=2, width=16)
    cb = cms_counters(b, "item", depth=2, width=16)
    merged = (
        ca.unionByName(cb).groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_counters(a.union(b), "item", depth=2, width=16)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_validation(spark):
    import pytest as _pt

    df = spark.createDataFrame([("a",)], "item string")
    with _pt.raises(ValueError):
        cms_counters(df, "item", depth=0, width=4)


# ---------------------------------------------------------------------------
# Mergeable HLL state
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402


def test_hll_merge_tree_estimate_identical_to_one_pass(spark):
    from home_credit_data_engineering_spark.operators.sketch import (
        hll_sketch_state,
        hll_state_estimate,
        merge_hll_states,
    )

    df = spark.range(0, 3000).select((F.col("id") % 997).alias("v"))
    parts = [
        df.filter(F.col("v") % 3 == i) for i in range(3)
    ]
    merged = merge_hll_states(
        merge_hll_states(
            hll_sketch_state(parts[0], "v"), hll_sketch_state(parts[1], "v")
        ),
        hll_sketch_state(parts[2], "v"),
    )
    m = hll_state_estimate(merged).collect()[0].estimate
    d = hll_state_estimate(hll_sketch_state(df, "v")).collect()[0].estimate
    # the union covers the identical item set; the residual is the
    # HIP-vs-composite estimator gap (a fraction of the error bound)
    assert abs(m - d) <= 0.02 * d
    assert abs(m - 997) <= 0.05 * 997 and abs(d - 997) <= 0.05 * 997


def test_hll_state_keys_and_duplicates(spark):
    from home_credit_data_engineering_spark.operators.sketch import (
        hll_sketch_state,
        hll_state_estimate,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 9)], schema="k string, v int"
    )
    est = {
        r.k: r.estimate
        for r in hll_state_estimate(
            hll_sketch_state(df, "v", ("k",)), ("k",)
        ).collect()
    }
    # small cardinalities are exact in DataSketches HLL
    assert round(est["a"]) == 2 and round(est["b"]) == 1
