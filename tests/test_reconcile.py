"""Cross-engine table fingerprints (operators/reconcile.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.reconcile import (
    fingerprints_match,
    table_fingerprint,
)
from home_credit_data_engineering_spark.sources.readers import read_testdata


def test_fingerprint_is_order_and_partitioning_insensitive(spark, sf_dir):
    orders = read_testdata(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_orderkey", "o_orderstatus"]
    a = table_fingerprint(orders, cols)
    b = table_fingerprint(
        orders.repartition(13).sortWithinPartitions(F.desc("o_orderkey")), cols
    )
    assert fingerprints_match(a, b)


def test_fingerprint_detects_single_row_and_value_changes(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], ["k", "v"]
    )
    base = table_fingerprint(df).collect()[0]
    dropped = table_fingerprint(df.filter("k != 2")).collect()[0]
    mutated = table_fingerprint(
        df.withColumn("v", F.when(F.col("k") == 1, "A").otherwise(F.col("v")))
    ).collect()[0]
    assert dropped["n_rows"] == 2 and dropped["fingerprint"] != base["fingerprint"]
    assert mutated["n_rows"] == 3 and mutated["fingerprint"] != base["fingerprint"]


def test_fingerprint_null_differs_from_literal_strings(spark):
    with_null = table_fingerprint(
        spark.createDataFrame([(1, None)], "k long, v string")
    ).collect()[0]
    with_word = table_fingerprint(
        spark.createDataFrame([(1, "null")], "k long, v string")
    ).collect()[0]
    with_empty = table_fingerprint(
        spark.createDataFrame([(1, "")], "k long, v string")
    ).collect()[0]
    assert len({with_null["fingerprint"], with_word["fingerprint"],
                with_empty["fingerprint"]}) == 3


def test_fingerprint_rejects_floats_by_default(spark, sf_dir):
    orders = read_testdata(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="float columns"):
        table_fingerprint(orders)  # o_totalprice is double
    # explicit decimal rounding is the sanctioned route
    rounded = orders.withColumn(
        "o_totalprice", F.round("o_totalprice", 2).cast("decimal(38,2)")
    )
    assert table_fingerprint(rounded).collect()[0]["n_rows"] > 0


def test_fingerprint_empty_table_is_stable(spark):
    empty = spark.createDataFrame([], "k long, v string")
    row = table_fingerprint(empty).collect()[0]
    assert (row["n_rows"], row["fingerprint"]) == (0, "0")


def test_fingerprint_control_bytes_cannot_shift_field_boundaries(spark):
    """Values containing the separator or a literal NUL are legal in
    web-text columns; length-prefixed encoding keeps the row encoding
    injective (ADVICE r4)."""
    shifted_a = table_fingerprint(
        spark.createDataFrame([("a\x1fb", "c")], "x string, y string")
    ).collect()[0]
    shifted_b = table_fingerprint(
        spark.createDataFrame([("a", "b\x1fc")], "x string, y string")
    ).collect()[0]
    assert shifted_a["fingerprint"] != shifted_b["fingerprint"]
    nul_value = table_fingerprint(
        spark.createDataFrame([(1, "\x00")], "k long, v string")
    ).collect()[0]
    null_value = table_fingerprint(
        spark.createDataFrame([(1, None)], "k long, v string")
    ).collect()[0]
    literal_n = table_fingerprint(
        spark.createDataFrame([(1, "N")], "k long, v string")
    ).collect()[0]
    assert len({nul_value["fingerprint"], null_value["fingerprint"],
                literal_n["fingerprint"]}) == 3


# ---------------------------------------------------------------------------
# snapshot_drift
# ---------------------------------------------------------------------------


def test_snapshot_drift_detects_all_drift_kinds(spark):
    from home_credit_data_engineering_spark.operators.reconcile import (
        snapshot_drift,
    )

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30)],
        schema="id bigint, tag string, v bigint",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5)],  # v became double, row dropped
        schema="id bigint, tag string, v double",
    )
    new = new.withColumn("extra", F.lit("x"))
    rows = {
        (r.column, r.metric): r for r in snapshot_drift(old, new).collect()
    }
    assert rows[("__table__", "row_count")].changed
    assert rows[("__table__", "row_count")].old_value == "3"
    assert rows[("__table__", "row_count")].new_value == "2"
    # type change flagged
    r = rows[("v", "dtype")]
    assert r.old_value == "bigint" and r.new_value == "double" and r.changed
    # added column: present false -> true
    assert rows[("extra", "present")].old_value == "false"
    assert rows[("extra", "present")].changed
    # null-rate drift on tag: non_null 2 -> 1
    assert rows[("tag", "non_null")].old_value == "2"
    assert rows[("tag", "non_null")].new_value == "1"
    assert rows[("tag", "non_null")].changed
    # unchanged metric not flagged
    assert not rows[("id", "dtype")].changed
    # columns missing on one side get NO count rows (presence covers them)
    assert ("extra", "non_null") not in rows


def test_snapshot_drift_identical_snapshots_all_unchanged(spark):
    from home_credit_data_engineering_spark.operators.reconcile import (
        snapshot_drift,
    )

    df = spark.createDataFrame([(1, "x")], schema="id bigint, s string")
    out = snapshot_drift(df, df).collect()
    assert out and not any(r.changed for r in out)


def test_distribution_drift_detects_planted_shift(spark):
    from home_credit_data_engineering_spark.operators.reconcile import (
        distribution_drift,
    )

    # old ~ values 0..999; new = old + 500 (a hard location shift)
    old = spark.createDataFrame(
        [(float(i),) for i in range(1000)], "v double"
    )
    new = spark.createDataFrame(
        [(float(i) + 500.0,) for i in range(1000)], "v double"
    )
    rep = {r.metric: r for r in distribution_drift(old, new).collect()}
    assert set(rep) == {"psi", "ks"}
    assert rep["psi"].changed and float(rep["psi"].new_value) > 0.2
    assert rep["ks"].changed and float(rep["ks"].new_value) >= 0.4
    assert rep["psi"].old_value == "0"


def test_distribution_drift_identical_sides_unchanged(spark):
    from home_credit_data_engineering_spark.operators.reconcile import (
        distribution_drift,
    )

    df = spark.createDataFrame(
        [(float(i % 97), i) for i in range(500)], "v double, k bigint"
    )
    rep = distribution_drift(df, df).collect()
    assert len(rep) == 4  # psi + ks for v and k
    assert all(not r.changed for r in rep)
    assert all(float(r.new_value) == 0.0 for r in rep)


def test_distribution_drift_handles_empty_and_constant(spark):
    from home_credit_data_engineering_spark.operators.reconcile import (
        distribution_drift,
    )

    old = spark.createDataFrame([(1.0,), (1.0,), (1.0,)], "v double")
    new_same = spark.createDataFrame([(1.0,)], "v double")
    rep = {r.metric: r for r in distribution_drift(old, new_same).collect()}
    # constant column: everything lands in one bin on both sides
    assert not rep["psi"].changed and not rep["ks"].changed
    empty = spark.createDataFrame([], "v double")
    rep2 = {r.metric: r for r in distribution_drift(old, empty).collect()}
    assert rep2["psi"].changed and rep2["psi"].new_value is None


def test_distribution_drift_column_selection_and_validation(spark):
    import pytest

    from home_credit_data_engineering_spark.operators.reconcile import (
        distribution_drift,
    )

    df = spark.createDataFrame([(1.0, "x")], "v double, s string")
    assert {
        r.column for r in distribution_drift(df, df).collect()
    } == {"v"}  # strings skipped
    with pytest.raises(ValueError, match="not numeric"):
        distribution_drift(df, df, columns=["s"])
    with pytest.raises(ValueError, match="n_bins"):
        distribution_drift(df, df, n_bins=1)
