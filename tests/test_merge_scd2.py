"""Golden tests for upsert, SCD2 historization, and snapshot diff."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.merge import (
    scd2_apply,
    snapshot_diff,
    upsert,
)


def test_upsert(spark):
    current = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    )
    updates = spark.createDataFrame(
        [(2, "B"), (3, "c")], "id long, v string"
    )
    got = {r["id"]: r["v"] for r in upsert(current, updates, "id").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


@pytest.fixture()
def dim_history(spark):
    return spark.createDataFrame(
        [
            (1, "HIGH", "2026-08-01", None, True),
            (2, "LOW", "2026-08-01", None, True),
            (2, "MEDIUM", "2026-07-01", "2026-08-01", False),  # older version
        ],
        "SK_ID_CURR long, risk_segment string, valid_from string, valid_to string, is_current boolean",
    )


def test_scd2_apply(spark, dim_history):
    snapshot = spark.createDataFrame(
        [(1, "HIGH"), (2, "HIGH"), (3, "LOW")],  # 1 unchanged, 2 changed, 3 new
        "SK_ID_CURR long, risk_segment string",
    )
    out = scd2_apply(dim_history, snapshot, "SK_ID_CURR", "2026-08-13")
    rows = sorted(
        (r["SK_ID_CURR"], r["risk_segment"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    )
    assert rows == [
        (1, "HIGH", "2026-08-01", None, True),  # untouched open version
        (2, "HIGH", "2026-08-13", None, True),  # new open version
        (2, "LOW", "2026-08-01", "2026-08-13", False),  # closed
        (2, "MEDIUM", "2026-07-01", "2026-08-01", False),  # old history kept
        (3, "LOW", "2026-08-13", None, True),  # brand-new key
    ]
    # exactly one current row per live key
    current = out.filter(F.col("is_current")).groupBy("SK_ID_CURR").count().collect()
    assert all(r["count"] == 1 for r in current)


def test_scd2_idempotent_on_unchanged_snapshot(spark, dim_history):
    snapshot = spark.createDataFrame(
        [(1, "HIGH"), (2, "LOW")], "SK_ID_CURR long, risk_segment string"
    )
    out = scd2_apply(dim_history, snapshot, "SK_ID_CURR", "2026-08-13")
    assert out.count() == dim_history.count()  # nothing versioned


def test_snapshot_diff(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    new = spark.createDataFrame(
        [(2, "B"), (3, "c"), (4, "d")], "id long, v string"
    )
    got = {r["id"]: r["change"] for r in snapshot_diff(old, new, "id").collect()}
    assert got == {1: "removed", 2: "changed", 4: "added"}  # 3 unchanged → absent


def test_snapshot_diff_null_safety(spark):
    old = spark.createDataFrame([(1, None)], "id long, v string")
    new_same = spark.createDataFrame([(1, None)], "id long, v string")
    new_diff = spark.createDataFrame([(1, "x")], "id long, v string")
    assert snapshot_diff(old, new_same, "id").count() == 0  # NULL == NULL payload
    assert snapshot_diff(old, new_diff, "id").collect()[0]["change"] == "changed"


def test_payload_hash_column_order_insensitive(spark):
    """ADVICE fix: same payload in a different physical column order must
    compare as unchanged (hash uses a sorted column order)."""
    old = spark.createDataFrame([(1, "a", 10)], "id long, s string, v long")
    new_reordered = spark.createDataFrame(
        [(1, 10, "a")], "id long, v long, s string"
    )
    assert snapshot_diff(old, new_reordered, "id").count() == 0


def test_payload_hash_null_vs_sentinel_and_delimiter(spark):
    """NULL must differ from any literal string (incl. old sentinel bytes),
    and values containing delimiter-ish bytes must not collide across
    column boundaries."""
    old = spark.createDataFrame([(1, None, "b"), (2, "a\x1f", "b")], "id long, x string, y string")
    new = spark.createDataFrame([(1, "\x00", "b"), (2, "a", "\x1fb")], "id long, x string, y string")
    got = {r["id"]: r["change"] for r in snapshot_diff(old, new, "id").collect()}
    assert got == {1: "changed", 2: "changed"}
