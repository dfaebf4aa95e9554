"""Incremental state maintenance: folding per-day deltas must equal
recomputing from all history, for both decomposable aggregates and HLL
distinct sketches."""

from __future__ import annotations

from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.incremental import (
    aggregate_state,
    distinct_sketch_state,
    estimate_distinct,
    merge_aggregate_state,
    merge_distinct_sketch_state,
)
from home_credit_data_engineering_spark.sources.readers import read_testdata

MEASURES = {
    "n_events": ("count", ""),
    "total_value": ("sum", "value"),
    "first_ts": ("min", "ts"),
    "last_ts": ("max", "ts"),
}


def _daily_slices(events, n=3):
    # Split the events table into n deterministic "daily" deltas.
    return [events.filter(F.pmod(F.col("event_id"), F.lit(n)) == i) for i in range(n)]


def test_folded_aggregate_state_equals_full_recompute(spark, sf_dir):
    events = read_testdata(spark, sf_dir, "events")
    days = _daily_slices(events)

    state = aggregate_state(days[0], ["user_id"], MEASURES)
    for day in days[1:]:
        delta = aggregate_state(day, ["user_id"], MEASURES)
        state = merge_aggregate_state(state, delta, ["user_id"], MEASURES)

    full = aggregate_state(events, ["user_id"], MEASURES)
    key = lambda df: {  # noqa: E731
        r["user_id"]: (
            r["n_events"],
            round(r["total_value"], 6),
            r["first_ts"],
            r["last_ts"],
        )
        for r in df.collect()
    }
    assert key(state) == key(full)


def test_merged_hll_sketches_track_exact_distinct(spark, sf_dir):
    events = read_testdata(spark, sf_dir, "events")
    days = _daily_slices(events)

    state = distinct_sketch_state(days[0], ["event_type"], "user_id")
    for day in days[1:]:
        delta = distinct_sketch_state(day, ["event_type"], "user_id")
        state = merge_distinct_sketch_state(state, delta, ["event_type"])

    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in estimate_distinct(state, ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for etype, n in exact.items():
        # lg_k=12 → ~1.6% standard error; 5% bound keeps the test stable.
        assert abs(approx[etype] - n) / n < 0.05, (etype, approx[etype], n)
