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
            r["total_value"],
            r["first_ts"],
            r["last_ts"],
        )
        for r in df.collect()
    }
    got, want = key(state), key(full)
    assert set(got) == set(want)
    for uid, (n, total, t0, t1) in want.items():
        gn, gtotal, gt0, gt1 = got[uid]
        assert (gn, gt0, gt1) == (n, t0, t1)
        # Fold and full recompute accumulate the double sum in different
        # orders; exact equality would be a latent ulp flake (the same
        # class _stable.py removes from the oracle-facing queries).
        assert abs(gtotal - total) < 1e-9


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


def test_minhash_incremental_equals_full(spark):
    """Invariant of the O(delta) daily dedup job: full-corpus pairs ==
    old-corpus pairs ∪ incremental pairs of the delta probe."""
    from home_credit_data_engineering_spark.operators.dedup import (
        lsh_bucket_state,
        minhash_dedup,
        minhash_incremental_pairs,
        minhash_signatures,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the garden outside"
    )
    old_rows = [
        (1, base),
        (2, base),  # dup of 1
        (3, "completely different content about spark query engines here"),
    ]
    new_rows = [
        (4, base.replace("garden", "meadow")),  # near-dup of 1/2
        (5, "entirely novel text with no relation to anything previous"),
        (6, base.replace("garden", "meadow")),  # dup of 4 (both new)
    ]
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    full = old.unionByName(new)
    kw = dict(num_hashes=32, bands=16, shingle_k=3, threshold=0.5)

    full_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_dedup(full, "doc_id", "text", **kw).collect()
    }
    old_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_dedup(old, "doc_id", "text", **kw).collect()
    }
    state = lsh_bucket_state(
        minhash_signatures(old, "doc_id", "text", num_hashes=32, shingle_k=3),
        bands=16,
        num_hashes=32,
    )
    inc = minhash_incremental_pairs(
        new, state, full, num_hashes=32, bands=16, shingle_k=3, threshold=0.5
    )
    inc_pairs = {(r["doc_a"], r["doc_b"]) for r in inc["pairs"].collect()}
    # every incremental pair involves a new doc
    assert all(a >= 4 or b >= 4 for a, b in inc_pairs)
    assert old_pairs | inc_pairs == full_pairs
    assert (4, 6) in inc_pairs  # new-new pair found without state
    # bucket-state delta has one row per (doc, band)
    assert inc["new_buckets"].count() == 3 * 16
