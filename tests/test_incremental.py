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


def _jacc_pairs(df):
    return {
        (r["doc_a"], r["doc_b"]): r["jaccard"] for r in df.collect()
    }


def test_jaccard_join_incremental_equals_full(spark):
    """Invariant of the O(delta) EXACT Jaccard join: full-corpus join ==
    old-corpus join ∪ incremental pairs, with identical scores — across
    TWO chained increments (the frozen-token-order induction: accepted
    tokens must never re-rank, or stored prefixes silently lose
    candidate completeness)."""
    import random

    from home_credit_data_engineering_spark.operators.dedup import (
        jaccard_join_increment,
        jaccard_join_state,
        jaccard_similarity_join,
    )

    rng = random.Random(20260816)
    vocab = [f"w{i}" for i in range(40)]

    def doc(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    base = doc(30)
    old_rows = [(i, base if i % 4 == 0 else doc(rng.randint(8, 35)))
                for i in range(1, 13)]
    d1_rows = [(100 + i, base if i % 3 == 0 else doc(rng.randint(8, 35)))
               for i in range(6)]
    # second delta introduces BRAND-NEW vocabulary (extends the order)
    d2_rows = [(200, base), (201, doc(20) + " zz1 zz2 zz3 zz1 zz2 zz3"),
               (202, "zz1 zz2 zz3 zz4 zz5 zz1 zz2 zz3 zz4 zz5 zz6 zz7")]
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    d1 = spark.createDataFrame(d1_rows, "doc_id long, text string")
    d2 = spark.createDataFrame(d2_rows, "doc_id long, text string")
    kw = dict(threshold=0.3, shingle_k=3)

    full01 = old.unionByName(d1)
    full012 = full01.unionByName(d2)
    pairs_old = _jacc_pairs(jaccard_similarity_join(old, "doc_id", "text", **kw))
    pairs_f1 = _jacc_pairs(jaccard_similarity_join(full01, "doc_id", "text", **kw))
    pairs_f2 = _jacc_pairs(jaccard_similarity_join(full012, "doc_id", "text", **kw))
    assert pairs_f1, "fixture must produce pairs"

    state = jaccard_join_state(old, "doc_id", "text", **kw)
    inc1 = jaccard_join_increment(
        d1, state["prefixes"], state["tokens"], full01, "doc_id", "text", **kw
    )
    got1 = _jacc_pairs(inc1["pairs"])
    assert all(a >= 100 or b >= 100 for a, b in got1)
    assert {**pairs_old, **got1} == pairs_f1  # pair sets AND exact scores

    # chain: append the delta's prefixes + brand-new tokens, fold delta 2
    prefixes2 = state["prefixes"].unionByName(inc1["new_prefixes"])
    tokens2 = state["tokens"].unionByName(inc1["new_tokens"])
    inc2 = jaccard_join_increment(
        d2, prefixes2, tokens2, full012, "doc_id", "text", **kw
    )
    got2 = _jacc_pairs(inc2["pairs"])
    assert all(a >= 200 or b >= 200 for a, b in got2)
    assert {**pairs_f1, **got2} == pairs_f2
    # the all-new-vocab doc pair (201, 202) shares only zz tokens
    assert inc2["new_tokens"].filter(
        F.col("token").like("%zz%")).count() > 0
