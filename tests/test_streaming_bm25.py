"""Streaming BM25 index maintenance (streaming/bm25.py): the streamed
index must score BIT-IDENTICALLY to a one-shot build over the same
corpus, and replays must be idempotent."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql import types as T

from home_credit_data_engineering_spark.operators.retrieval import (
    bm25_query_index,
    build_bm25_index,
)
from home_credit_data_engineering_spark.plans.declared.retrieval import (
    bm25_panel_df,
)
from home_credit_data_engineering_spark.sources.readers import read_testdata
from home_credit_data_engineering_spark.streaming.bm25 import (
    foreach_batch_bm25_ingest,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _write_waves(spark, docs, tmp_path, n_waves=3):
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i in range(n_waves):
        d = str(tmp_path / f"w{i}")
        docs.filter(F.col("doc_id") % n_waves == i).select(
            "doc_id", "text"
        ).coalesce(1).write.parquet(d)
        part = glob.glob(d + "/part-*.parquet")[0]
        shutil.copy(part, f"{flat}/{i:02d}.parquet")
    return flat


def _run(spark, flat, idx, ckpt, reports=None):
    stream = (
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .load(flat)
    )
    foreach_batch_bm25_ingest(
        stream, idx, ckpt, n_buckets=16, reports=reports
    )


def _results(spark, idx):
    panel = bm25_panel_df(spark)
    return sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rank"])
        for r in bm25_query_index(
            spark, idx, panel, k=5, n_buckets=16
        ).collect()
    )


def test_streaming_bm25_equals_one_shot_build(spark, sf_dir, tmp_path):
    docs = read_testdata(spark, sf_dir, "documents")
    flat = _write_waves(spark, docs, tmp_path)
    idx = str(tmp_path / "stream_idx")
    reports: list = []
    _run(spark, flat, idx, str(tmp_path / "ckpt"), reports)
    assert [r["batch_id"] for r in reports] == [0, 1, 2]
    assert sum(r["docs_added"] for r in reports) == docs.count()

    full_idx = str(tmp_path / "full_idx")
    build_bm25_index(docs, full_idx, n_buckets=16)

    a = _results(spark, idx)
    b = _results(spark, full_idx)
    assert a == b and len(a) > 0  # bit-identical scores


def test_streaming_bm25_replay_is_idempotent(spark, sf_dir, tmp_path):
    docs = read_testdata(spark, sf_dir, "documents")
    flat = _write_waves(spark, docs, tmp_path)
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, flat, idx, ckpt)
    before = _results(spark, idx)

    # crash window: the final batch's partitions are written but its
    # offset never committed -> restart redelivers it
    commits = sorted(
        f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")
    )
    os.remove(f"{ckpt}/commits/{commits[-1]}")
    crc = f"{ckpt}/commits/.{commits[-1]}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    _run(spark, flat, idx, ckpt)

    assert _results(spark, idx) == before
    # no leg double-counts the replayed batch
    assert (
        spark.read.parquet(f"{idx}/doclens").count() == docs.count()
    )
    n = spark.read.parquet(f"{idx}/stats").agg(F.sum("n_docs")).first()[0]
    assert int(n) == docs.count()


def test_streaming_bm25_pins_n_buckets(spark, sf_dir, tmp_path):
    """Resuming an existing index under a different modulus raises up
    front — the streaming mirror of bm25_index_increment's guard."""
    import pytest

    docs = read_testdata(spark, sf_dir, "documents")
    flat = _write_waves(spark, docs, tmp_path, n_waves=1)
    idx = str(tmp_path / "idx")
    _run(spark, flat, idx, str(tmp_path / "ckpt"))

    stream = (
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .load(flat)
    )
    with pytest.raises(ValueError, match="n_buckets=16"):
        foreach_batch_bm25_ingest(
            stream, idx, str(tmp_path / "ckpt2"), n_buckets=64
        )


def test_streaming_bm25_counts_zero_term_docs(spark, tmp_path):
    """docs_added comes from the stats leg, so a doc whose text
    tokenizes to nothing still counts — report and index agree."""
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "   "), (3, "gamma")], SCHEMA
    )
    flat = _write_waves(spark, docs, tmp_path, n_waves=1)
    idx = str(tmp_path / "idx")
    reports: list = []
    _run(spark, flat, idx, str(tmp_path / "ckpt"), reports)
    assert sum(r["docs_added"] for r in reports) == 3
    n = spark.read.parquet(f"{idx}/stats").agg(F.sum("n_docs")).first()[0]
    assert int(n) == 3
    assert spark.read.parquet(f"{idx}/doclens").count() == 3


def test_compact_streamed_bm25_index_offline(spark, sf_dir, tmp_path):
    """Offline compaction folds old batch partitions per leg; query
    results stay bit-identical and a restarted stream keeps going."""
    from home_credit_data_engineering_spark.streaming.bm25 import (
        compact_streamed_bm25_index,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    flat = _write_waves(spark, docs, tmp_path, n_waves=4)
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, flat, idx, ckpt)

    before = _results(spark, idx)
    rep = compact_streamed_bm25_index(spark, idx)
    assert rep == {"batches_before": 4, "batches_after": 2}
    assert _results(spark, idx) == before  # bit-identical scores
    for leg in ("postings", "df", "doclens", "stats"):
        batches = {
            int(r["batch"])
            for r in spark.read.parquet(f"{idx}/{leg}")
            .select("batch").distinct().collect()
        }
        assert batches == {2, 3}, leg
    # doclens/stats totals preserved exactly
    assert spark.read.parquet(f"{idx}/doclens").count() == docs.count()
    n = spark.read.parquet(f"{idx}/stats").agg(F.sum("n_docs")).first()[0]
    assert int(n) == docs.count()
    # second pass is a no-op
    rep2 = compact_streamed_bm25_index(spark, idx)
    assert rep2["batches_before"] == rep2["batches_after"] == 2

    # restarted stream appends on top of the compacted index
    extra = spark.createDataFrame([(999999, "alpha beta gamma")], SCHEMA)
    d = str(tmp_path / "w_extra")
    extra.coalesce(1).write.parquet(d)
    import glob as _glob
    part = _glob.glob(d + "/part-*.parquet")[0]
    shutil.copy(part, f"{flat}/99.parquet")
    _run(spark, flat, idx, ckpt)
    assert (
        spark.read.parquet(f"{idx}/doclens").count() == docs.count() + 1
    )


def test_streaming_bm25_ingest_recovers_mid_swap_compaction(
    spark, sf_dir, tmp_path
):
    """A compaction that died inside a leg's swap (live leg deleted,
    complete __next left) must be finished by the next stream run —
    otherwise the restart would rebuild the leg from one batch and a
    later recovery would discard the historical postings."""
    docs = read_testdata(spark, sf_dir, "documents")
    flat = _write_waves(spark, docs, tmp_path)
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, flat, idx, ckpt)
    postings_before = spark.read.parquet(f"{idx}/postings").count()

    # a real staged leg carries a root _SUCCESS (plain spark write); the
    # live leg was built by dynamic overwrite which leaves none
    os.rename(f"{idx}/postings", f"{idx}/postings__next")
    with open(f"{idx}/postings__next/_SUCCESS", "w"):
        pass

    extra = spark.createDataFrame([(999999, "alpha beta gamma")], SCHEMA)
    d = str(tmp_path / "w_extra")
    extra.coalesce(1).write.parquet(d)
    part = glob.glob(d + "/part-*.parquet")[0]
    shutil.copy(part, f"{flat}/99.parquet")
    _run(spark, flat, idx, ckpt)

    assert spark.read.parquet(f"{idx}/postings").count() == (
        postings_before + 3  # "alpha beta gamma" -> 3 distinct terms
    )
    assert spark.read.parquet(f"{idx}/doclens").count() == docs.count() + 1
