"""Structured Streaming tests: the streaming plans produce the same
results as their batch twins (the Structured Streaming contract), driven
synchronously through a memory sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.schema import TESTDATA_SCHEMAS
from home_credit_data_engineering_spark.sources.readers import read_testdata
from home_credit_data_engineering_spark.streaming.windows import (
    read_testdata_event_stream,
    run_to_memory_sink,
    session_window_agg,
    tumbling_agg,
)


@pytest.fixture()
def event_stream(spark, sf_dir, tmp_path):
    # The streaming file source requires a directory; expose the single
    # events parquet file through a symlinked dir.
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    (stream_dir / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    return read_testdata_event_stream(
        spark, str(stream_dir), probe_file=f"{sf_dir}/events.parquet"
    )


def test_streaming_tumbling_matches_batch(spark, sf_dir, event_stream):
    streamed = tumbling_agg(
        event_stream,
        ts_col="ts",
        duration="1 day",
        keys=["event_type"],
        measures={"n_events": F.count(F.lit(1))},
    )
    run_to_memory_sink(streamed, "tumbling_out", output_mode="complete")
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }

    batch = tumbling_agg(
        read_testdata(spark, sf_dir, "events"),
        ts_col="ts",
        duration="1 day",
        keys=["event_type"],
        measures={"n_events": F.count(F.lit(1))},
    )
    want = {
        (r["window_start"], r["event_type"]): r["n_events"] for r in batch.collect()
    }
    assert got == want


def test_streaming_watermarked_append_emits_closed_windows(spark, event_stream):
    from home_credit_data_engineering_spark.streaming.windows import (
        streaming_windowed_counts,
    )

    agg = streaming_windowed_counts(
        event_stream,
        ts_col="ts",
        watermark="1 hour",
        duration="1 day",
        keys=["event_type"],
        measures={"n_events": F.count(F.lit(1))},
    )
    run_to_memory_sink(agg, "wm_out", output_mode="append")
    rows = spark.sql("SELECT * FROM wm_out").collect()
    # All-but-the-last day's windows are closed once the watermark advances
    # past them (no-data microbatch finalization).
    assert len(rows) > 0
    assert all(r["n_events"] > 0 for r in rows)


def test_streaming_session_window_matches_batch(spark, sf_dir, event_stream):
    streamed = session_window_agg(
        event_stream.withWatermark("ts", "1 hour"),
        key_col="user_id",
        ts_col="ts",
        gap="6 hours",
        measures={"n_events": F.count(F.lit(1))},
    )
    run_to_memory_sink(streamed, "session_out", output_mode="complete")
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.sql("SELECT * FROM session_out").collect()
    }
    batch = session_window_agg(
        read_testdata(spark, sf_dir, "events"),
        key_col="user_id",
        ts_col="ts",
        gap="6 hours",
        measures={"n_events": F.count(F.lit(1))},
    )
    want = {
        (r["user_id"], r["session_start"]): r["n_events"] for r in batch.collect()
    }
    assert got == want


def test_streaming_text_profile_matches_batch(spark, sf_dir, tmp_path):
    """The per-document text profile (quality/fingerprint/gopher/lang-id)
    is a stateless projection, so the SAME expressions run under
    Structured Streaming unchanged — the filter stage of a streaming
    ingest pipeline. Stream output must equal the batch profile row for
    row."""
    from home_credit_data_engineering_spark.functions.text import (
        digit_ratio,
        fingerprint,
        lang_id,
        quality_score,
        repeated_bigram_fraction,
        symbol_ratio,
        token_count,
    )
    from home_credit_data_engineering_spark.schema import TESTDATA_SCHEMAS
    from home_credit_data_engineering_spark.streaming.windows import (
        run_to_memory_sink,
    )

    stream_dir = tmp_path / "docs_stream"
    stream_dir.mkdir()
    (stream_dir / "documents.parquet").symlink_to(f"{sf_dir}/documents.parquet")

    def profile(df):
        return df.filter(F.col("n_chars") > 0).select(
            "doc_id",
            token_count("text").alias("n_tokens"),
            F.round(quality_score("text"), 4).alias("quality"),
            fingerprint("text").alias("fp"),
            lang_id("text").alias("lang_pred"),
            F.round(symbol_ratio("text"), 6).alias("symbol_ratio"),
            F.round(digit_ratio("text"), 6).alias("digit_ratio"),
            F.round(repeated_bigram_fraction("text"), 6).alias("rep_bigram_frac"),
        )

    streamed = profile(
        spark.readStream.schema(TESTDATA_SCHEMAS["documents"]).parquet(
            str(stream_dir)
        )
    )
    run_to_memory_sink(streamed, "text_profile_out", output_mode="append")
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in spark.sql("SELECT * FROM text_profile_out").collect()
    }
    from home_credit_data_engineering_spark.sources.readers import read_testdata

    want = {
        r["doc_id"]: tuple(r)[1:]
        for r in profile(read_testdata(spark, sf_dir, "documents")).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_incremental_dedup(spark, tmp_path):
    """Streaming near-dup dedup with persisted LSH bucket state: docs
    arriving across micro-batches must pair against EARLIER batches'
    docs, and the union of per-batch pairs must equal the full-corpus
    batch pipeline's pairs."""
    from home_credit_data_engineering_spark.operators.dedup import minhash_dedup
    from home_credit_data_engineering_spark.streaming.sinks import (
        foreach_batch_incremental_dedup,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the garden outside"
    )
    batch1 = [(1, base), (2, base), (3, "unrelated text about query engines and columnar scans")]
    batch2 = [(4, base.replace("garden", "meadow")), (5, base.replace("garden", "meadow"))]
    import glob
    import shutil

    src = tmp_path / "docs_in"
    src.mkdir()

    def land(rows, name):
        # The file-stream source lists FILES; write via a temp dir and
        # move the part file in (same pattern as the event fixtures).
        tmp = tmp_path / f"__tmp_{name}"
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(tmp))
        (part,) = glob.glob(str(tmp / "part-*.parquet"))
        shutil.copy(part, str(src / f"{name}.parquet"))

    land(batch1, "b1")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def run_stream():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        foreach_batch_incremental_dedup(
            stream, state, ckpt, bands=16, threshold=0.5
        )

    run_stream()
    # second arrival: a new file, resumed stream (same checkpoint)
    land(batch2, "b2")
    run_stream()

    got = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(f"{state}/pairs").select("doc_a", "doc_b").collect()
    }
    full = spark.createDataFrame(
        batch1 + batch2, "doc_id long, text string"
    )
    want = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_dedup(
            full, "doc_id", "text", num_hashes=32, bands=16, threshold=0.5
        ).collect()
    }
    assert got == want
    assert (1, 4) in got  # cross-batch pair found via the bucket state
    assert (4, 5) in got  # within-batch pair
