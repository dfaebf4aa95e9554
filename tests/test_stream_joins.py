"""Stream-stream interval join and streaming dedup: the streaming plans
produce the same results as their batch twins (memory-sink harness, same
pattern as test_streaming)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.sources.readers import read_testdata
from home_credit_data_engineering_spark.streaming.joins import (
    stream_stream_interval_join,
    streaming_dedup,
)
from home_credit_data_engineering_spark.streaming.windows import (
    read_testdata_event_stream,
    run_to_memory_sink,
)


def _event_stream(spark, sf_dir, tmp_path, n_copies=1):
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    for i in range(n_copies):
        (stream_dir / f"events_{i}.parquet").symlink_to(f"{sf_dir}/events.parquet")
    return read_testdata_event_stream(
        spark, str(stream_dir), probe_file=f"{sf_dir}/events.parquet"
    )


def _split_views_purchases(events):
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("v_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    return views, purchases


def _attribution_join(views, purchases):
    return stream_stream_interval_join(
        views,
        purchases,
        left_ts="v_ts",
        right_ts="p_ts",
        left_key="v_user",
        right_key="p_user",
        max_delay="1 HOUR",
        left_watermark="2 hours",
        right_watermark="2 hours",
    ).select("v_id", "p_id")


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    events = _event_stream(spark, sf_dir, tmp_path)
    streamed = _attribution_join(*_split_views_purchases(events))
    run_to_memory_sink(streamed, "ssj_out", output_mode="append")
    got = {
        (r["v_id"], r["p_id"]) for r in spark.sql("SELECT * FROM ssj_out").collect()
    }

    batch = _attribution_join(
        *_split_views_purchases(read_testdata(spark, sf_dir, "events"))
    )
    want = {(r["v_id"], r["p_id"]) for r in batch.collect()}
    assert len(want) > 0
    # Append-mode stream emission may hold back pairs newer than the final
    # watermark, but everything emitted must be correct and the closed
    # region must be complete.
    assert got <= want
    assert len(got) >= len(want) * 0.5


def test_streaming_dedup_drops_exact_duplicates(spark, sf_dir, tmp_path):
    # Two file copies -> every event arrives exactly twice.
    events = _event_stream(spark, sf_dir, tmp_path, n_copies=2)
    deduped = streaming_dedup(
        events, id_cols=["event_id"], ts_col="ts", watermark="1 hour"
    ).select("event_id")
    run_to_memory_sink(deduped, "dedup_out", output_mode="append")
    got = [r["event_id"] for r in spark.sql("SELECT * FROM dedup_out").collect()]

    n_distinct = read_testdata(spark, sf_dir, "events").count()
    assert len(got) == len(set(got)) == n_distinct
