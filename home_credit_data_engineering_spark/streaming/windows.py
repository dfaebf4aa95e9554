"""Event-time windowing and sessionization — batch and streaming forms.

The batch forms are plain DataFrame plans (usable in the declared-query
registry with SQL oracles); the streaming forms wrap the same expressions
in ``readStream``/``withWatermark`` so one semantic definition serves both
(the Structured Streaming model: a streaming query IS the batch query over
an unbounded table).

The reference has no streaming at all (SURVEY §2.10); semantics here follow
Spark's standard event-time model: tumbling/sliding via ``F.window``,
sessions via ``F.session_window`` (gap-based), watermarks bounding state
for late data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    measures: dict[str, Column],
) -> DataFrame:
    """Tumbling event-time window aggregate (batch). Output includes
    ``window_start``/``window_end``."""
    win = F.window(ts_col, duration)
    out = df.groupBy(win.alias("w"), *keys).agg(
        *[expr.alias(name) for name, expr in measures.items()]
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *measures.keys(),
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    measures: dict[str, Column],
) -> DataFrame:
    """Sliding (hopping) event-time window aggregate (batch)."""
    win = F.window(ts_col, duration, slide)
    out = df.groupBy(win.alias("w"), *keys).agg(
        *[expr.alias(name) for name, expr in measures.items()]
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *measures.keys(),
    )


def sessionize_gap(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: str,
    measures: dict[str, Column],
) -> DataFrame:
    """Gap-based sessions via gaps-and-islands (batch, SQL-oracle-able).

    A new session starts when the microsecond gap to the previous event of
    the same key exceeds ``gap_seconds``; session_id is the running count
    of session starts. Exact integer arithmetic (``unix_micros``), so an
    external oracle reproduces boundaries bit-for-bit.
    """
    order = [F.col(ts_col).asc(), F.col(order_tiebreak).asc()]
    w = Window.partitionBy(key_col).orderBy(*order)
    gap_us = F.lit(gap_seconds * 1_000_000)
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    is_new = F.when(
        prev_us.isNull() | ((F.unix_micros(F.col(ts_col)) - prev_us) > gap_us), 1
    ).otherwise(0)
    runsum = Window.partitionBy(key_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_session = df.withColumn("session_id", F.sum(is_new).over(runsum).cast("int"))
    return with_session.groupBy(key_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        *[expr.alias(name) for name, expr in measures.items()],
    )


def session_window_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str,
    measures: dict[str, Column],
) -> DataFrame:
    """Gap-based sessions via native ``F.session_window`` (batch or
    streaming). Window end = last event + gap (differs from
    :func:`sessionize_gap`'s end = last event — both shapes are standard)."""
    win = F.session_window(F.col(ts_col), gap)
    out = df.groupBy(win.alias("w"), key_col).agg(
        *[expr.alias(name) for name, expr in measures.items()]
    )
    return out.select(
        key_col,
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *measures.keys(),
    )


# ---------------------------------------------------------------------------
# Streaming entry points
# ---------------------------------------------------------------------------


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source event stream (swap for kafka in production — the
    downstream plan is identical)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def read_testdata_event_stream(
    spark: SparkSession,
    path: str,
    probe_file: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream the driver's events parquet files with a normalized ``ts``.

    The driver's events table has shipped with two physical ``ts``
    encodings across rounds (TIMESTAMP(NANOS) and TIMESTAMP(MICROS), see
    ``sources.readers.read_testdata``); the streaming file source needs an
    explicit schema, so sniff ``probe_file``'s footer and pick the matching
    schema + conversion. Output schema is identical either way.
    """
    from home_credit_data_engineering_spark.schema import TESTDATA_SCHEMAS
    from home_credit_data_engineering_spark.sources.readers import _parquet_ts_unit

    if _parquet_ts_unit(probe_file, "ts") == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = read_event_stream(
            spark,
            path,
            schema=TESTDATA_SCHEMAS["events"],
            max_files_per_trigger=max_files_per_trigger,
        )
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampNTZType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    raw = read_event_stream(
        spark, path, schema=schema, max_files_per_trigger=max_files_per_trigger
    )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def streaming_windowed_counts(
    events: DataFrame,
    ts_col: str,
    watermark: str,
    duration: str,
    keys: list[str],
    measures: dict[str, Column],
) -> DataFrame:
    """Watermarked tumbling-window aggregate: late events beyond
    ``watermark`` are dropped and window state is bounded — the property
    that keeps state finite on an unbounded 100 TB/day stream."""
    win = F.window(ts_col, duration)
    out = (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), *keys)
        .agg(*[expr.alias(name) for name, expr in measures.items()])
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *measures.keys(),
    )


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> None:
    """Drive a streaming query over all currently-available input and stop
    — the synchronous harness for tests (memory sink)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
