"""Streaming + incremental evaluation: stream == batch for the
confusion/score-count/calibration states, and merged-state finalizers
≡ full recompute (the O(delta) contract)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from home_credit_data_engineering_spark.operators.evaluate import (
    binary_auc,
    binary_auc_from_counts,
    classification_report,
    classification_report_from_grid,
    confusion_matrix,
    merge_confusion,
    merge_score_counts,
    score_counts_state,
)
from home_credit_data_engineering_spark.streaming.evaluate import (
    calibration_stream,
    confusion_stream,
    score_counts_stream,
)
from home_credit_data_engineering_spark.streaming.windows import (
    run_to_memory_sink,
)

_SCHEMA = T.StructType(
    [
        T.StructField("label", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("y", T.IntegerType()),
        T.StructField("s", T.LongType()),
    ]
)


def _scored_rows():
    return [
        ("a", "a", 1, 90), ("a", "b", 1, 60), ("b", "b", 0, 40),
        ("b", "a", 0, 60), ("a", "a", 1, 90), ("b", "b", 0, 10),
    ]


def _stream(spark, tmp_path, name):
    src = str(tmp_path / f"{name}_src")
    df = spark.createDataFrame(_scored_rows(), _SCHEMA)
    df.repartition(3).write.parquet(src)
    return (
        spark.readStream.format("parquet")
        .schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )


def test_confusion_stream_equals_batch(spark, tmp_path):
    out = confusion_stream(_stream(spark, tmp_path, "conf"))
    run_to_memory_sink(out, "conf_grid", output_mode="complete")
    got = {
        (r.label, r.pred): r.n
        for r in spark.sql("SELECT * FROM conf_grid").collect()
    }
    batch = spark.createDataFrame(_scored_rows(), _SCHEMA)
    expect = {
        (r.label, r.pred): r.n for r in confusion_matrix(batch).collect()
    }
    assert got == expect
    # finalizing the streamed grid reproduces the batch report exactly
    grid = spark.sql("SELECT label, pred, n FROM conf_grid")
    rep_s = {
        r.cls: (r.precision, r.recall, r.f1, r.support)
        for r in classification_report_from_grid(grid).collect()
    }
    rep_b = {
        r.cls: (r.precision, r.recall, r.f1, r.support)
        for r in classification_report(batch).collect()
    }
    assert rep_s == rep_b


def test_score_counts_stream_finalizes_to_batch_auc(spark, tmp_path):
    out = score_counts_stream(_stream(spark, tmp_path, "auc"), "y", "s")
    run_to_memory_sink(out, "auc_state", output_mode="complete")
    state = spark.sql("SELECT score, pos, neg FROM auc_state")
    got = binary_auc_from_counts(state).collect()[0]
    batch = spark.createDataFrame(_scored_rows(), _SCHEMA)
    expect = binary_auc(batch, "y", "s").collect()[0]
    assert got.asDict() == expect.asDict()


def test_calibration_stream_equals_batch(spark, tmp_path):
    from home_credit_data_engineering_spark.operators.evaluate import (
        calibration_bins,
    )

    out = calibration_stream(
        _stream(spark, tmp_path, "cal"), "y", "s", n_bins=5, lo=0.0, hi=100.0
    )
    run_to_memory_sink(out, "cal_state", output_mode="complete")
    got = {
        r.bin: (r.n, r.n_pos, r.mean_score, r.pos_rate)
        for r in spark.sql("SELECT * FROM cal_state").collect()
    }
    batch = spark.createDataFrame(_scored_rows(), _SCHEMA)
    expect = {
        r.bin: (r.n, r.n_pos, r.mean_score, r.pos_rate)
        for r in calibration_bins(
            batch, "y", "s", n_bins=5, lo=0.0, hi=100.0
        ).collect()
    }
    assert got == expect


def test_merged_confusion_state_equals_full_recompute(spark):
    rows = _scored_rows()
    full = spark.createDataFrame(rows, _SCHEMA)
    day1 = spark.createDataFrame(rows[:3], _SCHEMA)
    day2 = spark.createDataFrame(rows[3:], _SCHEMA)
    merged = merge_confusion(confusion_matrix(day1), confusion_matrix(day2))
    rep_m = {
        r.cls: (r.precision, r.recall, r.f1, r.support)
        for r in classification_report_from_grid(merged).collect()
    }
    rep_f = {
        r.cls: (r.precision, r.recall, r.f1, r.support)
        for r in classification_report(full).collect()
    }
    assert rep_m == rep_f


def test_merged_score_counts_equal_full_auc(spark):
    rows = _scored_rows()
    full = spark.createDataFrame(rows, _SCHEMA)
    day1 = spark.createDataFrame(rows[:2], _SCHEMA)
    day2 = spark.createDataFrame(rows[2:], _SCHEMA)
    merged = merge_score_counts(
        score_counts_state(day1, "y", "s"), score_counts_state(day2, "y", "s")
    )
    got = binary_auc_from_counts(merged).collect()[0]
    expect = binary_auc(full, "y", "s").collect()[0]
    assert got.asDict() == expect.asDict()
