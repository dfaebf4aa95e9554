"""Custom stateful streaming operator: state must accumulate across
micro-batches and the final totals must equal the batch aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.streaming.stateful import (
    running_totals_per_user,
)


@pytest.fixture()
def two_batch_stream(spark, sf_dir, tmp_path):
    """events split into two parquet files, consumed one file per
    micro-batch → the stateful operator must carry state across batches."""
    from home_credit_data_engineering_spark.sources.readers import read_testdata

    stream_dir = tmp_path / "batches"
    ev_all = read_testdata(spark, sf_dir, "events")
    ev_all.filter(F.col("event_id") % 2 == 0).select(
        "user_id", "value"
    ).coalesce(1).write.parquet(str(stream_dir / "b0"))
    ev_all.filter(F.col("event_id") % 2 == 1).select(
        "user_id", "value"
    ).coalesce(1).write.parquet(str(stream_dir / "b1"))
    # one directory with both file sets; maxFilesPerTrigger=1 → ≥2 batches
    import glob
    import shutil

    merged = tmp_path / "stream"
    merged.mkdir()
    for i, f in enumerate(
        glob.glob(str(stream_dir / "b*" / "*.parquet"))
    ):
        shutil.copy(f, merged / f"part-{i}.parquet")
    return (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(merged))
    )


def test_running_totals_accumulate_across_batches(spark, sf_dir, two_batch_stream):
    from home_credit_data_engineering_spark.sources.readers import read_testdata

    out = running_totals_per_user(two_batch_stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # update mode emits one row per key per batch; the LAST row per key is
    # the final state.
    rows = spark.sql(
        """
        SELECT user_id, event_count, value_sum FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY event_count DESC) AS rk
          FROM running_totals) WHERE rk = 1
        """
    ).collect()
    got = {r["user_id"]: (r["event_count"], r["value_sum"]) for r in rows}

    batch = (
        read_testdata(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce(F.col("value"), F.lit(0.0))).alias("s"),
        )
    )
    want = {r["user_id"]: (r["n"], r["s"]) for r in batch.collect()}
    assert set(got) == set(want)
    for uid, (n, s) in want.items():
        assert got[uid][0] == n
        # The stateful stream folds per micro-batch, the batch aggregate
        # in shuffle order — exact double equality (even rounded) would
        # be a latent ulp flake; the counts pin correctness exactly.
        assert abs(got[uid][1] - s) < 1e-9
