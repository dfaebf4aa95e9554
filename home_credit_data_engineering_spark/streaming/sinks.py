"""Streaming sinks beyond the built-ins: exactly-once-style keyed upsert
via ``foreachBatch``.

Structured Streaming's file sink is append-only; keyed tables (the
"latest state per entity" serving shape) need a MERGE per micro-batch.
``foreachBatch`` provides at-least-once batch delivery + a batch id;
making the batch function *idempotent* (whole-row replace by key) turns
that into effective exactly-once for the table state — the standard
recipe. On a real lakehouse the merge target is Delta/Iceberg ``MERGE``;
here the target is a parquet directory, rewritten per batch
(fine at test scale; the operator seam — batch function + checkpointed
offsets — is identical).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame

from home_credit_data_engineering_spark.operators.merge import upsert


def foreach_batch_upsert(
    stream_df: DataFrame,
    target_path: str,
    key: str | list[str],
    checkpoint_dir: str,
):
    """Run the stream to completion (``availableNow``), merging each
    micro-batch into the keyed parquet table at ``target_path``.

    Idempotent by construction: a replayed batch re-writes the same rows
    (whole-row replace per key), so restart-after-failure converges to the
    same table. Returns the finished ``StreamingQuery``.
    """
    keys = [key] if isinstance(key, str) else list(key)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates(keys)
        try:
            # localCheckpoint truncates lineage so the overwrite below
            # doesn't read from the path it writes (Delta MERGE makes this
            # dance unnecessary on a real lakehouse).
            current = spark.read.parquet(target_path).localCheckpoint(eager=True)
        except AnalysisException:
            current = None  # first batch — table doesn't exist yet
        merged = upsert(current, batch, keys) if current is not None else batch
        merged.write.mode("overwrite").parquet(target_path)

    query = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
