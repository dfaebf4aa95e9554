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


def foreach_batch_incremental_dedup(
    stream_docs: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.7,
):
    """Streaming near-dup dedup: each micro-batch of documents is checked
    against everything seen so far, O(batch) per batch.

    State lives in two parquet tables under ``state_dir``:

    - ``buckets/`` — the persisted LSH bucket table
      (:func:`~.operators.dedup.lsh_bucket_state`), appended per batch;
    - ``texts/`` — (id, text) of all accepted docs (the verification
      corpus for exact Jaccard);
    - ``pairs/`` — the accumulated verified near-dup pairs.

    Each batch runs :func:`~.operators.dedup.minhash_incremental_pairs`:
    signatures/bands for the BATCH only, candidates from probing the
    stored buckets, Jaccard verification on candidate docs only. The
    batch function keys every append by (batch_id) directory so a
    replayed batch overwrites its own output — idempotent, hence
    effectively exactly-once. Returns the finished query.
    """
    from home_credit_data_engineering_spark.operators.dedup import (
        minhash_incremental_pairs,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select(id_col, text_col).dropDuplicates([id_col])
        batch = batch.localCheckpoint(eager=True)
        try:
            # select() drops the batch=N partition column the reads add
            state_buckets = spark.read.parquet(f"{state_dir}/buckets").select(
                "doc_id", "band", "bucket"
            )
            known_texts = spark.read.parquet(f"{state_dir}/texts").select(
                id_col, text_col
            )
        except AnalysisException:
            state_buckets = None
            known_texts = None
        all_texts = (
            known_texts.unionByName(batch) if known_texts is not None else batch
        )
        if state_buckets is None:
            # Bootstrap: empty bucket state with the right schema.
            state_buckets = spark.createDataFrame(
                [], "doc_id long, band int, bucket int"
            )
        result = minhash_incremental_pairs(
            batch,
            state_buckets,
            all_texts,
            id_col=id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_k=shingle_k,
            threshold=threshold,
        )
        # Idempotent appends: every artifact lands in a batch-keyed dir.
        result["pairs"].write.mode("overwrite").parquet(
            f"{state_dir}/pairs/batch={batch_id}"
        )
        result["new_buckets"].write.mode("overwrite").parquet(
            f"{state_dir}/buckets/batch={batch_id}"
        )
        batch.write.mode("overwrite").parquet(f"{state_dir}/texts/batch={batch_id}")

    query = (
        stream_docs.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
