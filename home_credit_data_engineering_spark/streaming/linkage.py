"""Streaming entity resolution: fold each micro-batch of new records
into the resolved-entity state (``operators/linkage.py:
incremental_resolve_entities``) under Structured Streaming.

Unlike the append-only dedup states, ER state is RELABELED in place
(a new record can merge two existing entities), so idempotency comes
from batch-keyed FULL SNAPSHOTS instead of batch-keyed appends: batch N
reads the latest snapshot with id < N, applies the O(Δ) fold, and
overwrites ``entities/batch=N`` with the complete updated state. A
replayed batch recomputes from the same predecessor snapshot and
rewrites the same directory — convergent, hence effectively
exactly-once on top of foreachBatch's at-least-once delivery.

Snapshots older than the previous one are pruned (checkpointed offsets
only ever replay the last uncommitted batch, so predecessor + current
is the full recovery set); at warehouse scale the snapshot is an
id→entity_id + block/compare-column table — record METADATA, never
payloads.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _snapshot_ids(entities_dir: str) -> list[int]:
    if not os.path.isdir(entities_dir):
        return []
    out = []
    for name in os.listdir(entities_dir):
        m = re.fullmatch(r"batch=(\d+)", name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def foreach_batch_entity_resolution(
    stream_records: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    id_col: str,
    block_cols: list[str],
    compare_cols: list[str],
    matcher,
    retain_snapshots: int = 2,
    index_output: str | None = None,
    index_buckets: int = 64,
):
    """Run the record stream to completion (``availableNow``), resolving
    entities incrementally per micro-batch. Returns the finished query.

    The resolved state after the final batch is the snapshot with the
    highest batch id under ``{state_dir}/entities`` (see
    :func:`read_entity_state`).

    ``index_output`` additionally maintains the bucket-partitioned
    SERVING index (:func:`~home_credit_data_engineering_spark.operators.
    linkage.write_entity_index` layout) per micro-batch: the first batch
    writes it in full, every later batch patches only the touched
    buckets (:func:`~home_credit_data_engineering_spark.operators.
    linkage.refresh_entity_index`, diffing snapshot N against its
    predecessor). The refresh runs INSIDE apply_batch — before the
    offset commit — so a crash anywhere in the fold redelivers the
    batch, which recomputes the same snapshot from the same predecessor
    and rewrites the same buckets with the same contents: the index
    converges without the batch CLI's ``_refresh_pending`` sentinel.
    """

    entities_dir = f"{state_dir}/entities"
    if retain_snapshots < 2:
        # predecessor + current IS the replay recovery set: with only
        # the current snapshot retained, a replayed batch N would find
        # no prior < N, silently bootstrap from EMPTY state, and
        # overwrite the only snapshot — total history loss.
        raise ValueError(
            f"retain_snapshots must be >= 2 (got {retain_snapshots}): "
            "a replayed batch recomputes from its predecessor snapshot"
        )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        from home_credit_data_engineering_spark.operators.linkage import (
            incremental_resolve_entities,
        )

        spark = batch_df.sparkSession
        cols = list(dict.fromkeys([id_col, *block_cols, *compare_cols]))
        batch = batch_df.select(*cols).dropDuplicates([id_col])
        batch = batch.localCheckpoint(eager=True)
        existing = _snapshot_ids(entities_dir)
        if existing and max(existing) > batch_id:
            # foreachBatch batch ids restart at 0 when checkpoint_dir is
            # recreated. Proceeding would bootstrap from EMPTY state and
            # then PRUNE the real snapshots — silent loss of the whole
            # resolution history. Refuse loudly instead.
            #
            # max(existing) == batch_id is NOT a reset: it is the
            # at-least-once replay window (crash after entities/batch=N was
            # written but before the offset committed). The replay falls
            # through, recomputes from the latest snapshot with id < N, and
            # overwrites batch=N — the convergent path the docstring
            # promises.
            raise RuntimeError(
                f"entity snapshots up to batch={max(existing)} exist under "
                f"{entities_dir} but this stream is delivering "
                f"batch={batch_id} — the checkpoint was reset. Point the "
                "stream at a fresh state_dir, or restore the original "
                "checkpoint to resume."
            )
        prior = [i for i in existing if i < batch_id]
        if existing and not prior and batch_id > 0:
            # snapshots exist but none precede this non-initial batch:
            # the predecessor was pruned (or the dir was tampered with).
            # Recomputing from empty would silently drop every entity
            # the missing predecessor carried.
            raise RuntimeError(
                f"batch={batch_id} has no predecessor snapshot under "
                f"{entities_dir} (existing: {existing}) — cannot replay "
                "safely; restore the predecessor or start a fresh "
                "state_dir"
            )
        if prior:
            state = spark.read.parquet(
                f"{entities_dir}/batch={prior[-1]}"
            )
        else:
            state = batch.limit(0).withColumn(
                "entity_id", F.col(id_col)
            ).select(id_col, "entity_id", *[c for c in cols if c != id_col])
        updated = incremental_resolve_entities(
            state, batch, id_col, block_cols, compare_cols, matcher
        )
        updated.write.mode("overwrite").parquet(
            f"{entities_dir}/batch={batch_id}"
        )
        if index_output is not None:
            from home_credit_data_engineering_spark.operators.linkage import (
                refresh_entity_index,
                write_entity_index,
            )

            snapshot = spark.read.parquet(f"{entities_dir}/batch={batch_id}")
            # completeness marker: _index_meta.json is the LAST artifact
            # write_entity_index emits, so its presence means both legs
            # finished. Gating the refresh on by_record alone would take
            # the incremental branch after a crash mid full-write and
            # leave by_entity missing every untouched bucket forever.
            if prior and os.path.exists(
                os.path.join(index_output, "_index_meta.json")
            ):
                refresh_entity_index(
                    snapshot, state, index_output, id_col,
                    n_buckets=index_buckets,
                )
            else:
                write_entity_index(
                    snapshot, index_output, id_col, n_buckets=index_buckets
                )
        # Prune everything older than the predecessor set.
        keep = set(_snapshot_ids(entities_dir)[-retain_snapshots:])
        for i in _snapshot_ids(entities_dir):
            if i not in keep:
                shutil.rmtree(f"{entities_dir}/batch={i}")

    query = (
        stream_records.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def read_entity_state(spark, state_dir: str) -> DataFrame:
    """The current resolved state: the highest-batch-id snapshot."""
    entities_dir = f"{state_dir}/entities"
    ids = _snapshot_ids(entities_dir)
    if not ids:
        raise FileNotFoundError(f"no entity snapshots under {entities_dir}")
    return spark.read.parquet(f"{entities_dir}/batch={ids[-1]}")
