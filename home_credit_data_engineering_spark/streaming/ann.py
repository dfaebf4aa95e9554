"""Streaming ANN index maintenance: fold each micro-batch of new
vectors into a persisted IVF index under Structured Streaming —
completing the stream==batch symmetry the dedup / ER / corpus states
already have.

The batch API's increments (``operators/ann_state.py``) are bare
parquet appends, which are NOT replay-safe: foreachBatch delivers
at-least-once, and a replayed append double-counts. The streaming form
therefore owns a REPLAY-IDEMPOTENT layout:

- data rows land in ``(cell, batch)`` partitions written with dynamic
  partition overwrite. Cell assignment under frozen centroids is
  deterministic, so a replayed batch touches exactly its own previous
  partitions and overwrites them — no duplicates, no matter how many
  retries. (This is why the layout differs from the batch index: a
  cell-only tree cannot distinguish one batch's files from another's.)
- per-batch drift-stats deltas land in ``_cell_stats_deltas/batch=N``
  (overwrite-idempotent); the running per-cell state is their sum,
  merged at read time — the same batch-keyed-delta discipline as the
  corpus report card.
- the FIRST micro-batch bootstraps the index: it trains the coarse
  quantizer with the exact trainer the one-time build uses
  (``similarity.train_ivf_centroids``, seeded) and saves
  ``_centroids.npy``; every later batch assigns under those frozen
  centroids with the build's own UDF.

The query path is unchanged: ``similarity.ivf_query_index`` reads the
``cell=…`` tree, partition-prunes on the first level, and selects only
(id, vector, cell) — the extra ``batch`` partition column is simply
never selected. Do NOT mix maintainers: the batch increment's cell-only
appends into a ``(cell, batch)`` tree (or vice versa) would conflict at
partition discovery.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.functions.vectors import to_double_array
from home_credit_data_engineering_spark.operators.ann_state import (
    _STATS_SCHEMA,
    _merge_stats,
    _unit,
    cell_stats,
    drift_report,
)


def _deltas_path(index_path: str) -> str:
    return os.path.join(index_path, "_cell_stats_deltas")


def read_streaming_cell_stats(spark: SparkSession, index_path: str) -> DataFrame:
    """Running per-cell (n, Σ unit-vector) state: the sum of every
    batch's delta (cells-sized frames; the merge never touches data)."""
    return (
        spark.read.parquet(_deltas_path(index_path))
        .select("cell", "n", "vsum")
        .groupBy("cell")
        .applyInPandas(_merge_stats, _STATS_SCHEMA)
    )


def foreach_batch_ann_ingest(
    stream_vectors: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    train_fraction: float | None = None,
    mean_shift_threshold: float = 0.2,
    imbalance_threshold: float = 8.0,
    reports: list | None = None,
):
    """Run the vector stream to completion (``availableNow``), folding
    each micro-batch into the IVF index. Returns the finished query.

    ``reports`` (optional list) collects one drift report per applied
    batch — the streaming analogue of the batch increment's return
    value; a caller watches it (or the printed lines) for
    ``rebuild_recommended`` and restarts the pipeline against a freshly
    trained index when it trips.
    """
    from home_credit_data_engineering_spark.operators.similarity import (
        best_cell_udf,
        train_ivf_centroids,
    )

    centroids_file = os.path.join(index_path, "_centroids.npy")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.dropDuplicates([id_col])
        if not os.path.exists(centroids_file):
            # bootstrap: this batch trains the coarse quantizer
            centers = train_ivf_centroids(
                batch,
                vec_col=vec_col,
                n_centroids=n_centroids,
                seed=seed,
                train_fraction=train_fraction,
            )
            os.makedirs(index_path, exist_ok=True)
            np.save(centroids_file, centers)
        else:
            centers = np.load(centroids_file)
        best_cell = best_cell_udf(_unit(centers))
        delta = (
            batch.select(
                F.col(id_col),
                F.col(vec_col),
                best_cell(to_double_array(vec_col)).alias("cell"),
            )
            .withColumn("batch", F.lit(batch_id))
            .localCheckpoint(eager=True)  # assign once: data + stats
        )
        (
            delta.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cell", "batch")
            .parquet(index_path)
        )
        # batch-keyed stats delta: a replay overwrites its own directory
        cell_stats(delta, vec_col).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{_deltas_path(index_path)}/batch={batch_id}")
        spark = batch_df.sparkSession
        rows = read_streaming_cell_stats(spark, index_path).collect()
        report = drift_report(
            rows, centers, mean_shift_threshold, imbalance_threshold
        )
        report["batch_id"] = batch_id
        report["appended"] = delta.count()
        if reports is not None:
            reports.append(report)

    query = (
        stream_vectors.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
