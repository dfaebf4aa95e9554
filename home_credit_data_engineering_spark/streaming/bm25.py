"""Streaming BM25 index maintenance: fold each micro-batch of new
documents into the persisted lexical index under Structured Streaming.

Exactness carries over from the batch increment
(``operators/retrieval.py:bm25_index_increment``): every index leg is
either doc-keyed rows or an exactly-mergeable integer aggregate, so the
streamed index scores BIT-IDENTICALLY to a one-shot build over the same
corpus (asserted in tests). What the streaming form adds is REPLAY
IDEMPOTENCY, which the batch increment's bare appends cannot give under
foreachBatch's at-least-once delivery:

- ``postings/`` rows land in ``(bucket, batch)`` partitions and ``df/``
  per-term DELTA counts in ``(bucket, batch)`` partitions, both written
  with dynamic partition overwrite — a replayed batch tokenizes the
  same documents into the same buckets and overwrites exactly its own
  previous partitions;
- ``doclens/`` and ``stats/`` rows land in ``batch=N`` partitions the
  same way (stats carries the exact integer ``total_dl`` sum per
  batch).

The query path (``retrieval._index_scores``) serves both layouts with
one plan: df group-sums per term and stats sum across rows — identity
on the single-row batch layout, the delta merge here. Do NOT mix
maintainers on one index: the batch increment's bucket-only appends
into a ``(bucket, batch)`` tree (or vice versa) conflict at partition
discovery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.retrieval import (
    _corpus_stats,
    _postings,
    term_bucket,
)
from home_credit_data_engineering_spark.sources.maintenance import (
    assert_layout_if_marked,
    check_state_layout,
    recover_state_swap,
    staged_state_path,
    swap_in_state,
)


def _check_streamed_layout(index_path: str) -> None:
    """Raise on a batch-maintained tree (mechanical form of the "Do NOT
    mix maintainers" contract above); legacy streamed trees without the
    marker are detected by their batch-partitioned stats leg and
    adopted."""
    import os

    stats_dir = os.path.join(index_path, "stats")
    batch_shaped = os.path.isdir(stats_dir) and not any(
        d.startswith("batch=") for d in os.listdir(stats_dir)
    )
    check_state_layout(
        index_path,
        "streamed",
        "bm25",
        inferred_maintainer="batch" if batch_shaped else "streamed",
    )


def compact_streamed_bm25_index(spark, index_path: str) -> dict:
    """OFFLINE compaction of a streaming-maintained BM25 index: fold
    every batch EXCEPT the newest into one partition per leg. Run with
    the stream STOPPED.

    Query results are BIT-IDENTICAL before and after: postings/doclens
    rows just move directories; per-term df counts and the corpus
    scalars group-sum exactly (integer-valued doubles — order-free),
    which is the same aggregation the query path applies at read time.
    Each leg rewrites through its own two-phase ``__next`` swap, and a
    crash BETWEEN legs is harmless because every leg's fold preserves
    that leg's queryable content. The newest batch keeps its own
    partitions — a restart can redeliver it (crash before the final
    offset commit) and must overwrite only its own directories.
    Returns ``{"batches_before", "batches_after"}``.
    """
    # two-phase layout guard: an EXPLICIT marker mismatch raises BEFORE
    # recovery (generic swap recovery on a batch tree would discard its
    # promised fold-commit legs); legacy-tree inference runs after
    # recovery, so it never reads a leg that is mid-swap
    assert_layout_if_marked(index_path, "streamed", "bm25")
    for leg in ("postings", "df", "doclens", "stats"):
        recover_state_swap(f"{index_path}/{leg}")
    _check_streamed_layout(index_path)

    def _leg(leg: str):
        # partition inference is off engine-wide (session.py): the batch
        # partition column reads back as STRING — cast before comparing,
        # else "10" < "9" lexicographically and the fold absorbs the
        # replayable newest batch
        return spark.read.parquet(f"{index_path}/{leg}").withColumn(
            "batch", F.col("batch").cast("int")
        )

    stats = _leg("stats")
    ids = sorted(
        r["batch"] for r in stats.select("batch").distinct().collect()
    )
    if len(ids) < 3:
        return {"batches_before": len(ids), "batches_after": len(ids)}
    max_id, target = ids[-1], ids[-2]
    fold_mark = F.when(F.col("batch") < max_id, F.lit(target)).otherwise(
        F.col("batch")
    )

    def _swap(frame, leg: str, *part_cols: str):
        frame.write.partitionBy(*part_cols).parquet(
            staged_state_path(f"{index_path}/{leg}")
        )
        swap_in_state(f"{index_path}/{leg}")

    postings = _leg("postings")
    _swap(
        postings.withColumn("batch", fold_mark).repartition("bucket"),
        "postings", "bucket", "batch",
    )
    df = _leg("df")
    df_fold = (
        df.filter(F.col("batch") < max_id)
        .groupBy("term", "bucket")
        .agg(F.sum("df").alias("df"))
        .withColumn("batch", F.lit(target))
    )
    df_cur = df.filter(F.col("batch") == max_id)
    _swap(
        df_fold.unionByName(df_cur.select(*df_fold.columns))
        .repartition("bucket"),
        "df", "bucket", "batch",
    )
    doclens = _leg("doclens")
    # batch-only leg: coalesce so the fold actually reduces file count
    # (a bare rewrite keeps ~one output file per input file)
    _swap(
        doclens.withColumn("batch", fold_mark).coalesce(
            spark.sparkContext.defaultParallelism
        ),
        "doclens", "batch",
    )
    st_fold = (
        stats.filter(F.col("batch") < max_id)
        .groupBy("n_buckets")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("total_dl").alias("total_dl"),
        )
        .withColumn("avgdl", F.col("total_dl") / F.col("n_docs"))
        .withColumn("batch", F.lit(target))
    )
    st_cur = stats.filter(F.col("batch") == max_id)
    _swap(
        st_fold.select(*st_cur.columns)
        .unionByName(st_cur)
        .coalesce(1),
        "stats", "batch",
    )
    return {"batches_before": len(ids), "batches_after": 2}


def foreach_batch_bm25_ingest(
    stream_docs: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    reports: list | None = None,
):
    """Run the document stream to completion (``availableNow``), folding
    each micro-batch into the index. Returns the finished query.

    ``reports`` (optional list) collects per-batch
    ``{"batch_id", "docs_added", "terms_touched"}`` dicts.

    The bucket count is pinned by the index: resuming an existing index
    with a different ``n_buckets`` raises up front (the same guard the
    batch increment ``bm25_index_increment`` applies) — new postings
    would otherwise hash under one modulus while old rows sit under
    another, and query-time partition pruning would silently miss them.
    """
    import os

    # two-phase layout guard (see compact_streamed_bm25_index), then
    # finish any swap a compaction left mid-flight BEFORE the first
    # write recreates the live legs — recover_state_swap discards a
    # completed __next once the live dir exists, so writing first would
    # permanently lose the pre-crash postings (and the n_buckets guard
    # below would silently skip while stats/ is mid-swap). The legacy
    # inference runs after recovery for the same reason: it reads stats.
    assert_layout_if_marked(index_path, "streamed", "bm25")
    for leg in ("postings", "df", "doclens", "stats"):
        recover_state_swap(f"{index_path}/{leg}")
    _check_streamed_layout(index_path)
    stats_dir = f"{index_path}/stats"
    if os.path.isdir(stats_dir):
        spark = stream_docs.sparkSession
        stored = spark.read.parquet(stats_dir).select("n_buckets").first()
        if stored is not None and int(stored["n_buckets"]) != n_buckets:
            raise ValueError(
                f"index was built with n_buckets={int(stored['n_buckets'])}, "
                f"got {n_buckets}"
            )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.dropDuplicates([id_col])
        # one tokenization pass: tf rows are distinct (doc, term), so
        # the df delta is a per-term row count over tf
        tf = (
            _postings(docs, id_col, text_col)
            .groupBy("__doc", "__term")
            .agg(F.count(F.lit(1)).cast("double").alias("tf"))
            .localCheckpoint(eager=True)
        )
        (
            tf.select(
                F.col("__term").alias("term"),
                F.col("__doc").alias("doc_id"),
                "tf",
                term_bucket("__term", n_buckets).alias("bucket"),
                F.lit(batch_id).alias("batch"),
            )
            .repartition("bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket", "batch")
            .parquet(f"{index_path}/postings")
        )
        delta_df = tf.groupBy("__term").agg(
            F.count(F.lit(1)).cast("double").alias("df")
        )
        (
            delta_df.select(
                F.col("__term").alias("term"),
                "df",
                term_bucket("__term", n_buckets).alias("bucket"),
                F.lit(batch_id).alias("batch"),
            )
            .repartition("bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket", "batch")
            .parquet(f"{index_path}/df")
        )
        dls, scalars = _corpus_stats(docs, id_col, text_col)
        (
            dls.select(
                F.col("__doc").alias("doc_id"),
                F.col("__dl").alias("dl"),
                F.lit(batch_id).alias("batch"),
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(f"{index_path}/doclens")
        )
        # one evaluation of the scalar agg: collect the single row, then
        # write the stats partition from it. n_docs counts EVERY batch
        # doc (a zero-term doc has a doclens row but no tf rows), so the
        # report's docs_added matches the index's own stats leg and the
        # batch increment's report for identical input.
        srow = scalars.first()
        spark = batch_df.sparkSession
        (
            spark.createDataFrame(
                [
                    (
                        float(srow["__n_docs"] or 0.0),
                        float(srow["__avgdl"] or 0.0),
                        float(srow["__total_dl"] or 0.0),
                        n_buckets,
                        batch_id,
                    )
                ],
                # same column types the one-shot build writes — the
                # query path unions/sums these across partitions
                "n_docs double, avgdl double, total_dl double, "
                "n_buckets int, batch int",
            )
            .coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(f"{index_path}/stats")
        )
        if reports is not None:
            row = tf.agg(
                F.count_distinct(F.col("__term")).alias("t"),
            ).first()
            reports.append(
                {
                    "batch_id": batch_id,
                    "docs_added": int(srow["__n_docs"] or 0),
                    "terms_touched": int(row["t"] or 0),
                }
            )

    query = (
        stream_docs.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
