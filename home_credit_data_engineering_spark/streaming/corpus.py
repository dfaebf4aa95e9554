"""Streaming corpus ingestion: quality-flag and chunk documents as they
arrive.

The corpus-prep surface splits cleanly by statefulness:

- **Stateless passes stream as-is.** Quality signals
  (``plans/quality_filter.quality_rules``) and retrieval chunking
  (``operators/packing.chunk_documents``) are narrow per-row
  projections, so the SAME code runs identically under
  ``readStream`` — micro-batch outputs concatenate to exactly the
  batch result (asserted stream==batch in
  ``tests/test_streaming_corpus.py``).
- **Whole-corpus operators stay batch.** Exact-substring span dedup and
  sequence packing are corpus-global by definition (a window is
  "duplicated" relative to every document ever seen; packing offsets
  shift as the corpus grows). Their streaming form is the incremental
  batch job (``jobs/corpus_prep.py`` over the accumulated bronze, or
  ``operators/dedup.minhash_incremental_pairs`` for near-dup) — running
  them inside a micro-batch would silently change semantics to
  "duplicated within this batch".
- **Exact dedup streams with bounded state** via
  ``streaming/joins.streaming_dedup`` (dropDuplicatesWithinWatermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from home_credit_data_engineering_spark.plans.quality_filter import (
    QualityThresholds,
    _flag,
    quality_rules,
)

__all__ = [
    "read_document_stream",
    "quality_flag_stream",
    "chunk_stream",
    "bpe_count_stream",
    "foreach_batch_perplexity",
    "foreach_batch_corpus_pipeline",
]

#: Declared schema for the driver's documents table (file streams require
#: an explicit schema — inference would scan ahead of the stream).
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def read_document_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source document stream (swap for kafka in production; the
    downstream plan is identical). ``maxFilesPerTrigger`` bounds
    micro-batch size — the knob that keeps per-batch memory flat when
    backfilling a large directory."""
    reader = spark.readStream.format(fmt).schema(schema or DOCUMENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def quality_flag_stream(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str | None = "lang",
    thresholds: QualityThresholds | None = None,
) -> DataFrame:
    """Append a ``failed_rules`` array and boolean ``kept`` to a document
    stream — the SAME signal expressions the batch quality filter uses
    (one code path, two execution modes). Stateless: every signal is a
    per-row JVM expression, so watermarks and output-mode restrictions
    don't apply; route kept/dropped downstream with a partitioned
    ``writeStream`` on ``kept`` exactly like the batch single-pass job."""
    rules = quality_rules(text_col, lang_col, thresholds or QualityThresholds())
    flagged = _flag(docs, rules)
    return flagged.withColumn("kept", F.size("failed_rules") == 0)


def chunk_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Overlapping token-window chunks over a document stream — reuses
    :func:`~..operators.packing.chunk_documents` verbatim (narrow
    sequence+explode+slice projection: legal and shuffle-free under
    structured streaming)."""
    from home_credit_data_engineering_spark.operators.packing import chunk_documents

    return chunk_documents(
        docs, id_col, text_col, chunk_tokens=chunk_tokens, stride=stride
    )


def bpe_count_stream(
    docs: DataFrame,
    text_col: str = "text",
    merges: list[tuple[str, str]] | None = None,
    out_col: str = "bpe_token_count",
) -> DataFrame:
    """Real BPE token counts over a document stream — reuses
    :func:`~..functions.bpe.with_bpe_token_count` verbatim. Stateless:
    the merges table is a pinned artifact shipped in the UDF closure
    and encoding is per-row, so it is legal under structured streaming
    with no watermark, and micro-batch outputs concatenate to exactly
    the batch result (asserted stream==batch). The streaming half of
    token accounting: count on ingest, budget (packing/mixing) in the
    batch layer over the accumulated bronze."""
    from home_credit_data_engineering_spark.functions.bpe import (
        with_bpe_token_count,
    )

    return with_bpe_token_count(docs, text_col, merges=merges, out_col=out_col)


def foreach_batch_perplexity(
    stream_docs: DataFrame,
    model_path: str,
    output_path: str,
    checkpoint_dir: str,
    unseen_logp: float,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Score a document stream against a PERSISTED unigram model — the
    streaming face of the CCNet quality filter: history trains the model
    (refreshed O(delta) via ``operators/lm.unigram_count_state``), new
    documents score as they arrive.

    Shape note: per-document scoring aggregates (doc, token) pairs, so
    it runs inside ``foreachBatch`` — documents arrive whole within a
    micro-batch, making per-batch scoring EXACT, whereas a streaming
    aggregation keyed by doc_id would accumulate unbounded state for no
    semantic gain. The model is read once per batch from
    ``model_path`` (a ``(token, logp)`` parquet, written by
    ``jobs/perplexity.py`` / ``write_parquet``); ``unseen_logp`` is
    mandatory because streamed tokens may be absent from the history
    model (by convention the model's smoothed floor). Self-trained
    scoring is deliberately NOT offered here — a per-micro-batch
    vocabulary would silently change semantics to "perplexity relative
    to this batch".

    Each batch writes to ``output_path/batch=<id>`` so a replayed batch
    overwrites its own output — idempotent, hence effectively
    exactly-once. Bucket downstream against FIXED thresholds from the
    history run (a streaming NTILE/percentile would again be
    corpus-global semantics). Returns the finished query.
    """
    from home_credit_data_engineering_spark.operators.lm import lm_perplexity

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        model = spark.read.parquet(model_path)
        scored = lm_perplexity(
            batch_df,
            id_col,
            text_col,
            model=model,
            unseen_logp=unseen_logp,
        )
        scored.write.mode("overwrite").parquet(
            f"{output_path}/batch={batch_id}"
        )

    query = (
        stream_docs.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def foreach_batch_corpus_pipeline(
    stream_docs: DataFrame,
    benchmark_path: str,
    state_dir: str,
    output_root: str,
    checkpoint_dir: str,
    *,
    budget: int = 512,
    thresholds: QualityThresholds | None = None,
    num_hashes: int = 32,
    bands: int = 8,
    near_threshold: float = 0.7,
    span_k: int = 8,
    shards: int = 16,
    run_log: str | None = None,
):
    """The streaming face of the COMPOSED corpus pipeline: every
    micro-batch runs :func:`~..plans.corpus_pipeline.
    corpus_pipeline_increment` against the persisted state — quality →
    exact-vs-history → incremental LSH near-dedup → decontamination →
    card-state merge → per-batch packed shards — so a file/kafka feed
    of documents becomes training shards continuously, with the SAME
    semantics as the nightly increment job (the two-increment ==
    full-recompute equivalence in ``test_corpus_pipeline`` covers this
    path too: batches here ARE increments).

    Contracts: document ids must be MONOTONE across batches (the
    increment contract); each batch's artifacts land under
    ``output_root/batch=<id>``. Replay safety: the increment itself is
    IDEMPOTENT under replay — every state table is a per-batch
    overwrite delta keyed by the batch's id range, and a batch's own
    crashed-run fingerprints are recognized and treated as fresh (see
    ``corpus_pipeline_increment``) — so an at-least-once ``foreachBatch``
    redelivery after a crash at ANY point re-produces the same outputs
    and state. The marker under ``state_dir/batches/`` is an
    optimization on top: a fully-processed batch short-circuits without
    re-running the increment. Empty micro-batches are skipped.
    """
    import os

    from home_credit_data_engineering_spark.plans.corpus_pipeline import (
        corpus_pipeline_increment,
    )

    marker_dir = f"{state_dir.rstrip('/')}/batches"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # The replay marker is keyed by the batch's CONTENT (its id
        # range — the same tag the increment's state deltas use), not by
        # foreachBatch's batch_id: batch_id restarts at 0 whenever the
        # checkpointLocation is recreated, so a batch_id-keyed marker
        # would silently skip NEW data after a checkpoint reset, while a
        # content-keyed marker skips exactly the batches whose work is
        # already durable.
        from home_credit_data_engineering_spark.plans.corpus_pipeline import (
            _batch_tag,
        )

        tag = _batch_tag(batch_df, "doc_id")
        marker = os.path.join(marker_dir, tag)
        if os.path.exists(marker):
            return
        spark = batch_df.sparkSession
        benchmark = spark.read.parquet(benchmark_path)
        corpus_pipeline_increment(
            spark,
            batch_df,
            benchmark,
            state_dir,
            f"{output_root.rstrip('/')}/batch={batch_id}",
            thresholds=thresholds,
            num_hashes=num_hashes,
            bands=bands,
            near_threshold=near_threshold,
            span_k=span_k,
            budget=budget,
            shards=shards,
            run_log=run_log,
        )
        os.makedirs(marker_dir, exist_ok=True)
        with open(marker, "w", encoding="utf-8") as fh:
            fh.write("done\n")

    query = (
        stream_docs.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
