"""Composed end-to-end corpus pipeline: quality filter → exact dedup →
near dedup (collapse-exact MinHash) → benchmark decontamination →
report card → pack + token-id emission, as ONE orchestrated run.

Every stage already exists as its own job
(``jobs/quality.py``, ``jobs/dedup.py``, ``jobs/report_card.py``,
``jobs/pack_corpus.py``); this module chains them with tested
inter-stage column contracts — the place a real nightly pipeline
breaks — and emits a per-stage **row ledger** (the audit artifact:
one row per stage with rows_in / rows_out / rows_removed) plus a
JSONL run-log line with per-stage wall seconds and stage extras.

This is an extension surface (no reference counterpart — the reference
at /root/reference is a medallion ETL with no corpus tooling); the
shape mirrors the reference's orchestrated silver→gold mains
(``spark/silver/processor.py:687-733``) at corpus scale.

100 TB posture: each stage keeps its own documented scale discipline
(hash-only shuffles in dedup, broadcastable benchmark side in
decontamination, metadata-only FFD in packing); this orchestrator adds
only bounded driver work — ledger counts ride persisted frames that
each stage needs anyway, and every persist is released on exit.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.plans.corpus import dedup_corpus
from home_credit_data_engineering_spark.plans.quality_filter import (
    QualityThresholds,
    quality_filter,
)
from home_credit_data_engineering_spark.runlog import append_run_log, timed

#: Ledger stage names in pipeline order.
LEDGER_STAGES = (
    "quality",
    "dedup_exact",
    "dedup_near",
    "decontaminate",
    "report_card",
    "pack",
)


@dataclass
class CorpusPipelineReport:
    """Operational record of one composed run."""

    #: One dict per stage: {stage_order, stage, rows_in, rows_out,
    #: rows_removed} — document counts through the chain.
    ledger: list[dict] = field(default_factory=list)
    #: Per-stage extras (rule drops, cc rounds, span/token strip counts,
    #: bin/token totals) keyed by stage name.
    extras: dict = field(default_factory=dict)
    stage_seconds: dict[str, float] = field(default_factory=dict)

    def add_stage(self, stage: str, rows_in: int, rows_out: int) -> None:
        self.ledger.append(
            {
                "stage_order": len(self.ledger) + 1,
                "stage": stage,
                "rows_in": int(rows_in),
                "rows_out": int(rows_out),
                "rows_removed": int(rows_in) - int(rows_out),
            }
        )

    def as_record(self) -> dict:
        return {
            "job": "corpus_pipeline",
            "ledger": list(self.ledger),
            "extras": dict(self.extras),
            "stage_seconds": dict(self.stage_seconds),
        }


def ledger_frame(spark: SparkSession, report: CorpusPipelineReport) -> DataFrame:
    """The ledger as a (stage_order, stage, rows_in, rows_out,
    rows_removed) DataFrame — written next to the pipeline outputs so
    downstream audits diff ledgers across runs."""
    return spark.createDataFrame(
        [
            (
                r["stage_order"],
                r["stage"],
                r["rows_in"],
                r["rows_out"],
                r["rows_removed"],
            )
            for r in report.ledger
        ],
        "stage_order int, stage string, rows_in bigint, rows_out bigint, "
        "rows_removed bigint",
    )


def corpus_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    benchmark: DataFrame,
    output_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = "lang",
    source_col: str = "source",
    thresholds: QualityThresholds | None = None,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    near_threshold: float = 0.7,
    span_k: int = 8,
    budget: int = 512,
    merges: list[tuple[str, str]] | None = None,
    tokenizer: str = "bpe",
    unigram_vocab: list[tuple[str, float]] | None = None,
    unigram_vocab_size: int = 512,
    unigram_max_piece_len: int = 6,
    shards: int = 16,
    seed: int = 42,
    collapse_exact: bool = True,
    run_log: str | None = None,
) -> dict:
    """Run the full corpus chain; returns ``{"clean", "ledger",
    "report", "paths"}``.

    Stages and their written artifacts under ``output_dir``:

    1. **quality** — Gopher-style keep/drop
       (:func:`~..plans.quality_filter.quality_filter`); dropped rows
       with their ``failed_rules`` audit → ``quality_dropped/``.
    2. **dedup_exact** + 3. **dedup_near** —
       :func:`~..plans.corpus.dedup_corpus` (md5-fingerprint exact pass,
       then MinHash-LSH + connected components; ``collapse_exact=True``
       routes the near stage through the duplicate-heavy production
       operator). Removal list → ``dedup_removals/``.
    4. **decontaminate** — benchmark-overlap spans
       (:func:`~..operators.spans.contaminated_spans`, window size
       ``span_k``) stripped out of the surviving text
       (:func:`~..operators.spans.strip_spans`); documents whose ENTIRE
       text was benchmark overlap are dropped. Cleaned corpus (original
       columns, ``text_col`` replaced, plus ``removed_tokens``) →
       ``clean/``.
    5. **report_card** — per-source datasheet over the cleaned corpus
       (:func:`~..operators.quality.corpus_report_card`) → ``card/``.
       Document counts pass through unchanged (side artifact).
    6. **pack** — token-id encoding + FFD whole-document packing
       (:func:`~..operators.packing.write_packed_corpus`) → ``packed/``
       (parquet partitioned by shard). ``tokenizer="bpe"`` (default)
       encodes with the pinned-merges BPE; ``tokenizer="unigram"``
       encodes with a unigram-LM vocabulary — ``unigram_vocab`` if
       given, else TRAINED on the cleaned corpus (the realistic flow:
       fit the tokenizer on the data it will tokenize) and saved to
       ``unigram.vocab`` under ``output_dir``. Zero-token documents
       (none, post-filter, unless encoding yields none) are dropped by
       the packer; the ledger measures the packed doc count from the
       written shards, never assumes it.

    The ledger (one row per stage) → ``ledger/`` and the returned
    report; with ``run_log`` the whole record appends as one JSONL line.
    """
    from pyspark import StorageLevel

    from home_credit_data_engineering_spark.operators.packing import (
        write_packed_corpus,
    )
    from home_credit_data_engineering_spark.operators.quality import (
        corpus_report_card,
    )
    from home_credit_data_engineering_spark.operators.spans import (
        contaminated_spans,
        strip_spans,
    )

    out = output_dir.rstrip("/")
    paths = {
        "quality_dropped": f"{out}/quality_dropped",
        "dedup_removals": f"{out}/dedup_removals",
        "clean": f"{out}/clean",
        "card": f"{out}/card",
        "packed": f"{out}/packed",
        "ledger": f"{out}/ledger",
    }
    report = CorpusPipelineReport()
    persisted: list[DataFrame] = []

    try:
        # -- 1. quality ------------------------------------------------
        with timed(report.stage_seconds, "quality"):
            qf = quality_filter(
                docs, text_col=text_col, lang_col=lang_col, thresholds=thresholds
            )
            kept = qf["kept"].persist(StorageLevel.MEMORY_AND_DISK)
            persisted.append(kept)
            qf["dropped"].withColumn(
                "failed_rules", F.array_join("failed_rules", ",")
            ).write.mode("overwrite").parquet(paths["quality_dropped"])
            q = qf["report"]
            report.add_stage("quality", q.rows_in, q.rows_kept)
            report.extras["quality"] = {"rule_drops": dict(q.rule_drops)}

        # -- 2+3. dedup (exact, then near) -----------------------------
        with timed(report.stage_seconds, "dedup"):
            dd = dedup_corpus(
                spark,
                kept,
                id_col=id_col,
                text_col=text_col,
                num_hashes=num_hashes,
                bands=bands,
                shingle_k=shingle_k,
                near_threshold=near_threshold,
                collapse_exact=collapse_exact,
            )
            dd["removals"].write.mode("overwrite").parquet(
                paths["dedup_removals"]
            )
            r = dd["report"]
            report.add_stage(
                "dedup_exact", r.rows_in, r.rows_in - r.exact_removed
            )
            report.add_stage(
                "dedup_near", r.rows_in - r.exact_removed, r.rows_out
            )
            report.extras["dedup"] = {"cc_rounds": r.cc_rounds}
            deduped = dd["deduped"].persist(StorageLevel.MEMORY_AND_DISK)
            persisted.append(deduped)

        # -- 4. decontaminate ------------------------------------------
        with timed(report.stage_seconds, "decontaminate"):
            spans = contaminated_spans(
                deduped, benchmark, id_col, text_col, k=span_k
            )
            stripped = strip_spans(
                deduped, spans, id_col, text_col, out_col="__clean_text"
            )
            # inter-stage contract: original columns survive, text_col is
            # replaced by the stripped form, removed_tokens is appended
            clean_all = (
                deduped.drop(text_col)
                .join(stripped, id_col)
                .withColumnRenamed("__clean_text", text_col)
            )
            clean = clean_all.filter(F.trim(F.col(text_col)) != "").persist(
                StorageLevel.MEMORY_AND_DISK
            )
            persisted.append(clean)
            clean.write.mode("overwrite").parquet(paths["clean"])
            n_dedup = report.ledger[-1]["rows_out"]
            n_clean = clean.count()
            strip_stats = clean_all.agg(
                F.sum("removed_tokens").alias("t"),
                F.sum((F.col("removed_tokens") > 0).cast("long")).alias("d"),
            ).first()
            report.add_stage("decontaminate", n_dedup, n_clean)
            report.extras["decontaminate"] = {
                "tokens_removed": int(strip_stats["t"] or 0),
                "docs_touched": int(strip_stats["d"] or 0),
            }

        # -- 5. report card --------------------------------------------
        with timed(report.stage_seconds, "report_card"):
            card = corpus_report_card(
                clean,
                source_col=source_col,
                text_col=text_col,
                lang_col=lang_col or "lang",
            )
            card.write.mode("overwrite").parquet(paths["card"])
            n_sources = spark.read.parquet(paths["card"]).count()
            report.add_stage("report_card", n_clean, n_clean)
            report.extras["report_card"] = {"n_sources": int(n_sources)}

        # -- 6. pack ----------------------------------------------------
        if tokenizer not in ("bpe", "unigram"):
            raise ValueError(
                f"tokenizer must be 'bpe' or 'unigram', got {tokenizer!r}"
            )
        with timed(report.stage_seconds, "pack"):
            if tokenizer == "unigram":
                from home_credit_data_engineering_spark.functions.unigram import (
                    save_unigram,
                    train_unigram,
                    unigram_token_ids_col,
                )

                vocab = unigram_vocab
                if vocab is None:
                    vocab = train_unigram(
                        clean,
                        text_col,
                        vocab_size=unigram_vocab_size,
                        max_piece_len=unigram_max_piece_len,
                    )
                    paths["unigram_vocab"] = f"{out}/unigram.vocab"
                    save_unigram(vocab, paths["unigram_vocab"])
                encoded = clean.withColumn(
                    "__token_ids",
                    unigram_token_ids_col(
                        text_col, vocab, unigram_max_piece_len
                    ),
                )
                write_packed_corpus(
                    encoded,
                    id_col,
                    paths["packed"],
                    budget,
                    ids_col="__token_ids",
                    shards=shards,
                    seed=seed,
                )
                report.extras.setdefault("pack", {})
                report.extras["pack"]["tokenizer"] = "unigram"
                report.extras["pack"]["vocab_pieces"] = len(vocab)
            else:
                write_packed_corpus(
                    clean,
                    id_col,
                    paths["packed"],
                    budget,
                    text_col=text_col,
                    merges=merges,
                    shards=shards,
                    seed=seed,
                )
            packed = spark.read.parquet(paths["packed"])
            stats = packed.agg(
                F.count(F.lit(1)).alias("bins"),
                F.sum("n_docs").alias("docs"),
                F.sum("n_tokens").alias("tokens"),
                F.max("n_tokens").alias("max_bin"),
            ).first()
            if stats["max_bin"] is not None and stats["max_bin"] > budget:
                raise RuntimeError(
                    f"packed output violates budget: max bin "
                    f"{stats['max_bin']} > {budget}"
                )
            report.add_stage("pack", n_clean, int(stats["docs"] or 0))
            report.extras.setdefault("pack", {})
            report.extras["pack"].update(
                n_bins=int(stats["bins"] or 0),
                n_tokens=int(stats["tokens"] or 0),
                budget=budget,
            )

        ledger = ledger_frame(spark, report)
        ledger.coalesce(1).write.mode("overwrite").parquet(paths["ledger"])
        if run_log:
            append_run_log(run_log, report.as_record())
        return {
            "clean": clean,
            "ledger": ledger,
            "report": report,
            "paths": paths,
        }
    finally:
        for frame in persisted:
            try:
                frame.unpersist()
            except Exception:  # noqa: BLE001 — session may already be gone
                pass


#: State sub-directories an incremental pipeline maintains between runs.
STATE_DIRS = ("fingerprints", "lsh_buckets", "accepted", "card_state")


def _state_path(state_dir: str, name: str) -> str:
    return f"{state_dir.rstrip('/')}/{name}"


def _read_state(
    spark: SparkSession, state_dir: str, name: str, schema
) -> DataFrame:
    """Read one state table (per-batch subdirectories, see
    :func:`corpus_pipeline_increment`), or an empty frame with the right
    schema on the first run (missing/empty directory)."""
    path = _state_path(state_dir, name)
    if os.path.isdir(path) and any(
        f.endswith(".parquet") or os.path.isdir(os.path.join(path, f))
        for f in os.listdir(path)
    ):
        return (
            spark.read.option("recursiveFileLookup", "true").parquet(path)
        )
    return spark.createDataFrame([], schema)


def corpus_pipeline_increment(
    spark: SparkSession,
    new_docs: DataFrame,
    benchmark: DataFrame,
    state_dir: str,
    output_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = "lang",
    source_col: str = "source",
    thresholds: QualityThresholds | None = None,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    near_threshold: float = 0.7,
    span_k: int = 8,
    budget: int = 512,
    merges: list[tuple[str, str]] | None = None,
    shards: int = 16,
    seed: int = 42,
    run_log: str | None = None,
) -> dict:
    """O(Δ) daily form of :func:`corpus_pipeline`: process ONE new batch
    against persisted corpus state instead of recomputing history — the
    composition of the engine's incremental operators
    (``minhash_incremental_pairs`` / ``lsh_bucket_state``,
    fingerprint-set exact history, ``merge_report_card_state``).

    State under ``state_dir`` (all parquet, created on first run):

    - ``fingerprints/`` — (fp, keep_id) of every ACCEPTED document (the
      exact-dedup history; a new doc matching any row is removed as
      ``exact_hist`` with that keeper as survivor);
    - ``lsh_buckets/`` — (doc_id, band, bucket) of accepted documents
      (probed by the delta; only touched buckets are read);
    - ``accepted/`` — (doc_id, text) of accepted documents PRE-strip
      (the dedup-relevant text: signatures/Jaccard ran on it — the
      shipped corpus is the per-batch ``clean/`` output);
    - ``card_state/`` — the mergeable report-card state.

    Contracts (the same new-rows-only contract as the underlying
    operators, asserted in ``test_corpus_pipeline``): ids are MONOTONE
    (every new id sorts after history's), so min-id survivorship is
    stable across batches, and sequential increments equal the full
    recompute on the union — modulo one documented divergence: a new
    doc near-duplicate ONLY of a previously-REMOVED doc (never of its
    surviving representative) under-merges, because removed docs leave
    the bucket state; schedule a periodic full sweep when retroactive
    transitivity matters.

    **Replay idempotency** (review r9): every state table is written as
    a PER-BATCH subdirectory keyed by the batch's (min, max) doc id —
    deterministic under the monotone-id contract — with overwrite mode,
    so re-running a batch (an at-least-once ``foreachBatch`` replay, a
    crashed nightly re-run) overwrites its own state delta instead of
    appending twice; the card state is a per-batch DELTA finalized at
    read time, so it can never double-count. A doc whose fingerprint
    matches history with ``keep_id == its own id`` is the batch's own
    crashed-run survivor and is treated as fresh (otherwise a replay
    would remove the whole batch as duplicates of itself); batch-
    internal duplicates may resolve as ``exact_hist`` instead of
    ``exact`` on a replay — same removal, same survivor, different
    label.

    Returns ``{"clean", "ledger", "report", "paths"}`` like the full
    pipeline; each stage is sized by the delta (quality scan of the
    batch, hash probes against touched state only, per-batch pack).
    """
    from pyspark import StorageLevel

    from home_credit_data_engineering_spark.functions.text import fingerprint
    from home_credit_data_engineering_spark.operators.dedup import (
        connected_components_star,
        minhash_incremental_pairs,
    )
    from home_credit_data_engineering_spark.operators.packing import (
        write_packed_corpus,
    )
    from home_credit_data_engineering_spark.operators.quality import (
        merge_report_card_state,
        report_card_from_state,
        report_card_state,
    )
    from home_credit_data_engineering_spark.operators.spans import (
        contaminated_spans,
        strip_spans,
    )

    out = output_dir.rstrip("/")
    paths = {
        "quality_dropped": f"{out}/quality_dropped",
        "dedup_removals": f"{out}/dedup_removals",
        "clean": f"{out}/clean",
        "card": f"{out}/card",
        "packed": f"{out}/packed",
        "ledger": f"{out}/ledger",
    }
    report = CorpusPipelineReport()
    persisted: list[DataFrame] = []

    fp_state = _read_state(
        spark, state_dir, "fingerprints", "fp string, keep_id bigint"
    ).groupBy("fp").agg(F.min("keep_id").alias("keep_id"))
    bucket_state = _read_state(
        spark, state_dir, "lsh_buckets", "doc_id bigint, band int, bucket int"
    )
    accepted = _read_state(
        spark, state_dir, "accepted", "doc_id bigint, text string"
    )
    batch_tag = _batch_tag(new_docs, id_col)

    try:
        # -- 1. quality --------------------------------------------------
        with timed(report.stage_seconds, "quality"):
            qf = quality_filter(
                new_docs,
                text_col=text_col,
                lang_col=lang_col,
                thresholds=thresholds,
            )
            kept = qf["kept"].persist(StorageLevel.MEMORY_AND_DISK)
            persisted.append(kept)
            qf["dropped"].withColumn(
                "failed_rules", F.array_join("failed_rules", ",")
            ).write.mode("overwrite").parquet(paths["quality_dropped"])
            q = qf["report"]
            report.add_stage("quality", q.rows_in, q.rows_kept)
            report.extras["quality"] = {"rule_drops": dict(q.rule_drops)}

        # -- 2. exact dedup (batch-internal + vs history) ------------------
        with timed(report.stage_seconds, "dedup_exact"):
            keyed = kept.withColumn("__fp", fingerprint(text_col))
            hist = keyed.join(
                fp_state.withColumnRenamed("fp", "__fp"), "__fp", "left"
            )
            # keep_id == own id marks this batch's own survivor from a
            # crashed previous attempt (replay) — treat as fresh, or the
            # replay would remove the whole batch as dups of itself
            hist_removals = (
                hist.filter(
                    F.col("keep_id").isNotNull()
                    & (F.col("keep_id") != F.col(id_col))
                )
                .select(
                    F.col(id_col),
                    F.lit("exact_hist").alias("reason"),
                    F.col("keep_id").alias("survivor_id"),
                )
            )
            fresh = hist.filter(
                F.col("keep_id").isNull()
                | (F.col("keep_id") == F.col(id_col))
            ).drop("keep_id")
            batch_mins = fresh.groupBy("__fp").agg(
                F.min(id_col).alias("__keep")
            )
            with_keep = fresh.join(batch_mins, "__fp")
            batch_removals = (
                with_keep.filter(F.col(id_col) != F.col("__keep"))
                .select(
                    F.col(id_col),
                    F.lit("exact").alias("reason"),
                    F.col("__keep").alias("survivor_id"),
                )
            )
            exact_surv = (
                with_keep.filter(F.col(id_col) == F.col("__keep"))
                .drop("__keep")
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            persisted.append(exact_surv)
            n_kept = report.ledger[-1]["rows_out"]
            n_exact_surv = exact_surv.count()
            report.add_stage("dedup_exact", n_kept, n_exact_surv)

        # -- 3. near dedup (incremental LSH probe) ------------------------
        with timed(report.stage_seconds, "dedup_near"):
            all_texts = accepted.unionByName(
                exact_surv.select(
                    F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("text"),
                )
            )
            inc = minhash_incremental_pairs(
                exact_surv.select(
                    F.col(id_col).alias("doc_id"),
                    F.col(text_col).alias("text"),
                ),
                bucket_state.select("doc_id", "band", "bucket"),
                all_texts,
                num_hashes=num_hashes,
                bands=bands,
                shingle_k=shingle_k,
                threshold=near_threshold,
            )
            labels = connected_components_star(
                inc["pairs"].select("doc_a", "doc_b")
            )
            near_removals = (
                labels.filter(F.col("node") != F.col("component"))
                # only NEW docs can be removed in an increment
                .join(
                    exact_surv.select(F.col(id_col).alias("node")),
                    "node",
                    "left_semi",
                )
                .select(
                    F.col("node").alias(id_col),
                    F.lit("near").alias("reason"),
                    F.col("component").alias("survivor_id"),
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            persisted.append(near_removals)
            near_surv = exact_surv.join(
                near_removals.select(id_col), id_col, "left_anti"
            ).persist(StorageLevel.MEMORY_AND_DISK)
            persisted.append(near_surv)
            n_near_surv = near_surv.count()
            report.add_stage("dedup_near", n_exact_surv, n_near_surv)
            hist_removals.unionByName(batch_removals).unionByName(
                near_removals
            ).write.mode("overwrite").parquet(paths["dedup_removals"])

        # -- 4. decontaminate ---------------------------------------------
        with timed(report.stage_seconds, "decontaminate"):
            spans = contaminated_spans(
                near_surv, benchmark, id_col, text_col, k=span_k
            )
            stripped = strip_spans(
                near_surv, spans, id_col, text_col, out_col="__clean_text"
            )
            clean_all = (
                near_surv.drop(text_col)
                .join(stripped, id_col)
                .withColumnRenamed("__clean_text", text_col)
                .drop("__fp")
            )
            clean = clean_all.filter(
                F.trim(F.col(text_col)) != ""
            ).persist(StorageLevel.MEMORY_AND_DISK)
            persisted.append(clean)
            clean.write.mode("overwrite").parquet(paths["clean"])
            n_clean = clean.count()
            strip_stats = clean_all.agg(
                F.sum("removed_tokens").alias("t"),
                F.sum((F.col("removed_tokens") > 0).cast("long")).alias("d"),
            ).first()
            report.add_stage("decontaminate", n_near_surv, n_clean)
            report.extras["decontaminate"] = {
                "tokens_removed": int(strip_stats["t"] or 0),
                "docs_touched": int(strip_stats["d"] or 0),
            }

        # -- 5. report card (per-batch delta state) -------------------------
        with timed(report.stage_seconds, "report_card"):
            delta_state = report_card_state(
                clean,
                source_col=source_col,
                text_col=text_col,
                lang_col=lang_col or "lang",
            )
            # per-batch DELTA, overwrite-idempotent: the cumulative state
            # is the union of batch deltas, merged at read time — no
            # read-modify-write, no swap window, no replay double-count
            delta_state.write.mode("overwrite").parquet(
                f"{_state_path(state_dir, 'card_state')}/{batch_tag}"
            )
            merged = merge_report_card_state(
                _read_state(
                    spark,
                    state_dir,
                    "card_state",
                    delta_state.schema,
                ),
                spark.createDataFrame([], delta_state.schema),
            )
            report_card_from_state(merged).write.mode("overwrite").parquet(
                paths["card"]
            )
            n_sources = spark.read.parquet(paths["card"]).count()
            report.add_stage("report_card", n_clean, n_clean)
            report.extras["report_card"] = {"n_sources": int(n_sources)}

        # -- 6. pack (this batch only) -------------------------------------
        with timed(report.stage_seconds, "pack"):
            write_packed_corpus(
                clean,
                id_col,
                paths["packed"],
                budget,
                text_col=text_col,
                merges=merges,
                shards=shards,
                seed=seed,
            )
            packed = spark.read.parquet(paths["packed"])
            stats = packed.agg(
                F.count(F.lit(1)).alias("bins"),
                F.sum("n_docs").alias("docs"),
                F.sum("n_tokens").alias("tokens"),
                F.max("n_tokens").alias("max_bin"),
            ).first()
            if stats["max_bin"] is not None and stats["max_bin"] > budget:
                raise RuntimeError(
                    f"packed output violates budget: max bin "
                    f"{stats['max_bin']} > {budget}"
                )
            report.add_stage("pack", n_clean, int(stats["docs"] or 0))
            report.extras["pack"] = {
                "n_bins": int(stats["bins"] or 0),
                "n_tokens": int(stats["tokens"] or 0),
                "budget": budget,
            }

        # -- state updates (per-batch overwrite deltas: replay-safe) --------
        with timed(report.stage_seconds, "state_update"):
            exact_surv.select(
                F.col("__fp").alias("fp"), F.col(id_col).alias("keep_id")
            ).write.mode("overwrite").parquet(
                f"{_state_path(state_dir, 'fingerprints')}/{batch_tag}"
            )
            # bucket/text state admit only SURVIVING new docs: removed
            # docs must never be probed by future batches (their text
            # would be absent from accepted/, silently dropping pairs)
            inc["new_buckets"].join(
                near_surv.select(F.col(id_col).alias("doc_id")),
                "doc_id",
                "left_semi",
            ).write.mode("overwrite").parquet(
                f"{_state_path(state_dir, 'lsh_buckets')}/{batch_tag}"
            )
            near_surv.select(
                F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
            ).write.mode("overwrite").parquet(
                f"{_state_path(state_dir, 'accepted')}/{batch_tag}"
            )

        ledger = ledger_frame(spark, report)
        ledger.coalesce(1).write.mode("overwrite").parquet(paths["ledger"])
        if run_log:
            rec = report.as_record()
            rec["job"] = "corpus_pipeline_increment"
            append_run_log(run_log, rec)
        return {
            "clean": clean,
            "ledger": ledger,
            "report": report,
            "paths": paths,
        }
    finally:
        for frame in persisted:
            try:
                frame.unpersist()
            except Exception:  # noqa: BLE001
                pass


def _batch_tag(batch: DataFrame, id_col: str) -> str:
    """Deterministic per-batch state-subdirectory name from the batch's
    id range — unique under the monotone-id contract, identical on a
    replay of the same batch (what makes overwrite-mode state deltas
    idempotent). No '=' in the name, so parquet partition discovery
    never infers a column from it."""
    row = batch.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).first()
    if row["lo"] is None:
        return "batch_empty"
    return f"batch_{row['lo']}_{row['hi']}"
