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
