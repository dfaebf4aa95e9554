"""Composed corpus-pipeline job CLI: documents parquet + benchmark
parquet → quality filter → exact dedup → near dedup (collapse-exact
MinHash) → benchmark decontamination → report card → packed token-id
shards, in ONE orchestrated run
(``plans/corpus_pipeline.py:corpus_pipeline``), with a per-stage row
ledger written as parquet and one JSONL run-log line.

The chained form of ``jobs/quality.py`` + ``jobs/dedup.py`` +
``jobs/report_card.py`` + ``jobs/pack_corpus.py`` — the inter-stage
column contracts run end to end here instead of being stitched by an
external scheduler.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="End-to-end corpus pipeline: quality -> dedup -> "
        "decontaminate -> report card -> packed shards"
    )
    parser.add_argument("--input", required=True, help="documents parquet path")
    parser.add_argument(
        "--benchmark",
        required=True,
        help="benchmark/eval documents parquet path (decontamination "
        "reference set)",
    )
    parser.add_argument(
        "--output-dir",
        required=True,
        help="root for quality_dropped/ dedup_removals/ clean/ card/ "
        "packed/ ledger/",
    )
    parser.add_argument("--id-col", default="doc_id")
    parser.add_argument("--text-col", default="text")
    parser.add_argument("--lang-col", default="lang")
    parser.add_argument("--source-col", default="source")
    parser.add_argument(
        "--langs", help="comma-separated lang allowlist (default: keep all)"
    )
    parser.add_argument("--min-tokens", type=int, default=5)
    parser.add_argument("--num-hashes", type=int, default=32)
    parser.add_argument("--bands", type=int, default=8)
    parser.add_argument("--near-threshold", type=float, default=0.7)
    parser.add_argument(
        "--span-k",
        type=int,
        default=8,
        help="decontamination window size in tokens",
    )
    parser.add_argument(
        "--budget",
        type=int,
        required=True,
        help="tokens per training sequence (bin capacity)",
    )
    parser.add_argument(
        "--merges", help="BPE merges file (default = the pinned fixture)"
    )
    parser.add_argument(
        "--tokenizer",
        choices=("bpe", "unigram"),
        default="bpe",
        help="token-id family for the pack stage; 'unigram' trains a "
        "unigram-LM vocab on the cleaned corpus (saved to "
        "<output-dir>/unigram.vocab) unless --unigram-vocab is given",
    )
    parser.add_argument(
        "--unigram-vocab", help="existing unigram vocab file (skip training)"
    )
    parser.add_argument("--unigram-vocab-size", type=int, default=512)
    parser.add_argument("--shards", type=int, default=16)
    parser.add_argument(
        "--bm25-index",
        help="maintain a persisted BM25 index over the CLEAN corpus: "
        "built on the first run, folded exactly per batch afterwards "
        "(bm25_index_increment — increments assume whole-job retries, "
        "like every batch increment here). Removed duplicates and "
        "quality-dropped docs never enter the index.",
    )
    parser.add_argument(
        "--bm25-buckets", type=int, default=None,
        help="bucket modulus for a NEW index (default 64); an existing "
        "index pins its own — omit the flag to adopt it, pass a "
        "conflicting value to get a hard error",
    )
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument(
        "--no-collapse-exact",
        action="store_true",
        help="route the near stage through the reference minhash_dedup "
        "instead of the collapse-exact production operator",
    )
    parser.add_argument(
        "--state-dir",
        help="run as an O(delta) INCREMENT against this persisted state "
        "root (fingerprints/ lsh_buckets/ accepted/ card_state/ — "
        "created on first run); --input is the NEW batch only. Ids must "
        "be monotone across batches. Unigram mode is full-run only.",
    )
    parser.add_argument("--run-log", help="JSONL run-log path (optional)")
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.budget < 1:
        raise SystemExit(f"--budget must be >= 1, got {args.budget}")
    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.functions.bpe import load_merges
    from home_credit_data_engineering_spark.functions.unigram import (
        load_unigram,
    )
    from home_credit_data_engineering_spark.plans.corpus_pipeline import (
        corpus_pipeline,
        corpus_pipeline_increment,
    )
    from home_credit_data_engineering_spark.plans.quality_filter import (
        QualityThresholds,
    )
    from home_credit_data_engineering_spark.sources.readers import read_parquet

    spark = get_session(app_name="corpus-pipeline")
    docs = read_parquet(spark, args.input)
    benchmark = read_parquet(spark, args.benchmark)
    thresholds = QualityThresholds(
        min_tokens=args.min_tokens,
        langs=tuple(args.langs.split(",")) if args.langs else None,
    )
    if args.state_dir:
        if args.tokenizer != "bpe":
            raise SystemExit("--state-dir supports --tokenizer bpe only")
        result = corpus_pipeline_increment(
            spark,
            docs,
            benchmark,
            args.state_dir,
            args.output_dir,
            id_col=args.id_col,
            text_col=args.text_col,
            lang_col=args.lang_col,
            source_col=args.source_col,
            thresholds=thresholds,
            num_hashes=args.num_hashes,
            bands=args.bands,
            near_threshold=args.near_threshold,
            span_k=args.span_k,
            budget=args.budget,
            merges=load_merges(args.merges) if args.merges else None,
            shards=args.shards,
            seed=args.seed,
            run_log=args.run_log,
        )
        for row in result["report"].ledger:
            print(
                f"corpus_pipeline_increment[{row['stage_order']}] "
                f"{row['stage']}: {row['rows_in']} in, "
                f"{row['rows_removed']} removed, {row['rows_out']} out"
            )
        if args.bm25_index:
            _maintain_bm25_index(spark, result, args, incremental=True)
        return 0
    result = corpus_pipeline(
        spark,
        docs,
        benchmark,
        args.output_dir,
        id_col=args.id_col,
        text_col=args.text_col,
        lang_col=args.lang_col,
        source_col=args.source_col,
        thresholds=thresholds,
        num_hashes=args.num_hashes,
        bands=args.bands,
        near_threshold=args.near_threshold,
        span_k=args.span_k,
        budget=args.budget,
        merges=load_merges(args.merges) if args.merges else None,
        tokenizer=args.tokenizer,
        unigram_vocab=(
            load_unigram(args.unigram_vocab) if args.unigram_vocab else None
        ),
        unigram_vocab_size=args.unigram_vocab_size,
        shards=args.shards,
        seed=args.seed,
        collapse_exact=not args.no_collapse_exact,
        run_log=args.run_log,
    )
    for row in result["report"].ledger:
        print(
            f"corpus_pipeline[{row['stage_order']}] {row['stage']}: "
            f"{row['rows_in']} in, {row['rows_removed']} removed, "
            f"{row['rows_out']} out"
        )
    extras = result["report"].extras.get("pack", {})
    print(
        f"corpus_pipeline: packed {extras.get('n_tokens', 0)} tokens into "
        f"{extras.get('n_bins', 0)} bins (budget {args.budget}) under "
        f"{result['paths']['packed']}"
    )
    if args.bm25_index:
        _maintain_bm25_index(spark, result, args, incremental=False)
    return 0


def _maintain_bm25_index(spark, result, args, incremental: bool) -> None:
    """Build-or-fold the persisted BM25 index over the clean corpus:
    the serving leg of the pipeline.

    FULL mode always REBUILDS (it recomputes the whole corpus, so
    folding an existing index would re-ingest every known doc id and
    double-count). Incremental mode builds on the first run, then folds
    each batch EXACTLY (``bm25_index_increment``), guarded by a
    per-batch ``_ingested/<tag>`` marker (the pipeline's own
    deterministic batch tag) so a replayed batch — the pipeline state's
    documented at-least-once recovery — skips the non-idempotent fold
    instead of double-appending. A crash INSIDE the fold (marker
    absent, appends partial) is outside the marker's protection:
    rebuild the index from the union of the per-day ``clean/`` outputs.
    The bucket modulus is pinned by the index itself; a conflicting
    explicit --bm25-buckets raises.

    Reads the clean corpus from the parquet the pipeline just wrote —
    the returned frame's lineage was unpersisted, and indexing triggers
    several actions (re-running the whole pipeline per action).
    """
    import os

    from home_credit_data_engineering_spark.operators.retrieval import (
        bm25_index_increment,
        build_bm25_index,
    )

    docs = spark.read.parquet(result["paths"]["clean"]).select(
        args.id_col, args.text_col
    )
    exists = os.path.isdir(os.path.join(args.bm25_index, "stats"))
    if incremental and exists:
        from home_credit_data_engineering_spark.plans.corpus_pipeline import (
            _batch_tag,
        )

        tag = _batch_tag(docs, args.id_col)
        marker = os.path.join(args.bm25_index, "_ingested", tag)
        if os.path.exists(marker):
            print(
                f"corpus_pipeline: bm25 index already has batch {tag} "
                "(replay) — fold skipped"
            )
            return
        rep = bm25_index_increment(
            docs, args.bm25_index,
            id_col=args.id_col, text_col=args.text_col,
            n_buckets=args.bm25_buckets,
        )
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w"):
            pass
        print(
            "corpus_pipeline: bm25 index +%d docs, %d terms touched at %s"
            % (rep["docs_added"], rep["terms_touched"], args.bm25_index)
        )
    else:
        build_bm25_index(
            docs, args.bm25_index,
            id_col=args.id_col, text_col=args.text_col,
            n_buckets=args.bm25_buckets or 64,
        )
        # a rebuild starts the batch history over: stale replay markers
        # from a previous incremental lineage must not suppress future
        # folds of same-tagged batches
        import shutil

        ingested = os.path.join(args.bm25_index, "_ingested")
        if os.path.isdir(ingested):
            shutil.rmtree(ingested)
        if incremental:
            # seed the replay guard for this bootstrap batch too
            from home_credit_data_engineering_spark.plans.corpus_pipeline import (
                _batch_tag,
            )

            marker = os.path.join(
                args.bm25_index, "_ingested", _batch_tag(docs, args.id_col)
            )
            os.makedirs(os.path.dirname(marker), exist_ok=True)
            with open(marker, "w"):
                pass
        print(f"corpus_pipeline: bm25 index built at {args.bm25_index}")


if __name__ == "__main__":
    raise SystemExit(main())
