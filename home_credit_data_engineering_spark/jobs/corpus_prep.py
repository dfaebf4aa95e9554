"""Corpus-prep job CLI: documents parquet → span-deduplicated text +
sequence-packing assignment.

The stage that runs AFTER jobs.quality (drop bad docs) and jobs.dedup
(drop whole-document near-dups) in a training-data pipeline: cut
*passage-level* duplicates out of the surviving text (Lee et al.,
arXiv:2107.06499 — see ``operators/spans.py``), then assign every
cleaned document its position in concatenate-and-chop training packing
(``operators/packing.py``). Outputs:

- ``--output``: cleaned documents parquet (id, text_clean,
  removed_tokens + the packing columns when ``--budget`` is set);
- ``--spans-output`` (optional): the span audit table — which passages
  were cut from which documents, the removal-list discipline
  ``jobs.dedup`` already follows;
- ``--run-log`` (optional): JSONL metrics record.

One scan computes spans, a second builds cleaned text and the packing
projection rides the same write — nothing document-sized is collected to
the driver; metrics come from cheap aggregates over the (small) span and
packing outputs.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Span-level exact-substring dedup + sequence packing"
    )
    parser.add_argument("--input", required=True, help="documents parquet path")
    parser.add_argument("--output", required=True, help="cleaned docs parquet path")
    parser.add_argument("--spans-output", help="span audit parquet path (optional)")
    parser.add_argument("--id-col", default="doc_id")
    parser.add_argument("--text-col", default="text")
    parser.add_argument(
        "--window",
        type=int,
        default=20,
        help="span window k: a passage is duplicated when every k-token "
        "window in it occurs more than once corpus-wide (Lee et al. use "
        "50; smaller = more aggressive)",
    )
    parser.add_argument(
        "--min-count",
        type=int,
        default=2,
        help="occurrences (corpus-wide) for a window to count as duplicated",
    )
    parser.add_argument(
        "--budget",
        type=int,
        default=0,
        help="training-sequence token budget; 0 disables the packing stage",
    )
    parser.add_argument(
        "--state",
        help="window-hash count state parquet from prior runs; when given "
        "the job runs O(delta) INCREMENTAL substring dedup: --input is "
        "today's NEW documents only, judged against history plus the "
        "batch (operators.spans.incremental_spans)",
    )
    parser.add_argument(
        "--state-output",
        help="where to write the window-hash state for the next run "
        "(merged state in incremental mode, freshly-built otherwise)",
    )
    parser.add_argument(
        "--benchmark",
        help="benchmark/eval documents parquet; when given, spans are "
        "CONTAMINATION spans (train windows occurring in the benchmark "
        "set — operators.spans.contaminated_spans) instead of "
        "corpus-internal duplicates; mutually exclusive with --state",
    )
    parser.add_argument(
        "--mix-budgets",
        help="JSON object of per-source TOKEN budgets, e.g. "
        '\'{"web": 1000000, "code": 200000}\' — runs token_budget_mix '
        "on the CLEANED text before packing; sources not named are "
        "dropped",
    )
    parser.add_argument("--source-col", default="source")
    parser.add_argument("--shards", type=int, default=64)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--run-log", help="JSONL run-log path (optional)")
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from pyspark.sql import functions as F

    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.functions.text import token_count
    from home_credit_data_engineering_spark.operators.packing import pack_sequences
    from home_credit_data_engineering_spark.operators.spans import (
        duplicated_spans,
        strip_spans,
    )
    from home_credit_data_engineering_spark.runlog import append_run_log
    from home_credit_data_engineering_spark.sources.readers import read_parquet
    from home_credit_data_engineering_spark.sources.sinks import write_parquet

    from home_credit_data_engineering_spark.operators.spans import (
        incremental_spans,
        window_hash_state,
    )

    spark = get_session(app_name="corpus-prep")
    docs = read_parquet(spark, args.input)

    if args.benchmark and args.state:
        raise SystemExit(
            "--benchmark and --state are mutually exclusive: decontamination "
            "judges against the eval set, incremental mode against history"
        )
    if args.benchmark:
        from home_credit_data_engineering_spark.operators.spans import (
            contaminated_spans,
        )

        bench = read_parquet(spark, args.benchmark)
        spans = contaminated_spans(
            docs, bench, args.id_col, args.text_col, k=args.window
        )
        if args.state_output:
            write_parquet(
                window_hash_state(
                    docs, args.id_col, args.text_col, k=args.window
                ),
                args.state_output,
            )
    elif args.state:
        # O(delta) daily mode: --input is the new batch; windows judged
        # against history + batch, state merged for tomorrow.
        state = read_parquet(spark, args.state)
        inc = incremental_spans(
            docs,
            state,
            args.id_col,
            args.text_col,
            k=args.window,
            min_count=args.min_count,
        )
        spans = inc["spans"]
        if args.state_output:
            write_parquet(inc["state"], args.state_output)
    else:
        spans = duplicated_spans(
            docs,
            args.id_col,
            args.text_col,
            k=args.window,
            min_count=args.min_count,
        )
        if args.state_output:
            write_parquet(
                window_hash_state(
                    docs, args.id_col, args.text_col, k=args.window
                ),
                args.state_output,
            )
    # spans feed the strip join, the audit write, and the metrics — one
    # materialization (rows are (id, 3 ints): thousands of times smaller
    # than the corpus).
    spans = spans.persist()
    try:
        if args.spans_output:
            write_parquet(spans, args.spans_output)
        span_stats = spans.agg(
            F.count(F.lit(1)).alias("spans"),
            F.countDistinct("doc_id").alias("docs_with_spans"),
            F.coalesce(F.sum("span_tokens"), F.lit(0)).alias("tokens_cut"),
        ).collect()[0]

        cleaned = strip_spans(docs, spans, args.id_col, args.text_col)
        mix_report = None
        if args.mix_budgets:
            import json as _json

            from home_credit_data_engineering_spark.operators.packing import (
                token_budget_mix,
            )

            budgets = {k: int(v) for k, v in _json.loads(args.mix_budgets).items()}
            # mixing consumes the CLEANED token counts; the source column
            # rides over from the input by id
            sources = docs.select(args.id_col, args.source_col)
            with_src = cleaned.join(sources, on=args.id_col, how="left")
            kept_mix = token_budget_mix(
                with_src.withColumn("__ntok", token_count("text_clean")),
                args.id_col,
                "__ntok",
                args.source_col,
                budgets=budgets,
                seed=args.seed,
            )
            cleaned = cleaned.join(
                kept_mix.select(
                    args.id_col,
                    "source",
                    F.col("start_offset").alias("mix_offset"),
                ),
                on=args.id_col,
                how="inner",
            )
            mix_report = {
                "docs_mixed": kept_mix.count(),
                "budgets": budgets,
            }
        if args.budget > 0:
            assignment = pack_sequences(
                cleaned.withColumn("__ntok", token_count("text_clean")),
                args.id_col,
                "__ntok",
                budget=args.budget,
                shards=args.shards,
                seed=args.seed,
            )
            cleaned = cleaned.join(
                assignment.drop("token_count"), on=args.id_col, how="left"
            )
        write_parquet(cleaned, args.output)
    finally:
        spans.unpersist()

    record = {
        "job": "corpus_prep",
        "mode": (
            "decontaminate"
            if args.benchmark
            else ("incremental" if args.state else "full")
        ),
        "window": args.window,
        "spans": span_stats["spans"],
        "docs_with_spans": span_stats["docs_with_spans"],
        "tokens_cut": int(span_stats["tokens_cut"]),
        "budget": args.budget or None,
        "mix": mix_report,
    }
    if args.run_log:
        append_run_log(args.run_log, record)
    print(
        f"corpus_prep: {record['spans']} spans across "
        f"{record['docs_with_spans']} docs, {record['tokens_cut']} tokens cut"
        + (f"; packed at budget={args.budget}" if args.budget else "")
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
