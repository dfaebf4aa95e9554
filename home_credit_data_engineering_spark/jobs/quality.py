"""Corpus quality-filter job CLI: documents parquet → kept + dropped
parquet (dropped rows carry their failed_rules audit column) + JSONL run
log. The pass that runs BEFORE jobs.dedup in a training-data pipeline."""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Gopher-style corpus quality filter (single-pass signals)"
    )
    parser.add_argument("--input", required=True, help="documents parquet path")
    parser.add_argument(
        "--output",
        required=True,
        help="kept-docs parquet path (or the single partitioned dataset when "
        "--dropped-output is omitted)",
    )
    parser.add_argument(
        "--dropped-output",
        help="dropped-docs parquet path; omit for single-pass mode: ONE "
        "write partitioned by kept=true/false with counts riding the "
        "write as observe() metrics (input scanned exactly once)",
    )
    parser.add_argument("--text-col", default="text")
    parser.add_argument("--lang-col", default="lang")
    parser.add_argument("--min-tokens", type=int, default=5)
    parser.add_argument("--max-tokens", type=int, default=100_000)
    parser.add_argument("--max-symbol-ratio", type=float, default=0.2)
    parser.add_argument("--max-digit-ratio", type=float, default=0.3)
    parser.add_argument("--max-repetition", type=float, default=0.5)
    parser.add_argument("--min-unique-fraction", type=float, default=0.2)
    parser.add_argument("--max-token-len", type=int, default=60)
    parser.add_argument(
        "--langs", help="comma-separated lang allowlist (default: keep all)"
    )
    parser.add_argument("--run-log", help="JSONL run-log path (optional)")
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.plans.quality_filter import (
        QualityThresholds,
        quality_filter,
        quality_filter_single_pass,
    )
    from home_credit_data_engineering_spark.runlog import append_run_log
    from home_credit_data_engineering_spark.sources.readers import read_parquet
    from home_credit_data_engineering_spark.sources.sinks import write_parquet

    spark = get_session(app_name="corpus-quality-filter")
    docs = read_parquet(spark, args.input)
    thresholds = QualityThresholds(
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
        max_symbol_ratio=args.max_symbol_ratio,
        max_digit_ratio=args.max_digit_ratio,
        max_repeated_bigram_fraction=args.max_repetition,
        min_unique_token_fraction=args.min_unique_fraction,
        max_token_len=args.max_token_len,
        langs=tuple(args.langs.split(",")) if args.langs else None,
    )
    if args.dropped_output is None:
        report = quality_filter_single_pass(
            docs,
            args.output,
            text_col=args.text_col,
            lang_col=args.lang_col,
            thresholds=thresholds,
        )
    else:
        result = quality_filter(
            docs,
            text_col=args.text_col,
            lang_col=args.lang_col,
            thresholds=thresholds,
        )
        write_parquet(result["kept"], args.output)
        write_parquet(result["dropped"], args.dropped_output)
        report = result["report"]
    if args.run_log:
        append_run_log(args.run_log, report.as_record())
    print(
        f"quality_filter: {report.rows_in} in, {report.rows_kept} kept, "
        f"{report.rows_in - report.rows_kept} dropped; "
        f"rule drops: {report.rule_drops}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
