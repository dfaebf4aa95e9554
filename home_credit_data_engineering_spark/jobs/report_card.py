"""Corpus report-card job CLI: documents parquet → one-row-per-source
datasheet parquet (``operators/quality.py:corpus_report_card``).

The pre-mixing health check: doc/blank/token counts, average length,
exact content-duplicate mass, language-mix entropy, mean composite
quality per source — run it on each candidate source before assigning
mixture weights (``jobs/corpus_prep.py --mix``).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Per-source corpus datasheet (report card)"
    )
    parser.add_argument("--input", required=True, help="documents parquet path")
    parser.add_argument("--output", required=True, help="card parquet path")
    parser.add_argument("--source-col", default="source")
    parser.add_argument("--text-col", default="text")
    parser.add_argument("--lang-col", default="lang")
    parser.add_argument(
        "--state-out", help="persist the mergeable (source, lang, fp) state"
    )
    parser.add_argument(
        "--state-in",
        help="merge this persisted state with the batch's state and "
        "finalize the card over the union (O(delta) refresh — a daily "
        "increment never rescans corpus history)",
    )
    parser.add_argument("--run-log", help="JSONL run-log path (optional)")
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.runlog import append_run_log
    from home_credit_data_engineering_spark.sources.readers import read_parquet
    from home_credit_data_engineering_spark.sources.sinks import write_parquet

    from home_credit_data_engineering_spark.operators.quality import (
        merge_report_card_state,
        report_card_from_state,
        report_card_state,
    )

    spark = get_session(app_name="corpus-report-card")
    docs = read_parquet(spark, args.input)
    state = report_card_state(
        docs,
        source_col=args.source_col,
        text_col=args.text_col,
        lang_col=args.lang_col,
    )
    if args.state_in:
        state = merge_report_card_state(read_parquet(spark, args.state_in), state)
    if args.state_out:
        write_parquet(state, args.state_out)
        state = read_parquet(spark, args.state_out)
    write_parquet(report_card_from_state(state), args.output)
    if args.run_log:
        append_run_log(
            args.run_log,
            {"job": "report_card", "input": args.input, "output": args.output},
        )
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
