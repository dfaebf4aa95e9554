"""Classifier/ranker evaluation job CLI (``operators/evaluate.py``).

Modes:

- ``--mode report`` (default): input parquet with label + prediction
  columns → classification report parquet (per-class precision/recall/
  F1/support + macro/micro rows) and, with ``--confusion-out``, the raw
  confusion grid.
- ``--mode auc``: input parquet with label + score columns → one-row
  AUC/AP summary parquet; ``--roc-out`` adds the full threshold curve,
  ``--calibration-out`` the reliability buckets (``--bins``,
  ``--score-lo``/``--score-hi`` control the bucket grid).

The gate-tuning loop in practice: score a corpus with
``jobs/quality.py`` or a learned classifier, evaluate here, read the
ROC/calibration parquet, pick the threshold.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Classifier / ranker evaluation (report, AUC, ROC, calibration)"
    )
    parser.add_argument("--input", required=True, help="scored parquet path")
    parser.add_argument("--output", required=True, help="summary parquet path")
    parser.add_argument(
        "--mode", choices=("report", "auc"), default="report"
    )
    parser.add_argument("--label-col", default="label")
    parser.add_argument("--pred-col", default="pred", help="report mode")
    parser.add_argument("--score-col", default="score", help="auc mode")
    parser.add_argument("--confusion-out", help="report mode: grid parquet")
    parser.add_argument("--roc-out", help="auc mode: threshold-curve parquet")
    parser.add_argument(
        "--calibration-out", help="auc mode: reliability-bucket parquet"
    )
    parser.add_argument("--bins", type=int, default=10)
    parser.add_argument("--score-lo", type=float, default=0.0)
    parser.add_argument("--score-hi", type=float, default=1.0)
    parser.add_argument("--run-log", help="JSONL run-log path (optional)")
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.mode == "report" and (args.roc_out or args.calibration_out):
        raise SystemExit("--roc-out/--calibration-out require --mode auc")
    if args.mode == "auc" and args.confusion_out:
        raise SystemExit("--confusion-out requires --mode report")
    if args.bins < 1:
        raise SystemExit(f"--bins must be >= 1, got {args.bins}")
    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.operators.evaluate import (
        binary_auc,
        calibration_bins,
        classification_report,
        confusion_matrix,
        roc_pr_points,
    )
    from home_credit_data_engineering_spark.runlog import append_run_log
    from home_credit_data_engineering_spark.sources.readers import read_parquet
    from home_credit_data_engineering_spark.sources.sinks import write_parquet

    spark = get_session(app_name="classifier-evaluate")
    df = read_parquet(spark, args.input)
    if args.mode == "report":
        write_parquet(
            classification_report(df, args.label_col, args.pred_col),
            args.output,
        )
        if args.confusion_out:
            write_parquet(
                confusion_matrix(df, args.label_col, args.pred_col),
                args.confusion_out,
            )
    else:
        write_parquet(
            binary_auc(df, args.label_col, args.score_col), args.output
        )
        if args.roc_out:
            write_parquet(
                roc_pr_points(df, args.label_col, args.score_col), args.roc_out
            )
        if args.calibration_out:
            write_parquet(
                calibration_bins(
                    df,
                    args.label_col,
                    args.score_col,
                    n_bins=args.bins,
                    lo=args.score_lo,
                    hi=args.score_hi,
                ),
                args.calibration_out,
            )
    if args.run_log:
        append_run_log(
            args.run_log,
            {
                "job": "evaluate",
                "mode": args.mode,
                "input": args.input,
                "output": args.output,
            },
        )
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
