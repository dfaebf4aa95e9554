"""Silver job (reference spark/silver/processor.py CLI)."""

from __future__ import annotations

import argparse
import datetime


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Silver: validated client-grain summaries from Bronze snapshot"
    )
    parser.add_argument("--bronze-base", required=True)
    parser.add_argument("--silver-base", required=True)
    parser.add_argument(
        "--ingest-date", default=datetime.date.today().isoformat()
    )
    parser.add_argument(
        "--skip-failure-counts",
        action="store_true",
        help="skip the per-rule failure-count job (faster; validation filter still applies)",
    )
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.plans.pipeline import run_silver

    spark = get_session(app_name="silver-processor")
    report = run_silver(
        spark,
        args.bronze_base,
        args.silver_base,
        args.ingest_date,
        count_failures=not args.skip_failure_counts,
    )
    print(f"validation failures: {report.validation_failures}")
    for name, rows in report.rows_written.items():
        print(f"{name}: {rows} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
