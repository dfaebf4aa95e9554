"""Gold job (reference spark/gold/processor.py CLI), with optional JDBC
datamart publish."""

from __future__ import annotations

import argparse
import datetime


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Gold: client risk profile + portfolio rollup from Silver snapshot"
    )
    parser.add_argument("--silver-base", required=True)
    parser.add_argument("--gold-base", required=True)
    parser.add_argument(
        "--ingest-date", default=datetime.date.today().isoformat()
    )
    parser.add_argument("--write-datamart", action="store_true")
    parser.add_argument("--jdbc-url")
    parser.add_argument("--jdbc-user")
    parser.add_argument("--jdbc-password")
    parser.add_argument("--jdbc-driver")
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.plans.pipeline import run_gold, _ymd
    from home_credit_data_engineering_spark.sources.readers import read_snapshot

    spark = get_session(app_name="gold-processor")
    report = run_gold(spark, args.silver_base, args.gold_base, args.ingest_date)
    for name, rows in report.rows_written.items():
        print(f"{name}: {rows} rows")

    if args.write_datamart:
        from home_credit_data_engineering_spark.plans.serving import publish_datamart

        filters = _ymd(args.ingest_date)
        tables = {
            name: read_snapshot(spark, f"{args.gold_base}/{name}", filters).drop(
                "year", "month", "day"
            )
            for name in ("gold_client_risk_profile", "gold_portfolio_risk")
        }
        publish_datamart(
            tables,
            url=args.jdbc_url,
            user=args.jdbc_user,
            password=args.jdbc_password,
            driver=args.jdbc_driver,
        )
        print(f"datamart published → {args.jdbc_url}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
