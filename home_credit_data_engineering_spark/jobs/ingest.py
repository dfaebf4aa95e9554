"""Bronze ingestion job (reference feeder_csv.py / feeder_postgres.py CLI)."""

from __future__ import annotations

import argparse
import datetime


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Bronze ingestion: CSV or JDBC source → partitioned parquet"
    )
    parser.add_argument("--source", required=True, choices=["csv", "jdbc"])
    parser.add_argument("--input", help="CSV path (source=csv)")
    parser.add_argument("--jdbc-url", help="JDBC URL (source=jdbc)")
    parser.add_argument("--jdbc-table", help="JDBC table (source=jdbc)")
    parser.add_argument("--jdbc-user")
    parser.add_argument("--jdbc-password")
    parser.add_argument("--jdbc-driver")
    parser.add_argument(
        "--jdbc-partition-column",
        help="numeric column for parallel JDBC reads (strongly recommended)",
    )
    parser.add_argument("--jdbc-num-partitions", type=int, default=8)
    parser.add_argument("--output", required=True, help="Bronze dataset path")
    parser.add_argument(
        "--ingest-date", default=datetime.date.today().isoformat()
    )
    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.plans.bronze import (
        ingest_csv,
        ingest_dataframe,
    )
    from home_credit_data_engineering_spark.sources.readers import read_jdbc

    spark = get_session(app_name=f"bronze-ingest-{args.source}")
    if args.source == "csv":
        ingest_csv(spark, args.input, args.output, args.ingest_date)
    else:
        jdbc_kwargs = dict(
            url=args.jdbc_url,
            table=args.jdbc_table,
            user=args.jdbc_user,
            password=args.jdbc_password,
            driver=args.jdbc_driver,
        )
        if args.jdbc_partition_column:
            bounds_df = read_jdbc(spark, **jdbc_kwargs).selectExpr(
                f"min({args.jdbc_partition_column}) AS lo",
                f"max({args.jdbc_partition_column}) AS hi",
            )
            bounds = bounds_df.collect()[0]
            jdbc_kwargs.update(
                partition_column=args.jdbc_partition_column,
                lower_bound=int(bounds["lo"]),
                upper_bound=int(bounds["hi"]) + 1,
                num_partitions=args.jdbc_num_partitions,
            )
        df = read_jdbc(spark, **jdbc_kwargs)
        ingest_dataframe(df, args.output, args.ingest_date, "jdbc")
    print(f"ingested → {args.output} [ingest_date={args.ingest_date}]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
