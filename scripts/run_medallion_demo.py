#!/usr/bin/env python3
"""End-to-end medallion pipeline demo through the public package API.

Bronze-ingests fixture tables to parquet (twice, two ingest dates — the
SURVEY §3.4 trap), builds Silver + Gold from partition-filtered snapshot
reads, and prints the resulting tables. This is the library's user-facing
flow: what a reference user would run after switching to this engine.

Usage: python scripts/run_medallion_demo.py [workdir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")


def main() -> int:
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="medallion_")

    from home_credit_data_engineering_spark import get_session
    from home_credit_data_engineering_spark.plans.bronze import (
        ingest_dataframe,
        read_bronze_snapshot,
    )
    from home_credit_data_engineering_spark.plans.gold import (
        build_client_risk_profile,
        build_portfolio_risk,
    )
    from home_credit_data_engineering_spark.plans.silver import (
        build_bureau_summary,
        build_client_application,
        build_payment_behavior,
        build_previous_applications,
        with_snapshot_partitions,
    )
    from home_credit_data_engineering_spark.schema import (
        APPLICATION,
        BUREAU,
        BUREAU_BALANCE,
        INSTALLMENTS_PAYMENTS,
        PREVIOUS_APPLICATION,
    )
    from home_credit_data_engineering_spark.sources.readers import read_snapshot
    from home_credit_data_engineering_spark.sources.sinks import write_parquet

    spark = get_session(app_name="medallion-demo", shuffle_partitions=8)

    fixtures = {
        "application": (
            APPLICATION,
            [
                (1, 0, 100000.0, 500000.0, 25000.0, -15000, "M"),
                (2, 1, 200000.0, 600000.0, None, -20000, "F"),
                (3, None, 150000.0, 300000.0, 15000.0, -10000, "XNA"),
                (5, 0, 0.0, 100000.0, 5000.0, -15000, "F"),  # dropped by rule 2
            ],
        ),
        "bureau": (
            BUREAU,
            [
                (1, 101, "Active", 0, 10000.0, 0.0),
                (1, 102, "Closed", 30, None, 500.0),
                (2, 103, "Active", 5, 5000.0, 100.0),
            ],
        ),
        "bureau_balance": (
            BUREAU_BALANCE,
            [(101, 0, "C"), (101, -1, "0"), (102, -2, "X")],
        ),
        "installments_payments": (
            INSTALLMENTS_PAYMENTS,
            [
                (201, 1, 1, -100, -95, 1000.0, 1000.0),
                (201, 1, 2, -70, -72, 1000.0, 1000.0),
                (203, 2, 1, -10, -5, 0.0, 0.0),
            ],
        ),
        "previous_application": (
            PREVIOUS_APPLICATION,
            [
                (301, 1, "Approved", 10000.0, 9000.0),
                (302, 1, "Refused", 20000.0, 0.0),
                (304, 2, "Approved", 8000.0, 8000.0),
            ],
        ),
    }

    # --- Bronze: ingest every table on TWO dates (the §3.4 trap) ---
    for date in ("2026-08-12", "2026-08-13"):
        for name, (schema, rows) in fixtures.items():
            df = spark.createDataFrame(rows, schema)
            ingest_dataframe(df, f"{workdir}/bronze/{name}", date, "demo")

    snapshot = "2026-08-13"
    bronze = {
        name: read_bronze_snapshot(
            spark, f"{workdir}/bronze/{name}", snapshot
        )
        for name in fixtures
    }
    app_rows = bronze["application"].count()
    expected = len(fixtures["application"][1])
    print(f"bronze application snapshot rows: {app_rows} (expected {expected}, "
          f"base dir holds {2 * expected})")
    assert app_rows == expected, "snapshot read multiplied rows — §3.4 regression!"

    # --- Silver ---
    app_result = build_client_application(bronze["application"])
    print(f"silver validation failures: {app_result.failure_counts}")
    silver = {
        "silver_client_application": app_result.df,
        "silver_bureau_summary": build_bureau_summary(
            bronze["bureau"], bronze["bureau_balance"]
        ).df,
        "silver_payment_behavior": build_payment_behavior(
            bronze["installments_payments"]
        ).df,
        "silver_previous_applications": build_previous_applications(
            bronze["previous_application"]
        ).df,
    }
    for name, df in silver.items():
        out = with_snapshot_partitions(df.drop("ingest_date", "source_system"), snapshot)
        write_parquet(out, f"{workdir}/silver/{name}", partition_by=["year", "month", "day"])
        print(f"{name}: {df.count()} rows written")

    # --- Gold (from partition-filtered Silver reads) ---
    year, month, day = (int(x) for x in snapshot.split("-"))
    filters = {"year": year, "month": month, "day": day}
    silver_read = {
        name: read_snapshot(spark, f"{workdir}/silver/{name}", filters).drop(
            "year", "month", "day"
        )
        for name in silver
    }
    profile = build_client_risk_profile(
        silver_read["silver_client_application"],
        silver_read["silver_bureau_summary"],
        silver_read["silver_payment_behavior"],
        silver_read["silver_previous_applications"],
    )
    portfolio = build_portfolio_risk(profile)
    print("gold_client_risk_profile:")
    profile.orderBy("SK_ID_CURR").show(truncate=False)
    print("gold_portfolio_risk:")
    portfolio.orderBy("risk_segment").show(truncate=False)
    spark.stop()
    print(f"workdir: {workdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
