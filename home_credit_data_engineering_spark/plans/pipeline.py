"""End-to-end medallion orchestration: the package-level equivalent of the
reference's ``silver/processor.py main()`` + ``gold/processor.py main()``
(reference ``spark/silver/processor.py:687-733``,
``spark/gold/processor.py:318-336``), as one configurable function over
paths.

Differences from the reference's script mains (all deliberate):
- snapshot reads are partition-filtered (SURVEY §3.4 fix);
- each table is written once with no intermediate count() actions —
  metrics come back in the returned report instead of log lines;
- gold reads silver from the just-written snapshot, so the pipeline is
  restartable per layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from home_credit_data_engineering_spark.plans.bronze import read_bronze_snapshot
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
from home_credit_data_engineering_spark.runlog import append_run_log, timed
from home_credit_data_engineering_spark.sources.readers import read_snapshot
from home_credit_data_engineering_spark.sources.sinks import write_parquet

SILVER_TABLES = (
    "silver_client_application",
    "silver_bureau_summary",
    "silver_payment_behavior",
    "silver_previous_applications",
)


@dataclass
class PipelineReport:
    """Operational metrics of one run (the data the reference logged)."""

    validation_failures: dict[str, int] = field(default_factory=dict)
    rows_written: dict[str, int] = field(default_factory=dict)
    write_seconds: dict[str, float] = field(default_factory=dict)

    def as_record(self, layer: str, ingest_date: str) -> dict:
        return {
            "layer": layer,
            "ingest_date": ingest_date,
            "rows_written": dict(self.rows_written),
            "write_seconds": dict(self.write_seconds),
            "validation_failures": dict(self.validation_failures),
        }


def run_silver(
    spark: SparkSession,
    bronze_base: str,
    silver_base: str,
    ingest_date: str,
    count_failures: bool = True,
    run_log: str | None = None,
) -> PipelineReport:
    """Bronze snapshot → four validated Silver tables (partitioned y/m/d).

    ``run_log``: optional JSONL path — the run's metrics (rows written,
    per-table write seconds, validation failures) are appended as one
    structured line, the engine's persisted equivalent of the reference's
    per-run log files (``spark/common/logger.py:48-56``).
    """
    report = PipelineReport()

    def bronze(name: str):
        return read_bronze_snapshot(spark, f"{bronze_base}/{name}", ingest_date)

    # Observed validation: failure counts ride the parquet write below
    # (CollectMetrics) instead of costing a separate aggregate job — the
    # input is read exactly once even with full metrics on.
    app = build_client_application(
        bronze("application"),
        count_failures=count_failures,
        observe=count_failures,
    )
    outputs = {
        "silver_client_application": app.df,
        "silver_bureau_summary": build_bureau_summary(
            bronze("bureau"), bronze("bureau_balance")
        ).df,
        "silver_payment_behavior": build_payment_behavior(
            bronze("installments_payments")
        ).df,
        "silver_previous_applications": build_previous_applications(
            bronze("previous_application")
        ).df,
    }
    for name, df in outputs.items():
        out = with_snapshot_partitions(
            df.drop("ingest_date", "source_system"), ingest_date
        )
        with timed(report.write_seconds, name):
            write_parquet(
                out, f"{silver_base}/{name}", partition_by=["year", "month", "day"]
            )
        report.rows_written[name] = read_snapshot(
            spark, f"{silver_base}/{name}", _ymd(ingest_date)
        ).count()
    if app.observation is not None:
        report.validation_failures = {
            k: int(v)
            for k, v in app.observation.get.items()
            if k != "rows_in"
        }
    if run_log:
        append_run_log(run_log, report.as_record("silver", ingest_date))
    return report


def run_gold(
    spark: SparkSession,
    silver_base: str,
    gold_base: str,
    ingest_date: str,
    run_log: str | None = None,
) -> PipelineReport:
    """Silver snapshot → client risk profile + portfolio rollup.

    ``run_log``: optional JSONL path (see :func:`run_silver`).
    """
    filters = _ymd(ingest_date)

    def silver(name: str):
        return read_snapshot(spark, f"{silver_base}/{name}", filters).drop(
            "year", "month", "day"
        )

    profile = build_client_risk_profile(
        silver("silver_client_application"),
        silver("silver_bureau_summary"),
        silver("silver_payment_behavior"),
        silver("silver_previous_applications"),
    )
    report = PipelineReport()
    profile_out = with_snapshot_partitions(profile, ingest_date)
    with timed(report.write_seconds, "gold_client_risk_profile"):
        write_parquet(
            profile_out,
            f"{gold_base}/gold_client_risk_profile",
            partition_by=["year", "month", "day"],
        )
    written_profile = read_snapshot(
        spark, f"{gold_base}/gold_client_risk_profile", filters
    ).drop("year", "month", "day")
    report.rows_written["gold_client_risk_profile"] = written_profile.count()

    portfolio = build_portfolio_risk(written_profile)
    with timed(report.write_seconds, "gold_portfolio_risk"):
        write_parquet(
            with_snapshot_partitions(portfolio, ingest_date),
            f"{gold_base}/gold_portfolio_risk",
            partition_by=["year", "month", "day"],
        )
    report.rows_written["gold_portfolio_risk"] = read_snapshot(
        spark, f"{gold_base}/gold_portfolio_risk", filters
    ).count()
    if run_log:
        append_run_log(run_log, report.as_record("gold", ingest_date))
    return report


def _ymd(ingest_date: str) -> dict[str, int]:
    year, month, day = (int(x) for x in ingest_date.split("-"))
    return {"year": year, "month": month, "day": day}
