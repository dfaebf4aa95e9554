"""Orchestrator, quarantine split, and schema conformance tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.quality import (
    Rule,
    split_valid_invalid,
)
from home_credit_data_engineering_spark.plans.bronze import ingest_dataframe
from home_credit_data_engineering_spark.plans.pipeline import run_gold, run_silver
from home_credit_data_engineering_spark.schema import (
    APPLICATION,
    BUREAU,
    BUREAU_BALANCE,
    INSTALLMENTS_PAYMENTS,
    PREVIOUS_APPLICATION,
    conform,
)
from home_credit_data_engineering_spark.sources.readers import read_snapshot

DATE = "2026-08-13"


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    """A small bronze lake (two ingest dates to exercise snapshot pruning)."""
    base = tmp_path_factory.mktemp("lake")
    fixtures = {
        "application": (
            APPLICATION,
            [
                (1, 0, 100000.0, 500000.0, 25000.0, -15000, "M"),
                (2, 1, 200000.0, 600000.0, None, -20000, "F"),
                (5, 0, 0.0, 100000.0, 5000.0, -15000, "F"),  # dropped
            ],
        ),
        "bureau": (BUREAU, [(1, 101, "Active", 0, 10000.0, 0.0)]),
        "bureau_balance": (BUREAU_BALANCE, [(101, 0, "C")]),
        "installments_payments": (
            INSTALLMENTS_PAYMENTS,
            [(201, 1, 1, -100, -95, 1000.0, 1000.0)],
        ),
        "previous_application": (
            PREVIOUS_APPLICATION,
            [(301, 1, "Approved", 10000.0, 9000.0)],
        ),
    }
    for date in ("2026-08-12", DATE):
        for name, (schema, rows) in fixtures.items():
            ingest_dataframe(
                spark.createDataFrame(rows, schema),
                f"{base}/bronze/{name}",
                date,
                "test",
            )
    return str(base)


def test_full_pipeline_run(spark, lake):
    run_log = f"{lake}/logs/runs.jsonl"
    silver_report = run_silver(
        spark, f"{lake}/bronze", f"{lake}/silver", DATE, run_log=run_log
    )
    assert silver_report.validation_failures["amt_income_total_invalid"] == 1
    assert silver_report.rows_written["silver_client_application"] == 2
    assert silver_report.rows_written["silver_bureau_summary"] == 1

    gold_report = run_gold(
        spark, f"{lake}/silver", f"{lake}/gold", DATE, run_log=run_log
    )
    assert gold_report.rows_written["gold_client_risk_profile"] == 2
    assert gold_report.rows_written["gold_portfolio_risk"] >= 1

    # Persisted operational record: one JSONL line per layer run, carrying
    # the same metrics the in-memory report returned (reference parity
    # with its per-run log files).
    from home_credit_data_engineering_spark.runlog import read_run_log

    records = read_run_log(run_log)
    assert [r["layer"] for r in records] == ["silver", "gold"]
    silver_rec, gold_rec = records
    assert silver_rec["ingest_date"] == DATE
    assert silver_rec["rows_written"] == silver_report.rows_written
    assert silver_rec["validation_failures"] == silver_report.validation_failures
    assert set(silver_rec["write_seconds"]) == set(silver_report.rows_written)
    assert all(s >= 0 for s in silver_rec["write_seconds"].values())
    assert "ts" in silver_rec
    assert gold_rec["rows_written"] == gold_report.rows_written

    profile = read_snapshot(
        spark,
        f"{lake}/gold/gold_client_risk_profile",
        {"year": 2026, "month": 8, "day": 13},
    )
    rows = {r["SK_ID_CURR"]: r for r in profile.collect()}
    assert rows[1]["risk_segment"] == "MEDIUM"  # late_count 1
    assert rows[2]["risk_segment"] == "LOW"


def test_quarantine_split(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (None, 3.0)], "id long, amount double"
    )
    rules = [
        Rule("id_present", F.col("id").isNotNull()),
        Rule("amount_positive", F.col("amount") > 0),
    ]
    valid, invalid = split_valid_invalid(df, rules)
    assert [r["id"] for r in valid.collect()] == [1]
    bad = {tuple(r["failed_rules"]): r["id"] for r in invalid.collect()}
    assert bad[("amount_positive",)] == 2
    assert bad[("id_present",)] is None


def test_observed_validate_counts_ride_the_write_action(spark, tmp_path):
    from home_credit_data_engineering_spark.operators.quality import (
        failure_counts,
        observed_validate,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (None, 3.0), (4, None)],
        "id long, amount double",
    )
    rules = [
        Rule("id_present", F.col("id").isNotNull()),
        Rule("amount_positive", F.col("amount") > 0),
    ]
    obs, clean = observed_validate(df, rules)
    # The ONLY action is the output write — counts arrive as its side
    # effect (no separate aggregate job over the input).
    clean.write.mode("overwrite").parquet(str(tmp_path / "clean"))
    got = obs.get
    assert got["rows_in"] == 4
    # The clean filter must not have pushed below the metrics node: counts
    # are over the pre-filter input, identical to the standalone job.
    assert {k: got[k] for k in ("id_present", "amount_positive")} == failure_counts(
        df, rules
    )
    assert [r["id"] for r in spark.read.parquet(str(tmp_path / "clean")).collect()] == [1]


def test_schema_conform(spark):
    drifted = spark.createDataFrame(
        [("7", 1, "extra")], "SK_ID_CURR string, TARGET int, junk string"
    )
    out = conform(drifted, APPLICATION)
    assert out.columns == [f.name for f in APPLICATION.fields]
    row = out.collect()[0]
    assert row["SK_ID_CURR"] == 7  # cast string→long
    assert row["AMT_CREDIT"] is None  # missing → typed null
    assert "junk" not in out.columns


def test_quality_gate_enforcement(spark, tmp_path):
    """Expectations enforce tolerances on the SAME observe() counts the
    write delivered — zero extra passes; breaches raise with rates."""
    import pytest

    from home_credit_data_engineering_spark.operators.quality import (
        Expectation,
        QualityGateError,
        enforce_expectations,
        observed_validate,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, 3.0), (4, -1.0)], "id long, amount double"
    )
    rules = [
        Rule("id_present", F.col("id").isNotNull()),
        Rule("amount_positive", F.col("amount") > 0),
    ]
    obs, clean = observed_validate(df, rules)
    clean.write.mode("overwrite").parquet(str(tmp_path / "out"))

    # 50% negative amounts: tolerated at 60%, breached at 10%
    rates = enforce_expectations(
        obs,
        expectations=[
            Expectation(rules[0], 0.0),
            Expectation(rules[1], 0.6),
        ],
    )
    assert rates == {"id_present": 0.0, "amount_positive": 0.5}
    with pytest.raises(QualityGateError, match="amount_positive"):
        enforce_expectations(
            obs,
            expectations=[Expectation(rules[1], 0.1)],
        )
