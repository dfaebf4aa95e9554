"""Serving-layer tests: the datamart query surface on Gold outputs, and
JDBC publish via embedded Derby."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.plans.serving import (
    RiskListFilters,
    client_drilldown,
    client_lookup,
    client_risk_page,
    portfolio_summary,
    publish_datamart,
)

DERBY_URL = "jdbc:derby:memory:hcde_serving;create=true"
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def profile(spark):
    rows = [
        (i, float(50000 + i * 1000) if i % 7 else None, float(i * 10000), "HIGH" if i % 3 == 0 else ("MEDIUM" if i % 3 == 1 else "LOW"))
        for i in range(1, 101)
    ]
    return spark.createDataFrame(
        rows, "SK_ID_CURR long, income double, credit_exposure double, risk_segment string"
    )


def test_pagination_and_count(profile):
    total, page = client_risk_page(profile, page=2, page_size=10)
    assert total == 100
    ids = [r["SK_ID_CURR"] for r in page.collect()]
    assert ids == list(range(11, 21))  # deterministic page 2


def test_dynamic_filters_null_tolerant(profile):
    total, page = client_risk_page(
        profile,
        RiskListFilters(risk_segment="HIGH", min_income=80000.0),
        page=1,
        page_size=100,
    )
    rows = page.collect()
    assert total == len(rows) > 0
    for r in rows:
        assert r["risk_segment"] == "HIGH"
        # null incomes remain visible (reference: col IS NULL OR col >= x)
        assert r["income"] is None or r["income"] >= 80000.0
    assert any(r["income"] is None for r in rows)


def test_point_lookup_and_drilldown(spark, profile):
    assert client_lookup(profile, 42).count() == 1
    child = spark.createDataFrame(
        [(42, 3), (42, 1), (7, 2)], "SK_ID_CURR long, SK_ID_BUREAU long"
    )
    got = [r["SK_ID_BUREAU"] for r in client_drilldown(child, 42, "SK_ID_BUREAU").collect()]
    assert got == [1, 3]


def test_portfolio_summary_order(spark):
    p = spark.createDataFrame(
        [("MEDIUM", 2), ("HIGH", 1), ("LOW", 3)], "risk_segment string, client_count long"
    )
    assert [r["risk_segment"] for r in portfolio_summary(p).collect()] == [
        "HIGH",
        "LOW",
        "MEDIUM",
    ]


def test_publish_datamart_jdbc(spark, profile):
    publish_datamart(
        {"gold_client_risk_profile": profile.limit(20)},
        url=DERBY_URL,
        driver=DERBY_DRIVER,
    )
    back = (
        spark.read.format("jdbc")
        .option("url", DERBY_URL)
        .option("dbtable", "gold_client_risk_profile")
        .option("driver", DERBY_DRIVER)
        .load()
    )
    assert back.count() == 20
    assert set(back.columns) == {
        "sk_id_curr",
        "income",
        "credit_exposure",
        "risk_segment",
    }  # lowercase-renamed for the operational store
