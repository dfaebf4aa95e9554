"""Golden-output tests for the medallion pipeline on hand-computed fixtures.

Fixtures follow FIXTURES.md §A: each validation rule is exercised by one
row, window tie-breaks are pinned, null paths (missing balance rows, null
payments, divide-by-zero) are covered, and gold segmentation is tested at
threshold boundaries.
"""

from __future__ import annotations

import pytest

from home_credit_data_engineering_spark.plans.gold import (
    build_client_risk_profile,
    build_portfolio_risk,
)
from home_credit_data_engineering_spark.plans.silver import (
    build_bureau_summary,
    build_client_application,
    build_payment_behavior,
    build_previous_applications,
)
from home_credit_data_engineering_spark.schema import (
    APPLICATION,
    BUREAU,
    BUREAU_BALANCE,
    INSTALLMENTS_PAYMENTS,
    PREVIOUS_APPLICATION,
)


@pytest.fixture(scope="module")
def app_df(spark):
    rows = [
        # valid rows
        (1, 0, 100000.0, 500000.0, 25000.0, -15000, "M"),
        (2, 1, 200000.0, 600000.0, None, -20000, "F"),
        (3, None, 150000.0, 300000.0, 15000.0, -10000, "XNA"),  # XNA → Unknown, valid
        (12, 0, 100000.0, 100000.0, 5000.0, -6570, "F"),  # age exactly 18 → valid
        # one failure per rule
        (None, 0, 100000.0, 100000.0, 5000.0, -15000, "M"),  # rule1
        (5, 0, 0.0, 100000.0, 5000.0, -15000, "F"),  # rule2
        (6, 0, 100000.0, -1.0, 5000.0, -15000, "M"),  # rule3
        (7, 0, 100000.0, 100000.0, 5000.0, -6000, "F"),  # rule4 (age 16.4)
        (11, 0, 100000.0, 100000.0, 5000.0, None, "M"),  # rule4 (null birth)
        (8, 0, 100000.0, 100000.0, 0.0, -15000, "M"),  # rule5 (annuity 0)
        (9, 0, 100000.0, 4000.0, 5000.0, -15000, "F"),  # rule6 (credit < annuity)
        (10, 0, 100000.0, 100000.0, 5000.0, -15000, "Z"),  # rule7
    ]
    return spark.createDataFrame(rows, APPLICATION)


def test_client_application_rule_counts(spark, app_df):
    result = build_client_application(app_df)
    assert result.failure_counts == {
        "sk_id_curr_null": 1,
        "amt_income_total_invalid": 1,
        "amt_credit_invalid": 1,
        "age_under_18": 2,
        "amt_annuity_invalid": 1,
        # row 6 (credit=-1) fails BOTH rule 3 and rule 6 (credit < annuity),
        # matching reference semantics where rules are counted independently
        "credit_lt_annuity": 2,
        "code_gender_invalid": 1,
    }
    survivors = {r["SK_ID_CURR"]: r for r in result.df.collect()}
    assert set(survivors) == {1, 2, 3, 12}
    # XNA was recoded before validation
    assert survivors[3]["CODE_GENDER"] == "Unknown"


def test_client_application_union_missing_target(spark, app_df):
    test_rows = [(100, 120000.0, 240000.0, 12000.0, -14000, "F")]
    test_schema = "SK_ID_CURR long, AMT_INCOME_TOTAL double, AMT_CREDIT double, AMT_ANNUITY double, DAYS_BIRTH int, CODE_GENDER string"
    app_test = spark.createDataFrame(test_rows, test_schema)
    result = build_client_application(app_df, app_test, count_failures=False)
    rows = {r["SK_ID_CURR"]: r for r in result.df.collect()}
    assert set(rows) == {1, 2, 3, 12, 100}
    assert rows[100]["TARGET"] is None  # missing column → null via unionByName


@pytest.fixture(scope="module")
def bureau_summary(spark):
    bureau = spark.createDataFrame(
        [
            (1, 101, "Active", 0, 10000.0, 0.0),
            (1, 102, "Closed", 30, None, 500.0),
            (2, 103, "Active", 5, 5000.0, 100.0),
        ],
        BUREAU,
    )
    balance = spark.createDataFrame(
        [(101, 0, "C"), (101, -1, "0"), (102, -2, "X")],  # credit 103 has no rows
        BUREAU_BALANCE,
    )
    return {r["SK_ID_CURR"]: r for r in build_bureau_summary(bureau, balance).df.collect()}


def test_bureau_summary_golden(bureau_summary):
    c1 = bureau_summary[1]
    assert c1["bureau_credit_count"] == 2
    assert c1["bureau_active_credit_count"] == 1
    assert c1["bureau_total_debt"] == 10000.0  # null debt ignored by SUM
    assert c1["bureau_max_days_overdue"] == 30
    assert c1["bureau_total_overdue"] == 500.0
    c2 = bureau_summary[2]
    assert c2["bureau_credit_count"] == 1
    assert c2["bureau_total_debt"] == 5000.0


@pytest.fixture(scope="module")
def payment_rows(spark):
    inst = spark.createDataFrame(
        [
            (201, 1, 1, -100, -95, 1000.0, 1000.0),  # 5 days late
            (201, 1, 2, -70, -72, 1000.0, 1000.0),  # 2 days early
            (202, 1, 1, -40, None, 1000.0, None),  # never paid: delay→0, paid→0
            (203, 2, 1, -10, -5, 0.0, 0.0),  # late but nothing due
        ],
        INSTALLMENTS_PAYMENTS,
    )
    return {r["SK_ID_CURR"]: r for r in build_payment_behavior(inst).df.collect()}


def test_payment_behavior_golden(payment_rows):
    c1 = payment_rows[1]
    assert c1["payment_avg_delay_days"] == pytest.approx(1.0)  # (5-2+0)/3
    assert c1["payment_late_count"] == 1
    assert c1["payment_total_paid"] == 2000.0
    assert c1["payment_total_installment"] == 3000.0
    assert c1["payment_ratio"] == pytest.approx(2000.0 / 3000.0)
    c2 = payment_rows[2]
    assert c2["payment_late_count"] == 1
    assert c2["payment_ratio"] is None  # divide-by-zero guard → NULL


@pytest.fixture(scope="module")
def prev_rows(spark):
    prev = spark.createDataFrame(
        [
            (301, 1, "Approved", 10000.0, 9000.0),
            (302, 1, "Refused", 20000.0, 0.0),
            (303, 1, "Canceled", 5000.0, None),
            (304, 2, "Approved", 8000.0, 8000.0),
        ],
        PREVIOUS_APPLICATION,
    )
    return {
        r["SK_ID_CURR"]: r for r in build_previous_applications(prev).df.collect()
    }


def test_previous_applications_golden(prev_rows):
    c1 = prev_rows[1]
    assert c1["previous_app_count"] == 3
    assert c1["previous_rejected_count"] == 1
    assert c1["previous_rejection_rate"] == pytest.approx(1 / 3)
    assert c1["previous_avg_requested"] == pytest.approx(35000.0 / 3)
    assert c1["previous_avg_granted"] == pytest.approx(4500.0)  # null ignored by AVG
    assert c1["prev_status_approved_count"] == 1
    assert c1["prev_status_refused_count"] == 1
    assert c1["prev_status_canceled_count"] == 1
    assert c1["prev_status_unused_offer_count"] == 0
    c2 = prev_rows[2]
    assert c2["previous_rejection_rate"] == 0.0
    assert c2["prev_status_approved_count"] == 1


@pytest.fixture(scope="module")
def gold_profile(spark, app_df):
    from home_credit_data_engineering_spark.schema import (
        BUREAU,
        BUREAU_BALANCE,
        INSTALLMENTS_PAYMENTS,
        PREVIOUS_APPLICATION,
    )

    app = build_client_application(app_df, count_failures=False).df
    bureau = build_bureau_summary(
        spark.createDataFrame(
            [
                (1, 101, "Active", 0, 10000.0, 0.0),
                (1, 102, "Closed", 30, None, 500.0),
                (2, 103, "Active", 5, 5000.0, 100.0),
            ],
            BUREAU,
        ),
        spark.createDataFrame([(101, 0, "C")], BUREAU_BALANCE),
    ).df
    payment = build_payment_behavior(
        spark.createDataFrame(
            [
                (201, 1, 1, -100, -95, 1000.0, 1000.0),
                (201, 1, 2, -70, -72, 1000.0, 1000.0),
                (202, 1, 1, -40, None, 1000.0, None),
                (203, 2, 1, -10, -5, 0.0, 0.0),
            ],
            INSTALLMENTS_PAYMENTS,
        )
    ).df
    prev = build_previous_applications(
        spark.createDataFrame(
            [
                (301, 1, "Approved", 10000.0, 9000.0),
                (302, 1, "Refused", 20000.0, 0.0),
                (303, 1, "Canceled", 5000.0, None),
                (304, 2, "Approved", 8000.0, 8000.0),
            ],
            PREVIOUS_APPLICATION,
        )
    ).df
    profile = build_client_risk_profile(app, bureau, payment, prev)
    return profile


def test_gold_client_risk_profile_golden(gold_profile):
    rows = {r["SK_ID_CURR"]: r for r in gold_profile.collect()}
    assert set(rows) == {1, 2, 3, 12}

    c1 = rows[1]
    assert c1["income"] == 100000.0
    assert c1["credit_exposure"] == 500000.0
    assert c1["bureau_debt_ratio"] == pytest.approx(0.02)  # 10000/500000
    assert c1["payment_delay_score"] == pytest.approx(6.0)  # 1.0 + 1*5
    assert c1["risk_segment"] == "MEDIUM"  # late_count 1 >= 1

    c2 = rows[2]
    assert c2["bureau_debt_ratio"] == pytest.approx(0.008)  # rounded to 3
    assert c2["risk_segment"] == "MEDIUM"

    # Clients with no summary rows: zero-filled → LOW
    c3 = rows[3]
    assert c3["bureau_total_debt"] == 0
    assert c3["payment_delay_score"] == 0.0
    assert c3["risk_segment"] == "LOW"
    assert c3["default_flag"] is None
    assert rows[12]["risk_segment"] == "LOW"


def test_gold_segment_boundaries(spark):
    """Threshold boundary behavior (FIXTURES.md golden outputs): >= is
    inclusive at 0.2/0.5 debt ratio, 1/3 late, 1/14 delay, 0.2/0.5 rejection."""
    from pyspark.sql import functions as F

    def profile_for(debt, credit, late, delay, rej):
        app = spark.createDataFrame(
            [(1, 0, 100000.0, credit, None, -15000, "M")],
            "SK_ID_CURR long, TARGET int, AMT_INCOME_TOTAL double, AMT_CREDIT double, AMT_ANNUITY double, DAYS_BIRTH int, CODE_GENDER string",
        )
        bureau = spark.createDataFrame(
            [(1, debt)], "SK_ID_CURR long, bureau_total_debt double"
        )
        payment = spark.createDataFrame(
            [(1, delay, late)],
            "SK_ID_CURR long, payment_avg_delay_days double, payment_late_count long",
        )
        prev = spark.createDataFrame(
            [(1, rej)], "SK_ID_CURR long, previous_rejection_rate double"
        )
        df = build_client_risk_profile(app, bureau, payment, prev)
        return df.select("risk_segment").collect()[0][0]

    assert profile_for(debt=50000.0, credit=100000.0, late=0, delay=0.0, rej=0.0) == "HIGH"  # ratio 0.5
    assert profile_for(debt=49999.0, credit=100000.0, late=0, delay=0.0, rej=0.0) == "MEDIUM"  # 0.49999 ≥ 0.2
    assert profile_for(debt=19999.0, credit=100000.0, late=0, delay=0.0, rej=0.0) == "LOW"
    assert profile_for(debt=0.0, credit=100000.0, late=3, delay=0.0, rej=0.0) == "HIGH"
    assert profile_for(debt=0.0, credit=100000.0, late=2, delay=0.0, rej=0.0) == "MEDIUM"
    assert profile_for(debt=0.0, credit=100000.0, late=0, delay=14.0, rej=0.0) == "HIGH"
    assert profile_for(debt=0.0, credit=100000.0, late=0, delay=1.0, rej=0.0) == "MEDIUM"
    assert profile_for(debt=0.0, credit=100000.0, late=0, delay=0.99, rej=0.0) == "LOW"
    assert profile_for(debt=0.0, credit=100000.0, late=0, delay=0.0, rej=0.5) == "HIGH"
    assert profile_for(debt=0.0, credit=100000.0, late=0, delay=0.0, rej=0.2) == "MEDIUM"


def test_gold_portfolio_rollup(gold_profile):
    rows = {r["risk_segment"]: r for r in build_portfolio_risk(gold_profile).collect()}
    assert set(rows) == {"MEDIUM", "LOW"}
    med = rows["MEDIUM"]
    assert med["client_count"] == 2
    assert med["total_exposure"] == 1100000.0  # 500k + 600k
    assert med["avg_default_rate"] == pytest.approx(0.5)  # (0+1)/2
    assert med["avg_income"] == 150000.0
    low = rows["LOW"]
    assert low["client_count"] == 2
    assert low["total_exposure"] == 400000.0
    assert low["avg_default_rate"] == pytest.approx(0.0)  # null TARGET ignored
    assert low["avg_income"] == 125000.0
