"""Gold layer: business KPI tables.

Mirrors the reference's two Gold builders
(``spark/gold/processor.py:108-271``) as pure DataFrame functions:
client risk profile (4-way left-join star + derived metrics + rule-based
segmentation) and the 3-row portfolio rollup. Thresholds and rounding are
copied semantics (``spark/gold/processor.py:81-88,204-209,252-257``) —
golden tests pin boundary behavior at 0.2/0.5 debt ratio, 1/3 late counts,
1/14 delay days, 0.2/0.5 rejection rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.aggregates import grouped_agg
from home_credit_data_engineering_spark.operators.joins import star_join

# Risk thresholds (reference spark/gold/processor.py:81-88).
BUREAU_DEBT_RATIO_HIGH = 0.5
BUREAU_DEBT_RATIO_MEDIUM = 0.2
PAYMENT_LATE_COUNT_HIGH = 3
PAYMENT_AVG_DELAY_DAYS_HIGH = 14
PAYMENT_LATE_COUNT_MEDIUM = 1
PAYMENT_AVG_DELAY_DAYS_MEDIUM = 1
REJECTION_RATE_HIGH = 0.5
REJECTION_RATE_MEDIUM = 0.2

#: Weight of one late payment in the delay score
#: (reference spark/gold/processor.py:178-182).
LATE_COUNT_SCORE_WEIGHT = 5.0


def build_client_risk_profile(
    application: DataFrame,
    bureau_summary: DataFrame,
    payment_behavior: DataFrame,
    previous_applications: DataFrame,
) -> DataFrame:
    """One row per client: star join of the four Silver tables on
    SK_ID_CURR + derived risk metrics (reference ``:108-223``).

    At scale the three summary sides are ~half the fact's row count but
    narrow; they hash-join on the same key so Catalyst/AQE reuses the
    exchange, and small sides broadcast automatically.
    """
    app = application.select(
        "SK_ID_CURR",
        F.col("AMT_INCOME_TOTAL").alias("income"),
        F.col("AMT_CREDIT").alias("credit_exposure"),
        F.col("TARGET").alias("default_flag"),
    )
    bureau = bureau_summary.select(
        "SK_ID_CURR",
        F.coalesce(F.col("bureau_total_debt"), F.lit(0)).alias("bureau_total_debt"),
    )
    payment = payment_behavior.select(
        "SK_ID_CURR",
        F.coalesce(F.col("payment_avg_delay_days"), F.lit(0)).alias(
            "payment_avg_delay_days"
        ),
        F.coalesce(F.col("payment_late_count"), F.lit(0)).alias("payment_late_count"),
    )
    prev = previous_applications.select(
        "SK_ID_CURR",
        F.coalesce(F.col("previous_rejection_rate"), F.lit(0.0)).alias(
            "previous_rejection_rate"
        ),
    )

    df = star_join(
        app,
        [(bureau, "SK_ID_CURR"), (payment, "SK_ID_CURR"), (prev, "SK_ID_CURR")],
        how="left",
    )
    # Null-fill after the joins: clients absent from a summary table get 0s.
    df = df.withColumns(
        {
            "bureau_total_debt": F.coalesce(F.col("bureau_total_debt"), F.lit(0)),
            "payment_avg_delay_days": F.coalesce(
                F.col("payment_avg_delay_days"), F.lit(0)
            ),
            "payment_late_count": F.coalesce(F.col("payment_late_count"), F.lit(0)),
            "previous_rejection_rate": F.coalesce(
                F.col("previous_rejection_rate"), F.lit(0.0)
            ),
        }
    )
    # Derived metrics: guarded debt ratio, weighted delay score.
    df = df.withColumns(
        {
            "bureau_debt_ratio": F.when(
                F.col("credit_exposure").isNotNull() & (F.col("credit_exposure") > 0),
                F.col("bureau_total_debt") / F.col("credit_exposure"),
            ),
            "payment_delay_score": F.col("payment_avg_delay_days")
            + F.col("payment_late_count") * F.lit(LATE_COUNT_SCORE_WEIGHT),
        }
    )

    debt_ratio0 = F.coalesce(F.col("bureau_debt_ratio"), F.lit(0))
    any_high = (
        (debt_ratio0 >= BUREAU_DEBT_RATIO_HIGH)
        | (F.col("payment_late_count") >= PAYMENT_LATE_COUNT_HIGH)
        | (F.col("payment_avg_delay_days") >= PAYMENT_AVG_DELAY_DAYS_HIGH)
        | (F.col("previous_rejection_rate") >= REJECTION_RATE_HIGH)
    )
    any_medium = (
        (debt_ratio0 >= BUREAU_DEBT_RATIO_MEDIUM)
        | (F.col("payment_late_count") >= PAYMENT_LATE_COUNT_MEDIUM)
        | (F.col("payment_avg_delay_days") >= PAYMENT_AVG_DELAY_DAYS_MEDIUM)
        | (F.col("previous_rejection_rate") >= REJECTION_RATE_MEDIUM)
    )
    df = df.withColumn(
        "risk_segment",
        F.when(any_high, F.lit("HIGH")).when(any_medium, F.lit("MEDIUM")).otherwise(
            F.lit("LOW")
        ),
    )
    # Presentation rounding (reference :204-209).
    return df.withColumns(
        {
            "income": F.round("income", 0),
            "credit_exposure": F.round("credit_exposure", 0),
            "payment_avg_delay_days": F.round("payment_avg_delay_days", 2),
            "payment_delay_score": F.round("payment_delay_score", 2),
            "bureau_debt_ratio": F.round("bureau_debt_ratio", 3),
            "previous_rejection_rate": F.round("previous_rejection_rate", 3),
        }
    )


def build_portfolio_risk(client_risk_profile: DataFrame) -> DataFrame:
    """3-row rollup per risk_segment (reference ``:226-271``)."""
    out = grouped_agg(
        client_risk_profile,
        keys=["risk_segment"],
        measures={
            "client_count": F.count(F.lit(1)),
            "total_exposure": F.sum(F.coalesce(F.col("credit_exposure"), F.lit(0))),
            "avg_default_rate": F.avg("default_flag"),
            "avg_income": F.avg("income"),
        },
    )
    return out.withColumns(
        {
            "total_exposure": F.round("total_exposure", 0),
            "avg_default_rate": F.round("avg_default_rate", 3),
            "avg_income": F.round("avg_income", 0),
        }
    )
