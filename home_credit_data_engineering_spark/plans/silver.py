"""Silver layer: validated, client-grain summary tables.

Pure functions of input DataFrames → (metrics, output DataFrame), matching
the reference's four Silver builders semantically
(``spark/silver/processor.py``) while fixing the executional anti-patterns:

- one aggregate pass for all validation-rule failure counts instead of one
  ``count()`` action per rule (reference ``:147-165`` runs 8 jobs);
- no redundant count-actions between transformations (every reference
  builder re-executes its plan 3-5×, SURVEY §3.2);
- explicit pivot value domain for a stable schema (reference ``:623-635``
  infers it from data);
- deterministic window tie-breaks (reference ``:286`` ties are arbitrary).

Column names and null/rounding semantics match the reference exactly —
golden tests in tests/test_pipeline_golden.py pin them.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.aggregates import (
    count_where,
    grouped_agg,
    guarded_ratio,
    sum_default0,
)
from home_credit_data_engineering_spark.operators.quality import (
    Rule,
    observed_validate,
    validate,
)
from home_credit_data_engineering_spark.operators.windows import latest_per_key
from home_credit_data_engineering_spark.operators.joins import equi_join
from home_credit_data_engineering_spark.operators.setops import union_by_name
from home_credit_data_engineering_spark.schema import CONTRACT_STATUS_VALUES


@dataclass
class SilverResult:
    """Output table + the operational metrics the reference logs.

    When built with ``observe=True``, ``observation`` carries the failure
    counters instead of ``failure_counts``: they materialize as a side
    effect of the first action on ``df`` (e.g. the pipeline's parquet
    write) — zero extra input passes.
    """

    df: DataFrame
    failure_counts: dict[str, int]
    observation: object | None = None


# ---------------------------------------------------------------------------
# silver_client_application (reference spark/silver/processor.py:84-188)
# ---------------------------------------------------------------------------


def application_rules() -> list[Rule]:
    """The 7 validation rules (reference ``:127-145``), post-normalization.

    Exact semantics preserved: rule 4 requires DAYS_BIRTH non-null AND
    abs(days)/365 >= 18; rule 5 passes on null annuity; rule 6 passes when
    either side is null.
    """
    return [
        Rule("sk_id_curr_null", F.col("SK_ID_CURR").isNotNull()),
        Rule(
            "amt_income_total_invalid",
            F.col("AMT_INCOME_TOTAL").isNotNull() & (F.col("AMT_INCOME_TOTAL") > 0),
        ),
        Rule(
            "amt_credit_invalid",
            F.col("AMT_CREDIT").isNotNull() & (F.col("AMT_CREDIT") > 0),
        ),
        Rule(
            "age_under_18",
            F.col("DAYS_BIRTH").isNotNull()
            & ((F.abs(F.col("DAYS_BIRTH")) / 365.0) >= 18),
        ),
        Rule(
            "amt_annuity_invalid",
            F.col("AMT_ANNUITY").isNull() | (F.col("AMT_ANNUITY") > 0),
        ),
        Rule(
            "credit_lt_annuity",
            F.col("AMT_CREDIT").isNull()
            | F.col("AMT_ANNUITY").isNull()
            | (F.col("AMT_CREDIT") >= F.col("AMT_ANNUITY")),
        ),
        Rule("code_gender_invalid", F.col("CODE_GENDER").isin("M", "F", "Unknown")),
    ]


def normalize_application(df: DataFrame) -> DataFrame:
    """Safe casts + XNA→Unknown recode (reference ``:103-122``).
    Schema-tolerant: only touches columns that exist."""
    casts = {
        "AMT_INCOME_TOTAL": "double",
        "AMT_CREDIT": "double",
        "AMT_ANNUITY": "double",
        "DAYS_BIRTH": "int",
    }
    updates = {
        name: F.col(name).cast(dtype) for name, dtype in casts.items() if name in df.columns
    }
    if "CODE_GENDER" in df.columns:
        updates["CODE_GENDER"] = F.when(
            F.col("CODE_GENDER") == "XNA", F.lit("Unknown")
        ).otherwise(F.col("CODE_GENDER"))
    return df.withColumns(updates) if updates else df


def build_client_application(
    app_train: DataFrame,
    app_test: DataFrame | None = None,
    count_failures: bool = True,
    observe: bool = False,
) -> SilverResult:
    """train ∪ test (U1, schema-tolerant) → normalize → 7-rule validation.

    ``observe=True`` attaches the failure counters to the plan itself
    (CollectMetrics) instead of running a counting job — the pipeline's
    write action delivers them for free.
    """
    df = app_train
    if app_test is not None:
        df = union_by_name(app_train, app_test, allow_missing=True)
    df = normalize_application(df)
    if observe:
        obs, clean = observed_validate(df, application_rules())
        return SilverResult(df=clean, failure_counts={}, observation=obs)
    counts, clean = validate(df, application_rules(), count_failures=count_failures)
    return SilverResult(df=clean, failure_counts=counts)


# ---------------------------------------------------------------------------
# silver_bureau_summary (reference spark/silver/processor.py:194-380)
# ---------------------------------------------------------------------------


def build_bureau_summary(bureau: DataFrame, bureau_balance: DataFrame) -> SilverResult:
    """W1 latest month per credit → J1 left join → A1 client aggregate.

    Engine deviation (SURVEY §7.3): the latest-month window adds STATUS as
    a deterministic tie-breaker; MONTHS_BALANCE is unique per credit in the
    real dataset, so this changes nothing there but pins test fixtures.
    """
    latest = latest_per_key(
        bureau_balance,
        keys=["SK_ID_BUREAU"],
        order_by=[F.col("MONTHS_BALANCE").desc(), F.col("STATUS").desc_nulls_last()],
    )
    joined = equi_join(bureau, latest, on="SK_ID_BUREAU", how="left")
    agg = grouped_agg(
        joined,
        keys=["SK_ID_CURR"],
        measures={
            "bureau_credit_count": F.count(F.lit(1)),
            "bureau_active_credit_count": count_where(F.col("CREDIT_ACTIVE") == "Active"),
            "bureau_total_debt": F.sum("AMT_CREDIT_SUM_DEBT"),
            "bureau_max_days_overdue": F.max("CREDIT_DAY_OVERDUE"),
            "bureau_total_overdue": F.sum("AMT_CREDIT_SUM_OVERDUE"),
        },
    ).filter(F.col("SK_ID_CURR").isNotNull())
    return SilverResult(df=agg, failure_counts={})


# ---------------------------------------------------------------------------
# silver_payment_behavior (reference spark/silver/processor.py:407-521)
# ---------------------------------------------------------------------------


def build_payment_behavior(installments: DataFrame) -> SilverResult:
    """delay derivation → per-client behavior aggregate with guarded ratio.

    delay = coalesce(DAYS_ENTRY_PAYMENT - DAYS_INSTALMENT, 0); late = delay
    > 0; totals coalesce nulls to 0; ratio NULL when nothing was due
    (reference ``:434-487``).
    """
    delayed = installments.withColumn(
        "payment_delay_days",
        F.coalesce(
            F.col("DAYS_ENTRY_PAYMENT").cast("int") - F.col("DAYS_INSTALMENT").cast("int"),
            F.lit(0),
        ),
    )
    agg = grouped_agg(
        delayed,
        keys=["SK_ID_CURR"],
        measures={
            "payment_avg_delay_days": F.avg("payment_delay_days"),
            "payment_late_count": count_where(F.col("payment_delay_days") > 0),
            "payment_total_paid": sum_default0("AMT_PAYMENT"),
            "payment_total_installment": sum_default0("AMT_INSTALMENT"),
        },
    )
    agg = agg.withColumn(
        "payment_ratio",
        guarded_ratio(
            F.col("payment_total_paid"), F.col("payment_total_installment")
        ),
    ).filter(F.col("SK_ID_CURR").isNotNull())
    return SilverResult(df=agg, failure_counts={})


# ---------------------------------------------------------------------------
# silver_previous_applications (reference spark/silver/processor.py:562-684)
# ---------------------------------------------------------------------------

REJECTED_STATUSES = ("Refused", "Refused by client")


def build_previous_applications(prev: DataFrame) -> SilverResult:
    """counts + rejection rate + amount averages + pivoted status counts.

    The reference computes three separate aggregates and joins them
    (``:589-651``); counts and averages share a grouping key, so the engine
    fuses them into ONE hash aggregate and joins only the pivot — one fewer
    shuffle at any scale. Pivot values are the pinned domain
    (schema.CONTRACT_STATUS_VALUES) instead of data-inferred.
    """
    base = grouped_agg(
        prev,
        keys=["SK_ID_CURR"],
        measures={
            "previous_app_count": F.count(F.lit(1)),
            "previous_rejected_count": count_where(
                F.col("NAME_CONTRACT_STATUS").isin(*REJECTED_STATUSES)
            ),
            "previous_avg_requested": F.avg("AMT_APPLICATION"),
            "previous_avg_granted": F.avg("AMT_CREDIT"),
        },
    ).withColumn(
        "previous_rejection_rate",
        F.when(
            F.col("previous_app_count") > 0,
            F.col("previous_rejected_count") / F.col("previous_app_count"),
        ).otherwise(F.lit(0.0)),
    )

    def status_col(value: str) -> str:
        return f"prev_status_{value.lower().replace(' ', '_').replace('-', '_')}_count"

    pivoted = (
        prev.groupBy("SK_ID_CURR")
        .pivot("NAME_CONTRACT_STATUS", CONTRACT_STATUS_VALUES)
        .count()
    )
    pivoted = pivoted.select(
        "SK_ID_CURR",
        *[F.col(f"`{v}`").alias(status_col(v)) for v in CONTRACT_STATUS_VALUES],
    ).fillna(0)

    out = equi_join(base, pivoted, on="SK_ID_CURR", how="left").filter(
        F.col("SK_ID_CURR").isNotNull()
    )
    return SilverResult(df=out, failure_counts={})


def with_snapshot_partitions(df: DataFrame, ingest_date: str) -> DataFrame:
    """Add the year/month/day partition columns (reference ``:67-70,179-188``)."""
    year, month, day = (int(part) for part in ingest_date.split("-"))
    return df.withColumns(
        {"year": F.lit(year), "month": F.lit(month), "day": F.lit(day)}
    )
