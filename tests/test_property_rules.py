"""Property-based tests (Hypothesis) for the Silver validation rules.

The 7 application rules are closed-form predicates (SURVEY §5.2.3): for any
generated row, the engine's DataFrame filter must agree with a plain-Python
evaluation of the same three-valued-logic semantics, including every null
case (null annuity passes rule 5; null credit/annuity passes rule 6; null
birth fails rule 4; a NULL predicate never passes the filter).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from home_credit_data_engineering_spark.plans.silver import (
    build_client_application,
)
from home_credit_data_engineering_spark.schema import APPLICATION

maybe_amount = st.one_of(
    st.none(),
    st.floats(
        min_value=-1e6, max_value=1e7, allow_nan=False, allow_infinity=False
    ),
)
maybe_days = st.one_of(st.none(), st.integers(min_value=-40000, max_value=1000))
gender = st.sampled_from(["M", "F", "XNA", "Unknown", "Z", None])


def python_rules(row: tuple) -> bool:
    """Reference semantics in plain Python (normalization + 7 rules)."""
    sk, target, income, credit, annuity, days, g = row
    if g == "XNA":
        g = "Unknown"
    ok = sk is not None
    ok = ok and (income is not None and income > 0)
    ok = ok and (credit is not None and credit > 0)
    ok = ok and (days is not None and abs(days) / 365.0 >= 18)
    ok = ok and (annuity is None or annuity > 0)
    ok = ok and (credit is None or annuity is None or credit >= annuity)
    ok = ok and (g in ("M", "F", "Unknown"))
    return bool(ok)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=1, max_value=10**9)),
            st.one_of(st.none(), st.integers(min_value=0, max_value=1)),
            maybe_amount,
            maybe_amount,
            maybe_amount,
            maybe_days,
            gender,
        ),
        min_size=1,
        max_size=25,
    )
)
def test_validation_filter_matches_python_semantics(spark, rows):
    df = spark.createDataFrame(rows, APPLICATION)
    result = build_client_application(df, count_failures=False)
    surviving = {
        (r["SK_ID_CURR"], r["AMT_INCOME_TOTAL"], r["AMT_CREDIT"])
        for r in result.df.collect()
    }
    expected = {
        (sk, income, credit)
        for (sk, target, income, credit, annuity, days, g) in rows
        if python_rules((sk, target, income, credit, annuity, days, g))
    }
    assert surviving == expected


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=100),
            st.one_of(st.none(), st.integers(min_value=0, max_value=1)),
            maybe_amount,
            maybe_amount,
            maybe_amount,
            maybe_days,
            gender,
        ),
        min_size=1,
        max_size=25,
    )
)
def test_failure_counts_match_python_semantics(spark, rows):
    """Per-rule failure counts from the single-pass aggregate equal naive
    per-rule counting (the reference's N-job formulation)."""
    df = spark.createDataFrame(rows, APPLICATION)
    result = build_client_application(df, count_failures=True)

    def norm_gender(g):
        return "Unknown" if g == "XNA" else g

    expected = {
        "sk_id_curr_null": sum(1 for r in rows if r[0] is None),
        "amt_income_total_invalid": sum(
            1 for r in rows if not (r[2] is not None and r[2] > 0)
        ),
        "amt_credit_invalid": sum(
            1 for r in rows if not (r[3] is not None and r[3] > 0)
        ),
        "age_under_18": sum(
            1 for r in rows if not (r[5] is not None and abs(r[5]) / 365.0 >= 18)
        ),
        "amt_annuity_invalid": sum(
            1 for r in rows if not (r[4] is None or r[4] > 0)
        ),
        "credit_lt_annuity": sum(
            1
            for r in rows
            if not (r[3] is None or r[4] is None or r[3] >= r[4])
        ),
        "code_gender_invalid": sum(
            1 for r in rows if norm_gender(r[6]) not in ("M", "F", "Unknown")
        ),
    }
    assert result.failure_counts == expected
