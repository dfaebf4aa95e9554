"""Grouped-map pandas operators (``applyInPandas``).

The per-group escape hatch for semantics built-ins can't express: each
group arrives as ONE pandas DataFrame (Arrow-batched) and returns a
DataFrame with a declared schema. Use only when the per-group computation
is genuinely imperative — for anything expressible as window/aggregate
expressions the built-ins are faster (no Python, no group materialization).

Scale caution: a group must fit in one executor's memory (the classic
applyInPandas constraint). Key by something bounded — user, client,
session — never by a hot unbounded key.

The z-score example here IS window-expressible on purpose: its DuckDB
oracle (window mean/stddev) proves the pandas path computes exactly what
the declarative path would, certifying the plumbing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("value_z", T.DoubleType()),
    ]
)


def zscore_per_group(
    df: DataFrame, key_col: str = "user_id", value_col: str = "value"
) -> DataFrame:
    """Per-key z-score normalization via applyInPandas (ddof=1, matching
    SQL ``stddev_samp``); groups with zero variance yield NULL scores."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        # Arrow delivers group rows in shuffle order, which varies run to
        # run; sort so the float accumulation order (and thus the last-ulp
        # of mean/std) is deterministic for a given dataset.
        pdf = pdf.sort_values("event_id")
        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        z = (pdf[value_col] - mean) / std if std and std > 0 else pd.Series([None] * len(pdf), dtype="float64")
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf[key_col],
                "value": pdf[value_col],
                "value_z": z,
            }
        )

    return (
        df.select("event_id", key_col, value_col)
        .groupBy(key_col)
        .applyInPandas(normalize, ZSCORE_SCHEMA)
    )


def weighted_mean_udaf():
    """A ``GROUPED_AGG`` pandas UDAF: weighted mean of (value, weight).

    The third pandas eval type the engine exercises (SCALAR pandas UDFs
    re-rank ANN candidates, GROUPED_MAP normalizes z-scores; GROUPED_AGG
    is the custom-aggregate slot — usable in ``groupBy().agg()`` AND as
    a window aggregate). Whole groups arrive as pandas Series and return
    one scalar; partial aggregation does NOT apply (each group's data
    moves to one executor), so at 100 TB prefer decomposable built-in
    measures unless the aggregate genuinely needs the full group.

    Returned fresh per call (UDF registration binds to the active
    SparkSession).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        tw = w.sum()
        if tw == 0 or pd.isna(tw):
            return float("nan")
        return float((v * w).sum() / tw)

    return weighted_mean
