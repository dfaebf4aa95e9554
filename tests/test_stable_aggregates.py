"""Edge-case parity for the hash-stable aggregate forms (_stable.py).

The declared-query suite exercises these helpers on well-behaved TPC-H
data; this test feeds the degenerate shapes that break naive formulas —
single-row groups (n-1 = 0), zero-variance groups (corr/stddev
denominators), negative values, sign-flipping covariance, magnitudes near
the decimal-width budget — and checks the Spark forms against their SQL
fragment twins in DuckDB bit-exactly (same discipline as tests/parity.py).
"""

from __future__ import annotations

import duckdb
import pandas as pd

from home_credit_data_engineering_spark.plans.declared._stable import (
    savg,
    scorr,
    scovar_samp,
    ssum,
    sstddev_samp,
    xavg,
    xcorr,
    xcovar_samp,
    xstddev_samp,
    xsum,
)
from tests.parity import assert_frames_match

ROWS = [
    # (grp, x, y)
    ("single", 3.25, -1.5),                 # n = 1: stddev/covar/corr NULL
    ("const", 7.0, 2.0),                    # zero variance in x
    ("const", 7.0, 3.0),
    ("const", 7.0, 4.0),
    ("neg", -12345.67, -0.5),               # negatives + tiny covariance
    ("neg", -0.01, 0.25),
    ("neg", -999999.99, 100.75),
    # Near the product budget: multiplied decimal columns must keep
    # |value|*10^scale under ~3e9 (see _stable.py width note) — 1e7 at
    # scale 2 squares to ~1e18 internal units, just inside int64.
    ("big", 9999999.99, 123456.78),
    ("big", 9999999.98, -123456.78),
    ("mix", 1.5, 2.5),
    ("mix", -1.5, -2.5),
    ("mix", 0.0, 0.0),                      # exact zeros (zero_norm path)
    ("mix", 2.25, 4.5),
]


def test_stable_stat_forms_match_duckdb_on_edge_cases(spark):
    df = spark.createDataFrame(ROWS, "grp string, x double, y double")
    out = df.groupBy("grp").agg(
        xsum("x", 2).alias("sum_x"),
        xavg("x", 4).alias("avg_x"),
        xstddev_samp("x", 4, "decimal(18,2)").alias("sd_x"),
        xcovar_samp("x", "y", 4, "decimal(18,2)", "decimal(18,2)").alias("cov_xy"),
        xcorr("x", "y", 6, "decimal(18,2)", "decimal(18,2)").alias("corr_xy"),
    )
    spark_pdf = out.toPandas()

    con = duckdb.connect()
    try:
        con.register("t", pd.DataFrame(ROWS, columns=["grp", "x", "y"]))
        oracle_pdf = con.sql(f"""
            SELECT grp,
                   {ssum("x", 2)} AS sum_x,
                   {savg("x", 4)} AS avg_x,
                   {sstddev_samp("x", 4, "DECIMAL(18,2)")} AS sd_x,
                   {scovar_samp("x", "y", 4, "DECIMAL(18,2)", "DECIMAL(18,2)")}
                     AS cov_xy,
                   {scorr("x", "y", 6, "DECIMAL(18,2)", "DECIMAL(18,2)")}
                     AS corr_xy
            FROM t GROUP BY grp
        """).df()
    finally:
        con.close()

    assert_frames_match(spark_pdf, oracle_pdf, "stable_edge_cases")

    by_grp = {r["grp"]: r for _, r in spark_pdf.iterrows()}
    # Degenerate groups must be NULL, not NaN/inf/garbage.
    assert pd.isna(by_grp["single"]["sd_x"])
    assert pd.isna(by_grp["single"]["cov_xy"])
    assert pd.isna(by_grp["single"]["corr_xy"])
    # Zero variance: stddev 0, correlation undefined (NULL via NULLIF).
    assert by_grp["const"]["sd_x"] == 0.0
    assert pd.isna(by_grp["const"]["corr_xy"])
    # Strongly (not perfectly) correlated group: the 2.25→4.5 row bends
    # the line, so corr must land strictly inside (0.9, 1).
    assert 0.9 < by_grp["mix"]["corr_xy"] < 1.0
