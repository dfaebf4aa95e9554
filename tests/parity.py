"""Local replica of the driver's DuckDB-oracle comparison.

Runs a declared query's Spark build and its oracle SQL on the same parquet
tables, then compares row count, column names, and values (order-
insensitive). As strict as the driver's value-hash: floats are compared
**bit-exactly** (IEEE-754 pattern equality, so +0.0 != -0.0 and any 1-ulp
engine drift fails here first). The stable-aggregate discipline in
``plans/declared/_stable.py`` is what makes bit-exactness achievable:
order-dependent double accumulation is replaced by exact decimal sums plus
one fixed double formula written identically on both sides.

``FLOAT_ATOL_EXCEPTIONS`` is the escape hatch for queries whose semantics
make bit-exactness impossible (document why when adding one).
"""

from __future__ import annotations

import struct

import duckdb
import numpy as np
import pandas as pd

from home_credit_data_engineering_spark.schema import TESTDATA_TABLES

#: Queries allowed tolerance-based float compare instead of bit-exact,
#: mapped to their atol. Add entries ONLY with a written justification:
#: - pandas_grouped_zscore: numpy pairwise-summation mean/std vs DuckDB's
#:   streaming window aggregate — two different (each internally
#:   deterministic) accumulation algorithms; outputs rounded at 4, so
#:   1e-9 slack only forgives sub-rounding drift on the raw window stats.
#: - text_lm_perplexity: log-prob sums are exact decimals on both sides,
#:   but the per-token ln and per-doc exp go through each engine's math
#:   library (JVM StrictMath-adjacent vs libm), which may differ in the
#:   last ulp; ppl is rounded at 4, so 1e-9 slack only forgives
#:   sub-rounding library drift.
FLOAT_ATOL_EXCEPTIONS: dict[str, float] = {
    "pandas_grouped_zscore": 1e-9,
    "text_lm_perplexity": 1e-9,
    "text_bigram_backoff_ppl": 1e-9,  # same ln/exp-library rationale
}


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for table in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {table} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{table}.parquet')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _float_bits(v) -> str:
    if pd.isna(v):
        return "nan"
    return struct.pack(">d", float(v)).hex()


def _normalize(
    pdf: pd.DataFrame, exact: bool, driver_strict: bool = False
) -> pd.DataFrame:
    out = pdf.copy()
    # Align column order by name (the driver sorts columns before hashing).
    out = out.reindex(sorted(out.columns), axis=1)
    for col in out.columns:
        s = out[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[col] = s.dt.tz_localize(None) if getattr(s.dt, "tz", None) else s
            out[col] = out[col].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            # Bit-pattern strings compare exactly and sort consistently on
            # both sides (sort key only needs to agree between frames).
            out[col] = s.map(_float_bits) if exact else s.round(9)
        elif s.dtype == object:

            def _obj(v, _col=col):
                if isinstance(v, float):
                    return _float_bits(v) if exact else round(v, 9)
                if isinstance(v, (list, np.ndarray, dict)):
                    if driver_strict:
                        # The REAL driver canonicalizer does a raw pandas
                        # sort_values; an unhashable list/dict value makes
                        # it hard-error (r4's text_quality_filter). Refuse
                        # the tuple rescue here so driver-set parity runs
                        # fail the same way the driver would.
                        raise TypeError(
                            f"driver-strict: column {_col!r} holds a "
                            f"non-scalar value {type(v).__name__}; the "
                            "driver canonicalizer cannot sort it — emit a "
                            "scalar (e.g. array_join) instead"
                        )
                    return tuple(v) if not isinstance(v, dict) else tuple(
                        sorted(v.items())
                    )
                return v

            out[col] = s.map(_obj)
        elif pd.api.types.is_integer_dtype(s):
            out[col] = s.astype("Int64")
    sort_cols = list(out.columns)
    out = out.sort_values(by=sort_cols, na_position="last").reset_index(drop=True)
    return out


def assert_frames_match(
    spark_pdf: pd.DataFrame,
    oracle_pdf: pd.DataFrame,
    name: str,
    atol: float | None = None,
    driver_strict: bool = False,
):
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(oracle_pdf)} (oracle)"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    exact = atol is None
    left = _normalize(spark_pdf, exact, driver_strict)
    right = _normalize(oracle_pdf, exact, driver_strict)
    for col in left.columns:
        lv, rv = left[col].values, right[col].values
        if not exact and pd.api.types.is_float_dtype(
            left[col]
        ) and pd.api.types.is_float_dtype(right[col]):
            both_nan = pd.isna(lv) & pd.isna(rv)
            close = np.isclose(
                lv.astype(float), rv.astype(float), rtol=0, atol=atol,
                equal_nan=True,
            )
            ok = both_nan | close
        else:
            ok = (pd.isna(lv) & pd.isna(rv)) | (lv == rv)
        if not bool(np.all(ok)):
            bad = np.where(~ok)[0][:5]
            detail = [
                f"row {i}: spark={lv[i]!r} oracle={rv[i]!r}" for i in bad
            ]
            raise AssertionError(
                f"{name}: column {col!r} mismatch at {int((~ok).sum())} rows:\n"
                + "\n".join(detail)
            )


def check_query(spark, name: str, sf_dir: str):
    """Run one declared query both ways and compare."""
    import home_credit_data_engineering_spark.plans.declared  # noqa: F401
    from home_credit_data_engineering_spark.plans.registry import REGISTRY, prep

    from home_credit_data_engineering_spark.plans.registry import DRIVER_SET

    q = REGISTRY[name]
    spark_df = q.build(prep(spark), sf_dir)
    spark_pdf = spark_df.toPandas()
    if q.oracle is None:
        assert len(spark_pdf) >= 0
        return spark_pdf
    oracle_pdf = run_oracle(q.oracle, sf_dir)
    assert_frames_match(
        spark_pdf,
        oracle_pdf,
        name,
        atol=FLOAT_ATOL_EXCEPTIONS.get(name),
        # Driver slots get the driver's own (stricter) canonicalization:
        # non-scalar cell values hard-error instead of tuple-rescuing.
        driver_strict=name in DRIVER_SET,
    )
    return spark_pdf
