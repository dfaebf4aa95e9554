"""Hash-stable aggregate forms: exact decimal sums + fixed double formulas.

Why this module exists
----------------------
The driver's correctness gate hash-compares Spark output against a DuckDB
oracle **exactly** (no tolerance). Any aggregate whose value depends on
floating-point accumulation order — ``SUM``/``AVG``/``stddev``/``corr``/
``covar`` over doubles — is a latent hash flake: Spark's partial-aggregate
order varies with scan splits and parallelism, and DuckDB's parallel SUM
varies with its own morsel scheduling, so a rounded result can land on a
different side of a rounding boundary per run (CORRECTNESS_r02's
``combo_agg_suite`` red row; VERDICT r2 "What's wrong" #1).

The fix is structural, not cosmetic: every such measure is computed from
**exact decimal sums** (decimal addition is exact and associative, so any
accumulation order gives bit-identical results) followed by **one fixed
double-arithmetic expression written identically in the Spark build and
the oracle SQL**. IEEE doubles make +,-,*,/,sqrt correctly rounded, so two
engines evaluating the same expression DAG on the same inputs produce the
same bits. Test data is lossless under these casts (all numeric columns
are exact at ≤ 6 decimals — verified in tests/test_stable_aggregates.py).

Each helper has a Spark form (``x*``) and a SQL-fragment twin (``s*``)
kept textually parallel so the two sides cannot drift independently.

Residual risk and why it is acceptable: the final ROUND of a derived
double (stddev/corr/covar) could still disagree across engines if the
exact value sits within ~1 ulp of a rounding boundary. With exact sums
that value is *static per dataset* (no per-run variance), so one green
parity run proves all future runs; scripts/driver_sim_stress.py runs the
whole driver set across varied scan-split/shuffle/AQE configs to prove it.

Note the deliberate non-use of the reference's approach: the reference
rounds raw double aggregates for presentation only
(/root/reference/spark/gold/processor.py:242-267) and never hash-compares
engines, so it has no need for this discipline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Default exact-sum cast: 22 integer digits / 6 fractional. Lossless for
#: every testdata numeric (all are exact at <= 6 decimals) and wide enough
#: that SUM never overflows at any benched SF.
DEC = "decimal(28,6)"
SQL_DEC = "DECIMAL(28,6)"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def zero_norm(col: Column) -> Column:
    """Map IEEE -0.0 to +0.0 (SQL ``=`` treats them equal) so the two
    engines can't disagree on the sign of a zero after rounding."""
    return F.when(col == 0, F.lit(0.0)).otherwise(col)


def s_zero_norm(expr: str) -> str:
    return f"(CASE WHEN {expr} = 0 THEN CAST(0 AS DOUBLE) ELSE {expr} END)"


# ---------------------------------------------------------------------------
# Exact decimal SUM / AVG
# ---------------------------------------------------------------------------


def xsum_dec(col: str | Column, dec: str = DEC) -> Column:
    """Exact decimal sum (no double conversion) — for HAVING-style exact
    comparisons."""
    return F.sum(_c(col).cast(dec))


def ssum_dec(col: str, dec: str = SQL_DEC) -> str:
    return f"SUM(CAST({col} AS {dec}))"


def xsum(col: str | Column, nd: int, dec: str = DEC) -> Column:
    """Order-independent SUM over an exactly-decimal double column."""
    return F.round(F.sum(_c(col).cast(dec)).cast("double"), nd)


def ssum(col: str, nd: int, dec: str = SQL_DEC) -> str:
    return f"ROUND(CAST(SUM(CAST({col} AS {dec})) AS DOUBLE), {nd})"


def xsum_expr(expr: Column, nd: int) -> Column:
    """Exact SUM of a pre-built decimal expression (caller controls the
    decimal arithmetic; keep the SQL twin textually identical)."""
    return F.round(F.sum(expr).cast("double"), nd)


def ssum_expr(expr_sql: str, nd: int) -> str:
    return f"ROUND(CAST(SUM({expr_sql}) AS DOUBLE), {nd})"


def xavg(col: str | Column, nd: int, dec: str = DEC) -> Column:
    """Order-independent AVG: exact decimal sum / non-null count, divided
    in double exactly once."""
    c = _c(col)
    return F.round(F.sum(c.cast(dec)).cast("double") / F.count(c), nd)


def savg(col: str, nd: int, dec: str = SQL_DEC) -> str:
    return (
        f"ROUND(CAST(SUM(CAST({col} AS {dec})) AS DOUBLE) / COUNT({col}), {nd})"
    )


# ---------------------------------------------------------------------------
# TPC-H revenue expressions in exact decimal arithmetic
# ---------------------------------------------------------------------------
#
# price*(1-disc) [*(1+tax)] with types narrow enough that no product
# exceeds precision 38 in either engine (price <= 8 digits → DECIMAL(10,2);
# disc/tax in [0,1) at 2 decimals → DECIMAL(3,2); the literal 1 is cast to
# DECIMAL(3,2) so integer-literal promotion rules can't widen the result).


def xdisc_price(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    one = F.lit(1).cast("decimal(3,2)")
    return F.col(price).cast("decimal(10,2)") * (
        one - F.col(disc).cast("decimal(3,2)")
    )


def sdisc_price(price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    return (
        f"(CAST({price} AS DECIMAL(10,2)) * "
        f"(CAST(1 AS DECIMAL(3,2)) - CAST({disc} AS DECIMAL(3,2))))"
    )


def xone_plus_tax(tax: str = "l_tax") -> Column:
    return F.lit(1).cast("decimal(3,2)") + F.col(tax).cast("decimal(3,2)")


def sone_plus_tax(tax: str = "l_tax") -> str:
    return f"(CAST(1 AS DECIMAL(3,2)) + CAST({tax} AS DECIMAL(3,2)))"


# ---------------------------------------------------------------------------
# Dispersion / association statistics from exact power sums
# ---------------------------------------------------------------------------
#
# n, Σx, Σx², Σxy are exact decimals; the closing formula is one fixed
# double expression (identical text both sides). NULLIF guards degenerate
# groups identically in both engines. Assumes non-null inputs (true for
# the testdata; callers with nullable columns should pre-filter).
#
# Width budget for the ``dec`` parameters of the product-bearing helpers:
# keep |value| * 10^scale ≤ ~3e9 per column (e.g. DECIMAL(10,2) for
# quantities, DECIMAL(12,2) for prices ≤ 1e6). DuckDB multiplies
# DECIMAL(≤18) operands through int64 before widening, so a per-row
# product whose internal units exceed ~9.2e18 raises OutOfRange there
# even though the declared result type would fit
# (tests/test_stable_aggregates.py pins the boundary).


def _psums(x: Column, dec: str) -> tuple[Column, Column]:
    xd = x.cast(dec)
    return F.sum(xd).cast("double"), F.sum(xd * xd).cast("double")


def xstddev_samp(col: str | Column, nd: int, dec: str = DEC) -> Column:
    n = F.count(F.lit(1)).cast("double")
    sx, sxx = _psums(_c(col), dec)
    var = F.greatest(sxx - ((sx * sx) / n), F.lit(0.0)) / F.nullif(
        n - 1, F.lit(0.0)
    )
    return zero_norm(F.round(F.sqrt(var), nd))


def sstddev_samp(col: str, nd: int, dec: str = SQL_DEC) -> str:
    n = "CAST(COUNT(*) AS DOUBLE)"
    sx = f"CAST(SUM(CAST({col} AS {dec})) AS DOUBLE)"
    sxx = f"CAST(SUM(CAST({col} AS {dec}) * CAST({col} AS {dec})) AS DOUBLE)"
    var = f"GREATEST({sxx} - (({sx} * {sx}) / {n}), 0.0) / NULLIF({n} - 1, 0.0)"
    return s_zero_norm(f"ROUND(SQRT({var}), {nd})")


def xcovar_samp(
    x: str | Column, y: str | Column, nd: int, xdec: str = DEC, ydec: str = DEC
) -> Column:
    xc, yc = _c(x).cast(xdec), _c(y).cast(ydec)
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(xc).cast("double")
    sy = F.sum(yc).cast("double")
    sxy = F.sum(xc * yc).cast("double")
    cov = (sxy - ((sx * sy) / n)) / F.nullif(n - 1, F.lit(0.0))
    return zero_norm(F.round(cov, nd))


def scovar_samp(
    x: str, y: str, nd: int, xdec: str = SQL_DEC, ydec: str = SQL_DEC
) -> str:
    n = "CAST(COUNT(*) AS DOUBLE)"
    sx = f"CAST(SUM(CAST({x} AS {xdec})) AS DOUBLE)"
    sy = f"CAST(SUM(CAST({y} AS {ydec})) AS DOUBLE)"
    sxy = f"CAST(SUM(CAST({x} AS {xdec}) * CAST({y} AS {ydec})) AS DOUBLE)"
    cov = f"({sxy} - (({sx} * {sy}) / {n})) / NULLIF({n} - 1, 0.0)"
    return s_zero_norm(f"ROUND({cov}, {nd})")


def xcorr(
    x: str | Column, y: str | Column, nd: int, xdec: str = DEC, ydec: str = DEC
) -> Column:
    xc, yc = _c(x).cast(xdec), _c(y).cast(ydec)
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(xc).cast("double")
    sy = F.sum(yc).cast("double")
    sxx = F.sum(xc * xc).cast("double")
    syy = F.sum(yc * yc).cast("double")
    sxy = F.sum(xc * yc).cast("double")
    den = F.sqrt((n * sxx) - (sx * sx)) * F.sqrt((n * syy) - (sy * sy))
    corr = ((n * sxy) - (sx * sy)) / F.nullif(den, F.lit(0.0))
    return zero_norm(F.round(corr, nd))


def scorr(x: str, y: str, nd: int, xdec: str = SQL_DEC, ydec: str = SQL_DEC) -> str:
    n = "CAST(COUNT(*) AS DOUBLE)"
    sx = f"CAST(SUM(CAST({x} AS {xdec})) AS DOUBLE)"
    sy = f"CAST(SUM(CAST({y} AS {ydec})) AS DOUBLE)"
    sxx = f"CAST(SUM(CAST({x} AS {xdec}) * CAST({x} AS {xdec})) AS DOUBLE)"
    syy = f"CAST(SUM(CAST({y} AS {ydec}) * CAST({y} AS {ydec})) AS DOUBLE)"
    sxy = f"CAST(SUM(CAST({x} AS {xdec}) * CAST({y} AS {ydec})) AS DOUBLE)"
    den = f"SQRT(({n} * {sxx}) - ({sx} * {sx})) * SQRT(({n} * {syy}) - ({sy} * {sy}))"
    corr = f"(({n} * {sxy}) - ({sx} * {sy})) / NULLIF({den}, 0.0)"
    return s_zero_norm(f"ROUND({corr}, {nd})")
