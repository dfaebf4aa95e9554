"""Aggregation operators (SURVEY §2.5 A1-A7).

The reference's aggregate shapes — multi-measure hash aggregate with
conditional counts (``spark/silver/processor.py:336-347``), avg + late-count
(``:466-478``), guarded ratios (``:481-487``), dynamic agg lists
(``:613-619``), pivot counts (``:623-635``), global rollup
(``spark/gold/processor.py:242-250``) — as composable builders.

Everything here compiles to Spark's partial→final hash aggregate (map-side
combine before the shuffle), which is exactly the shape you want at 100 TB:
shuffle volume is per-group, not per-row.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def count_where(cond: Column) -> Column:
    """A1/A2: conditional count — ``sum(case when cond then 1 else 0 end)``.

    Mirrors the reference's active-credit and late-payment counts
    (``spark/silver/processor.py:341-342,469-471``). Returns bigint.
    """
    return F.sum(F.when(cond, 1).otherwise(0))


def sum_default0(col: Column | str) -> Column:
    """A2: null-tolerant sum — coalesce each value to 0 before summing
    (``spark/silver/processor.py:473-475``). Differs from plain ``sum`` only
    in returning 0 instead of NULL for all-null groups."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.coalesce(c, F.lit(0)))


def guarded_ratio(numerator: Column, denominator: Column) -> Column:
    """A3: division guarded against zero/NULL denominators — NULL when the
    denominator is not positive (``spark/silver/processor.py:481-487``)."""
    return F.when(denominator > 0, numerator / denominator)


def grouped_agg(
    df: DataFrame,
    keys: list[str],
    measures: Mapping[str, Column],
) -> DataFrame:
    """A1/A4: multi-measure hash aggregate. ``measures`` maps output column
    name → aggregate expression; aliasing here keeps Spark and oracle SQL
    column names identical (driver hash-compare requirement)."""
    return df.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in measures.items()]
    )


def pivot_count(
    df: DataFrame,
    keys: list[str],
    pivot_col: str,
    values: list[str],
    prefix: str = "",
    sanitize: bool = True,
) -> DataFrame:
    """A5: per-key count pivoted over an **explicit** value domain.

    The reference lets ``pivot()`` infer values from data
    (``spark/silver/processor.py:623-635``) — a data-dependent schema and an
    extra distinct job. Pinning ``values`` gives a stable schema and skips
    the scan. Output columns: ``{prefix}{value}`` (lowercased,
    non-alphanumerics → ``_`` when ``sanitize``), nulls filled with 0.
    """

    def colname(v: str) -> str:
        name = v.lower().replace(" ", "_").replace("-", "_") if sanitize else v
        return f"{prefix}{name}"

    pivoted = df.groupBy(*keys).pivot(pivot_col, values).count()
    renamed = pivoted.select(
        *keys, *[F.col(f"`{v}`").alias(colname(v)) for v in values]
    )
    return renamed.fillna(0, subset=[colname(v) for v in values])


def global_rollup(df: DataFrame, keys: list[str], measures: Mapping[str, Column]) -> DataFrame:
    """A6: low-cardinality rollup (the 3-row portfolio shape,
    ``spark/gold/processor.py:242-250``). Same as :func:`grouped_agg`;
    kept separate to mark intent — output is driver-collectable."""
    return grouped_agg(df, keys, measures)


def distinct_keys(df: DataFrame, *cols: str) -> DataFrame:
    """A7: distinct key projection (``spark/silver/processor.py:643-645``).
    Planned as a hash aggregate on the projected columns only."""
    return df.select(*cols).distinct()


def salted_agg(
    df: DataFrame,
    keys: list[str],
    measures: Mapping[str, tuple[str, Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation with key salting for pathological skew.

    Phase 1 groups on (keys, random salt) so a hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 merges the per-salt partials.
    ``measures`` maps output name → (phase-2 merge fn name, phase-1 expr):
    supported merges are ``sum`` (for sum/count partials), ``max``, ``min``
    — the standard decomposable aggregates.

    Results are identical to the plain ``groupBy`` (asserted in tests).
    Note Spark's own map-side partial aggregation already absorbs most
    skew for decomposable aggregates; explicit salting is for the cases
    where partials can't combine enough (huge per-key distinct sets,
    extreme single-key dominance). Like ``joins.salted_join`` it taxes
    every key to save the hot one — opt in deliberately.
    """
    merge_fns = {"sum": F.sum, "max": F.max, "min": F.min}
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (_, expr) in measures.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[
            merge_fns[fn](F.col(f"__p_{name}")).alias(name)
            for name, (fn, _) in measures.items()
        ]
    )


def cube_agg(df: DataFrame, keys: list[str], measures: Mapping[str, Column]) -> DataFrame:
    """Extension: CUBE over ``keys`` (all grouping-set combinations)."""
    return df.cube(*keys).agg(*[expr.alias(n) for n, expr in measures.items()])


def rollup_agg(df: DataFrame, keys: list[str], measures: Mapping[str, Column]) -> DataFrame:
    """Extension: hierarchical ROLLUP over ``keys``."""
    return df.rollup(*keys).agg(*[expr.alias(n) for n, expr in measures.items()])


def grouped_weighted_percentile(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    weight_col: str,
    q: float = 0.5,
) -> DataFrame:
    """Exact weighted percentile per group (weighted median at q=0.5):
    the smallest value whose cumulative weight reaches ``q`` of the
    group's total weight — the lower weighted percentile, the form
    SQL engines without a built-in (Spark included) express via a
    cumulative window.

    Output: ``keys + (wpct_value double, total_weight)``. NULL values
    and NULL/non-positive weights are excluded (documented; a negative
    weight has no percentile meaning). Deterministic: the cumulative
    window orders by value with duplicates resolved by the aggregation
    itself (every row of a tied value shares the crossing decision via
    a RANGE frame, and min() picks the unique crossing value).

    Scale: one window PARTITIONED BY the group keys (no global sort),
    one filter, one min-aggregate — weights accumulate as exact
    DECIMAL(38,6) so the crossing comparison never depends on float
    summation order; only the final q * total product is double (pinned
    expression, identical in the SQL twin).
    """
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    from pyspark.sql import Window

    clean = df.filter(
        F.col(value_col).isNotNull() & (F.col(weight_col) > 0)
    ).select(
        *keys,
        F.col(value_col).alias("__v"),
        F.col(weight_col).cast("decimal(38,6)").alias("__w"),
    )
    # RANGE frame: tied values accumulate together, so the crossing
    # decision is identical for every row of a tie group
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__v").asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*keys)
    cum = clean.select(
        *keys,
        "__v",
        F.sum("__w").over(w_cum).alias("__cw"),
        F.sum("__w").over(w_tot).alias("__tw"),
    )
    crossed = cum.filter(
        F.col("__cw").cast("double")
        >= F.lit(float(q)) * F.col("__tw").cast("double")
    )
    return crossed.groupBy(*keys).agg(
        F.min("__v").cast("double").alias("wpct_value"),
        F.max(F.col("__tw").cast("double")).alias("total_weight"),
    )
