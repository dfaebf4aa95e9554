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
