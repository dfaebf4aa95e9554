"""Declared-query registry.

Every operator the engine claims (SURVEY §2 + north-star extensions) is
registered here as a :class:`DeclaredQuery`: a Spark DataFrame builder plus
— when SQL-expressible — an equivalent ANSI-SQL oracle that DuckDB runs on
the same parquet tables. The driver's correctness gate and the in-repo
parity tests (``tests/test_oracle_parity.py``) both iterate this registry.

Parity discipline (what makes hash-compare pass):

- **Column names**: every computed column is aliased identically in the
  Spark build and the oracle SQL.
- **Floating point**: any aggregate over doubles is wrapped in
  ``round(x, N)`` on BOTH sides — double summation order differs between
  engines (and between Spark runs), so raw sums are not hash-stable.
- **Determinism**: every window/order has a total order (unique tie-break
  key); limit/offset queries order by a unique key.
- **Timestamps**: session timezone pinned to UTC (DuckDB timestamps are
  UTC-naive).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class DeclaredQuery:
    """One verifiable query: Spark builder + optional DuckDB oracle."""

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    #: SURVEY §2 operator IDs this query certifies (e.g. "W1", "A5").
    operators: tuple[str, ...] = field(default_factory=tuple)
    #: Short human description for the judge's inventory check.
    doc: str = ""


REGISTRY: dict[str, DeclaredQuery] = {}


def register(
    name: str,
    oracle: str | None,
    operators: tuple[str, ...] = (),
    doc: str = "",
):
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate declared query: {name}")
        REGISTRY[name] = DeclaredQuery(
            name=name, build=fn, oracle=oracle, operators=operators, doc=doc
        )
        return fn

    return wrap


def prep(spark: SparkSession) -> SparkSession:
    """Pin runtime conf a query depends on, independent of who built the
    session (the driver builds its own): UTC timestamps for oracle parity,
    AQE on."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The ``queries()`` dict for the driver contract."""

    def bound(q: DeclaredQuery):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return q.build(prep(spark), sf_dir)

        run.__name__ = q.name
        run.__doc__ = q.doc
        return run

    return {name: bound(q) for name, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    """The ``oracle_sql()`` dict for the driver contract (SQL-expressible
    queries only; the rest get the driver's rows-only check)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
