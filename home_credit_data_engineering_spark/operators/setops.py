"""Set operations (SURVEY §2.8 U1 + extensions).

U1 is the reference's schema-tolerant train ∪ test union
(``spark/silver/processor.py:96``). ``intersect``/``except`` have no
reference counterpart but complete the SQL surface.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_by_name(*dfs: DataFrame, allow_missing: bool = True) -> DataFrame:
    """U1: n-ary name-aligned union; missing columns become NULL when
    ``allow_missing`` (the train/test shape — test has no TARGET)."""
    if not dfs:
        raise ValueError("union_by_name needs at least one DataFrame")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), dfs
    )


def intersect_all(left: DataFrame, right: DataFrame) -> DataFrame:
    """Bag intersection (SQL INTERSECT ALL)."""
    return left.intersectAll(right)


def except_all(left: DataFrame, right: DataFrame) -> DataFrame:
    """Bag difference (SQL EXCEPT ALL)."""
    return left.exceptAll(right)
