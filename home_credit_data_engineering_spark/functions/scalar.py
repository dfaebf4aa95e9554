"""Scalar expression helpers (SURVEY §2.9, P8-P10).

All native ``pyspark.sql.functions`` compositions — zero Python in the row
path, everything stays inside whole-stage codegen. The reference's scalar
surface is math/coalesce/when/lit/cast
(``spark/silver/processor.py:116-145,434-487``,
``spark/gold/processor.py:147-209``); string and date functions are engine
extensions (the reference only manipulates column *names* in Python).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def coalesce0(col: Column | str) -> Column:
    """P8: null→0 normalization before arithmetic
    (``spark/silver/processor.py:436-440``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(0))


def recode(col: Column | str, mapping: Mapping[object, object], default: Column | None = None) -> Column:
    """P9: value recode via chained when/otherwise — the XNA→Unknown shape
    (``spark/silver/processor.py:116-122``). ``default`` falls back to the
    original value."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for src, dst in mapping.items():
        branch = F.when(c == F.lit(src), F.lit(dst))
        expr = branch if expr is None else expr.when(c == F.lit(src), F.lit(dst))
    return expr.otherwise(default if default is not None else c)


def case_chain(branches: Sequence[tuple[Column, object]], default: object) -> Column:
    """P10: multi-branch CASE WHEN — the HIGH/MEDIUM/LOW segmentation shape
    (``spark/gold/processor.py:185-200``). First matching branch wins."""
    expr = None
    for cond, value in branches:
        expr = F.when(cond, F.lit(value)) if expr is None else expr.when(cond, F.lit(value))
    return expr.otherwise(F.lit(default))


def years_from_days(days_col: Column | str) -> Column:
    """Age-in-years from a negative day-offset column
    (``spark/silver/processor.py:134-135``: ``abs(DAYS_BIRTH)/365``)."""
    c = F.col(days_col) if isinstance(days_col, str) else days_col
    return F.abs(c) / F.lit(365)


def bounded_round(col: Column | str, digits: int = 2) -> Column:
    """Presentation rounding (``spark/gold/processor.py:204-209``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, digits)
