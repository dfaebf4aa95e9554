"""Projection operators (SURVEY §2.3 P1-P5).

The reference's projection patterns — narrow-and-rename before a star join
(``spark/gold/processor.py:139-157``), bulk lowercase-rename for the
datamart (``spark/gold/datamart_extended.py:78-103``), drop of lineage
columns (``spark/gold/processor.py:211-214``), ``withColumn`` derivations
(``spark/silver/processor.py:179-184``) — as pure functions.

All of these are zero-cost at planning time: Catalyst collapses chained
projections into a single project node, and explicit selects keep the
parquet ``ReadSchema`` narrow (manual column pruning is still good hygiene
even though the optimizer prunes automatically).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def select_rename(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P1: project to exactly ``mapping``'s keys, renamed to its values."""
    return df.select(*[F.col(src).alias(dst) for src, dst in mapping.items()])


def lowercase_columns(df: DataFrame) -> DataFrame:
    """P2: alias every column to lowercase (datamart-compatible names)."""
    return df.toDF(*[c.lower() for c in df.columns])


def drop_columns(df: DataFrame, *cols: str) -> DataFrame:
    """P3: drop columns that exist; ignore the rest (schema-tolerant)."""
    present = [c for c in cols if c in df.columns]
    return df.drop(*present) if present else df


def with_derived(df: DataFrame, derivations: Mapping[str, Column]) -> DataFrame:
    """P4: add computed columns. One ``withColumns`` call → one project node."""
    return df.withColumns(dict(derivations))


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P5: rename a subset of columns in place (e.g. sanitized pivot names)."""
    return df.withColumnsRenamed(dict(mapping))
