"""Incremental aggregate maintenance across snapshots.

The reference recomputes every Silver/Gold table from the full input each
run (SURVEY §3.2). At 100 TB the daily job must instead fold the new
snapshot into a persisted *state* table — O(delta), not O(history):

- :func:`aggregate_state` / :func:`merge_aggregate_state` — keyed state
  for the decomposable aggregates (count/sum/min/max; avg = sum/count at
  read time). Folding day N's delta into the state is one groupBy over
  state ∪ delta-partials: same result as re-aggregating all history
  (asserted in tests), touching only yesterday's state and today's rows.
- :func:`distinct_sketch_state` / :func:`merge_distinct_sketch_state` /
  :func:`estimate_distinct` — the same pattern for COUNT(DISTINCT) via
  HyperLogLog sketches (``hll_sketch_agg`` / ``hll_union_agg``), which —
  unlike exact distinct — merge associatively, so per-snapshot sketches
  union in O(keys) regardless of history size.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: measure name → (source column expr, merge function name)
MERGE_FNS = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def aggregate_state(
    df: DataFrame, keys: list[str], measures: Mapping[str, tuple[str, str]]
) -> DataFrame:
    """Build keyed aggregate state from one snapshot.

    ``measures`` maps output name → (kind, column) with kind one of
    ``count`` (column ignored), ``sum``, ``min``, ``max``.
    """
    aggs = []
    for name, (kind, col) in measures.items():
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(name))
        elif kind == "sum":
            aggs.append(F.sum(col).alias(name))
        elif kind in ("min", "max"):
            aggs.append(getattr(F, kind)(col).alias(name))
        else:
            raise ValueError(f"non-decomposable measure kind: {kind}")
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregate_state(
    state: DataFrame,
    delta_state: DataFrame,
    keys: list[str],
    measures: Mapping[str, tuple[str, str]],
) -> DataFrame:
    """Fold a new snapshot's state into the running state (same schema).

    count/sum partials re-sum; min/max partials re-min/max. Unseen keys
    appear, untouched keys pass through — a union + one aggregate, no
    join, no history rescan.
    """
    merged = state.unionByName(delta_state)
    aggs = [
        MERGE_FNS[kind](name).alias(name) for name, (kind, _) in measures.items()
    ]
    return merged.groupBy(*keys).agg(*aggs)


def distinct_sketch_state(
    df: DataFrame, keys: list[str], col: str, lg_k: int = 12
) -> DataFrame:
    """Keyed HLL sketch of ``col`` for one snapshot: (keys…, sketch)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("sketch")
    )


def merge_distinct_sketch_state(
    state: DataFrame, delta_state: DataFrame, keys: list[str]
) -> DataFrame:
    """Union per-key sketches — associative, O(keys) whatever the history."""
    return (
        state.unionByName(delta_state)
        .groupBy(*keys)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
    )


def estimate_distinct(state: DataFrame, keys: list[str]) -> DataFrame:
    """(keys…, approx_distinct) read-time estimate from the sketch state."""
    return state.select(
        *keys, F.hll_sketch_estimate("sketch").alias("approx_distinct")
    )
