"""Stream-stream joins and streaming deduplication.

The reference has no streaming (SURVEY §2.10); these are north-star
extensions following Spark's standard semantics:

- **Interval join**: two watermarked streams inner-joined on an equality
  key plus an event-time interval. The watermarks bound the join state on
  both sides (without them state grows forever), which is what makes the
  operator viable on an unbounded 100 TB/day event feed.
- **Streaming dedup**: ``dropDuplicatesWithinWatermark`` keeps one row per
  id with state evicted once the watermark passes, the streaming twin of
  the batch ``dedup_exact`` operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    left_key: str,
    right_key: str,
    max_delay: str,
    left_watermark: str,
    right_watermark: str,
) -> DataFrame:
    """Inner-join two (streaming or batch) frames where the right event
    happens in ``[left_ts, left_ts + max_delay]`` for the same key.

    Column names on the two sides must be disjoint (rename before calling).
    On batch inputs ``withWatermark`` is a no-op, so the same plan is the
    batch oracle — one definition, two execution modes.
    """
    lhs = left.withWatermark(left_ts, left_watermark)
    rhs = right.withWatermark(right_ts, right_watermark)
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}"))
    )
    return lhs.join(rhs, cond, "inner")


def streaming_dedup(
    df: DataFrame, *, id_cols: list[str], ts_col: str, watermark: str
) -> DataFrame:
    """Keep the first row per ``id_cols`` seen within the watermark window.

    State for an id is dropped once the watermark passes its event time, so
    memory is bounded by (watermark horizon × arrival rate), not by total
    stream history — duplicates arriving later than the watermark are the
    accepted trade-off (standard Spark semantics).
    """
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(id_cols)
