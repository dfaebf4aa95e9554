"""Sorts, limits, sampling, pagination (SURVEY §2.7 O1-O4).

O4 is the datamart query shape the reference serves from Postgres
(``api/app/database.py:94-106``) — the engine answers it natively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def bernoulli_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """O3: seeded Bernoulli row sample
    (``spark/common/export_to_excel.py:53-58``)."""
    return df.sample(fraction=fraction, seed=seed)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sample (``df.sampleBy``): each key in
    ``fractions`` is kept with its own probability, unlisted strata drop.

    The training-data rebalancing primitive (e.g. downsample boilerplate
    sources, keep all rare-language docs): one scan, no shuffle — each row
    flips its own seeded coin. Exact-count stratified sampling needs a
    per-stratum window/top-k instead; this is the scan-speed approximation
    that holds at 100 TB.
    """
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def paginate(
    df: DataFrame,
    order_by: list[Column],
    limit: int,
    offset: int = 0,
) -> DataFrame:
    """O4: deterministic ORDER BY … LIMIT n OFFSET m.

    ``order_by`` must be a total order (include a unique key) or pages can
    overlap between runs. Spark ≥3.4 supports ``offset`` natively; the plan
    is a global sort limited to ``offset+limit`` rows (TakeOrderedAndProject)
    — cheap even on a huge input because only the top slice is collected.

    Scale note: OFFSET pagination re-sorts the prefix per page; for deep
    pagination at 100 TB use keyset pagination instead
    (``WHERE key > last_seen ORDER BY key LIMIT n``), which pushes the
    predicate into the scan.
    """
    out = df.orderBy(*order_by)
    if offset:
        out = out.offset(offset)
    return out.limit(limit)


def keyset_page(
    df: DataFrame, key: Column, after: object | None, limit: int
) -> DataFrame:
    """Keyset (seek) pagination — the scalable alternative to OFFSET."""
    out = df if after is None else df.filter(key > after)
    return out.orderBy(key.asc()).limit(limit)
