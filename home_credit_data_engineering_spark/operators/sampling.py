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


def hash_bernoulli_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    seed: int = 42,
    buckets: int = 10000,
) -> DataFrame:
    """O3 (deterministic form): seeded Bernoulli sample by id hashing.

    Row kept iff ``md5('s<seed>:' || id)``'s first-32-bit bucket falls
    under ``fraction`` — same mechanism as :func:`hash_split`. Unlike
    :func:`bernoulli_sample` (engine RNG), membership is a pure projection:
    identical across engines, runs, partitionings, and appends, which is
    what makes it oracle-verifiable and the operationally safe sample at
    100 TB (a row's in/out never changes under re-execution).

    Granularity: membership is quantized to ``1/buckets`` — the keep
    threshold is ``round(buckets * fraction)`` whole buckets (Python
    banker's rounding), so fractions finer than ``1/buckets`` coarsen to
    the nearest bucket count (``fraction=0.00005`` with the default
    10 000 buckets keeps 0 or 1 bucket in 10 000, i.e. 0.or.1e-4 of
    rows). Raise ``buckets`` when you need finer-grained fractions.
    """
    from pyspark.sql import functions as F

    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(f"s{seed}:"), F.col(id_col).cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % buckets
    )
    return df.filter(bucket < int(round(buckets * fraction)))


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
    flips its own seeded coin. For exact per-stratum counts use
    :func:`stratified_exact_sample` (one window shuffle); this is the
    scan-speed approximation that holds at 100 TB.
    """
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def stratified_exact_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    n_per_stratum: int,
    seed: int = 42,
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen by a deterministic seeded hash order.

    Rank = ``row_number`` over ``md5('s<seed>:' || id)`` within the
    stratum (id as tie-break), keep rank ≤ n. Engine-independent and
    stable under repartitioning/re-runs like :func:`hash_bernoulli_sample`
    — the md5 order IS the random permutation, re-derivable anywhere. One
    shuffle on the stratum key; at 100 TB pre-filter with
    :func:`stratified_sample` at ~2-3x the target fraction first so the
    window sorts a sliver, not the full table.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(f"s{seed}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: list[tuple[str, float]],
    buckets: int = 10000,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by hashing the row id.

    Bucket = first 32 bits of ``md5(id)`` mod ``buckets``; cumulative
    weight ranges map buckets to split names. Unlike ``randomSplit`` this
    is a pure projection — reproducible across runs/engines/partitionings,
    stable under re-partitioning or appends (a row's split never changes),
    and free at any scale (no shuffle, no RNG state). The standard way to
    split a 100 TB corpus. 32 hash bits over ≤2^16 buckets keeps the
    modulo bias below ~2e-5 (16 bits would skew an 80/10/10 split by
    almost 2 points).
    """
    from pyspark.sql import functions as F

    total = sum(w for _, w in splits)
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % buckets
    )
    expr = None
    acc = 0.0
    for name, weight in splits:
        acc += weight
        bound = int(round(buckets * acc / total))
        cond = bucket < bound
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # floating rounding can leave the last bucket unbound — close it
    expr = expr.otherwise(splits[-1][0])
    return df.withColumn(out_col, expr)


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


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: k rows with
    inclusion probability increasing in weight (Efraimidis & Spirakis,
    "Weighted random sampling with a reservoir", IPL 2006 — the A-ES
    key trick), with the randomness derived from ``md5(seed:id)`` so
    the sample is a pure function of (data, seed): identical across
    engines, runs, partitionings, and appends, like every other sample
    in this module.

    Key: ``-ln(u) / w`` with ``u`` the id's first 52 md5 bits mapped
    into (0, 1] (52 bits so the int→double conversion is exact); the k
    SMALLEST keys win — algebraically the same order as A-ES's
    ``u^(1/w)`` top-k. Keys are rounded to 9 decimals before comparison
    (ties → smallest id) so a last-ulp ``ln`` difference between math
    libraries can never flip the selected SET — that is what keeps the
    operator exactly SQL-oracle-verifiable.

    Rows with weight <= 0 are excluded (zero-weight rows must be an
    explicit filter decision, not a sampling accident). Plan: one narrow
    projection + TakeOrderedAndProject — each partition keeps its own
    top-k candidates, the driver merges k rows; nothing else moves.

    Returns the sampled rows with their ``__sample_key`` dropped.
    """
    from pyspark.sql import functions as F

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = (
        F.col(weight_col) if isinstance(weight_col, str) else weight_col
    ).cast("double")
    raw = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"s{seed}:"), F.col(id_col).cast("string"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("double")
    u = (raw + F.lit(1.0)) / F.lit(float((1 << 52) + 1))  # (0, 1]
    key = F.round(-F.log(u) / w, 9)
    return (
        df.filter(w > 0)
        .withColumn("__sample_key", key)
        .orderBy(F.col("__sample_key").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("__sample_key")
    )


def weighted_sample_per_group(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    group_col: str,
    k: int,
    seed: int = 42,
    shards: int = 32,
) -> DataFrame:
    """Per-group :func:`weighted_sample`: k weighted draws per group —
    the per-source form mixture construction wants (k best-weighted
    documents from EACH source, deterministic under any partitioning).

    Same A-ES key; selection is a two-level top-k over METADATA ONLY:

    1. project ``(group, id, key)`` — the payload (document text) never
       enters any exchange;
    2. partial top-k per ``(group, md5-subshard)`` window — a
       billion-row source spreads over ``shards`` tasks instead of
       serializing onto one;
    3. final top-k per group over the surviving ``shards * k`` rows per
       group (tiny);
    4. LEFT SEMI join the k winning ids back to the full rows.

    Every shard's local top-k is a superset filter of the global
    per-group top-k (any globally-selected row is also in its own
    shard's top-k), so the result is bit-identical to the one-window
    form for every (data, seed, shards). The winners frame is
    ``groups * k`` ids — broadcastable for any realistic mixture; AQE
    picks broadcast automatically when it fits.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    w = (
        F.col(weight_col) if isinstance(weight_col, str) else weight_col
    ).cast("double")
    md5 = F.md5(F.concat(F.lit(f"s{seed}:"), F.col(id_col).cast("string")))
    raw = F.conv(F.substring(md5, 1, 13), 16, 10).cast("double")
    u = (raw + F.lit(1.0)) / F.lit(float((1 << 52) + 1))
    key = F.round(-F.log(u) / w, 9)
    # independent md5 bits (14..19) pick the subshard so the shard is
    # uncorrelated with the sampling key drawn from bits 1..13
    shard = F.conv(F.substring(md5, 14, 6), 16, 10).cast("bigint") % shards

    meta = (
        df.filter(w > 0)
        .select(
            F.col(group_col).alias("__g"),
            F.col(id_col).alias("__id"),
            key.alias("__sample_key"),
            shard.alias("__shard"),
        )
    )
    w1 = W.partitionBy("__g", "__shard").orderBy(
        F.col("__sample_key").asc(), F.col("__id").asc()
    )
    w2 = W.partitionBy("__g").orderBy(
        F.col("__sample_key").asc(), F.col("__id").asc()
    )
    winners = (
        meta.withColumn("__rk", F.row_number().over(w1))
        .filter(F.col("__rk") <= k)
        .withColumn("__rk2", F.row_number().over(w2))
        .filter(F.col("__rk2") <= k)
        .select("__g", "__id")
    )
    cond = (F.col(group_col) == F.col("__g")) & (
        F.col(id_col) == F.col("__id")
    )
    return df.join(winners, on=cond, how="left_semi")
