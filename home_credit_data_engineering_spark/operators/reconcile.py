"""Cross-engine table reconciliation: order-insensitive fingerprints.

The migration story this engine exists for — "switch from the reference
and run every query you run today" — needs a way to PROVE a copied /
re-derived table is identical without collecting either side. A
fingerprint must therefore be:

- **order-insensitive** (engines return rows in different orders):
  per-row digests are combined with an addition, not a concatenation;
- **engine-portable**: the row digest is md5 over a canonical string
  encoding (sorted column names; each value length-prefixed and null
  tagged, so the encoding is injective even when values themselves
  contain separator or control bytes — web-text corpora legitimately
  do) — the same discipline the DuckDB oracle gate uses;
- **distributed**: one aggregate, partial combine, nothing leaves the
  cluster but a single row.

A fingerprint mismatch tells you THAT the tables differ, not where —
``operators/merge.py:snapshot_diff`` is the row-level companion
(inserted/deleted/changed rows keyed by id) once a mismatch needs
localizing.

Caveat: floating-point columns are rejected by default — engines format
doubles differently (``1.0E7`` vs ``10000000.0``), so a textual digest
over raw doubles is not portable. Round them into explicit decimals
first (``F.round(col, n).cast("decimal(38,6)")``) or pass
``allow_floats=True`` when both sides are known to be the same engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["table_fingerprint", "fingerprints_match", "snapshot_drift"]

#: Field separator between encoded values. Values are length-prefixed
#: (``V<len>:<value>``) and nulls tagged (``N``), so a value that itself
#: contains the separator — legal in web-text string columns — cannot
#: shift field boundaries: each field self-delimits and the encoding is
#: injective without any escaping pass over the data.
_SEP = "\x1f"


def _encode_value(c: str):
    v = F.col(c).cast("string")
    return F.when(v.isNull(), F.lit("N")).otherwise(
        F.concat(F.lit("V"), F.length(v).cast("string"), F.lit(":"), v)
    )


def table_fingerprint(
    df: DataFrame,
    cols: list[str] | None = None,
    allow_floats: bool = False,
) -> DataFrame:
    """One row: (n_rows, fingerprint) for ``df``.

    ``fingerprint`` is the decimal-string sum of each row's
    ``md5``-derived 60-bit integer (first 15 hex chars) — addition makes
    it independent of row order and partitioning; DECIMAL(38,0)
    accumulation cannot overflow below ~10²⁰ rows. Columns are taken in
    sorted-name order so both sides agree without coordination.
    """
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    use = sorted(cols if cols is not None else schema.keys())
    missing = [c for c in use if c not in schema]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    if not allow_floats:
        floaty = [c for c in use if schema[c] in ("float", "double")]
        if floaty:
            raise ValueError(
                f"float columns {floaty} have engine-specific string forms; "
                "round them into decimals first or pass allow_floats=True"
            )
    encoded = F.concat_ws(_SEP, *[_encode_value(c) for c in use])
    digest = F.conv(F.substring(F.md5(encoded), 1, 15), 16, 10).cast(
        "decimal(38,0)"
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum(digest), F.lit(0).cast("decimal(38,0)"))
        .cast("string")
        .alias("fingerprint"),
    )


def fingerprints_match(a: DataFrame, b: DataFrame) -> bool:
    """Convenience: compare two single-row fingerprint frames."""
    ra, rb = a.collect()[0], b.collect()[0]
    return (ra["n_rows"], ra["fingerprint"]) == (rb["n_rows"], rb["fingerprint"])


def snapshot_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Schema + profile drift between two snapshots of a table — the
    data-ops contract check run before promoting a new ingest (did a
    column vanish, change type, go null-heavy, or collapse in
    cardinality?).

    Output, long form: ``(column, metric, old_value, new_value,
    changed)`` with string-encoded values, covering

    - ``__table__/row_count`` — total rows per side,
    - per column (union of both schemas): ``present`` ('true'/'false'),
      ``dtype`` (Spark simpleString — metadata, no data pass),
      ``non_null`` and ``n_distinct`` exact counts (columns present on
      both sides only; a dropped/added column reports presence + dtype
      drift instead). String columns distinct-count their md5 digests —
      the multi-distinct expand shuffle must never carry raw text
      (plan-gated); md5 is collision-free in practice and the SQL twin
      digests identically, so the counts stay engine-exact.

    ``changed`` is a plain string inequality (NULL-safe: a metric
    missing on one side counts as changed).

    Scale: ONE aggregate pass per side computes every count metric
    (``count(col)`` + ``count_distinct(col)`` per column in a single
    ``agg`` — Spark plans the multi-distinct via expand, a constant
    factor over one scan, documented); schema metrics come from driver
    metadata, not data. The comparison frame is |columns|x|metrics| —
    grid-sized, broadcast-joined.
    """
    spark = old.sparkSession

    def _schema_rows(df: DataFrame) -> dict[str, str]:
        return {f.name: f.dataType.simpleString() for f in df.schema.fields}

    def _profile(df: DataFrame, cols: list[str]) -> DataFrame:
        # distinct counts over STRING columns digest first: the expand
        # shuffle behind multi-distinct would otherwise carry raw text
        # (plan-gated); md5 is injective in practice and the twin
        # mirrors the digest, so parity is exact
        types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        aggs = [F.count(F.lit(1)).alias("__rc")]
        for c in cols:
            key = F.md5(F.col(c)) if types[c] == "string" else F.col(c)
            aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
            aggs.append(F.count_distinct(key).alias(f"__nd_{c}"))
        agged = df.agg(*aggs)
        pairs = ["'__table__/row_count', cast(__rc as string)"]
        for c in cols:
            pairs.append(f"'{c}/non_null', cast(__nn_{c} as string)")
            pairs.append(f"'{c}/n_distinct', cast(__nd_{c} as string)")
        return agged.selectExpr(
            f"stack({len(pairs)}, {', '.join(pairs)}) as (k, v)"
        )

    old_types = _schema_rows(old)
    new_types = _schema_rows(new)
    all_cols = sorted(set(old_types) | set(new_types))
    common = [c for c in all_cols if c in old_types and c in new_types]
    meta_rows = []
    for c in all_cols:
        meta_rows.append(
            (f"{c}/present", str(c in old_types).lower(),
             str(c in new_types).lower())
        )
        meta_rows.append((f"{c}/dtype", old_types.get(c), new_types.get(c)))
    meta = spark.createDataFrame(
        meta_rows, schema="k string, old_value string, new_value string"
    )
    counts = (
        _profile(old, common)
        .withColumnRenamed("v", "old_value")
        .join(
            _profile(new, common).withColumnRenamed("v", "new_value"),
            "k",
            "full",
        )
    )
    both = meta.unionByName(counts)
    return both.select(
        F.split_part(F.col("k"), F.lit("/"), F.lit(1)).alias("column"),
        F.split_part(F.col("k"), F.lit("/"), F.lit(2)).alias("metric"),
        "old_value",
        "new_value",
        (
            ~(F.col("old_value").eqNullSafe(F.col("new_value")))
        ).alias("changed"),
    )
