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


#: Numeric Spark simpleString types distribution_drift profiles.
_NUMERIC_TYPES = ("int", "bigint", "smallint", "tinyint", "double", "float")


def distribution_drift(
    old: DataFrame,
    new: DataFrame,
    columns: list[str] | None = None,
    n_bins: int = 10,
    accuracy: int = 10_000,
    psi_threshold: float = 0.2,
    ks_threshold: float = 0.1,
) -> DataFrame:
    """Numeric distribution-shift metrics between two snapshots — the
    leg :func:`snapshot_drift` cannot see (VERDICT r8 #6): a column can
    keep its row count, null rate, and cardinality while its VALUES
    drift. Emits the same long-form report schema ``(column, metric,
    old_value, new_value, changed)`` so the ``jobs/drift.py --fail-on``
    promotion gate consumes it unchanged (``--fail-on '*/psi'``).

    Per common numeric column (or ``columns``):

    - **psi** — Population Stability Index over ``n_bins`` quantile bins
      of the OLD side (the industry-standard banding; bin edges come
      from ONE ``percentile_approx`` GK-sketch aggregate — the engine's
      quantile state, mergeable and map-side combined). Fractions clamp
      at 1e-4 before the log so empty bins stay finite.
      ``changed = psi > psi_threshold`` (0.2 = the conventional
      "significant shift" bound; 0.1-0.2 is "monitor").
    - **ks** — the Kolmogorov-Smirnov statistic evaluated on the same
      quantile grid: max |CDF_old - CDF_new| over bin boundaries (a
      lower bound on the continuous KS, exact in the grid limit).
      ``changed = ks > ks_threshold``.

    ``old_value`` is the no-shift ideal '0'; ``new_value`` carries the
    measured statistic rounded at 6. A side with zero non-null rows
    reports NULL statistics and ``changed = (non-null counts differ)``.

    Scale: ONE 1-row quantile aggregate over the old side, then ONE
    aggregate pass per side computing every column's per-bin counts
    against broadcast literal edges (|cols| x n_bins conditional sums,
    map-side combined — the same single-pass discipline as
    :func:`snapshot_drift`); all PSI/KS arithmetic runs driver-side on
    the |cols| x n_bins grid.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if accuracy < 100:
        raise ValueError(f"accuracy must be >= 100, got {accuracy}")
    spark = old.sparkSession
    old_types = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    new_types = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    numeric = [
        c
        for c, t in old_types.items()
        if (t in _NUMERIC_TYPES or t.startswith("decimal"))
        and new_types.get(c) == t
    ]
    cols = [c for c in (columns or numeric) if c in numeric]
    if columns is not None and set(columns) - set(cols):
        missing = sorted(set(columns) - set(cols))
        raise ValueError(
            f"columns not numeric on both sides: {missing}"
        )
    empty = spark.createDataFrame(
        [],
        "column string, metric string, old_value string, "
        "new_value string, changed boolean",
    )
    if not cols:
        return empty

    qs = [i / n_bins for i in range(1, n_bins)]
    edge_row = old.agg(
        *[
            F.percentile_approx(
                F.col(c).cast("double"),
                F.array(*[F.lit(q) for q in qs]),
                accuracy,
            ).alias(c)
            for c in cols
        ]
    ).first()

    def _bin_counts(df: DataFrame) -> dict[str, list[int]]:
        aggs = []
        for c in cols:
            edges = edge_row[c] or []
            v = F.col(c).cast("double")
            bin_expr = F.lit(0)
            for e in edges:
                bin_expr = bin_expr + (v > F.lit(float(e))).cast("int")
            for i in range(len(edges) + 1):
                aggs.append(
                    F.sum(
                        (v.isNotNull() & (bin_expr == i)).cast("long")
                    ).alias(f"__{c}__{i}")
                )
        row = df.agg(*aggs).first()
        return {
            c: [
                int(row[f"__{c}__{i}"] or 0)
                for i in range(len(edge_row[c] or []) + 1)
            ]
            for c in cols
        }

    old_counts = _bin_counts(old)
    new_counts = _bin_counts(new)
    rows = []
    for c in cols:
        oc, nc = old_counts[c], new_counts[c]
        on, nn = sum(oc), sum(nc)
        if on == 0 or nn == 0:
            ch = on != nn
            rows.append((c, "psi", "0", None, ch))
            rows.append((c, "ks", "0", None, ch))
            continue
        import math

        psi = 0.0
        cum_o = cum_n = 0.0
        ks = 0.0
        for o, n in zip(oc, nc):
            p = max(o / on, 1e-4)
            q = max(n / nn, 1e-4)
            psi += (q - p) * math.log(q / p)
            cum_o += o / on
            cum_n += n / nn
            ks = max(ks, abs(cum_o - cum_n))
        rows.append(
            (c, "psi", "0", str(round(psi, 6)), psi > psi_threshold)
        )
        rows.append((c, "ks", "0", str(round(ks, 6)), ks > ks_threshold))
    return spark.createDataFrame(
        rows,
        "column string, metric string, old_value string, "
        "new_value string, changed boolean",
    )
