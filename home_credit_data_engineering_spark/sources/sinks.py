"""Sinks (SURVEY §2.2 operators K1-K5).

Spark-first equivalents of the reference's writers:

- K1 partitioned parquet (reference ``spark/bronze/feeder_csv.py:120-125``,
  ``spark/silver/processor.py:375-377``) — here with dynamic partition
  overwrite so re-running one snapshot replaces only that snapshot's
  partitions instead of truncating the whole dataset (required once many
  dates coexist at scale).
- K3 JDBC write (reference ``spark/gold/processor.py:301,313``) — batched.
- K4 bounded sample export (reference ``spark/common/export_to_excel.py:53-86``)
  — sample/limit *before* ``toPandas`` so the driver never materializes an
  unbounded result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    dynamic_overwrite: bool = True,
    target_files: int | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """K1/K2: (partitioned) parquet write.

    ``dynamic_overwrite`` scopes overwrites to the partitions present in
    ``df`` (Spark's ``partitionOverwriteMode=dynamic``) — the safe semantics
    for daily snapshot appends. ``target_files`` coalesces tiny outputs
    (the reference documents ``coalesce(1)`` advice in ``run.md:456``);
    leave ``None`` at scale and let AQE size the files.
    ``max_records_per_file`` caps file size from the other direction —
    splitting oversized task outputs so downstream scans parallelize
    (a 100 TB write wants both bounds).
    """
    writer = df.write.mode(mode)
    if target_files is not None:
        writer = df.coalesce(target_files).write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
        if mode == "overwrite" and dynamic_overwrite:
            writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet write: `repartitionByRange(cluster_by)` +
    `sortWithinPartitions(cluster_by)` before the write.

    Each output file then covers a disjoint range of the cluster key and
    every parquet row group carries tight min/max statistics, so a reader
    filtering on that key skips whole files/row-groups instead of scanning
    them — the poor-man's Z-ORDER, and the single biggest selective-read
    lever a plain-parquet 100 TB table has. The range exchange samples the
    key distribution, so skewed keys still land in balanced files.
    (One full shuffle at write time buys every future selective read.)
    """
    parts = [c for c in cluster_by]
    clustered = (
        df.repartitionByRange(num_files, *parts)
        if num_files is not None
        else df.repartitionByRange(*parts)
    )
    clustered.sortWithinPartitions(*parts).write.mode(mode).parquet(path)


def _zorder_buckets(
    df: DataFrame, zorder_by: list[str], bits: int, quantile: bool
) -> tuple[list[Column], DataFrame]:
    """Per-column bucket-id expressions in [0, 2^bits).

    Equi-width: pure expressions over a 1-row min/max aggregate.
    Quantile: approxQuantile boundaries applied via the ML Bucketizer
    (JVM-side binary search; appends __zb_<col> columns to df).
    """
    if quantile:
        from pyspark.ml.feature import Bucketizer

        bits = min(bits, 8)
        n_cells = 1 << bits
        probs = [i / n_cells for i in range(1, n_cells)]
        out_df = df
        exprs: list[Column] = []
        for c in zorder_by:
            qs = df.approxQuantile(c, probs, 0.001)
            splits = [float("-inf")]
            for q in qs:  # boundaries must strictly increase
                if q > splits[-1]:
                    splits.append(float(q))
            splits.append(float("inf"))
            if len(splits) < 3:  # (near-)constant column: single cell
                exprs.append(F.lit(0).cast("long"))
                continue
            out_df = Bucketizer(
                splits=splits,
                inputCol=c,
                outputCol=f"__zb_{c}",
                handleInvalid="keep",
            ).transform(out_df)
            exprs.append(F.col(f"__zb_{c}").cast("long"))
        return exprs, out_df

    bounds = df.agg(
        *[F.min(c).alias(f"__mn_{c}") for c in zorder_by],
        *[F.max(c).alias(f"__mx_{c}") for c in zorder_by],
    ).first()

    def bucket(c: str) -> Column:
        lo = float(bounds[f"__mn_{c}"])
        hi = float(bounds[f"__mx_{c}"])
        if hi <= lo:  # constant column: single cell
            return F.lit(0).cast("long")
        # width_bucket yields 1..2^bits (+boundary), clamp to [0, 2^bits-1]
        wb = F.width_bucket(
            F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(1 << bits)
        )
        return F.least(
            F.greatest(wb - 1, F.lit(0)).cast("long"), F.lit((1 << bits) - 1)
        )

    return [bucket(c) for c in zorder_by], df


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
    quantile: bool = False,
) -> None:
    """Z-order clustered parquet write: multi-column data skipping.

    :func:`write_clustered` gives perfect skipping on ONE key (disjoint
    ranges) but nothing on a second filter column. Z-ordering interleaves
    the bits of each column's bucket id into one key and range-clusters
    on THAT, so every file covers a small hyper-rectangle of the combined
    key space — selective reads on ANY of the z-ordered columns skip most
    files (each dimension's per-file span shrinks ~|files|^(1/k) for k
    columns instead of one column getting everything).

    Bucketing is equi-width over the observed min/max by default (one
    tiny aggregate at write time; ``2^bits`` cells per dimension).
    ``quantile=True`` switches to approxQuantile-derived boundaries
    applied with the ML ``Bucketizer`` (JVM binary search): skewed
    columns then fill cells evenly, which is what keeps per-file spans
    small when the data piles onto a hot range — at the cost of one
    quantile sketch pass per column and coarser cells (quantile mode
    caps at 2^8 cells/dim; more buys little for FILE-level skipping).
    The interleave expression is a balanced OR tree (shallow plan,
    codegen).
    """
    if not zorder_by:
        raise ValueError("zorder_by must name at least one column")
    k = len(zorder_by)
    eff_bits = min(bits, 8) if quantile else bits
    buckets, df = _zorder_buckets(df, zorder_by, eff_bits, quantile)
    terms = [
        F.shiftleft(
            F.shiftright(b, bit_idx).bitwiseAND(F.lit(1)), bit_idx * k + i
        )
        for i, b in enumerate(buckets)
        for bit_idx in range(eff_bits)
    ]
    while len(terms) > 1:  # balanced OR reduction
        terms = [
            terms[j].bitwiseOR(terms[j + 1]) if j + 1 < len(terms) else terms[j]
            for j in range(0, len(terms), 2)
        ]
    keyed = df.withColumn("__zkey", terms[0])
    clustered = (
        keyed.repartitionByRange(num_files, "__zkey")
        if num_files is not None
        else keyed.repartitionByRange("__zkey")
    )
    helper_cols = ["__zkey"] + [c for c in keyed.columns if c.startswith("__zb_")]
    (
        clustered.sortWithinPartitions("__zkey")
        .drop(*helper_cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    num_buckets: int,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-hash-partitioned storage on the join/agg
    key, so later joins and aggregations on ``bucket_by`` between
    co-bucketed tables plan WITHOUT a shuffle exchange.

    At 100 TB this is the difference between re-shuffling the fact table
    for every star join and shuffling it once at write time: bucket Gold by
    SK_ID_CURR and every per-client join/rollup afterwards is exchange-free
    (verified at the plan level in tests/test_bucketing.py). Requires a
    warehouse (managed table) — bucketing metadata lives in the catalog.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    mode: str = "overwrite",
    batch_size: int = 10_000,
) -> None:
    """K3: JDBC write (datamart publish)."""
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    if driver is not None:
        writer = writer.option("driver", driver)
    writer.save()


def to_pandas_sample(df: DataFrame, n: int = 1000, fraction: float | None = None, seed: int = 42):
    """K4: bounded driver-side sample (seeded, reproducible)."""
    sampled = df.sample(fraction=fraction, seed=seed) if fraction is not None else df
    return sampled.limit(n).toPandas()


def export_sample(
    df: DataFrame,
    path: str,
    n: int = 1000,
    fraction: float | None = None,
    seed: int = 42,
    fmt: str = "csv",
) -> str:
    """K4: bounded sample export for analysts (reference
    ``spark/common/export_to_excel.py:28-91``).

    Excel output requires openpyxl; when it is absent the export falls
    back to CSV at ``<path>.csv`` — explicit (warning + returned path
    changes), never silent — so the export leg still produces an artifact
    in environments without Excel support. Returns the written path.
    """
    pdf = to_pandas_sample(df, n=n, fraction=fraction, seed=seed)
    if fmt == "xlsx":
        try:
            import openpyxl  # noqa: F401
        except ImportError:
            import warnings

            fallback = f"{path}.csv"
            warnings.warn(
                f"openpyxl not installed; exporting CSV to {fallback} "
                "instead of xlsx",
                stacklevel=2,
            )
            pdf.to_csv(fallback, index=False)
            return fallback
        pdf.to_excel(path, index=False)
    elif fmt == "csv":
        pdf.to_csv(path, index=False)
    else:
        raise ValueError(f"unknown export format: {fmt}")
    return path


def preview(df: DataFrame, n: int = 20, truncate: bool = False) -> None:
    """K5: console sink (count/schema/show), reference
    ``spark/common/preview_data.py:16-22``."""
    df.printSchema()
    df.show(n, truncate=truncate)


def write_json(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "gzip",
) -> None:
    """K-ext: JSON-Lines write (compressed by default — raw JSONL is the
    most size-inefficient interchange format; gzip parts stay splittable
    across FILES, which partitioned writes provide).

    Lossless only for ints/strings/bools/arrays/structs; doubles
    round-trip via textual repr and timestamps via ISO strings — prefer
    parquet/ORC for typed analytics data, JSONL for interchange with
    text-pipeline tooling that expects it."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    dynamic_overwrite: bool = True,
) -> None:
    """K-ext: ORC write, same dynamic-overwrite semantics as
    :func:`write_parquet`."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
        if mode == "overwrite" and dynamic_overwrite:
            writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.orc(path)
