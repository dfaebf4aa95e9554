"""Batch source readers (SURVEY §2.1 operators S1-S6).

Spark-first equivalents of the reference's Bronze feeders:

- S1 JDBC scan — reference ``spark/bronze/feeder_postgres.py:68-77`` reads
  Postgres on a *single task* (no partitioning options). :func:`read_jdbc`
  exposes ``partition_column/num_partitions`` so the scan parallelizes.
- S2 CSV scan — reference ``spark/bronze/feeder_csv.py:95-100`` uses
  ``inferSchema`` (a full extra pass over the data, nondeterministic types).
  :func:`read_csv` takes a declared schema and falls back to inference only
  when explicitly asked.
- S3/S4 Parquet scans — the reference embeds partition values in paths
  (``spark/gold/processor.py:117-123``); :func:`read_snapshot` instead reads
  the base path and applies partition-column filters so Catalyst does the
  pruning (visible as ``PartitionFilters`` in the physical plan) and the
  SURVEY §3.4 multi-snapshot accumulation bug cannot occur.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from home_credit_data_engineering_spark.schema import TESTDATA_SCHEMAS


def read_parquet(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """S3: parquet scan, optionally projected to ``columns``.

    Explicit column selection keeps the read schema narrow at the scan
    (``ReadSchema`` in the plan) — at 100 TB a scan that materializes all
    columns for a 2-column projection is the first thing to fix.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    if columns:
        df = df.select(*columns)
    return df


def read_snapshot(
    spark: SparkSession,
    path: str,
    partition_filters: dict[str, object],
    schema: T.StructType | None = None,
) -> DataFrame:
    """S4: partition-pruned snapshot read.

    ``partition_filters`` maps partition column name → required value,
    e.g. ``{"year": 2026, "month": 2, "day": 6}`` or
    ``{"ingest_date": "2026-02-06"}``. Filters on partition columns compile
    to Catalyst partition pruning — identical I/O to the reference's manual
    path construction, without the correctness trap of unfiltered base-path
    reads (SURVEY §3.4).
    """
    # Keep partition-value types as written (string dates stay strings) —
    # set here as well for sessions not built by the engine factory.
    spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    df = read_parquet(spark, path, schema=schema)
    for col, value in partition_filters.items():
        df = df.filter(F.col(col) == F.lit(value))
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    infer_schema: bool = False,
) -> DataFrame:
    """S2: CSV scan with a declared schema (preferred) or inference."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
) -> DataFrame:
    """S1: JDBC scan, parallelized when partitioning bounds are given.

    The reference's single-task read is the scale bug to avoid: with
    ``partition_column`` (a numeric key like SK_ID_CURR) Spark issues
    ``num_partitions`` range-bounded queries concurrently.
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if driver is not None:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound, num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def from_rows(
    spark: SparkSession, rows: list, schema: T.StructType | list[str]
) -> DataFrame:
    """S5: local-data source (driver-side rows → DataFrame)."""
    return spark.createDataFrame(rows, schema)


def _parquet_ts_unit(path: str, column: str) -> str | None:
    """Time unit ('ns'/'us'/'ms') of a parquet timestamp column, from the
    file footer (metadata-only read; no data IO)."""
    try:
        import pyarrow.parquet as pq

        field = pq.read_schema(path).field(column)
        return getattr(field.type, "unit", None)
    except Exception:
        return None


def read_testdata(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one driver-generated synthetic table with its declared schema.

    ``events.ts`` has shipped with two different physical encodings across
    driver rounds, so the reader sniffs the footer and adapts:

    - TIMESTAMP(NANOS): Spark's reader rejects this as TimestampType; read
      as raw nanos (LongType + ``nanosAsLong``) and convert to microseconds
      with exact integer arithmetic (``ts div 1000`` — no double
      round-trip, which would lose precision above 2^53).
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): inferred as TimestampNTZ;
      cast to TimestampType (identity under the pinned UTC session zone).
    """
    schema = TESTDATA_SCHEMAS.get(table)
    path = f"{sf_dir}/{table}.parquet"
    if table == "events":
        if _parquet_ts_unit(path, "ts") == "ns":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = read_parquet(spark, path, schema=schema)
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # Micros variant: the DECLARED schema with ts swapped to
        # TimestampNTZ (matches TIMESTAMP(MICROS, isAdjustedToUTC=false)),
        # not inference — value/props keep their declared types, and a
        # driver round adding extra columns cannot break the select
        # (explicit read schemas simply don't scan undeclared columns).
        micros = T.StructType(
            [
                T.StructField(
                    f.name,
                    T.TimestampNTZType() if f.name == "ts" else f.dataType,
                    f.nullable,
                )
                for f in schema.fields
            ]
        )
        df = read_parquet(spark, path, schema=micros)
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return read_parquet(spark, path, schema=schema)


def testdata_tables(spark: SparkSession, sf_dir: str, *tables: str) -> dict[str, DataFrame]:
    """Load several testdata tables at once; returns name → DataFrame."""
    return {t: read_testdata(spark, sf_dir, t) for t in tables}


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    multiline: bool = False,
) -> DataFrame:
    """S2-ext: JSON-Lines scan with a declared schema (preferred).

    Without ``schema`` Spark infers by an extra pass over the data —
    acceptable for exploration, a full wasted scan at 100 TB, so
    production paths must pass the StructType. ``multiline=True`` reads
    whole-file JSON arrays/objects (NOT splittable — one task per file;
    keep it for small config-like inputs only).
    """
    reader = spark.read.option("multiLine", str(multiline).lower())
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """S3-ext: ORC scan — same pushdown/pruning posture as parquet
    (ORC footers carry min/max stats; Catalyst pushes filters and
    narrows ReadSchema identically)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.orc(path)
    if columns:
        df = df.select(*columns)
    return df


def read_text(
    spark: SparkSession,
    path: str,
    wholetext: bool = False,
    line_sep: str | None = None,
) -> DataFrame:
    """S2-ext: raw text scan → one ``value: string`` column (one row per
    line, or per file with ``wholetext=True`` — the ingestion shape for
    unstructured LLM corpora before any parsing)."""
    reader = spark.read
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    return reader.text(path, wholetext=wholetext)
