"""Bronze layer: raw ingestion with lineage columns.

Re-expresses the reference's feeders (``spark/bronze/feeder_csv.py:108-125``,
``spark/bronze/feeder_postgres.py:85-105``): source read → add
``ingest_date``/``source_system`` lineage → partitioned parquet write.

Differences from the reference (deliberate, SURVEY §3.1/§3.4):

- No eager ``count()`` before the write (the reference scans every source
  twice); callers that want row counts read them from the write's metrics
  or count the Bronze output.
- Downstream reads are always partition-filtered (:func:`read_bronze_snapshot`)
  so re-ingesting on a new date can never multiply Silver inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from home_credit_data_engineering_spark.sources.readers import (
    read_csv,
    read_jdbc,
    read_snapshot,
)
from home_credit_data_engineering_spark.sources.sinks import write_parquet


def with_lineage(df: DataFrame, ingest_date: str, source_system: str) -> DataFrame:
    """Add the two Bronze lineage columns."""
    return df.withColumns(
        {
            "ingest_date": F.lit(ingest_date),
            "source_system": F.lit(source_system),
        }
    )


def ingest_dataframe(
    df: DataFrame, out_path: str, ingest_date: str, source_system: str
) -> None:
    """Lineage + overwrite-by-partition parquet write (operator K1)."""
    bronze = with_lineage(df, ingest_date, source_system)
    write_parquet(bronze, out_path, partition_by=["ingest_date"])


def ingest_csv(
    spark: SparkSession,
    csv_path: str,
    out_path: str,
    ingest_date: str,
    schema: T.StructType | None = None,
) -> None:
    """S2→K1: CSV feeder (reference feeder_csv.py main flow)."""
    ingest_dataframe(
        read_csv(spark, csv_path, schema=schema, infer_schema=schema is None),
        out_path,
        ingest_date,
        source_system="csv",
    )


def ingest_jdbc(
    spark: SparkSession,
    out_path: str,
    ingest_date: str,
    **jdbc_options,
) -> None:
    """S1→K1: JDBC feeder (reference feeder_postgres.py main flow),
    parallelized via the partition options in :func:`read_jdbc`."""
    ingest_dataframe(
        read_jdbc(spark, **jdbc_options), out_path, ingest_date, source_system="postgres"
    )


def read_bronze_snapshot(
    spark: SparkSession, path: str, ingest_date: str, schema: T.StructType | None = None
) -> DataFrame:
    """Partition-pruned Bronze read for exactly one snapshot — the SURVEY
    §3.4 fix (the reference reads the base dir unfiltered and multiplies
    rows across re-ingestions)."""
    return read_snapshot(spark, path, {"ingest_date": ingest_date}, schema=schema)
