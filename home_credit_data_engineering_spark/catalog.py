"""Catalog registration: expose engine tables to the Spark SQL surface.

Re-expresses the reference's Hive-table registration
(``spark/common/register_hive_tables.py:61-91``: CREATE DATABASE + external
parquet tables) without requiring a Hive metastore: datasets register as
named views (temp views for session scope, or real catalog tables when a
warehouse is configured), so every engine table is queryable with
``spark.sql("SELECT … FROM silver.…")``.

SQL-surface parity matters for two reasons: it keeps every operator
SQL-expressible (oracle-friendly), and at scale it lets BI tools hit the
same plans via Thrift/Connect instead of a copied-out datamart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from home_credit_data_engineering_spark.sources.readers import read_parquet


def register_parquet_view(
    spark: SparkSession, name: str, path: str, replace: bool = True
) -> DataFrame:
    """Register a parquet dataset as a named temp view; returns the frame."""
    df = read_parquet(spark, path)
    if replace:
        df.createOrReplaceTempView(name)
    else:
        df.createTempView(name)
    return df


def register_layer(
    spark: SparkSession, tables: dict[str, str], prefix: str = ""
) -> dict[str, DataFrame]:
    """Register a whole layer ({table_name: path}) — e.g. every Silver
    output — mirroring register_hive_tables.py's loop over a database."""
    return {
        f"{prefix}{name}": register_parquet_view(spark, f"{prefix}{name}", path)
        for name, path in tables.items()
    }


def register_external_table(
    spark: SparkSession, name: str, path: str, database: str | None = None
) -> None:
    """Durable catalog registration (survives the session) — the direct
    equivalent of the reference's ``spark.catalog.createTable(name, path,
    source='parquet')``. Requires a configured warehouse/metastore."""
    if database is not None:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
        name = f"{database}.{name}"
    spark.catalog.createTable(name, path=path, source="parquet")


def register_testdata(spark: SparkSession, sf_dir: str, tables: tuple[str, ...]) -> None:
    """Register driver testdata tables as views for spark.sql queries."""
    from home_credit_data_engineering_spark.sources.readers import read_testdata

    for table in tables:
        read_testdata(spark, sf_dir, table).createOrReplaceTempView(table)


def analyze_table(
    spark: SparkSession, name: str, columns: list[str] | None = None
) -> None:
    """Collect catalog statistics for the cost-based optimizer.

    Row counts + total size always; per-column NDV/min/max/null-count
    histograms when ``columns`` is given. With ``spark.sql.cbo.enabled``
    (see ``session.DEFAULT_CONF``) these statistics drive join
    REORDERING and build-side selection beyond what AQE's runtime sizes
    can do — AQE only sees sizes of already-executed stages, while CBO
    reorders the logical join tree before execution. At 100 TB a wrong
    join order is the difference between shuffling the fact table once
    and three times; the write-time cost of ANALYZE is one scan.
    Catalog-table only (views carry no stats).
    """
    if columns:
        cols = ", ".join(columns)
        spark.sql(
            f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}"
        )
    else:
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")


def analyze_layer(
    spark: SparkSession, tables: dict[str, list[str] | None]
) -> None:
    """ANALYZE a whole layer: {table_name: key columns (or None)}."""
    for name, columns in tables.items():
        analyze_table(spark, name, columns)
