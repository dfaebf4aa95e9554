"""Source connectors (SURVEY §2.1: S1-S6)."""

from home_credit_data_engineering_spark.sources.readers import (
    read_csv,
    read_jdbc,
    read_parquet,
    read_snapshot,
    read_testdata,
    testdata_tables,
)

__all__ = [
    "read_csv",
    "read_jdbc",
    "read_parquet",
    "read_snapshot",
    "read_testdata",
    "testdata_tables",
]
