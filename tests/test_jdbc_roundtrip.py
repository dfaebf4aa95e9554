"""JDBC source/sink round-trip (S1/K3) against embedded Derby.

Derby ships with Spark (metastore dependency), so the JDBC path runs for
real: write a table over JDBC, read it back (plain and range-partitioned),
and check the partitioned read splits into the requested task count.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.sources.readers import read_jdbc, read_testdata
from home_credit_data_engineering_spark.sources.sinks import write_jdbc

DERBY_URL = "jdbc:derby:memory:hcde_test;create=true"
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def jdbc_table(spark, sf_dir):
    cust = read_testdata(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    write_jdbc(cust, DERBY_URL, "customer_dm", driver=DERBY_DRIVER)
    return cust


def test_jdbc_write_read_roundtrip(spark, jdbc_table):
    back = read_jdbc(spark, DERBY_URL, "customer_dm", driver=DERBY_DRIVER)
    assert back.count() == jdbc_table.count()
    a = {tuple(r) for r in jdbc_table.collect()}
    b = {tuple(r) for r in back.select("c_custkey", "c_name", "c_acctbal").collect()}
    assert a == b


def test_jdbc_partitioned_read_parallelizes(spark, jdbc_table):
    """The reference reads its whole source on ONE task
    (spark/bronze/feeder_postgres.py:68-77); the engine's partitioned read
    must split into numPartitions range-bounded tasks."""
    bounds = jdbc_table.agg(
        F.min("c_custkey").alias("lo"), F.max("c_custkey").alias("hi")
    ).collect()[0]
    back = read_jdbc(
        spark,
        DERBY_URL,
        "customer_dm",
        driver=DERBY_DRIVER,
        partition_column="c_custkey",
        lower_bound=int(bounds["lo"]),
        upper_bound=int(bounds["hi"]) + 1,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == jdbc_table.count()


def test_jdbc_overwrite_mode(spark, jdbc_table):
    smaller = jdbc_table.limit(10)
    write_jdbc(smaller, DERBY_URL, "customer_dm_small", driver=DERBY_DRIVER)
    write_jdbc(smaller, DERBY_URL, "customer_dm_small", driver=DERBY_DRIVER)
    back = read_jdbc(spark, DERBY_URL, "customer_dm_small", driver=DERBY_DRIVER)
    assert back.count() == 10  # overwrite, not append
