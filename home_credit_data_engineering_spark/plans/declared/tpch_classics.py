"""TPC-H-classic multi-join analytics: the deep join-tree shapes that
exercise Catalyst's join reordering, broadcast chains, and partial
aggregation across joins."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.plans.declared._stable import (
    sdisc_price,
    ssum_expr,
    xdisc_price,
    xsum_expr,
)
from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {ssum_expr(sdisc_price("l.l_extendedprice", "l.l_discount"), 2)} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    operators=("J2", "A1", "O4", "tpch:q3"),
    doc="TPC-H Q3 shape: selective filters on three tables → join → "
    "aggregate → global top-10. Filters push to all three scans; the "
    "customer side broadcasts after its filter.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        read_testdata(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        read_testdata(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        read_testdata(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    joined = (
        orders.join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(li, li["l_orderkey"] == orders["o_orderkey"])
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        xsum_expr(xdisc_price(), 2).alias("revenue")
    )
    return agg.select(
        "l_orderkey", "revenue", "o_orderdate", "o_orderpriority"
    ).orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc()).limit(10)


@register(
    "q5_region_revenue",
    oracle=f"""
    SELECT n.n_name,
           {ssum_expr(sdisc_price("l.l_extendedprice", "l.l_discount"), 2)} AS revenue,
           COUNT(*) AS n_lines
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
    operators=("J2", "A1", "tpch:q5"),
    doc="TPC-H Q5 shape: five-table snowflake join rolled up by nation. "
    "region/nation/customer broadcast up the chain; only the "
    "orders⋈lineitem edge shuffles.",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = (
        read_testdata(spark, sf_dir, "region")
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .select("r_regionkey")
    )
    nation = read_testdata(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    cust = read_testdata(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = read_testdata(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    dims = (
        cust.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation["n_regionkey"] == region["r_regionkey"],
                )
            ),
            cust["c_nationkey"] == nation["n_nationkey"],
        )
        .select("c_custkey", "n_name")
    )
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(dims), orders["o_custkey"] == dims["c_custkey"])
    )
    return joined.groupBy("n_name").agg(
        xsum_expr(xdisc_price(), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )
