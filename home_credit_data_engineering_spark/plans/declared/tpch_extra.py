"""TPC-H shapes Q7/Q13/Q19/Q22 — distinctive plan patterns the earlier
classics don't cover: a 5-way nation-pair join, an outer-join histogram
(two-level aggregation), disjunctive OR-of-ANDs predicate pushdown, and
a scalar-subquery threshold with an anti-join.

Predicates are adapted to the synthetic domains (brand/size/quantity as
generated; nation-pair filter generalized to all canonical pairs) — the
plan shapes, not the TPC-H constants, are the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.plans.declared._stable import savg, ssum, xavg, xsum
from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_testdata(spark, sf_dir, name)


@register(
    "q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE n1.n_name < n2.n_name) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    operators=("J2", "A1", "tpch:q7"),
    doc="TPC-H Q7 shape: 5-way join (fact → supplier/orders/customer → "
    "two broadcast nation dims) with a cross-dimension inequality "
    "(canonical nation pairs) and per-(pair, year) revenue rollup — the "
    "deepest join tree in the suite; CBO/AQE ordering territory.",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), on="s_nationkey")
        .join(F.broadcast(n2), on="c_nationkey")
        .filter(F.col("supp_nation") < F.col("cust_nation"))
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate"))
        .withColumn(
            "volume",
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (1 - F.col("l_discount").cast("decimal(18,2)")),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).cast("double").alias("revenue"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
    operators=("J1", "A1", "tpch:q13"),
    doc="TPC-H Q13 shape: outer join with a predicate INSIDE the join "
    "condition (customers keep their row even when every order is "
    "excluded), then a two-level aggregation — count per customer, "
    "histogram of counts. COUNT(col) vs COUNT(*) null semantics are "
    "load-bearing: unmatched customers must land in the c_count=0 bucket.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    joined = c.join(
        o,
        (c["c_custkey"] == o["o_custkey"])
        & (o["o_orderpriority"] != "1-URGENT"),
        how="left",
    )
    per_cust = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2)
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 5 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 10 AND l.l_quantity <= 40)
    """,
    operators=("P7", "J2", "A1", "tpch:q19"),
    doc="TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides. "
    "Catalyst factors the single-table conjuncts out of the disjunction "
    "(p_brand IN (...), quantity/size envelopes) and pushes them below "
    "the join — the classic disjunctive-pushdown test.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(p, li["l_partkey"] == p["p_partkey"])
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#2") & s.between(1, 25) & q.between(5, 30))
        | ((b == "Brand#3") & s.between(1, 35) & q.between(10, 40))
    )
    return joined.filter(cond).agg(
        F.round(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount").cast("decimal(18,2)"))
            ),
            2,
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q22_dormant_balances",
    oracle=f"""
    WITH avg_bal AS (
      SELECT {savg("c_acctbal", 6)} AS a FROM customer WHERE c_acctbal > 0)
    SELECT CAST(c_nationkey % 5 AS INTEGER) AS cntrycode,
           COUNT(*) AS numcust,
           {ssum("c_acctbal", 2)} AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
    operators=("J-ext:anti", "A1", "A6", "tpch:q22"),
    doc="TPC-H Q22 shape: global-average scalar threshold (1-row "
    "broadcast) + NOT EXISTS anti join (customers with no orders), "
    "grouped into country-code buckets (nationkey % 5 stands in for the "
    "phone prefix). The positive-balance/no-activity audit query.",
)
def q22_dormant_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.joins import anti_join

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    o_keys = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(xavg("c_acctbal", 6).alias("__avg_bal"))
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("__avg_bal")
    )
    dormant = anti_join(rich, o_keys, on="c_custkey")
    return (
        dormant.withColumn(
            "cntrycode", (F.col("c_nationkey") % 5).cast("int")
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            xsum("c_acctbal", 2).alias("totacctbal"),
        )
    )
