"""Additional classic analytic shapes: fully-pushed scan-aggregate (Q6),
HAVING-filtered agg joined back to its inputs (Q18), distribution window
functions, and a small-table cartesian/theta self-join.

These widen the relational surface beyond the reference's own operator set
(SURVEY §2.4-2.7 notes the missing shapes) while staying oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
    "q6_revenue_delta",
    oracle=f"""
    SELECT {ssum_expr("(CAST(l_extendedprice AS DECIMAL(10,2)) * CAST(l_discount AS DECIMAL(3,2)))", 2)} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    operators=("A1", "P6", "tpch:q6"),
    doc="TPC-H Q6 shape: conjunctive range predicates + global aggregate. "
    "All four predicates push into the parquet scan (PushedFilters) and the "
    "projection narrows to 4 columns; at 100 TB this is a scan-bound query "
    "whose cost is bytes-read, so pushdown IS the optimization.",
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            xsum_expr(
                F.col("l_extendedprice").cast("decimal(10,2)")
                * F.col("l_discount").cast("decimal(3,2)"),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey, o.o_totalprice,
           ROUND(SUM(l.l_quantity), 1) AS total_qty
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 50
    """,
    operators=("A1", "J2", "j:semi", "agg:having", "A-ext:having", "O4", "tpch:q18"),
    doc="TPC-H Q18 shape: aggregate-derived key set (HAVING) semi-joins back "
    "to the fact + dims, re-aggregates, global top-k. The HAVING side "
    "reduces 60k lineitems to a few hundred hot orders before the join, so "
    "the key set broadcasts; at scale this is the 'find heavy entities then "
    "drill in' pattern that avoids joining the full fact to itself.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = read_testdata(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = read_testdata(spark, sf_dir, "customer").select("c_custkey", "c_name")
    hot = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 250)
        .select("l_orderkey")
    )
    joined = (
        li.join(F.broadcast(hot), "l_orderkey")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
    )
    return (
        joined.groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 1).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(50)
    )


@register(
    "window_ntile_quartiles",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           NTILE(4)  OVER w AS price_quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
    operators=("W2", "window:ntile", "window:percent_rank", "window:cume_dist"),
    doc="Distribution window functions the reference never uses but any "
    "analytics surface needs: ntile/percent_rank/cume_dist per priority "
    "partition with a total order (o_orderkey tie-break) for determinism. "
    "One shuffle on the partition key serves all three functions.",
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return (
        read_testdata(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.ntile(4).over(w).alias("price_quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
        )
    )


@register(
    "cross_join_nation_pairs",
    oracle="""
    SELECT a.n_name AS nation_a, b.n_name AS nation_b,
           (a.n_regionkey = b.n_regionkey) AS same_region
    FROM nation a CROSS JOIN nation b
    WHERE a.n_name < b.n_name
    """,
    operators=("j:cross", "j:theta", "P7"),
    doc="Cartesian product of a small dimension with a theta (inequality) "
    "predicate — the unordered-pairs shape used by pairwise similarity "
    "scoring. Spark plans BroadcastNestedLoopJoin; safe only because the "
    "build side is a dimension (25 rows) — at 100 TB the same shape over "
    "documents must go through LSH banding instead (see dedup_minhash_lsh).",
)
def cross_join_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_testdata(spark, sf_dir, "nation").select("n_name", "n_regionkey")
    a = nation.select(
        F.col("n_name").alias("nation_a"), F.col("n_regionkey").alias("_ra")
    )
    b = nation.select(
        F.col("n_name").alias("nation_b"), F.col("n_regionkey").alias("_rb")
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("nation_a") < F.col("nation_b"))
        .select(
            "nation_a",
            "nation_b",
            (F.col("_ra") == F.col("_rb")).alias("same_region"),
        )
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
    operators=("j:semi", "A1", "tpch:q4"),
    doc="TPC-H Q4 shape: EXISTS decorrelates to a LEFT SEMI join whose "
    "condition mixes the equi key with a cross-table inequality "
    "(l_shipdate > o_orderdate). The semi join emits each order at most "
    "once however many lines match — no post-join distinct, no fan-out "
    "through the aggregate.",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = read_testdata(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN {sdisc_price("l.l_extendedprice", "l.l_discount")}
                                  ELSE CAST(0 AS DECIMAL(15,4)) END) AS DOUBLE)
                 / CAST(SUM({sdisc_price("l.l_extendedprice", "l.l_discount")}) AS DOUBLE), 4)
             AS promo_revenue_pct,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
    operators=("J2", "A1", "A3", "tpch:q14"),
    doc="TPC-H Q14 shape: date-bounded fact scan joined to the part "
    "dimension, conditional-revenue ratio. The date filter pushes into "
    "the lineitem scan; part (small dim) broadcasts; the ratio is a "
    "single-pass conditional aggregate — no second scan for the "
    "denominator.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = read_testdata(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = xdisc_price()
    joined = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    )
    return joined.agg(
        F.round(
            100.0
            * F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast("decimal(15,4)")
                )
            ).cast("double")
            / F.sum(rev).cast("double"),
            4,
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {ssum_expr(sdisc_price("l.l_extendedprice", "l.l_discount"), 2)} AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    operators=("J2", "A1", "O4", "tpch:q10"),
    doc="TPC-H Q10 shape: lost-revenue ranking of customers with returned "
    "items — fact filter (l_returnflag pushed to the scan) → 4-table "
    "join (nation broadcast) → per-customer revenue → global top-20 "
    "(TakeOrderedAndProject, no full sort).",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_testdata(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    orders = read_testdata(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        read_testdata(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    nation = read_testdata(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(xsum_expr(xdisc_price(), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "scalar_null_functions",
    oracle="""
    SELECT s_suppkey,
           nullif(s_nationkey, 0) AS nation_or_null,
           greatest(s_acctbal, 0.0) AS bal_floor0,
           least(s_acctbal, 5000.0) AS bal_cap5k,
           coalesce(nullif(s_name, ''), 'unknown') AS name_or_default,
           (s_acctbal IS NOT NULL AND s_nationkey IS NOT NULL) AS fully_populated
    FROM supplier
    """,
    operators=("P8", "F-ext:nullif", "F-ext:greatest", "F-ext:least"),
    doc="Null-handling scalar surface: nullif sentinel-to-NULL recode, "
    "greatest/least clamping (both engines skip NULL arguments), "
    "coalesce defaulting, null-test predicates — the cleanup vocabulary "
    "for messy 100 TB inputs, all codegen expressions.",
)
def scalar_null_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = read_testdata(spark, sf_dir, "supplier")
    return sup.select(
        "s_suppkey",
        F.nullif(F.col("s_nationkey"), F.lit(0)).alias("nation_or_null"),
        F.greatest(F.col("s_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("s_acctbal"), F.lit(5000.0)).alias("bal_cap5k"),
        F.coalesce(F.nullif(F.col("s_name"), F.lit("")), F.lit("unknown")).alias(
            "name_or_default"
        ),
        (F.col("s_acctbal").isNotNull() & F.col("s_nationkey").isNotNull()).alias(
            "fully_populated"
        ),
    )
