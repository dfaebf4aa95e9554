"""The medallion pipeline expressed on the driver's TPC-H-ish tables.

FIXTURES.md §B mapping: customer ≙ application clients, orders ≙ previous
applications / bureau credits, lineitem ≙ installments, events ≙ payment
timeline. These queries run the *actual* silver/gold shapes (guarded
ratios, zero-fills, segmentation thresholds, rounding) end-to-end with full
SQL oracles — the "a reference user could switch engines" proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.functions.scalar import case_chain
from home_credit_data_engineering_spark.operators.aggregates import (
    count_where,
    grouped_agg,
    guarded_ratio,
)
from home_credit_data_engineering_spark.operators.joins import star_join
from home_credit_data_engineering_spark.plans.declared._stable import savg, ssum, xavg, xsum
from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata


@register(
    "medallion_risk_profile",
    oracle=f"""
    WITH order_summary AS (
      SELECT o_custkey,
             COUNT(*) AS order_count,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
               AS finished_count,
             {ssum("o_totalprice", 2)} AS total_spend
      FROM orders GROUP BY o_custkey),
    line_summary AS (
      SELECT o.o_custkey,
             CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
               AS return_count,
             COUNT(*) AS line_count
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_custkey)
    SELECT c.c_custkey,
           ROUND(c.c_acctbal, 0) AS balance,
           COALESCE(o.order_count, 0) AS order_count,
           ROUND(CASE WHEN COALESCE(o.order_count, 0) > 0
                 THEN CAST(COALESCE(o.finished_count, 0) AS DOUBLE) / o.order_count
                 END, 3) AS finished_rate,
           ROUND(CASE WHEN COALESCE(l.line_count, 0) > 0
                 THEN CAST(COALESCE(l.return_count, 0) AS DOUBLE) / l.line_count
                 END, 3) AS return_rate,
           CASE WHEN COALESCE(CASE WHEN COALESCE(l.line_count, 0) > 0
                     THEN CAST(COALESCE(l.return_count, 0) AS DOUBLE) / l.line_count
                     END, 0) >= 0.5
                  OR COALESCE(o.order_count, 0) >= 15 THEN 'HIGH'
                WHEN COALESCE(CASE WHEN COALESCE(l.line_count, 0) > 0
                     THEN CAST(COALESCE(l.return_count, 0) AS DOUBLE) / l.line_count
                     END, 0) >= 0.2
                  OR COALESCE(o.order_count, 0) >= 5 THEN 'MEDIUM'
                ELSE 'LOW' END AS risk_segment
    FROM customer c
    LEFT JOIN order_summary o ON c.c_custkey = o.o_custkey
    LEFT JOIN line_summary l ON c.c_custkey = l.o_custkey
    """,
    operators=("J2", "A1", "A3", "P8", "P10", "gold"),
    doc="The gold_client_risk_profile shape end-to-end on TPC-H analogues: "
    "two Silver-style summaries -> left-join star -> zero-fill -> guarded "
    "ratios -> threshold segmentation -> rounding (reference "
    "spark/gold/processor.py:108-223 semantics).",
)
def medallion_risk_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_testdata(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    orders = read_testdata(spark, sf_dir, "orders")
    lineitem = read_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag"
    )

    order_summary = grouped_agg(
        orders,
        keys=["o_custkey"],
        measures={
            "order_count": F.count(F.lit(1)),
            "finished_count": count_where(F.col("o_orderstatus") == "F"),
            "total_spend": xsum("o_totalprice", 2),
        },
    ).withColumnRenamed("o_custkey", "c_custkey")

    line_summary = grouped_agg(
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            on=[F.col("l_orderkey") == F.col("o_orderkey")],
        ),
        keys=["o_custkey"],
        measures={
            "return_count": count_where(F.col("l_returnflag") == "R"),
            "line_count": F.count(F.lit(1)),
        },
    ).withColumnRenamed("o_custkey", "c_custkey")

    df = star_join(
        cust, [(order_summary, "c_custkey"), (line_summary, "c_custkey")], how="left"
    )
    order_count0 = F.coalesce(F.col("order_count"), F.lit(0))
    finished_rate = guarded_ratio(
        F.coalesce(F.col("finished_count"), F.lit(0)).cast("double"), order_count0
    )
    return_rate = guarded_ratio(
        F.coalesce(F.col("return_count"), F.lit(0)).cast("double"),
        F.coalesce(F.col("line_count"), F.lit(0)),
    )
    return_rate0 = F.coalesce(return_rate, F.lit(0))
    return df.select(
        "c_custkey",
        F.round("c_acctbal", 0).alias("balance"),
        order_count0.alias("order_count"),
        F.round(finished_rate, 3).alias("finished_rate"),
        F.round(return_rate, 3).alias("return_rate"),
        case_chain(
            [
                ((return_rate0 >= 0.5) | (order_count0 >= 15), "HIGH"),
                ((return_rate0 >= 0.2) | (order_count0 >= 5), "MEDIUM"),
            ],
            "LOW",
        ).alias("risk_segment"),
    )


@register(
    "medallion_portfolio_rollup",
    oracle=f"""
    WITH order_summary AS (
      SELECT o_custkey, COUNT(*) AS order_count,
             {ssum("o_totalprice", 2)} AS total_spend
      FROM orders GROUP BY o_custkey),
    profile AS (
      SELECT c.c_custkey,
             COALESCE(o.total_spend, 0.0) AS exposure,
             CASE WHEN COALESCE(o.order_count, 0) >= 15 THEN 'HIGH'
                  WHEN COALESCE(o.order_count, 0) >= 5 THEN 'MEDIUM'
                  ELSE 'LOW' END AS risk_segment
      FROM customer c LEFT JOIN order_summary o ON c.c_custkey = o.o_custkey)
    SELECT risk_segment,
           COUNT(*) AS client_count,
           {ssum("exposure", 0)} AS total_exposure,
           {savg("exposure", 0)} AS avg_exposure
    FROM profile
    GROUP BY risk_segment
    """,
    operators=("A6", "gold"),
    doc="The gold_portfolio_risk rollup shape (reference "
    "spark/gold/processor.py:226-271): segment profile -> 3-row rollup "
    "with presentation rounding.",
)
def medallion_portfolio_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_testdata(spark, sf_dir, "customer").select("c_custkey")
    orders = read_testdata(spark, sf_dir, "orders")
    summary = grouped_agg(
        orders,
        keys=["o_custkey"],
        measures={
            "order_count": F.count(F.lit(1)),
            "total_spend": xsum("o_totalprice", 2),
        },
    ).withColumnRenamed("o_custkey", "c_custkey")
    profile = star_join(cust, [(summary, "c_custkey")], how="left").select(
        "c_custkey",
        F.coalesce(F.col("total_spend"), F.lit(0.0)).alias("exposure"),
        case_chain(
            [
                (F.coalesce(F.col("order_count"), F.lit(0)) >= 15, "HIGH"),
                (F.coalesce(F.col("order_count"), F.lit(0)) >= 5, "MEDIUM"),
            ],
            "LOW",
        ).alias("risk_segment"),
    )
    out = grouped_agg(
        profile,
        keys=["risk_segment"],
        measures={
            "client_count": F.count(F.lit(1)),
            "total_exposure": xsum("exposure", 0),
            "avg_exposure": xavg("exposure", 0),
        },
    )
    return out
