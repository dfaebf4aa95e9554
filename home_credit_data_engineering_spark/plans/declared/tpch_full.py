"""The remaining TPC-H shapes (Q2, Q8, Q9, Q11, Q12, Q15, Q16, Q17, Q20,
Q21) — with Q1/Q3-Q7/Q10/Q13/Q14/Q18/Q19/Q22 elsewhere, every TPC-H
query SHAPE is implemented and oracle-checked.

The synthetic schema has no partsupp/shipmode/commitdate columns, so
the affected queries substitute deterministic proxies (lineitem as the
part-supplier bridge, unit price = extendedprice/quantity, late =
shipped after order date, a modular denylist for Q16's complaints
filter). Plan shapes — correlated mins, market-share ratios, existence
chains, threshold HAVING against a global scalar — are preserved;
constants are not the point.

Money arithmetic follows the repo's decimal discipline: DECIMAL(18,2)
source casts, exact decimal sums, ROUND on the decimal, THEN the double
cast (double-rounding at half-cent boundaries diverges between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_testdata(spark, sf_dir, name)


#: Exact unit-price proxy (no partsupp.ps_supplycost in the schema).
# Per-row IEEE double division: bit-identical across engines (decimal
# division scale rules differ between Spark and DuckDB at the last ulp).
_UNIT_PRICE_SQL = "(l_extendedprice / l_quantity)"


def _unit_price() -> F.Column:
    return F.col("l_extendedprice") / F.col("l_quantity")


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    SELECT p_partkey, s_name, n_name, CAST(unit_price AS DOUBLE) AS unit_price
    FROM (
      SELECT l.l_partkey AS p_partkey, s.s_name, n.n_name,
             {_UNIT_PRICE_SQL} AS unit_price,
             ROW_NUMBER() OVER (
               PARTITION BY l.l_partkey
               ORDER BY {_UNIT_PRICE_SQL} ASC, s.s_suppkey ASC) AS rk
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE l.l_quantity > 0) t
    WHERE rk = 1 AND p_partkey < 200
    """,
    operators=("J2", "W1", "tpch:q2"),
    doc="TPC-H Q2 shape: minimum-cost supplier per part (correlated MIN "
    "decorrelated to a per-part window top-1 with a supplier tie-break), "
    "enriched through broadcast nation. Unit price proxies "
    "ps_supplycost; the id cap bounds the projection like Q2's LIMIT.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name"
    )
    joined = (
        li.select("l_partkey", "l_suppkey", _unit_price().alias("unit_price"))
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), on="s_nationkey")
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("unit_price").asc(), F.col("s_suppkey").asc()
    )
    return (
        joined.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") == 1) & (F.col("l_partkey") < 200))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "n_name",
            F.col("unit_price").cast("double").alias("unit_price"),
        )
    )


@register(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN n_name = 'Nation#01' THEN volume
                          ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / NULLIF(CAST(SUM(volume) AS DOUBLE), 0), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
             n.n_name
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey) t
    GROUP BY o_year
    """,
    operators=("J2", "A3", "tpch:q8"),
    doc="TPC-H Q8 shape: market share — one nation's fraction of total "
    "volume per order year, a conditional-sum ratio over a multi-join "
    "(the supplier-nation case term against the unconditional total).",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name"
    )
    volume = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), on="s_nationkey")
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "n_name",
        )
    )
    zero = F.lit("0.00").cast("decimal(18,2)")
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("n_name") == "Nation#01", F.col("volume")).otherwise(zero)
            ).cast("double")
            / F.nullif(F.sum("volume").cast("double"), F.lit(0.0)),
            6,
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT n_name AS nation, o_year, CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name,
             CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
             (CAST(l.l_extendedprice AS DECIMAL(10,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2))))
               - ((CAST(l.l_quantity AS DECIMAL(10,2))
                 * CAST(p.p_retailprice AS DECIMAL(10,2)))
                 * CAST(0.10 AS DECIMAL(3,2))) AS amount
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%1%') t
    GROUP BY n_name, o_year
    """,
    operators=("J2", "A1", "P7", "tpch:q9"),
    doc="TPC-H Q9 shape: product profit by supplier nation and year — "
    "5-way join with a LIKE filter on part name and a derived "
    "profit measure (10% of retail price proxies ps_supplycost).",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%1%")).select(
        "p_partkey", "p_retailprice"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name"
    )
    amount = (
        F.col("l_extendedprice").cast("decimal(10,2)")
        * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)"))
    ) - (
        (
            F.col("l_quantity").cast("decimal(10,2)")
            * F.col("p_retailprice").cast("decimal(10,2)")
        )
        * F.lit("0.10").cast("decimal(3,2)")
    )
    joined = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), on="s_nationkey")
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
    )
    return joined.groupBy("nation", "o_year").agg(
        F.round(F.sum("amount"), 2).cast("double").alias("sum_profit")
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH value_by AS (
      SELECT n.n_name, l.l_partkey,
             SUM(CAST(l.l_quantity AS DECIMAL(18,2))
                 * CAST(p.p_retailprice AS DECIMAL(18,2))) AS part_value
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY n.n_name, l.l_partkey),
    total AS (SELECT SUM(part_value) AS tv FROM value_by)
    SELECT n_name, l_partkey AS p_partkey,
           CAST(ROUND(part_value, 2) AS DOUBLE) AS part_value
    FROM value_by, total
    WHERE part_value > tv * 0.0005
    """,
    operators=("J2", "A1", "agg:having", "tpch:q11"),
    doc="TPC-H Q11 shape: per-(nation, part) inventory value filtered "
    "against a FRACTION OF THE GLOBAL TOTAL — the scalar-subquery HAVING "
    "(1-row broadcast of the total against every group).",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name"
    )
    value = F.col("l_quantity").cast("decimal(18,2)") * F.col(
        "p_retailprice"
    ).cast("decimal(18,2)")
    by = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), on="s_nationkey")
        .groupBy("n_name", "l_partkey")
        .agg(F.sum(value).alias("part_value"))
    )
    total = by.agg(F.sum("part_value").alias("tv"))
    return (
        by.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("tv") * 0.0005)
        .select(
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("part_value"), 2).cast("double").alias("part_value"),
        )
    )


@register(
    "q12_late_shipments",
    oracle="""
    SELECT l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    """,
    operators=("J1", "A1", "tpch:q12"),
    doc="TPC-H Q12 shape: late-shipment audit — join-side date comparison "
    "(shipped > 60 days after order; receipt/commit dates absent) with "
    "priority-class conditional counts per ship class (returnflag "
    "proxies shipmode).",
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag"
    )
    joined = o.join(li, o["o_orderkey"] == li["l_orderkey"]).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy(F.col("l_returnflag").alias("ship_class")).agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
      FROM lineitem GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(r.total_revenue, 2) AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    operators=("J1", "A1", "tpch:q15"),
    doc="TPC-H Q15 shape: top supplier by revenue view — per-supplier "
    "aggregate joined back against its own MAX (scalar subquery), "
    "keeping ties like the spec.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (1 - F.col("l_discount").cast("decimal(18,2)"))
        ).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s.join(revenue, s["s_suppkey"] == revenue["supplier_no"])
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue"), 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size <= 25
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_suppkey % 13 = 0)
    GROUP BY p.p_brand, p.p_size
    """,
    operators=("J2", "A-ext:count-distinct", "J-ext:anti", "tpch:q16"),
    doc="TPC-H Q16 shape: distinct suppliers per part attribute bucket, "
    "excluding a denylist via NOT IN (anti join; suppkey % 13 proxies "
    "the complaints filter). Lineitem is the part-supplier bridge "
    "(no partsupp table in the schema).",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 25).select(
        "p_partkey", "p_brand", "p_size"
    )
    denylist = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 13 == 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    from home_credit_data_engineering_spark.operators.joins import anti_join

    clean = anti_join(li, denylist, on="l_suppkey")
    return (
        clean.join(p, clean["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < a.half_avg_qty
    """,
    operators=("J3", "A1", "tpch:q17"),
    doc="TPC-H Q17 shape: small-quantity order revenue — the correlated "
    "per-part average decorrelates to an aggregate-then-join (each line "
    "compared against half its part's mean quantity).",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part_avg = li.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    joined = li.join(part_avg, on="l_partkey").filter(
        F.col("l_quantity") < F.col("half_avg_qty")
    )
    return joined.agg(
        (
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double")
            / 7.0
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q20_bulk_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE '%2%'
      GROUP BY l.l_suppkey
      HAVING SUM(l.l_quantity) > 400)
    """,
    operators=("j:semi", "agg:having", "tpch:q20"),
    doc="TPC-H Q20 shape: suppliers who moved bulk volume of a filtered "
    "part family — LIKE-filtered join, per-supplier HAVING threshold, "
    "then a semi join back to supplier (the IN chain decorrelated).",
)
def q20_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%2%")).select(
        "p_partkey"
    )
    bulk = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 400)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return s.join(bulk, on="s_suppkey", how="left_semi")


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH per_order AS (
      SELECT l.l_orderkey,
             COUNT(DISTINCT l.l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                                 THEN l.l_suppkey END) AS n_late_supp
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY l.l_orderkey),
    late_lines AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    SELECT s.s_name, COUNT(*) AS numwait
    FROM late_lines ll
    JOIN per_order po ON po.l_orderkey = ll.l_orderkey
    JOIN supplier s ON s.s_suppkey = ll.l_suppkey
    WHERE po.n_supp > 1 AND po.n_late_supp = 1
    GROUP BY s.s_name
    """,
    operators=("J2", "A1", "j:semi", "tpch:q21"),
    doc="TPC-H Q21 shape: suppliers who ALONE held up multi-supplier "
    "orders — the double correlated-existence (EXISTS another supplier, "
    "NOT EXISTS another late one) decorrelated into one per-order "
    "distinct-count aggregate joined against the late lines.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lo = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
    )
    late_lines = lo.filter(late).select("l_orderkey", "l_suppkey").distinct()
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        late_lines.join(per_order, on="l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(s, late_lines["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
