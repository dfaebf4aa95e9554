"""Core relational declared queries (SURVEY §2.3-§2.9 inventory).

Each query certifies one or more SURVEY §2 operator rows on the driver's
TPC-H-ish tables, with an ANSI-SQL DuckDB oracle. The table mapping follows
FIXTURES.md §B: lineitem/orders stand in for bureau_balance/bureau,
customer for application clients, events for the payment timeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.functions.scalar import case_chain, recode
from home_credit_data_engineering_spark.operators.aggregates import (
    count_where,
    distinct_keys,
    grouped_agg,
    guarded_ratio,
    pivot_count,
    rollup_agg,
)
from home_credit_data_engineering_spark.operators.joins import (
    anti_join,
    equi_join,
    range_join,
    semi_join,
    star_join,
)
from home_credit_data_engineering_spark.operators.quality import Rule, combined_predicate
from home_credit_data_engineering_spark.operators.sampling import paginate
from home_credit_data_engineering_spark.operators.setops import union_by_name
from home_credit_data_engineering_spark.operators.windows import (
    latest_per_key,
    latest_per_key_agg,
    running_agg,
    sequence_number,
    top_k_per_key,
    with_lag_lead,
    with_rank,
)
from home_credit_data_engineering_spark.plans.declared._stable import (
    savg,
    sdisc_price,
    sone_plus_tax,
    ssum,
    ssum_expr,
    xavg,
    xdisc_price,
    xone_plus_tax,
    xsum,
    xsum_expr,
)

_DISC_PRICE_SQL = sdisc_price()
_CHARGE_SQL = f"({_DISC_PRICE_SQL} * {sone_plus_tax()})"
from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_testdata(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# W1/W2 — windows
# ---------------------------------------------------------------------------


@register(
    "w1_latest_per_key",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
    FROM (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate,
             ROW_NUMBER() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_shipdate DESC, l_linenumber DESC,
                        l_extendedprice DESC, l_quantity DESC) AS rn
      FROM lineitem) t
    WHERE rn = 1
    """,
    operators=("W1", "O1", "S3"),
    doc="Latest lineitem per order (the bureau_balance latest-month shape, "
    "reference spark/silver/processor.py:286-293) with a total order.",
)
def w1_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"
    )
    # Aggregation form of W1 (max_by over a total-order struct): same rows
    # as the window form, ~2.6x faster (map-side combine, no sort).
    return latest_per_key_agg(
        li,
        keys=["l_orderkey"],
        order_cols=["l_shipdate", "l_linenumber", "l_extendedprice", "l_quantity"],
        payload_cols=["l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"],
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")


@register(
    "w2_sequence_number",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER) AS seq
    FROM events
    """,
    operators=("W2",),
    doc="Per-user event timeline numbering (payment_sequence shape, "
    "reference spark/silver/processor.py:449-454).",
)
def w2_sequence_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return sequence_number(
        ev, keys=["user_id"], order_by=[F.col("ts").asc(), F.col("event_id").asc()]
    )


@register(
    "window_rank_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           CAST(RANK() OVER w_val AS INTEGER) AS value_rank,
           LAG(value, 1) OVER w_ts AS value_lag,
           LEAD(value, 1) OVER w_ts AS value_lead
    FROM events
    WINDOW w_val AS (PARTITION BY user_id ORDER BY value DESC, event_id),
           w_ts  AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    operators=("W-ext:rank", "W-ext:lag/lead"),
    doc="Analytic window surface beyond the reference (SURVEY §2.6 notes).",
)
def window_rank_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value", "ts")
    ranked = with_rank(
        ev,
        keys=["user_id"],
        order_by=[F.col("value").desc(), F.col("event_id").asc()],
        method="rank",
        out_col="value_rank",
    )
    out = with_lag_lead(
        ranked,
        keys=["user_id"],
        order_by=[F.col("ts").asc(), F.col("event_id").asc()],
        col="value",
    )
    return out.select("event_id", "user_id", "value", "value_rank", "value_lag", "value_lead")


@register(
    "window_running_frame",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum,
           ROUND(AVG(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
    FROM events
    """,
    operators=("W-ext:frames",),
    doc="Frame-bounded running aggregates (rowsBetween).",
)
def window_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    out = running_agg(
        ev, keys=["user_id"], order_by=order, measures={"running_sum": F.sum("value")}
    )
    out = running_agg(
        out,
        keys=["user_id"],
        order_by=order,
        measures={"moving_avg3": F.avg("value")},
        frame=(-2, 0),
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("running_sum", 4).alias("running_sum"),
        F.round("moving_avg3", 4).alias("moving_avg3"),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders) t
    WHERE rk <= 3
    """,
    operators=("O1", "W1"),
    doc="Top-3 orders by price per customer — the scalable top-k shape "
    "(no global sort).",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return top_k_per_key(
        orders,
        keys=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )


# ---------------------------------------------------------------------------
# A1-A7 — aggregations
# ---------------------------------------------------------------------------


@register(
    "a1_multi_measure_agg",
    oracle="""
    SELECT l_orderkey,
           COUNT(*) AS line_count,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
             AS return_count,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           MAX(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_orderkey
    """,
    operators=("A1", "A8"),
    doc="Multi-measure hash aggregate with conditional count (bureau_summary "
    "shape, reference spark/silver/processor.py:336-347).",
)
def a1_multi_measure_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return grouped_agg(
        li,
        keys=["l_orderkey"],
        measures={
            "line_count": F.count(F.lit(1)),
            "return_count": count_where(F.col("l_returnflag") == "R"),
            "sum_qty": F.round(F.sum("l_quantity"), 4),
            "max_price": F.max("l_extendedprice"),
        },
    )


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {ssum("l_quantity", 2, "DECIMAL(10,2)")} AS sum_qty,
           {ssum("l_extendedprice", 2, "DECIMAL(12,2)")} AS sum_base_price,
           {ssum_expr(_DISC_PRICE_SQL, 2)} AS sum_disc_price,
           {ssum_expr(_CHARGE_SQL, 2)} AS sum_charge,
           {savg("l_quantity", 4, "DECIMAL(10,2)")} AS avg_qty,
           {savg("l_extendedprice", 4, "DECIMAL(12,2)")} AS avg_price,
           {savg("l_discount", 6, "DECIMAL(3,2)")} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    operators=("A1", "A2", "P6", "S3"),
    doc="TPC-H Q1-shaped pricing summary: filtered scan → 8-measure "
    "partial+final hash aggregate.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp")
    )
    disc_price = xdisc_price()
    return grouped_agg(
        li,
        keys=["l_returnflag", "l_linestatus"],
        measures={
            "sum_qty": xsum("l_quantity", 2, "decimal(10,2)"),
            "sum_base_price": xsum("l_extendedprice", 2, "decimal(12,2)"),
            "sum_disc_price": xsum_expr(disc_price, 2),
            "sum_charge": xsum_expr(disc_price * xone_plus_tax(), 2),
            "avg_qty": xavg("l_quantity", 4, "decimal(10,2)"),
            "avg_price": xavg("l_extendedprice", 4, "decimal(12,2)"),
            "avg_disc": xavg("l_discount", 6, "decimal(3,2)"),
            "count_order": F.count(F.lit(1)),
        },
    )


@register(
    "a3_guarded_ratio",
    oracle="""
    SELECT user_id,
           COUNT(*) AS event_count,
           ROUND(CASE WHEN CAST(SUM(CASE WHEN event_type = 'click'
                                 THEN CAST(value AS DECIMAL(28,6))
                                 ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) > 0
                 THEN CAST(SUM(CASE WHEN event_type = 'purchase'
                               THEN CAST(value AS DECIMAL(28,6))
                               ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
                      / CAST(SUM(CASE WHEN event_type = 'click'
                                 THEN CAST(value AS DECIMAL(28,6))
                                 ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
                 END, 4) AS purchase_per_click,
           ROUND(CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS error_rate
    FROM events
    GROUP BY user_id
    """,
    operators=("A3", "P8"),
    doc="Aggregate + guarded-division derived ratio (payment_ratio shape, "
    "reference spark/silver/processor.py:481-487).",
)
def a3_guarded_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    dec = "decimal(28,6)"
    click_sum = F.sum(
        F.when(F.col("event_type") == "click", F.col("value").cast(dec)).otherwise(
            F.lit(0).cast(dec)
        )
    ).cast("double")
    purchase_sum = F.sum(
        F.when(F.col("event_type") == "purchase", F.col("value").cast(dec)).otherwise(
            F.lit(0).cast(dec)
        )
    ).cast("double")
    n = F.count(F.lit(1))
    return grouped_agg(
        ev,
        keys=["user_id"],
        measures={
            "event_count": n,
            "purchase_per_click": F.round(guarded_ratio(purchase_sum, click_sum), 4),
            "error_rate": F.round(
                count_where(F.col("event_type") == "error").cast("double") / n, 6
            ),
        },
    )


@register(
    "a5_pivot_status_counts",
    oracle="""
    SELECT o_custkey,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
             AS status_f_count,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
             AS status_o_count,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT)
             AS status_p_count
    FROM orders
    GROUP BY o_custkey
    """,
    operators=("A5", "P5"),
    doc="Pivoted per-key status counts with an explicit value domain "
    "(prev_status_* shape, reference spark/silver/processor.py:623-635).",
)
def a5_pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    out = pivot_count(
        orders,
        keys=["o_custkey"],
        pivot_col="o_orderstatus",
        values=["F", "O", "P"],
        prefix="status_",
    )
    return out.select(
        "o_custkey",
        F.col("status_f").alias("status_f_count"),
        F.col("status_o").alias("status_o_count"),
        F.col("status_p").alias("status_p_count"),
    )


@register(
    "a6_global_rollup",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           {ssum("c_acctbal", 2)} AS total_balance,
           {savg("c_acctbal", 4)} AS avg_balance
    FROM customer
    GROUP BY c_mktsegment
    """,
    operators=("A6",),
    doc="Low-cardinality global rollup (portfolio_risk shape, reference "
    "spark/gold/processor.py:242-250).",
)
def a6_global_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return grouped_agg(
        cust,
        keys=["c_mktsegment"],
        measures={
            "n_customers": F.count(F.lit(1)),
            "total_balance": xsum("c_acctbal", 2),
            "avg_balance": xavg("c_acctbal", 4),
        },
    )


@register(
    "a7_distinct_keys",
    oracle="SELECT DISTINCT o_custkey, o_orderstatus FROM orders",
    operators=("A7",),
    doc="Distinct key projection (reference spark/silver/processor.py:643-645).",
)
def a7_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return distinct_keys(_t(spark, sf_dir, "orders"), "o_custkey", "o_orderstatus")


@register(
    "rollup_hierarchy",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {ssum("o_totalprice", 2)} AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    operators=("A-ext:rollup",),
    doc="Hierarchical ROLLUP grouping sets (engine extension; SURVEY §2.5 "
    "'not present' list).",
)
def rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rollup_agg(
        _t(spark, sf_dir, "orders"),
        keys=["o_orderstatus", "o_orderpriority"],
        measures={
            "n_orders": F.count(F.lit(1)),
            "total_price": xsum("o_totalprice", 2),
        },
    )


@register(
    "approx_distinct",
    # Verdict certificate: the HLL++ sketch value is engine-specific,
    # but its error CONTRACT is not — the exact distinct count rides
    # along (hash-checked against the oracle) and the sketch must land
    # within 15% of it (3x Spark's default 5% rsd; flips on a dead or
    # mis-merged sketch, never on normal HLL variance).
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS approx_ok
    FROM orders GROUP BY o_orderstatus
    """,
    operators=("A-ext:approx",),
    doc="approx_count_distinct sketch per segment (HLL++; scale path "
    "for COUNT(DISTINCT) at 100 TB — sketches combine map-side, so the "
    "shuffle carries one bounded sketch per group instead of every "
    "value). Certified against the exact per-segment distinct count "
    "computed alongside: relative error <= 0.15.",
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").alias("__approx"),
        F.countDistinct("o_custkey").alias("exact_customers"),
    ).select(
        "o_orderstatus",
        "exact_customers",
        (
            F.abs(F.col("__approx") - F.col("exact_customers"))
            <= F.lit(0.15) * F.col("exact_customers")
        ).alias("approx_ok"),
    )


@register(
    "decimal_exact_sum",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_exact
    FROM orders
    GROUP BY o_orderstatus
    """,
    operators=("A1", "P-ext:cast"),
    doc="Decimal-discipline sum: cast to DECIMAL(18,2) before aggregation "
    "for exact arithmetic (SURVEY §1.2 decimal(38,18) semantics; §7.4.1).",
)
def decimal_exact_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return grouped_agg(
        orders,
        keys=["o_orderstatus"],
        measures={
            "total_exact": F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                "double"
            )
        },
    )


# ---------------------------------------------------------------------------
# P6-P10 — filters, predicates, conditional mapping
# ---------------------------------------------------------------------------

def lineitem_rules() -> list[Rule]:
    """Validation rules for lineitem — the analogue of the reference's 7
    application rules (``spark/silver/processor.py:127-145``). Built lazily:
    Column expressions need an active SparkContext."""
    return [
        Rule("positive_quantity", F.col("l_quantity") > 0),
        Rule("positive_price", F.col("l_extendedprice") > 0),
        Rule("discount_in_range", (F.col("l_discount") >= 0) & (F.col("l_discount") <= 1)),
        Rule("shipdate_present", F.col("l_shipdate").isNotNull()),
        Rule("valid_returnflag", F.col("l_returnflag").isin("A", "N", "R")),
    ]


@register(
    "p6_validation_filter",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS valid_rows,
           {ssum("l_extendedprice", 2)} AS valid_revenue
    FROM lineitem
    WHERE l_quantity > 0 AND l_extendedprice > 0
      AND l_discount >= 0 AND l_discount <= 1
      AND l_shipdate IS NOT NULL
      AND l_returnflag IN ('A', 'N', 'R')
    GROUP BY l_returnflag
    """,
    operators=("P6", "P7"),
    doc="ANDed validation-rule filter then aggregate (reference "
    "spark/silver/processor.py:127-168). Predicates push to the scan.",
)
def p6_validation_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(combined_predicate(lineitem_rules()))
    return grouped_agg(
        li,
        keys=["l_returnflag"],
        measures={
            "valid_rows": F.count(F.lit(1)),
            "valid_revenue": xsum("l_extendedprice", 2),
        },
    )


@register(
    "p9_p10_recode_segment",
    oracle=f"""
    SELECT CASE o_orderstatus WHEN 'F' THEN 'FINISHED' WHEN 'O' THEN 'OPEN'
                ELSE o_orderstatus END AS status_name,
           CASE WHEN o_totalprice >= 300000 THEN 'HIGH'
                WHEN o_totalprice >= 150000 THEN 'MEDIUM'
                ELSE 'LOW' END AS price_band,
           COUNT(*) AS n_orders,
           {savg("o_totalprice", 4)} AS avg_price
    FROM orders
    GROUP BY 1, 2
    """,
    operators=("P9", "P10"),
    doc="Value recode + 3-way CASE segmentation (XNA→Unknown and "
    "HIGH/MEDIUM/LOW shapes, reference spark/silver/processor.py:116-122, "
    "spark/gold/processor.py:185-200).",
)
def p9_p10_recode_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").withColumns(
        {
            "status_name": recode(
                "o_orderstatus", {"F": "FINISHED", "O": "OPEN"}
            ),
            "price_band": case_chain(
                [
                    (F.col("o_totalprice") >= 300000, "HIGH"),
                    (F.col("o_totalprice") >= 150000, "MEDIUM"),
                ],
                "LOW",
            ),
        }
    )
    return grouped_agg(
        orders,
        keys=["status_name", "price_band"],
        measures={
            "n_orders": F.count(F.lit(1)),
            "avg_price": xavg("o_totalprice", 4),
        },
    )


# ---------------------------------------------------------------------------
# J1-J3 — joins
# ---------------------------------------------------------------------------


@register(
    "j1_left_join_latest",
    oracle="""
    SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice,
           t.l_shipdate AS last_shipdate, t.l_extendedprice AS last_price
    FROM orders o
    LEFT JOIN (
      SELECT l_orderkey, l_shipdate, l_extendedprice
      FROM (
        SELECT l_orderkey, l_shipdate, l_extendedprice,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                 ORDER BY l_shipdate DESC, l_linenumber DESC,
                          l_extendedprice DESC) AS rn
        FROM lineitem) x
      WHERE rn = 1) t
    ON o.o_orderkey = t.l_orderkey
    """,
    operators=("J1", "W1"),
    doc="Enrichment left join against a latest-per-key derivation (bureau ⟕ "
    "latest bureau_balance, reference spark/silver/processor.py:309-313).",
)
def j1_left_join_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    latest = latest_per_key_agg(
        _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_shipdate", "l_extendedprice", "l_linenumber"
        ),
        keys=["l_orderkey"],
        order_cols=["l_shipdate", "l_linenumber", "l_extendedprice"],
        payload_cols=["l_shipdate", "l_extendedprice"],
    ).select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_shipdate").alias("last_shipdate"),
        F.col("l_extendedprice").alias("last_price"),
    )
    return equi_join(orders, latest, on="o_orderkey", how="left")


@register(
    "j2_star_assembly",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           COALESCE(o.order_count, 0) AS order_count,
           COALESCE(o.total_spend, 0.0) AS total_spend,
           CASE WHEN COALESCE(o.total_spend, 0.0) >= 3000000 THEN 'HIGH'
                WHEN COALESCE(o.total_spend, 0.0) >= 1500000 THEN 'MEDIUM'
                ELSE 'LOW' END AS spend_band
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS order_count,
             {ssum("o_totalprice", 2)} AS total_spend
      FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    operators=("J2", "J3", "P8", "P10", "A1"),
    doc="Star fan-in: fact ⟕ per-key aggregate ⟕ broadcast dimension, with "
    "null-fill and segmentation (gold_client_risk_profile shape, reference "
    "spark/gold/processor.py:139-200). Nation is broadcast explicitly.",
)
def j2_star_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    order_agg = grouped_agg(
        _t(spark, sf_dir, "orders"),
        keys=["o_custkey"],
        measures={
            "order_count": F.count(F.lit(1)),
            "total_spend": xsum("o_totalprice", 2),
        },
    ).withColumnRenamed("o_custkey", "c_custkey")
    joined = star_join(cust, [(order_agg, "c_custkey")], how="left")
    joined = equi_join(joined, nation, on="c_nationkey", how="left", broadcast_right=True)
    spend = F.coalesce(F.col("total_spend"), F.lit(0.0))
    return joined.select(
        "c_custkey",
        "c_name",
        "n_name",
        F.coalesce(F.col("order_count"), F.lit(0)).alias("order_count"),
        spend.alias("total_spend"),
        case_chain(
            [(spend >= 3000000, "HIGH"), (spend >= 1500000, "MEDIUM")], "LOW"
        ).alias("spend_band"),
    )


@register(
    "j_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    operators=("J-ext:semi",),
    doc="Left-semi join (EXISTS) — no row duplication, right side never "
    "materialized into the output.",
)
def j_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    f_orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return semi_join(cust, f_orders, on="c_custkey")


@register(
    "j_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 450000)
    """,
    operators=("J-ext:anti",),
    doc="Left-anti join (NOT EXISTS with a pushed right-side filter): "
    "customers who never placed a 450k+ order.",
)
def j_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big_orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return anti_join(cust, big_orders, on="c_custkey")


@register(
    "j_range_join_bands",
    oracle=f"""
    SELECT b.band, COUNT(*) AS n_parts,
           {savg("p.p_retailprice", 4)} AS avg_price
    FROM part p
    JOIN (VALUES ('B900', 900.0, 925.0), ('B925', 925.0, 950.0),
                 ('B950', 950.0, 975.0), ('B975', 975.0, 1000.0))
         b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
    operators=("J-ext:range",),
    doc="Range (theta) join against a tiny literal dimension — broadcast "
    "nested-loop on the small side, the scalable shape for band lookups.",
)
def j_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    bands = spark.createDataFrame(
        [("B900", 900.0, 925.0), ("B925", 925.0, 950.0),
         ("B950", 950.0, 975.0), ("B975", 975.0, 1000.0)],
        ["band", "lo", "hi"],
    )
    joined = range_join(
        part,
        F.broadcast(bands),
        equi_keys=None,
        condition=(F.col("p_retailprice") >= F.col("lo"))
        & (F.col("p_retailprice") < F.col("hi")),
    )
    return grouped_agg(
        joined,
        keys=["band"],
        measures={
            "n_parts": F.count(F.lit(1)),
            "avg_price": xavg("p_retailprice", 4),
        },
    )


@register(
    "j_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    operators=("J-ext:asof",),
    doc="As-of join: each purchase matched to the user's most recent click "
    "at-or-before it. Implemented as range-join + per-row top-1 window "
    "(pure DataFrame ops); DuckDB's native ASOF JOIN is the oracle.",
)
def j_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    out = asof_join(
        purchases, clicks, on="user_id", left_time="ts", right_time="ts"
    )
    return out.select(
        "event_id", "user_id", "ts", F.col("ts_asof").alias("click_ts")
    )


# ---------------------------------------------------------------------------
# U1 + set operations
# ---------------------------------------------------------------------------


@register(
    "u1_union_by_name",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, o_custkey, NULL AS o_totalprice FROM orders
    WHERE o_orderstatus = 'F'
    """,
    operators=("U1",),
    doc="Schema-tolerant union: second branch lacks a column → NULL "
    "(train ∪ test shape, reference spark/silver/processor.py:96).",
)
def u1_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    open_orders = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_custkey"
    )
    return union_by_name(open_orders, finished, allow_missing=True)


@register(
    "set_intersect_except",
    oracle="""
    SELECT o_custkey, 'both' AS membership FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') t
    UNION ALL
    SELECT o_custkey, 'open_only' AS membership FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') t
    """,
    operators=("U-ext:intersect", "U-ext:except"),
    doc="INTERSECT / EXCEPT set algebra (engine extension; SURVEY §2.8 "
    "'not used' list).",
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    open_keys = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    fin_keys = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    both = open_keys.intersect(fin_keys).withColumn("membership", F.lit("both"))
    open_only = open_keys.exceptAll(fin_keys).withColumn(
        "membership", F.lit("open_only")
    )
    return both.unionByName(open_only)


# ---------------------------------------------------------------------------
# O2-O4 — sort / limit / pagination / sampling
# ---------------------------------------------------------------------------


@register(
    "o4_pagination",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    ORDER BY c_custkey LIMIT 50 OFFSET 100
    """,
    operators=("O2", "O4"),
    doc="Deterministic ORDER BY + LIMIT/OFFSET page (datamart API shape, "
    "reference api/app/database.py:94-106). Plans as TakeOrderedAndProject.",
)
def o4_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    return paginate(cust, order_by=[F.col("c_custkey").asc()], limit=50, offset=100)


@register(
    "o3_seeded_sample",
    oracle="""
    SELECT 'hash' AS method, c_custkey, c_name
    FROM customer
    WHERE CAST('0x' || substr(md5('s42:' || CAST(c_custkey AS VARCHAR)), 1, 8)
               AS BIGINT) % 10000 < 1000
    """,
    operators=("O3",),
    doc="Seeded ~10% Bernoulli sample in its deterministic hash-threshold "
    "form (reference spark/common/export_to_excel.py:53-58 uses "
    "df.sample(seed)): row kept iff md5(seed_salt:id) bucket < p*10000 — "
    "the same mechanism as hash_split/train_test_split, so the DRIVER "
    "verifies the exact sample membership cross-engine instead of a "
    "rows-only count. The engine-RNG form (DataFrame.sample(fraction, "
    "seed)) has engine-specific membership by construction (no SQL "
    "oracle is possible); it remains operators.sampling.bernoulli_sample "
    "with an in-repo seed-reproducibility test "
    "(tests/test_operators_unit.py). At 100 TB the hash form is also the "
    "operationally right sample: membership is stable under "
    "repartitioning, appends, and engine upgrades.",
)
def o3_seeded_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.sampling import (
        hash_bernoulli_sample,
    )

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return hash_bernoulli_sample(cust, "c_custkey", fraction=0.1, seed=42).select(
        F.lit("hash").alias("method"), "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# Scalar function surface (SURVEY §2.9 extensions)
# ---------------------------------------------------------------------------


@register(
    "scalar_string_functions",
    oracle="""
    SELECT c_custkey,
           UPPER(c_mktsegment) AS seg_upper,
           LOWER(c_name) AS name_lower,
           CAST(LENGTH(c_name) AS INTEGER) AS name_len,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CONCAT(c_mktsegment, ':', c_name) AS seg_name,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits,
           TRIM(c_name) AS name_trim
    FROM customer
    """,
    operators=("F-ext:string",),
    doc="String function surface: upper/lower/length/substring/concat/"
    "regexp_extract/trim (engine extension; the reference only touches "
    "column names in Python — SURVEY §2.9).",
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "c_mktsegment", "c_name").alias("seg_name"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.trim(F.col("c_name")).alias("name_trim"),
    )


@register(
    "scalar_datetime_functions",
    oracle=f"""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS order_quarter,
           COUNT(*) AS n_orders,
           {ssum("o_totalprice", 2)} AS total_price
    FROM orders
    GROUP BY 1, 2, 3
    """,
    operators=("F-ext:datetime",),
    doc="Date/time extraction + calendar rollup (engine extension; "
    "SURVEY §2.9 date family).",
)
def scalar_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").withColumns(
        {
            "order_year": F.year("o_orderdate"),
            "order_month": F.month("o_orderdate"),
            "order_quarter": F.quarter("o_orderdate"),
        }
    )
    return grouped_agg(
        orders,
        keys=["order_year", "order_month", "order_quarter"],
        measures={
            "n_orders": F.count(F.lit(1)),
            "total_price": xsum("o_totalprice", 2),
        },
    )


@register(
    "scalar_json_extraction",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(AVG(CAST(props->>'$.k' AS INTEGER)), 4) AS avg_k,
           CAST(MAX(CAST(props->>'$.k' AS INTEGER)) AS INTEGER) AS max_k
    FROM events
    GROUP BY event_type
    """,
    operators=("F-ext:json",),
    doc="JSON field extraction from a string column (semi-structured "
    "surface; engine extension — SURVEY §2.9 'Array/Map/JSON: none').",
)
def scalar_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    )
    return grouped_agg(
        ev,
        keys=["event_type"],
        measures={
            "n_events": F.count(F.lit(1)),
            "avg_k": F.round(F.avg("k"), 4),
            "max_k": F.max("k"),
        },
    )


@register(
    "j_full_outer",
    oracle="""
    SELECT COALESCE(o.o_custkey, f.o_custkey) AS custkey,
           COALESCE(o.open_orders, 0) AS open_orders,
           COALESCE(f.finished_orders, 0) AS finished_orders
    FROM (SELECT o_custkey, COUNT(*) AS open_orders FROM orders
          WHERE o_orderstatus = 'O' GROUP BY o_custkey) o
    FULL JOIN (SELECT o_custkey, COUNT(*) AS finished_orders FROM orders
               WHERE o_orderstatus = 'F' GROUP BY o_custkey) f
      ON o.o_custkey = f.o_custkey
    """,
    operators=("J-ext:full",),
    doc="Full-outer join of two per-key aggregates with coalesced keys "
    "(engine extension; SURVEY §2.4 'not present' list).",
)
def j_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    open_agg = grouped_agg(
        orders.filter(F.col("o_orderstatus") == "O"),
        keys=["o_custkey"],
        measures={"open_orders": F.count(F.lit(1))},
    )
    fin_agg = grouped_agg(
        orders.filter(F.col("o_orderstatus") == "F"),
        keys=["o_custkey"],
        measures={"finished_orders": F.count(F.lit(1))},
    ).withColumnRenamed("o_custkey", "f_custkey")
    joined = open_agg.join(
        fin_agg, open_agg["o_custkey"] == fin_agg["f_custkey"], how="full_outer"
    )
    return joined.select(
        F.coalesce(F.col("o_custkey"), F.col("f_custkey")).alias("custkey"),
        F.coalesce(F.col("open_orders"), F.lit(0)).alias("open_orders"),
        F.coalesce(F.col("finished_orders"), F.lit(0)).alias("finished_orders"),
    )


#: Shared ANSI SQL used verbatim by BOTH the Spark SQL surface (S6: catalog
#: views + spark.sql) and the DuckDB oracle — one text, two engines. The
#: decimal-sum form is valid in both dialects and accumulation-order-exact,
#: so the two engines' parallel sums cannot drift (_stable.py rationale).
_SQL_API_QUERY = f"""
    SELECT c.c_mktsegment,
           o.o_orderpriority,
           COUNT(*) AS n_orders,
           {ssum("o.o_totalprice", 2)} AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > 0
    GROUP BY c.c_mktsegment, o.o_orderpriority
"""


@register(
    "sql_api_surface",
    oracle=_SQL_API_QUERY,
    operators=("S6",),
    doc="The spark.sql surface: testdata registered as catalog views "
    "(register_hive_tables semantics), then the SAME ANSI-SQL text runs on "
    "both Spark and the oracle.",
)
def sql_api_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.catalog import register_testdata

    register_testdata(spark, sf_dir, ("orders", "customer"))
    return spark.sql(_SQL_API_QUERY)


@register(
    "quality_quarantine_summary",
    oracle="""
    SELECT 'positive_quantity' AS rule, CAST(SUM(CASE WHEN NOT (l_quantity > 0) OR l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_failures FROM lineitem
    UNION ALL
    SELECT 'discount_le_half', CAST(SUM(CASE WHEN NOT (l_discount <= 0.05) OR l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'recent_shipdate', CAST(SUM(CASE WHEN NOT (l_shipdate >= TIMESTAMP '1996-01-01 00:00:00') OR l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
    """,
    operators=("P6-ext:quarantine",),
    doc="Quarantine audit: per-rule failure totals derived from the "
    "failed_rules arrays produced by split_valid_invalid (explode + "
    "count), matched against direct per-rule SQL counts.",
)
def quality_quarantine_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.quality import (
        split_valid_invalid,
    )

    li = _t(spark, sf_dir, "lineitem")
    rules = [
        Rule("positive_quantity", F.col("l_quantity") > 0),
        Rule("discount_le_half", F.col("l_discount") <= 0.05),
        Rule(
            "recent_shipdate",
            F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"),
        ),
    ]
    _, invalid = split_valid_invalid(li, rules)
    exploded = invalid.select(F.explode("failed_rules").alias("rule"))
    counts = exploded.groupBy("rule").agg(F.count(F.lit(1)).alias("n_failures"))
    # Rules with zero failures still appear (left join against the rule list).
    all_rules = spark.createDataFrame([(r.name,) for r in rules], ["rule"])
    return all_rules.join(counts, on="rule", how="left").select(
        "rule", F.coalesce(F.col("n_failures"), F.lit(0)).alias("n_failures")
    )


@register(
    "scalar_variant_extraction",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(MIN(CAST(props->>'$.k' AS INTEGER)) AS INTEGER) AS min_k,
           CAST(MAX(CAST(props->>'$.k' AS INTEGER)) AS INTEGER) AS max_k
    FROM events
    GROUP BY event_type
    """,
    operators=("F-ext:variant",),
    doc="Spark 4 VARIANT semi-structured path: parse_json once into the "
    "binary VARIANT encoding, then typed variant_get extraction — the "
    "scale-correct replacement for re-parsing JSON strings in every "
    "expression (one parse, many typed reads; shredded storage-ready). "
    "Integer aggregates keep the oracle comparison exact. Driver-covered "
    "via combo_scalar_datetime_json's sum_k_variant leg.",
)
def scalar_variant_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
    )
    return grouped_agg(
        ev,
        keys=["event_type"],
        measures={
            "n_events": F.count(F.lit(1)),
            "sum_k": F.sum("k").cast("bigint"),
            "min_k": F.min("k"),
            "max_k": F.max("k"),
        },
    )
