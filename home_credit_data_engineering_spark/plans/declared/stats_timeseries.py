"""Statistics and time-series declared queries: exact percentiles,
dispersion, correlation, and gap-filled resampling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.plans.declared._stable import (
    scorr,
    scovar_samp,
    sstddev_samp,
    xcorr,
    xcovar_samp,
    xstddev_samp,
)
from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata


@register(
    "stats_percentiles",
    oracle=f"""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
           {sstddev_samp("o_totalprice", 4, "DECIMAL(12,2)")} AS sd_price,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    operators=("A-ext:percentile",),
    doc="Exact interpolated percentiles (median/p90) + sample stddev per "
    "group. Exact `percentile` matches quantile_cont; at 100 TB switch to "
    "approx_percentile (same API shape, sketch-mergeable).",
)
def stats_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
        xstddev_samp("o_totalprice", 4, "decimal(12,2)").alias("sd_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "stats_correlation",
    oracle=f"""
    SELECT l_returnflag,
           {scorr("l_quantity", "l_extendedprice", 6, "DECIMAL(10,2)", "DECIMAL(12,2)")}
             AS qty_price_corr,
           {scovar_samp("l_quantity", "l_extendedprice", 2, "DECIMAL(10,2)", "DECIMAL(12,2)")}
             AS qty_price_cov
    FROM lineitem
    GROUP BY l_returnflag
    """,
    operators=("A-ext:corr",),
    doc="Per-group Pearson correlation and sample covariance — the "
    "feature-engineering statistics surface.",
)
def stats_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        xcorr(
            "l_quantity", "l_extendedprice", 6, "decimal(10,2)", "decimal(12,2)"
        ).alias("qty_price_corr"),
        xcovar_samp(
            "l_quantity", "l_extendedprice", 2, "decimal(10,2)", "decimal(12,2)"
        ).alias("qty_price_cov"),
    )


@register(
    "timeseries_gapfill",
    oracle="""
    WITH spans AS (
      SELECT user_id,
             date_trunc('day', MIN(ts)) AS d0,
             date_trunc('day', MAX(ts)) AS d1
      FROM events GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM spans),
    actual AS (
      SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT g.user_id, g.day, COALESCE(a.n, 0) AS n_events
    FROM grid g LEFT JOIN actual a
      ON g.user_id = a.user_id AND g.day = a.day
    """,
    operators=("E-ext:gapfill",),
    doc="Time-series resampling with gap fill: per-user daily grid "
    "(sequence + explode) left-joined onto actual daily counts, missing "
    "days zero-filled — the dense-calendar shape monthly bureau_balance "
    "series need (reference MONTHS_BALANCE is such a series).",
)
def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_testdata(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    actual = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return grid.join(actual, on=["user_id", "day"], how="left").select(
        "user_id",
        "day",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
    )


@register(
    "timeseries_forward_fill",
    oracle="""
    SELECT event_id, user_id,
           ROUND(last_value(CASE WHEN event_type = 'error' THEN NULL
                                 ELSE value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING), 4) AS value_ff
    FROM events
    """,
    operators=("E-ext:forward-fill",),
    doc="Forward fill (last observation carried forward): error events' "
    "values are masked to NULL, then filled from the user's last good "
    "observation - the sparse-to-dense state fill for time series.",
)
def timeseries_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.windows import forward_fill

    ev = read_testdata(spark, sf_dir, "events").withColumn(
        "value_ff",
        F.when(F.col("event_type") != "error", F.col("value")),
    )
    filled = forward_fill(
        ev,
        keys=["user_id"],
        order_by=[F.col("ts").asc(), F.col("event_id").asc()],
        cols=["value_ff"],
    )
    return filled.select(
        "event_id", "user_id", F.round("value_ff", 4).alias("value_ff")
    )


@register(
    "pandas_grouped_zscore",
    oracle="""
    SELECT event_id, user_id, value,
           ROUND((value - AVG(value) OVER w) / stddev_samp(value) OVER w, 4)
             AS value_z,
           ROUND(SUM(value * (1 + event_id % 3)) OVER w
                 / SUM(CAST(1 + event_id % 3 AS DOUBLE)) OVER w, 4)
             AS value_wmean
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
    operators=("U-pandas:grouped-map", "U-pandas:grouped-agg"),
    doc="Pandas UDF certification, two eval types with one oracle: "
    "per-user z-scores via applyInPandas GROUPED_MAP (Arrow batches, "
    "ddof=1) and a per-user weighted mean via a GROUPED_AGG pandas UDAF "
    "(deterministic weights 1 + event_id %% 3), both matching the "
    "declarative window formulations exactly.",
)
def pandas_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.functions.grouped_pandas import (
        weighted_mean_udaf,
        zscore_per_group,
    )

    ev = read_testdata(spark, sf_dir, "events")
    out = zscore_per_group(ev)
    wmean = (
        ev.withColumn("__w", (1 + F.col("event_id") % 3).cast("double"))
        .groupBy("user_id")
        .agg(
            F.round(weighted_mean_udaf()(F.col("value"), F.col("__w")), 4).alias(
                "value_wmean"
            )
        )
    )
    return out.join(wmean, on="user_id").select(
        "event_id",
        "user_id",
        "value",
        F.round("value_z", 4).alias("value_z"),
        "value_wmean",
    )


@register(
    "stats_approx_percentiles",
    # Verdict certificate: the GK-sketch value is engine-specific, but
    # its RANK-ERROR contract is not — the returned value's true rank
    # interval in the group must intersect [q*n - tol*n, q*n + tol*n]
    # (tol 0.01 = 100x the accuracy-10000 guarantee; flips on a dead or
    # mis-merged sketch, never on normal GK variance). n rides along
    # exactly (hash-checked).
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           TRUE AS p50_rank_ok, TRUE AS p90_rank_ok
    FROM orders GROUP BY o_orderstatus
    """,
    operators=("A-ext:approx-percentile",),
    doc="approx_percentile (Greenwald-Khanna sketch, accuracy 10000) per "
    "group — the 100 TB form of stats_percentiles: sketches combine "
    "map-side, so the shuffle carries one bounded sketch per group "
    "instead of every value. Certified by the rank contract: each "
    "approx value's true rank interval (count of strictly-smaller "
    "values + 1 .. count of <= values) intersects the target rank +/- "
    "1% of the group. Value-level accuracy additionally pinned by "
    "tests/test_salted_sampling_sink.py.",
)
def stats_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    apx = orders.groupBy("o_orderstatus").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias(
            "__p50"
        ),
        F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(10000)).alias(
            "__p90"
        ),
    )
    ranked = (
        orders.select("o_orderstatus", "o_totalprice")
        .join(F.broadcast(apx), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                (F.col("o_totalprice") < F.col("__p50")).cast("long")
            ).alias("__lt50"),
            F.sum(
                (F.col("o_totalprice") <= F.col("__p50")).cast("long")
            ).alias("__le50"),
            F.sum(
                (F.col("o_totalprice") < F.col("__p90")).cast("long")
            ).alias("__lt90"),
            F.sum(
                (F.col("o_totalprice") <= F.col("__p90")).cast("long")
            ).alias("__le90"),
        )
    )

    def rank_ok(lt: str, le: str, q: float):
        n = F.col("n_orders").cast("double")
        lo, hi = F.col(lt) + 1, F.col(le)
        return (hi.cast("double") >= (F.lit(q) - 0.01) * n) & (
            lo.cast("double") <= (F.lit(q) + 0.01) * n
        )

    return ranked.select(
        "o_orderstatus",
        "n_orders",
        rank_ok("__lt50", "__le50", 0.5).alias("p50_rank_ok"),
        rank_ok("__lt90", "__le90", 0.9).alias("p90_rank_ok"),
    )


@register(
    "stats_weighted_median",
    oracle="""
    WITH wm_clean AS (
      SELECT l_returnflag,
             l_extendedprice AS v,
             CAST(l_quantity AS DECIMAL(38,6)) AS w
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL AND l_quantity > 0),
    wm_cum AS (
      SELECT l_returnflag, v,
             SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v ASC
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(w) OVER (PARTITION BY l_returnflag) AS tw
      FROM wm_clean)
    SELECT l_returnflag,
           CAST(MIN(v) AS DOUBLE) AS wpct_value,
           MAX(CAST(tw AS DOUBLE)) AS total_weight
    FROM wm_cum
    WHERE CAST(cw AS DOUBLE) >= 0.5 * CAST(tw AS DOUBLE)
    GROUP BY l_returnflag
    """,
    operators=("A-ext:weighted-percentile",),
    doc="Exact quantity-weighted median price per return flag "
    "(operators/aggregates.py:grouped_weighted_percentile): the "
    "smallest value whose cumulative weight reaches half the group "
    "total — the weighted-quantile form Spark has no built-in for, "
    "expressed as one group-partitioned RANGE window (ties accumulate "
    "together, so the crossing is well-defined), a filter, and a "
    "min-aggregate. Weights accumulate as exact DECIMAL(38,6); only "
    "the final q x total product is double, pinned identically in "
    "both engines.",
)
def stats_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.aggregates import (
        grouped_weighted_percentile,
    )

    li = read_testdata(spark, sf_dir, "lineitem")
    return grouped_weighted_percentile(
        li, ["l_returnflag"], "l_extendedprice", "l_quantity", q=0.5
    )
