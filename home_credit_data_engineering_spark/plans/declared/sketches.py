"""Deterministic-sketch declared queries: KMV distinct counting and
Count-Min frequency estimation.

Unlike the engine-private HLL/GK sketches (certified by error-bound
VERDICTS in ``combo_approx_sketches``), KMV and Count-Min are built from
engine-portable md5 slices, so the sketch CONTENTS — surviving hash set,
counter grid, every derived estimate — are pure functions of the data
and hash-exactly reproducible by the DuckDB twins below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata

#: 2^52 as an exact double literal (13 md5 hex digits = 52 bits).
_KMV_DENOM_SQL = "4503599627370496.0"

#: KMV CTE chain over ``{src}`` (any relation) distinct-counting
#: ``{item}`` with parameter k — final relation
#: ``{p}_out(n_kept, theta, est)``; arithmetic identical to
#: ``operators/sketch.py:kmv_distinct``.
KMV_SQL_TMPL = """
    {p}_h AS (
      SELECT DISTINCT md5('kmv:' || CAST({item} AS VARCHAR)) AS h
      FROM {src}),
    {p}_top AS (SELECT h FROM {p}_h ORDER BY h LIMIT {k}),
    {p}_agg AS (
      SELECT COUNT(*) AS n_kept,
             MAX(CAST(CAST('0x' || substr(h, 1, 13) AS BIGINT) AS DOUBLE)
                 / {denom}) AS umax
      FROM {p}_top),
    {p}_out AS (
      SELECT n_kept,
             CASE WHEN n_kept >= {k} THEN ROUND(umax, 9) END AS theta,
             CASE WHEN n_kept >= {k}
                  THEN ROUND({km1}.0 / ROUND(umax, 9), 6)
                  ELSE CAST(n_kept AS DOUBLE) END AS est
      FROM {p}_agg)"""


def kmv_sql_ctes(p: str, src: str, item: str, k: int) -> str:
    """DuckDB twin of ``kmv_distinct(src, item, k)`` ->
    ``{p}_out(n_kept, theta, est)``."""
    return KMV_SQL_TMPL.format(
        p=p, src=src, item=item, k=k, km1=k - 1, denom=_KMV_DENOM_SQL
    )


def cms_cell_sql(r_expr: str, item_expr: str, width: int) -> str:
    """The engine-portable Count-Min cell index:
    first-32-md5-bits('cms<r>:' || item) mod width."""
    return (
        f"CAST(CAST('0x' || substr(md5('cms' || CAST({r_expr} AS VARCHAR) "
        f"|| ':' || {item_expr}), 1, 8) AS BIGINT) % {width} AS BIGINT)"
    )


def cms_sql_ctes(
    p: str, toks_cte: str, depth: int, width: int, panel_k: int
) -> str:
    """DuckDB twin of ``cms_counters`` + ``cms_estimate`` over
    ``{toks_cte}(item)``: builds the ``depth x width`` grid, probes the
    deterministic top-``panel_k`` items (count DESC, item ASC), final
    relation ``{p}_res(item, est, exact_cnt, overcount_ok)``."""
    cell_item = cms_cell_sql("r.r", "item", width)
    cell_probe = cms_cell_sql("r.r", "pa.item", width)
    return f"""
    {p}_cells AS (
      SELECT r.r, {cell_item} AS c, COUNT(*) AS cnt
      FROM {toks_cte}, range({depth}) r(r)
      GROUP BY 1, 2),
    {p}_exact AS (
      SELECT item, COUNT(*) AS exact_cnt FROM {toks_cte} GROUP BY 1),
    {p}_panel AS (
      SELECT item, exact_cnt FROM {p}_exact
      ORDER BY exact_cnt DESC, item LIMIT {panel_k}),
    {p}_probe AS (
      SELECT pa.item, r.r, {cell_probe} AS c
      FROM {p}_panel pa, range({depth}) r(r)),
    {p}_est AS (
      SELECT pr.item, MIN(COALESCE(ce.cnt, 0)) AS est
      FROM {p}_probe pr
      LEFT JOIN {p}_cells ce ON pr.r = ce.r AND pr.c = ce.c
      GROUP BY 1),
    {p}_res AS (
      SELECT e.item, e.est, x.exact_cnt,
             e.est >= x.exact_cnt AS overcount_ok
      FROM {p}_est e JOIN {p}_panel x USING (item))"""


@register(
    "stats_kmv_distinct",
    oracle=f"""
    WITH {kmv_sql_ctes("kc", "orders", "o_custkey", 256)},
    {kmv_sql_ctes("kp", "lineitem", "l_partkey", 256)},
    kc_exact AS (SELECT COUNT(DISTINCT o_custkey) AS exact_distinct
                 FROM orders),
    kp_exact AS (SELECT COUNT(DISTINCT l_partkey) AS exact_distinct
                 FROM lineitem)
    SELECT 'o_custkey' AS scope, n_kept, theta, est,
           exact_distinct,
           ABS(est - exact_distinct) <= 0.25 * exact_distinct
             AS within_bound
    FROM kc_out CROSS JOIN kc_exact
    UNION ALL
    SELECT 'l_partkey', n_kept, theta, est, exact_distinct,
           ABS(est - exact_distinct) <= 0.25 * exact_distinct
    FROM kp_out CROSS JOIN kp_exact
    """,
    operators=("A-ext:kmv",),
    doc="KMV k-minimum-values distinct-count sketch "
    "(operators/sketch.py:kmv_distinct, k=256) over order custkeys and "
    "lineitem partkeys, with the exact distinct count and a 4-sigma "
    "relative-error verdict alongside. The sketch is DETERMINISTIC "
    "(md5-slice hashes, bounded mapInPandas partition fold, "
    "distinct+top-k merge over partitions*k rows), so n_kept/theta/est "
    "are hash-exact vs the DuckDB twin — the certifiable alternative "
    "to approx_count_distinct; at small SF the sketch saturates "
    "(n_kept < k) and the twin pins the exact-path branch instead. "
    "Mergeable: union minima frames, re-take k smallest.",
)
def stats_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.sketch import (
        kmv_distinct,
    )

    def leg(df: DataFrame, col: str, scope: str) -> DataFrame:
        est = kmv_distinct(df, col, k=256)
        exact = df.agg(
            F.countDistinct(col).alias("exact_distinct")
        )
        return (
            est.crossJoin(F.broadcast(exact))
            .select(
                F.lit(scope).alias("scope"),
                "n_kept",
                "theta",
                "est",
                "exact_distinct",
                (
                    F.abs(F.col("est") - F.col("exact_distinct"))
                    <= 0.25 * F.col("exact_distinct")
                ).alias("within_bound"),
            )
        )

    orders = read_testdata(spark, sf_dir, "orders")
    li = read_testdata(spark, sf_dir, "lineitem")
    return leg(orders, "o_custkey", "o_custkey").unionByName(
        leg(li, "l_partkey", "l_partkey")
    )


@register(
    "text_cms_token_freq",
    oracle=f"""
    WITH cm_toks AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS item
      FROM documents),
    {cms_sql_ctes("cm", "cm_toks", depth=4, width=512, panel_k=12)}
    SELECT item, est, exact_cnt, overcount_ok FROM cm_res
    """,
    operators=("A-ext:cms",),
    doc="Count-Min frequency sketch "
    "(operators/sketch.py:cms_counters/cms_estimate, 4x512 grid) over "
    "the documents token stream, probed at the deterministic top-12 "
    "tokens (count DESC, token ASC), with exact counts and the "
    "overcount-only invariant alongside. The grid is a "
    "bounded-cardinality (r, c) hash aggregate — map-side combine "
    "caps the shuffle at depth*width cells per task regardless of "
    "stream length — and md5-slice hashing makes every cell, and "
    "therefore every estimate, hash-exact vs the DuckDB twin. "
    "Mergeable by cell-wise addition.",
)
def text_cms_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )

    docs = read_testdata(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("item")
    )
    counters = cms_counters(toks, "item", depth=4, width=512)
    exact = toks.groupBy("item").agg(F.count(F.lit(1)).alias("exact_cnt"))
    panel = exact.orderBy(
        F.col("exact_cnt").desc(), F.col("item")
    ).limit(12)
    est = cms_estimate(counters, panel, "item", depth=4, width=512)
    return est.join(panel, "item").select(
        "item",
        "est",
        "exact_cnt",
        (F.col("est") >= F.col("exact_cnt")).alias("overcount_ok"),
    )


@register(
    "stats_hll_mergeable",
    # The ESTIMATE is engine-specific (DataSketches registers), but two
    # properties are deterministic and oracle-checkable: (a) the sketch
    # built from disjoint halves and UNIONED estimates within 2% of the
    # one-pass sketch (merge consistency — the register state covers
    # the identical item set; the residual is the documented HIP-vs-
    # composite estimator gap, a fraction of the error bound), (b) both
    # estimates land within 3x the configured relative standard error
    # of the exact distinct count (lgk=12 -> rse ~1.04/sqrt(4096)
    # ~1.6%; verdict at 5%).
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS exact_distinct,
           TRUE AS merge_consistent,
           TRUE AS within_bound
    FROM orders GROUP BY 1
    """,
    operators=("A-ext:hll-merge",),
    doc="Mergeable HLL distinct-count state (operators/sketch.py:"
    "hll_sketch_state — Apache DataSketches via hll_sketch_agg): the "
    "orders stream splits into even/odd o_custkey halves, each half "
    "builds a per-status sketch state, the states merge via "
    "hll_union_agg, and the merged estimate must agree with the "
    "one-pass estimate within 2% (the register state covers the "
    "identical item set; the residual is DataSketches' HIP-vs-"
    "composite estimator gap — the property that makes per-day sketch "
    "states safe to persist and roll up at 100 TB) while both land "
    "within 5% of the exact distinct count (3x the lgk=12 RSE). The "
    "verdict booleans are the oracle contract; the binary state never "
    "leaves the JVM.",
)
def stats_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.sketch import (
        hll_sketch_state,
        hll_state_estimate,
        merge_hll_states,
    )

    orders = read_testdata(spark, sf_dir, "orders")
    keys = ("o_orderstatus",)
    even = hll_sketch_state(
        orders.filter(F.col("o_custkey") % 2 == 0), "o_custkey", keys
    )
    odd = hll_sketch_state(
        orders.filter(F.col("o_custkey") % 2 == 1), "o_custkey", keys
    )
    merged_est = hll_state_estimate(
        merge_hll_states(even, odd, keys), keys
    ).withColumnRenamed("estimate", "merged_est")
    direct_est = hll_state_estimate(
        hll_sketch_state(orders, "o_custkey", keys), keys
    ).withColumnRenamed("estimate", "direct_est")
    exact = orders.groupBy(*keys).agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    return (
        exact.join(merged_est, list(keys))
        .join(direct_est, list(keys))
        .select(
            "o_orderstatus",
            "exact_distinct",
            (
                F.abs(F.col("merged_est") - F.col("direct_est"))
                <= 0.02 * F.col("direct_est")
            ).alias("merge_consistent"),
            (
                F.abs(F.col("merged_est") - F.col("exact_distinct"))
                <= 0.05 * F.col("exact_distinct")
            ).alias("within_bound"),
        )
    )
