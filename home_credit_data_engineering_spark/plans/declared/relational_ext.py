"""Extended relational surface: grouping sets, HAVING, unpivot, ordered
string aggregation, exact distinct counts, keyset pagination, arrays."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.aggregates import grouped_agg
from home_credit_data_engineering_spark.plans.declared._stable import (
    ssum,
    ssum_dec,
    xsum,
    xsum_dec,
)
from home_credit_data_engineering_spark.operators.sampling import keyset_page
from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata


@register(
    "cube_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {ssum("o_totalprice", 2)} AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    operators=("A-ext:cube",),
    doc="CUBE grouping sets — all 4 grouping combinations in one pass "
    "(Catalyst expands + partial-aggregates each).",
)
def cube_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        xsum("o_totalprice", 2).alias("total_price"),
    )


@register(
    "agg_having_filter",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders,
           {ssum("o_totalprice", 2)} AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12 AND {ssum_dec("o_totalprice")} > 2500000
    """,
    operators=("A-ext:having",),
    doc="Post-aggregation HAVING filter (big-spender shape).",
)
def agg_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            xsum("o_totalprice", 2).alias("total_spend"),
            xsum_dec("o_totalprice").alias("__raw_spend"),
        )
        .filter((F.col("n_orders") >= 12) & (F.col("__raw_spend") > 2500000))
        .drop("__raw_spend")
    )


@register(
    "unpivot_stack",
    oracle="""
    SELECT c_custkey, metric, value FROM (
      SELECT c_custkey,
             unnest(['acctbal', 'nationkey']) AS metric,
             unnest([c_acctbal, CAST(c_nationkey AS DOUBLE)]) AS value
      FROM customer) t
    """,
    operators=("P-ext:unpivot",),
    doc="Unpivot (wide→long) via stack — the inverse of A5's pivot.",
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_testdata(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.expr(
            "stack(2, 'acctbal', c_acctbal, "
            "'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, value)"
        ),
    )


@register(
    "ordered_string_agg",
    oracle="""
    SELECT o_custkey,
           string_agg(o_orderstatus, ',' ORDER BY o_orderkey) AS status_seq,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
    operators=("A-ext:collect",),
    doc="Ordered string aggregation: collect_list sorted by a struct key → "
    "deterministic concatenation (order-sensitive aggregates need an "
    "explicit order to be engine-portable).",
)
def ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("o_orderkey", "o_orderstatus"))
                    ),
                    lambda s: s["o_orderstatus"],
                ),
                ",",
            ).alias("status_seq"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "exact_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    operators=("A-ext:count-distinct",),
    doc="Exact COUNT(DISTINCT) per group (expand + two-phase aggregate; "
    "approx_count_distinct is the 100 TB fallback, declared separately).",
)
def exact_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    return grouped_agg(
        orders,
        keys=["o_orderstatus"],
        measures={
            "n_customers": F.countDistinct("o_custkey"),
            "n_orders": F.count(F.lit(1)),
        },
    )


@register(
    "keyset_pagination",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey > 100
    ORDER BY c_custkey
    LIMIT 25
    """,
    operators=("O4-ext:keyset",),
    doc="Keyset (seek) pagination — the deep-pagination shape that pushes "
    "the page predicate into the scan instead of sorting a prefix.",
)
def keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_testdata(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return keyset_page(cust, F.col("c_custkey"), after=100, limit=25)


@register(
    "array_explode_roundtrip",
    oracle="""
    SELECT n_regionkey AS region_key,
           COUNT(*) AS n_nations,
           string_agg(n_name, '|' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
    operators=("F-ext:array", "A-ext:collect"),
    doc="Array aggregation round-trip: collect_list → sort → join "
    "(deterministic array semantics for nested-type columns; also the "
    "ordered-collect aggregation shape ordered_string_agg certifies).",
)
def array_explode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_testdata(spark, sf_dir, "nation")
    return (
        nation.groupBy(F.col("n_regionkey").alias("region_key"))
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("nations"),
        )
    )


@register(
    "j_null_safe_equality",
    oracle="""
    SELECT n.n_name, r.r_name
    FROM nation n
    LEFT JOIN region r
      ON nullif(n.n_regionkey, 0) IS NOT DISTINCT FROM nullif(r.r_regionkey, 0)
    """,
    operators=("J-ext:null-safe",),
    doc="Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match each other instead of dropping out - the join form for "
    "nullable dimension keys.",
)
def j_null_safe_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_testdata(spark, sf_dir, "nation").withColumn(
        "nk", F.expr("nullif(n_regionkey, 0)")
    )
    region = read_testdata(spark, sf_dir, "region").withColumn(
        "rk", F.expr("nullif(r_regionkey, 0)")
    )
    joined = nation.join(region, nation["nk"].eqNullSafe(region["rk"]), "left")
    return joined.select("n_name", "r_name")


@register(
    "window_first_last_nth",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FIRST_VALUE(l_extendedprice) OVER w AS first_price,
           LAST_VALUE(l_extendedprice) OVER w_full AS last_price,
           NTH_VALUE(l_extendedprice, 2) OVER w_full AS second_price
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_shipdate, l_linenumber, l_extendedprice),
           w_full AS (PARTITION BY l_orderkey
                 ORDER BY l_shipdate, l_linenumber, l_extendedprice
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    operators=("W-ext:first_value", "W-ext:last_value", "W-ext:nth_value"),
    doc="Analytic value functions over an order-line timeline: first/last/"
    "nth price per order. last/nth use the explicit full-partition frame "
    "(the default frame stops at CURRENT ROW — the classic last_value "
    "trap, identical in Spark and ANSI SQL). Total order includes "
    "l_extendedprice because (l_orderkey, l_linenumber) is not unique in "
    "the synthetic data. One shuffle serves all three.",
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    order = [F.col("l_shipdate").asc(), F.col("l_linenumber").asc(), F.col("l_extendedprice").asc()]
    w = Window.partitionBy("l_orderkey").orderBy(*order)
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return read_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.first("l_extendedprice").over(w).alias("first_price"),
        F.last("l_extendedprice").over(w_full).alias("last_price"),
        F.nth_value("l_extendedprice", 2).over(w_full).alias("second_price"),
    )


@register(
    "text_edit_distance_pairs",
    oracle="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(substring(a.text, 1, 24), substring(b.text, 1, 24))
             AS prefix_edit_distance
    FROM documents a JOIN documents b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE a.doc_id < 40 AND b.doc_id < 40
    """,
    operators=("F-ext:levenshtein", "j:theta"),
    doc="Pairwise prefix edit distance within language blocks — the "
    "fuzzy-match primitive (title/URL near-match). Blocked the same way "
    "an at-scale run must be (never all-pairs; here lang + an id cap), "
    "with levenshtein evaluated JVM-side on the blocked pairs only.",
)
def text_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        read_testdata(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "lang", F.substring("text", 1, 24).alias("prefix"))
    )
    a = docs.select(
        F.col("doc_id").alias("doc_a"), "lang", F.col("prefix").alias("pa")
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b"), F.col("prefix").alias("pb")
    )
    return (
        a.join(b, (F.col("lang") == F.col("lang_b")) & (F.col("doc_a") < F.col("doc_b")))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("pa", "pb").alias("prefix_edit_distance"),
        )
    )


@register(
    "set_ops_all_multiset",
    oracle="""
    SELECT l_partkey, 'common' AS membership FROM (
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      INTERSECT ALL
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A') t
    UNION ALL
    SELECT l_partkey, 'r_extra' AS membership FROM (
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      EXCEPT ALL
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A') t
    """,
    operators=("U-ext:intersect-all", "U-ext:except-all"),
    doc="Multiset INTERSECT ALL / EXCEPT ALL (duplicate-preserving: min "
    "multiplicity / multiplicity difference) — the bag semantics "
    "set_intersect_except's distinct forms don't cover.",
)
def set_ops_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.setops import (
        except_all,
        intersect_all,
    )

    li = read_testdata(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    common = intersect_all(r, a).withColumn("membership", F.lit("common"))
    r_extra = except_all(r, a).withColumn("membership", F.lit("r_extra"))
    return common.unionByName(r_extra)


@register(
    "agg_boolean_measures",
    oracle="""
    SELECT o_orderstatus,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_totalprice > 400000) AS any_over_400k,
           CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent
    FROM orders
    GROUP BY o_orderstatus
    """,
    operators=("A-ext:bool_and", "A-ext:bool_or", "A-ext:count_if"),
    doc="Boolean aggregate surface: universal/existential predicates and "
    "count_if per group — the assertion shape of data-quality dashboards "
    "('all rows in segment satisfy X'). Decomposable, so partial "
    "aggregation applies as usual.",
)
def agg_boolean_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_testdata(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
    )


@register(
    "scalar_higher_order_arrays",
    # Float discipline: every output is comparison/count/sign-based or a
    # single ROUND of an exactly-read float — no float ACCUMULATION, so
    # the hash compare is safe without _stable.py scaffolding (float
    # sums over arrays would fold in engine-specific order; see
    # docs/EXPLAIN.md "Float-aggregate hash stability").
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
           CAST(len(list_filter(embedding, x -> abs(x) > 0.5)) AS INTEGER)
             AS n_big,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 4) AS max_val,
           CAST(list_sum(list_transform(embedding,
                x -> CASE WHEN x > 0 THEN 1 WHEN x < 0 THEN -1 ELSE 0 END))
                AS BIGINT) AS net_sign,
           len(list_filter(embedding, x -> abs(x) < 0.01)) > 0 AS has_small
    FROM embeddings
    """,
    operators=("F-ext:array",),
    doc="Higher-order array function surface over the embedding column: "
    "transform / filter / exists / aggregate (fold) / array_max, all "
    "JVM-evaluated lambdas in one narrow projection — the idiomatic "
    "Spark shape for element-wise vector work without Python. Outputs "
    "are counts, comparisons, and an integer sign-fold so the "
    "cross-engine hash stays exact.",
)
def scalar_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_testdata(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.size(F.filter("embedding", lambda x: F.abs(x) > 0.5)).alias("n_big"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("max_val"),
        F.expr(
            "CAST(aggregate(transform(embedding, "
            "x -> CASE WHEN x > 0 THEN 1 WHEN x < 0 THEN -1 ELSE 0 END), "
            "0, (a, x) -> a + x) AS BIGINT)"
        ).alias("net_sign"),
        F.exists("embedding", lambda x: F.abs(x) < 0.01).alias("has_small"),
    )


@register(
    "scalar_map_functions",
    oracle="""
    SELECT n_regionkey AS region_key,
           CAST(COUNT(*) AS INTEGER) AS n_entries,
           string_agg(n_name, '|' ORDER BY n_name) AS keys_sorted,
           CAST(arg_min(n_nationkey, n_name) AS INTEGER) AS first_key_val,
           bool_or(n_name = 'NATION_0') AS has_nation_0
    FROM nation
    GROUP BY n_regionkey
    """,
    operators=("F-ext:map", "A-ext:collect"),
    doc="MAP-type function surface: per-region map built with "
    "map_from_entries over a sorted collect, read back via size / "
    "map_keys / element_at / map_contains_key. The oracle recomputes "
    "every lookup relationally (count, ordered string_agg, arg_min, "
    "bool_or), so the map round-trip is value-verified without the "
    "engines having to agree on a map wire format. Driver tag covered "
    "by combo_scalar_string_null's map leg.",
)
def scalar_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_testdata(spark, sf_dir, "nation")
    mapped = nation.groupBy(F.col("n_regionkey").alias("region_key")).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("n_name", "n_nationkey")))
        ).alias("m")
    )
    return mapped.select(
        "region_key",
        F.size("m").alias("n_entries"),
        F.concat_ws("|", F.array_sort(F.map_keys("m"))).alias("keys_sorted"),
        F.element_at(F.col("m"), F.array_min(F.map_keys("m"))).alias(
            "first_key_val"
        ),
        F.map_contains_key(F.col("m"), F.lit("NATION_0")).alias("has_nation_0"),
    )


@register(
    "join_skew_salted",
    # Pathological skew by construction: 90% of lineitem rows map to ONE
    # hot key; the dim side is the 1000-key band table. The salted plan
    # must produce the plain join's exact aggregate (salting only moves
    # rows between tasks) — which is precisely what lets DuckDB oracle
    # the skew machinery with an unsalted join.
    oracle="""
    WITH sk AS (
      SELECT CASE WHEN l_orderkey % 100 < 90 THEN 1
                  ELSE (l_orderkey % 1000) + 1 END AS k,
             l_quantity
      FROM lineitem),
    dim AS (SELECT CAST(x AS BIGINT) AS k, CAST(x % 7 AS INTEGER) AS band
            FROM range(1, 1001) t(x))
    SELECT band,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM sk JOIN dim USING (k)
    GROUP BY band
    """,
    operators=("J1", "A1"),
    doc="Skew-stress join (r9, VERDICT r8 #7 — the scaled bench leg for "
    "operators/joins.py:salted_join + AQE skew handling): a zipf-like "
    "key where 90% of rows hash to ONE hot key joins a 1000-row band "
    "dim through salted_join(salt_buckets=16), then aggregates per "
    "band (counts + DECIMAL(18,2) stable quantity sums). The salt "
    "spreads the hot key over 16 tasks instead of one straggler; "
    "results are provably salt-invariant, so the oracle runs the plain "
    "join. AQE skew-split on the UNSALTED form is plan-asserted in "
    "test_skew_handling; the ~equivalence of salted and plain results "
    "in test_operators_unit.",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.joins import salted_join

    li = read_testdata(spark, sf_dir, "lineitem")
    skewed = li.select(
        F.when(F.pmod("l_orderkey", F.lit(100)) < 90, F.lit(1))
        .otherwise(F.pmod("l_orderkey", F.lit(1000)) + 1)
        .cast("bigint")
        .alias("k"),
        "l_quantity",
    )
    dim = spark.range(1, 1001).select(
        F.col("id").alias("k"),
        F.pmod("id", F.lit(7)).cast("int").alias("band"),
    )
    joined = salted_join(skewed, dim, on="k", salt_buckets=16)
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
    )
