"""Bucketed tables: co-bucketed joins and aggregations must plan without
a shuffle exchange on the bucketed key — the storage-level co-location
strategy for 100 TB star joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.sources.readers import read_testdata
from home_credit_data_engineering_spark.sources.sinks import write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = read_testdata(spark, sf_dir, "orders")
    lineitem = read_testdata(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", 8, sort_by="o_orderkey")
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        8,
        sort_by="o_orderkey",
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _executed_plan(df) -> str:
    df.count()
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_has_no_shuffle(spark, bucketed_tables):
    t_orders, t_lineitem = bucketed_tables
    joined = spark.table(t_orders).join(spark.table(t_lineitem), on="o_orderkey")
    plan = _executed_plan(joined)
    assert "Exchange hashpartitioning" not in plan, plan
    # sanity: same join un-bucketed DOES shuffle (disable auto-broadcast to
    # force a shuffle-based strategy on these small inputs)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        raw = read_testdata(spark, "/root/testdata/sf0.001", "orders").join(
            read_testdata(spark, "/root/testdata/sf0.001", "lineitem")
            .withColumnRenamed("l_orderkey", "o_orderkey"),
            on="o_orderkey",
        )
        raw_plan = _executed_plan(raw)
        assert "Exchange hashpartitioning" in raw_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_agg_has_no_shuffle(spark, bucketed_tables):
    t_orders, _ = bucketed_tables
    agg = (
        spark.table(t_orders)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = _executed_plan(agg)
    assert "Exchange hashpartitioning" not in plan, plan


def test_bucketed_join_results_match_plain(spark, bucketed_tables, sf_dir):
    t_orders, t_lineitem = bucketed_tables
    bucketed = (
        spark.table(t_orders)
        .join(spark.table(t_lineitem), on="o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain = (
        read_testdata(spark, sf_dir, "orders")
        .join(
            read_testdata(spark, sf_dir, "lineitem").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            on="o_orderkey",
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_analyze_table_feeds_cbo_stats(spark, sf_dir, tmp_path):
    """ANALYZE TABLE statistics must land in the catalog (rowCount +
    column NDV) where the cost-based optimizer reads them."""
    from home_credit_data_engineering_spark.catalog import analyze_table
    from home_credit_data_engineering_spark.sources.readers import read_testdata

    read_testdata(spark, sf_dir, "nation").write.mode("overwrite").saveAsTable(
        "cbo_nation"
    )
    try:
        analyze_table(spark, "cbo_nation", columns=["n_nationkey", "n_regionkey"])
        stats_line = [
            r["data_type"]
            for r in spark.sql("DESCRIBE TABLE EXTENDED cbo_nation").collect()
            if r["col_name"] == "Statistics"
        ]
        assert stats_line and "rows" in stats_line[0]
        col_desc = spark.sql(
            "DESCRIBE EXTENDED cbo_nation n_nationkey"
        ).collect()
        ndv = {r["info_name"]: r["info_value"] for r in col_desc}
        assert ndv.get("distinct_count") not in (None, "NULL")
    finally:
        spark.sql("DROP TABLE IF EXISTS cbo_nation")


def test_strip_spans_bucketed_corpus(spark, sf_dir):
    """strip_spans over a corpus bucketed on the id: the text side must
    plan with ZERO exchanges — only the span-side aggregate shuffles to
    meet the bucket partitioning. This is the past-broadcast-threshold
    posture for boilerplate-heavy corpora (operators/spans.py docstring;
    VERDICT r4 #5)."""
    from home_credit_data_engineering_spark.operators.spans import strip_spans

    docs = read_testdata(spark, sf_dir, "documents")
    write_bucketed(docs, "b_documents", "doc_id", 8, sort_by="doc_id")
    spans = spark.createDataFrame(
        [(1, 0, 7), (2, 3, 12), (5, 0, 2)],
        ["doc_id", "span_start", "span_end"],
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = strip_spans(spark.table("b_documents"), spans, "doc_id", "text")
        out.count()
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_documents")
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected only the span-side exchange:\n{plan}"
    # the one exchange is the span aggregate, not the document text
    exchange_lines = [
        line for line in plan.splitlines() if "Exchange hashpartitioning" in line
    ]
    assert all("text" not in line for line in exchange_lines), plan
    assert "Bucketed: true" in plan, plan
    # and the same join un-bucketed shuffles the text side too
    raw = strip_spans(docs, spans, "doc_id", "text")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        raw.count()
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    assert raw_plan.count("Exchange hashpartitioning") == 2, raw_plan
