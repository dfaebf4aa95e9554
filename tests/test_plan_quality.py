"""Plan-quality gate: the physical-plan properties documented in
docs/EXPLAIN.md, asserted so they cannot silently regress.

Each check runs the declared query (AQE finalizes the plan only after
execution) and asserts the shape that survives a 100×-1000× scale-up:
filters pushed into the parquet scan, projections narrowed, small sides
broadcast, no unplanned cartesian products, aggregation-form latest-per-key
(no Window node), top-k as TakeOrderedAndProject.
"""

from __future__ import annotations

import pytest

import home_credit_data_engineering_spark.plans.declared  # noqa: F401
from home_credit_data_engineering_spark.plans.registry import REGISTRY


def executed_plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].build(spark, sf_dir)
    df.count()  # finalize the adaptive plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    plan = executed_plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [" in plan
    # the pushed-filter list must not be empty
    assert "PushedFilters: []" not in plan
    # column pruning: the scan must not read the full 11-column lineitem
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema


def test_q6_all_predicates_pushed(spark, sf_dir):
    plan = executed_plan(spark, sf_dir, "q6_revenue_delta")
    pushed = plan.split("PushedFilters: ")[1].splitlines()[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


@pytest.mark.parametrize(
    "name", ["q3_shipping_priority", "q5_region_revenue", "medallion_risk_profile"]
)
def test_star_joins_broadcast_without_cartesian(spark, sf_dir, name):
    plan = executed_plan(spark, sf_dir, name)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_cross_join_is_broadcast_nested_loop(spark, sf_dir):
    # The one declared cartesian: must be the broadcast form (build side is
    # a 25-row dim), never a partitioned CartesianProduct.
    plan = executed_plan(spark, sf_dir, "cross_join_nation_pairs")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_latest_per_key_is_aggregation_form(spark, sf_dir):
    # w1 must plan as partial+final aggregate (max_by), not a Window over
    # every row — the shuffle carries one row per key, not the full table.
    plan = executed_plan(spark, sf_dir, "w1_latest_per_key")
    assert "max_by" in plan
    assert "Window" not in plan


def test_pagination_is_take_ordered(spark, sf_dir):
    plan = executed_plan(spark, sf_dir, "o4_pagination")
    assert "TakeOrderedAndProject" in plan


def test_no_plan_has_row_at_a_time_python_udf(spark, sf_dir):
    # The hot relational surface stays JVM-side: BatchEvalPython (row-wise
    # Python UDF) must never appear; Arrow-batched nodes are the only
    # sanctioned Python (mapInPandas paths declare themselves).
    for name in (
        "q1_pricing_summary",
        "j2_star_assembly",
        "a5_pivot_status_counts",
        "topk_per_group",
        "j_asof_join",
        "text_token_stats",
        "dedup_exact",
    ):
        plan = executed_plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name


def test_combo_text_profile_single_scan_no_python(spark, sf_dir):
    # The whole per-doc profile (12 derived columns incl. PII redaction)
    # must stay one pass over one scan with zero Python in the row path —
    # this is the scan-speed-at-100TB claim made in its docstring.
    plan = executed_plan(spark, sf_dir, "combo_text_profile")
    assert "BatchEvalPython" not in plan
    assert plan.count("Scan parquet") == 1
    assert "Exchange" not in plan  # pure projection: no shuffle at all


def test_combo_setops_sql_no_cartesian(spark, sf_dir):
    plan = executed_plan(spark, sf_dir, "combo_setops_sql")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_lsh_planes_are_subquery_not_literals(spark, sf_dir):
    # Hyperplanes ship via a scalar subquery over a one-row local table —
    # the plan must reference the subquery result, not embed O(bits x dim)
    # float literals, and must contain no join node for the planes.
    plan = executed_plan(spark, sf_dir, "combo_ann_approx")
    assert "Subquery" in plan or "scalar-subquery" in plan
    assert "CartesianProduct" not in plan


def test_combo_pagination_take_ordered(spark, sf_dir):
    plan = executed_plan(spark, sf_dir, "combo_pagination")
    assert "TakeOrderedAndProject" in plan

def _exchange_heads(plan: str) -> list[str]:
    """First line of every Exchange node — where the partitioning
    expressions (and thus the shuffled key columns) are printed."""
    return [seg.split("\n")[0] for seg in plan.split("Exchange ")[1:]]


def test_cc_star_shuffles_node_ids_only_no_python(spark):
    # The connected-components loop must stay JVM-side and shuffle ONLY
    # node-id columns — at 100 TB the iteration runs dozens of times, so a
    # payload column or Python node in the loop multiplies across rounds.
    from home_credit_data_engineering_spark.operators.dedup import (
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)] + [(500 + i, 700 + i) for i in range(50)],
        "doc_a long, doc_b long",
    )
    labels = connected_components_star(edges)
    labels.count()
    plan = labels._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    heads = _exchange_heads(plan)
    assert heads, "expected at least one exchange in the final labeling pass"
    # r14 default under a LOCAL master is the PARTITIONED path (the
    # groupBy-min exchange is reused by the SMJ — measured faster than
    # broadcasting; docs/EXPLAIN.md), so every exchange must shuffle
    # node-id columns only.
    shuffles = [h for h in heads if "BroadcastMode" not in h]
    for head in shuffles:
        assert (
            "node#" in head or "u#" in head or "v#" in head or "m#" in head
        ), f"CC shuffle not on a node-id column: {head}"
    # the cluster-shape broadcast path stays available and must ship the
    # min frames as BroadcastMode exchanges when forced
    blabels = connected_components_star(edges, broadcast_labels=True)
    blabels.count()
    bplan = blabels._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in bplan and "ArrowEvalPython" not in bplan
    assert [
        h for h in _exchange_heads(bplan) if "BroadcastMode" in h
    ], "forced broadcast-labels path should ship BroadcastMode exchanges"


def test_combo_dedup_near_no_payload_through_shuffles(spark, sf_dir):
    # Dedup shuffles carry ids + fixed-width hashes only: the raw document
    # text (and even derived shingle strings) must be md5'd away BEFORE
    # any Exchange — at 100 TB the banding shuffle is the pipeline's cost
    # center and must not carry kilobyte text payloads.
    plan = executed_plan(spark, sf_dir, "combo_dedup_near")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for head in _exchange_heads(plan):
        assert "text#" not in head and "gram#" not in head, head


def test_duplicated_spans_shuffles_ids_and_hashes_only(spark, sf_dir):
    # The substring-dedup pipeline (r4) must keep document text out of
    # every Exchange: window hashes are combined from per-token hashes
    # BEFORE any shuffle, and the islands/span stages move only
    # (doc_id, pos) pairs. At 100 TB the duplicated-hash aggregate is the
    # cost center and must carry 8-byte hashes, not kilobyte text.
    plan = executed_plan(spark, sf_dir, "text_duplicated_spans")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    heads = _exchange_heads(plan)
    assert heads, "expected shuffles (dup-hash aggregate + islands window)"
    for head in heads:
        assert "text#" not in head, f"document text riding a shuffle: {head}"


def test_strip_spans_single_small_shuffle(spark, sf_dir):
    # strip_spans collapses spans to per-doc arrays (small shuffle of int
    # triples) and filters tokens in ONE projection via nested
    # higher-order functions — the document text itself must never ride
    # an Exchange, and no Python may run.
    plan = executed_plan(spark, sf_dir, "text_strip_duplicate_spans")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for head in _exchange_heads(plan):
        assert "text#" not in head, f"document text riding a shuffle: {head}"


def test_sequence_packing_shuffles_metadata_only(spark, sf_dir):
    # pack_sequences must shuffle (shard, doc_id, token_count, perm key)
    # metadata — never document text. At 100 TB the packing exchange is
    # tens of MB per shard if and only if text stays out of it.
    plan = executed_plan(spark, sf_dir, "text_sequence_packing")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    heads = _exchange_heads(plan)
    assert heads, "expected the per-shard cumulative-sum exchange"
    for head in heads:
        assert "text#" not in head, f"document text riding a shuffle: {head}"


def test_weighted_sample_per_group_shuffles_metadata_only(spark, sf_dir):
    # weighted_sample_per_group must select winners over (group, id, key)
    # metadata — the document text joins back LEFT SEMI afterwards and
    # must never ride an Exchange (the pre-r6 one-window form shuffled
    # full rows onto ONE task per group; this gate pins the fix).
    from pyspark.sql import functions as F

    from home_credit_data_engineering_spark.operators.sampling import (
        weighted_sample_per_group,
    )
    from home_credit_data_engineering_spark.sources.readers import (
        read_testdata,
    )

    docs = read_testdata(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", "text"
    )
    out = weighted_sample_per_group(
        docs, "doc_id", "n_chars", "source", k=10, seed=7
    )
    out.count()  # finalize the adaptive plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    heads = _exchange_heads(plan)
    assert heads, "expected the (group, subshard) window exchange"
    for head in heads:
        assert "text#" not in head, f"payload riding a shuffle: {head}"
    # the payload side must come back via a semi join, not a window
    assert "LeftSemi" in plan

    # two-level sharded selection is bit-identical to the one-window form
    from pyspark.sql.window import Window as W

    md5 = F.md5(F.concat(F.lit("s7:"), F.col("doc_id").cast("string")))
    raw = F.conv(F.substring(md5, 1, 13), 16, 10).cast("double")
    u = (raw + F.lit(1.0)) / F.lit(float((1 << 52) + 1))
    key = F.round(-F.log(u) / F.col("n_chars").cast("double"), 9)
    win = W.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
    ref = (
        docs.filter(F.col("n_chars") > 0)
        .withColumn("__rk", F.row_number().over(win))
        .filter(F.col("__rk") <= 10)
    )
    got = {(r["source"], r["doc_id"]) for r in out.collect()}
    want = {(r["source"], r["doc_id"]) for r in ref.collect()}
    assert got == want


def test_bm25_no_python_text_never_shuffles_panel_broadcast(spark, sf_dir):
    # BM25 must stay JVM-side end to end: postings semi-join against the
    # BROADCAST term panel before tf/df aggregation, so only matching
    # (doc, term) pairs reach any Exchange — and the text column reaches
    # none (at 100 TB the postings shuffle is the cost center if and only
    # if text stays out of it and non-matching terms are pre-filtered).
    plan = executed_plan(spark, sf_dir, "text_bm25_topk")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    heads = _exchange_heads(plan)
    assert heads, "expected the tf/df aggregation exchanges"
    for head in heads:
        assert "text#" not in head, f"document text riding a shuffle: {head}"


def test_rrf_fuses_rank_triples_only(spark, sf_dir):
    # The hybrid-RRF fusion unions per-query top-k legs and aggregates
    # (query, doc, rank) triples — neither text nor embedding payloads
    # may ride the fusion exchange.
    plan = executed_plan(spark, sf_dir, "sim_hybrid_rrf")
    for head in _exchange_heads(plan):
        assert "text#" not in head, f"text riding the fusion shuffle: {head}"
        assert "embedding#" not in head, (
            f"embedding riding the fusion shuffle: {head}"
        )


def test_funnel_and_cohort_shuffle_user_ts_metadata_only(spark, sf_dir):
    # The funnel's per-transition joins and the cohort grid must move
    # (user, ts/day) pairs only — event payloads (props, value) never
    # ride an Exchange. At 100 TB the event stream is the big table;
    # these plans keep it projector-narrow before every shuffle.
    for name in ("events_funnel", "events_cohort_retention"):
        plan = executed_plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan
        for head in _exchange_heads(plan):
            assert "props#" not in head, f"{name}: payload in shuffle: {head}"
            assert "value#" not in head or "n_" in head, (
                f"{name}: payload in shuffle: {head}"
            )


def test_kmeans_broadcast_centroids_no_python(spark, sf_dir):
    # Each Lloyd iteration must (a) stay JVM-side — since r14 the
    # assignment is a NARROW pass: the k x dim centroid frame collapses
    # to one broadcast row of (cid, vector) structs and every point row
    # computes its argmin in place, never a Python eval and never a
    # shuffle of the point set (by centroid or otherwise) — and (b)
    # move only (id, ord, number) scalars through every Exchange (the
    # point arrays never ride a shuffle; the only data-sized aggregate
    # is the k x dim-cell centroid recompute). checkpoint=False keeps
    # the full iteration lineage visible, same as the pagerank gate.
    from home_credit_data_engineering_spark.operators.cluster import kmeans
    from home_credit_data_engineering_spark.sources.readers import read_testdata

    emb = read_testdata(spark, sf_dir, "embeddings")
    df = kmeans(emb, k=4, iterations=2, checkpoint=False)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the k-row init-seed attach
    for head in _exchange_heads(plan):
        assert "embedding#" not in head, f"vector payload in shuffle: {head}"
        assert "__a#" not in head, f"vector payload in shuffle: {head}"


def test_pagerank_no_python_no_cartesian(spark, sf_dir):
    # Each PageRank iteration must stay JVM-side: an equi-join of the
    # edge list against the (node, deg, rank) frame plus a decimal
    # aggregate — never a Python eval, never a cartesian; the 1-row
    # stats/dangling frames ride broadcasts. The production path
    # localCheckpoints per iteration (the final plan is just a
    # checkpointed-RDD scan), so the gate runs with checkpoint=False to
    # keep the whole iteration lineage visible.
    from pyspark.sql import functions as F

    from home_credit_data_engineering_spark.operators.graph import pagerank
    from home_credit_data_engineering_spark.sources.readers import read_testdata

    li = read_testdata(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = read_testdata(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    df = pagerank(edges, iterations=2, checkpoint=False)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_eval_auc_pre_aggregates_before_window_no_python(spark, sf_dir):
    # The AUC/ROC plan's only full-data pass must be a combinable hash
    # aggregate on the score (partial_sum before the exchange); the
    # single-partition window then runs over the DISTINCT-SCORE frame,
    # and nothing Python touches the row path. Document text must never
    # enter an exchange — only (score, counts) ride shuffles.
    for name in ("eval_binary_auc", "eval_roc_points"):
        plan = executed_plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "Window" in plan, name
        assert "partial_sum" in plan or "partial_count" in plan, name
        for head in _exchange_heads(plan):
            assert "text#" not in head, f"{name}: text in shuffle: {head}"


def test_eval_report_and_calibration_grid_only_no_python(spark, sf_dir):
    # Report: one groupBy(label, pred) over the rows; everything after
    # operates on the classes^2 grid. Calibration: one aggregate, no
    # window at all. Neither may evaluate Python or shuffle text.
    for name in ("eval_lang_report", "eval_score_calibration"):
        plan = executed_plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        for head in _exchange_heads(plan):
            assert "text#" not in head, f"{name}: text in shuffle: {head}"
    assert "Window" not in executed_plan(spark, sf_dir, "eval_score_calibration")


def test_pmi_collocations_take_ordered_no_window_no_python(spark, sf_dir):
    # Phrase mining: bigrams built JVM-side from the token array (no
    # Window, no Python), hash-aggregated with map-side combine; the
    # global top-k is TakeOrderedAndProject, never a full Sort+Limit;
    # document text never rides an exchange.
    plan = executed_plan(spark, sf_dir, "text_pmi_collocations")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan  # map-side combine on the bigram agg
    for head in _exchange_heads(plan):
        assert "text#" not in head, f"text in shuffle: {head}"


def test_token_label_chi2_single_full_pass_no_python(spark, sf_dir):
    # Counting is the fit: exactly one scan feeds the (token, label)
    # aggregate; totals are second-level aggregates over that frame
    # (the raw stream is never re-aggregated); label/grand totals ride
    # broadcasts; no Python anywhere; text never shuffles.
    plan = executed_plan(spark, sf_dir, "text_token_label_chi2")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    for head in _exchange_heads(plan):
        assert "text#" not in head, f"text in shuffle: {head}"


def test_markov_transitions_payloads_never_shuffle(spark, sf_dir):
    # One user-partitioned window + grid aggregate: event payloads
    # (props/value) must not appear in any exchange, and nothing Python
    # touches the row path.
    plan = executed_plan(spark, sf_dir, "events_markov_transitions")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    for head in _exchange_heads(plan):
        assert "props#" not in head and "value#" not in head, (
            f"payload in shuffle: {head}"
        )


def test_report_card_shuffles_hashes_not_text(spark, sf_dir):
    # The only per-document shuffle carries (source, lang, fp, additive
    # sums) — document text never rides an exchange; no Python.
    plan = executed_plan(spark, sf_dir, "corpus_report_card")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for head in _exchange_heads(plan):
        assert "text#" not in head, f"text in shuffle: {head}"


def test_weighted_median_group_partitioned_window_no_python(spark, sf_dir):
    # The cumulative window must partition by the group key (never a
    # single-partition global sort) and nothing Python touches the rows.
    plan = executed_plan(spark, sf_dir, "stats_weighted_median")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan
    assert "partitionBy: [l_returnflag" in plan.replace("Spec", "") or (
        "l_returnflag" in plan and "Window" in plan
    )


def test_snapshot_drift_single_aggregate_per_side_no_python(spark, sf_dir):
    # Profile counts come from ONE aggregate pass per side (expand for
    # the multi-distinct is fine); text never rides an exchange.
    plan = executed_plan(spark, sf_dir, "quality_snapshot_drift")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    for head in _exchange_heads(plan):
        assert "text#" not in head, f"text in shuffle: {head}"


def test_corpus_pipeline_ledger_no_python_no_cartesian(spark, sf_dir):
    # Six stage frames + five 1-row count aggregates: everything stays
    # JVM-side (md5 minhash twin, window-equality spans, higher-order
    # exprs) and the 1-row crossJoins must plan as broadcast nested
    # loops, never partitioned CartesianProduct.
    plan = executed_plan(spark, sf_dir, "corpus_pipeline_ledger")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_join_skew_salted_broadcast_no_python(spark, sf_dir):
    # The salted dim (1000 rows x 16 salts) must broadcast; the hot-key
    # side never meets a partitioned cartesian or Python.
    plan = executed_plan(spark, sf_dir, "join_skew_salted")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
