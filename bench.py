#!/usr/bin/env python3
"""Benchmark harness: runs the headline declared queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock of all headline queries (each executed to
completion with a count-style action so every plan runs end-to-end, but no
driver-side materialization of full results).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)

    from home_credit_data_engineering_spark.session import get_session

    import home_credit_data_engineering_spark.plans.declared  # noqa: F401
    from home_credit_data_engineering_spark.plans.registry import REGISTRY, prep

    spark = get_session(
        app_name="hcde-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        # local[N] runs every task thread inside the driver JVM; the 1g
        # default heap starves N=32 sort/agg tasks at the 10x scaled leg.
        # Must be set before the JVM launches, hence here.
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")},
    )
    prep(spark)

    # Headline queries: the flagship medallion shapes + heaviest operators.
    headline = [
        # medallion / relational core
        "q1_pricing_summary",
        "w1_latest_per_key",
        "j1_left_join_latest",
        "j2_star_assembly",
        "a1_multi_measure_agg",
        "a5_pivot_status_counts",
        "topk_per_group",
        "window_running_frame",
        "j_asof_join",
        "p6_validation_filter",
        "q5_region_revenue",
        "q18_large_orders",
        # corpus prep (new r4): substring-span dedup + zero-shuffle chunking
        "text_duplicated_spans",
        "text_chunk_windows",
        # training-data pipeline extensions
        "dedup_minhash_lsh",
        "sim_bruteforce_topk",
        "text_token_stats",
        "sessionize_gap",
        "multimodal_decode_stub",
        # heavy extension coverage (VERDICT r1 item 4)
        "dedup_simhash",
        "text_winnowing_fingerprints",
        "sim_ivf_topk",
        # r5 additions: CCNet perplexity (two-level agg + token join) and
        # policy-based survivor selection (canonical fingerprint + min_by)
        "text_lm_perplexity",
        "dedup_canonical_best",
        # r6 additions: trigram Stupid Backoff (flat equi-join chain) and
        # real BPE token counts (Arrow-batched merge loop, narrow scan)
        "text_trigram_backoff_ppl",
        "text_bpe_real_token_count",
        # r6 retrieval/graph/behavioral surface: BM25 (postings semi-join
        # + decimal agg), hybrid RRF fusion (two top-k legs), 3-iteration
        # PageRank over the trade graph, ordered funnel + cohort grid
        "text_bm25_topk",
        "sim_hybrid_rrf",
        "graph_pagerank",
        "events_funnel",
        "events_cohort_retention",
        # r7: distributed Lloyd's k-means over the full embeddings table
        # (broadcast-centroid iterations, exact-decimal distances)
        "sim_kmeans_clusters",
        # r7 (2): multi-source BFS over the co-supplier graph (edge
        # build + 4 Bellman-Ford rounds), KMV distinct sketch (bounded
        # fold + partitions*k merge), and corpus divergence (two
        # aggregates + vocab-sized decimal frame)
        "graph_shortest_paths",
        "stats_kmv_distinct",
        "text_corpus_divergence",
        # r7 (3): the analytics/evaluation additions — per-source report
        # card (aggregate families + distinct-fp), chi2 feature selection
        # (one (token, label) pass + grid arithmetic), and the Markov
        # journey matrix (user-partitioned window + grid aggregate)
        "corpus_report_card",
        "text_token_label_chi2",
        "events_markov_transitions",
        # r7 (4): PMI phrase mining — transform-built bigram stream,
        # vocab-bounded aggregate, TakeOrderedAndProject top-k
        "text_pmi_collocations",
        # r9: skew-stress salted join, unigram-LM Viterbi stats (Arrow
        # map, no shuffle), GK-threshold approx RFM verdict, and the
        # epoch reshuffle permutation (one exchange). The composed
        # corpus_pipeline_ledger is deliberately NOT here: it times the
        # md5 ORACLE TWIN of the near stage, not the production xxhash
        # path, which the dedup legs already cover.
        "join_skew_salted",
        "text_unigram_token_stats",
        "events_rfm_approx_verdict",
        "pack_epoch_shuffle",
        # r10: end-to-end entity resolution — blocked pair generation,
        # codegen levenshtein scoring, alternating-star CC, survivor
        # join-back. Blocks stay bounded as SF grows (the prefix key
        # refines with the id width), so this leg times the CC rounds.
        "er_resolved_entities",
    ]
    headline = [name for name in headline if name in REGISTRY]

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup.
    REGISTRY[headline[0]].build(spark, sf_dir).count()

    # Bench numbers on a shared box need noise context to be legible
    # (VERDICT r3 #6): record host load before/after and the per-query
    # min/median spread so a +-30% swing on a 0.1 s query is
    # distinguishable from a regression without re-running.
    load_before = [round(x, 2) for x in os.getloadavg()]

    runs = max(2, int(os.environ.get("SPARK_GRAFT_RUNS", "3")))
    # INTERLEAVED passes (pass 1 over every query, then pass 2, ...)
    # instead of back-to-back runs per query: the box suffers multi-second
    # external load bursts, and back-to-back sampling lets one burst sink
    # every sample of whichever query it lands on; spreading a query's N
    # samples across the whole suite's duration makes min-of-N burst-
    # robust. First pass additionally warms file-index/code caches, so
    # the minimum measures the query.
    all_samples: dict[str, list[float]] = {name: [] for name in headline}
    for _ in range(runs):
        for name in headline:
            start = time.perf_counter()
            # Execute the full plan; count() forces every operator while
            # keeping the driver out of the data path.
            REGISTRY[name].build(spark, sf_dir).count()
            all_samples[name].append(time.perf_counter() - start)
            # Several operators persist multi-consumer intermediates for
            # the duration of their plan (minhash signatures/candidates,
            # CC frontiers). Dropping them between queries keeps storage
            # memory from accumulating across the suite — without this,
            # late queries time their own work PLUS earlier queries'
            # spill pressure (6-25x inflation observed at 21 queries).
            spark.catalog.clearCache()
    timings: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    for name, samples in all_samples.items():
        samples.sort()
        timings[name] = round(samples[0], 3)
        spread[name] = {
            "med": round(samples[len(samples) // 2], 3),
            "max": round(samples[-1], 3),
        }

    # Connected components over real near-dup edges (not a declared query:
    # the label output depends on engine hash order only through edge
    # content, and edges come from the no-oracle MinHash path) — benched
    # because it is the clustering step every dedup pipeline ends with.
    from home_credit_data_engineering_spark.operators.dedup import (
        connected_components_star,
        minhash_dedup,
    )
    from home_credit_data_engineering_spark.sources.readers import read_testdata

    # Single timed run: the pipeline is iterative (its cost is per-round
    # job latency, not data volume at this SF), so a second run would
    # only re-pay fixed overhead.
    start = time.perf_counter()
    docs = read_testdata(spark, sf_dir, "documents")
    edges = minhash_dedup(
        docs, "doc_id", "text", num_hashes=32, bands=8, threshold=0.2
    ).select("doc_a", "doc_b")
    connected_components_star(edges).count()
    timings["dedup_cc_star"] = round(time.perf_counter() - start, 3)
    spark.catalog.clearCache()

    # O(Δ) ANN index increment: the index build is UNTIMED setup; the
    # timed section folds a fixed 2,000-vector delta into it
    # (ann_state.ivf_index_increment). The number to read across SFs:
    # it must stay ~flat as the corpus grows, because the increment
    # touches only the centroid sidecar and the cells-sized stats
    # table, never the stored corpus partitions (proven structurally in
    # tests/test_ann_incremental.py by garbling them first). The SAME
    # helper times the 10x scaled twin, so both legs measure one
    # configuration by construction.
    from bench_scaled import _time_ann_increment

    timings["ann_ivf_increment_delta"] = round(
        min(_time_ann_increment(spark, sf_dir, runs=1)), 3
    )
    spark.catalog.clearCache()

    # Self-adjudication (VERDICT r5 #2): solo-re-probe any query whose
    # min regressed >1.5x vs the committed quiet-box reference — in a
    # FRESH subprocess JVM, because the long-lived suite JVM degrades
    # over the run and would bias verdicts toward "regressed" — and
    # emit a per-query noise/regressed verdict, so a loaded box can no
    # longer make cross-round comparison a judgment call.
    from bench_scaled import adjudicate, load_bench_ref

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: object = float(sf)
    except ValueError:
        sf_val = sf
    # always_probe_top=5 (VERDICT r13 #3): scaled legs had forced solo
    # probes since r8 but headline legs had none — r13 shipped a +14%
    # headline sum from a loaded box with an EMPTY verdicts block, a
    # blind spot the judge had to resolve by re-running. The five most
    # expensive headline legs by reference now get unconditional
    # fresh-JVM telemetry every run.
    verdicts = adjudicate(
        sf_dir,
        timings,
        load_bench_ref("headline", sf_val),
        always_probe_top=5,
    )

    # Load gate (VERDICT r12 #7): flag a hot box IN the artifact and on
    # stderr, so a noise-dominated snapshot carries its own caveat.
    # Gated on the PRE-run load only — the post-run 1-min average is
    # dominated by the bench's own 32-thread work (measured: a healthy
    # quiet-start run reads 8.4 after the headline loop), so folding it
    # in makes every run self-flag. Mid-run external bursts are the
    # adjudicator's job: they trip the 1.5x trigger and resolve via
    # fresh-JVM probes with their own load telemetry. load_avg_after is
    # still recorded for context.
    from bench_scaled import load_gate

    load_after = [round(x, 2) for x in os.getloadavg()]
    gate = load_gate(load_before[0])
    if gate["warning"]:
        print(gate["warning"], file=sys.stderr)

    result = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # Effective-session echo (VERDICT r14 #2a): the driver's scaling
        # probe concluded `suspect_cpus_ignored` because the artifact
        # never proved which master/core budget produced the numbers —
        # these three fields make the knob's effect verifiable from the
        # one-line JSON alone.
        "master": f"local[{cpus}]",
        "cpus": int(cpus),
        "sf_dir": sf_dir,
        "runs_per_query": runs,
        "queries_spread": spread,
        "verdicts": verdicts,
        "load_avg_before": load_before,
        "load_avg_after": load_after,
        "load_gate": gate,
    }

    spark.stop()

    # Second scale factor (scaling-trend evidence): 10x id-shifted
    # replicas of the sf0.1 tables approximate sf1. Opt out with
    # SPARK_GRAFT_SCALED=0. Runs in a SUBPROCESS (fresh JVM): after the
    # 22-query headline suite the long-lived JVM measurably degrades
    # (GC/metaspace/python-worker accumulation inflated scaled timings
    # 3-10x), and the scaled leg should time the queries, not the
    # session's history.
    if os.environ.get("SPARK_GRAFT_SCALED", "1") != "0" and isinstance(
        sf_val, float
    ):
        import subprocess

        proc = subprocess.run(
            [sys.executable, "bench_scaled.py", sf_dir],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            # the scaled leg's load gate needs the TRUE suite-start
            # load — its own getloadavg() would read the headline
            # suite's just-finished work
            env={
                **os.environ,
                "SPARK_GRAFT_LOAD_AT_SUITE_START": str(load_before[0]),
            },
        )
        if proc.returncode == 0 and proc.stdout.strip():
            scaled = json.loads(proc.stdout.strip().splitlines()[-1])
            result["sf_scaled"] = round(sf_val * 10, 3)
            result["queries_scaled"] = scaled["queries"]
            result["queries_scaled_spread"] = scaled["spread"]
            result["verdicts_scaled"] = scaled.get("verdicts", {})
            result["value_scaled"] = round(sum(scaled["queries"].values()), 3)
            if "load_gate" in scaled:
                result["load_gate_scaled"] = scaled["load_gate"]
        else:
            # A failed scaled leg must be VISIBLE in the artifact — a
            # silently missing section reads as "not run" (r6: a stale
            # replica cache missing a newly-needed table failed here and
            # the result JSON gave no hint).
            tail = (proc.stderr or proc.stdout or "").strip().splitlines()
            result["scaled_error"] = " | ".join(tail[-3:]) or (
                f"bench_scaled exited {proc.returncode}"
            )

    line = json.dumps(result)
    # Tail-safe stdout line (VERDICT r14 #2c): the driver records only
    # the LAST 2000 characters of stdout, and the full result object
    # (~10 KB with spreads/verdicts/scaled detail) overflows that window
    # — r13's round-over-round PERF table was lost to exactly this. The
    # printed line keeps the driver contract (metric/value/unit/queries/
    # sf, plus the effective master/cpus/sf_dir echo and the scaled-sum
    # scalar) and points at the durable full artifact; every diagnostic
    # key (spreads, verdicts, per-leg scaled timings, load telemetry)
    # still lands in BOTH file copies below. No `queries` entry is ever
    # dropped from the printed line.
    compact_keys = (
        "metric", "value", "unit", "queries", "sf", "master", "cpus",
        "sf_dir", "runs_per_query", "value_scaled", "sf_scaled",
        "scaled_error",
    )
    compact = {k: result[k] for k in compact_keys if k in result}
    compact["load_hot"] = bool(
        result["load_gate"]["hot"]
        or result.get("load_gate_scaled", {}).get("hot", False)
    )
    compact["detail"] = "BENCH_FULL_LATEST.json"
    compact_line = json.dumps(compact)
    if len(compact_line) > 1900:
        # never let the printed line outgrow the tail window: drop the
        # decoration keys first, never `queries`
        for k in ("detail", "sf_dir", "master"):
            compact.pop(k, None)
            compact_line = json.dumps(compact)
            if len(compact_line) <= 1900:
                break
    # The driver captures only the tail of stdout (r4's headline metric
    # was truncated away); the file copy is the durable record. The path
    # is gitignored (ADVICE r5: local runs must not dirty the tree with
    # machine-specific numbers); committed snapshots are a deliberate
    # separate artifact (BENCH_r{N}.json / BENCH_REF.json).
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_result.json"
    )
    with open(out_path, "w", encoding="utf-8") as fh:
        fh.write(line + "\n")
    # ADVICE r8: the driver's BENCH_r{N}.json keeps only a 2000-char stdout
    # tail, so the committed per-round snapshot truncates the full result
    # line (parsed: null) and the evidence the verdict cites lives only in
    # the gitignored bench_result.json until the next run overwrites it.
    # This TRACKED copy makes the full object durable: the driver's
    # round-end bench run leaves it dirty, and the next round's first
    # commit lands it in history as self-contained evidence.
    tracked = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL_LATEST.json"
    )
    with open(tracked, "w", encoding="utf-8") as fh:
        fh.write(line + "\n")
    print(compact_line)


if __name__ == "__main__":
    sys.exit(main())
