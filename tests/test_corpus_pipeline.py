"""Golden end-to-end test of the composed corpus pipeline
(``plans/corpus_pipeline.py`` + ``jobs/corpus_pipeline.py``): a planted
fixture exercises EVERY stage transition — quality drop, exact dup,
near dup, full + partial benchmark contamination — and the test pins
the per-stage ledger exactly and the final packed shard CONTENT
(token ids per document, FFD concatenation order, budget invariant)
against the pure-Python BPE reference."""

from __future__ import annotations

import hashlib
import json

import pytest

from home_credit_data_engineering_spark.functions.bpe import (
    bpe_encode_ids,
    load_merges,
    merge_ranks,
    vocab_from_merges,
)
from home_credit_data_engineering_spark.jobs import corpus_pipeline as pipeline_job
from home_credit_data_engineering_spark.runlog import read_run_log

#: 20 distinct tokens — survives quality, no benchmark overlap.
_TEXT_A = " ".join(f"alpha{i} beta{i}" for i in range(10))
#: near-dup of A: last token differs (3-shingle jaccard 17/19 ~ 0.89).
_TEXT_A_NEAR = _TEXT_A.rsplit(" ", 1)[0] + " omega"
#: 10-token phrase present verbatim in the benchmark.
_PHRASE = "the quick brown fox jumps over seven lazy crimson dogs"
#: partially contaminated: 4 unique tokens + phrase + 4 unique tokens.
_TEXT_PARTIAL = "pre1 pre2 pre3 pre4 " + _PHRASE + " post1 post2 post3 post4"
#: what decontamination must leave of it (phrase tokens stripped).
_TEXT_PARTIAL_CLEAN = "pre1 pre2 pre3 pre4 post1 post2 post3 post4"
_TEXT_B = " ".join(f"gamma{i} delta{i}" for i in range(8))

_DOCS = [
    # (doc_id, text, lang, source)
    (1, _TEXT_A, "en", "src_a"),                  # survives everything
    (2, _TEXT_A, "en", "src_a"),                  # exact dup of 1
    (3, _TEXT_A_NEAR, "en", "src_a"),             # near dup of 1
    (4, "too short", "en", "src_a"),              # quality: min_tokens
    (5, "!!! @@@ ### $$$ %%% ^^^ &&&", "en", "src_a"),  # quality: symbols
    (6, _PHRASE, "en", "src_a"),                  # fully contaminated
    (7, _TEXT_PARTIAL, "en", "src_a"),            # partially contaminated
    (8, _TEXT_B, "en", "src_b"),                  # survives, second source
]
_BENCH = [(1001, "benchmark intro words " + _PHRASE + " benchmark outro words")]

#: (stage, rows_in, rows_out, rows_removed) — the golden ledger.
_EXPECTED_LEDGER = [
    (1, "quality", 8, 6, 2),
    (2, "dedup_exact", 6, 5, 1),
    (3, "dedup_near", 5, 4, 1),
    (4, "decontaminate", 4, 3, 1),
    (5, "report_card", 3, 3, 0),
    (6, "pack", 3, 3, 0),
]
#: doc_id → text the packer must have encoded (post-decontamination).
_EXPECTED_TEXTS = {1: _TEXT_A, 7: _TEXT_PARTIAL_CLEAN, 8: _TEXT_B}
_BUDGET = 512


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("corpus_pipeline")
    docs_path = str(base / "docs")
    bench_path = str(base / "bench")
    out_dir = str(base / "out")
    spark.createDataFrame(
        _DOCS, "doc_id bigint, text string, lang string, source string"
    ).write.parquet(docs_path)
    spark.createDataFrame(
        _BENCH, "doc_id bigint, text string"
    ).write.parquet(bench_path)
    rc = pipeline_job.main(
        [
            "--input", docs_path,
            "--benchmark", bench_path,
            "--output-dir", out_dir,
            "--budget", str(_BUDGET),
            "--shards", "4",
        ]
    )
    assert rc == 0
    return {"out": out_dir}


def test_ledger_golden(spark, pipeline_run):
    rows = (
        spark.read.parquet(pipeline_run["out"] + "/ledger")
        .orderBy("stage_order")
        .collect()
    )
    got = [
        (r.stage_order, r.stage, r.rows_in, r.rows_out, r.rows_removed)
        for r in rows
    ]
    assert got == _EXPECTED_LEDGER


def test_clean_corpus_contract(spark, pipeline_run):
    clean = spark.read.parquet(pipeline_run["out"] + "/clean")
    # inter-stage contract: original columns survive, text replaced,
    # removed_tokens appended
    assert set(clean.columns) == {
        "doc_id", "text", "lang", "source", "removed_tokens"
    }
    by_id = {r.doc_id: r for r in clean.collect()}
    assert set(by_id) == set(_EXPECTED_TEXTS)
    for doc_id, text in _EXPECTED_TEXTS.items():
        assert by_id[doc_id].text == text
    assert by_id[7].removed_tokens == 10  # the stripped phrase
    assert by_id[1].removed_tokens == 0


def test_audit_artifacts(spark, pipeline_run):
    dropped = spark.read.parquet(pipeline_run["out"] + "/quality_dropped")
    got = {r.doc_id: r.failed_rules for r in dropped.collect()}
    assert set(got) == {4, 5}
    assert "min_tokens" in got[4]
    assert "symbol_ratio" in got[5]
    removals = spark.read.parquet(pipeline_run["out"] + "/dedup_removals")
    rem = {(r.doc_id, r.reason, r.survivor_id) for r in removals.collect()}
    assert rem == {(2, "exact", 1), (3, "near", 1)}
    card = spark.read.parquet(pipeline_run["out"] + "/card")
    by_source = {r.source: r for r in card.collect()}
    assert set(by_source) == {"src_a", "src_b"}
    assert by_source["src_a"].n_docs == 2  # docs 1 and 7
    assert by_source["src_b"].n_docs == 1


def test_packed_shards_golden_bytes(spark, pipeline_run):
    """The trainer-facing artifact, byte-for-byte: each document's slice
    of the concatenated token_ids equals the pure-Python BPE reference
    encoding of its post-decontamination text, offsets are exact
    prefix sums, and every bin respects the budget."""
    merges = load_merges()
    ranks, vocab = merge_ranks(merges), vocab_from_merges(merges)
    expected_ids = {
        doc_id: bpe_encode_ids(text, ranks, vocab)
        for doc_id, text in _EXPECTED_TEXTS.items()
    }
    packed = spark.read.parquet(pipeline_run["out"] + "/packed").collect()
    seen: dict[int, list[int]] = {}
    for bin_row in packed:
        assert bin_row.n_tokens <= _BUDGET
        assert len(bin_row.token_ids) == bin_row.n_tokens
        assert list(bin_row.doc_starts) == [
            sum(bin_row.doc_sizes[:i]) for i in range(len(bin_row.doc_sizes))
        ]
        for doc_id, start, size in zip(
            bin_row.doc_ids, bin_row.doc_starts, bin_row.doc_sizes
        ):
            seen[doc_id] = list(bin_row.token_ids[start : start + size])
    assert seen == expected_ids
    # one stable digest over the full shard content, derived from the
    # SAME reference — a regression in packing order or encoding flips it
    digest = hashlib.md5(
        json.dumps(sorted(seen.items())).encode()
    ).hexdigest()
    expected_digest = hashlib.md5(
        json.dumps(sorted((k, v) for k, v in expected_ids.items())).encode()
    ).hexdigest()
    assert digest == expected_digest


def test_run_log_and_reference_dedup_path(spark, tmp_path):
    """--no-collapse-exact (reference minhash path) yields the SAME
    ledger, and --run-log appends one parseable record with extras."""
    docs_path = str(tmp_path / "docs")
    bench_path = str(tmp_path / "bench")
    out_dir = str(tmp_path / "out")
    run_log = str(tmp_path / "run.jsonl")
    spark.createDataFrame(
        _DOCS, "doc_id bigint, text string, lang string, source string"
    ).write.parquet(docs_path)
    spark.createDataFrame(
        _BENCH, "doc_id bigint, text string"
    ).write.parquet(bench_path)
    rc = pipeline_job.main(
        [
            "--input", docs_path,
            "--benchmark", bench_path,
            "--output-dir", out_dir,
            "--budget", str(_BUDGET),
            "--shards", "4",
            "--no-collapse-exact",
            "--run-log", run_log,
        ]
    )
    assert rc == 0
    records = read_run_log(run_log)
    assert len(records) == 1
    rec = records[0]
    assert rec["job"] == "corpus_pipeline"
    got = [
        (r["stage_order"], r["stage"], r["rows_in"], r["rows_out"],
         r["rows_removed"])
        for r in rec["ledger"]
    ]
    assert got == _EXPECTED_LEDGER
    # 10 from the stripped phrase in doc 7 + all 10 of fully-covered doc 6
    # (strip accounting runs before the empty-doc drop, by design)
    assert rec["extras"]["decontaminate"]["tokens_removed"] == 20
    assert rec["extras"]["pack"]["n_bins"] >= 1
    assert rec["extras"]["quality"]["rule_drops"]["min_tokens"] == 1
    assert set(rec["stage_seconds"]) == {
        "quality", "dedup", "decontaminate", "report_card", "pack"
    }


def test_pipeline_with_unigram_tokenizer(spark, tmp_path):
    """--tokenizer unigram: the pipeline trains a unigram-LM vocab on
    the CLEANED corpus, saves it, and packs its token ids — the
    items-2+4 composition. Packed slices must equal the Viterbi
    encoding of the expected surviving texts under the saved vocab."""
    from home_credit_data_engineering_spark.functions.unigram import (
        load_unigram,
        unigram_encode_ids,
        unigram_vocab_ids,
    )

    docs_path = str(tmp_path / "docs")
    bench_path = str(tmp_path / "bench")
    out_dir = str(tmp_path / "out")
    spark.createDataFrame(
        _DOCS, "doc_id bigint, text string, lang string, source string"
    ).write.parquet(docs_path)
    spark.createDataFrame(
        _BENCH, "doc_id bigint, text string"
    ).write.parquet(bench_path)
    rc = pipeline_job.main(
        [
            "--input", docs_path,
            "--benchmark", bench_path,
            "--output-dir", out_dir,
            "--budget", str(_BUDGET),
            "--shards", "4",
            "--tokenizer", "unigram",
            "--unigram-vocab-size", "128",
        ]
    )
    assert rc == 0
    # same document ledger regardless of tokenizer
    rows = (
        spark.read.parquet(out_dir + "/ledger").orderBy("stage_order").collect()
    )
    got = [
        (r.stage_order, r.stage, r.rows_in, r.rows_out, r.rows_removed)
        for r in rows
    ]
    assert got == _EXPECTED_LEDGER
    vocab = load_unigram(out_dir + "/unigram.vocab")
    logp, ids = dict(vocab), unigram_vocab_ids(dict(vocab))
    expected = {
        doc_id: unigram_encode_ids(text, logp, ids)
        for doc_id, text in _EXPECTED_TEXTS.items()
    }
    packed = spark.read.parquet(out_dir + "/packed").collect()
    seen = {}
    for b in packed:
        assert b.n_tokens <= _BUDGET
        for doc_id, start, size in zip(b.doc_ids, b.doc_starts, b.doc_sizes):
            seen[doc_id] = list(b.token_ids[start : start + size])
    assert seen == expected


def test_incremental_pipeline_equals_full_recompute(spark, tmp_path):
    """Two daily increments (monotone ids, cross-batch exact + near
    duplicates and contamination) must produce the same cleaned corpus,
    removals, and report card as ONE full-pipeline run over the union —
    while each increment only probes touched state."""
    batch1 = [d for d in _DOCS if d[0] in (1, 4, 6, 8)]
    batch2 = [d for d in _DOCS if d[0] in (2, 3, 5, 7)]
    schema = "doc_id bigint, text string, lang string, source string"
    b1, b2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame(batch1, schema).write.parquet(b1)
    spark.createDataFrame(batch2, schema).write.parquet(b2)
    spark.createDataFrame(_BENCH, "doc_id bigint, text string").write.parquet(
        bench_path
    )
    state = str(tmp_path / "state")
    out1, out2 = str(tmp_path / "day1"), str(tmp_path / "day2")
    common = ["--benchmark", bench_path, "--budget", str(_BUDGET),
              "--shards", "4", "--state-dir", state]
    assert pipeline_job.main(
        ["--input", b1, "--output-dir", out1, *common]
    ) == 0
    assert pipeline_job.main(
        ["--input", b2, "--output-dir", out2, *common]
    ) == 0

    # day-1 ledger: quality drops 4, contamination drops 6
    led1 = {
        r.stage: (r.rows_in, r.rows_out)
        for r in spark.read.parquet(out1 + "/ledger").collect()
    }
    assert led1["quality"] == (4, 3)
    assert led1["dedup_exact"] == (3, 3) and led1["dedup_near"] == (3, 3)
    assert led1["decontaminate"] == (3, 2) and led1["pack"] == (2, 2)
    # day-2 ledger: quality drops 5, history exact-dups 2, near-dups 3
    led2 = {
        r.stage: (r.rows_in, r.rows_out)
        for r in spark.read.parquet(out2 + "/ledger").collect()
    }
    assert led2["quality"] == (4, 3)
    assert led2["dedup_exact"] == (3, 2)  # doc 2 == accepted doc 1
    assert led2["dedup_near"] == (2, 1)   # doc 3 ~ accepted doc 1
    assert led2["decontaminate"] == (1, 1) and led2["pack"] == (1, 1)
    rem2 = {
        (r.doc_id, r.reason, r.survivor_id)
        for r in spark.read.parquet(out2 + "/dedup_removals").collect()
    }
    assert rem2 == {(2, "exact_hist", 1), (3, "near", 1)}

    # union of per-batch clean corpora == the full recompute's clean set
    full_out = str(tmp_path / "full")
    docs_all = str(tmp_path / "all")
    spark.createDataFrame(_DOCS, schema).write.parquet(docs_all)
    assert pipeline_job.main(
        ["--input", docs_all, "--benchmark", bench_path,
         "--output-dir", full_out, "--budget", str(_BUDGET), "--shards", "4"]
    ) == 0
    full_clean = {
        r.doc_id: r.text
        for r in spark.read.parquet(full_out + "/clean").collect()
    }
    inc_clean = {
        r.doc_id: r.text
        for r in spark.read.parquet(out1 + "/clean")
        .unionByName(spark.read.parquet(out2 + "/clean"))
        .collect()
    }
    assert inc_clean == full_clean
    # the MERGED card state finalizes to the full run's card
    full_card = {
        tuple(r) for r in spark.read.parquet(full_out + "/card").collect()
    }
    inc_card = {
        tuple(r) for r in spark.read.parquet(out2 + "/card").collect()
    }
    assert inc_card == full_card


def test_full_coverage_via_overlapping_spans_drops_doc(spark):
    """Review r9 regression: a doc whose hit windows are NON-consecutive
    (positions 0 and 2, miss at 1; k=3) still loses EVERY token to the
    span union — the pipeline (and the ledger criterion) must drop it,
    even though no single span covers the whole doc."""
    from pyspark.sql import functions as F

    from home_credit_data_engineering_spark.operators.spans import (
        contaminated_spans,
        strip_spans,
    )

    train = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4")], "doc_id bigint, text string"
    )
    bench = spark.createDataFrame(
        [(100, "t0 t1 t2"), (101, "t2 t3 t4")], "doc_id bigint, text string"
    )
    spans = contaminated_spans(train, bench, "doc_id", "text", k=3)
    rows = sorted(
        (r.span_start, r.span_end) for r in spans.collect()
    )
    assert rows == [(0, 2), (2, 4)]  # two overlapping spans, not one
    stripped = strip_spans(train, spans, "doc_id", "text")
    out = stripped.collect()[0]
    assert out.text_clean == "" and out.removed_tokens == 5
    # the production drop criterion (what corpus_pipeline_ledger mirrors)
    survivors = stripped.filter(F.trim("text_clean") != "").count()
    assert survivors == 0


def test_increment_replay_is_idempotent(spark, tmp_path):
    """Review r9 regression: re-running the SAME batch against the same
    state (an at-least-once redelivery after a crash anywhere in the
    increment) must reproduce the same clean output and leave state
    unchanged — in particular the batch must NOT be removed as
    duplicates of its own crashed run, and the report card must not
    double-count."""
    from home_credit_data_engineering_spark.plans.corpus_pipeline import (
        corpus_pipeline_increment,
    )

    schema = "doc_id bigint, text string, lang string, source string"
    batch = spark.createDataFrame(
        [d for d in _DOCS if d[0] in (1, 2, 8)], schema
    )
    bench = spark.createDataFrame(_BENCH, "doc_id bigint, text string")
    state = str(tmp_path / "state")
    out1, out2 = str(tmp_path / "run1"), str(tmp_path / "run2")
    r1 = corpus_pipeline_increment(
        spark, batch, bench, state, out1, budget=_BUDGET, shards=4
    )
    led1 = [
        (d["stage"], d["rows_in"], d["rows_out"]) for d in r1["report"].ledger
    ]
    fp1 = sorted(
        (r.fp, r.keep_id)
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{state}/fingerprints")
        .collect()
    )
    card1 = sorted(
        tuple(r) for r in spark.read.parquet(out1 + "/card").collect()
    )
    # replay the identical batch (same ids -> same state subdirs)
    r2 = corpus_pipeline_increment(
        spark, batch, bench, state, out2, budget=_BUDGET, shards=4
    )
    led2 = [
        (d["stage"], d["rows_in"], d["rows_out"]) for d in r2["report"].ledger
    ]
    assert led2 == led1  # docs NOT removed as dups of the crashed run
    assert sorted(
        (r.fp, r.keep_id)
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(f"{state}/fingerprints")
        .collect()
    ) == fp1
    assert sorted(
        tuple(r) for r in spark.read.parquet(out2 + "/card").collect()
    ) == card1  # card state did not double-count
    clean1 = {r.doc_id: r.text for r in spark.read.parquet(out1 + "/clean").collect()}
    clean2 = {r.doc_id: r.text for r in spark.read.parquet(out2 + "/clean").collect()}
    assert clean1 == clean2 == {
        k: v for k, v in _EXPECTED_TEXTS.items() if k in (1, 8)
    }


def test_pipeline_maintains_bm25_index(spark, tmp_path):
    """--bm25-index: the pipeline's serving leg. Day 1 builds the index
    over the clean output, day 2 folds exactly; queries against the
    maintained index equal a one-shot build over BOTH days' clean
    corpora (removed duplicates never indexed)."""
    from home_credit_data_engineering_spark.operators.retrieval import (
        bm25_query_index,
        build_bm25_index,
    )

    batch1 = [d for d in _DOCS if d[0] in (1, 4, 6, 8)]
    batch2 = [d for d in _DOCS if d[0] in (2, 3, 5, 7)]
    schema = "doc_id bigint, text string, lang string, source string"
    b1, b2 = str(tmp_path / "b1"), str(tmp_path / "b2")
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame(batch1, schema).write.parquet(b1)
    spark.createDataFrame(batch2, schema).write.parquet(b2)
    spark.createDataFrame(_BENCH, "doc_id bigint, text string").write.parquet(
        bench_path
    )
    state = str(tmp_path / "state")
    idx = str(tmp_path / "bm25_idx")
    out1, out2 = str(tmp_path / "day1"), str(tmp_path / "day2")
    common = ["--benchmark", bench_path, "--budget", str(_BUDGET),
              "--shards", "4", "--state-dir", state,
              "--bm25-index", idx, "--bm25-buckets", "8"]
    assert pipeline_job.main(
        ["--input", b1, "--output-dir", out1, *common]
    ) == 0
    assert pipeline_job.main(
        ["--input", b2, "--output-dir", out2, *common]
    ) == 0

    clean_union = spark.read.parquet(out1 + "/clean").unionByName(
        spark.read.parquet(out2 + "/clean")
    )
    full_idx = str(tmp_path / "full_idx")
    build_bm25_index(
        clean_union.select("doc_id", "text"), full_idx, n_buckets=8
    )
    panel = spark.createDataFrame(
        [(1, t) for t in ("alpha3", "omega", "gamma2", "pre1")],
        "query_id long, term string",
    )
    got = sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rank"])
        for r in bm25_query_index(spark, idx, panel, k=5, n_buckets=8)
        .collect()
    )
    want = sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rank"])
        for r in bm25_query_index(spark, full_idx, panel, k=5, n_buckets=8)
        .collect()
    )
    assert got == want and len(got) > 0
    # indexed docs == clean docs exactly (dropped/removed never indexed)
    assert spark.read.parquet(f"{idx}/doclens").count() == (
        clean_union.count()
    )

    # replaying day 2 (the pipeline state's at-least-once recovery)
    # must SKIP the non-idempotent fold: counts unchanged
    assert pipeline_job.main(
        ["--input", b2, "--output-dir", str(tmp_path / "day2_replay"),
         *common]
    ) == 0
    assert spark.read.parquet(f"{idx}/doclens").count() == (
        clean_union.count()
    )
    assert sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rank"])
        for r in bm25_query_index(spark, idx, panel, k=5, n_buckets=8)
        .collect()
    ) == want

    # a mismatched modulus on a later (fresh, non-replayed) batch
    # raises (pinned by the index)
    import pytest

    b3 = str(tmp_path / "b3")
    spark.createDataFrame(
        [(100, " ".join(f"zeta{i} eta{i}" for i in range(10)),
          "en", "src_a")],
        schema,
    ).write.parquet(b3)
    with pytest.raises(ValueError, match="n_buckets=8"):
        pipeline_job.main(
            ["--input", b3, "--output-dir", str(tmp_path / "day3"),
             "--benchmark", bench_path, "--budget", str(_BUDGET),
             "--shards", "4", "--state-dir", state,
             "--bm25-index", idx, "--bm25-buckets", "16"]
        )
