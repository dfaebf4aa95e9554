"""CLI job tests: the spark-submit surface drives the same library paths."""

from __future__ import annotations

import pytest

from home_credit_data_engineering_spark.jobs import gold as gold_job
from home_credit_data_engineering_spark.jobs import ingest as ingest_job
from home_credit_data_engineering_spark.jobs import silver as silver_job
from home_credit_data_engineering_spark.schema import (
    APPLICATION,
    BUREAU,
    BUREAU_BALANCE,
    INSTALLMENTS_PAYMENTS,
    PREVIOUS_APPLICATION,
)

DATE = "2026-08-13"


def test_parsers_cover_reference_flags():
    # The reference CLIs take --ingest-date everywhere (run.md); ours must too.
    for parser in (
        ingest_job.build_parser(),
        silver_job.build_parser(),
        gold_job.build_parser(),
    ):
        args = [a.option_strings for a in parser._actions]
        assert any("--ingest-date" in opts for opts in args)


def test_ingest_csv_then_silver_then_gold_cli(spark, tmp_path):
    # Stage CSV input for the ingest job.
    src = spark.createDataFrame(
        [
            (1, 0, 100000.0, 500000.0, 25000.0, -15000, "M"),
            (2, 1, 200000.0, 600000.0, None, -20000, "F"),
        ],
        APPLICATION,
    )
    csv_dir = str(tmp_path / "app_csv")
    src.write.option("header", "true").csv(csv_dir)

    base = str(tmp_path)
    assert (
        ingest_job.main(
            [
                "--source", "csv",
                "--input", csv_dir,
                "--output", f"{base}/bronze/application",
                "--ingest-date", DATE,
            ]
        )
        == 0
    )
    # The other bronze inputs, staged directly.
    from home_credit_data_engineering_spark.plans.bronze import ingest_dataframe

    for name, schema, rows in [
        ("bureau", BUREAU, [(1, 101, "Active", 0, 10000.0, 0.0)]),
        ("bureau_balance", BUREAU_BALANCE, [(101, 0, "C")]),
        (
            "installments_payments",
            INSTALLMENTS_PAYMENTS,
            [(201, 1, 1, -100, -95, 1000.0, 1000.0)],
        ),
        (
            "previous_application",
            PREVIOUS_APPLICATION,
            [(301, 1, "Approved", 10000.0, 9000.0)],
        ),
    ]:
        ingest_dataframe(
            spark.createDataFrame(rows, schema), f"{base}/bronze/{name}", DATE, "test"
        )

    assert (
        silver_job.main(
            [
                "--bronze-base", f"{base}/bronze",
                "--silver-base", f"{base}/silver",
                "--ingest-date", DATE,
            ]
        )
        == 0
    )
    assert (
        gold_job.main(
            [
                "--silver-base", f"{base}/silver",
                "--gold-base", f"{base}/gold",
                "--ingest-date", DATE,
            ]
        )
        == 0
    )
    from home_credit_data_engineering_spark.sources.readers import read_snapshot

    profile = read_snapshot(
        spark,
        f"{base}/gold/gold_client_risk_profile",
        {"year": 2026, "month": 8, "day": 13},
    )
    assert profile.count() == 2


def test_dedup_job_end_to_end(spark, tmp_path):
    """Corpus dedup job: exact dups, a near-dup chain, and the removal
    list must reconstruct the survivor mapping."""
    from home_credit_data_engineering_spark.jobs.dedup import main as dedup_main

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the garden outside"
    )
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, base + "  "),  # normalized exact dup of 1
        (4, base.replace("garden", "meadow")),  # near dup of 1 (chain)
        (5, base.replace("garden", "meadow").replace("birds", "bees")),  # near of 4
        (6, "entirely different text about columnar query engines and scans"),
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "deduped")
    rem = str(tmp_path / "removals")
    log = str(tmp_path / "runs.jsonl")
    rc = dedup_main(
        [
            "--input", src, "--output", out, "--removals-output", rem,
            "--near-threshold", "0.5", "--bands", "16", "--run-log", log,
        ]
    )
    assert rc == 0
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [1, 6]  # chain 1~4~5 collapses; 2,3 exact dups of 1
    removals = {
        r["doc_id"]: (r["reason"], r["survivor_id"])
        for r in spark.read.parquet(rem).collect()
    }
    assert removals[2] == ("exact", 1)
    assert removals[3] == ("exact", 1)
    assert removals[4] == ("near", 1)
    assert removals[5] == ("near", 1)

    from home_credit_data_engineering_spark.runlog import read_run_log

    (record,) = read_run_log(log)
    assert record["rows_in"] == 6
    assert record["exact_removed"] == 2
    assert record["near_removed"] == 2
    assert record["rows_out"] == 2
    # CC convergence telemetry rides the run log so production can alert
    # on round-count drift; the 1~4~5 chain needs at least one round.
    assert record["cc_rounds"] >= 1


def test_quality_filter_job_end_to_end(spark, tmp_path):
    """Quality job: each planted violation lands in dropped with the
    right failed_rules; clean docs pass; counts ride the run log."""
    from home_credit_data_engineering_spark.jobs.quality import main as quality_main

    clean = (
        "a perfectly ordinary sentence with enough distinct words to pass "
        "every single quality gate in the default configuration today"
    )
    rows = [
        (1, clean, "en"),
        (2, "too short", "en"),                      # min_tokens
        (3, "$$$ %% ## @@ !! ** (( )) [[ ]]", "en"),  # symbol_ratio (+ others)
        (4, "spam spam spam spam spam spam spam spam spam spam", "en"),  # repetition/unique
        (5, clean + " " + "x" * 100, "en"),           # token_length
        (6, clean, "zz"),                             # lang allowlist
    ]
    src_dir = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.parquet(src_dir)
    out = str(tmp_path / "kept")
    dropped_out = str(tmp_path / "dropped")
    log = str(tmp_path / "runs.jsonl")
    rc = quality_main(
        [
            "--input", src_dir, "--output", out,
            "--dropped-output", dropped_out,
            "--langs", "en,fr", "--run-log", log,
        ]
    )
    assert rc == 0
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [1]
    dropped = {
        r["doc_id"]: set(r["failed_rules"])
        for r in spark.read.parquet(dropped_out).collect()
    }
    assert dropped[2] == {"min_tokens"}
    assert "symbol_ratio" in dropped[3]
    assert dropped[4] & {"repetition", "unique_tokens"}
    assert dropped[5] == {"token_length"}
    assert dropped[6] == {"lang"}

    from home_credit_data_engineering_spark.runlog import read_run_log

    (record,) = read_run_log(log)
    assert record["rows_in"] == 6 and record["rows_kept"] == 1
    assert record["rule_drops"]["min_tokens"] == 1
    assert record["rule_drops"]["lang"] == 1

    # Single-pass mode: omit --dropped-output -> ONE write partitioned by
    # the kept verdict, counts from observe() metrics on that same write.
    single = str(tmp_path / "single")
    log2 = str(tmp_path / "runs2.jsonl")
    rc = quality_main(
        ["--input", src_dir, "--output", single, "--langs", "en,fr",
         "--run-log", log2]
    )
    assert rc == 0
    import os

    parts = {d for d in os.listdir(single) if d.startswith("kept=")}
    assert parts == {"kept=true", "kept=false"}
    # Partition values read back as strings (the engine pins
    # partitionColumnTypeInference off — see session.py).
    kept_ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(single).filter("kept = 'true'").collect()
    )
    assert kept_ids == [1]
    (record2,) = read_run_log(log2)
    assert record2["rows_in"] == 6 and record2["rows_kept"] == 1
    assert record2["rule_drops"] == record["rule_drops"]


def test_ann_index_job(spark, sf_dir, tmp_path):
    from home_credit_data_engineering_spark.jobs.ann_index import main as ann_main

    src = f"{sf_dir}/embeddings.parquet"
    out = str(tmp_path / "ivf")
    assert ann_main(["--input", src, "--output", out, "--n-centroids", "8"]) == 0
    import glob
    import os

    cells = glob.glob(out + "/cell=*")
    assert len(cells) >= 4  # cell-partitioned layout
    assert os.path.exists(out + "/_centroids.npy")


def test_corpus_prep_job_end_to_end(spark, tmp_path):
    """Corpus-prep job: planted duplicated passage is cut from both
    carriers, clean docs pass through, packing assignment covers every
    surviving non-empty doc."""
    from home_credit_data_engineering_spark.jobs.corpus_prep import (
        main as corpus_prep_main,
    )

    passage = " ".join(f"dup{j}" for j in range(12))
    rows = [
        (1, passage + " one uniquely continuing story here"),
        (2, "prefix words then " + passage),
        (3, "a fully original document with no repeated passages at all"),
        (4, passage),  # nothing but the duplicated passage -> strips empty
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    out = str(tmp_path / "cleaned")
    spans_out = str(tmp_path / "spans")
    log = str(tmp_path / "runs.jsonl")
    rc = corpus_prep_main(
        [
            "--input", src, "--output", out, "--spans-output", spans_out,
            "--window", "8", "--budget", "16", "--shards", "2",
            "--run-log", log,
        ]
    )
    assert rc == 0

    cleaned = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert cleaned[1]["text_clean"] == "one uniquely continuing story here"
    assert cleaned[2]["text_clean"] == "prefix words then"
    assert cleaned[3]["removed_tokens"] == 0
    assert cleaned[4]["text_clean"] == ""
    # packing covers every cleaned doc that still has tokens; the
    # stripped-empty doc has no assignment (null shard)
    assert cleaned[4]["shard"] is None
    for doc in (1, 2, 3):
        r = cleaned[doc]
        assert r["shard"] is not None
        assert r["seq_first"] == r["start_offset"] // 16

    spans = spark.read.parquet(spans_out).collect()
    assert {r["doc_id"] for r in spans} == {1, 2, 4}

    from home_credit_data_engineering_spark.runlog import read_run_log

    (record,) = read_run_log(log)
    assert record["job"] == "corpus_prep"
    assert record["docs_with_spans"] == 3
    assert record["tokens_cut"] == 36


def test_corpus_prep_job_incremental_mode(spark, tmp_path):
    """Two-day incremental run: day 2 spans judged against day-1 state
    match the full recompute restricted to day-2 docs."""
    from home_credit_data_engineering_spark.jobs.corpus_prep import (
        main as corpus_prep_main,
    )
    from home_credit_data_engineering_spark.operators.spans import duplicated_spans

    passage = " ".join(f"w{j}" for j in range(10))
    day1 = [(1, passage + " ending here"), (2, "unrelated day one words entirely")]
    day2 = [(10, "lead in " + passage), (11, "brand new never repeated content")]
    src1, src2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    spark.createDataFrame(day1, "doc_id long, text string").write.parquet(src1)
    spark.createDataFrame(day2, "doc_id long, text string").write.parquet(src2)

    state1 = str(tmp_path / "state1")
    rc = corpus_prep_main(
        [
            "--input", src1, "--output", str(tmp_path / "clean1"),
            "--window", "8", "--state-output", state1,
        ]
    )
    assert rc == 0

    spans2 = str(tmp_path / "spans2")
    log = str(tmp_path / "runs.jsonl")
    rc = corpus_prep_main(
        [
            "--input", src2, "--output", str(tmp_path / "clean2"),
            "--spans-output", spans2, "--window", "8",
            "--state", state1, "--state-output", str(tmp_path / "state2"),
            "--run-log", log,
        ]
    )
    assert rc == 0

    got = sorted(map(tuple, spark.read.parquet(spans2).collect()))
    both = spark.createDataFrame(day1 + day2, "doc_id long, text string")
    expected = sorted(
        r for r in map(tuple, duplicated_spans(both, "doc_id", "text", k=8).collect())
        if r[0] >= 10
    )
    assert got == expected and len(got) == 1  # doc 10 repeats day-1 passage

    from home_credit_data_engineering_spark.runlog import read_run_log

    (record,) = read_run_log(log)
    assert record["mode"] == "incremental"
    # cleaned day-2 output strips exactly the repeated passage
    clean = {r["doc_id"]: r["text_clean"]
             for r in spark.read.parquet(str(tmp_path / "clean2")).collect()}
    assert clean[10] == "lead in"
    assert clean[11] == "brand new never repeated content"


def test_corpus_prep_job_with_mixing(spark, tmp_path):
    """Mixing stage: per-source token budgets applied to CLEANED text."""
    from home_credit_data_engineering_spark.jobs.corpus_prep import (
        main as corpus_prep_main,
    )

    rows = [(i, "web" if i < 10 else "code",
             " ".join(f"t{i}_{j}" for j in range(10))) for i in range(20)]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, source string, text string").write.parquet(src)
    out = str(tmp_path / "mixed")
    log = str(tmp_path / "runs.jsonl")
    rc = corpus_prep_main(
        [
            "--input", src, "--output", out, "--window", "8",
            "--mix-budgets", '{"web": 35}', "--run-log", log,
        ]
    )
    assert rc == 0
    kept = spark.read.parquet(out).collect()
    # 10-token docs against web budget 35 -> 4 docs kept (offsets 0..30);
    # code has no budget -> dropped entirely
    assert all(r["source"] == "web" for r in kept)
    assert sorted(r["mix_offset"] for r in kept) == [0, 10, 20, 30]

    from home_credit_data_engineering_spark.runlog import read_run_log

    (record,) = read_run_log(log)
    assert record["mix"] == {"docs_mixed": 4, "budgets": {"web": 35}}


def test_corpus_prep_job_decontaminate_mode(spark, tmp_path):
    """--benchmark mode: spans come from eval overlap, not internal dups."""
    from home_credit_data_engineering_spark.jobs.corpus_prep import (
        main as corpus_prep_main,
    )

    leak = " ".join(f"q{j}" for j in range(10))
    bench_src = str(tmp_path / "bench")
    train_src = str(tmp_path / "train")
    spark.createDataFrame(
        [(100, leak)], "doc_id long, text string"
    ).write.parquet(bench_src)
    spark.createDataFrame(
        [
            (1, "prefix " + leak + " suffix"),
            # internal duplicate pair: NOT contamination, must pass through
            (2, "internal duplicate content appearing twice in training data"),
            (3, "internal duplicate content appearing twice in training data"),
        ],
        "doc_id long, text string",
    ).write.parquet(train_src)
    out = str(tmp_path / "cleaned")
    log = str(tmp_path / "runs.jsonl")
    rc = corpus_prep_main(
        [
            "--input", train_src, "--output", out, "--window", "8",
            "--benchmark", bench_src, "--run-log", log,
        ]
    )
    assert rc == 0
    cleaned = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert cleaned[1]["text_clean"] == "prefix suffix"
    assert cleaned[2]["removed_tokens"] == 0 and cleaned[3]["removed_tokens"] == 0

    from home_credit_data_engineering_spark.runlog import read_run_log

    (record,) = read_run_log(log)
    assert record["mode"] == "decontaminate"
    assert record["docs_with_spans"] == 1


def test_perplexity_job_end_to_end(spark, tmp_path):
    """Perplexity CLI: scoring + buckets, persisted count state, and the
    O(delta) incremental refresh reproducing the full-corpus model."""
    from home_credit_data_engineering_spark.jobs.perplexity import (
        main as ppl_main,
    )

    rows = [
        (i, " ".join(["the"] * (1 + i % 5) + ["of"] * (1 + i % 7) + [f"w{i}"]))
        for i in range(30)
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    out = str(tmp_path / "scored")
    counts = str(tmp_path / "counts")
    log = str(tmp_path / "runs.jsonl")
    rc = ppl_main(
        ["--input", src, "--output", out, "--counts-out", counts,
         "--run-log", log]
    )
    assert rc == 0
    scored = spark.read.parquet(out)
    assert scored.count() == 30
    assert set(scored.columns) == {"doc_id", "n_tokens", "ppl", "bucket"}
    assert {r["bucket"] for r in scored.collect()} <= {1, 2, 3}

    # incremental: score a delta batch against history counts; the
    # merged model must equal a from-scratch model over old+new
    old = str(tmp_path / "old")
    new = str(tmp_path / "new")
    spark.createDataFrame(rows[:20], "doc_id long, text string").write.parquet(old)
    spark.createDataFrame(rows[20:], "doc_id long, text string").write.parquet(new)
    counts_old = str(tmp_path / "counts_old")
    rc = ppl_main(
        ["--input", old, "--output", str(tmp_path / "s_old"),
         "--counts-out", counts_old]
    )
    assert rc == 0
    inc_out = str(tmp_path / "s_inc")
    rc = ppl_main(
        ["--input", new, "--output", inc_out, "--counts-in", counts_old,
         "--counts-out", str(tmp_path / "counts_merged")]
    )
    assert rc == 0
    merged = {
        (r["token"], r["c"])
        for r in spark.read.parquet(str(tmp_path / "counts_merged")).collect()
    }
    full = {
        (r["token"], r["c"])
        for r in spark.read.parquet(counts).collect()
    }
    assert merged == full

    # bigram mode runs and rejects the counts flags
    rc = ppl_main(["--input", src, "--output", str(tmp_path / "s_big"),
                   "--bigram", "--exact-buckets"])
    assert rc == 0
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        ppl_main(["--input", src, "--output", str(tmp_path / "x"),
                  "--bigram", "--counts-out", str(tmp_path / "y")])

    # --order N (r6): trigram backoff runs; --order 2 == --bigram output;
    # conflicting flags and counts state still reject
    rc = ppl_main(["--input", src, "--output", str(tmp_path / "s_tri"),
                   "--order", "3", "--exact-buckets"])
    assert rc == 0
    tri = spark.read.parquet(str(tmp_path / "s_tri"))
    assert {"doc_id", "n_tokens", "ppl", "bucket"} <= set(tri.columns)
    assert tri.count() > 0
    rc = ppl_main(["--input", src, "--output", str(tmp_path / "s_ord2"),
                   "--order", "2", "--exact-buckets"])
    assert rc == 0
    big = {
        (r["doc_id"], r["n_tokens"], r["ppl"], r["bucket"])
        for r in spark.read.parquet(str(tmp_path / "s_big")).collect()
    }
    ord2 = {
        (r["doc_id"], r["n_tokens"], r["ppl"], r["bucket"])
        for r in spark.read.parquet(str(tmp_path / "s_ord2")).collect()
    }
    assert big == ord2
    with _pytest.raises(SystemExit):
        ppl_main(["--input", src, "--output", str(tmp_path / "x2"),
                  "--bigram", "--order", "3"])
    with _pytest.raises(SystemExit):
        ppl_main(["--input", src, "--output", str(tmp_path / "x3"),
                  "--order", "3", "--counts-out", str(tmp_path / "y3")])
    # ADVICE r6: out-of-range orders must error, not silently score
    # unigram (a `--order -3` typo used to fall through the order>1 check)
    for bad in ("0", "-3", "7"):
        with _pytest.raises(SystemExit):
            ppl_main(["--input", src, "--output", str(tmp_path / "x4"),
                      "--order", bad])


def test_ann_index_job_pq_modes(spark, sf_dir, tmp_path):
    """--pq builds a codes/vectors IVF-PQ layout; --residual persists the
    IVFADC flag the query path auto-detects; --residual alone rejects."""
    import glob
    import os

    import numpy as np
    import pytest as _pytest

    from home_credit_data_engineering_spark.jobs.ann_index import main as ann_main

    src = f"{sf_dir}/embeddings.parquet"
    out = str(tmp_path / "ivfpq")
    rc = ann_main(
        ["--input", src, "--output", out, "--n-centroids", "8",
         "--pq", "--pq-m", "8", "--pq-nbits", "3", "--residual"]
    )
    assert rc == 0
    assert glob.glob(out + "/codes/cell=*")
    assert os.path.exists(out + "/vectors")
    assert os.path.exists(out + "/_codebooks.npy")
    assert bool(np.load(out + "/_residual.npy")[0])
    # and the persisted index serves queries end-to-end
    from home_credit_data_engineering_spark.operators.quantization import (
        ivfpq_query_index,
    )
    from home_credit_data_engineering_spark.sources.readers import read_parquet

    queries = read_parquet(spark, src).limit(5)
    rows = ivfpq_query_index(spark, out, queries, k=3, n_probe=4).collect()
    assert rows and all(r.rank <= 3 for r in rows)
    with _pytest.raises(SystemExit):
        ann_main(["--input", src, "--output", out, "--residual"])


def test_dedup_job_collapse_exact_identical_removals(spark, tmp_path):
    """--collapse-exact (r6): the production-posture collapsed MinHash
    path must produce the IDENTICAL removal list on a duplicate-heavy
    fixture — the exact stage leaves no byte-duplicates, so the collapse
    is a provable no-op inside this pipeline."""
    from home_credit_data_engineering_spark.jobs.dedup import main as dedup_main

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the garden outside"
    )
    # duplicate-heavy: every text repeated several times + a near chain
    rows = []
    nid = 0
    for copy in range(4):
        for variant in (
            base,
            base.replace("garden", "meadow"),
            base.replace("garden", "meadow").replace("birds", "bees"),
            "entirely different text about columnar query engines and scans",
        ):
            nid += 1
            rows.append((nid, variant))
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    results = {}
    for flag, tag in ((False, "default"), (True, "collapsed")):
        out = str(tmp_path / f"deduped_{tag}")
        rem = str(tmp_path / f"removals_{tag}")
        argv = [
            "--input", src, "--output", out, "--removals-output", rem,
            "--near-threshold", "0.5", "--bands", "16",
        ]
        if flag:
            argv.append("--collapse-exact")
        assert dedup_main(argv) == 0
        results[tag] = {
            "kept": sorted(
                r["doc_id"] for r in spark.read.parquet(out).collect()
            ),
            "removals": sorted(
                (r["doc_id"], r["reason"], r["survivor_id"])
                for r in spark.read.parquet(rem).collect()
            ),
        }
    assert results["default"] == results["collapsed"]
    # and the dedup did real work: 16 docs -> 2 survivors
    assert results["default"]["kept"] == [1, 4]


def test_bpe_job_train_then_count(spark, tmp_path):
    """BPE CLI (r6): train a merges table on a corpus, count with it,
    and the counts must equal the pure-Python reference encoder."""
    from home_credit_data_engineering_spark.functions.bpe import (
        bpe_encode,
        load_merges,
        merge_ranks,
    )
    from home_credit_data_engineering_spark.jobs.bpe import main as bpe_main

    rows = [
        (i, "low lower lowest newer newest " * (1 + i % 3)) for i in range(40)
    ] + [(99, "zzz unseen glyphs")]
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    merges_path = str(tmp_path / "merges.txt")
    log = str(tmp_path / "runs.jsonl")
    rc = bpe_main([
        "--mode", "train", "--input", src, "--merges-out", merges_path,
        "--num-merges", "24", "--run-log", log,
    ])
    assert rc == 0
    merges = load_merges(merges_path)
    assert 1 <= len(merges) <= 24

    out = str(tmp_path / "counted")
    rc = bpe_main([
        "--mode", "count", "--input", src, "--merges", merges_path,
        "--output", out, "--run-log", log,
    ])
    assert rc == 0
    got = {
        r["doc_id"]: r["bpe_token_count"]
        for r in spark.read.parquet(out).collect()
    }
    ranks = merge_ranks(merges)
    want = {i: len(bpe_encode(t, ranks)) for i, t in rows}
    assert got == want

    from home_credit_data_engineering_spark.runlog import read_run_log

    records = read_run_log(log)
    assert [r["mode"] for r in records] == ["train", "count"]
    assert records[1]["rows_counted"] == 41

    # mode/flag guards
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        bpe_main(["--mode", "train", "--input", src])
    with _pytest.raises(SystemExit):
        bpe_main(["--mode", "count", "--input", src])


def test_ann_index_job_opq_mode(spark, sf_dir, tmp_path):
    """--opq: the rotation sidecar lands in the index and querying it
    returns re-ranked neighbors; --opq without --pq rejects."""
    import os

    import pytest as _pytest

    from home_credit_data_engineering_spark.jobs.ann_index import (
        main as ann_main,
    )
    from home_credit_data_engineering_spark.operators.quantization import (
        ivfpq_query_index,
    )
    from home_credit_data_engineering_spark.sources.readers import read_testdata

    src = f"{sf_dir}/embeddings.parquet"
    out = str(tmp_path / "opq_index")
    rc = ann_main([
        "--input", src, "--output", out,
        "--pq", "--opq", "--pq-m", "16", "--pq-nbits", "4",
        "--n-centroids", "8",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "_rotation.npy"))

    from pyspark.sql import functions as F

    emb = read_testdata(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    res = ivfpq_query_index(spark, out, queries, k=3, n_probe=4, rerank=20)
    assert res.count() > 0

    with _pytest.raises(SystemExit):
        ann_main(["--input", src, "--output", str(tmp_path / "x"), "--opq"])


def test_bm25_index_job_build_and_query(spark, sf_dir, tmp_path, capsys):
    """Build the lexical index via the CLI, then query it: the top hit for
    the rare planted term must contain that term, and ranks print 1..k."""
    from home_credit_data_engineering_spark.jobs import bm25_index as job

    idx = str(tmp_path / "bm25_cli_idx")
    rc = job.main([
        "--input", f"{sf_dir}/documents.parquet",
        "--index", idx,
        "--n-buckets", "8",
    ])
    assert rc == 0
    import os

    assert os.path.isdir(f"{idx}/postings") and os.path.isdir(f"{idx}/stats")

    rc = job.main([
        "--index", idx,
        "--n-buckets", "8",
        "--query-terms", "dup", "spark",
        "--k", "3",
    ])
    assert rc == 0
    out = [
        line for line in capsys.readouterr().out.splitlines()
        if line and line[0].isdigit()
    ]
    assert 1 <= len(out) <= 3
    ranks = [int(line.split("\t")[0]) for line in out]
    assert ranks == list(range(1, len(out) + 1))
    # the rank-1 document must actually contain the rare term 'dup'
    top_doc = int(out[0].split("\t")[1])
    import duckdb

    txt = duckdb.connect().execute(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet') "
        f"WHERE doc_id = {top_doc}"
    ).fetchone()[0]
    assert "dup" in txt.split()


def test_bm25_index_job_build_requires_input(spark, tmp_path):
    from home_credit_data_engineering_spark.jobs import bm25_index as job
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        job.main(["--index", str(tmp_path / "nope")])


def test_report_card_job_end_to_end(spark, tmp_path):
    from home_credit_data_engineering_spark.jobs import report_card as rc_job

    docs = spark.createDataFrame(
        [
            (1, "alpha beta", "en", "s1"),
            (2, "alpha beta", "en", "s1"),
            (3, "uno dos tres", "es", "s2"),
        ],
        schema="doc_id bigint, text string, lang string, source string",
    )
    inp = str(tmp_path / "docs")
    out = str(tmp_path / "card")
    docs.write.parquet(inp)
    assert rc_job.main(["--input", inp, "--output", out]) == 0
    card = {r.source: r for r in spark.read.parquet(out).collect()}
    assert card["s1"].n_docs == 2 and card["s1"].dup_rate == 0.5
    assert card["s2"].n_docs == 1 and card["s2"].lang_entropy == 0.0


def test_evaluate_job_report_and_auc_modes(spark, tmp_path):
    from home_credit_data_engineering_spark.jobs import evaluate as eval_job

    labeled = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("b", "b")],
        schema="label string, pred string",
    )
    inp = str(tmp_path / "labeled")
    labeled.write.parquet(inp)
    out = str(tmp_path / "report")
    conf = str(tmp_path / "conf")
    assert eval_job.main(
        ["--input", inp, "--output", out, "--confusion-out", conf]
    ) == 0
    rep = {r.cls: r for r in spark.read.parquet(out).collect()}
    assert rep["micro"].f1 == pytest.approx(2 / 3, abs=1e-6)
    assert spark.read.parquet(conf).count() == 3

    scored = spark.createDataFrame(
        [(1, 0.9), (1, 0.6), (0, 0.4), (0, 0.2)],
        schema="label int, score double",
    )
    sinp = str(tmp_path / "scored")
    scored.write.parquet(sinp)
    sout = str(tmp_path / "auc")
    roc = str(tmp_path / "roc")
    cal = str(tmp_path / "cal")
    assert eval_job.main(
        ["--input", sinp, "--output", sout, "--mode", "auc",
         "--roc-out", roc, "--calibration-out", cal, "--bins", "5"]
    ) == 0
    row = spark.read.parquet(sout).collect()[0]
    assert row.auc == 1.0 and row.n_pos == 2
    assert spark.read.parquet(roc).count() == 4
    assert spark.read.parquet(cal).count() >= 2

    with pytest.raises(SystemExit):
        eval_job.main(
            ["--input", sinp, "--output", sout, "--roc-out", roc]
        )  # roc-out without --mode auc
    with pytest.raises(SystemExit):
        eval_job.main(
            ["--input", sinp, "--output", sout, "--mode", "auc",
             "--bins", "0"]
        )


def test_report_card_job_incremental_state(spark, tmp_path):
    from home_credit_data_engineering_spark.jobs import report_card as rc_job

    schema = "doc_id bigint, text string, lang string, source string"
    day1 = spark.createDataFrame(
        [(1, "alpha beta", "en", "s1"), (2, "gamma", "de", "s1")], schema
    )
    day2 = spark.createDataFrame(
        [(3, "alpha beta", "en", "s1"), (4, "uno", "es", "s2")], schema
    )
    d1, d2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    day1.write.parquet(d1)
    day2.write.parquet(d2)
    st1 = str(tmp_path / "state1")
    st2 = str(tmp_path / "state2")
    out1, out2 = str(tmp_path / "card1"), str(tmp_path / "card2")
    assert rc_job.main(
        ["--input", d1, "--output", out1, "--state-out", st1]
    ) == 0
    assert rc_job.main(
        ["--input", d2, "--output", out2,
         "--state-in", st1, "--state-out", st2]
    ) == 0
    # the incremental card over day1+day2 equals a full recompute
    from home_credit_data_engineering_spark.operators.quality import (
        corpus_report_card,
    )

    got = {r.source: r.asDict() for r in spark.read.parquet(out2).collect()}
    expect = {
        r.source: r.asDict()
        for r in corpus_report_card(day1.unionByName(day2)).collect()
    }
    assert got == expect
    assert got["s1"]["dup_rate"] == pytest.approx(1 / 3, abs=1e-6)


def test_drift_job_gate_exit_codes(spark, tmp_path):
    from home_credit_data_engineering_spark.jobs import drift as drift_job

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], schema="id bigint, tag string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, None)], schema="id bigint, tag string"
    )
    po, pn = str(tmp_path / "old"), str(tmp_path / "new")
    old.write.parquet(po)
    new.write.parquet(pn)
    out1 = str(tmp_path / "rep1")
    # schema is stable: dtype/present guards pass despite data drift
    assert drift_job.main(
        ["--old", po, "--new", pn, "--output", out1,
         "--fail-on", "*/dtype,*/present"]
    ) == 0
    # row-count guard breaches -> exit 3, report still written
    out2 = str(tmp_path / "rep2")
    assert drift_job.main(
        ["--old", po, "--new", pn, "--output", out2,
         "--fail-on", "__table__/row_count"]
    ) == 3
    rep = spark.read.parquet(out2)
    assert rep.filter("column = '__table__' AND changed").count() == 1
    # no guards: report-only mode always succeeds
    out3 = str(tmp_path / "rep3")
    assert drift_job.main(["--old", po, "--new", pn, "--output", out3]) == 0


def test_drift_job_psi_gate_on_planted_shift(spark, tmp_path):
    """VERDICT r8 #6 done-criterion: --fail-on '*/psi' exits 3 on a
    planted numeric shift that row-count/schema guards cannot see."""
    from home_credit_data_engineering_spark.jobs import drift as drift_job

    old = spark.createDataFrame(
        [(i, float(i % 100)) for i in range(1000)], "id bigint, amt double"
    )
    shifted = spark.createDataFrame(
        [(i, float(i % 100) + 80.0) for i in range(1000)],
        "id bigint, amt double",
    )
    po, pn = str(tmp_path / "old"), str(tmp_path / "new")
    old.write.parquet(po)
    shifted.write.parquet(pn)
    out = str(tmp_path / "rep")
    # same row count, same schema, same cardinality class — only the
    # VALUES moved: schema/count guards pass…
    assert drift_job.main(
        ["--old", po, "--new", pn, "--output", out,
         "--fail-on", "*/dtype,*/present,__table__/row_count"]
    ) == 0
    # …the psi gate breaches
    out2 = str(tmp_path / "rep2")
    assert drift_job.main(
        ["--old", po, "--new", pn, "--output", out2,
         "--fail-on", "*/psi"]
    ) == 3
    rep = spark.read.parquet(out2)
    psi = rep.filter("metric = 'psi' AND column = 'amt'").first()
    assert psi.changed and float(psi.new_value) > 0.2
    # unshifted data passes the psi gate; --no-distributions drops rows
    out3 = str(tmp_path / "rep3")
    assert drift_job.main(
        ["--old", po, "--new", po, "--output", out3, "--fail-on", "*/psi"]
    ) == 0
    out4 = str(tmp_path / "rep4")
    assert drift_job.main(
        ["--old", po, "--new", pn, "--output", out4,
         "--no-distributions", "--fail-on", "*/psi"]
    ) == 0
    assert spark.read.parquet(out4).filter("metric = 'psi'").count() == 0


def test_entity_resolution_job_full_and_incremental(spark, tmp_path):
    from pyspark.sql import functions as F

    from home_credit_data_engineering_spark.jobs import (
        entity_resolution as er_job,
    )
    from home_credit_data_engineering_spark.operators.linkage import (
        blocked_pairs,
        resolve_entities,
    )

    wave1 = spark.createDataFrame(
        [(1, "B", "ann smith"), (2, "B", "ann smyth"), (7, "C", "bob ray")],
        ["id", "blk", "name"],
    )
    wave2 = spark.createDataFrame(
        [(4, "B", "ann smythe"), (9, "C", "bob raye")],
        ["id", "blk", "name"],
    )
    w1 = str(tmp_path / "wave1")
    w2 = str(tmp_path / "wave2")
    wave1.write.parquet(w1)
    wave2.write.parquet(w2)

    # Full mode over wave 1.
    out = str(tmp_path / "state_full")
    assert (
        er_job.main(
            [
                "--input", w1, "--id-col", "id", "--block-cols", "blk",
                "--name-col", "name", "--output", out,
                "--index-output", str(tmp_path / "er_idx"),
                "--index-buckets", "4",
                "--report-fs-params",
            ]
        )
        == 0
    )
    full1 = {r["id"]: r["entity_id"] for r in spark.read.parquet(out).collect()}
    assert full1 == {1: 1, 2: 1, 7: 7}
    from home_credit_data_engineering_spark.operators.linkage import (
        entity_profile,
    )
    members = entity_profile(
        spark, str(tmp_path / "er_idx"), 2, "id", n_buckets=4
    )
    assert {r["id"] for r in members.collect()} == {1, 2}

    # Incremental mode: seed the state dir from the full run, fold wave 2.
    state_dir = str(tmp_path / "state_dir")
    import os
    import shutil

    os.makedirs(state_dir)
    shutil.copytree(out, os.path.join(state_dir, "entities"))
    assert (
        er_job.main(
            [
                "--input", w2, "--id-col", "id", "--block-cols", "blk",
                "--name-col", "name", "--state-dir", state_dir,
            ]
        )
        == 0
    )
    got = {
        r["id"]: r["entity_id"]
        for r in spark.read.parquet(
            os.path.join(state_dir, "entities")
        ).collect()
    }
    # Full recompute over the union as the truth.
    union = wave1.unionByName(wave2)
    pairs = blocked_pairs(union, "id", ["blk"], carry_cols=["name"])
    truth = {
        r["id"]: r["entity_id"]
        for r in resolve_entities(
            union,
            pairs.filter(
                F.levenshtein(F.col("name_a"), F.col("name_b")) <= 1
            ),
            "id",
            "id_a",
            "id_b",
        ).collect()
    }
    assert got == truth
    assert not os.path.isdir(os.path.join(state_dir, "entities__next"))


def test_entity_resolution_index_self_heals_after_refresh_crash(
    spark, tmp_path
):
    """A leftover _refresh_pending sentinel means a prior run died
    between the state swap and the index refresh — its diff base is
    gone, so an incremental refresh would leave that batch's buckets
    stale forever. The next run must detect it, fall back to the full
    index rewrite, and clear the sentinel."""
    import glob
    import os
    import shutil

    from home_credit_data_engineering_spark.jobs import (
        entity_resolution as er_job,
    )
    from home_credit_data_engineering_spark.operators.linkage import (
        entity_profile,
    )

    wave1 = spark.createDataFrame(
        [(1, "B", "ann smith"), (2, "B", "ann smyth"), (7, "C", "bob ray")],
        ["id", "blk", "name"],
    )
    wave2 = spark.createDataFrame(
        [(9, "C", "bob raye")], ["id", "blk", "name"]
    )
    w1, w2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    wave1.write.parquet(w1)
    wave2.write.parquet(w2)

    out = str(tmp_path / "state_full")
    idx = str(tmp_path / "er_idx")
    common = ["--id-col", "id", "--block-cols", "blk", "--name-col", "name"]
    assert er_job.main(
        ["--input", w1, *common, "--output", out,
         "--index-output", idx, "--index-buckets", "4"]
    ) == 0
    state_dir = str(tmp_path / "state_dir")
    os.makedirs(state_dir)
    shutil.copytree(out, os.path.join(state_dir, "entities"))

    # simulate the crash window: sentinel left behind by a dead run
    with open(os.path.join(idx, "_refresh_pending"), "w") as fh:
        fh.write("")
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{idx}/by_*/[re]bucket=*/*.parquet")
    }
    assert er_job.main(
        ["--input", w2, *common, "--state-dir", state_dir,
         "--index-output", idx, "--index-buckets", "4"]
    ) == 0
    # sentinel cleared, and the index was FULLY rewritten (every
    # original file replaced), not incrementally patched
    assert not os.path.exists(os.path.join(idx, "_refresh_pending"))
    for p, mtime in before.items():
        assert not os.path.exists(p) or os.path.getmtime(p) != mtime, p
    members = entity_profile(spark, idx, 9, "id", n_buckets=4)
    assert {r["id"] for r in members.collect()} == {7, 9}

    # a healthy follow-up incremental run leaves no sentinel either
    wave3 = spark.createDataFrame([(4, "B", "ann smythe")],
                                  ["id", "blk", "name"])
    w3 = str(tmp_path / "w3")
    wave3.write.parquet(w3)
    assert er_job.main(
        ["--input", w3, *common, "--state-dir", state_dir,
         "--index-output", idx, "--index-buckets", "4"]
    ) == 0
    assert not os.path.exists(os.path.join(idx, "_refresh_pending"))
    members = entity_profile(spark, idx, 4, "id", n_buckets=4)
    assert {r["id"] for r in members.collect()} == {1, 2, 4}


def test_entity_resolution_review_loop_e2e(spark, tmp_path, capsys):
    """score -> review queue -> planted decisions -> fold == direct
    resolution with the accepted edges (the clerical-review loop)."""
    import os

    from pyspark.sql import functions as F

    from home_credit_data_engineering_spark.jobs import (
        entity_resolution as er_job,
    )
    from home_credit_data_engineering_spark.operators.linkage import (
        blocked_pairs,
        resolve_entities,
    )

    records = spark.createDataFrame(
        [
            (1, "B", "ann smith"),
            (2, "B", "ann smyth"),
            (3, "B", "zoe quinn"),
            (7, "C", "bob ray"),
            (8, "C", "bob raye"),
            (9, "C", "bob zzz"),
        ],
        ["id", "blk", "name"],
    )
    rec_path = str(tmp_path / "records")
    records.write.parquet(rec_path)
    out = str(tmp_path / "resolved")
    queue = str(tmp_path / "queue")

    # Full run: auto-link band empty (upper unreachable), everything that
    # scored lands in the clerical band -> the queue holds all pairs.
    assert er_job.main(
        [
            "--input", rec_path, "--id-col", "id", "--block-cols", "blk",
            "--name-col", "name", "--output", out,
            "--review-queue", queue,
            "--fs-upper", "1000", "--fs-lower", "-1000",
        ]
    ) == 0
    assert "review_queue: bands=" in capsys.readouterr().out
    qrows = spark.read.parquet(f"{queue}/by_a")
    assert {"id_a", "id_b", "fs_score", "fs_decision"} <= set(qrows.columns)
    assert qrows.count() == 3 + 3  # C(3,2) per block
    assert (qrows.filter(F.col("fs_decision") != "possible").count()) == 0

    # Seed the incremental state from the auto-resolution (max_lev=1:
    # {1,2} merge, {7,8} merge, 3 and 9 singletons).
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    import shutil

    shutil.copytree(out, os.path.join(state_dir, "entities"))

    # Planted reviewer verdicts: accept (2,3) and (8,9); reject (1,3).
    decisions = spark.createDataFrame(
        [(2, 3, "accept"), (8, 9, "accept"), (1, 3, "reject")],
        ["id_a", "id_b", "decision"],
    )
    dec_path = str(tmp_path / "decisions")
    decisions.write.parquet(dec_path)
    assert er_job.main(
        [
            "--input", dec_path, "--id-col", "id", "--block-cols", "blk",
            "--name-col", "name", "--state-dir", state_dir,
            "--fold-reviews",
        ]
    ) == 0
    got = {
        r["id"]: r["entity_id"]
        for r in spark.read.parquet(
            os.path.join(state_dir, "entities")
        ).collect()
    }
    # Truth: direct resolution with lev<=1 matches PLUS the accepted edges.
    pairs = blocked_pairs(records, "id", ["blk"], carry_cols=["name"])
    auto = pairs.filter(
        F.levenshtein(F.col("name_a"), F.col("name_b")) <= 1
    ).select("id_a", "id_b")
    accepted = decisions.filter(F.col("decision") == "accept").select(
        "id_a", "id_b"
    )
    want = {
        r["id"]: r["entity_id"]
        for r in resolve_entities(
            records, auto.unionByName(accepted), "id", "id_a", "id_b"
        ).collect()
    }
    assert got == want
    assert got[3] == got[1] == got[2] == 1  # accepted edge merged 3 in
    assert got[9] == got[7] == got[8] == 7


def test_entity_resolution_tune_blocking_mode(spark, tmp_path, capsys):
    from home_credit_data_engineering_spark.jobs import (
        entity_resolution as er_job,
    )

    records = spark.createDataFrame(
        [
            (1, "X", "smith"),
            (2, "X", "smyth"),
            (3, "X", "brown"),
            (4, "X", "browne"),
            (5, "X", "zzzz"),
            (6, "X", "sister"),
        ],
        ["id", "blk", "name"],
    )
    rec_path = str(tmp_path / "records")
    records.write.parquet(rec_path)
    out = str(tmp_path / "tune_report")
    assert er_job.main(
        [
            "--input", rec_path, "--id-col", "id", "--block-cols", "blk",
            "--name-col", "name", "--output", out,
            "--tune-blocking", "1,2,3",
        ]
    ) == 0
    rows = {r["scheme"]: r for r in spark.read.parquet(out).collect()}
    # the sweep + the given scheme are all present
    assert set(rows) == {
        "name_prefix_1", "name_prefix_2", "name_prefix_3", "given:blk",
    }
    # known optimum: prefix 2 keeps full recall at the minimal budget;
    # the single coarse "blk" block pays all 15 pairs for the same recall
    assert rows["name_prefix_2"]["recall_proxy"] == 1.0
    assert rows["name_prefix_3"]["recall_proxy"] == 0.5
    assert rows["given:blk"]["n_pairs"] == 15
    assert rows["name_prefix_2"]["n_pairs"] == 2
    assert "tune_blocking:" in capsys.readouterr().out


def test_bm25_index_job_increment_mode(spark, sf_dir, tmp_path, capsys):
    from pyspark.sql import functions as F

    from home_credit_data_engineering_spark.jobs import bm25_index as job
    from home_credit_data_engineering_spark.sources.readers import read_testdata

    docs = read_testdata(spark, sf_dir, "documents")
    base = str(tmp_path / "base")
    wave = str(tmp_path / "wave")
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(base)
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(wave)
    idx = str(tmp_path / "idx")
    assert job.main(["--input", base, "--index", idx, "--n-buckets", "16"]) == 0
    assert job.main(["--input", wave, "--index", idx, "--increment"]) == 0
    out = capsys.readouterr().out
    assert "bm25 index increment: +" in out
    # the incremented index serves queries over the union
    assert job.main(
        ["--index", idx, "--query-terms", "data", "quality", "--k", "3"]
    ) == 0
    n = spark.read.parquet(f"{idx}/stats").first()["n_docs"]
    assert int(n) == docs.count()
