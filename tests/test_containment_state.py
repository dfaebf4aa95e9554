"""Persisted containment decontamination state
(``operators/containment_state.py`` + ``jobs/containment_index.py`` +
the sweep classification): chained-fold equivalence with the full
containment join, ledger-idempotent folds, crash replay convergence,
compaction, lake-sweep discovery."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.containment_state import (
    compact_containment_state,
    containment_state_increment,
    containment_state_report,
    read_containment_meta,
    write_containment_state,
)
from home_credit_data_engineering_spark.operators.dedup import (
    containment_join,
)

KW = dict(threshold=0.5, shingle_k=3)


def _corpus(spark):
    """A small fixed reference plus two probe deltas; several probe docs
    CONTAIN a reference doc's text (the decontamination shape: high
    containment, diluted symmetric Jaccard)."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]

    def doc(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    bench = [doc(8) for _ in range(4)]
    reference = spark.createDataFrame(
        [(900 + i, t) for i, t in enumerate(bench)],
        "doc_id long, text string",
    )
    d1 = spark.createDataFrame(
        [
            (1, bench[0] + " " + doc(6)),  # contains benchmark item 0
            (2, doc(20)),
            (3, bench[1]),  # IS benchmark item 1
            (4, doc(12)),
        ],
        "doc_id long, text string",
    )
    d2 = spark.createDataFrame(
        [
            (10, doc(5) + " " + bench[2] + " " + doc(5)),
            (11, doc(25)),
            (12, bench[3] + " tail1 tail2"),
        ],
        "doc_id long, text string",
    )
    return reference, d1, d2


def _pairs(df):
    return {(r["probe_id"], r["ref_id"]): r["containment"] for r in df.collect()}


def test_state_folds_match_full_join_across_two_deltas(spark, tmp_path):
    """Chained 2-step equivalence: the union of per-delta increments
    equals the full containment_join over the accumulated probe corpus
    (per-pair completeness is order-independent — the reference side is
    fully posted)."""
    reference, d1, d2 = _corpus(spark)
    root = str(tmp_path / "state")
    stats = write_containment_state(reference, root, "doc_id", "text", **KW)
    assert stats["n_refs"] == 4 and stats["n_postings"] > 0
    meta = read_containment_meta(root)
    assert meta["threshold"] == 0.5 and meta["shingle_k"] == 3

    r1 = containment_state_increment(d1, root)
    assert not r1["replayed"]
    r2 = containment_state_increment(d2, root)
    assert not r2["replayed"]
    got = _pairs(r1["pairs"]) | _pairs(r2["pairs"])

    full = containment_join(
        d1.unionByName(d2), reference, "doc_id", "text", **KW
    )
    assert got == _pairs(full)
    assert got, "planted containment pairs must appear"
    # the fold report carries the fan-out observability
    assert r1["report"]["candidate_pairs"] is not None
    assert r1["report"]["brute_force_pairs"] == 4 * 4
    # no probe prefixes are persisted — the only growing leg is tokens
    assert not os.path.isdir(os.path.join(root, "prefixes"))
    rep = containment_state_report(spark, root)
    assert rep["n_refs"] == 4 and rep["n_tokens"] >= stats["n_tokens"]


def test_replayed_fold_is_noop_and_pairs_contract(spark, tmp_path):
    reference, d1, _ = _corpus(spark)
    root = str(tmp_path / "state")
    out = str(tmp_path / "pairs")
    write_containment_state(reference, root, "doc_id", "text", **KW)
    r1 = containment_state_increment(d1, root, output_pairs=out)
    assert r1["report"]["output_pairs"] == out
    assert _pairs(spark.read.parquet(out)) == _pairs(r1["pairs"])

    before = containment_state_report(spark, root)
    again = containment_state_increment(d1, root, output_pairs=out)
    assert again["replayed"] and again["report"] == r1["report"]
    assert containment_state_report(spark, root) == before
    # requesting a path the completed fold never wrote raises
    with pytest.raises(RuntimeError, match="cannot produce"):
        containment_state_increment(
            d1, root, output_pairs=str(tmp_path / "elsewhere")
        )


def test_crash_replay_converges(spark, tmp_path, monkeypatch):
    """Kill the fold at both crash points; the retry must converge to
    the same pairs and token state as an uncrashed fold."""
    import home_credit_data_engineering_spark.operators.containment_state as cs

    reference, d1, _ = _corpus(spark)

    ref_root = str(tmp_path / "ref")
    write_containment_state(reference, ref_root, "doc_id", "text", **KW)
    ref = containment_state_increment(d1, ref_root)

    def _tokens(root):
        return {
            (r["token"], r["freq"])
            for r in spark.read.parquet(os.path.join(root, "tokens")).collect()
        }

    # crash A: after the tokens publish, before the marker — the retry
    # must un-publish the same-fp files first (the increment reads the
    # leg it appends to)
    root_a = str(tmp_path / "a")
    write_containment_state(reference, root_a, "doc_id", "text", **KW)
    monkeypatch.setattr(
        cs,
        "begin_fold_commit",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("injected pre-marker")),
    )
    with pytest.raises(RuntimeError, match="injected"):
        containment_state_increment(d1, root_a)
    monkeypatch.undo()
    retry = containment_state_increment(d1, root_a)
    assert not retry["replayed"]
    assert _pairs(retry["pairs"]) == _pairs(ref["pairs"])
    assert retry["report"] == ref["report"]
    assert _tokens(root_a) == _tokens(ref_root)

    # crash B: marker stranded at .committing — recovery finishes it and
    # the fold reports replayed
    root_b = str(tmp_path / "b")
    write_containment_state(reference, root_b, "doc_id", "text", **KW)
    monkeypatch.setattr(
        cs,
        "finish_fold_commit",
        lambda *a: (_ for _ in ()).throw(RuntimeError("injected pre-finish")),
    )
    with pytest.raises(RuntimeError, match="injected"):
        containment_state_increment(d1, root_b)
    monkeypatch.undo()
    retry_b = containment_state_increment(d1, root_b)
    assert retry_b["replayed"]
    assert retry_b["report"] == ref["report"]
    assert _tokens(root_b) == _tokens(ref_root)


def test_layout_and_meta_guards(spark, tmp_path):
    reference, d1, _ = _corpus(spark)
    root = str(tmp_path / "state")
    write_containment_state(reference, root, "doc_id", "text", **KW)
    # a jaccard-family operation on a containment tree must refuse
    from home_credit_data_engineering_spark.sources.maintenance import (
        assert_layout_if_marked,
    )

    with pytest.raises(ValueError, match="containment"):
        assert_layout_if_marked(root, "batch", "jaccard")
    # increments fold under the PINNED semantics — they take none
    meta = read_containment_meta(root)
    assert meta["id_col"] == "doc_id" and meta["text_col"] == "text"


def test_compaction_and_sweep(spark, tmp_path):
    """Tokens-leg compaction preserves state; the lake sweep classifies
    the tree, proposes (dry-run) and performs compaction past the
    window, and blocks on unledgered residue without --reconcile."""
    from home_credit_data_engineering_spark.sources.maintenance import (
        delta_file_count,
        ledger_dir,
    )
    from home_credit_data_engineering_spark.sources.sweep import sweep_lake

    reference, d1, d2 = _corpus(spark)
    lake = tmp_path / "lake"
    root = str(lake / "cstate")
    write_containment_state(reference, root, "doc_id", "text", **KW)
    r1 = containment_state_increment(d1, root)
    containment_state_increment(d2, root)
    n = delta_file_count(root, ("tokens",))
    assert n >= 2
    before = containment_state_report(spark, root)

    rep = sweep_lake(spark, str(lake), compact_deltas_window=1, dry_run=True)[0]
    assert rep["family"] == "containment"
    assert rep["would_compact_deltas"] == {"files": n, "window": 1}
    rep = sweep_lake(spark, str(lake), compact_deltas_window=1)[0]
    assert rep["deltas_compacted"]["after"] == 0
    assert containment_state_report(spark, root) == before

    # replay of a compacted-away fold is still a committed no-op
    again = containment_state_increment(d1, root)
    assert again["replayed"] and again["report"] == r1["report"]

    # unledgered residue blocks compaction; --reconcile unblocks
    d3 = spark.createDataFrame(
        [(50, "qq1 qq2 qq3 qq4 qq5")], "doc_id long, text string"
    )
    res3 = containment_state_increment(d3, root)
    os.remove(
        os.path.join(ledger_dir(root), res3["report"]["delta_fingerprint"])
    )
    rep = compact_containment_state(spark, root)
    assert rep["skipped"] == "unledgered-delta-residue"
    rep = sweep_lake(spark, str(lake), compact_deltas_window=0)[0]
    assert rep.get("compaction_blocked_by_orphans") is True
    rep = sweep_lake(
        spark, str(lake), compact_deltas_window=0, reconcile_orphans=True
    )[0]
    assert delta_file_count(root, ("tokens",)) == 0


def test_collapse_exact_increment_bit_identical_on_duplicated_delta(
    spark, tmp_path
):
    """Collapse-exact-first containment fold (boilerplate-heavy-delta
    regime): pairs AND token appends bit-identical to the direct
    increment on a 10x-duplicated delta, with the measured candidate
    cut in the fold report. Plants a group whose REPRESENTATIVE id
    equals a reference id — the deferred self-pair guard must drop the
    rep's own (x, x) pair while keeping every other member's pair with
    that reference (a candidate-level guard would drop the whole
    group's)."""
    reference, d1, d2 = _corpus(spark)
    bench2 = reference.filter(F.col("doc_id") == 902).first()["text"]
    delta = d1
    for k in range(1, 10):
        delta = delta.unionByName(
            d1.withColumn("doc_id", F.col("doc_id") + F.lit(1000 * k))
        )
    # the planted group: min id 902 IS a reference id; 77777 is not
    # (and does not collide with any replica-shifted d1 id, unlike
    # e.g. 5002 which is doc 2's k=5 twin)
    delta = delta.unionByName(
        spark.createDataFrame(
            [(902, bench2), (77777, bench2)], "doc_id long, text string"
        )
    )

    root_d = str(tmp_path / "direct")
    root_c = str(tmp_path / "collapsed")
    for root in (root_d, root_c):
        write_containment_state(reference, root, "doc_id", "text", **KW)
    rd = containment_state_increment(delta, root_d)
    rc = containment_state_increment(delta, root_c, collapse_exact=True)
    got = _pairs(rc["pairs"])
    assert got == _pairs(rd["pairs"])
    assert rc["report"]["n_pairs"] == rd["report"]["n_pairs"]
    # the planted edge: the member keeps its reference pair, the
    # rep's self-pair is dropped — in BOTH modes
    assert got[(77777, 902)] == 1.0
    assert (902, 902) not in got

    def _tokens(root):
        return {
            (r["token"], r["freq"])
            for r in spark.read.parquet(os.path.join(root, "tokens")).collect()
        }

    assert _tokens(root_c) == _tokens(root_d)
    # 42 shingling delta docs collapse to 5 md5 groups (d1's four
    # distinct texts + the planted bench2 group)
    assert rc["report"]["collapsed"] == {"n_groups": 5, "n_docs": 42}
    cut = rd["report"]["candidate_pairs"] / rc["report"]["candidate_pairs"]
    assert cut > 5, f"candidate cut only {cut:.1f}x"

    # the collapsed-built state chains: a later DIRECT fold closes to
    # the full containment_join over the accumulated probe corpus
    r2 = containment_state_increment(d2, root_c)
    full = containment_join(
        delta.unionByName(d2), reference, "doc_id", "text", **KW
    )
    assert (got | _pairs(r2["pairs"])) == _pairs(full)

    # CLI surface: --collapse-exact on a fresh tree reproduces the
    # direct pairs
    from home_credit_data_engineering_spark.jobs import containment_index as job

    root_cli = str(tmp_path / "cli")
    write_containment_state(reference, root_cli, "doc_id", "text", **KW)
    delta_pq = str(tmp_path / "delta_pq")
    out = str(tmp_path / "cli_pairs")
    delta.write.parquet(delta_pq)
    assert job.main([
        "--input", delta_pq, "--state-dir", root_cli,
        "--output-pairs", out, "--collapse-exact",
    ]) == 0
    assert _pairs(spark.read.parquet(out)) == got


def test_containment_cli_build_and_increment(spark, tmp_path, capsys):
    from home_credit_data_engineering_spark.jobs import containment_index as job

    reference, d1, _ = _corpus(spark)
    ref_pq = str(tmp_path / "reference")
    d1_pq = str(tmp_path / "d1")
    reference.write.parquet(ref_pq)
    d1.write.parquet(d1_pq)
    root = str(tmp_path / "state")
    out = str(tmp_path / "pairs")

    assert job.main([
        "--input", ref_pq, "--state-dir", root,
        "--threshold", "0.5", "--shingle-k", "3",
    ]) == 0
    assert "build:" in capsys.readouterr().out

    assert job.main([
        "--input", d1_pq, "--state-dir", root, "--output-pairs", out,
    ]) == 0
    assert "contaminated pairs" in capsys.readouterr().out
    got = _pairs(spark.read.parquet(out))
    assert got == _pairs(containment_join(d1, reference, "doc_id", "text", **KW))

    # re-run = replayed no-op
    assert job.main([
        "--input", d1_pq, "--state-dir", root, "--output-pairs", out,
    ]) == 0
    assert "replayed" in capsys.readouterr().out


def test_streamed_containment_ingest_replay_idempotent(spark, tmp_path):
    """Structured-Streaming decontamination tap: micro-batches fold
    through the same ledger as the batch CLI — stream pairs == one-shot
    containment_join, a resumed stream folds nothing, and a
    content-duplicate redelivery (same OR new batch id) is a committed
    no-op."""
    import glob
    import shutil

    from home_credit_data_engineering_spark.streaming.containment import (
        foreach_batch_containment_ingest,
    )

    reference, d1, d2 = _corpus(spark)
    root = str(tmp_path / "state")
    write_containment_state(reference, root, "doc_id", "text", **KW)

    src = str(tmp_path / "_src")
    os.makedirs(src)
    for i, frame in enumerate((d1, d2)):
        stage = str(tmp_path / f"_stage{i}")
        frame.coalesce(1).write.parquet(stage)
        shutil.copy(
            glob.glob(stage + "/part-*.parquet")[0], f"{src}/{i:02d}.parquet"
        )

    def start(reports, tag="", **kw):
        stream = (
            spark.readStream.format("parquet")
            .schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .load(src)
        )
        return foreach_batch_containment_ingest(
            stream,
            str(tmp_path / f"state{tag}") if tag else root,
            str(tmp_path / f"ckpt{tag}"),
            pairs_dir=str(tmp_path / f"pairs{tag}"),
            reports=reports,
            **kw,
        )

    reports: list = []
    start(reports)
    assert [r["replayed"] for r in reports] == [False, False]
    streamed = _pairs(spark.read.parquet(str(tmp_path / "pairs")).drop("batch"))
    full = containment_join(
        d1.unionByName(d2), reference, "doc_id", "text", **KW
    )
    assert streamed == _pairs(full) and streamed

    # resume on the same checkpoint: no data, no folds
    reports2: list = []
    start(reports2)
    assert reports2 == []

    # content-duplicate under a NEW batch id (producer re-drop): the
    # documented committed no-op, not the strict scripted-caller raise
    before = containment_state_report(spark, root)
    shutil.copy(f"{src}/00.parquet", f"{src}/99.parquet")
    reports3: list = []
    start(reports3)
    assert [r["replayed"] for r in reports3] == [True]
    assert containment_state_report(spark, root) == before
    assert not os.path.isdir(
        str(tmp_path / "pairs") + f"/batch={reports3[0]['batch_id']}"
    )

    # collapse_exact plumb-through: a collapsed-mode stream over the
    # same source (fresh state/checkpoint) folds with the collapsed
    # report block and produces the same durable pairs
    write_containment_state(
        reference, str(tmp_path / "state_c"), "doc_id", "text", **KW
    )
    reports_c: list = []
    start(reports_c, tag="_c", collapse_exact=True)
    # three files by now (00, 01, 99): two real folds + the dup no-op
    assert [r["replayed"] for r in reports_c] == [False, False, True]
    assert all("collapsed" in r for r in reports_c if not r["replayed"])
    streamed_c = _pairs(
        spark.read.parquet(str(tmp_path / "pairs_c")).drop("batch")
    )
    assert streamed_c == streamed
