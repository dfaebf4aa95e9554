"""Persisted exact-Jaccard prefix-state maintenance
(``operators/jaccard_state.py`` + ``jobs/jaccard_index.py`` + the sweep
classification): ledger-idempotent folds, crash replay convergence,
pinned semantics, lake-sweep discovery."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.dedup import (
    jaccard_similarity_join,
)
from home_credit_data_engineering_spark.operators.jaccard_state import (
    jaccard_state_increment,
    read_jaccard_meta,
    write_jaccard_state,
)

KW = dict(threshold=0.3, shingle_k=3)


def _corpus(spark):
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(35)]

    def doc(n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    base = doc(28)
    old = spark.createDataFrame(
        [(i, base if i % 4 == 0 else doc(rng.randint(8, 30)))
         for i in range(1, 15)],
        "doc_id long, text string",
    )
    d1 = spark.createDataFrame(
        [(100 + i, base if i % 3 == 0 else doc(rng.randint(8, 30)))
         for i in range(6)],
        "doc_id long, text string",
    )
    d2 = spark.createDataFrame(
        [(200, base), (201, doc(15) + " qq1 qq2 qq3 qq1 qq2 qq3")],
        "doc_id long, text string",
    )
    return old, d1, d2


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in df.collect()}


def test_state_folds_match_full_join_across_two_deltas(spark, tmp_path):
    old, d1, d2 = _corpus(spark)
    root = str(tmp_path / "state")
    write_jaccard_state(old, root, "doc_id", "text", **KW)
    meta = read_jaccard_meta(root)
    assert meta["threshold"] == 0.3 and meta["shingle_k"] == 3

    full01 = old.unionByName(d1)
    full012 = full01.unionByName(d2)
    r1 = jaccard_state_increment(d1, root, full01)
    assert not r1["replayed"]
    got1 = _pairs(r1["pairs"])
    pairs_old = _pairs(jaccard_similarity_join(old, "doc_id", "text", **KW))
    pairs_f1 = _pairs(jaccard_similarity_join(full01, "doc_id", "text", **KW))
    assert {**pairs_old, **got1} == pairs_f1

    # second fold chains on the appended state (frozen-order induction
    # through the PERSISTED tree, incl. brand-new qq tokens)
    r2 = jaccard_state_increment(d2, root, full012)
    got2 = _pairs(r2["pairs"])
    pairs_f2 = _pairs(jaccard_similarity_join(full012, "doc_id", "text", **KW))
    assert {**pairs_f1, **got2} == pairs_f2
    assert r2["report"]["n_new_tokens"] > 0  # qq vocabulary extended


def _fs_snapshot(root):
    snap = set()
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            snap.add((os.path.relpath(p, root), os.path.getsize(p)))
    return snap


def test_replayed_fold_is_byte_level_noop(spark, tmp_path):
    old, d1, _ = _corpus(spark)
    root = str(tmp_path / "state")
    write_jaccard_state(old, root, "doc_id", "text", **KW)
    first = jaccard_state_increment(d1, root, old.unionByName(d1))
    snap = _fs_snapshot(root)
    again = jaccard_state_increment(d1, root, old.unionByName(d1))
    assert again["replayed"] and again["pairs"] is None
    assert again["report"] == first["report"]
    assert _fs_snapshot(root) == snap


def test_crash_replay_converges(spark, tmp_path, monkeypatch):
    """Kill the fold at both crash points; the retry must converge to
    the same state bytes and the same pairs as an uncrashed fold."""
    import home_credit_data_engineering_spark.operators.jaccard_state as js

    old, d1, _ = _corpus(spark)
    all_texts = old.unionByName(d1)

    # uncrashed reference
    ref_root = str(tmp_path / "ref")
    write_jaccard_state(old, ref_root, "doc_id", "text", **KW)
    ref = jaccard_state_increment(d1, ref_root, all_texts)
    ref_pairs = _pairs(ref["pairs"])

    # crash A: after the FIRST publish (prefixes appended, tokens not,
    # no marker) — the dirty-state case the un-publish step exists for
    root_a = str(tmp_path / "a")
    write_jaccard_state(old, root_a, "doc_id", "text", **KW)
    real_publish = js.publish_delta_files
    calls = {"n": 0}

    def exploding_publish(src, dest, fp):
        calls["n"] += 1
        out = real_publish(src, dest, fp)
        if calls["n"] == 1:
            raise RuntimeError("injected crash after first publish")
        return out

    monkeypatch.setattr(js, "publish_delta_files", exploding_publish)
    with pytest.raises(RuntimeError, match="injected"):
        jaccard_state_increment(d1, root_a, all_texts)
    monkeypatch.setattr(js, "publish_delta_files", real_publish)
    retry = jaccard_state_increment(d1, root_a, all_texts)
    assert not retry["replayed"]
    assert _pairs(retry["pairs"]) == ref_pairs
    assert retry["report"] == ref["report"]

    # crash B: between begin_fold_commit and finish_fold_commit (marker
    # stranded at .committing; publishes complete) — the retry's
    # recover_fold_commits finishes it, so the fold reports replayed
    root_b = str(tmp_path / "b")
    write_jaccard_state(old, root_b, "doc_id", "text", **KW)
    real_finish = js.finish_fold_commit
    monkeypatch.setattr(
        js,
        "finish_fold_commit",
        lambda *a: (_ for _ in ()).throw(RuntimeError("injected pre-finish")),
    )
    with pytest.raises(RuntimeError, match="injected"):
        jaccard_state_increment(d1, root_b, all_texts)
    monkeypatch.setattr(js, "finish_fold_commit", real_finish)
    retry_b = jaccard_state_increment(d1, root_b, all_texts)
    assert retry_b["replayed"]
    assert retry_b["report"] == ref["report"]

    # the PUBLISHED delta files carry deterministic names — they must be
    # identical (name and size) across the crashed-and-retried roots;
    # base-build part files keep Spark's per-run UUID names, so compare
    # the delta set, plus total state row counts
    def _delta_files(root):
        out = set()
        for leg in ("prefixes", "tokens"):
            d = os.path.join(root, leg)
            out |= {
                (leg, f, os.path.getsize(os.path.join(d, f)))
                for f in os.listdir(d)
                if f.startswith("delta-")
            }
        return out

    assert _delta_files(root_b) == _delta_files(root_a)
    for leg in ("prefixes", "tokens"):
        assert (
            spark.read.parquet(os.path.join(root_b, leg)).count()
            == spark.read.parquet(os.path.join(root_a, leg)).count()
        )


def test_layout_and_meta_guards(spark, tmp_path):
    from home_credit_data_engineering_spark.sources.maintenance import (
        write_state_layout,
    )

    old, d1, _ = _corpus(spark)
    # a foreign (streamed) tree must be refused BEFORE recovery
    foreign = str(tmp_path / "foreign")
    os.makedirs(foreign)
    write_state_layout(foreign, "streamed", "jaccard")
    with pytest.raises(ValueError, match="streamed-maintained"):
        jaccard_state_increment(d1, foreign, old)


def test_sweep_classifies_and_dry_runs_jaccard_state(spark, tmp_path):
    from home_credit_data_engineering_spark.jobs import maintenance as job
    from home_credit_data_engineering_spark.sources.sweep import sweep_lake

    old, d1, _ = _corpus(spark)
    lake = tmp_path / "lake"
    root = str(lake / "indexes" / "jac")
    write_jaccard_state(old, root, "doc_id", "text", **KW)
    jaccard_state_increment(d1, root, old.unionByName(d1))
    # strand a fold marker to exercise the sweep's recovery
    ledger = os.path.join(root, "_delta_ledger")
    done = [f for f in os.listdir(ledger) if not f.endswith(".committing")]
    os.rename(
        os.path.join(ledger, done[0]),
        os.path.join(ledger, done[0] + ".committing"),
    )

    # dry-run: pending detected, nothing touched
    before = _fs_snapshot(str(lake))
    reports = sweep_lake(spark, str(lake), dry_run=True)
    assert [r["family"] for r in reports] == ["jaccard"]
    assert reports[0]["recovered"] == 1
    assert reports[0]["n_docs"] is None  # reads skipped on pending trees
    assert _fs_snapshot(str(lake)) == before

    # live sweep finishes the marker and reports the state body
    assert job.main(["sweep", "--root", str(lake)]) == 0
    reports = sweep_lake(spark, str(lake))
    assert reports[0]["recovered"] == 0
    assert reports[0]["n_docs"] == 20  # 14 base + 6 delta docs
    assert reports[0]["threshold"] == 0.3


def test_jaccard_cli_build_and_increment(spark, tmp_path, capsys):
    from home_credit_data_engineering_spark.jobs import jaccard_index as job

    old, d1, _ = _corpus(spark)
    docs_p = str(tmp_path / "docs.parquet")
    delta_p = str(tmp_path / "delta.parquet")
    all_p = str(tmp_path / "all.parquet")
    old.write.parquet(docs_p)
    d1.write.parquet(delta_p)
    old.unionByName(d1).write.parquet(all_p)
    state = str(tmp_path / "state")
    out_pairs = str(tmp_path / "pairs")

    assert job.main(
        ["--input", docs_p, "--state-dir", state,
         "--threshold", "0.3", "--shingle-k", "3"]
    ) == 0
    assert "build:" in capsys.readouterr().out
    assert job.main(
        ["--input", delta_p, "--state-dir", state,
         "--all-texts", all_p, "--output-pairs", out_pairs]
    ) == 0
    assert "increment:" in capsys.readouterr().out
    got = _pairs(spark.read.parquet(out_pairs))
    full = _pairs(
        jaccard_similarity_join(
            old.unionByName(d1), "doc_id", "text", **KW
        )
    )
    old_pairs = _pairs(jaccard_similarity_join(old, "doc_id", "text", **KW))
    assert {**old_pairs, **got} == full
    # re-run = replayed no-op
    assert job.main(
        ["--input", delta_p, "--state-dir", state, "--all-texts", all_p]
    ) == 0
    assert "replayed" in capsys.readouterr().out


def test_abandoned_fingerprint_residue_is_reconciled(spark, tmp_path, monkeypatch):
    """A fold that crashes pre-marker and is then AMENDED (different
    content -> different fingerprint) leaves orphan delta files the
    retry's own un-publish can never match; reconcile_orphan_deltas
    (run by every increment and by the sweep) must remove exactly that
    residue, and dry-run must only count it."""
    import home_credit_data_engineering_spark.operators.jaccard_state as js
    from home_credit_data_engineering_spark.operators.jaccard_state import (
        reconcile_orphan_deltas,
    )

    old, d1, _ = _corpus(spark)
    root = str(tmp_path / "state")
    write_jaccard_state(old, root, "doc_id", "text", **KW)

    # crash after the first publish of the ORIGINAL delta
    real_publish = js.publish_delta_files
    calls = {"n": 0}

    def exploding(src, dest, fp):
        calls["n"] += 1
        out = real_publish(src, dest, fp)
        if calls["n"] == 1:
            raise RuntimeError("injected")
        return out

    monkeypatch.setattr(js, "publish_delta_files", exploding)
    with pytest.raises(RuntimeError, match="injected"):
        jaccard_state_increment(d1, root, old.unionByName(d1))
    monkeypatch.setattr(js, "publish_delta_files", real_publish)
    orphans = [
        f
        for f in os.listdir(os.path.join(root, "prefixes"))
        if f.startswith("delta-")
    ]
    assert orphans, "crash must have left published residue"

    # dry-run counts without touching
    assert reconcile_orphan_deltas(root, dry_run=True) == 1
    assert all(
        os.path.exists(os.path.join(root, "prefixes", f)) for f in orphans
    )

    # the AMENDED delta (one row fixed -> new fingerprint) folds clean:
    # the increment's own reconcile removes the abandoned residue first
    amended = d1.withColumn(
        "text", F.when(F.col("doc_id") == 100, F.lit("fixed row")).otherwise(
            F.col("text")
        )
    )
    all_texts = old.unionByName(amended)
    res = jaccard_state_increment(amended, root, all_texts)
    assert not res["replayed"]
    assert not any(
        os.path.exists(os.path.join(root, "prefixes", f)) for f in orphans
    )
    got = _pairs(res["pairs"])
    pairs_old = _pairs(jaccard_similarity_join(old, "doc_id", "text", **KW))
    pairs_full = _pairs(
        jaccard_similarity_join(all_texts, "doc_id", "text", **KW)
    )
    assert {**pairs_old, **got} == pairs_full
    # no phantom rows: prefix doc count == true corpus size
    from home_credit_data_engineering_spark.operators.jaccard_state import (
        jaccard_state_report,
    )

    assert jaccard_state_report(spark, root)["n_docs"] == 20


def test_output_pairs_written_inside_the_fold(spark, tmp_path):
    old, d1, _ = _corpus(spark)
    root = str(tmp_path / "state")
    out = str(tmp_path / "pairs")
    write_jaccard_state(old, root, "doc_id", "text", **KW)
    res = jaccard_state_increment(
        d1, root, old.unionByName(d1), output_pairs=out
    )
    assert res["report"]["output_pairs"] == out
    assert _pairs(spark.read.parquet(out)) == _pairs(res["pairs"])
    # replay still points at the durable output
    again = jaccard_state_increment(
        d1, root, old.unionByName(d1), output_pairs=out
    )
    assert again["replayed"] and again["report"]["output_pairs"] == out


def test_streamed_jaccard_ingest_replay_idempotent(spark, tmp_path):
    """Structured-Streaming maintenance: micro-batches fold through the
    same ledger as the batch CLI — stream result == full recompute, a
    resumed stream over the same source folds nothing new, and a
    content-duplicate redelivery is a committed no-op."""
    import glob
    import shutil

    from home_credit_data_engineering_spark.streaming.jaccard import (
        foreach_batch_jaccard_ingest,
    )

    old, d1, d2 = _corpus(spark)
    all_docs = old.unionByName(d1).unionByName(d2)
    root = str(tmp_path / "state")
    write_jaccard_state(old, root, "doc_id", "text", **KW)

    # the streaming source: the deltas as single-file parquet drops
    # (one file per micro-batch via maxFilesPerTrigger), and the texts
    # lake the verify reads from
    texts_p = str(tmp_path / "texts.parquet")
    all_docs.write.parquet(texts_p)
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
        return foreach_batch_jaccard_ingest(
            stream,
            str(tmp_path / f"state{tag}") if tag else root,
            texts_p,
            str(tmp_path / f"ckpt{tag}"),
            pairs_dir=str(tmp_path / f"pairs{tag}"),
            reports=reports,
            **kw,
        )

    reports: list = []
    start(reports)
    assert [r["replayed"] for r in reports] == [False, False]

    # stream pairs ∪ base pairs == full recompute
    streamed = _pairs(spark.read.parquet(str(tmp_path / "pairs")).drop("batch"))
    pairs_old = _pairs(jaccard_similarity_join(old, "doc_id", "text", **KW))
    pairs_full = _pairs(
        jaccard_similarity_join(all_docs, "doc_id", "text", **KW)
    )
    assert {**pairs_old, **streamed} == pairs_full

    # resume on the same checkpoint: no data, no folds
    reports2: list = []
    start(reports2)
    assert reports2 == []

    # content-duplicate redelivery (fresh checkpoint, same files):
    # every fold replays as a committed no-op and the state is unchanged
    snap = _fs_snapshot(root)
    shutil.rmtree(str(tmp_path / "ckpt"))
    reports3: list = []
    start(reports3)
    assert [r["replayed"] for r in reports3] == [True, True]
    assert _fs_snapshot(root) == snap

    # content-duplicate under a NEW batch id (producer re-drops the same
    # file): the per-batch pairs path differs from the fold's recorded
    # one, and the documented contract is a committed no-op that writes
    # nothing — NOT the strict scripted-caller raise (which would kill
    # the streaming query)
    shutil.copy(f"{src}/00.parquet", f"{src}/99.parquet")
    reports4: list = []
    start(reports4)
    assert [r["replayed"] for r in reports4] == [True]
    assert reports4[0]["batch_id"] not in (0, 1)
    assert _fs_snapshot(root) == snap
    assert not os.path.isdir(
        str(tmp_path / "pairs") + f"/batch={reports4[0]['batch_id']}"
    )

    # collapse_exact plumb-through: a collapsed-mode stream over the
    # same source (fresh state/checkpoint) folds with the collapsed
    # report block and the same durable pairs
    write_jaccard_state(old, str(tmp_path / "state_c"), "doc_id", "text", **KW)
    reports_c: list = []
    start(reports_c, tag="_c", collapse_exact=True)
    # three files by now (00, 01, 99-dup of 00): two real folds + no-op
    assert [r["replayed"] for r in reports_c] == [False, False, True]
    assert all("collapsed" in r for r in reports_c if not r["replayed"])
    streamed_c = _pairs(
        spark.read.parquet(str(tmp_path / "pairs_c")).drop("batch")
    )
    assert streamed_c == streamed


def test_replay_with_unpersisted_output_pairs_raises(spark, tmp_path):
    """A replayed fold cannot regenerate pairs (the state already holds
    the delta) — requesting output_pairs the completed fold never wrote
    must RAISE, not exit clean with the promised file absent."""
    old, d1, _ = _corpus(spark)
    root = str(tmp_path / "state")
    write_jaccard_state(old, root, "doc_id", "text", **KW)
    all_texts = old.unionByName(d1)
    jaccard_state_increment(d1, root, all_texts)  # fold without pairs
    with pytest.raises(RuntimeError, match="without persisting pairs"):
        jaccard_state_increment(
            d1, root, all_texts, output_pairs=str(tmp_path / "late")
        )
    # a DIFFERENT requested path than the recorded one raises too
    old2, d2 = _corpus(spark)[0], _corpus(spark)[2]
    root2 = str(tmp_path / "state2")
    out2 = str(tmp_path / "pairs2")
    write_jaccard_state(old2, root2, "doc_id", "text", **KW)
    all2 = old2.unionByName(d2)
    jaccard_state_increment(d2, root2, all2, output_pairs=out2)
    with pytest.raises(RuntimeError, match="cannot produce"):
        jaccard_state_increment(
            d2, root2, all2, output_pairs=str(tmp_path / "elsewhere")
        )
    # recorded path deleted since the fold -> same contract
    import shutil

    shutil.rmtree(out2)
    with pytest.raises(RuntimeError, match="cannot produce"):
        jaccard_state_increment(d2, root2, all2, output_pairs=out2)


def test_sweep_reconciles_orphans_only_on_request(spark, tmp_path):
    """Published delta files of a fold IN FLIGHT are indistinguishable
    from abandoned residue — the lake sweep must leave them alone unless
    --reconcile is passed (the maintainer's own startup reconcile stays
    the safe default path)."""
    from home_credit_data_engineering_spark.sources.sweep import sweep_lake

    old, d1, _ = _corpus(spark)
    lake = tmp_path / "lake"
    root = str(lake / "jstate")
    write_jaccard_state(old, root, "doc_id", "text", **KW)
    res = jaccard_state_increment(d1, root, old.unionByName(d1))
    assert not res["replayed"]
    # simulate a fold between publish and marker-commit: delta files
    # present, ledger entry removed (what an in-flight fold looks like)
    from home_credit_data_engineering_spark.sources.maintenance import (
        ledger_dir,
    )

    fp = res["report"]["delta_fingerprint"]
    os.remove(os.path.join(ledger_dir(root), fp))
    published = [
        f
        for f in os.listdir(os.path.join(root, "prefixes"))
        if f.startswith(f"delta-{fp}-")
    ]
    assert published

    # default sweep: files survive, dry-run reports no orphan action
    reports = sweep_lake(spark, str(lake), dry_run=True)
    assert reports[0]["recovered"] == 0
    sweep_lake(spark, str(lake))
    assert all(
        os.path.exists(os.path.join(root, "prefixes", f)) for f in published
    )

    # opt-in reconcile: dry-run counts it, live sweep removes it
    reports = sweep_lake(spark, str(lake), dry_run=True, reconcile_orphans=True)
    assert reports[0]["recovered"] == 1
    sweep_lake(spark, str(lake), reconcile_orphans=True)
    assert not any(
        os.path.exists(os.path.join(root, "prefixes", f)) for f in published
    )


def _state_rows(spark, root):
    pre = {
        (r["doc_id"], r["set_size"], r["token"])
        for r in spark.read.parquet(os.path.join(root, "prefixes")).collect()
    }
    tok = {
        (r["token"], r["freq"])
        for r in spark.read.parquet(os.path.join(root, "tokens")).collect()
    }
    return pre, tok


def test_compaction_bounds_files_and_preserves_state(spark, tmp_path):
    """Ledgered-leg compaction: delta files fold into the base, ledger
    markers survive (replay stays a no-op), state rows are identical,
    and the next fold appends normally."""
    from home_credit_data_engineering_spark.operators.jaccard_state import (
        compact_jaccard_state,
    )
    from home_credit_data_engineering_spark.sources.maintenance import (
        delta_file_count,
    )

    old, d1, d2 = _corpus(spark)
    root = str(tmp_path / "state")
    write_jaccard_state(old, root, "doc_id", "text", **KW)
    full01 = old.unionByName(d1)
    r1 = jaccard_state_increment(d1, root, full01)
    before = _state_rows(spark, root)
    assert delta_file_count(root, ("prefixes", "tokens")) > 0

    rep = compact_jaccard_state(spark, root, target_files=2)
    assert "skipped" not in rep
    assert rep["prefixes"]["files_after"] <= 2
    assert delta_file_count(root, ("prefixes", "tokens")) == 0
    assert _state_rows(spark, root) == before

    # replay of the compacted-away fold is still a committed no-op
    again = jaccard_state_increment(d1, root, full01)
    assert again["replayed"] and again["report"] == r1["report"]

    # and the NEXT delta folds cleanly on the compacted base
    full012 = full01.unionByName(d2)
    r2 = jaccard_state_increment(d2, root, full012)
    assert not r2["replayed"]
    got = _pairs(r1["pairs"]) | _pairs(r2["pairs"])
    pairs_old = _pairs(jaccard_similarity_join(old, "doc_id", "text", **KW))
    pairs_full = _pairs(
        jaccard_similarity_join(full012, "doc_id", "text", **KW)
    )
    assert {**pairs_old, **got} == pairs_full


def test_compaction_refuses_unledgered_residue(spark, tmp_path):
    """Baking a half-published (in-flight or abandoned) delta into the
    compacted base would make phantom rows permanent — compaction must
    refuse, and proceed once the residue is reconciled."""
    from home_credit_data_engineering_spark.operators.jaccard_state import (
        compact_jaccard_state,
        reconcile_orphan_deltas,
    )
    from home_credit_data_engineering_spark.sources.maintenance import (
        ledger_dir,
    )

    old, d1, _ = _corpus(spark)
    root = str(tmp_path / "state")
    write_jaccard_state(old, root, "doc_id", "text", **KW)
    res = jaccard_state_increment(d1, root, old.unionByName(d1))
    fp = res["report"]["delta_fingerprint"]
    os.remove(os.path.join(ledger_dir(root), fp))  # now looks in-flight

    rep = compact_jaccard_state(spark, root)
    assert rep["skipped"] == "unledgered-delta-residue"
    assert rep["orphan_fingerprints"] == [fp]

    reconcile_orphan_deltas(root)
    rep2 = compact_jaccard_state(spark, root, target_files=2)
    assert "skipped" not in rep2


def test_compaction_crash_matrix(spark, tmp_path, monkeypatch):
    """Kill the compaction at each crash point; the increment preamble's
    per-leg swap recovery must leave identical state rows and a working
    next fold either way."""
    import home_credit_data_engineering_spark.sources.maintenance as mt
    from home_credit_data_engineering_spark.operators.jaccard_state import (
        compact_jaccard_state,
    )

    old, d1, d2 = _corpus(spark)
    full01 = old.unionByName(d1)
    full012 = full01.unionByName(d2)

    # reference: uncrashed compaction then fold d2
    ref_root = str(tmp_path / "ref")
    write_jaccard_state(old, ref_root, "doc_id", "text", **KW)
    jaccard_state_increment(d1, ref_root, full01)
    compact_jaccard_state(spark, ref_root)
    ref2 = jaccard_state_increment(d2, ref_root, full012)
    ref_rows = _state_rows(spark, ref_root)

    real_swap = mt.swap_in_state

    # crash A: staged rewrite complete for leg 1, swap never ran
    # (discardable staged dir; live legs untouched)
    # crash B: between the two legs' swaps (prefixes compacted, tokens
    # not — both content-identical to before)
    for label, explode_at in (("a", 1), ("b", 2)):
        root = str(tmp_path / label)
        write_jaccard_state(old, root, "doc_id", "text", **KW)
        jaccard_state_increment(d1, root, full01)
        pre_rows = _state_rows(spark, root)
        calls = {"n": 0}

        def exploding_swap(path, _c=calls, _k=explode_at):
            _c["n"] += 1
            if _c["n"] == _k:
                raise RuntimeError("injected compaction crash")
            return real_swap(path)

        monkeypatch.setattr(mt, "swap_in_state", exploding_swap)
        with pytest.raises(RuntimeError, match="injected"):
            compact_jaccard_state(spark, root)
        monkeypatch.setattr(mt, "swap_in_state", real_swap)
        # state content is unchanged through the crash
        assert _state_rows(spark, root) == pre_rows
        # the next fold recovers the leg swaps in its preamble and
        # converges to the reference state
        r2 = jaccard_state_increment(d2, root, full012)
        assert not r2["replayed"]
        assert _pairs(r2["pairs"]) == _pairs(ref2["pairs"])
        assert _state_rows(spark, root) == ref_rows


def test_sweep_compacts_jaccard_deltas_past_window(spark, tmp_path):
    """Lake sweep: dry-run reports would_compact_deltas (and exits 3 via
    the CLI contract), live sweep folds the delta files; orphan residue
    blocks compaction unless --reconcile rides along."""
    from home_credit_data_engineering_spark.sources.maintenance import (
        delta_file_count,
        ledger_dir,
    )
    from home_credit_data_engineering_spark.sources.sweep import sweep_lake

    old, d1, d2 = _corpus(spark)
    lake = tmp_path / "lake"
    root = str(lake / "jstate")
    write_jaccard_state(old, root, "doc_id", "text", **KW)
    full01 = old.unionByName(d1)
    jaccard_state_increment(d1, root, full01)
    res2 = jaccard_state_increment(d2, root, full01.unionByName(d2))
    n = delta_file_count(root, ("prefixes", "tokens"))
    assert n >= 2
    before = _state_rows(spark, root)

    # under the window: no compaction proposed
    r = sweep_lake(spark, str(lake), compact_deltas_window=n)[0]
    assert "deltas_compacted" not in r and "would_compact_deltas" not in r

    # over the window: dry-run proposes, live sweep compacts
    r = sweep_lake(spark, str(lake), compact_deltas_window=1, dry_run=True)[0]
    assert r["would_compact_deltas"] == {"files": n, "window": 1}
    r = sweep_lake(spark, str(lake), compact_deltas_window=1)[0]
    assert r["deltas_compacted"]["before"] == n
    assert r["deltas_compacted"]["after"] == 0
    assert _state_rows(spark, root) == before

    # orphan residue blocks compaction (both modes) without --reconcile;
    # d3's marker is removed (looks in-flight) while d4 stays ledgered
    d3 = spark.createDataFrame(
        [(300, "zz1 zz2 zz3 zz4 zz5 zz6")], "doc_id long, text string"
    )
    d4 = spark.createDataFrame(
        [(301, "yy1 yy2 yy3 yy4 yy5 yy6")], "doc_id long, text string"
    )
    full3 = full01.unionByName(d2).unionByName(d3)
    res3 = jaccard_state_increment(d3, root, full3)
    jaccard_state_increment(d4, root, full3.unionByName(d4))
    os.remove(os.path.join(ledger_dir(root), res3["report"]["delta_fingerprint"]))
    r = sweep_lake(spark, str(lake), compact_deltas_window=0, dry_run=True)[0]
    assert r.get("compaction_blocked_by_orphans") is True
    assert "would_compact_deltas" not in r
    # blocked compaction IS pending work — the CLI dry-run contract
    # (exit 3 when the lake needs anything) must not read it as clean
    from home_credit_data_engineering_spark.jobs import maintenance as job

    assert job.main([
        "sweep", "--root", str(lake), "--dry-run",
        "--compact-deltas-window", "0",
    ]) == 3
    r = sweep_lake(spark, str(lake), compact_deltas_window=0)[0]
    assert r.get("compaction_blocked_by_orphans") is True
    # with --reconcile the dry-run proposes, and the live sweep removes
    # the residue then compacts the ledgered (d4) delta files. The
    # dry-run count excludes the orphans a live --reconcile would
    # delete before compacting (else it overstates the promise).
    n_ledgered = delta_file_count(root, ("prefixes", "tokens"), ledgered_only=True)
    n_all = delta_file_count(root, ("prefixes", "tokens"))
    assert n_ledgered < n_all
    r = sweep_lake(
        spark, str(lake), compact_deltas_window=0, dry_run=True,
        reconcile_orphans=True,
    )[0]
    assert r["would_compact_deltas"]["files"] == n_ledgered
    r = sweep_lake(
        spark, str(lake), compact_deltas_window=0, reconcile_orphans=True
    )[0]
    assert r["deltas_compacted"]["after"] == 0
    assert delta_file_count(root, ("prefixes", "tokens")) == 0


def test_collapse_exact_increment_bit_identical_on_duplicated_delta(
    spark, tmp_path
):
    """The collapse-exact-first fold (boilerplate-heavy-delta regime):
    pairs AND state appends bit-identical to the direct increment on a
    10x-duplicated delta, with the measured candidate cut in the fold
    report; the state it leaves behind chains a later direct fold to the
    same full-join closure."""
    old, d1, d2 = _corpus(spark)
    # 10 byte-identical copies of every d1 doc under fresh ids
    delta = d1
    for k in range(1, 10):
        delta = delta.unionByName(
            d1.withColumn("doc_id", F.col("doc_id") + F.lit(1000 * k))
        )
    all_texts = old.unionByName(delta)

    root_d = str(tmp_path / "direct")
    root_c = str(tmp_path / "collapsed")
    for root in (root_d, root_c):
        write_jaccard_state(old, root, "doc_id", "text", **KW)
    rd = jaccard_state_increment(delta, root_d, all_texts)
    rc = jaccard_state_increment(
        delta, root_c, all_texts, collapse_exact=True
    )
    assert _pairs(rc["pairs"]) == _pairs(rd["pairs"])
    assert rc["report"]["n_pairs"] == rd["report"]["n_pairs"]
    assert _state_rows(spark, root_c) == _state_rows(spark, root_d)
    # measured candidate cut: 60 delta docs collapse to 5 groups (d1's
    # six docs already hold one byte-dup pair), so rep-level candidates
    # must be far below the direct fold's
    assert rc["report"]["collapsed"] == {"n_groups": 5, "n_docs": 60}
    cut = rd["report"]["candidate_pairs"] / rc["report"]["candidate_pairs"]
    assert cut > 10, f"candidate cut only {cut:.1f}x"

    # the collapsed-built state chains: a later DIRECT fold closes to
    # the same full-join pair set
    full = all_texts.unionByName(d2)
    r2 = jaccard_state_increment(d2, root_c, full)
    got = _pairs(rd["pairs"]) | _pairs(r2["pairs"])
    pairs_old = _pairs(jaccard_similarity_join(old, "doc_id", "text", **KW))
    pairs_full = _pairs(jaccard_similarity_join(full, "doc_id", "text", **KW))
    assert {**pairs_old, **got} == pairs_full
