"""Replay-idempotent batch index folds (the processed-delta ledger,
``sources/maintenance.py``) and the mechanical batch-vs-streamed layout
guard.

The batch fold CLIs (``jobs/ann_index.py --state-dir``,
``jobs/bm25_index.py --increment``) sit exactly where an at-least-once
orchestrator re-runs completed work, so a completed fold re-run must be
a byte-level no-op on the index tree (data files, sidecars, stats), a
DISTINCT delta must still fold, and a crash inside the fold's commit
window must be finished — not half-applied — by the next run.
"""

from __future__ import annotations

import glob
import hashlib
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.ann_state import (
    ivf_index_increment,
    ivfpq_index_increment,
    read_cell_stats,
)
from home_credit_data_engineering_spark.operators.quantization import (
    build_ivfpq_index,
)
from home_credit_data_engineering_spark.operators.retrieval import (
    bm25_index_increment,
    bm25_query_index,
    build_bm25_index,
)
from home_credit_data_engineering_spark.operators.similarity import (
    build_ivf_index,
    ivf_query_index,
)
from home_credit_data_engineering_spark.sources.maintenance import (
    begin_fold_commit,
    check_state_layout,
    delta_fingerprint,
    ledger_dir,
    read_fold_marker,
    recover_fold_commits,
    staged_state_path,
    write_state_layout,
)

DIM = 8


def _vectors(spark, n=60, seed=0, id_base=0):
    rng = np.random.RandomState(seed)
    rows = [
        (id_base + i, (rng.normal(0, 1, DIM) + (i % 2) * 4.0).tolist())
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _docs(spark, n=30, seed=0, id_base=0):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rng = np.random.RandomState(seed)
    rows = [
        (
            id_base + i,
            " ".join(words[j] for j in rng.randint(0, len(words), 8)),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _tree_digest(root: str) -> dict[str, str]:
    """relpath → md5 of every file under ``root`` (crc/_SUCCESS too —
    the no-op claim is byte-level)."""
    out: dict[str, str] = {}
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        for f in sorted(filenames):
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = hashlib.md5(
                    fh.read()
                ).hexdigest()
    return out


# ---------------------------------------------------------------------------
# fingerprints
# ---------------------------------------------------------------------------


def test_delta_fingerprint_is_content_keyed_and_order_free(spark):
    df = _vectors(spark, n=20)
    a = delta_fingerprint(df, ["vec_id", "embedding"])
    # same content, different row order / partitioning → same fingerprint
    b = delta_fingerprint(
        df.orderBy(F.desc("vec_id")).repartition(5), ["vec_id", "embedding"]
    )
    assert a == b
    # different content → different fingerprint
    c = delta_fingerprint(df.filter("vec_id < 10"), ["vec_id", "embedding"])
    assert a != c


# ---------------------------------------------------------------------------
# ANN: IVF + IVF-PQ folds
# ---------------------------------------------------------------------------


def test_ivf_cli_same_delta_twice_is_noop(spark, tmp_path):
    from home_credit_data_engineering_spark.jobs import ann_index as job

    base, delta = _vectors(spark, n=40), _vectors(spark, n=20, id_base=1000)
    w1, w2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    base.write.parquet(w1)
    delta.write.parquet(w2)
    state = str(tmp_path / "state")
    assert job.main(
        ["--input", w1, "--state-dir", state, "--n-centroids", "2"]
    ) == 0
    assert job.main(
        ["--input", w2, "--state-dir", state, "--n-centroids", "2"]
    ) == 0
    once = _tree_digest(state)
    assert spark.read.parquet(state).count() == 60

    # the orchestrator retry: byte-identical tree, no duplicate rows
    assert job.main(
        ["--input", w2, "--state-dir", state, "--n-centroids", "2"]
    ) == 0
    assert _tree_digest(state) == once
    assert spark.read.parquet(state).count() == 60

    # a DISTINCT delta still folds
    delta2 = _vectors(spark, n=10, seed=7, id_base=5000)
    w3 = str(tmp_path / "w3")
    delta2.write.parquet(w3)
    assert job.main(
        ["--input", w3, "--state-dir", state, "--n-centroids", "2"]
    ) == 0
    assert spark.read.parquet(state).count() == 70
    stats_n = sum(
        r["n"] for r in read_cell_stats(spark, state).collect()
    )
    assert stats_n == 70


def test_ivf_increment_replay_returns_original_report(spark, tmp_path):
    base, delta = _vectors(spark, n=40), _vectors(spark, n=20, id_base=1000)
    path = str(tmp_path / "idx")
    build_ivf_index(base, path, n_centroids=2, seed=1)
    first = ivf_index_increment(delta, path)
    assert first["appended"] == 20 and "replayed" not in first
    again = ivf_index_increment(delta, path)
    assert again["replayed"] is True
    assert again["appended"] == 20
    assert again["delta_fingerprint"] == first["delta_fingerprint"]
    assert spark.read.parquet(path).count() == 60


def test_ivfpq_fold_replay_and_bounded_vector_files(spark, tmp_path):
    base, delta = _vectors(spark, n=40), _vectors(spark, n=20, id_base=1000)
    path = str(tmp_path / "idx")
    build_ivfpq_index(base, path, n_centroids=2, m=4, nbits=4, seed=1)
    vec_files_before = set(
        glob.glob(os.path.join(path, "vectors", "*.parquet"))
    )
    rep = ivf_pq = ivfpq_index_increment(delta, path)
    assert rep["appended"] == 20
    vec_files_after = set(
        glob.glob(os.path.join(path, "vectors", "*.parquet"))
    )
    new_files = vec_files_after - vec_files_before
    # bounded growth: ≤ one file per touched cell (2 cells here), with
    # deterministic fingerprint names — not one file per input partition
    assert 1 <= len(new_files) <= 2
    assert all(
        os.path.basename(f).startswith("delta-") for f in new_files
    )
    once = _tree_digest(path)
    replay = ivfpq_index_increment(delta, path)
    assert replay["replayed"] is True
    assert _tree_digest(path) == once
    codes = spark.read.parquet(os.path.join(path, "codes"))
    assert codes.count() == 60
    assert codes.select("vec_id").distinct().count() == 60


def test_ivf_fold_crash_inside_commit_is_finished_by_next_run(
    spark, tmp_path, monkeypatch
):
    """Kill the fold between ``begin_fold_commit`` and the stats swap:
    the next run must FINISH the fold (not re-apply it) and report it
    as replayed."""
    import home_credit_data_engineering_spark.operators.ann_state as ann_state

    base, delta = _vectors(spark, n=40), _vectors(spark, n=20, id_base=1000)
    path = str(tmp_path / "idx")
    build_ivf_index(base, path, n_centroids=2, seed=1)

    real_swap = ann_state.swap_in_state

    def exploding_swap(state_path):
        raise RuntimeError("injected crash before the stats swap")

    monkeypatch.setattr(ann_state, "swap_in_state", exploding_swap)
    with pytest.raises(RuntimeError, match="injected crash"):
        ivf_index_increment(delta, path)
    monkeypatch.setattr(ann_state, "swap_in_state", real_swap)

    # crashed mid-commit: marker present, staged stats not yet live
    committing = [
        f for f in os.listdir(ledger_dir(path)) if f.endswith(".committing")
    ]
    assert len(committing) == 1
    assert os.path.isdir(staged_state_path(os.path.join(path, "_cell_stats")))

    again = ivf_index_increment(delta, path)
    assert again["replayed"] is True
    assert spark.read.parquet(path).count() == 60
    stats_n = sum(r["n"] for r in read_cell_stats(spark, path).collect())
    assert stats_n == 60  # folded exactly once
    assert not any(
        f.endswith(".committing") for f in os.listdir(ledger_dir(path))
    )


def test_ledger_survives_drift_rebuild(spark, tmp_path):
    """A fold completed BEFORE a drift rebuild must still no-op after
    it: the rebuild retrained from stored vectors that already include
    the delta."""
    from home_credit_data_engineering_spark.jobs import ann_index as job

    base = _vectors(spark, n=40)
    delta = _vectors(spark, n=20, id_base=1000)
    w1, w2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    base.write.parquet(w1)
    delta.write.parquet(w2)
    state = str(tmp_path / "state")
    assert job.main(
        ["--input", w1, "--state-dir", state, "--n-centroids", "2"]
    ) == 0
    assert job.main(
        ["--input", w2, "--state-dir", state, "--n-centroids", "2"]
    ) == 0
    fp = delta_fingerprint(delta, ["vec_id", "embedding"])
    assert read_fold_marker(state, fp) is not None

    # force a rebuild (threshold 0 ⇒ any fold trips); distinct delta
    delta2 = _vectors(spark, n=30, seed=9, id_base=5000)
    w3 = str(tmp_path / "w3")
    delta2.write.parquet(w3)
    assert job.main(
        [
            "--input", w3, "--state-dir", state, "--n-centroids", "2",
            "--imbalance-threshold", "1.0", "--rebuild-on-drift",
        ]
    ) == 0
    assert spark.read.parquet(state).count() == 90
    # the original delta's marker survived the root swap …
    assert read_fold_marker(state, fp) is not None
    # … so replaying it post-rebuild is still a no-op
    assert job.main(
        ["--input", w2, "--state-dir", state, "--n-centroids", "2"]
    ) == 0
    assert spark.read.parquet(state).count() == 90


# ---------------------------------------------------------------------------
# BM25 folds
# ---------------------------------------------------------------------------


def test_bm25_cli_same_delta_twice_is_noop(spark, tmp_path):
    from home_credit_data_engineering_spark.jobs import bm25_index as job

    base, delta = _docs(spark, n=30), _docs(spark, n=15, seed=3, id_base=1000)
    w1, w2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    base.write.parquet(w1)
    delta.write.parquet(w2)
    idx = str(tmp_path / "idx")
    assert job.main(
        ["--input", w1, "--index", idx, "--n-buckets", "4"]
    ) == 0
    assert job.main(["--input", w2, "--index", idx, "--increment"]) == 0
    once = _tree_digest(idx)

    assert job.main(["--input", w2, "--index", idx, "--increment"]) == 0
    assert _tree_digest(idx) == once

    # index state is the single-fold state: n_docs, doclens, scores
    stats = spark.read.parquet(f"{idx}/stats").first()
    assert int(stats["n_docs"]) == 45
    assert spark.read.parquet(f"{idx}/doclens").count() == 45

    # a distinct delta still folds, and the result equals a one-shot
    # build over the union (the increment's exactness contract)
    delta2 = _docs(spark, n=10, seed=5, id_base=2000)
    w3 = str(tmp_path / "w3")
    delta2.write.parquet(w3)
    assert job.main(["--input", w3, "--index", idx, "--increment"]) == 0
    full = str(tmp_path / "full")
    build_bm25_index(
        base.unionByName(delta).unionByName(delta2), full, n_buckets=4
    )
    qt = spark.createDataFrame(
        [(0, "alpha"), (0, "zeta")], "query_id bigint, term string"
    )
    got = bm25_query_index(spark, idx, qt, k=5, n_buckets=4).collect()
    want = bm25_query_index(spark, full, qt, k=5, n_buckets=4).collect()
    assert [
        (r["doc_id"], r["score"]) for r in got
    ] == [(r["doc_id"], r["score"]) for r in want]


def test_bm25_fold_crash_between_swaps_is_finished(spark, tmp_path, monkeypatch):
    """Kill the fold between the df swap and the stats swap — the
    historically-unfixable window (two read-modify-write legs): the
    ledger commit marker lets the next run FINISH both swaps instead of
    double-merging the delta."""
    import home_credit_data_engineering_spark.sources.maintenance as mnt

    base, delta = _docs(spark, n=30), _docs(spark, n=15, seed=3, id_base=1000)
    idx = str(tmp_path / "idx")
    build_bm25_index(base, idx, n_buckets=4)

    real_swap = mnt.swap_in_state
    calls = {"n": 0}

    def crash_on_second(state_path):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash between df and stats swaps")
        return real_swap(state_path)

    monkeypatch.setattr(mnt, "swap_in_state", crash_on_second)
    with pytest.raises(RuntimeError, match="injected crash"):
        bm25_index_increment(delta, idx)
    monkeypatch.setattr(mnt, "swap_in_state", real_swap)

    again = bm25_index_increment(delta, idx)
    assert again["replayed"] is True
    stats = spark.read.parquet(f"{idx}/stats").first()
    assert int(stats["n_docs"]) == 45  # folded exactly once
    # df merged exactly once: no term's df exceeds the doc count
    max_df = spark.read.parquet(f"{idx}/df").agg(F.max("df")).first()[0]
    assert max_df <= 45


# ---------------------------------------------------------------------------
# layout guard
# ---------------------------------------------------------------------------


def test_batch_increment_into_streamed_tree_raises(spark, tmp_path):
    """The marker makes maintainer mixing raise instead of corrupting
    partition discovery."""
    path = str(tmp_path / "idx")
    os.makedirs(path)
    write_state_layout(path, "streamed", "ivf")
    delta = _vectors(spark, n=5)
    with pytest.raises(ValueError, match="streamed-maintained"):
        ivf_index_increment(delta, path)
    with pytest.raises(ValueError, match="streamed-maintained"):
        ivfpq_index_increment(delta, path)


def test_batch_increment_into_legacy_streamed_tree_raises(spark, tmp_path):
    """A pre-marker streamed tree is detected by its batch-keyed stats
    deltas and refused too."""
    path = str(tmp_path / "idx")
    os.makedirs(os.path.join(path, "_cell_stats_deltas", "batch=0"))
    with pytest.raises(ValueError, match="streamed-maintained"):
        ivf_index_increment(_vectors(spark, n=5), path)


def test_streamed_ingest_into_batch_tree_raises(spark, tmp_path):
    from home_credit_data_engineering_spark.streaming.ann import (
        _check_streamed_layout,
    )

    path = str(tmp_path / "idx")
    build_ivf_index(_vectors(spark, n=20), path, n_centroids=2, seed=1)
    with pytest.raises(ValueError, match="batch-maintained"):
        _check_streamed_layout(path, "ivf")


def test_streamed_bm25_into_batch_tree_raises(spark, tmp_path):
    from home_credit_data_engineering_spark.streaming.bm25 import (
        _check_streamed_layout,
    )

    idx = str(tmp_path / "idx")
    build_bm25_index(_docs(spark, n=10), idx, n_buckets=4)
    with pytest.raises(ValueError, match="batch-maintained"):
        _check_streamed_layout(idx)


def test_bm25_batch_increment_into_streamed_tree_raises(spark, tmp_path):
    idx = str(tmp_path / "idx")
    os.makedirs(idx)
    write_state_layout(idx, "streamed", "bm25")
    with pytest.raises(ValueError, match="streamed-maintained"):
        bm25_index_increment(_docs(spark, n=5), idx)


def test_kind_mismatch_raises(tmp_path):
    path = str(tmp_path / "idx")
    write_state_layout(path, "batch", "ivf")
    with pytest.raises(ValueError, match="holds a ivf index"):
        check_state_layout(path, "batch", "bm25")


def test_legacy_batch_tree_adopted_with_marker(spark, tmp_path):
    """A pre-r12 batch tree (no marker) is adopted: the increment
    writes the marker and proceeds."""
    path = str(tmp_path / "idx")
    build_ivf_index(_vectors(spark, n=20), path, n_centroids=2, seed=1)
    os.remove(os.path.join(path, "_layout.json"))
    rep = ivf_index_increment(_vectors(spark, n=10, id_base=1000), path)
    assert rep["appended"] == 10
    assert os.path.isfile(os.path.join(path, "_layout.json"))


# ---------------------------------------------------------------------------
# ledger helpers (unit)
# ---------------------------------------------------------------------------


def test_recover_fold_commits_finishes_and_cleans(tmp_path):
    root = str(tmp_path / "state")
    leg = os.path.join(root, "stats")
    os.makedirs(leg)
    with open(os.path.join(leg, "old.txt"), "w") as fh:
        fh.write("old")
    staged = staged_state_path(leg)
    os.makedirs(staged)
    with open(os.path.join(staged, "new.txt"), "w") as fh:
        fh.write("new")
    open(os.path.join(staged, "_SUCCESS"), "w").close()
    begin_fold_commit(root, "fp1", {"report": {"x": 1}})
    finished = recover_fold_commits(root, [leg])
    assert finished == ["fp1"]
    assert os.path.exists(os.path.join(leg, "new.txt"))
    assert not os.path.isdir(staged)
    assert read_fold_marker(root, "fp1") == {"report": {"x": 1}}
    # idempotent: nothing left to finish
    assert recover_fold_commits(root, [leg]) == []


def test_increment_recovers_mid_root_swap_before_layout_check(spark, tmp_path):
    """A tree that died mid ROOT swap (drift rebuild: live dir deleted,
    completed __next remains) must be FINISHED by the increment before
    the layout check writes its marker — writing first would recreate a
    live root and make recovery DISCARD the completed rebuild."""
    base, delta = _vectors(spark, n=40), _vectors(spark, n=20, id_base=1000)
    path = str(tmp_path / "idx")
    build_ivf_index(base, path, n_centroids=2, seed=1)
    # simulate the crash window: the staged sibling is the full rebuilt
    # tree (root _SUCCESS marker like the CLI writes), live dir gone
    open(os.path.join(path, "_SUCCESS"), "a").close()
    os.rename(path, staged_state_path(path))

    rep = ivf_index_increment(delta, path)
    assert rep["appended"] == 20
    assert spark.read.parquet(path).count() == 60  # rebuild NOT lost
    import json

    with open(os.path.join(path, "_layout.json")) as fh:
        assert json.load(fh)["maintainer"] == "batch"


@pytest.mark.parametrize(
    "crash_at",
    [
        "publish_delta_files",       # before the data files go live
        "_merge_stage_and_report",   # after publish, before staging stats
        "begin_fold_commit",         # staged but not promised
        "swap_in_state",             # promised but not swapped
        "finish_fold_commit",        # swapped but marker not finalized
    ],
)
def test_ivf_fold_crash_matrix_converges(spark, tmp_path, monkeypatch, crash_at):
    """Systematic crash injection at EVERY fold step: whatever the crash
    point, a plain re-run must converge to exactly the single-clean-fold
    state (row count, per-cell stats, and a completed ledger marker) —
    the ledger's whole contract in one table."""
    import home_credit_data_engineering_spark.operators.ann_state as ann_state

    base, delta = _vectors(spark, n=40), _vectors(spark, n=20, id_base=1000)
    path = str(tmp_path / "idx")
    build_ivf_index(base, path, n_centroids=2, seed=1)

    real = getattr(ann_state, crash_at)

    def exploding(*a, **kw):
        raise RuntimeError(f"injected crash at {crash_at}")

    monkeypatch.setattr(ann_state, crash_at, exploding)
    with pytest.raises(RuntimeError, match="injected crash"):
        ivf_index_increment(delta, path)
    monkeypatch.setattr(ann_state, crash_at, real)

    rep = ivf_index_increment(delta, path)
    # crashes at-or-after the commit marker are finished by recovery and
    # replayed as no-ops; earlier crashes re-run the fold cleanly
    assert rep["appended"] == 20
    assert spark.read.parquet(path).count() == 60
    stats_n = sum(r["n"] for r in read_cell_stats(spark, path).collect())
    assert stats_n == 60
    fp = delta_fingerprint(delta, ["vec_id", "embedding"])
    assert read_fold_marker(path, fp) is not None
    assert not any(
        f.endswith(".committing") for f in os.listdir(ledger_dir(path))
    )
    # and a THIRD run is a pure no-op
    again = ivf_index_increment(delta, path)
    assert again["replayed"] is True
    assert spark.read.parquet(path).count() == 60


@pytest.mark.parametrize(
    "crash_at,nth",
    [
        ("publish_delta_files", 1),   # postings publish
        ("publish_delta_files", 2),   # doclens publish
        ("begin_fold_commit", 1),     # all legs staged, not promised
        ("swap_in_state", 1),         # df swap (promised)
        ("swap_in_state", 2),         # stats swap (df already live)
        ("finish_fold_commit", 1),    # both swapped, marker pending
    ],
)
def test_bm25_fold_crash_matrix_converges(
    spark, tmp_path, monkeypatch, crash_at, nth
):
    """Same crash matrix for the BM25 fold, whose commit spans TWO
    read-modify-write legs (df + stats) — the historically-unfixable
    window without the marker protocol."""
    import home_credit_data_engineering_spark.sources.maintenance as mnt

    base, delta = _docs(spark, n=30), _docs(spark, n=15, seed=3, id_base=1000)
    idx = str(tmp_path / "idx")
    build_bm25_index(base, idx, n_buckets=4)

    real = getattr(mnt, crash_at)
    calls = {"n": 0}

    def exploding(*a, **kw):
        calls["n"] += 1
        if calls["n"] == nth:
            raise RuntimeError(f"injected crash at {crash_at}#{nth}")
        return real(*a, **kw)

    monkeypatch.setattr(mnt, crash_at, exploding)
    with pytest.raises(RuntimeError, match="injected crash"):
        bm25_index_increment(delta, idx)
    monkeypatch.setattr(mnt, crash_at, real)

    rep = bm25_index_increment(delta, idx)
    assert rep["n_docs"] == 45
    stats = spark.read.parquet(f"{idx}/stats").first()
    assert int(stats["n_docs"]) == 45
    assert spark.read.parquet(f"{idx}/doclens").count() == 45
    max_df = spark.read.parquet(f"{idx}/df").agg(F.max("df")).first()[0]
    assert max_df <= 45  # df merged exactly once
    fp = delta_fingerprint(delta, ["doc_id", "text"])
    assert read_fold_marker(idx, fp) is not None
    again = bm25_index_increment(delta, idx)
    assert again["replayed"] is True


def test_streamed_op_on_batch_tree_mid_commit_raises_without_damage(
    spark, tmp_path, monkeypatch
):
    """A batch BM25 tree crashed between begin_fold_commit and the
    swaps; running the STREAMED compactor/ingest on it (the operator
    mistake the layout guard exists for) must raise on the explicit
    marker BEFORE any recovery — its generic swap recovery would
    otherwise discard the promised __next legs, and the fold's own
    recovery would then finalize the marker with nothing left to swap
    (postings/doclens applied, df/stats silently never)."""
    import home_credit_data_engineering_spark.sources.maintenance as mnt
    from home_credit_data_engineering_spark.streaming.bm25 import (
        compact_streamed_bm25_index,
    )

    base, delta = _docs(spark, n=30), _docs(spark, n=15, seed=3, id_base=1000)
    idx = str(tmp_path / "idx")
    build_bm25_index(base, idx, n_buckets=4)

    real_swap = mnt.swap_in_state

    def exploding(state_path):
        raise RuntimeError("injected crash before any swap")

    monkeypatch.setattr(mnt, "swap_in_state", exploding)
    with pytest.raises(RuntimeError, match="injected crash"):
        bm25_index_increment(delta, idx)
    monkeypatch.setattr(mnt, "swap_in_state", real_swap)
    assert os.path.isdir(staged_state_path(os.path.join(idx, "df")))

    # wrong-maintainer op raises on the marker and touches nothing
    with pytest.raises(ValueError, match="batch-maintained"):
        compact_streamed_bm25_index(spark, idx)
    assert os.path.isdir(staged_state_path(os.path.join(idx, "df")))
    assert os.path.isdir(staged_state_path(os.path.join(idx, "stats")))

    # the batch fold still converges to the single-fold state
    rep = bm25_index_increment(delta, idx)
    assert rep["replayed"] is True
    assert int(spark.read.parquet(f"{idx}/stats").first()["n_docs"]) == 45
