"""Lake-wide maintenance sweep (``sources/sweep.py`` +
``jobs/maintenance.py sweep``): one entry point that discovers every
state family, finishes pending crash recovery, compacts streamed stats
deltas, and reports drift/file counts.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.retrieval import (
    build_bm25_index,
)
from home_credit_data_engineering_spark.operators.similarity import (
    build_ivf_index,
)
from home_credit_data_engineering_spark.sources.sweep import sweep_lake

DIM = 8


def _vectors(spark, n=40, seed=0, id_base=0):
    rng = np.random.RandomState(seed)
    return spark.createDataFrame(
        [
            (id_base + i, (rng.normal(0, 1, DIM) + (i % 2) * 4.0).tolist())
            for i in range(n)
        ],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    """A fixture lake holding the original four state families plus decoys
    (the jaccard/containment prefix-state families have their own
    dedicated sweep tests)."""
    root = tmp_path_factory.mktemp("lake")

    # 1. batch-maintained ANN index
    build_ivf_index(
        _vectors(spark), str(root / "indexes" / "ann_batch"),
        n_centroids=2, seed=1,
    )

    # 2. streaming-maintained ANN index (3 micro-batches)
    from home_credit_data_engineering_spark.streaming.ann import (
        foreach_batch_ann_ingest,
    )

    df = _vectors(spark, n=60, id_base=10_000)
    flat = str(root / "_stage_flat")  # underscore: invisible to the walk
    os.makedirs(flat)
    for i in range(3):
        d = str(root / f"_stage_w{i}")
        df.filter(F.col("vec_id") % 3 == i).coalesce(1).write.parquet(d)
        shutil.copy(
            glob.glob(d + "/part-*.parquet")[0], f"{flat}/{i:02d}.parquet"
        )
    stream = (
        spark.readStream.format("parquet")
        .schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .load(flat)
    )
    foreach_batch_ann_ingest(
        stream,
        str(root / "indexes" / "ann_streamed"),
        str(root / "checkpoints" / "ann"),
        n_centroids=2,
        seed=1,
    )

    # 3. batch BM25 index
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma token{i % 3}") for i in range(12)],
        "doc_id long, text string",
    )
    build_bm25_index(docs, str(root / "indexes" / "bm25"), n_buckets=4)

    # 4. entity-resolution state (snapshot layout) + a crashed swap:
    #    a completed aux__next whose live dir is gone mid-swap
    ents = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 200)], "record_id long, entity_id long"
    )
    for b in (0, 1):
        ents.write.parquet(str(root / "er" / "entities" / f"batch={b}"))
    staged = root / "er" / "aux__next"
    os.makedirs(staged)
    open(staged / "_SUCCESS", "w").close()
    with open(staged / "data.txt", "w") as fh:
        fh.write("recovered")

    # 5. corpus pipeline state
    fp = spark.createDataFrame([("abc", 1)], "fp string, keep_id bigint")
    fp.write.parquet(str(root / "corpus_state" / "fingerprints" / "b0_9"))
    card = spark.createDataFrame([(10,)], "rows_in bigint")
    card.write.parquet(str(root / "corpus_state" / "card_state" / "b0_9"))

    # decoy: plain data table that is NO state tree
    ents.write.parquet(str(root / "tables" / "plain"))
    return str(root)


def test_sweep_discovers_all_families(spark, lake):
    reports = sweep_lake(spark, lake, compact_deltas_window=2)
    by_family = {}
    for r in reports:
        by_family.setdefault(r["family"], []).append(r)
    assert len(by_family["ann"]) == 2
    assert len(by_family["bm25"]) == 1
    assert len(by_family["entity"]) == 1
    assert len(by_family["corpus"]) == 1
    # the plain table and the streaming checkpoint are NOT states
    assert all("tables" not in r["path"] for r in reports)
    assert all("checkpoints" not in r["path"] for r in reports)

    anns = {r["maintainer"]: r for r in by_family["ann"]}
    assert anns["batch"]["n_vectors"] == 40
    assert anns["streamed"]["n_vectors"] == 60
    # 3 delta batches > window 2 → folded down to the replay-window pair
    assert anns["streamed"]["deltas_compacted"]["before"] == 3
    assert anns["streamed"]["deltas_compacted"]["after"] == 2

    bm = by_family["bm25"][0]
    assert bm["n_docs"] == 12 and bm["maintainer"] == "batch"

    er = by_family["entity"][0]
    assert er["snapshots"] == 2 and er["latest_batch"] == 1
    # the crashed aux swap was FINISHED (live was gone, stage complete)
    # by the walk-level orphan recovery, which reports it separately
    orphans = by_family.get("orphan-swap", [])
    assert [o["action"] for o in orphans] == ["finished"]
    assert orphans[0]["path"].endswith(os.path.join("er", "aux"))
    assert os.path.exists(os.path.join(lake, "er", "aux", "data.txt"))

    corp = by_family["corpus"][0]
    assert set(corp["legs"]) == {"fingerprints", "card_state"}
    assert corp["legs"]["fingerprints"]["batches"] == 1


def test_sweep_is_idempotent_and_stats_stay_exact(spark, lake):
    from home_credit_data_engineering_spark.streaming.ann import (
        read_streaming_cell_stats,
    )

    first = sweep_lake(spark, lake, compact_deltas_window=2)
    second = sweep_lake(spark, lake, compact_deltas_window=2)
    assert sum(r["recovered"] for r in second) == 0
    assert all("deltas_compacted" not in r for r in second)
    # drift stats survive the delta fold exactly
    streamed = [
        r for r in first if r["family"] == "ann" and r["maintainer"] == "streamed"
    ][0]
    stats_n = sum(
        r["n"]
        for r in read_streaming_cell_stats(
            spark, streamed["path"]
        ).collect()
    )
    assert stats_n == 60


def test_sweep_cli(spark, lake, capsys):
    from home_credit_data_engineering_spark.jobs import maintenance as job

    assert job.main(["sweep", "--root", lake]) == 0
    out = capsys.readouterr().out
    assert "sweep[ann-ivf/batch]" in out
    assert "sweep[ann-ivf/streamed]" in out
    assert "sweep[bm25/batch]" in out
    assert "sweep[entity]" in out
    assert "sweep[corpus]" in out
    # 5 family trees; +1 orphan-swap row when this test runs first on a
    # fresh lake (the er/aux__next crash artifact not yet recovered)
    import re

    m = re.search(r"sweep: (\d+) state trees", out)
    assert m and int(m.group(1)) in (5, 6)


def test_sweep_recovers_orphan_root_swap(spark, tmp_path):
    """A state tree that died mid ROOT swap exists only as X__next; the
    sweep must finish it and then classify the recovered tree instead
    of silently skipping exactly the crashed state it exists to fix."""
    from home_credit_data_engineering_spark.sources.maintenance import (
        staged_state_path,
    )

    root = str(tmp_path / "lake2")
    idx = os.path.join(root, "indexes", "ann")
    build_ivf_index(_vectors(spark, n=30), idx, n_centroids=2, seed=1)
    open(os.path.join(idx, "_SUCCESS"), "a").close()
    os.rename(idx, staged_state_path(idx))

    reports = sweep_lake(spark, root)
    fams = sorted(r["family"] for r in reports)
    assert fams == ["ann", "orphan-swap"]
    orphan = [r for r in reports if r["family"] == "orphan-swap"][0]
    assert orphan["action"] == "finished" and orphan["recovered"] == 1
    ann = [r for r in reports if r["family"] == "ann"][0]
    assert ann["n_vectors"] == 30
    assert os.path.isdir(idx)


def _fs_snapshot(root):
    snap = set()
    for dirpath, dirnames, filenames in os.walk(root):
        for d in dirnames:
            snap.add(("d", os.path.relpath(os.path.join(dirpath, d), root)))
        for f in filenames:
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            snap.add(
                ("f", os.path.relpath(p, root), st.st_size, st.st_mtime_ns)
            )
    return snap


def test_sweep_dry_run_mutates_nothing_and_exit_codes(spark, tmp_path, capsys):
    """--dry-run contract: byte-identical lake afterwards, exit 3 while
    the lake needs recovery, exit 0 once a live sweep cleaned it."""
    from home_credit_data_engineering_spark.jobs import maintenance as job

    root = tmp_path / "dirty_lake"
    ents = spark.createDataFrame(
        [(1, 100), (2, 100)], "record_id long, entity_id long"
    )
    ents.write.parquet(str(root / "er" / "entities" / "batch=0"))
    # crashed root swap: completed aux__next, live dir gone
    staged = root / "er" / "aux__next"
    os.makedirs(staged)
    open(staged / "_SUCCESS", "w").close()
    with open(staged / "data.txt", "w") as fh:
        fh.write("recovered")

    before = _fs_snapshot(root)
    assert job.main(["sweep", "--root", str(root), "--dry-run"]) == 3
    assert _fs_snapshot(root) == before, "--dry-run must not touch the lake"
    out = capsys.readouterr().out
    assert "dry-run" in out and "would-finish" in out
    assert "nothing touched" in out
    # exactly ONE pending action: the orphan report must not be
    # double-counted by the entity sweeper's nested walk (the live
    # sweep performs and reports exactly one recovery)
    assert "1 pending swaps/commits" in out

    # live sweep performs the recovery…
    assert job.main(["sweep", "--root", str(root)]) == 0
    assert os.path.exists(root / "er" / "aux" / "data.txt")
    capsys.readouterr()
    # …after which the check mode reports clean
    assert job.main(["sweep", "--root", str(root), "--dry-run"]) == 0
    assert "0 pending" in capsys.readouterr().out


def test_sweep_dry_run_never_mutates_module_lake(spark, lake):
    """Regardless of the module lake's current recovery/compaction state,
    dry_run=True must leave every byte in place (incl. the streamed ANN
    delta tree, which live sweeps WOULD compact past the window)."""
    before = _fs_snapshot(lake)
    reports = sweep_lake(spark, lake, compact_deltas_window=2, dry_run=True)
    assert _fs_snapshot(lake) == before
    assert all("deltas_compacted" not in r for r in reports)
