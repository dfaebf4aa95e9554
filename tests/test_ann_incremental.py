"""O(Δ) incremental ANN index maintenance (operators/ann_state.py).

Certifies the three contract legs:

1. **Exactness under frozen centroids** — increment-then-query equals
   build-over-union given the same centroids (the assignment UDF is
   shared, the append lands in the same cell partitions).
2. **Recall vs a full rebuild** — the planted-cluster harness (same
   style as test_quantization) bounds the only approximation an
   increment introduces: the coarse quantizer is a snapshot.
3. **O(Δ) cost** — the increment never reads the stored corpus
   partitions, proven by garbling every stored part file first.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.ann_state import (
    drift_report,
    ivf_index_increment,
    ivfpq_index_increment,
    read_cell_stats,
)
from home_credit_data_engineering_spark.operators.quantization import (
    build_ivfpq_index,
    ivfpq_query_index,
)
from home_credit_data_engineering_spark.operators.similarity import (
    brute_force_topk,
    build_ivf_index,
    ivf_query_index,
)

DIM = 16


def _clustered(spark, n_per=30, centers=(5.0, -5.0), seed=0, id_base=0):
    rng = np.random.RandomState(seed)
    rows = []
    for cid, center in enumerate(centers):
        base = np.full(DIM, center)
        base[cid % DIM] += 2.0  # break symmetry between clusters
        for i in range(n_per):
            rows.append(
                (
                    id_base + cid * 1000 + i,
                    (base + rng.normal(0, 0.1, DIM)).tolist(),
                )
            )
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _split(df, frac_expr="vec_id % 1000 < 20"):
    return df.filter(frac_expr), df.filter(f"NOT ({frac_expr})")


def _assign_direct(vectors: dict, centers: np.ndarray) -> dict:
    c_norm = np.linalg.norm(centers, axis=1)
    c_unit = centers / np.maximum(c_norm, 1e-300)[:, None]
    out = {}
    for vid, v in vectors.items():
        x = np.array(v, dtype=np.float64)
        x = x / max(np.linalg.norm(x), 1e-300)
        out[vid] = int(np.argsort(-(x @ c_unit.T), kind="stable")[0])
    return out


def test_ivf_increment_assignments_exact(spark, tmp_path):
    df = _clustered(spark)
    wave1, wave2 = _split(df)
    path = str(tmp_path / "idx")
    centers = build_ivf_index(wave1, path, n_centroids=2, seed=1)

    rep = ivf_index_increment(wave2, path)
    assert rep["appended"] == wave2.count()

    stored = {
        r["vec_id"]: int(r["cell"])
        for r in spark.read.parquet(path).select("vec_id", "cell").collect()
    }
    want = _assign_direct(
        {r["vec_id"]: r["embedding"] for r in df.collect()}, centers
    )
    assert stored == want  # increment == build assignment, bit for bit

    # stats folded: per-cell counts equal the stored partition counts
    stats = {
        r["cell"]: r["n"] for r in read_cell_stats(spark, path).collect()
    }
    from collections import Counter

    assert stats == dict(Counter(stored.values()))


def test_ivf_increment_recall_matches_full_rebuild(spark, tmp_path):
    df = _clustered(spark, n_per=40)
    wave1, wave2 = _split(df)
    inc_path = str(tmp_path / "inc")
    build_ivf_index(wave1, inc_path, n_centroids=2, seed=1)
    ivf_index_increment(wave2, inc_path)

    full_path = str(tmp_path / "full")
    build_ivf_index(df, full_path, n_centroids=2, seed=1)

    queries = df.filter(F.col("vec_id").isin(0, 1000))
    k = 5
    exact = brute_force_topk(df, queries, k=k).select(
        "query_id", F.col("neighbor_id").alias("__nid")
    )

    def recall(path: str) -> float:
        got = ivf_query_index(spark, path, queries, k=k, n_probe=1)
        hits = got.select(
            "query_id", F.col("neighbor_id").alias("__nid")
        ).join(exact, ["query_id", "__nid"])
        return hits.count() / (2 * k)

    r_inc, r_full = recall(inc_path), recall(full_path)
    # planted clusters: both must stay in-cluster; the frozen coarse
    # quantizer may cost a little, never the cluster structure
    assert r_full >= 0.8
    assert r_inc >= r_full - 0.2
    assert r_inc >= 0.8


def test_ivf_increment_never_reads_stored_partitions(spark, tmp_path):
    """O(Δ) by construction: garble every stored data file; the
    increment must still succeed (it reads only the centroid sidecar
    and the cells-sized stats table)."""
    df = _clustered(spark)
    wave1, wave2 = _split(df)
    path = str(tmp_path / "idx")
    build_ivf_index(wave1, path, n_centroids=2, seed=1)
    for part in glob.glob(f"{path}/cell=*/*.parquet"):
        with open(part, "wb") as fh:
            fh.write(b"not parquet")
        crc = os.path.join(
            os.path.dirname(part), "." + os.path.basename(part) + ".crc"
        )
        if os.path.exists(crc):
            os.remove(crc)
    rep = ivf_index_increment(wave2, path)
    assert rep["appended"] == wave2.count()


def test_ivf_increment_drift_triggers(spark, tmp_path):
    df = _clustered(spark)
    wave1, benign = _split(df)
    path = str(tmp_path / "idx")
    build_ivf_index(wave1, path, n_centroids=2, seed=1)

    rep = ivf_index_increment(benign, path)
    assert not rep["rebuild_recommended"]
    assert rep["max_mean_shift"] < 0.01

    # a differently-oriented planted cluster lands in SOME existing cell
    # and drags its running mean off the centroid -> mean_shift trigger
    drifted = _clustered(
        spark, n_per=120, centers=(0.0,), seed=9, id_base=500_000
    )
    rep2 = ivf_index_increment(drifted, path, mean_shift_threshold=0.05)
    assert rep2["rebuild_recommended"]
    assert rep2["trigger"] == "mean_shift"


def test_drift_report_imbalance_trigger():
    centers = np.eye(2, DIM) * 5
    rows = [
        {"cell": 0, "n": 90, "vsum": (np.eye(2, DIM)[0] * 90).tolist()},
        {"cell": 1, "n": 10, "vsum": (np.eye(2, DIM)[1] * 10).tolist()},
    ]
    rep = drift_report(rows, centers, imbalance_threshold=1.5)
    assert rep["trigger"] == "size_imbalance"
    assert rep["max_mean_shift"] < 1e-9
    # same skew under a permissive threshold: no trigger
    assert not drift_report(rows, centers, imbalance_threshold=2.0)[
        "rebuild_recommended"
    ]


def test_ivfpq_increment_codes_and_recall(spark, tmp_path):
    df = _clustered(spark, n_per=40)
    wave1, wave2 = _split(df)
    inc_path = str(tmp_path / "inc")
    build_ivfpq_index(
        wave1, inc_path, n_centroids=2, m=8, nbits=4, seed=1
    )
    rep = ivfpq_index_increment(wave2, inc_path)
    assert rep["appended"] == wave2.count()
    assert not rep["rebuild_recommended"]

    # codes for the incremented ids are byte-identical to encoding the
    # union under the same sidecars: rebuild codes for wave2 by reading
    # them back through the query path's exact re-rank contract instead
    # -- simpler: the index must serve wave2 ids as neighbors
    queries = df.filter(F.col("vec_id").isin(0, 1000))
    k = 5
    got = ivfpq_query_index(
        spark, inc_path, queries, k=k, n_probe=2, rerank=20
    )
    exact = brute_force_topk(df, queries, k=k).select(
        "query_id", F.col("neighbor_id").alias("__nid")
    )
    hits = got.select("query_id", F.col("neighbor_id").alias("__nid")).join(
        exact, ["query_id", "__nid"]
    )
    assert hits.count() / (2 * k) >= 0.8
    # wave2 members are findable (the append is live, not dead weight)
    wave2_ids = {r["vec_id"] for r in wave2.collect()}
    assert any(
        r["neighbor_id"] in wave2_ids for r in got.collect()
    )

    # stats cover the whole corpus
    assert (
        sum(r["n"] for r in read_cell_stats(spark, inc_path).collect())
        == df.count()
    )


def test_ivfpq_increment_residual_opq_roundtrip(spark, tmp_path):
    """The increment must honor the stored residual flag and OPQ
    rotation (codes in rotated space; stats in rotated space)."""
    df = _clustered(spark, n_per=30)
    wave1, wave2 = _split(df)
    path = str(tmp_path / "idx")
    build_ivfpq_index(
        wave1, path, n_centroids=2, m=8, nbits=4, seed=1,
        residual=True, opq=True,
    )
    rep = ivfpq_index_increment(wave2, path)
    assert rep["appended"] == wave2.count()
    queries = df.filter(F.col("vec_id").isin(0, 1000))
    got = ivfpq_query_index(spark, path, queries, k=5, n_probe=2, rerank=20)
    for r in got.collect():  # planted clusters: in-cluster neighbors
        assert (r["neighbor_id"] // 1000) == (r["query_id"] // 1000)


def test_pre_stats_index_lazily_initialized(spark, tmp_path):
    """A pre-r11 index (no _cell_stats) gets a one-time full-scan init
    BEFORE the append, so the delta is not double-counted."""
    import shutil

    df = _clustered(spark)
    wave1, wave2 = _split(df)
    path = str(tmp_path / "idx")
    build_ivf_index(wave1, path, n_centroids=2, seed=1)
    shutil.rmtree(os.path.join(path, "_cell_stats"))
    ivf_index_increment(wave2, path)
    assert (
        sum(r["n"] for r in read_cell_stats(spark, path).collect())
        == df.count()
    )


def test_ann_index_cli_state_dir(spark, tmp_path):
    from home_credit_data_engineering_spark.jobs import ann_index as job

    df = _clustered(spark, n_per=40)
    wave1, wave2 = _split(df)
    w1, w2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    wave1.write.parquet(w1)
    wave2.write.parquet(w2)
    state = str(tmp_path / "state")

    # bootstrap: full build
    assert job.main(
        ["--input", w1, "--state-dir", state, "--n-centroids", "2"]
    ) == 0
    assert os.path.exists(os.path.join(state, "_centroids.npy"))

    # increment
    assert job.main(
        ["--input", w2, "--state-dir", state, "--n-centroids", "2"]
    ) == 0
    assert spark.read.parquet(state).count() == df.count()

    # drifted batch + --rebuild-on-drift: retrain-and-swap; the new
    # centroids must differ from the frozen ones
    before = np.load(os.path.join(state, "_centroids.npy"))
    # centers=(0.0,) gives a cluster pointing along e0 — a DIRECTION
    # change vs the diagonal build clusters (cosine drift, not magnitude)
    drifted = _clustered(
        spark, n_per=150, centers=(0.0,), seed=3, id_base=900_000
    )
    w3 = str(tmp_path / "w3")
    drifted.write.parquet(w3)
    assert job.main(
        [
            "--input", w3, "--state-dir", state, "--n-centroids", "2",
            "--mean-shift-threshold", "0.01", "--rebuild-on-drift",
        ]
    ) == 0
    after = np.load(os.path.join(state, "_centroids.npy"))
    assert not np.allclose(before, after)
    # the rebuilt index serves everything that was ever ingested
    assert (
        spark.read.parquet(state).count()
        == df.count() + drifted.count()
    )
    got = ivf_query_index(
        spark,
        state,
        df.filter(F.col("vec_id") == 0),
        k=3,
        n_probe=2,
    )
    assert got.count() == 3


def test_ann_index_cli_state_dir_pq(spark, tmp_path):
    """--state-dir with a PQ index: bootstrap detects --pq, the
    increment auto-detects the codes/ layout, and the incremented index
    serves queries over the union."""
    from home_credit_data_engineering_spark.jobs import ann_index as job

    df = _clustered(spark, n_per=30)
    wave1, wave2 = _split(df)
    w1, w2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    wave1.write.parquet(w1)
    wave2.write.parquet(w2)
    state = str(tmp_path / "state")

    assert job.main(
        ["--input", w1, "--state-dir", state, "--n-centroids", "2",
         "--pq", "--pq-m", "8", "--pq-nbits", "4"]
    ) == 0
    assert os.path.isdir(os.path.join(state, "codes"))
    assert job.main(["--input", w2, "--state-dir", state]) == 0
    assert (
        spark.read.parquet(os.path.join(state, "codes")).count()
        == df.count()
    )
    got = ivfpq_query_index(
        spark, state, df.filter(F.col("vec_id") == 0), k=3, n_probe=2,
        rerank=10,
    )
    assert got.count() == 3


def test_ann_index_cli_query_and_drift_modes(spark, tmp_path, capsys):
    from home_credit_data_engineering_spark.jobs import ann_index as job

    df = _clustered(spark, n_per=30)
    src = str(tmp_path / "src")
    df.write.parquet(src)
    state = str(tmp_path / "state")
    assert job.main(
        ["--input", src, "--state-dir", state, "--n-centroids", "2"]
    ) == 0

    assert job.main(
        ["--input", src, "--state-dir", state, "--report-drift"]
    ) == 0
    out = capsys.readouterr().out
    assert "ann_index[drift]:" in out and "rebuild_recommended=False" in out

    assert job.main(
        ["--input", src, "--state-dir", state,
         "--query-ids", "0", "1000", "--k", "3", "--n-probe", "1"]
    ) == 0
    lines = [
        ln for ln in capsys.readouterr().out.splitlines() if "\t" in ln
    ]
    assert len(lines) == 6  # 2 queries x top-3
    for ln in lines:
        qid, rank, nid, _score = ln.split("\t")
        assert int(nid) // 1000 == int(qid) // 1000  # in-cluster


def test_ann_index_cli_report_drift_on_streaming_layout(
    spark, tmp_path, capsys
):
    """--report-drift on an index maintained by streaming/ann.py (stats
    live in batch-keyed _cell_stats_deltas, not _cell_stats)."""
    from home_credit_data_engineering_spark.jobs import ann_index as job
    from home_credit_data_engineering_spark.streaming.ann import (
        foreach_batch_ann_ingest,
    )

    df = _clustered(spark, n_per=30)
    src = str(tmp_path / "src")
    df.write.parquet(src)
    idx = str(tmp_path / "idx")
    stream = (
        spark.readStream.format("parquet")
        .schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    foreach_batch_ann_ingest(
        stream, idx, str(tmp_path / "ckpt"), n_centroids=2, seed=1
    )
    assert not os.path.isdir(os.path.join(idx, "_cell_stats"))

    assert job.main(
        ["--input", src, "--state-dir", idx, "--report-drift"]
    ) == 0
    out = capsys.readouterr().out
    assert "ann_index[drift]:" in out
    assert f"n_vectors={df.count()}" in out


def test_tune_probes_frontier(spark, tmp_path, capsys):
    """tune_probes: recall non-decreasing in n_probe, 1.0 at full
    probes, scan_fraction tracks actual probed-cell row mass."""
    from home_credit_data_engineering_spark.jobs import ann_index as job
    from home_credit_data_engineering_spark.operators.ann_state import (
        tune_probes,
    )
    from home_credit_data_engineering_spark.operators.similarity import (
        build_ivf_index,
    )

    df = _clustered(spark, n_per=30)
    src = str(tmp_path / "src")
    df.write.parquet(src)
    idx = str(tmp_path / "idx")
    build_ivf_index(df, idx, n_centroids=2)

    queries = df.filter(F.col("vec_id").isin(0, 1, 1000))
    frontier = tune_probes(
        spark, idx, queries, k=3, probes=(1, 2, 8)
    ).collect()
    assert [r["n_probe"] for r in frontier] == [1, 2]  # capped at n_cells
    recalls = [r["recall_at_k"] for r in frontier]
    scans = [r["scan_fraction"] for r in frontier]
    assert recalls == sorted(recalls)
    assert recalls[-1] == 1.0  # full probes == brute force on clean data
    assert scans == sorted(scans)
    assert abs(scans[-1] - 1.0) < 1e-9  # all cells probed == full corpus
    assert 0.0 < scans[0] < 1.0

    # CLI wrapper prints the frontier
    assert job.main(
        ["--input", src, "--state-dir", idx,
         "--tune-probes", "1", "2", "--k", "3", "--tune-sample", "10"]
    ) == 0
    out = capsys.readouterr().out
    assert out.count("ann_index[tune]:") == 2 and "recall@3=" in out

    # PQ layout auto-detected: frontier measured through the ADC +
    # exact-re-rank path, so it reflects quantization loss too
    pq_idx = str(tmp_path / "pq_idx")
    build_ivfpq_index(df, pq_idx, n_centroids=2, m=8, nbits=4, seed=1)
    pq = tune_probes(spark, pq_idx, queries, k=3, probes=(1, 2)).collect()
    pq_recalls = [r["recall_at_k"] for r in pq]
    assert pq_recalls == sorted(pq_recalls)
    assert pq_recalls[-1] >= 0.8
