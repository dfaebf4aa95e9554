"""Streaming ANN index maintenance (streaming/ann.py): replay-idempotent
(cell, batch)-partitioned folds, bootstrap training parity with the
one-time build, and an unchanged query path."""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import types as T

from home_credit_data_engineering_spark.operators.similarity import (
    ivf_query_index,
)
from home_credit_data_engineering_spark.streaming.ann import (
    foreach_batch_ann_ingest,
    read_streaming_cell_stats,
)

DIM = 16

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def _clustered(spark, n_per=30, seed=0):
    rng = np.random.RandomState(seed)
    rows = []
    for cid, center in enumerate((5.0, -5.0)):
        base = np.full(DIM, center)
        base[cid] += 2.0
        for i in range(n_per):
            rows.append(
                (cid * 1000 + i, (base + rng.normal(0, 0.1, DIM)).tolist())
            )
    return spark.createDataFrame(rows, SCHEMA)


def _write_waves(spark, df, tmp_path, n_waves=3):
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i in range(n_waves):
        d = str(tmp_path / f"w{i}")
        df.filter(F.col("vec_id") % n_waves == i).coalesce(1).write.parquet(d)
        part = glob.glob(d + "/part-*.parquet")[0]
        shutil.copy(part, f"{flat}/{i:02d}.parquet")
    return flat


def _run(spark, flat, idx, ckpt, reports=None, compact_deltas_every=16):
    stream = (
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .load(flat)
    )
    foreach_batch_ann_ingest(
        stream,
        idx,
        ckpt,
        n_centroids=2,
        seed=1,
        reports=reports,
        compact_deltas_every=compact_deltas_every,
    )


def _assign_direct(df, centers):
    c_unit = centers / np.maximum(
        np.linalg.norm(centers, axis=1), 1e-300
    )[:, None]
    out = {}
    for r in df.collect():
        x = np.array(r["embedding"], dtype=np.float64)
        x = x / max(np.linalg.norm(x), 1e-300)
        out[r["vec_id"]] = int(np.argsort(-(x @ c_unit.T), kind="stable")[0])
    return out


def test_streaming_ann_ingest_assignments_and_query(spark, tmp_path):
    df = _clustered(spark)
    flat = _write_waves(spark, df, tmp_path)
    idx = str(tmp_path / "idx")
    reports: list = []
    _run(spark, flat, idx, str(tmp_path / "ckpt"), reports)

    assert len(reports) == 3
    assert sum(r["appended"] for r in reports) == df.count()
    assert [r["batch_id"] for r in reports] == [0, 1, 2]

    centers = np.load(os.path.join(idx, "_centroids.npy"))
    stored = {
        r["vec_id"]: int(r["cell"])
        for r in spark.read.parquet(idx).select("vec_id", "cell").collect()
    }
    assert stored == _assign_direct(df, centers)  # frozen-centroid parity

    # running stats state == stored partition counts
    stats = {
        r["cell"]: r["n"]
        for r in read_streaming_cell_stats(spark, idx).collect()
    }
    from collections import Counter

    assert stats == dict(Counter(stored.values()))

    # the unchanged query path serves the (cell, batch) tree: planted
    # clusters stay in-cluster, and the scan partition-prunes on cell
    got = ivf_query_index(
        spark, idx, df.filter(F.col("vec_id").isin(0, 1000)), k=3, n_probe=1
    )
    rows = got.collect()
    assert len(rows) == 6
    for r in rows:
        assert (r["neighbor_id"] // 1000) == (r["query_id"] // 1000)


def test_streaming_ann_ingest_replay_is_idempotent(spark, tmp_path):
    df = _clustered(spark)
    flat = _write_waves(spark, df, tmp_path)
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, flat, idx, ckpt)
    before = {
        r["vec_id"]: int(r["cell"])
        for r in spark.read.parquet(idx).select("vec_id", "cell").collect()
    }

    # crash window: last batch's partitions + stats delta written but the
    # offset never committed -> restart redelivers the batch
    commits = sorted(
        f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")
    )
    os.remove(f"{ckpt}/commits/{commits[-1]}")
    crc = f"{ckpt}/commits/.{commits[-1]}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    _run(spark, flat, idx, ckpt)

    after = {
        r["vec_id"]: int(r["cell"])
        for r in spark.read.parquet(idx).select("vec_id", "cell").collect()
    }
    assert after == before  # no duplicates, no relabels
    assert spark.read.parquet(idx).count() == df.count()
    # stats did not double-count the replayed batch
    assert (
        sum(r["n"] for r in read_streaming_cell_stats(spark, idx).collect())
        == df.count()
    )


def test_streaming_ann_delta_compaction_bounds_tree_and_stays_exact(
    spark, tmp_path
):
    """compact_deltas_every folds old deltas into one summary partition:
    the tree stops growing O(#batches) and the running stats stay exact —
    including across a replay of the last batch after a compaction."""
    df = _clustered(spark)
    flat = _write_waves(spark, df, tmp_path, n_waves=4)
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, flat, idx, ckpt, compact_deltas_every=2)

    deltas = os.path.join(idx, "_cell_stats_deltas")
    parts = [d for d in os.listdir(deltas) if d.startswith("batch=")]
    # 4 batches ingested, but old deltas folded: only the summary + the
    # most recent batch(es) survive
    assert len(parts) <= 3
    stats = {
        r["cell"]: r["n"]
        for r in read_streaming_cell_stats(spark, idx).collect()
    }
    centers = np.load(os.path.join(idx, "_centroids.npy"))
    from collections import Counter

    direct = Counter(_assign_direct(df, centers).values())
    assert stats == dict(direct)

    # replay the final batch on top of the compacted tree: the summary
    # never absorbed the in-flight batch, so the overwrite stays exact
    commits = sorted(
        f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")
    )
    os.remove(f"{ckpt}/commits/{commits[-1]}")
    crc = f"{ckpt}/commits/.{commits[-1]}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    _run(spark, flat, idx, ckpt, compact_deltas_every=2)
    stats_after = {
        r["cell"]: r["n"]
        for r in read_streaming_cell_stats(spark, idx).collect()
    }
    assert stats_after == stats
    assert spark.read.parquet(idx).count() == df.count()


def test_compact_streamed_ann_index_offline(spark, tmp_path):
    """Offline data-tree compaction: batch partitions fold per cell,
    query results and stats are unchanged, and a restarted stream keeps
    appending correctly on top of the compacted tree."""
    from home_credit_data_engineering_spark.jobs import maintenance as job
    from home_credit_data_engineering_spark.streaming.ann import (
        compact_streamed_ann_index,
    )

    df = _clustered(spark)
    flat = _write_waves(spark, df, tmp_path, n_waves=4)
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, flat, idx, ckpt)

    def snap():
        rows = ivf_query_index(
            spark, idx, df.filter(F.col("vec_id").isin(0, 1000)), k=3,
            n_probe=1,
        )
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"]) for r in rows.collect()
        )

    before = snap()
    stats_before = sorted(
        (r["cell"], r["n"])
        for r in read_streaming_cell_stats(spark, idx).collect()
    )
    rep = compact_streamed_ann_index(spark, idx)
    assert rep["batches_before"] == 4 and rep["batches_after"] == 2
    assert rep["rows"] == df.count()
    batches = {
        int(r["batch"])
        for r in spark.read.parquet(idx).select("batch").distinct().collect()
    }
    assert batches == {2, 3}  # folded target + the replayable newest
    assert snap() == before
    assert sorted(
        (r["cell"], r["n"])
        for r in read_streaming_cell_stats(spark, idx).collect()
    ) == stats_before
    # idempotent: a second pass is a no-op (already 2 partitions)
    rep2 = compact_streamed_ann_index(spark, idx)
    assert rep2["batches_before"] == rep2["batches_after"] == 2

    # restarted stream appends NEW batches on top of the compacted tree
    extra = spark.createDataFrame(
        [(5000, [float(x) for x in range(DIM)])], SCHEMA
    )
    d = str(tmp_path / "w_extra")
    extra.coalesce(1).write.parquet(d)
    part = glob.glob(d + "/part-*.parquet")[0]
    shutil.copy(part, f"{flat}/99.parquet")
    _run(spark, flat, idx, ckpt)
    assert spark.read.parquet(idx).count() == df.count() + 1

    # CLI wrapper drives the same fold
    assert job.main(["compact-streamed", "--path", idx, "--kind", "ann"]) == 0


def _run_pq(spark, flat, idx, ckpt, reports=None, **kw):
    from home_credit_data_engineering_spark.streaming.ann import (
        foreach_batch_ivfpq_ingest,
    )

    stream = (
        spark.readStream.format("parquet")
        .schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .load(flat)
    )
    foreach_batch_ivfpq_ingest(
        stream, idx, ckpt, n_centroids=2, m=8, nbits=4, seed=1,
        reports=reports, **kw,
    )


def test_streaming_ivfpq_ingest_codes_and_query(spark, tmp_path):
    """Streamed PQ index: codes equal a direct encode under the stored
    (frozen) sidecars, the unchanged query path serves it, and replays
    are idempotent."""
    from home_credit_data_engineering_spark.operators.quantization import (
        assign_encode_udf,
        ivfpq_query_index,
    )
    from home_credit_data_engineering_spark.functions.vectors import (
        to_double_array,
    )

    df = _clustered(spark)
    flat = _write_waves(spark, df, tmp_path)
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    reports: list = []
    _run_pq(spark, flat, idx, ckpt, reports)

    assert [r["batch_id"] for r in reports] == [0, 1, 2]
    assert sum(r["appended"] for r in reports) == df.count()

    centers = np.load(os.path.join(idx, "_centroids.npy"))
    books = np.load(os.path.join(idx, "_codebooks.npy"))
    c_unit = centers / np.maximum(
        np.linalg.norm(centers, axis=1), 1e-300
    )[:, None]
    encode = assign_encode_udf(c_unit, books, None, False)
    want = {
        r["vec_id"]: (int(r["__ae"]["cell"]), bytes(r["__ae"]["code"]))
        for r in df.select(
            "vec_id", encode(to_double_array("embedding")).alias("__ae")
        ).collect()
    }
    got = {
        r["vec_id"]: (int(r["cell"]), bytes(r["pq_code"]))
        for r in spark.read.parquet(f"{idx}/codes").select(
            "vec_id", "pq_code", "cell"
        ).collect()
    }
    assert got == want  # frozen-sidecar encode parity

    top = ivfpq_query_index(
        spark, idx, df.filter(F.col("vec_id").isin(0, 1000)), k=3,
        n_probe=1, rerank=10,
    )
    rows = top.collect()
    assert len(rows) == 6
    for r in rows:
        assert (r["neighbor_id"] // 1000) == (r["query_id"] // 1000)
    # vectors store holds every ingested vector exactly once
    assert spark.read.parquet(f"{idx}/vectors").count() == df.count()

    # crash-replay of the final batch: nothing double-counts
    commits = sorted(
        f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")
    )
    os.remove(f"{ckpt}/commits/{commits[-1]}")
    crc = f"{ckpt}/commits/.{commits[-1]}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    _run_pq(spark, flat, idx, ckpt)
    assert spark.read.parquet(f"{idx}/codes").count() == df.count()
    assert spark.read.parquet(f"{idx}/vectors").count() == df.count()
    assert (
        sum(r["n"] for r in read_streaming_cell_stats(spark, idx).collect())
        == df.count()
    )


def test_compact_streamed_ivfpq_index_offline(spark, tmp_path):
    """PQ-layout compaction: codes and vectors batch partitions fold,
    query results unchanged."""
    from home_credit_data_engineering_spark.operators.quantization import (
        ivfpq_query_index,
    )
    from home_credit_data_engineering_spark.streaming.ann import (
        compact_streamed_ann_index,
    )

    df = _clustered(spark)
    flat = _write_waves(spark, df, tmp_path, n_waves=4)
    idx = str(tmp_path / "idx")
    _run_pq(spark, flat, idx, str(tmp_path / "ckpt"))

    def snap():
        rows = ivfpq_query_index(
            spark, idx, df.filter(F.col("vec_id").isin(0, 1000)), k=3,
            n_probe=1, rerank=10,
        )
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"]) for r in rows.collect()
        )

    before = snap()
    rep = compact_streamed_ann_index(spark, idx)
    assert rep["batches_before"] == 4 and rep["batches_after"] == 2
    assert rep["rows"] == df.count()
    for leg in ("codes", "vectors"):
        batches = {
            int(r["batch"])
            for r in spark.read.parquet(f"{idx}/{leg}")
            .select("batch").distinct().collect()
        }
        assert batches == {2, 3}, leg
    assert snap() == before
    assert (
        sum(r["n"] for r in read_streaming_cell_stats(spark, idx).collect())
        == df.count()
    )


def test_streaming_ann_ingest_recovers_mid_swap_compaction(spark, tmp_path):
    """A compaction that died inside swap_in_state (live tree deleted,
    complete __next left behind) must be finished by the NEXT stream
    run — not retrained from scratch with the history lost."""
    df = _clustered(spark)
    flat = _write_waves(spark, df, tmp_path)
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, flat, idx, ckpt)
    centers_before = np.load(os.path.join(idx, "_centroids.npy")).tolist()

    # simulate the crash window: the whole live tree is gone, the staged
    # replacement is complete. A real staged tree carries a root
    # _SUCCESS (plain spark write); the live tree was built by dynamic
    # overwrite which leaves none, so plant it after the rename.
    os.rename(idx, idx + "__next")
    with open(os.path.join(idx + "__next", "_SUCCESS"), "w"):
        pass

    extra = spark.createDataFrame(
        [(5000, [float(x) for x in range(DIM)])], SCHEMA
    )
    d = str(tmp_path / "w_extra")
    extra.coalesce(1).write.parquet(d)
    part = glob.glob(d + "/part-*.parquet")[0]
    shutil.copy(part, f"{flat}/99.parquet")
    _run(spark, flat, idx, ckpt)

    # the pre-crash index was recovered (same quantizer, all rows), the
    # new batch appended on top
    assert np.load(os.path.join(idx, "_centroids.npy")).tolist() == (
        centers_before
    )
    assert spark.read.parquet(idx).count() == df.count() + 1
    assert (
        sum(r["n"] for r in read_streaming_cell_stats(spark, idx).collect())
        == df.count() + 1
    )


def test_streaming_ann_rebuild_on_drift(spark, tmp_path):
    """rebuild_on_drift: a drifted wave trips the verdict mid-stream,
    the quantizer retrains from ALL stored vectors inside apply_batch,
    and the rebuilt tree stays exact — including across a crash-replay
    of the rebuilt batch."""
    from home_credit_data_engineering_spark.streaming.ann import (
        foreach_batch_ann_ingest,
    )

    rng = np.random.RandomState(3)
    # waves 0-1: the two planted clusters; wave 2: a differently-
    # oriented cluster that lands in an existing cell and drags its
    # running mean off the frozen centroid
    base = _clustered(spark, n_per=30)
    drift_rows = [
        (700_000 + i, (np.full(DIM, 0.0) + np.eye(1, DIM, 4)[0] * 5
                       + rng.normal(0, 0.1, DIM)).tolist())
        for i in range(90)
    ]
    drifted = spark.createDataFrame(drift_rows, SCHEMA)
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part_df in enumerate(
        (base.filter(F.col("vec_id") < 1000),
         base.filter(F.col("vec_id") >= 1000), drifted)
    ):
        d = str(tmp_path / f"w{i}")
        part_df.coalesce(1).write.parquet(d)
        part = glob.glob(d + "/part-*.parquet")[0]
        shutil.copy(part, f"{flat}/{i:02d}.parquet")

    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    reports: list = []

    def run():
        stream = (
            spark.readStream.format("parquet")
            .schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .load(flat)
        )
        foreach_batch_ann_ingest(
            stream, idx, ckpt, n_centroids=2, seed=1,
            mean_shift_threshold=0.05, reports=reports,
            rebuild_on_drift=True,
        )

    run()
    total = base.count() + drifted.count()
    assert any(r.get("rebuilt") for r in reports)
    centers = np.load(os.path.join(idx, "_centroids.npy"))
    # the rebuilt assignment covers every ever-ingested vector exactly
    stored = {
        r["vec_id"]: int(r["cell"])
        for r in spark.read.parquet(idx).select("vec_id", "cell").collect()
    }
    assert len(stored) == total
    union = base.unionByName(drifted)
    assert stored == _assign_direct(union, centers)
    stats_n = sum(
        r["n"] for r in read_streaming_cell_stats(spark, idx).collect()
    )
    assert stats_n == total

    # crash window on the rebuilt batch: replay must converge
    commits = sorted(
        f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")
    )
    os.remove(f"{ckpt}/commits/{commits[-1]}")
    crc = f"{ckpt}/commits/.{commits[-1]}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    run()
    assert spark.read.parquet(idx).count() == total
    assert sum(
        r["n"] for r in read_streaming_cell_stats(spark, idx).collect()
    ) == total


def test_streamed_ivfpq_drift_rebuild_handoff(spark, tmp_path):
    """Stream→batch drift handoff (the PQ stream is report-only on
    drift): a planted drift wave trips the streamed report, the CLI
    (`--report-drift --rebuild-on-drift`) retrains codebooks + re-encodes
    the whole streamed tree in place, the recall certificate is restored
    to the fresh-one-shot-build level, and the SAME stream/checkpoint
    resumes folding micro-batches into the rebuilt tree."""
    from home_credit_data_engineering_spark.functions.vectors import (
        to_double_array,
    )
    from home_credit_data_engineering_spark.jobs import ann_index as job
    from home_credit_data_engineering_spark.operators.quantization import (
        assign_encode_udf,
        build_ivfpq_index,
        ivfpq_query_index,
    )
    from home_credit_data_engineering_spark.operators.similarity import (
        brute_force_topk,
    )

    rng = np.random.RandomState(3)
    base = _clustered(spark, n_per=30)
    drift_rows = [
        (700_000 + i, (np.eye(1, DIM, 4)[0] * 5
                       + rng.normal(0, 0.1, DIM)).tolist())
        for i in range(90)
    ]
    drifted = spark.createDataFrame(drift_rows, SCHEMA)
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    for i, part_df in enumerate(
        (base.filter(F.col("vec_id") < 1000),
         base.filter(F.col("vec_id") >= 1000), drifted)
    ):
        d = str(tmp_path / f"w{i}")
        part_df.coalesce(1).write.parquet(d)
        part = glob.glob(d + "/part-*.parquet")[0]
        shutil.copy(part, f"{flat}/{i:02d}.parquet")

    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    reports: list = []
    _run_pq(spark, flat, idx, ckpt, reports=reports,
            mean_shift_threshold=0.05)
    # the streamed report TRIPS but does not rebuild (report-only)
    assert reports[-1]["rebuild_recommended"]
    assert "rebuilt" not in reports[-1]
    books_before = np.load(os.path.join(idx, "_codebooks.npy"))

    # stream stopped → CLI rebuild (geometry inherited from sidecars)
    assert job.main(
        ["--state-dir", idx, "--report-drift", "--rebuild-on-drift",
         "--mean-shift-threshold", "0.05"]
    ) == 0
    books_after = np.load(os.path.join(idx, "_codebooks.npy"))
    assert books_before.shape == books_after.shape
    assert not np.allclose(books_before, books_after)

    union = base.unionByName(drifted)
    total = union.count()
    codes = spark.read.parquet(os.path.join(idx, "codes"))
    assert codes.count() == total
    # batch partition keys survive the rebuild (replay semantics intact)
    assert sorted(
        int(r["batch"]) for r in
        codes.select(F.col("batch").cast("int").alias("batch"))
        .distinct().collect()
    ) == [0, 1, 2]

    # recall certificate: rebuilt streamed tree matches a fresh one-shot
    # build of the same geometry over the same corpus
    queries = union.filter(F.col("vec_id").isin(0, 1000, 700_000))
    k = 5
    truth = {}
    for r in brute_force_topk(union, queries, k=k).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    n_truth = sum(len(v) for v in truth.values())

    def recall(path):
        got = ivfpq_query_index(
            spark, path, queries, k=k, n_probe=2, rerank=10
        ).collect()
        return sum(
            1 for r in got if r["neighbor_id"] in truth[r["query_id"]]
        ) / n_truth

    fresh = str(tmp_path / "fresh")
    build_ivfpq_index(union, fresh, n_centroids=2, m=8, nbits=4, seed=42)
    assert recall(idx) >= recall(fresh) - 1e-9

    # the SAME stream + checkpoint resumes into the rebuilt tree
    wave3 = spark.createDataFrame(
        [(800_000 + i,
          (np.full(DIM, 5.0) + rng.normal(0, 0.1, DIM)).tolist())
         for i in range(20)],
        SCHEMA,
    )
    d3 = str(tmp_path / "w3")
    wave3.coalesce(1).write.parquet(d3)
    shutil.copy(glob.glob(d3 + "/part-*.parquet")[0], f"{flat}/03.parquet")
    _run_pq(spark, flat, idx, ckpt)
    codes2 = spark.read.parquet(os.path.join(idx, "codes"))
    assert codes2.count() == total + 20
    # the resumed fold encoded under the NEW sidecars
    centers = np.load(os.path.join(idx, "_centroids.npy"))
    residual = bool(np.load(os.path.join(idx, "_residual.npy"))[0])
    encode = assign_encode_udf(
        centers / np.maximum(
            np.linalg.norm(centers, axis=1), 1e-300
        )[:, None],
        books_after, None, residual,
    )
    want = {
        (r["vec_id"], tuple(r["__c"].code))
        for r in wave3.select(
            "vec_id", encode(to_double_array("embedding")).alias("__c")
        ).collect()
    }
    got = {
        (r["vec_id"], tuple(r["pq_code"]))
        for r in codes2.filter(F.col("vec_id") >= 800_000)
        .select("vec_id", "pq_code").collect()
    }
    assert got == want
