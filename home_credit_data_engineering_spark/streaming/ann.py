"""Streaming ANN index maintenance: fold each micro-batch of new
vectors into a persisted IVF index under Structured Streaming —
completing the stream==batch symmetry the dedup / ER / corpus states
already have.

The batch API's increments (``operators/ann_state.py``) are bare
parquet appends, which are NOT replay-safe: foreachBatch delivers
at-least-once, and a replayed append double-counts. The streaming form
therefore owns a REPLAY-IDEMPOTENT layout:

- data rows land in ``(cell, batch)`` partitions written with dynamic
  partition overwrite. Cell assignment under frozen centroids is
  deterministic, so a replayed batch touches exactly its own previous
  partitions and overwrites them — no duplicates, no matter how many
  retries. (This is why the layout differs from the batch index: a
  cell-only tree cannot distinguish one batch's files from another's.)
- per-batch drift-stats deltas land in ``_cell_stats_deltas/batch=N``
  (overwrite-idempotent); the running per-cell state is their sum,
  merged at read time — the same batch-keyed-delta discipline as the
  corpus report card. So the tree never grows O(#batches), deltas
  STRICTLY OLDER than the in-flight batch are periodically folded into
  one summary partition via the repo's two-phase ``__next`` swap
  (``compact_deltas_every``). Only the current batch sits in
  foreachBatch's replay window, so folding its predecessors is
  replay-safe: a redelivered batch N still overwrites exactly
  ``batch=N``, which the compaction never absorbs.
- the FIRST micro-batch bootstraps the index: it trains the coarse
  quantizer with the exact trainer the one-time build uses
  (``similarity.train_ivf_centroids``, seeded) and saves
  ``_centroids.npy``; every later batch assigns under those frozen
  centroids with the build's own UDF.

The query path is unchanged: ``similarity.ivf_query_index`` reads the
``cell=…`` tree, partition-prunes on the first level, and selects only
(id, vector, cell) — the extra ``batch`` partition column is simply
never selected. Do NOT mix maintainers: the batch increment's cell-only
appends into a ``(cell, batch)`` tree (or vice versa) would conflict at
partition discovery.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.functions.vectors import to_double_array
from home_credit_data_engineering_spark.operators.ann_state import (
    _STATS_SCHEMA,
    _merge_stats,
    _unit,
    cell_stats,
    drift_report,
)
from home_credit_data_engineering_spark.sources.maintenance import (
    assert_layout_if_marked,
    check_state_layout,
    recover_state_swap,
    staged_state_path,
    swap_in_state,
    write_state_layout,
)


def _deltas_path(index_path: str) -> str:
    return os.path.join(index_path, "_cell_stats_deltas")


def _delta_batch_ids(deltas_dir: str) -> list[int]:
    if not os.path.isdir(deltas_dir):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(deltas_dir)
        if d.startswith("batch=")
    )


def _check_streamed_layout(index_path: str, kind: str) -> None:
    """Raise on a batch-maintained tree (mechanical form of the "Do NOT
    mix maintainers" contract above); legacy streamed trees without the
    marker are detected by their batch-keyed stats-delta dir and
    adopted."""
    check_state_layout(
        index_path,
        "streamed",
        kind,
        inferred_maintainer=(
            "batch"
            if os.path.isdir(os.path.join(index_path, "_cell_stats"))
            else "streamed"
        ),
    )


def read_streaming_cell_stats(spark: SparkSession, index_path: str) -> DataFrame:
    """Running per-cell (n, Σ unit-vector) state: the sum of every
    batch's delta (cells-sized frames; the merge never touches data)."""
    recover_state_swap(_deltas_path(index_path))
    return (
        spark.read.parquet(_deltas_path(index_path))
        .select("cell", "n", "vsum")
        .groupBy("cell")
        .applyInPandas(_merge_stats, _STATS_SCHEMA)
    )


def _compact_deltas(
    spark: SparkSession, index_path: str, current_batch_id: int
) -> None:
    """Fold every delta with ``batch < current_batch_id`` into ONE
    summary partition (keyed by the max folded id, which can never be
    redelivered — structured streaming replays only the batch whose
    offsets were not yet committed, i.e. the current one). Crash-safe
    via the two-phase ``__next`` swap: a death mid-compaction leaves the
    original tree untouched and ``recover_state_swap`` discards or
    promotes the staged copy on the next read."""
    deltas = _deltas_path(index_path)
    recover_state_swap(deltas)
    prior = [i for i in _delta_batch_ids(deltas) if i < current_batch_id]
    if len(prior) < 2:
        return
    folded = (
        spark.read.parquet(*[f"{deltas}/batch={i}" for i in prior])
        .select("cell", "n", "vsum")
        .groupBy("cell")
        .applyInPandas(_merge_stats, _STATS_SCHEMA)
        .withColumn("batch", F.lit(max(prior)))
    )
    current = (
        spark.read.parquet(f"{deltas}/batch={current_batch_id}")
        .select("cell", "n", "vsum")
        .withColumn("batch", F.lit(current_batch_id))
    )
    (
        folded.unionByName(current)
        .coalesce(1)
        .write.partitionBy("batch")
        .parquet(staged_state_path(deltas))
    )
    swap_in_state(deltas)


def compact_streamed_ann_index(spark: SparkSession, index_path: str) -> dict:
    """OFFLINE compaction of a streaming-maintained IVF or IVF-PQ index:
    fold the data rows of every batch EXCEPT the newest into one batch
    partition per cell, and fold the stats deltas to match. Run with the
    stream STOPPED.

    After B micro-batches the data tree holds cells × B directories;
    queries only ever prune on ``cell``, so the batch split is pure
    file-count overhead. The fold rewrites each tree (content-identical,
    one file per surviving ``(cell, batch)``) through the two-phase
    ``__next`` swap — a crash leaves the old tree or the new one, never
    a mix. The NEWEST batch keeps its own partition: even a cleanly
    stopped stream can redeliver its final batch on restart (crash
    before the last offset commit), and that replay must overwrite only
    its own directories. A PQ layout (``codes/`` + ``vectors/``
    subtrees) is auto-detected; its legs fold independently, which is
    safe between legs because each leg's fold preserves that leg's
    content. Returns ``{"batches_before", "batches_after", "rows"}``.
    """

    def _fold_tree(path: str, *part_cols: str) -> tuple[int, int, int]:
        recover_state_swap(path)
        # partition inference is off engine-wide (session.py), so the
        # batch partition column reads back as STRING — cast before
        # comparing, else "10" < "9" lexicographically and the fold
        # absorbs the replayable newest batch
        df = spark.read.parquet(path).withColumn(
            "batch", F.col("batch").cast("int")
        )
        ids = sorted(
            r["batch"] for r in df.select("batch").distinct().collect()
        )
        rows = df.count()
        if len(ids) < 3:
            return len(ids), len(ids), rows
        max_id, target = ids[-1], ids[-2]
        folded = df.withColumn(
            "batch",
            F.when(F.col("batch") < max_id, F.lit(target)).otherwise(
                F.col("batch")
            ),
        )
        if "cell" in part_cols:
            folded = folded.repartition("cell")
        else:
            # batch-only tree (PQ vectors leg): without a shuffle key the
            # fold keeps ~one output file per input file, defeating the
            # compaction — coalesce bounds files to the core count
            folded = folded.coalesce(
                spark.sparkContext.defaultParallelism
            )
        folded.write.partitionBy(*part_cols).parquet(staged_state_path(path))
        _carry_sidecars(path)
        swap_in_state(path)
        return len(ids), 2, rows

    def _carry_sidecars(path: str) -> None:
        # sidecars live at the INDEX root; only the root tree (plain
        # IVF layout) carries them through its swap
        if path != index_path:
            return
        import shutil

        staged = staged_state_path(index_path)
        for name in os.listdir(index_path):
            full = os.path.join(index_path, name)
            if (
                name.endswith(".npy") or name == "_layout.json"
            ) and os.path.isfile(full):
                shutil.copy2(full, os.path.join(staged, name))
        deltas = _deltas_path(index_path)
        if os.path.isdir(deltas):
            shutil.copytree(deltas, _deltas_path(staged))

    # recover pending swaps BEFORE detecting the layout: a PQ compaction
    # that died inside swap_in_state(codes) leaves codes__next but no
    # codes/, which would misdetect as a plain-IVF layout and crash on
    # the mixed root tree instead of finishing the interrupted swap
    assert_layout_if_marked(
        index_path,
        "streamed",
        "ivfpq" if os.path.isdir(os.path.join(index_path, "codes")) else "ivf",
    )
    for sub in ("", "codes", "vectors"):
        recover_state_swap(os.path.join(index_path, sub) if sub else index_path)
    recover_state_swap(_deltas_path(index_path))
    _check_streamed_layout(
        index_path,
        "ivfpq" if os.path.isdir(os.path.join(index_path, "codes")) else "ivf",
    )
    if os.path.isdir(os.path.join(index_path, "codes")):
        # PQ layout: codes/ and vectors/ are separate subtrees; sidecars
        # and stats deltas sit beside them untouched by the swaps
        before, after, rows = _fold_tree(
            os.path.join(index_path, "codes"), "cell", "batch"
        )
        _fold_tree(os.path.join(index_path, "vectors"), "batch")
    else:
        before, after, rows = _fold_tree(index_path, "cell", "batch")
    if before >= 3:
        # fold the stats deltas under the same replay-window rule
        max_id = max(_delta_batch_ids(_deltas_path(index_path)))
        _compact_deltas(spark, index_path, max_id)
    return {"batches_before": before, "batches_after": after, "rows": rows}


def foreach_batch_ann_ingest(
    stream_vectors: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 42,
    train_fraction: float | None = None,
    mean_shift_threshold: float = 0.2,
    imbalance_threshold: float = 8.0,
    reports: list | None = None,
    compact_deltas_every: int = 16,
    rebuild_on_drift: bool = False,
):
    """Run the vector stream to completion (``availableNow``), folding
    each micro-batch into the IVF index. Returns the finished query.

    ``reports`` (optional list) collects one drift report per applied
    batch — the streaming analogue of the batch increment's return
    value; a caller watches it (or the printed lines) for
    ``rebuild_recommended`` and restarts the pipeline against a freshly
    trained index when it trips. With ``rebuild_on_drift=True`` the
    stream handles it itself: when a batch's report trips, the quantizer
    is RETRAINED from every stored vector, all rows are reassigned, and
    the whole tree (data + centroid sidecar + per-batch stats deltas)
    swaps in two-phase INSIDE apply_batch — before the offset commit, so
    a crash mid-rebuild replays the batch against the intact old tree
    and a crash after the swap replays it as a deterministic overwrite
    under the NEW centroids. Batch keys survive the rebuild (rows keep
    their batch partition), so replay semantics are unchanged.

    ``compact_deltas_every`` bounds the stats-delta tree: once more
    than that many ``batch=N`` partitions exist, deltas older than the
    in-flight batch fold into one summary partition, keeping the
    per-batch drift merge O(compact window), not O(stream lifetime).
    """
    from home_credit_data_engineering_spark.operators.similarity import (
        best_cell_udf,
        train_ivf_centroids,
    )

    centroids_file = os.path.join(index_path, "_centroids.npy")
    # two-phase layout guard: an explicit batch marker raises BEFORE any
    # recovery (generic recovery on a batch tree could discard its
    # promised fold legs); then finish any swap a compaction/rebuild
    # left mid-flight BEFORE the first write (or the legacy adoption's
    # marker write) recreates the live dirs — recover_state_swap
    # discards a completed __next once the live dir exists, so writing
    # first would permanently lose the pre-crash index/stats
    assert_layout_if_marked(index_path, "streamed", "ivf")
    recover_state_swap(index_path)
    recover_state_swap(_deltas_path(index_path))
    _check_streamed_layout(index_path, "ivf")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.dropDuplicates([id_col])
        if not os.path.exists(centroids_file):
            # bootstrap: this batch trains the coarse quantizer
            centers = train_ivf_centroids(
                batch,
                vec_col=vec_col,
                n_centroids=n_centroids,
                seed=seed,
                train_fraction=train_fraction,
            )
            os.makedirs(index_path, exist_ok=True)
            write_state_layout(index_path, "streamed", "ivf")
            # atomic sidecar write: a crash mid-np.save would leave a
            # truncated file that the exists() guard then treats as the
            # trained quantizer forever — stage + rename instead
            _save_sidecar_atomic(centroids_file, centers)
        else:
            centers = np.load(centroids_file)
        best_cell = best_cell_udf(_unit(centers))
        delta = (
            batch.select(
                F.col(id_col),
                F.col(vec_col),
                best_cell(to_double_array(vec_col)).alias("cell"),
            )
            .withColumn("batch", F.lit(batch_id))
            .localCheckpoint(eager=True)  # assign once: data + stats
        )
        (
            delta.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cell", "batch")
            .parquet(index_path)
        )
        # batch-keyed stats delta: a replay overwrites its own directory
        cell_stats(delta, vec_col).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{_deltas_path(index_path)}/batch={batch_id}")
        spark = batch_df.sparkSession
        if len(_delta_batch_ids(_deltas_path(index_path))) > compact_deltas_every:
            _compact_deltas(spark, index_path, batch_id)
        rows = read_streaming_cell_stats(spark, index_path).collect()
        report = drift_report(
            rows, centers, mean_shift_threshold, imbalance_threshold
        )
        report["batch_id"] = batch_id
        report["appended"] = delta.count()
        if rebuild_on_drift and report["rebuild_recommended"]:
            _rebuild_streamed_index(
                spark,
                index_path,
                id_col=id_col,
                vec_col=vec_col,
                n_centroids=n_centroids,
                seed=seed,
                train_fraction=train_fraction,
            )
            report["rebuilt"] = True
        if reports is not None:
            reports.append(report)

    query = (
        stream_vectors.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def _rebuild_streamed_index(
    spark: SparkSession,
    index_path: str,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    seed: int,
    train_fraction: float | None,
) -> None:
    """Drift-triggered retrain of a streamed plain-IVF index: retrain
    the quantizer from EVERY stored vector (the build's own trainer),
    reassign all rows preserving their ``batch`` partition keys, rebuild
    the per-batch stats deltas (one folded summary for the history + the
    newest batch's own delta — the same replay-window shape the online
    compaction maintains), and swap the whole tree two-phase."""
    from home_credit_data_engineering_spark.operators.similarity import (
        best_cell_udf,
        train_ivf_centroids,
    )

    rows = spark.read.parquet(index_path).select(
        id_col, vec_col, F.col("batch").cast("int").alias("batch")
    )
    centers = train_ivf_centroids(
        rows,
        vec_col=vec_col,
        n_centroids=n_centroids,
        seed=seed,
        train_fraction=train_fraction,
    )
    best_cell = best_cell_udf(_unit(centers))
    reassigned = rows.select(
        F.col(id_col),
        F.col(vec_col),
        best_cell(to_double_array(vec_col)).alias("cell"),
        "batch",
    ).localCheckpoint(eager=True)  # one assignment pass: data + stats
    staged = staged_state_path(index_path)
    (
        reassigned.repartition("cell")
        .write.partitionBy("cell", "batch")
        .parquet(staged)
    )
    _save_sidecar_atomic(os.path.join(staged, "_centroids.npy"), centers)
    write_state_layout(staged, "streamed", "ivf")
    max_id = int(
        reassigned.agg(F.max("batch").alias("m")).first()["m"]
    )
    prior = reassigned.filter(F.col("batch") < max_id)
    if prior.take(1):
        cell_stats(prior, vec_col).coalesce(1).write.parquet(
            f"{_deltas_path(staged)}/batch={max_id - 1}"
        )
    cell_stats(
        reassigned.filter(F.col("batch") == max_id), vec_col
    ).coalesce(1).write.parquet(f"{_deltas_path(staged)}/batch={max_id}")
    swap_in_state(index_path)


def rebuild_streamed_ivf_index(
    spark: SparkSession,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = None,
    seed: int = 42,
    train_fraction: float | None = None,
) -> dict:
    """Offline drift-triggered retrain of a streaming-maintained plain
    IVF index (public wrapper around the in-stream rebuild; run with the
    stream STOPPED — ``jobs/ann_index.py --report-drift
    --rebuild-on-drift`` drives it). Geometry defaults to the stored
    centroid count. Returns ``{"n_vectors", "n_cells"}``."""
    assert_layout_if_marked(index_path, "streamed", "ivf")
    recover_state_swap(index_path)
    recover_state_swap(_deltas_path(index_path))
    _check_streamed_layout(index_path, "ivf")
    n_cells = n_centroids or len(
        np.load(os.path.join(index_path, "_centroids.npy"))
    )
    _rebuild_streamed_index(
        spark,
        index_path,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_cells,
        seed=seed,
        train_fraction=train_fraction,
    )
    return {
        "n_vectors": spark.read.parquet(index_path).count(),
        "n_cells": int(n_cells),
    }


def rebuild_streamed_ivfpq_index(
    spark: SparkSession,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = None,
    seed: int = 42,
    train_fraction: float | None = None,
) -> dict:
    """Drift-triggered RETRAIN + RE-ENCODE of a streaming-maintained
    IVF-PQ index — the batch half of the stream→batch handoff: the PQ
    stream (:func:`foreach_batch_ivfpq_ingest`) is deliberately
    report-only on drift (a PQ retrain replaces codebooks/rotation,
    invalidating every stored code), so when its drift report trips, the
    operator stops the stream, runs this (``jobs/ann_index.py
    --state-dir … --report-drift --rebuild-on-drift`` drives it), and
    resumes the stream against the rebuilt tree — the checkpoint stays
    valid because the path never changes, and every later micro-batch
    loads the NEW sidecars from disk.

    Run with the stream STOPPED. The rebuild retrains the full model
    state from EVERY stored vector with the one-shot builder's own
    recipe (``quantization.train_ivfpq_sidecars`` — geometry inherited
    from the stored sidecars unless overridden), re-encodes all vectors
    under the new sidecars PRESERVING their ``batch`` partition keys (so
    a redelivered final micro-batch still overwrites exactly its own
    partitions), rebuilds the batch-keyed stats deltas in the new
    assignment space (one folded summary for the history + the newest
    batch's own delta — the replay-window shape the online compaction
    maintains), and swaps the WHOLE tree (codes + vectors + sidecars +
    deltas + layout marker) in one two-phase root swap. Returns
    ``{"n_vectors", "n_cells"}``.
    """
    from home_credit_data_engineering_spark.operators.quantization import (
        assign_encode_udf,
        train_ivfpq_sidecars,
    )

    assert_layout_if_marked(index_path, "streamed", "ivfpq")
    recover_state_swap(index_path)
    recover_state_swap(os.path.join(index_path, "codes"))
    recover_state_swap(os.path.join(index_path, "vectors"))
    recover_state_swap(_deltas_path(index_path))
    _check_streamed_layout(index_path, "ivfpq")
    old_books = np.load(os.path.join(index_path, "_codebooks.npy"))
    m, n_codes = int(old_books.shape[0]), int(old_books.shape[1])
    nbits = n_codes.bit_length() - 1
    residual = bool(np.load(os.path.join(index_path, "_residual.npy"))[0])
    opq = os.path.exists(os.path.join(index_path, "_rotation.npy"))
    n_cells = n_centroids or len(
        np.load(os.path.join(index_path, "_centroids.npy"))
    )
    rows = spark.read.parquet(os.path.join(index_path, "vectors")).select(
        id_col, vec_col, F.col("batch").cast("int").alias("batch")
    )
    centers, books, rot = train_ivfpq_sidecars(
        rows,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_cells,
        m=m,
        nbits=nbits,
        seed=seed,
        train_fraction=train_fraction,
        residual=residual,
        opq=opq,
    )
    encode = assign_encode_udf(_unit(centers), books, rot, residual)
    enc = (
        rows.select(
            F.col(id_col),
            F.col(vec_col),
            encode(to_double_array(vec_col)).alias("__ae"),
            "batch",
        )
        .select(
            id_col,
            vec_col,
            F.col("__ae.cell").alias("cell"),
            F.col("__ae.code").alias("pq_code"),
            "batch",
        )
        .localCheckpoint(eager=True)  # one encode pass: codes+vectors+stats
    )
    staged = staged_state_path(index_path)
    (
        enc.select(id_col, "pq_code", "cell", "batch")
        .repartition("cell")
        .write.partitionBy("cell", "batch")
        .parquet(os.path.join(staged, "codes"))
    )
    (
        enc.repartition("cell")
        .select(id_col, vec_col, "batch")
        .write.partitionBy("batch")
        .parquet(os.path.join(staged, "vectors"))
    )
    _save_sidecar_atomic(os.path.join(staged, "_codebooks.npy"), books)
    _save_sidecar_atomic(
        os.path.join(staged, "_residual.npy"), np.array([int(residual)])
    )
    if rot is not None:
        _save_sidecar_atomic(os.path.join(staged, "_rotation.npy"), rot)
    _save_sidecar_atomic(os.path.join(staged, "_centroids.npy"), centers)
    write_state_layout(staged, "streamed", "ivfpq")
    # batch-keyed stats deltas in the NEW assignment space, replay-window
    # shaped: history folds to one summary keyed max_id-1 (never
    # redeliverable), the newest batch keeps its own delta
    max_id = int(enc.agg(F.max("batch").alias("m")).first()["m"])
    prior = enc.filter(F.col("batch") < max_id)
    if prior.take(1):
        cell_stats(prior, vec_col, rot=rot).coalesce(1).write.parquet(
            f"{_deltas_path(staged)}/batch={max_id - 1}"
        )
    cell_stats(
        enc.filter(F.col("batch") == max_id), vec_col, rot=rot
    ).coalesce(1).write.parquet(f"{_deltas_path(staged)}/batch={max_id}")
    n_vec = enc.count()
    # root-level completeness marker for the swap helper (the subtree
    # writes keep theirs inside codes/ and vectors/)
    open(os.path.join(staged, "_SUCCESS"), "a").close()
    swap_in_state(index_path)
    return {"n_vectors": n_vec, "n_cells": int(len(centers))}


def _save_sidecar_atomic(path: str, arr: np.ndarray) -> None:
    tmp = path + ".__next"
    with open(tmp, "wb") as fh:
        np.save(fh, arr)
    os.replace(tmp, path)


def foreach_batch_ivfpq_ingest(
    stream_vectors: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    m: int = 8,
    nbits: int = 4,
    seed: int = 42,
    train_fraction: float | None = None,
    residual: bool = False,
    opq: bool = False,
    mean_shift_threshold: float = 0.2,
    imbalance_threshold: float = 8.0,
    reports: list | None = None,
    compact_deltas_every: int = 16,
):
    """IVF-PQ mirror of :func:`foreach_batch_ann_ingest`: fold each
    micro-batch of new vectors into a persisted IVF-PQ index under
    Structured Streaming. Returns the finished query.

    The FIRST batch trains the full model state with the one-shot
    builder's own recipe (:func:`~home_credit_data_engineering_spark.
    operators.quantization.train_ivfpq_sidecars` — coarse centroids, PQ
    codebooks, optional OPQ rotation) and saves the sidecars atomically;
    every later batch assigns + PQ-encodes under those FROZEN sidecars
    (``quantization.assign_encode_udf`` — byte-identical codes to a
    build with the same sidecars). Replay idempotency follows the plain
    IVF layout: ``codes/`` rows land in ``(cell, batch)`` partitions and
    ``vectors/`` rows in ``batch=N`` partitions, both via dynamic
    partition overwrite, and drift stats are batch-keyed deltas in the
    ROTATED space when an OPQ rotation exists (the space the centroids
    live in). The query path (``quantization.ivfpq_query_index``) is
    unchanged — it selects columns, never the extra ``batch`` level.

    No ``rebuild_on_drift`` here (unlike the plain-IVF stream): a PQ
    retrain replaces codebooks/rotation too, invalidating every stored
    code — that full re-encode pass is the batch CLI's job
    (``jobs/ann_index.py --rebuild-on-drift``); watch ``reports`` and
    schedule it when the drift verdict trips.
    """
    from home_credit_data_engineering_spark.operators.quantization import (
        assign_encode_udf,
        train_ivfpq_sidecars,
    )

    centroids_file = os.path.join(index_path, "_centroids.npy")
    # finish any swap a compaction or drift rebuild left mid-flight
    # BEFORE anything (including the layout check's marker write)
    # recreates the live dirs (see foreach_batch_ann_ingest); the ROOT
    # recovery must run first — rebuild_streamed_ivfpq_index swaps the
    # whole tree
    assert_layout_if_marked(index_path, "streamed", "ivfpq")
    recover_state_swap(index_path)
    recover_state_swap(os.path.join(index_path, "codes"))
    recover_state_swap(os.path.join(index_path, "vectors"))
    recover_state_swap(_deltas_path(index_path))
    _check_streamed_layout(index_path, "ivfpq")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.dropDuplicates([id_col])
        if not os.path.exists(centroids_file):
            centers, books, rot = train_ivfpq_sidecars(
                batch,
                id_col=id_col,
                vec_col=vec_col,
                n_centroids=n_centroids,
                m=m,
                nbits=nbits,
                seed=seed,
                train_fraction=train_fraction,
                residual=residual,
                opq=opq,
            )
            os.makedirs(index_path, exist_ok=True)
            write_state_layout(index_path, "streamed", "ivfpq")
            # centroids LAST: their existence is the bootstrapped marker,
            # so a crash mid-bootstrap retrains rather than trusting a
            # partial sidecar set
            _save_sidecar_atomic(
                os.path.join(index_path, "_codebooks.npy"), books
            )
            _save_sidecar_atomic(
                os.path.join(index_path, "_residual.npy"),
                np.array([int(residual)]),
            )
            if rot is not None:
                _save_sidecar_atomic(
                    os.path.join(index_path, "_rotation.npy"), rot
                )
            _save_sidecar_atomic(centroids_file, centers)
        else:
            centers = np.load(centroids_file)
            books = np.load(os.path.join(index_path, "_codebooks.npy"))
            residual_now = bool(
                np.load(os.path.join(index_path, "_residual.npy"))[0]
            )
            rot_file = os.path.join(index_path, "_rotation.npy")
            rot = np.load(rot_file) if os.path.exists(rot_file) else None
            if residual_now != residual:
                raise ValueError(
                    f"index was built with residual={residual_now}, "
                    f"got residual={residual}"
                )
        encode = assign_encode_udf(_unit(centers), books, rot, residual)
        enc = (
            batch.select(
                F.col(id_col),
                F.col(vec_col),
                encode(to_double_array(vec_col)).alias("__ae"),
            )
            .select(
                id_col,
                vec_col,
                F.col("__ae.cell").alias("cell"),
                F.col("__ae.code").alias("pq_code"),
            )
            .withColumn("batch", F.lit(batch_id))
            .localCheckpoint(eager=True)  # encode once: codes+vectors+stats
        )
        (
            enc.select(id_col, "pq_code", "cell", "batch")
            .repartition("cell")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cell", "batch")
            .parquet(os.path.join(index_path, "codes"))
        )
        (
            enc.select(id_col, vec_col, "batch")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(os.path.join(index_path, "vectors"))
        )
        cell_stats(enc, vec_col, rot=rot).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{_deltas_path(index_path)}/batch={batch_id}")
        spark = batch_df.sparkSession
        if len(_delta_batch_ids(_deltas_path(index_path))) > compact_deltas_every:
            _compact_deltas(spark, index_path, batch_id)
        rows = read_streaming_cell_stats(spark, index_path).collect()
        report = drift_report(
            rows, centers, mean_shift_threshold, imbalance_threshold
        )
        report["batch_id"] = batch_id
        report["appended"] = enc.count()
        if reports is not None:
            reports.append(report)

    query = (
        stream_vectors.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
