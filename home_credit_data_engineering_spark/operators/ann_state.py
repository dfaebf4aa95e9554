"""O(Δ) incremental maintenance for the persisted ANN indexes.

The IVF (``similarity.build_ivf_index``) and IVF-PQ
(``quantization.build_ivfpq_index``) indexes are cell-partitioned
parquet plus tiny numpy sidecars. A daily embedding batch should not
trigger a full retrain+rewrite of a 100 TB index; this module gives the
indexes the same O(Δ) fold the dedup states (``dedup.py``), entity
resolution (``linkage.incremental_resolve_entities``) and the corpus
pipeline already have:

- **Increment** — assign the new vectors to their nearest EXISTING
  centroid with the exact same UDF the build used
  (``similarity.best_cell_udf`` / ``quantization.assign_encode_udf``),
  then PUBLISH the cell-partitioned files. Cost is one pass over Δ: the
  stored corpus partitions are never read (asserted in
  ``tests/test_ann_incremental.py`` by garbling them first), only the
  KB-sized centroid sidecar and the cells-sized stats table. Each fold
  is REPLAY-IDEMPOTENT via the processed-delta ledger
  (``sources/maintenance.py``): the delta's content fingerprint keys a
  ledger marker, data files publish under deterministic
  ``delta-{fp}-N.parquet`` names, and the stats sidecar swaps in under
  a two-state commit marker — so an at-least-once orchestrator
  re-running a completed fold gets a no-op, and a crash at any point
  either replays the whole fold convergently or completes it.
- **Drift tracking** — the centroids are frozen between rebuilds, so
  index quality decays if the data distribution moves. Each index keeps
  a per-cell running ``(count, Σ unit-vector)`` table
  (``{path}/_cell_stats``, ≤ n_cells rows); after every increment the
  report compares each cell's running mean direction against its
  centroid (``mean_shift = 1 − cos``) and the cell-size spread
  (``size_imbalance = max/mean``), and recommends a rebuild past the
  thresholds — the standard "append until drift, then retrain" regime
  (FAISS deployments do the same; centroids are a snapshot of the
  distribution, not ground truth).
- **Rebuild** — ``jobs/ann_index.py --state-dir`` folds batches and,
  with ``--rebuild-on-drift``, retrains from the stored vectors into a
  staged sibling and swaps it in atomically (the shared two-phase
  state-swap helper, ``sources/maintenance.py``).

Correctness shape: given fixed centroids, increment-then-query is
EXACTLY build-then-query over the union (same assignment UDF, parquet
append lands in the same ``cell=N`` partitions); the only approximation
relative to a full rebuild is the frozen coarse quantizer, which the
recall certificate in the tests bounds on planted clusters.

Scale shape: the stats table is two-level — Arrow-batch partial sums via
``mapInPandas`` (≤ n_cells rows per batch leave each task), then a tiny
per-cell merge — so no shuffle ever carries vectors, and the driver only
ever sees n_cells rows. The parquet append is one write of Δ rows into
existing partition directories; no old file is rewritten.

The stats table is advisory (drift diagnostics), so its float sums are
not required to be bit-stable across partitionings; nothing hashes them.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.functions.vectors import to_double_array
from home_credit_data_engineering_spark.sources.maintenance import (
    assert_layout_if_marked,
    begin_fold_commit,
    check_state_layout,
    delta_fingerprint,
    finish_fold_commit,
    incoming_delta_path,
    publish_delta_files,
    read_fold_marker,
    recover_fold_commits,
    recover_state_swap,
    staged_state_path,
    swap_in_state,
)

__all__ = [
    "cell_stats",
    "refresh_cell_stats_from_index",
    "read_cell_stats",
    "drift_report",
    "ivf_index_increment",
    "ivfpq_index_increment",
    "tune_probes",
]

_STATS_SCHEMA = "cell int, n long, vsum array<double>"


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    return np.where(
        norms[:, None] > 0, mat / np.maximum(norms, 1e-300)[:, None], 0.0
    )


def _merge_stats(key, pdf):
    """Shared per-cell (n, vsum) reducer for partial/merged stats rows."""
    return pd.DataFrame(
        {
            "cell": [int(key[0])],
            "n": [int(pdf["n"].sum())],
            "vsum": [
                np.array(pdf["vsum"].tolist(), dtype=np.float64).sum(axis=0)
            ],
        }
    )


def cell_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    cell_col: str = "cell",
    rot: np.ndarray | None = None,
) -> DataFrame:
    """Per-cell ``(n, Σ unit-vector)`` over the ASSIGNMENT space (unit
    normalization, plus the OPQ rotation when the index has one — the
    space the centroids live in, so drift is measured apples-to-apples).

    Two-level aggregation: ``mapInPandas`` reduces each Arrow batch to
    ≤ n_cells partial rows (vectors never shuffle), then a per-cell
    merge sums the partials.
    """
    cols = df.select(
        F.col(cell_col).cast("int").alias("cell"),
        to_double_array(vec_col).alias("__v"),
    )

    def partials(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            M = _unit(np.array(pdf["__v"].tolist(), dtype=np.float64))
            if rot is not None:
                M = M @ rot
            cells = pdf["cell"].to_numpy()
            uniq = np.unique(cells)
            yield pd.DataFrame(
                {
                    "cell": [int(c) for c in uniq],
                    "n": [int((cells == c).sum()) for c in uniq],
                    "vsum": [M[cells == c].sum(axis=0) for c in uniq],
                }
            )

    part = cols.mapInPandas(partials, _STATS_SCHEMA)
    return part.groupBy("cell").applyInPandas(_merge_stats, _STATS_SCHEMA)


def _stats_path(index_path: str) -> str:
    # underscore prefix: Spark treats the dir as hidden, so reading the
    # index root never picks the stats up as data (same trick as the
    # _centroids.npy sidecar).
    return os.path.join(index_path, "_cell_stats")


def _write_cell_stats(stats: DataFrame, index_path: str) -> None:
    sp = _stats_path(index_path)
    stats.coalesce(1).write.mode("overwrite").parquet(staged_state_path(sp))
    swap_in_state(sp)


def _load_rotation(index_path: str) -> np.ndarray | None:
    p = os.path.join(index_path, "_rotation.npy")
    return np.load(p) if os.path.exists(p) else None


def refresh_cell_stats_from_index(
    spark: SparkSession,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """(Re)compute ``_cell_stats`` from the stored index — one full scan.

    Called at build time (so the first increment is O(Δ)) and lazily by
    the increment path when a pre-stats index is encountered. Detects
    the index kind: a ``codes/`` subdir means IVF-PQ (cells live with
    the codes, vectors in ``vectors/``; stats taken in the rotated space
    when an OPQ rotation is stored), otherwise plain IVF (one table)."""
    codes_dir = os.path.join(index_path, "codes")
    if os.path.isdir(codes_dir):
        rot = _load_rotation(index_path)
        codes = spark.read.parquet(codes_dir).select(id_col, "cell")
        vecs = spark.read.parquet(os.path.join(index_path, "vectors")).select(
            id_col, vec_col
        )
        stats = cell_stats(codes.join(vecs, on=id_col), vec_col, rot=rot)
    else:
        stats = cell_stats(spark.read.parquet(index_path), vec_col)
    _write_cell_stats(stats, index_path)


def read_cell_stats(spark: SparkSession, index_path: str) -> DataFrame:
    return spark.read.parquet(_stats_path(index_path))


def drift_report(
    stats_rows,
    centers: np.ndarray,
    mean_shift_threshold: float = 0.2,
    imbalance_threshold: float = 8.0,
) -> dict:
    """Driver-side drift verdict from the (≤ n_cells) stats rows.

    ``mean_shift`` per cell = ``1 − cos(centroid, running mean)`` —
    zero when the cell's members still point where the centroid does;
    ``size_imbalance`` = max cell count / mean cell count over ALL
    centroids (empty cells count zero — a distribution collapse shows
    up as imbalance even when directions hold still).
    """
    c_unit = _unit(centers)
    counts = np.zeros(len(centers), dtype=np.int64)
    max_shift = 0.0
    weighted = 0.0
    total = 0
    for r in stats_rows:
        cell, n = int(r["cell"]), int(r["n"])
        counts[cell] = n
        mean = np.asarray(r["vsum"], dtype=np.float64) / max(n, 1)
        norm = np.linalg.norm(mean)
        if norm == 0:
            continue
        shift = float(1.0 - (mean / norm) @ c_unit[cell])
        max_shift = max(max_shift, shift)
        weighted += shift * n
        total += n
    imbalance = float(counts.max() / counts.mean()) if counts.sum() else 0.0
    trigger = None
    if max_shift > mean_shift_threshold:
        trigger = "mean_shift"
    elif imbalance > imbalance_threshold:
        trigger = "size_imbalance"
    return {
        "n_cells": int(len(centers)),
        "n_vectors": int(counts.sum()),
        "max_mean_shift": max_shift,
        "weighted_mean_shift": (weighted / total) if total else 0.0,
        "size_imbalance": imbalance,
        "mean_shift_threshold": mean_shift_threshold,
        "imbalance_threshold": imbalance_threshold,
        "rebuild_recommended": trigger is not None,
        "trigger": trigger,
    }


def _read_stats_rows_driver(index_path: str) -> list[dict]:
    """Driver-side read of the ``_cell_stats`` sidecar (≤ n_cells rows,
    KB-sized) — no Spark job for what is effectively a config file."""
    import pyarrow.parquet as pq

    sp = _stats_path(index_path)
    out: list[dict] = []
    for f in sorted(os.listdir(sp)):
        if f.endswith(".parquet"):
            out.extend(
                pq.read_table(
                    os.path.join(sp, f), columns=["cell", "n", "vsum"]
                ).to_pylist()
            )
    return out


def _stage_cell_stats_driver(rows: list[dict], index_path: str) -> None:
    """Driver-side sidecar STAGE into ``_cell_stats__next`` (same schema
    Spark writes: cell int, n long, vsum array<double>); the caller
    swaps it in — under the fold-commit marker for increments, directly
    for standalone rewrites."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sp = _stats_path(index_path)
    staged = staged_state_path(sp)
    if os.path.isdir(staged):
        import shutil

        shutil.rmtree(staged)
    os.makedirs(staged, exist_ok=True)
    tbl = pa.table(
        {
            "cell": pa.array([int(r["cell"]) for r in rows], pa.int32()),
            "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
            "vsum": pa.array(
                [[float(x) for x in r["vsum"]] for r in rows],
                pa.list_(pa.float64()),
            ),
        }
    )
    pq.write_table(tbl, os.path.join(staged, "part-00000.parquet"))
    # the swap helper's completeness marker (Spark writers emit it too)
    with open(os.path.join(staged, "_SUCCESS"), "w"):
        pass


def _merge_stage_and_report(
    spark: SparkSession,
    index_path: str,
    delta_stats: DataFrame,
    centers: np.ndarray,
    mean_shift_threshold: float,
    imbalance_threshold: float,
) -> dict:
    """Fold the delta's per-cell stats into a STAGED copy of the stored
    sidecar and emit the drift report; the caller swaps the stage in
    under its fold-commit marker. One Spark job total (the delta-stats
    collect — ≤ n_cells rows): the stored side is a KB-sized sidecar, so
    the merge and rewrite happen driver-side in numpy/pyarrow rather
    than paying three more Spark jobs (read + union-merge + write) per
    increment. ``appended`` is derived from the delta stats (Σn == delta
    row count), saving the extra count job the callers used to run."""
    delta_rows = delta_stats.collect()
    appended = sum(int(r["n"]) for r in delta_rows)
    merged: dict[int, tuple[int, np.ndarray]] = {
        int(r["cell"]): (
            int(r["n"]),
            np.asarray(r["vsum"], dtype=np.float64),
        )
        for r in _read_stats_rows_driver(index_path)
    }
    for r in delta_rows:
        c = int(r["cell"])
        n, v = merged.get(c, (0, 0.0))
        merged[c] = (
            n + int(r["n"]),
            v + np.asarray(r["vsum"], dtype=np.float64),
        )
    rows = [
        {"cell": c, "n": n, "vsum": v}
        for c, (n, v) in sorted(merged.items())
    ]
    _stage_cell_stats_driver(rows, index_path)
    report = drift_report(
        rows, centers, mean_shift_threshold, imbalance_threshold
    )
    report["appended"] = appended
    return report


def ivf_index_increment(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mean_shift_threshold: float = 0.2,
    imbalance_threshold: float = 8.0,
) -> dict:
    """Fold a batch of NEW vectors into a persisted IVF index in O(Δ).

    Assigns each new vector to its nearest existing centroid (the
    build's own UDF — ``similarity.best_cell_udf``), publishes the rows
    into the matching ``cell=N`` partition directories, folds the batch
    into the ``_cell_stats`` running sums, and returns the drift report
    (see :func:`drift_report`) plus ``appended``.

    Ids must be new (the same contract as every incremental state here —
    re-ingesting a known id is an upstream bug this layer does not
    mask). The fold is REPLAY-IDEMPOTENT and crash-atomic via the
    processed-delta ledger (``sources/maintenance.py``): a re-run of a
    completed fold returns the original report with ``replayed=True``
    without touching the tree, and the append itself publishes
    deterministically-named files out of a staged ``_incoming/{fp}``
    directory, so a crashed half-fold converges on re-run instead of
    duplicating — the batch twin of the streaming maintainer's
    ``(cell, batch)`` overwrite discipline.
    """
    from home_credit_data_engineering_spark.operators.similarity import (
        best_cell_udf,
    )

    spark = new_vectors.sparkSession
    # Two-phase layout guard + recovery ordering: an EXPLICIT marker
    # mismatch raises before anything touches the tree; then recovery
    # restores a mid-root/deltas swap (the adoption marker write below
    # would otherwise recreate a live root, making the next recovery
    # DISCARD the completed __next, and the maintainer inference would
    # misread a mid-swap deltas dir).
    assert_layout_if_marked(path, "batch", "ivf")
    recover_state_swap(path)
    recover_state_swap(os.path.join(path, "_cell_stats_deltas"))
    check_state_layout(
        path, "batch", "ivf",
        inferred_maintainer=(
            "streamed"
            if os.path.isdir(os.path.join(path, "_cell_stats_deltas"))
            else "batch"
        ),
    )
    centers = np.load(os.path.join(path, "_centroids.npy"))
    # finish any fold that crashed mid-commit BEFORE the generic
    # recovery (which would discard its completed staged stats)
    recover_fold_commits(path, [_stats_path(path)])
    recover_state_swap(_stats_path(path))
    if not os.path.isdir(_stats_path(path)):
        # pre-r11 index without stats: one-time full-scan initialization
        # BEFORE the append (after it, the delta would double-count).
        refresh_cell_stats_from_index(spark, path, id_col, vec_col)
    fp = delta_fingerprint(new_vectors, [id_col, vec_col])
    done = read_fold_marker(path, fp)
    if done is not None:
        return {**done["report"], "replayed": True}
    best_cell = best_cell_udf(_unit(centers))
    delta = new_vectors.select(
        F.col(id_col),
        F.col(vec_col),
        best_cell(to_double_array(vec_col)).alias("cell"),
    ).localCheckpoint(eager=True)  # assign once; reused by append + stats
    # repartition on the partition key: without it the append writes
    # input_partitions × touched_cells files (thousands of KB-files per
    # daily fold at scale); with it, at most one file per cell
    incoming = incoming_delta_path(path, fp)
    delta.repartition("cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(incoming)
    publish_delta_files(incoming, path, fp)
    report = _merge_stage_and_report(
        spark,
        path,
        cell_stats(delta, vec_col),
        centers,
        mean_shift_threshold,
        imbalance_threshold,
    )
    report["delta_fingerprint"] = fp
    begin_fold_commit(path, fp, {"report": report})
    swap_in_state(_stats_path(path))
    finish_fold_commit(path, fp)
    return report


def ivfpq_index_increment(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mean_shift_threshold: float = 0.2,
    imbalance_threshold: float = 8.0,
) -> dict:
    """IVF-PQ mirror of :func:`ivf_index_increment`: assign + PQ-encode
    the new vectors under the FROZEN centroids/codebooks/rotation
    (``quantization.assign_encode_udf`` — byte-identical codes to a
    build with the same sidecars), publish ``codes/`` (cell-partitioned)
    and ``vectors/`` (re-rank payload), fold the stats, report drift.
    Same processed-delta-ledger replay/crash discipline as the IVF form;
    both append legs are cell-repartitioned so a daily fold adds at most
    one file per touched cell per leg.
    """
    from home_credit_data_engineering_spark.operators.quantization import (
        assign_encode_udf,
    )

    spark = new_vectors.sparkSession
    # two-phase guard + recovery ordering — see ivf_index_increment
    assert_layout_if_marked(path, "batch", "ivfpq")
    recover_state_swap(path)
    recover_state_swap(os.path.join(path, "_cell_stats_deltas"))
    check_state_layout(
        path, "batch", "ivfpq",
        inferred_maintainer=(
            "streamed"
            if os.path.isdir(os.path.join(path, "_cell_stats_deltas"))
            else "batch"
        ),
    )
    centers = np.load(os.path.join(path, "_centroids.npy"))
    books = np.load(os.path.join(path, "_codebooks.npy"))
    residual = bool(np.load(os.path.join(path, "_residual.npy"))[0])
    rot = _load_rotation(path)
    recover_fold_commits(path, [_stats_path(path)])
    recover_state_swap(_stats_path(path))
    if not os.path.isdir(_stats_path(path)):
        refresh_cell_stats_from_index(spark, path, id_col, vec_col)
    fp = delta_fingerprint(new_vectors, [id_col, vec_col])
    done = read_fold_marker(path, fp)
    if done is not None:
        return {**done["report"], "replayed": True}
    encode = assign_encode_udf(_unit(centers), books, rot, residual)
    enc = new_vectors.select(
        F.col(id_col),
        F.col(vec_col),
        encode(to_double_array(vec_col)).alias("__ae"),
    ).select(
        id_col,
        vec_col,
        F.col("__ae.cell").alias("cell"),
        F.col("__ae.code").alias("pq_code"),
    ).localCheckpoint(eager=True)
    # repartition on the partition key: one file per touched cell
    # instead of input_partitions × touched_cells
    codes_inc = incoming_delta_path(os.path.join(path, "codes"), fp)
    enc.select(id_col, "pq_code", "cell").repartition("cell").write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(codes_inc)
    publish_delta_files(codes_inc, os.path.join(path, "codes"), fp)
    # the re-rank payload is unpartitioned but gets the same
    # cell-repartition (then drops the key): bounded file growth —
    # ≤ touched cells files per fold instead of one per input partition
    vec_inc = incoming_delta_path(os.path.join(path, "vectors"), fp)
    enc.repartition("cell").select(id_col, vec_col).write.mode(
        "overwrite"
    ).parquet(vec_inc)
    publish_delta_files(vec_inc, os.path.join(path, "vectors"), fp)
    report = _merge_stage_and_report(
        spark,
        path,
        cell_stats(enc, vec_col, rot=rot),
        centers,
        mean_shift_threshold,
        imbalance_threshold,
    )
    report["delta_fingerprint"] = fp
    begin_fold_commit(path, fp, {"report": report})
    swap_in_state(_stats_path(path))
    finish_fold_commit(path, fp)
    return report


def tune_probes(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    probes: tuple[int, ...] = (1, 2, 4, 8),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall-vs-scan-cost frontier for a persisted IVF / IVF-PQ index —
    the ``n_probe`` analogue of the ER blocking tuner: the operator that
    turns "how many cells should we probe?" from folklore into a
    measured table.

    For a SAMPLE of query vectors (the panel is small by the query
    path's own contract) this computes exact brute-force top-k ground
    truth over the stored corpus once, then runs the index's real query
    path at each ``n_probe`` and reports:

    - ``recall_at_k`` — fraction of true top-k neighbors returned;
    - ``scan_fraction`` — mean fraction of corpus ROWS the probed cells
      actually hold (from per-cell counts, not ``n_probe/n_cells`` —
      skewed cells make those differ), i.e. the I/O cost knob at 100 TB.

    Rows sorted by ``n_probe``; pick the smallest probe count whose
    recall clears your floor. The PQ layout is auto-detected and
    measured through ``ivfpq_query_index`` (ADC + re-rank), so its
    recall reflects quantization loss too.
    """
    from home_credit_data_engineering_spark.operators.similarity import (
        brute_force_topk,
    )

    is_pq = os.path.isdir(os.path.join(index_path, "codes"))
    if is_pq:
        from home_credit_data_engineering_spark.operators.quantization import (
            ivfpq_query_index as _query,
        )

        corpus = spark.read.parquet(
            os.path.join(index_path, "vectors")
        ).select(id_col, vec_col)
        cells = spark.read.parquet(os.path.join(index_path, "codes")).select(
            F.col("cell").cast("int").alias("cell")
        )
    else:
        from home_credit_data_engineering_spark.operators.similarity import (
            ivf_query_index as _query,
        )

        data = spark.read.parquet(index_path)
        corpus = data.select(id_col, vec_col)
        cells = data.select(F.col("cell").cast("int").alias("cell"))

    centers = np.load(os.path.join(index_path, "_centroids.npy"))
    n_cells = len(centers)
    sizes = {
        int(r["cell"]): int(r["n"])
        for r in cells.groupBy("cell").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    n_corpus = sum(sizes.values())

    truth_rows = brute_force_topk(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col
    ).collect()
    truth: dict = {}
    for r in truth_rows:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    n_truth = sum(len(v) for v in truth.values())

    # per-query probe order, driver-side like the query path itself
    q_rows = queries.select(
        F.col(id_col).alias("qid"), to_double_array(vec_col).alias("v")
    ).collect()
    rot_file = os.path.join(index_path, "_rotation.npy")
    rot = np.load(rot_file) if os.path.exists(rot_file) else None
    q_mat = _unit(np.array([r["v"] for r in q_rows], dtype=np.float64))
    if rot is not None:
        q_mat = q_mat @ rot
    order = np.argsort(-(q_mat @ _unit(centers).T), axis=1, kind="stable")

    out = []
    for p_eff in sorted({min(int(x), n_cells) for x in probes}):
        got = _query(
            spark, index_path, queries, k=k,
            id_col=id_col, vec_col=vec_col, n_probe=p_eff,
        ).collect()
        hit = sum(
            1 for r in got if r["neighbor_id"] in truth.get(r["query_id"], ())
        )
        scan = float(
            np.mean(
                [
                    sum(sizes.get(int(c), 0) for c in row[:p_eff]) / n_corpus
                    for row in order
                ]
            )
            if n_corpus
            else 0.0
        )
        out.append(
            (
                p_eff,
                round(hit / n_truth, 9) if n_truth else 1.0,
                round(scan, 9),
            )
        )
    return spark.createDataFrame(
        out, "n_probe int, recall_at_k double, scan_fraction double"
    ).orderBy("n_probe")
