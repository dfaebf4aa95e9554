"""Lake-wide maintenance sweep: discover every persisted state tree,
finish its pending crash recovery, compact streamed stats deltas past
the replay window, and emit one drift/file-count report.

The lake accumulates several state families (ANN, BM25, Jaccard
prefix, containment decontamination, entity-resolution, corpus
pipeline), each with its own
recover/compact/expire entry point (``jobs/ann_index.py``,
``jobs/bm25_index.py``, ``jobs/jaccard_index.py``,
``jobs/containment_index.py``, ``jobs/entity_resolution.py``,
``jobs/corpus_pipeline.py``). An operator should not need to know which
trees exist where to run the nightly chores — ``jobs/maintenance.py
sweep --root`` walks the lake once and dispatches:

- **ANN indexes** (dir holding ``_centroids.npy``; plain IVF or IVF-PQ
  via ``codes/``; batch- or streaming-maintained via ``_layout.json``):
  finish fold-commit / state-swap recovery, fold streamed stats deltas
  older than the newest batch once more than ``compact_deltas_window``
  partitions exist, report the current drift verdict.
- **BM25 indexes** (``postings/`` + ``stats/`` legs): fold-commit /
  per-leg swap recovery, corpus-size report.
- **Exact-Jaccard prefix states** (dir holding ``_jaccard_meta.json``;
  see ``operators/jaccard_state.py``): finish stranded fold-commit
  markers (append-only legs), swap recovery, small-files compaction of
  the per-fold ``delta-*`` files once more than
  ``compact_deltas_window`` exist in a leg (ledger untouched; blocked
  by unledgered residue), bounded corpus/vocab report.
- **Containment decontamination states** (dir holding
  ``_containment_meta.json``; see ``operators/containment_state.py``):
  same discipline, but only the ``tokens`` leg ever gains delta files
  (the reference postings/sets are fixed at build).
- **Entity-resolution states** (``entities/batch=N`` snapshots):
  generic ``__next`` recovery underneath, snapshot/file report.
- **Corpus pipeline states** (two or more of the
  ``plans/corpus_pipeline.STATE_DIRS`` legs): generic recovery,
  per-leg batch/file report.

Structured-streaming checkpoint directories (``offsets/`` +
``commits/``) are recognized and skipped — their recovery belongs to
the engine, not to us. Discovery never descends into a classified tree
(an index's internal partition dirs are not independent states).

Everything here is driver-side directory walking plus the families' own
recovery helpers; the only Spark work is the cells-sized stats read for
the ANN drift verdict and the delta compaction (both bounded by
``n_cells`` × window, never data-sized).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
from pyspark.sql import SparkSession

from home_credit_data_engineering_spark.plans.corpus_pipeline import (
    STATE_DIRS as _CORPUS_LEGS,
)
from home_credit_data_engineering_spark.sources.maintenance import (
    pending_fold_commits,
    pending_state_swap,
    recover_fold_commits,
    recover_state_swap,
    staged_state_path,
)


def _swap(path: str, dry_run: bool, skip: frozenset[str] = frozenset()) -> bool:
    """Recover a swap (live) or detect one (dry-run); True if one
    was/would-be handled. ``skip`` holds paths already counted as
    walk-level orphan reports — in dry-run nothing was renamed, so the
    family sweeper would otherwise count the same pending action twice
    (live mode recovers orphans before the sweeper runs, making its
    re-check a natural no-op)."""
    if dry_run and path in skip:
        return False
    probe = pending_state_swap if dry_run else recover_state_swap
    return probe(path) is not None


def _parquet_file_count(root: str) -> int:
    n = 0
    for _dirpath, _dirnames, filenames in os.walk(root):
        n += sum(1 for f in filenames if f.endswith(".parquet"))
    return n


def _read_layout(path: str) -> dict | None:
    import json

    p = os.path.join(path, "_layout.json")
    if not os.path.isfile(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _recover_nested_swaps(
    root: str, dry_run: bool = False, skip: frozenset[str] = frozenset()
) -> int:
    """Generic recovery for families without a dedicated recovery order:
    finish/discard every ``*__next`` staged dir under ``root`` (deepest
    first, so a parent swap never renames a child's staged dir away
    before the child is recovered). ``dry_run`` counts without acting;
    ``skip`` excludes walk-level orphan reports from the count."""
    pending: list[str] = []
    for dirpath, dirnames, _files in os.walk(root):
        for d in dirnames:
            if d.endswith("__next"):
                pending.append(os.path.join(dirpath, d[: -len("__next")]))
    n = 0
    for base in sorted(pending, key=lambda p: -p.count(os.sep)):
        if _swap(base, dry_run, skip):
            n += 1
    return n


def _classify(dirnames: list[str], filenames: list[str]) -> str | None:
    names = set(dirnames)
    if {"offsets", "commits"} <= names:
        return "checkpoint"
    if "_centroids.npy" in filenames:
        return "ann"
    if "_jaccard_meta.json" in filenames:
        return "jaccard"
    if "_containment_meta.json" in filenames:
        return "containment"
    if {"postings", "stats"} <= names:
        return "bm25"
    if "entities" in names:
        return "entity"
    if len(names & set(_CORPUS_LEGS)) >= 2:
        return "corpus"
    return None


def _sweep_ann(
    spark: SparkSession,
    path: str,
    compact_deltas_window: int,
    dry_run: bool = False,
    skip: frozenset[str] = frozenset(),
) -> dict[str, Any]:
    from home_credit_data_engineering_spark.operators.ann_state import (
        _stats_path,
        drift_report,
        read_cell_stats,
    )
    from home_credit_data_engineering_spark.streaming.ann import (
        _compact_deltas,
        _delta_batch_ids,
        _deltas_path,
        read_streaming_cell_stats,
    )

    layout = _read_layout(path)
    deltas = _deltas_path(path)
    recovered = 0
    # root/deltas recovery FIRST: a died compaction/rebuild must finish
    # before anything (layout inference included) trusts the live dirs
    recovered += _swap(path, dry_run, skip)
    recovered += _swap(deltas, dry_run, skip)
    for sub in ("codes", "vectors"):
        p = os.path.join(path, sub)
        if os.path.isdir(p) or os.path.isdir(staged_state_path(p)):
            recovered += _swap(p, dry_run, skip)
    streamed = (
        layout["maintainer"] == "streamed"
        if layout
        else os.path.isdir(deltas)
    )
    kind = (
        layout["kind"]
        if layout
        else ("ivfpq" if os.path.isdir(os.path.join(path, "codes")) else "ivf")
    )
    compacted: tuple[int, int] | None = None
    would_compact: int | None = None
    if streamed:
        ids = _delta_batch_ids(deltas)
        if len(ids) > compact_deltas_window:
            if dry_run:
                would_compact = len(ids)
            else:
                _compact_deltas(spark, path, max(ids))
                compacted = (len(ids), len(_delta_batch_ids(deltas)))
        # a stream that died between bootstrap and its first stats
        # delta leaves no deltas dir — report empty stats, don't abort.
        # Dry-run with pending recovery: the live dirs may be mid-swap —
        # skip the data read rather than trust an unrecovered tree.
        rows = (
            read_streaming_cell_stats(spark, path).collect()
            if os.path.isdir(deltas) and not (dry_run and recovered)
            else []
        )
    else:
        if dry_run:
            # a pending fold commit's own leg swap is the SAME recovery
            # action — counting both would report 2 where the live
            # sweep performs (and reports) 1
            pend_folds = bool(pending_fold_commits(path))
            recovered += pend_folds
            if not pend_folds:
                recovered += _swap(_stats_path(path), True, skip)
        else:
            recovered += bool(
                recover_fold_commits(path, [_stats_path(path)])
            )
            recovered += recover_state_swap(_stats_path(path)) is not None
        rows = (
            read_cell_stats(spark, path).collect()
            if os.path.isdir(_stats_path(path))
            and not (dry_run and recovered)
            else []
        )
    centers = np.load(os.path.join(path, "_centroids.npy"))
    rep = drift_report(rows, centers)
    out: dict[str, Any] = {
        "family": "ann",
        "kind": kind,
        "maintainer": "streamed" if streamed else "batch",
        "path": path,
        "parquet_files": _parquet_file_count(path),
        "recovered": int(recovered),
        "n_vectors": rep["n_vectors"],
        "n_cells": rep["n_cells"],
        "max_mean_shift": rep["max_mean_shift"],
        "size_imbalance": rep["size_imbalance"],
        "rebuild_recommended": rep["rebuild_recommended"],
    }
    if compacted:
        out["deltas_compacted"] = {
            "before": compacted[0], "after": compacted[1]
        }
    if would_compact is not None:
        out["would_compact_deltas"] = {
            "batches": would_compact, "window": compact_deltas_window
        }
    return out


def _sweep_bm25(
    spark: SparkSession,
    path: str,
    dry_run: bool = False,
    skip: frozenset[str] = frozenset(),
) -> dict[str, Any]:
    from pyspark.sql import functions as F

    layout = _read_layout(path)
    recovered = 0
    pend_folds = False
    if layout and layout["maintainer"] == "batch":
        if dry_run:
            pend_folds = bool(pending_fold_commits(path))
            recovered += pend_folds
        else:
            recovered += bool(
                recover_fold_commits(
                    path,
                    [os.path.join(path, "df"), os.path.join(path, "stats")],
                )
            )
    for leg in ("postings", "df", "doclens", "stats"):
        # a pending fold's own swap legs (df/stats) are part of the fold
        # recovery action — don't double-count them in dry-run
        if pend_folds and leg in ("df", "stats"):
            continue
        recovered += _swap(os.path.join(path, leg), dry_run, skip)
    stats_dir = os.path.join(path, "stats")
    streamed_shape = any(
        d.startswith("batch=")
        for d in (os.listdir(stats_dir) if os.path.isdir(stats_dir) else ())
    )
    # dry-run with pending recovery: don't read a mid-swap stats leg
    row = (
        spark.read.parquet(stats_dir)
        .agg(F.sum("n_docs").alias("n"), F.sum("total_dl").alias("t"))
        .first()
        if not (dry_run and recovered)
        else {"n": 0, "t": 0.0}
    )
    n_docs = float(row["n"] or 0.0)
    return {
        "family": "bm25",
        "kind": "bm25",
        "maintainer": (
            layout["maintainer"]
            if layout
            else ("streamed" if streamed_shape else "batch")
        ),
        "path": path,
        "parquet_files": _parquet_file_count(path),
        "recovered": int(recovered),
        "n_docs": int(n_docs),
        "avgdl": (float(row["t"]) / n_docs) if n_docs else 0.0,
        "batches": (
            sum(
                1 for d in os.listdir(stats_dir) if d.startswith("batch=")
            )
            if streamed_shape
            else None
        ),
    }


def _sweep_prefix_state(
    spark: SparkSession,
    path: str,
    family: str,
    swap_legs: tuple[str, ...],
    growing_legs: tuple[str, ...],
    report_fn,
    body_keys: tuple[str, ...],
    compact_deltas_window: int = 16,
    dry_run: bool = False,
    skip: frozenset[str] = frozenset(),
    reconcile_orphans: bool = False,
) -> dict[str, Any]:
    """Shared sweeper for the ledger-fold prefix-state families
    (exact-Jaccard, containment): recovery, opt-in orphan
    reconciliation, small-files compaction of the growing legs, bounded
    report. One policy implementation — the jaccard/containment
    sweepers differ only in legs, report body, and family tag.
    """
    from home_credit_data_engineering_spark.sources.maintenance import (
        compact_ledgered_legs,
        delta_file_count,
        reconcile_orphan_delta_files,
    )

    recovered = 0
    recovered += _swap(path, dry_run, skip)
    if dry_run:
        recovered += bool(pending_fold_commits(path))
        if reconcile_orphans:
            recovered += bool(
                reconcile_orphan_delta_files(path, growing_legs, dry_run=True)
            )
    else:
        # append-only legs: a stranded marker just finishes (the fold's
        # publishes were complete before the marker was created); then -
        # ONLY on request - residue of ABANDONED fingerprints (pre-marker
        # crash whose delta was amended) is swept out. Orphan
        # reconciliation is opt-in (--reconcile) because a fold IN FLIGHT
        # between publish_delta_files and begin_fold_commit looks exactly
        # like residue: a concurrent sweep would delete its just-published
        # delta files and the fold would then commit a marker over missing
        # rows - silent permanent state loss. The maintainer's own startup
        # path reconciles safely under the single-maintainer contract; run
        # the sweep with --reconcile only when no fold is in flight.
        recovered += bool(recover_fold_commits(path, []))
        if reconcile_orphans:
            recovered += bool(
                reconcile_orphan_delta_files(path, growing_legs)
            )
    for leg in swap_legs:
        recovered += _swap(os.path.join(path, leg), dry_run, skip)
    # small-files compaction: every fold publishes delta-{fp}-N.parquet
    # into the growing legs forever; past the window, rewrite them
    # through the staged swap (ledger untouched - replays still no-op).
    # Blocked by unledgered residue unless the sweep also reconciles it -
    # baking a crashed half-publish into the base would be permanent.
    compacted: dict[str, Any] | None = None
    would_compact: int | None = None
    blocked = False
    n_delta = delta_file_count(path, growing_legs)
    if n_delta > compact_deltas_window:
        if dry_run:
            if reconcile_orphans:
                # count what a live --reconcile sweep would actually
                # compact: the ledgered files left AFTER reconciliation
                # (counting orphans would overstate the promise)
                would_compact = delta_file_count(
                    path, growing_legs, ledgered_only=True
                )
                if would_compact <= compact_deltas_window:
                    would_compact = None
            elif not reconcile_orphan_delta_files(
                path, growing_legs, dry_run=True
            ):
                would_compact = n_delta
            else:
                blocked = True
        else:
            rep = compact_ledgered_legs(spark, path, growing_legs)
            if "skipped" in rep:
                blocked = True
            else:
                compacted = {
                    "before": n_delta,
                    "after": delta_file_count(path, growing_legs),
                }
    body: dict[str, Any] = {}
    if not (dry_run and recovered):
        body = report_fn(spark, path)
    out: dict[str, Any] = {
        "family": family,
        "path": path,
        "parquet_files": _parquet_file_count(path),
        "recovered": int(recovered),
        "threshold": body.get("threshold"),
    }
    for key in body_keys:
        out[key] = body.get(key)
    if compacted is not None:
        out["deltas_compacted"] = compacted
    if would_compact is not None:
        out["would_compact_deltas"] = {
            "files": would_compact,
            "window": compact_deltas_window,
        }
    if blocked:
        out["compaction_blocked_by_orphans"] = True
    return out


def _sweep_jaccard(
    spark: SparkSession,
    path: str,
    compact_deltas_window: int = 16,
    dry_run: bool = False,
    skip: frozenset[str] = frozenset(),
    reconcile_orphans: bool = False,
) -> dict[str, Any]:
    from home_credit_data_engineering_spark.operators.jaccard_state import (
        jaccard_state_report,
    )

    return _sweep_prefix_state(
        spark,
        path,
        "jaccard",
        ("prefixes", "tokens"),
        ("prefixes", "tokens"),
        jaccard_state_report,
        ("n_docs", "n_prefix_rows", "n_tokens"),
        compact_deltas_window,
        dry_run,
        skip,
        reconcile_orphans,
    )


def _sweep_containment(
    spark: SparkSession,
    path: str,
    compact_deltas_window: int = 16,
    dry_run: bool = False,
    skip: frozenset[str] = frozenset(),
    reconcile_orphans: bool = False,
) -> dict[str, Any]:
    # only the tokens leg gains delta files (postings/ref_sets are fixed
    # at build), so reconciliation and compaction target it alone
    from home_credit_data_engineering_spark.operators.containment_state import (
        GROWING_LEGS,
        containment_state_report,
    )

    return _sweep_prefix_state(
        spark,
        path,
        "containment",
        ("postings", "ref_sets", "tokens"),
        GROWING_LEGS,
        containment_state_report,
        ("n_refs", "n_postings", "n_tokens"),
        compact_deltas_window,
        dry_run,
        skip,
        reconcile_orphans,
    )



def _sweep_entity(
    path: str, dry_run: bool = False, skip: frozenset[str] = frozenset()
) -> dict[str, Any]:
    # recover FIRST so the snapshot/file report reflects the tree the
    # sweep leaves behind, not the pre-recovery state
    recovered = _recover_nested_swaps(path, dry_run, skip)
    entities = os.path.join(path, "entities")
    snaps = sorted(
        int(d.split("=", 1)[1])
        for d in (os.listdir(entities) if os.path.isdir(entities) else ())
        if d.startswith("batch=")
    )
    return {
        "family": "entity",
        "path": path,
        "parquet_files": _parquet_file_count(path),
        "recovered": recovered,
        "snapshots": len(snaps),
        "latest_batch": snaps[-1] if snaps else None,
    }


def _sweep_corpus(
    path: str, dry_run: bool = False, skip: frozenset[str] = frozenset()
) -> dict[str, Any]:
    # recover FIRST so the per-leg report reflects the recovered tree
    recovered = _recover_nested_swaps(path, dry_run, skip)
    legs = {}
    for leg in _CORPUS_LEGS:
        p = os.path.join(path, leg)
        if os.path.isdir(p):
            legs[leg] = {
                "batches": sum(
                    1
                    for d in os.listdir(p)
                    if os.path.isdir(os.path.join(p, d))
                    and not d.endswith("__next")
                ),
                "parquet_files": _parquet_file_count(p),
            }
    return {
        "family": "corpus",
        "path": path,
        "parquet_files": _parquet_file_count(path),
        "recovered": recovered,
        "legs": legs,
    }


def sweep_lake(
    spark: SparkSession,
    root: str,
    compact_deltas_window: int = 16,
    dry_run: bool = False,
    reconcile_orphans: bool = False,
) -> list[dict[str, Any]]:
    """Walk ``root``, recover + compact + report every state tree found.

    Returns one dict per tree (see the module doc for the families).
    Run with any maintaining streams STOPPED — the streamed-delta
    compaction has the same contract as ``compact_streamed_ann_index``.

    ``dry_run`` mutates NOTHING: each report's ``recovered`` counts the
    actions recovery WOULD take (pending swaps / fold commits), delta
    compaction reports ``would_compact_deltas`` instead of folding, and
    data reads are skipped on trees with pending recovery (a mid-swap
    leg is not safe to read). Orphan root swaps report action
    ``"would-finish"`` / ``"would-discard"``.

    ``reconcile_orphans`` additionally sweeps abandoned-fingerprint
    delta residue out of prefix-state trees. OFF by default: published
    delta files of a fold in flight (between publish and marker) are
    indistinguishable from residue, so this is only safe when no fold
    is running anywhere in the lake (see ``_sweep_jaccard``).
    """
    reports: list[dict[str, Any]] = []
    for dirpath, dirnames, filenames in os.walk(root):
        # a state tree that died mid ROOT swap exists only as X__next
        # (the live dir is gone) — finish/discard it BEFORE classifying,
        # and report it, else the sweep would silently skip exactly the
        # crashed tree it exists to mop up
        orphans = [
            d[: -len("__next")]
            for d in dirnames
            if d.endswith("__next") and d[: -len("__next")] not in dirnames
        ]
        for base in orphans:
            full = os.path.join(dirpath, base)
            if dry_run:
                action = "would-" + (pending_state_swap(full) or "")
            else:
                action = recover_state_swap(full)
                if action == "finished":
                    dirnames.append(base)  # classify the recovered tree
            reports.append(
                {
                    "family": "orphan-swap",
                    "path": full,
                    "parquet_files": (
                        _parquet_file_count(full) if action == "finished" else 0
                    ),
                    "recovered": 1,
                    "action": action,
                }
            )
        # dry-run leaves orphan staged dirs in place, so the family
        # sweeper below would re-detect (and re-count) them — exclude
        # what this walk level already reported
        skip = (
            frozenset(os.path.join(dirpath, b) for b in orphans)
            if dry_run
            else frozenset()
        )
        kind = _classify(dirnames, filenames)
        if kind == "checkpoint":
            dirnames[:] = []
            continue
        if kind == "ann":
            reports.append(
                _sweep_ann(
                    spark, dirpath, compact_deltas_window, dry_run, skip
                )
            )
        elif kind == "jaccard":
            reports.append(
                _sweep_jaccard(
                    spark,
                    dirpath,
                    compact_deltas_window,
                    dry_run,
                    skip,
                    reconcile_orphans,
                )
            )
        elif kind == "containment":
            reports.append(
                _sweep_containment(
                    spark,
                    dirpath,
                    compact_deltas_window,
                    dry_run,
                    skip,
                    reconcile_orphans,
                )
            )
        elif kind == "bm25":
            reports.append(_sweep_bm25(spark, dirpath, dry_run, skip))
        elif kind == "entity":
            reports.append(_sweep_entity(dirpath, dry_run, skip))
        elif kind == "corpus":
            reports.append(_sweep_corpus(dirpath, dry_run, skip))
        if kind is not None:
            dirnames[:] = []
            continue
        dirnames[:] = [
            d
            for d in dirnames
            if not d.startswith(("_", "."))
            and "=" not in d
            and not d.endswith("__next")
        ]
    return sorted(reports, key=lambda r: r["path"])
