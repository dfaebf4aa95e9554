"""Persisted EXACT-Jaccard prefix state as a maintained index family.

``operators/dedup.py:jaccard_join_increment`` defines the O(Δ) math
(frozen-token-order prefix state); this module gives that state the same
operational discipline as the ANN/BM25 index trees
(``operators/ann_state.py``, ``operators/retrieval.py``):

- a persisted tree ``{root}/prefixes`` + ``{root}/tokens`` with a
  ``_layout.json`` maintainer marker and a ``_jaccard_meta.json``
  sidecar pinning the SEMANTIC parameters (threshold, shingle_k, id and
  text column names) — an increment can never silently fold under
  different join semantics than the state was built with;
- **replay-idempotent folds** via the processed-delta ledger
  (``sources/maintenance.py``): the delta is identified by a content
  fingerprint, both state legs are APPEND-ONLY and published under
  deterministic ``delta-{fp}-N.parquet`` names (a crashed half-publish
  is overwritten, not duplicated), and the fold commits under the
  two-state ``{fp}.committing → {fp}`` marker. Re-running a completed
  fold is a byte-level no-op; every crash point either replays the
  whole fold or completes it.

Unlike the ANN fold there are NO read-modify-write sidecar legs — both
legs only ever gain rows (stored prefixes stay valid forever by the
frozen-order argument; the token leg gains only first-seen tokens) —
so the ledger marker alone makes the fold atomic: it is created only
after both publishes are complete.

No reference counterpart (the reference has no similarity-join state);
this is north-star extension surface, the ``jobs/ann_index.py``
maintenance discipline applied to the newest state family. The
lake-wide sweep (``sources/sweep.py``) classifies these trees by their
meta sidecar and recovers/reports them like the other families.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.dedup import (
    jaccard_join_increment,
    jaccard_join_state,
)
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
    unpublish_delta_files,
    write_state_layout,
)

META_NAME = "_jaccard_meta.json"


def _prefixes_path(root: str) -> str:
    return os.path.join(root, "prefixes")


def _tokens_path(root: str) -> str:
    return os.path.join(root, "tokens")


def _meta_path(root: str) -> str:
    return os.path.join(root, META_NAME)


def read_jaccard_meta(root: str) -> dict:
    """The pinned semantic parameters of a state tree (raises on a tree
    that was never built by :func:`write_jaccard_state`)."""
    with open(_meta_path(root)) as fh:
        return json.load(fh)


def write_jaccard_state(
    docs: DataFrame,
    root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> dict:
    """Build and persist the initial prefix state over the accepted
    corpus. Returns ``{"n_prefix_rows", "n_tokens"}``."""
    state = jaccard_join_state(
        docs, id_col, text_col, threshold=threshold, shingle_k=shingle_k
    )
    state["prefixes"].write.mode("overwrite").parquet(_prefixes_path(root))
    state["tokens"].write.mode("overwrite").parquet(_tokens_path(root))
    write_state_layout(root, "batch", "jaccard")
    tmp = _meta_path(root) + ".__tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {
                "threshold": threshold,
                "shingle_k": shingle_k,
                "id_col": id_col,
                "text_col": text_col,
                "version": 1,
            },
            fh,
        )
    os.replace(tmp, _meta_path(root))
    spark = docs.sparkSession
    return {
        "n_prefix_rows": spark.read.parquet(_prefixes_path(root)).count(),
        "n_tokens": spark.read.parquet(_tokens_path(root)).count(),
    }


def reconcile_orphan_deltas(root: str, dry_run: bool = False) -> int:
    """Remove (or in ``dry_run`` count) abandoned-fingerprint delta
    residue from both legs (see
    ``sources/maintenance.py:reconcile_orphan_delta_files`` — run only
    with no fold in flight)."""
    from home_credit_data_engineering_spark.sources.maintenance import (
        reconcile_orphan_delta_files,
    )

    return reconcile_orphan_delta_files(
        root, ("prefixes", "tokens"), dry_run
    )


def jaccard_state_increment(
    new_docs: DataFrame,
    root: str,
    all_texts: DataFrame,
    output_pairs: str | None = None,
    collapse_exact: bool = False,
    strict_replay_pairs: bool = True,
) -> dict:
    """One replay-idempotent fold of a delta into a persisted state tree.

    Semantic parameters come from the tree's pinned meta — never from
    the caller (folding under a different threshold/shingle order would
    silently corrupt candidate completeness). Returns
    ``{"pairs", "report", "replayed"}``: ``pairs`` is the verified
    delta-touching pair frame (eagerly materialized BEFORE the state
    appends so its plan cannot re-read the state it is about to grow),
    ``None`` on a replayed (already-completed) fold, whose saved report
    is returned instead.

    ``output_pairs``: persist the pair frame to this parquet path AS
    PART OF the fold, BEFORE the ledger marker commits — a caller-side
    write after the fold returns would sit past the commit point, so a
    crash there would strand a completed marker with the pairs lost to
    replay. The path is recorded in the fold report. On a REPLAYED fold
    the pairs cannot be regenerated (the state already contains the
    delta), so if ``output_pairs`` is requested but the completed fold
    never persisted pairs there — or the recorded file is gone — the
    call RAISES instead of returning a 0-exit whose promised output
    does not exist (scripted callers assume the path after success).
    ``strict_replay_pairs=False`` downgrades that raise to the plain
    replayed no-op return: the streaming maintainer
    (``streaming/jaccard.py``) EXPECTS content-duplicate batches under
    new batch ids to replay without writing their per-batch pairs path
    — by design, the pairs were already produced — and a raise there
    would kill the query instead.

    ``collapse_exact`` folds boilerplate-heavy deltas through the
    collapse-exact-first path (``jaccard_join_increment`` docstring):
    pairs and state appends are bit-identical; the report's
    ``candidate_pairs``/``n_groups``/``n_docs`` record the measured
    candidate cut. NOTE: the delta fingerprint is content-based, so a
    collapsed and a direct fold of the same delta share one ledger
    marker — as they must, since their effects are identical.
    """
    spark = new_docs.sparkSession
    # layout guard + recovery ordering (the ann_state discipline):
    # explicit marker mismatch raises before anything touches the tree;
    # then root recovery; then stranded fold markers finish (append-only
    # legs: the publishes were complete before the marker existed);
    # then orphan residue of ABANDONED fingerprints is swept out.
    assert_layout_if_marked(root, "batch", "jaccard")
    recover_state_swap(root)
    recover_fold_commits(root, [])
    # a compaction (compact_jaccard_state) that died mid leg-swap leaves
    # either a discardable staged dir or a finished-but-unrenamed one —
    # recover both legs before reading them
    for leg in (_prefixes_path(root), _tokens_path(root)):
        recover_state_swap(leg)
    reconcile_orphan_deltas(root)
    check_state_layout(root, "batch", "jaccard")
    meta = read_jaccard_meta(root)
    id_col, text_col = meta["id_col"], meta["text_col"]

    fp = delta_fingerprint(new_docs, [id_col, text_col])
    done = read_fold_marker(root, fp)
    if done is not None:
        if output_pairs is not None and strict_replay_pairs:
            recorded = done["report"].get("output_pairs")
            if recorded != output_pairs or not os.path.isdir(recorded):
                raise RuntimeError(
                    f"fold {fp} already completed "
                    + (
                        f"with pairs at {recorded!r}"
                        if recorded
                        else "without persisting pairs"
                    )
                    + f"; cannot produce {output_pairs!r} on replay — the "
                    "state already contains this delta, so the "
                    "delta-touching pairs are not regenerable"
                )
        return {"pairs": None, "report": done["report"], "replayed": True}

    # Un-publish any half-published files from a crashed earlier attempt
    # of THIS delta before recomputing: unlike the ANN fold (whose cell
    # assignment is state-independent), the increment READS the legs it
    # appends to — a partial publish would make the delta's own rows
    # look like accepted state (self-pairs, wrong new-token detection).
    for leg in (_prefixes_path(root), _tokens_path(root)):
        unpublish_delta_files(leg, fp)

    stats: dict = {}
    inc = jaccard_join_increment(
        new_docs,
        spark.read.parquet(_prefixes_path(root)),
        spark.read.parquet(_tokens_path(root)),
        all_texts,
        id_col,
        text_col,
        threshold=meta["threshold"],
        shingle_k=meta["shingle_k"],
        collapse_exact=collapse_exact,
        stats=stats,
    )
    # materialize pairs BEFORE publishing the appends: the pair plan
    # reads the state parquet lazily, and an executed-after-append scan
    # would see the delta's own prefix rows as accepted state
    pairs = inc["pairs"].localCheckpoint(eager=True)
    if output_pairs:
        # inside the fold, before the marker: a crash after this write
        # replays the whole fold (overwrite converges); a crash after
        # the marker finds the pairs already durable
        pairs.write.mode("overwrite").parquet(output_pairs)

    incoming = incoming_delta_path(root, fp)
    inc["new_prefixes"].write.mode("overwrite").parquet(
        os.path.join(incoming, "prefixes")
    )
    inc["new_tokens"].write.mode("overwrite").parquet(
        os.path.join(incoming, "tokens")
    )
    n_files = publish_delta_files(
        os.path.join(incoming, "prefixes"), _prefixes_path(root), fp
    )
    n_files += publish_delta_files(
        os.path.join(incoming, "tokens"), _tokens_path(root), fp
    )
    import shutil

    shutil.rmtree(incoming, ignore_errors=True)  # staging skeleton
    report = {
        "delta_fingerprint": fp,
        "n_pairs": pairs.count(),
        "n_new_prefix_rows": inc["new_prefixes"].count(),
        "n_new_tokens": inc["new_tokens"].count(),
        "files_published": n_files,
        # fan-out observability: candidate pairs the prefix+length
        # filters let through (rep-level when collapsing — the measured
        # candidate cut of the collapse-exact-first path)
        "candidate_pairs": stats.get("candidate_pairs"),
    }
    if collapse_exact:
        report["collapsed"] = {
            "n_groups": stats.get("n_groups"),
            "n_docs": stats.get("n_docs"),
        }
    if output_pairs:
        report["output_pairs"] = output_pairs
    # both append-only legs are fully published — the marker commits
    begin_fold_commit(root, fp, {"report": report})
    finish_fold_commit(root, fp)
    return {"pairs": pairs, "report": report, "replayed": False}


def compact_jaccard_state(
    spark: SparkSession, root: str, target_files: int = 4
) -> dict:
    """Rewrite both append-only legs to a bounded file count — every
    fold publishes ``delta-{fp}-N.parquet`` files into ``prefixes/`` and
    ``tokens/`` forever, the classic small-files regression. Ledger
    markers stay (a replayed fold still no-ops); run with NO fold in
    flight; refuses on unledgered residue (see
    ``sources/maintenance.py:compact_ledgered_legs``)."""
    from home_credit_data_engineering_spark.sources.maintenance import (
        compact_ledgered_legs,
    )

    assert_layout_if_marked(root, "batch", "jaccard")
    recover_state_swap(root)
    recover_fold_commits(root, [])
    for leg in (_prefixes_path(root), _tokens_path(root)):
        recover_state_swap(leg)
    check_state_layout(root, "batch", "jaccard")
    return compact_ledgered_legs(
        spark, root, ("prefixes", "tokens"), target_files
    )


def jaccard_state_report(spark: SparkSession, root: str) -> dict:
    """Bounded state summary (one aggregate per leg + the meta sidecar)
    — the sweep's report body."""
    meta = read_jaccard_meta(root)
    prow = (
        spark.read.parquet(_prefixes_path(root))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct("doc_id").alias("docs"),
        )
        .first()
    )
    return {
        "threshold": meta["threshold"],
        "shingle_k": meta["shingle_k"],
        "n_prefix_rows": prow["rows"],
        "n_tokens": spark.read.parquet(_tokens_path(root)).count(),
        "n_docs": prow["docs"],
    }
