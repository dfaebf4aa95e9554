"""Persisted EXACT-containment decontamination state as a maintained
index family.

``operators/dedup.py:containment_join_increment`` defines the O(Δ) math
(fully-indexed fixed reference + frozen probe-token frequency order);
this module gives that state the ``operators/jaccard_state.py``
operational discipline — and exploits the family's defining asymmetry:

- the REFERENCE (benchmark suite) is FIXED: its postings and
  verification sets are built once and never gain a row (a changed
  benchmark suite is a rebuild, not a fold);
- only the PROBE corpus grows, and probe docs never pair with each
  other — so the ONLY growing leg is the vocabulary-sized ``tokens``
  frequency order, and a fold needs no ``all_texts`` contract at all
  (the delta carries its own verification sets; the reference's are
  persisted).

Tree layout: ``{root}/postings`` + ``{root}/ref_sets`` (fixed) +
``{root}/tokens`` (append-only) with a ``_layout.json`` maintainer
marker and a ``_containment_meta.json`` sidecar pinning the SEMANTIC
parameters (threshold, shingle_k, id/text column names). Folds are
replay-idempotent via the processed-delta ledger
(``sources/maintenance.py``): content-fingerprinted deltas,
deterministic ``delta-{fp}-N.parquet`` publishes, two-state
``{fp}.committing → {fp}`` marker commits, small-files compaction of
the tokens leg through ``compact_ledgered_legs``. The lake-wide sweep
(``sources/sweep.py``) classifies these trees by their meta sidecar.

No reference counterpart (the reference engine has no decontamination
state); north-star extension surface — the nightly benchmark-
decontamination job over a growing training corpus.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.dedup import (
    containment_join_increment,
    containment_reference_state,
)
from home_credit_data_engineering_spark.sources.maintenance import (
    assert_layout_if_marked,
    begin_fold_commit,
    check_state_layout,
    compact_ledgered_legs,
    delta_fingerprint,
    finish_fold_commit,
    incoming_delta_path,
    publish_delta_files,
    read_fold_marker,
    reconcile_orphan_delta_files,
    recover_fold_commits,
    recover_state_swap,
    unpublish_delta_files,
    write_state_layout,
)

META_NAME = "_containment_meta.json"

#: the only leg folds append to (postings/ref_sets are fixed at build)
GROWING_LEGS = ("tokens",)


def _postings_path(root: str) -> str:
    return os.path.join(root, "postings")


def _ref_sets_path(root: str) -> str:
    return os.path.join(root, "ref_sets")


def _tokens_path(root: str) -> str:
    return os.path.join(root, "tokens")


def _meta_path(root: str) -> str:
    return os.path.join(root, META_NAME)


def read_containment_meta(root: str) -> dict:
    """The pinned semantic parameters of a state tree (raises on a tree
    that was never built by :func:`write_containment_state`)."""
    with open(_meta_path(root)) as fh:
        return json.load(fh)


def write_containment_state(
    reference: DataFrame,
    root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_k: int = 3,
) -> dict:
    """Build and persist the decontamination state over the FIXED
    reference corpus. Returns ``{"n_refs", "n_postings", "n_tokens"}``."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    state = containment_reference_state(
        reference, id_col, text_col, shingle_k=shingle_k
    )
    state["postings"].write.mode("overwrite").parquet(_postings_path(root))
    state["ref_sets"].write.mode("overwrite").parquet(_ref_sets_path(root))
    state["tokens"].write.mode("overwrite").parquet(_tokens_path(root))
    write_state_layout(root, "batch", "containment")
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
    spark = reference.sparkSession
    row = (
        spark.read.parquet(_postings_path(root))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("ref_id").alias("refs"),
        )
        .first()
    )
    return {
        "n_refs": row["refs"],
        "n_postings": row["n"],
        "n_tokens": spark.read.parquet(_tokens_path(root)).count(),
    }


def containment_state_increment(
    new_probe: DataFrame,
    root: str,
    output_pairs: str | None = None,
    strict_replay_pairs: bool = True,
    collapse_exact: bool = False,
) -> dict:
    """One replay-idempotent fold of a probe delta against the persisted
    reference state.

    Semantic parameters come from the tree's pinned meta — never from
    the caller. Returns ``{"pairs", "report", "replayed"}``; ``pairs``
    is the verified (probe_id, ref_id, containment) frame, eagerly
    materialized BEFORE the tokens append (its plan reads the token
    state lazily). The report carries the fold's candidate fan-out
    (``candidate_pairs`` vs ``brute_force_pairs``) — the prefix
    filter's scale-risk observability.

    ``output_pairs`` follows the ``jaccard_state_increment`` contract:
    written INSIDE the fold before the marker commits; a replayed fold
    that never persisted the requested path RAISES
    (``strict_replay_pairs=False`` downgrades to the plain replayed
    no-op — the streaming-maintainer contract).

    ``collapse_exact`` folds boilerplate-heavy deltas through the
    collapse-exact-first discipline (pairs and token appends
    bit-identical to the direct fold — see
    ``dedup.containment_join_increment``); the report gains a
    ``collapsed`` block with the measured group structure.
    """
    spark = new_probe.sparkSession
    # layout guard + recovery ordering (the jaccard_state discipline)
    assert_layout_if_marked(root, "batch", "containment")
    recover_state_swap(root)
    recover_fold_commits(root, [])
    for leg in (_postings_path(root), _ref_sets_path(root), _tokens_path(root)):
        recover_state_swap(leg)
    reconcile_orphan_delta_files(root, GROWING_LEGS)
    check_state_layout(root, "batch", "containment")
    meta = read_containment_meta(root)
    id_col, text_col = meta["id_col"], meta["text_col"]

    fp = delta_fingerprint(new_probe, [id_col, text_col])
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
                    "state already contains this delta's tokens, so the "
                    "fold is not re-runnable"
                )
        return {"pairs": None, "report": done["report"], "replayed": True}

    # un-publish any half-published files from a crashed earlier attempt
    # of THIS delta before recomputing: the increment READS the tokens
    # leg it appends to — a partial publish would make the delta's own
    # first-seen tokens look like frozen state frequencies
    unpublish_delta_files(_tokens_path(root), fp)

    stats: dict = {}
    inc = containment_join_increment(
        new_probe,
        spark.read.parquet(_postings_path(root)),
        spark.read.parquet(_tokens_path(root)),
        spark.read.parquet(_ref_sets_path(root)),
        id_col,
        text_col,
        threshold=meta["threshold"],
        shingle_k=meta["shingle_k"],
        collapse_exact=collapse_exact,
        stats=stats,
    )
    # materialize pairs BEFORE publishing the token appends (lazy plan
    # reads the token state; see jaccard_state_increment)
    pairs = inc["pairs"].localCheckpoint(eager=True)
    if output_pairs:
        pairs.write.mode("overwrite").parquet(output_pairs)

    incoming = incoming_delta_path(root, fp)
    inc["new_tokens"].write.mode("overwrite").parquet(
        os.path.join(incoming, "tokens")
    )
    n_files = publish_delta_files(
        os.path.join(incoming, "tokens"), _tokens_path(root), fp
    )
    import shutil

    shutil.rmtree(incoming, ignore_errors=True)  # staging skeleton
    report = {
        "delta_fingerprint": fp,
        "n_pairs": pairs.count(),
        "n_new_tokens": inc["new_tokens"].count(),
        "files_published": n_files,
        "candidate_pairs": stats.get("candidate_pairs"),
        "brute_force_pairs": stats.get("brute_force_pairs"),
    }
    if collapse_exact:
        report["collapsed"] = {
            "n_groups": stats.get("n_groups"),
            "n_docs": stats.get("n_docs"),
        }
    if output_pairs:
        report["output_pairs"] = output_pairs
    # the single append-only leg is fully published — the marker commits
    begin_fold_commit(root, fp, {"report": report})
    finish_fold_commit(root, fp)
    return {"pairs": pairs, "report": report, "replayed": False}


def compact_containment_state(
    spark: SparkSession, root: str, target_files: int = 4
) -> dict:
    """Rewrite the tokens leg to a bounded file count (the only leg
    folds append to); ledger markers stay, replays still no-op; refuses
    on unledgered residue (see ``compact_ledgered_legs``)."""
    assert_layout_if_marked(root, "batch", "containment")
    recover_state_swap(root)
    recover_fold_commits(root, [])
    for leg in (_postings_path(root), _ref_sets_path(root), _tokens_path(root)):
        recover_state_swap(leg)
    check_state_layout(root, "batch", "containment")
    return compact_ledgered_legs(spark, root, GROWING_LEGS, target_files)


def containment_state_report(spark: SparkSession, root: str) -> dict:
    """Bounded state summary (one aggregate per leg + the meta sidecar)
    — the sweep's report body."""
    meta = read_containment_meta(root)
    row = (
        spark.read.parquet(_postings_path(root))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.countDistinct("ref_id").alias("refs"),
        )
        .first()
    )
    return {
        "threshold": meta["threshold"],
        "shingle_k": meta["shingle_k"],
        "n_refs": row["refs"],
        "n_postings": row["rows"],
        "n_tokens": spark.read.parquet(_tokens_path(root)).count(),
    }
