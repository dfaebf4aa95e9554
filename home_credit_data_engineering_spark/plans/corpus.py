"""Corpus deduplication pipeline: the operational job that turns the
dedup operators into a deduplicated dataset + removal list.

Order of stages (standard training-data practice):

1. **Exact** — md5 fingerprint groups, survivor = min id (cheapest pass
   removes the bulk; one shuffle on a 16-byte hash).
2. **Near** — MinHash-LSH verified pairs on the exact survivors only,
   clustered with large-star/small-star connected components; each
   cluster keeps its minimum id (chains A~B~C collapse to one survivor —
   pairwise removal alone under-merges).

Returns the deduplicated corpus, a ``(doc_id, reason, survivor_id)``
removal list (the audit artifact reproducibility requires), and a
stage-count report; optionally appends a JSONL run-log line
(:mod:`~home_credit_data_engineering_spark.runlog`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.dedup import (
    connected_components_star,
    exact_dedup,
    minhash_dedup,
    minhash_dedup_collapsed,
)
from home_credit_data_engineering_spark.runlog import append_run_log, timed


@dataclass
class DedupReport:
    """Operational counts of one corpus-dedup run."""

    rows_in: int = 0
    exact_removed: int = 0
    near_removed: int = 0
    rows_out: int = 0
    #: Rounds the connected-components loop took to converge — production
    #: runs alert on drift (a rising round count means the duplicate graph
    #: is growing deeper chains, or convergence is degrading).
    cc_rounds: int = 0
    stage_seconds: dict[str, float] = field(default_factory=dict)

    def as_record(self) -> dict:
        return {
            "job": "dedup_corpus",
            "rows_in": self.rows_in,
            "exact_removed": self.exact_removed,
            "near_removed": self.near_removed,
            "rows_out": self.rows_out,
            "cc_rounds": self.cc_rounds,
            "stage_seconds": dict(self.stage_seconds),
        }


def dedup_corpus(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    near_threshold: float = 0.7,
    run_log: str | None = None,
    collapse_exact: bool = False,
) -> dict:
    """Run the two-stage dedup; returns ``{"deduped", "removals",
    "report"}``.

    ``removals`` rows: (doc_id, reason ∈ {exact, near}, survivor_id).
    The heavy intermediates are persisted for the duration of the call
    (pairs feed both clustering and the removal list).

    ``collapse_exact=True`` routes the near stage through
    :func:`~..operators.dedup.minhash_dedup_collapsed` — the
    collapse-exact-first production path for duplicate-heavy corpora.
    The removal list is IDENTICAL either way (asserted in
    ``test_jobs_cli``): the exact stage already keeps one survivor per
    normalized-fingerprint group, and byte-equality refines normalized
    equality, so the near stage never sees byte-duplicates here — the
    collapse is a cheap no-op pass in this pipeline and pays off when
    the collapsed operator is fed duplicate-heavy input directly (see
    its docstring and the scaled bench). The flag exists so the
    production entry point exercises the production-posture operator,
    with its capped-bucket recall behavior, end to end.
    """
    from pyspark import StorageLevel

    report = DedupReport()
    report.rows_in = docs.count()

    with timed(report.stage_seconds, "exact"):
        groups = exact_dedup(docs, id_col, text_col)
        exact_removals = (
            groups.select(
                F.col("keep_id").alias("survivor_id"),
                F.explode("member_ids").alias(id_col),
            )
            .filter(F.col(id_col) != F.col("survivor_id"))
            .withColumn("reason", F.lit("exact"))
            .select(id_col, "reason", "survivor_id")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        report.exact_removed = exact_removals.count()
    survivors = docs.join(
        exact_removals.select(id_col), on=id_col, how="left_anti"
    ).persist(StorageLevel.MEMORY_AND_DISK)

    with timed(report.stage_seconds, "near"):
        near_op = minhash_dedup_collapsed if collapse_exact else minhash_dedup
        pairs = near_op(
            survivors,
            id_col,
            text_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_k=shingle_k,
            threshold=near_threshold,
        ).select("doc_a", "doc_b")
        cc_stats: dict = {}
        labels = connected_components_star(pairs, stats=cc_stats)
        report.cc_rounds = int(cc_stats.get("rounds", 0))
        near_removals = (
            labels.filter(F.col("node") != F.col("component"))
            .select(
                F.col("node").alias(id_col),
                F.lit("near").alias("reason"),
                F.col("component").alias("survivor_id"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        report.near_removed = near_removals.count()

    deduped = survivors.join(
        near_removals.select(id_col), on=id_col, how="left_anti"
    )
    report.rows_out = report.rows_in - report.exact_removed - report.near_removed
    removals = exact_removals.unionByName(near_removals)
    if run_log:
        append_run_log(run_log, report.as_record())
    return {"deduped": deduped, "removals": removals, "report": report}
