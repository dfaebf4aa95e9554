"""Streaming maintenance of the containment decontamination state.

Same shape as ``streaming/jaccard.py``: the containment family's
content-fingerprint ledger is already the replay-idempotence mechanism
(append-only ``delta-{fp}`` token files, marker-only commits), so the
streaming maintainer is simply the batch fold driven by
``foreachBatch`` — a micro-batch redelivered after a crash (same
content → same fingerprint) is a committed no-op, with no ``(batch)``
partition machinery and no layout conflict. foreachBatch runs
micro-batches serially, which satisfies the fold's single-maintainer
contract.

The streaming shape is even simpler than the Jaccard one: there is no
``all_texts`` contract at all — the reference's verification sets are
persisted in the tree and each micro-batch carries its own probe
texts. This is the production decontamination tap: training documents
stream past a fixed benchmark suite, and every batch's contaminated
(probe_id, ref_id, containment) pairs land durably before the fold
commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from home_credit_data_engineering_spark.operators.containment_state import (
    containment_state_increment,
)


def foreach_batch_containment_ingest(
    stream_docs: DataFrame,
    root: str,
    checkpoint_dir: str,
    pairs_dir: str | None = None,
    reports: list | None = None,
    collapse_exact: bool = False,
):
    """Fold each micro-batch of probe documents against a persisted
    decontamination state (built beforehand with
    ``write_containment_state``).

    ``pairs_dir``: per-batch contaminated pairs land at
    ``{pairs_dir}/batch={batch_id}`` — written INSIDE the fold, before
    its ledger marker, so a crash can never strand a committed fold
    with the pairs lost (checkpoint recovery redelivers under the same
    batch_id and the replayed fold reports the durable path). A
    CONTENT-duplicate batch under a new batch_id replays as a no-op and
    writes nothing — by design, the pairs were already produced
    (``strict_replay_pairs=False``).

    ``reports`` (optional list) collects per-batch fold reports with
    ``batch_id`` and ``replayed`` attached. Blocks until the available
    data is processed (``trigger(availableNow=True)``).

    ``collapse_exact`` applies the collapse-exact-first discipline to
    every micro-batch (bit-identical pairs/state; the right default
    when the stream carries boilerplate-heavy drops).
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        out = (
            f"{pairs_dir}/batch={batch_id}" if pairs_dir is not None else None
        )
        result = containment_state_increment(
            batch_df,
            root,
            output_pairs=out,
            strict_replay_pairs=False,
            collapse_exact=collapse_exact,
        )
        if reports is not None:
            reports.append(
                {
                    "batch_id": batch_id,
                    "replayed": result["replayed"],
                    **result["report"],
                }
            )

    query = (
        stream_docs.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
