"""Streaming maintenance of the exact-Jaccard prefix state.

Unlike the ANN/BM25 index families — whose batch (append into key
partitions) and streamed (dynamic-overwrite ``(…, batch)`` partitions)
layouts CONFLICT and need the ``_layout.json`` guard — the Jaccard
prefix state has a single layout: append-only ``delta-{fingerprint}``
files committed by the processed-delta ledger
(``operators/jaccard_state.py``). The content fingerprint is already
the replay-idempotence mechanism, so the streaming maintainer is simply
the batch fold driven by ``foreachBatch``: a micro-batch redelivered
after a crash (same content → same fingerprint) is a committed no-op,
with no ``(batch)`` partition machinery required. foreachBatch runs
micro-batches serially, which satisfies the fold's single-maintainer
contract.

``all_texts`` contract in the streaming shape: the stream's own source
table (documents arrive whole through the lake the stream reads), read
per batch so late-arriving candidate texts are visible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from home_credit_data_engineering_spark.operators.jaccard_state import (
    jaccard_state_increment,
)


def foreach_batch_jaccard_ingest(
    stream_docs: DataFrame,
    root: str,
    texts_source_path: str,
    checkpoint_dir: str,
    pairs_dir: str | None = None,
    reports: list | None = None,
    collapse_exact: bool = False,
):
    """Fold each micro-batch of documents into a persisted prefix state
    (built beforehand with ``write_jaccard_state``).

    ``pairs_dir``: per-batch verified pairs land at
    ``{pairs_dir}/batch={batch_id}`` — written INSIDE the fold, before
    its ledger marker, so a crash can never strand a committed fold
    with the pairs lost (checkpoint recovery redelivers under the same
    batch_id and the replayed fold reports the durable path). A
    CONTENT-duplicate batch under a new batch_id replays as a no-op and
    writes nothing — by design, the pairs were already produced.

    ``reports`` (optional list) collects per-batch fold reports with
    ``batch_id`` and ``replayed`` attached. Blocks until the available
    data is processed (``trigger(availableNow=True)``).

    ``collapse_exact`` applies the collapse-exact-first discipline to
    every micro-batch (bit-identical pairs/state; the right default
    when the stream carries boilerplate-heavy drops).
    """
    spark = stream_docs.sparkSession

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        out = (
            f"{pairs_dir}/batch={batch_id}" if pairs_dir is not None else None
        )
        # strict_replay_pairs=False: a CONTENT-duplicate batch under a
        # NEW batch_id (producer re-drop, post-checkpoint redelivery)
        # must replay as the documented committed no-op — the strict
        # scripted-caller raise would kill the streaming query over
        # pairs that were already produced under the earlier batch path
        result = jaccard_state_increment(
            batch_df,
            root,
            spark.read.parquet(texts_source_path),
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
