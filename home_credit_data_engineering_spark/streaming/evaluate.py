"""Streaming evaluation: live confusion grids, AUC count states, and
calibration tables over a scored event/prediction stream.

The monitoring half of ``operators/evaluate.py``: a deployed gate emits
``(label, pred)`` or ``(label, score)`` records (label arrives from a
delayed feedback join in practice); these transformations maintain the
evaluation STATE as plain streaming aggregations — Spark keeps the
running counts in its aggregation state store, the memory/foreachBatch
sink materializes them per micro-batch, and the batch finalizers
(:func:`~home_credit_data_engineering_spark.operators.evaluate.classification_report_from_grid`,
:func:`~home_credit_data_engineering_spark.operators.evaluate.binary_auc_from_counts`)
turn any materialized snapshot into the full report / exact AUC.

Because the states are one combinable hash aggregate each (grid ≤
|classes|², score counts ≤ distinct quantized scores), ``complete``
output mode stays bounded no matter how long the stream runs — the same
reason the batch operators scale. Stream == batch is asserted
row-exactly in ``tests/test_streaming_eval.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from home_credit_data_engineering_spark.operators.evaluate import (
    calibration_bins,
    confusion_matrix,
    score_counts_state,
)


def confusion_stream(
    scored: DataFrame, label_col: str = "label", pred_col: str = "pred"
) -> DataFrame:
    """Running confusion grid ``(label, pred, n)`` over a prediction
    stream (use ``complete`` output mode; finalize any snapshot with
    ``classification_report_from_grid``)."""
    return confusion_matrix(scored, label_col, pred_col)


def score_counts_stream(
    scored: DataFrame, label_col: str = "label", score_col: str = "score"
) -> DataFrame:
    """Running AUC state ``(score, pos, neg)`` over a scored stream —
    bounded by distinct quantized scores; finalize any snapshot with
    ``binary_auc_from_counts``."""
    return score_counts_state(scored, label_col, score_col)


def calibration_stream(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Running reliability table over a scored stream (``complete``
    mode; ``n_bins`` rows of state regardless of stream length)."""
    return calibration_bins(
        scored, label_col, score_col, n_bins=n_bins, lo=lo, hi=hi
    )
