"""Classifier / ranker evaluation: confusion matrices, precision-recall
reports, exact ROC-AUC and average precision, calibration tables.

The missing half of the quality-classifier loop (``operators/classify.py``
trains and scores; nothing measured the result until now). Modern
pretraining pipelines gate data on learned quality/language classifiers
(CCNet, Gopher, FineWeb-Edu), and the gate is only as good as its
measured precision/recall at the chosen threshold — these operators
compute those curves *distributed*, over the full scored corpus, with
the repo's exact-arithmetic discipline so a DuckDB twin hash-verifies
every number.

Operators
---------
- :func:`confusion_matrix` — (label, pred, n) counts, one hash aggregate.
- :func:`classification_report` — per-class precision/recall/F1/support
  plus ``macro`` and ``micro`` summary rows (sklearn's
  ``classification_report`` surface, exact counts).
- :func:`binary_auc` — exact ROC-AUC (Mann-Whitney with the standard
  tie correction) and step-function average precision (the
  ``average_precision_score`` definition), one row.
- :func:`roc_pr_points` — the full ROC / PR curve, one row per distinct
  score (threshold = "predict positive at score >= s").
- :func:`calibration_bins` — reliability-diagram table: mean score vs
  empirical positive rate per score bucket.

100 TB posture
--------------
Every operator pre-aggregates the row stream FIRST — ``groupBy(label,
pred)`` for the report (grid bounded by |classes|²), ``groupBy(score)``
for the curves (bounded by the number of distinct scores — callers
quantize continuous scores, e.g. integerized at 1e-6, exactly as the
declared queries do) — with map-side partial aggregation, so the only
full-data pass is one combinable hash aggregate. The cumulative sums
behind AUC/AP run in a single unpartitioned window over the
*distinct-score frame only* (same documented trade as the exact-NTILE
bucketer in ``operators/lm.py``): thresholds, not rows, cross that
window. Counts ride as BIGINT/DECIMAL; every ratio is rounded at a
pinned scale before any further arithmetic, so Spark and the SQL twin
agree bit-for-bit.

Division guards: a class absent from predictions scores precision 0.0
(sklearn's ``zero_division=0``); AUC is NULL when either class is empty
(undefined, not 0); AP is NULL when there are no positives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def confusion_matrix(
    df: DataFrame, label_col: str = "label", pred_col: str = "pred"
) -> DataFrame:
    """Confusion counts ``(label, pred, n)`` — one combinable aggregate."""
    return (
        df.groupBy(F.col(label_col).alias("label"), F.col(pred_col).alias("pred"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def classification_report(
    df: DataFrame, label_col: str = "label", pred_col: str = "pred"
) -> DataFrame:
    """Per-class precision / recall / F1 / support, plus summary rows.

    Output: ``(cls, precision, recall, f1, support)`` — one row per
    class (union of observed labels and observed predictions), plus
    ``cls='macro'`` (unweighted mean of the per-class *rounded* metrics,
    support = total rows) and ``cls='micro'`` (accuracy — for
    single-label classification micro-P = micro-R = micro-F1 =
    accuracy). Metrics are ``round(·, 6)`` doubles over exact BIGINT
    counts; F1 is computed from the ROUNDED precision/recall (documented
    so the SQL twin replicates the exact arithmetic order). A class
    never predicted has precision 0.0; a class with no true rows has
    recall 0.0 (sklearn ``zero_division=0``).

    Scale: one ``groupBy(label, pred)`` over the rows (map-side
    combine); everything downstream operates on the |classes|² grid,
    which is localCheckpoint-ed (the graph-loop idiom) so the full-data
    aggregate runs ONCE even though five report branches consume it.
    """
    return classification_report_from_grid(
        confusion_matrix(df, label_col, pred_col)
    )


def classification_report_from_grid(grid: DataFrame) -> DataFrame:
    """:func:`classification_report` from a precomputed confusion grid
    ``(label, pred, n)`` — the finalizer for incremental / streaming
    evaluation: grids are mergeable (:func:`merge_confusion`), so a
    nightly job merges yesterday's grid with today's delta and
    finalizes here without rescanning history."""
    grid = grid.localCheckpoint()
    classes = (
        grid.select(F.col("label").alias("cls"))
        .unionByName(grid.select(F.col("pred").alias("cls")))
        .distinct()
    )
    support = grid.groupBy(F.col("label").alias("cls")).agg(
        F.sum("n").alias("support")
    )
    predicted = grid.groupBy(F.col("pred").alias("cls")).agg(
        F.sum("n").alias("predicted")
    )
    tp = (
        grid.filter(F.col("label") == F.col("pred"))
        .select(F.col("label").alias("cls"), F.col("n").alias("tp"))
    )
    per = (
        classes.join(support, "cls", "left")
        .join(predicted, "cls", "left")
        .join(tp, "cls", "left")
        .select(
            "cls",
            F.coalesce(F.col("support"), F.lit(0)).alias("support"),
            F.coalesce(F.col("predicted"), F.lit(0)).alias("predicted"),
            F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
        )
        .select(
            "cls",
            F.when(
                F.col("predicted") > 0,
                F.round(
                    F.col("tp").cast("double") / F.col("predicted"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("precision"),
            F.when(
                F.col("support") > 0,
                F.round(F.col("tp").cast("double") / F.col("support"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("recall"),
            "support",
            "tp",
        )
        .select(
            "cls",
            "precision",
            "recall",
            F.when(
                F.col("precision") + F.col("recall") > 0,
                F.round(
                    2.0
                    * F.col("precision")
                    * F.col("recall")
                    / (F.col("precision") + F.col("recall")),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("f1"),
            "support",
            "tp",
        )
    )
    totals = grid.agg(
        F.sum("n").alias("total"),
        F.sum(F.when(F.col("label") == F.col("pred"), F.col("n"))).alias(
            "total_tp"
        ),
    )
    macro = per.agg(
        F.lit("macro").alias("cls"),
        F.round(F.avg("precision"), 6).alias("precision"),
        F.round(F.avg("recall"), 6).alias("recall"),
        F.round(F.avg("f1"), 6).alias("f1"),
        F.sum("support").alias("support"),
    )
    acc = F.round(
        F.coalesce(F.col("total_tp"), F.lit(0)).cast("double") / F.col("total"), 6
    )
    micro = totals.select(
        F.lit("micro").alias("cls"),
        acc.alias("precision"),
        acc.alias("recall"),
        acc.alias("f1"),
        F.col("total").alias("support"),
    )
    out = per.drop("tp").unionByName(macro).unionByName(micro)
    return out.select("cls", "precision", "recall", "f1", "support")


def _score_counts(
    df: DataFrame, label_col: str, score_col: str
) -> DataFrame:
    """Per distinct score: positive / negative counts (the only
    full-data pass — one combinable hash aggregate)."""
    y = F.col(label_col).cast("int")
    return (
        df.select(F.col(score_col).alias("score"), y.alias("__y"))
        .groupBy("score")
        .agg(
            F.sum("__y").alias("pos"),
            F.sum(1 - F.col("__y")).alias("neg"),
        )
    )


def binary_auc(
    df: DataFrame, label_col: str = "label", score_col: str = "score"
) -> DataFrame:
    """Exact ROC-AUC + average precision for a binary scorer, one row.

    Output: ``(n_pos, n_neg, n_thresholds, auc, avg_precision)``.

    AUC is the Mann-Whitney statistic with the standard half-credit tie
    correction, computed exactly in integer arithmetic::

        AUC = sum_s[ pos_s * (2 * neg_below(s) + neg_s) ] / (2 * P * N)

    over distinct scores ``s`` (``neg_below`` = negatives at strictly
    lower score). AP is the step-function average precision (the
    ``sklearn.average_precision_score`` definition) with ties grouped at
    equal scores: descending by score, ``AP = sum_s (pos_s / P) *
    precision_at(s)`` where ``precision_at`` includes the tied group
    itself; the per-threshold precision is rounded at 9 decimals and
    carried as DECIMAL(18,9) so the SQL twin reproduces the sum exactly.

    ``label_col`` must be boolean or 0/1; ``score_col`` should be
    pre-quantized (e.g. integerized at 1e-6) when scores are continuous
    — distinct score values are the frame the cumulative window runs
    over. AUC is NULL if either class is empty; AP is NULL if P = 0.
    """
    return binary_auc_from_counts(_score_counts(df, label_col, score_col))


def binary_auc_from_counts(by: DataFrame) -> DataFrame:
    """:func:`binary_auc` from a precomputed per-score count state
    ``(score, pos, neg)`` — the finalizer for incremental / streaming
    AUC: the state is one mergeable hash aggregate
    (:func:`merge_score_counts` / ``streaming.evaluate``), bounded by
    distinct scores, so history never rescans."""
    w_below = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_desc = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    terms = by.select(
        "pos",
        "neg",
        F.coalesce(F.sum("neg").over(w_below), F.lit(0)).alias("neg_below"),
        F.sum("pos").over(w_desc).alias("tp_cum"),
        F.sum("neg").over(w_desc).alias("fp_cum"),
    ).select(
        "pos",
        "neg",
        (
            F.col("pos").cast("decimal(18,0)")
            * (2 * F.col("neg_below") + F.col("neg")).cast("decimal(19,0)")
        ).alias("auc_term"),
        (
            F.col("pos").cast("decimal(19,0)")
            * F.round(
                F.col("tp_cum").cast("double")
                / (F.col("tp_cum") + F.col("fp_cum")),
                9,
            ).cast("decimal(18,9)")
        ).alias("ap_term"),
    )
    agg = terms.agg(
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
        F.count(F.lit(1)).alias("n_thresholds"),
        F.sum("auc_term").alias("auc_num"),
        F.sum("ap_term").alias("ap_num"),
    )
    return agg.select(
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        "n_thresholds",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                F.col("auc_num").cast("double")
                / (2.0 * F.col("n_pos") * F.col("n_neg")),
                6,
            ),
        ).alias("auc"),
        F.when(
            F.col("n_pos") > 0,
            F.round(F.col("ap_num").cast("double") / F.col("n_pos"), 6),
        ).alias("avg_precision"),
    )


def roc_pr_points(
    df: DataFrame, label_col: str = "label", score_col: str = "score"
) -> DataFrame:
    """Full ROC / PR curve: one row per distinct score, threshold
    semantics "predict positive at score >= threshold".

    Output: ``(threshold, tp, fp, fn, tn, tpr, fpr, precision)`` —
    ``tpr`` doubles as recall. Rates round(·, 6) over exact counts.
    Grid-sized output (distinct scores), same single-window trade as
    :func:`binary_auc`.
    """
    by = _score_counts(df, label_col, score_col)
    w_desc = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = by.agg(
        F.sum("pos").alias("__p"), F.sum("neg").alias("__n")
    )
    cum = by.select(
        F.col("score").alias("threshold"),
        F.sum("pos").over(w_desc).alias("tp"),
        F.sum("neg").over(w_desc).alias("fp"),
    )
    return cum.join(F.broadcast(tot), how="cross").select(
        "threshold",
        "tp",
        "fp",
        (F.col("__p") - F.col("tp")).alias("fn"),
        (F.col("__n") - F.col("fp")).alias("tn"),
        F.when(
            F.col("__p") > 0, F.round(F.col("tp").cast("double") / F.col("__p"), 6)
        ).alias("tpr"),
        F.when(
            F.col("__n") > 0, F.round(F.col("fp").cast("double") / F.col("__n"), 6)
        ).alias("fpr"),
        F.round(
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")), 6
        ).alias("precision"),
    )


def calibration_bins(
    df: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    n_bins: int = 10,
    lo: float = 0.0,
    hi: float = 1.0,
) -> DataFrame:
    """Reliability-diagram table: per score bucket, count / mean score /
    empirical positive rate.

    Buckets are ``n_bins`` equal-width intervals over ``[lo, hi]``; the
    top edge folds into the last bin (``least(floor(...), n_bins-1)``),
    scores below ``lo`` clamp to bin 0. Output ``(bin, n, n_pos,
    mean_score, pos_rate)``, one combinable aggregate over the rows.
    A well-calibrated scorer has ``mean_score ≈ pos_rate`` per bin.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    y = F.col(label_col).cast("int")
    s = F.col(score_col).cast("double")
    bin_ = F.greatest(
        F.lit(0),
        F.least(
            F.floor((s - F.lit(lo)) / F.lit(hi - lo) * n_bins).cast("int"),
            F.lit(n_bins - 1),
        ),
    )
    return (
        df.select(bin_.alias("bin"), s.alias("__s"), y.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__y").alias("n_pos"),
            F.round(F.avg("__s"), 6).alias("mean_score"),
            F.round(F.sum("__y").cast("double") / F.count(F.lit(1)), 6).alias(
                "pos_rate"
            ),
        )
    )


def score_counts_state(
    df: DataFrame, label_col: str = "label", score_col: str = "score"
) -> DataFrame:
    """The mergeable AUC state: per distinct score, (pos, neg) counts —
    one combinable hash aggregate over the rows, bounded by distinct
    (quantized) scores. Persist it, merge deltas with
    :func:`merge_score_counts`, finalize with
    :func:`binary_auc_from_counts` — O(delta) evaluation refresh."""
    return _score_counts(df, label_col, score_col)


def merge_score_counts(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two AUC count states (cell-wise sum — counts are exact, so
    merged-then-finalized ≡ finalized-over-the-union)."""
    return (
        state.unionByName(delta)
        .groupBy("score")
        .agg(F.sum("pos").alias("pos"), F.sum("neg").alias("neg"))
    )


def merge_confusion(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two confusion grids ``(label, pred, n)`` cell-wise —
    :func:`classification_report_from_grid` over the merged grid equals
    the report over the concatenated inputs."""
    return (
        state.unionByName(delta)
        .groupBy("label", "pred")
        .agg(F.sum("n").alias("n"))
    )


def grouped_binary_auc(
    df: DataFrame,
    group_col: str,
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """Per-group exact ROC-AUC / AP — one row per group, the same
    arithmetic as :func:`binary_auc` with every window PARTITIONED BY
    the group key (so unlike the single-task form, nothing ever funnels
    into one partition: this is the multi-task / one-vs-rest shape that
    scales with any number of groups).

    Output: ``(group, n_pos, n_neg, n_thresholds, auc, avg_precision)``.
    Macro metrics are one more tiny aggregate over the result (e.g.
    ``avg(auc)`` for macro one-vs-rest AUC of a multi-class scorer).
    """
    y = F.col(label_col).cast("int")
    by = (
        df.select(
            F.col(group_col).alias("group"),
            F.col(score_col).alias("score"),
            y.alias("__y"),
        )
        .groupBy("group", "score")
        .agg(
            F.sum("__y").alias("pos"),
            F.sum(1 - F.col("__y")).alias("neg"),
        )
    )
    w_below = (
        Window.partitionBy("group")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_desc = (
        Window.partitionBy("group")
        .orderBy(F.desc("score"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    terms = by.select(
        "group",
        "pos",
        "neg",
        (
            F.col("pos").cast("decimal(18,0)")
            * (
                2 * F.coalesce(F.sum("neg").over(w_below), F.lit(0))
                + F.col("neg")
            ).cast("decimal(19,0)")
        ).alias("auc_term"),
        (
            F.col("pos").cast("decimal(19,0)")
            * F.round(
                F.sum("pos").over(w_desc).cast("double")
                / (F.sum("pos").over(w_desc) + F.sum("neg").over(w_desc)),
                9,
            ).cast("decimal(18,9)")
        ).alias("ap_term"),
    )
    agg = terms.groupBy("group").agg(
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
        F.count(F.lit(1)).alias("n_thresholds"),
        F.sum("auc_term").alias("auc_num"),
        F.sum("ap_term").alias("ap_num"),
    )
    return agg.select(
        "group",
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        "n_thresholds",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                F.col("auc_num").cast("double")
                / (2.0 * F.col("n_pos") * F.col("n_neg")),
                6,
            ),
        ).alias("auc"),
        F.when(
            F.col("n_pos") > 0,
            F.round(F.col("ap_num").cast("double") / F.col("n_pos"), 6),
        ).alias("avg_precision"),
    )
