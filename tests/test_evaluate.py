"""Unit tests for operators/evaluate.py: hand-computed AUC/AP (incl.
tie handling), report zero-division edges, calibration clamping."""

from __future__ import annotations

import pytest

from home_credit_data_engineering_spark.operators.evaluate import (
    binary_auc,
    calibration_bins,
    classification_report,
    confusion_matrix,
    roc_pr_points,
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, schema="y int, s bigint")


def test_binary_auc_hand_computed_with_ties(spark):
    # scores: pos at 30, 20, 10; neg at 20, 10, 5 — ties at 20 and 10.
    # Pairs: P*N = 9. pos30 beats all 3 negs = 3. pos20 beats neg10+neg5 (2)
    # + half-credit vs neg20 (0.5). pos10 beats neg5 (1) + 0.5 vs neg10.
    # AUC = (3 + 2.5 + 1.5) / 9 = 7/9 = 0.777778.
    df = _scored(
        spark, [(1, 30), (1, 20), (1, 10), (0, 20), (0, 10), (0, 5)]
    )
    row = binary_auc(df, "y", "s").collect()[0]
    assert row.n_pos == 3 and row.n_neg == 3
    assert row.n_thresholds == 4
    assert row.auc == pytest.approx(7 / 9, abs=1e-6)
    # AP (sklearn step definition, ties grouped, precision incl. group):
    # desc: s=30 (1 pos) prec 1/1; s=20 (1 pos, 1 neg) prec 2/3;
    # s=10 (1 pos, 1 neg) prec 3/5. AP = (1 + 2/3 + 3/5)/3 = 34/45.
    assert row.avg_precision == pytest.approx(34 / 45, abs=1e-6)


def test_binary_auc_degenerate_classes_null(spark):
    all_pos = _scored(spark, [(1, 5), (1, 7)])
    row = binary_auc(all_pos, "y", "s").collect()[0]
    assert row.auc is None  # undefined, not 0
    assert row.avg_precision is not None  # AP defined: all retrieved relevant
    all_neg = _scored(spark, [(0, 5), (0, 7)])
    row = binary_auc(all_neg, "y", "s").collect()[0]
    assert row.auc is None and row.avg_precision is None


def test_binary_auc_perfect_and_inverted(spark):
    perfect = _scored(spark, [(1, 9), (1, 8), (0, 2), (0, 1)])
    assert binary_auc(perfect, "y", "s").collect()[0].auc == 1.0
    inverted = _scored(spark, [(0, 9), (0, 8), (1, 2), (1, 1)])
    assert binary_auc(inverted, "y", "s").collect()[0].auc == 0.0


def test_roc_points_counts_and_rates(spark):
    df = _scored(spark, [(1, 30), (1, 20), (0, 20), (0, 5)])
    rows = {r.threshold: r for r in roc_pr_points(df, "y", "s").collect()}
    assert set(rows) == {30, 20, 5}
    r30 = rows[30]
    assert (r30.tp, r30.fp, r30.fn, r30.tn) == (1, 0, 1, 2)
    assert r30.precision == 1.0 and r30.tpr == 0.5 and r30.fpr == 0.0
    r20 = rows[20]
    assert (r20.tp, r20.fp) == (2, 1)
    assert r20.precision == pytest.approx(2 / 3, abs=1e-6)
    r5 = rows[5]
    assert (r5.tp, r5.fp, r5.fn, r5.tn) == (2, 2, 0, 0)
    assert r5.tpr == 1.0 and r5.fpr == 1.0


def test_classification_report_zero_division_edges(spark):
    # 'c' never predicted (precision 0); 'd' predicted but never true
    # (recall 0, support 0); both still get rows.
    df = spark.createDataFrame(
        [("a", "a"), ("a", "a"), ("b", "a"), ("c", "d"), ("b", "b")],
        schema="label string, pred string",
    )
    rep = {r.cls: r for r in classification_report(df).collect()}
    assert set(rep) == {"a", "b", "c", "d", "macro", "micro"}
    assert rep["a"].precision == pytest.approx(2 / 3, abs=1e-6)
    assert rep["a"].recall == 1.0
    assert rep["c"].precision == 0.0 and rep["c"].recall == 0.0
    assert rep["c"].f1 == 0.0 and rep["c"].support == 1
    assert rep["d"].support == 0 and rep["d"].recall == 0.0
    assert rep["micro"].precision == pytest.approx(3 / 5)
    assert rep["micro"].support == 5
    assert rep["macro"].support == 5
    # macro = mean of the four per-class rounded metrics
    per = [rep[c] for c in ("a", "b", "c", "d")]
    assert rep["macro"].precision == pytest.approx(
        round(sum(r.precision for r in per) / 4, 6), abs=1e-9
    )


def test_confusion_matrix_counts(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("a", "b"), ("a", "b")], schema="label string, pred string"
    )
    got = {(r.label, r.pred): r.n for r in confusion_matrix(df).collect()}
    assert got == {("a", "a"): 1, ("a", "b"): 2}


def test_calibration_bins_clamp_and_rates(spark):
    df = spark.createDataFrame(
        [(1, -0.5), (0, 0.05), (1, 0.05), (1, 0.95), (0, 1.0), (1, 2.0)],
        schema="y int, s double",
    )
    bins = {r.bin: r for r in calibration_bins(df, "y", "s", n_bins=10).collect()}
    # -0.5 clamps to bin 0 (with the two 0.05s); 1.0 and 2.0 fold into bin 9.
    assert set(bins) == {0, 9}
    assert bins[0].n == 3 and bins[0].n_pos == 2
    assert bins[9].n == 3 and bins[9].n_pos == 2
    assert bins[9].pos_rate == pytest.approx(2 / 3, abs=1e-6)


def test_calibration_bins_validation(spark):
    df = spark.createDataFrame([(1, 0.5)], schema="y int, s double")
    with pytest.raises(ValueError, match="n_bins"):
        calibration_bins(df, "y", "s", n_bins=0)
    with pytest.raises(ValueError, match="hi > lo"):
        calibration_bins(df, "y", "s", lo=1.0, hi=1.0)


def test_report_boolean_label_auc_accepts_bool(spark):
    df = spark.createDataFrame(
        [(True, 3), (False, 1)], schema="y boolean, s bigint"
    )
    row = binary_auc(df, "y", "s").collect()[0]
    assert row.auc == 1.0
