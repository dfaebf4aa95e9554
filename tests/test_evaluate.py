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


# ---------------------------------------------------------------------------
# Property-based: AUC/AP vs brute-force pairwise reference (Hypothesis)
# ---------------------------------------------------------------------------

from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_scored_lists = st.lists(
    st.tuples(st.integers(0, 1), st.integers(-5, 5)), min_size=2, max_size=24
).filter(
    lambda rows: any(y == 1 for y, _ in rows) and any(y == 0 for y, _ in rows)
)


def _brute_auc(rows):
    pos = [s for y, s in rows if y == 1]
    neg = [s for y, s in rows if y == 0]
    num = Fraction(0)
    for p in pos:
        for n in neg:
            if p > n:
                num += 1
            elif p == n:
                num += Fraction(1, 2)
    return num / (len(pos) * len(neg))


def _brute_ap(rows):
    # ties grouped at equal scores, precision includes the tied group
    pos_total = sum(y for y, _ in rows)
    by_score = {}
    for y, s in rows:
        a, b = by_score.get(s, (0, 0))
        by_score[s] = (a + y, b + (1 - y))
    tp = fp = 0
    ap = Fraction(0)
    for s in sorted(by_score, reverse=True):
        p, n = by_score[s]
        tp += p
        fp += n
        if p:
            # the operator rounds per-threshold precision at 9 decimals
            prec9 = round(Fraction(tp, tp + fp), 9)
            ap += Fraction(p) * Fraction(prec9).limit_denominator(10**12)
    return ap / pos_total


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_scored_lists)
def test_binary_auc_matches_bruteforce_pairwise(spark, rows):
    df = spark.createDataFrame(rows, schema="y int, s long")
    got = binary_auc(df, "y", "s").collect()[0]
    assert got.auc == pytest.approx(float(_brute_auc(rows)), abs=5e-7)
    assert got.avg_precision == pytest.approx(
        float(_brute_ap(rows)), abs=5e-7
    )


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),            # group
            st.integers(-20, 20),         # value
            st.integers(1, 9),            # weight > 0
        ),
        min_size=1,
        max_size=30,
    )
)
def test_weighted_percentile_matches_python_reference(spark, rows):
    from home_credit_data_engineering_spark.operators.aggregates import (
        grouped_weighted_percentile,
    )

    df = spark.createDataFrame(rows, schema="g int, v int, w int")
    got = {
        r.g: r.wpct_value
        for r in grouped_weighted_percentile(df, ["g"], "v", "w", q=0.5).collect()
    }
    by_g = {}
    for g, v, w in rows:
        by_g.setdefault(g, []).append((v, w))
    for g, vw in by_g.items():
        total = sum(w for _, w in vw)
        cum = 0
        expect = None
        for v, w in sorted(vw):
            cum += w
            if Fraction(cum) >= Fraction(1, 2) * total:
                expect = v
                break
        assert got[g] == float(expect), (g, sorted(vw))


def test_grouped_auc_matches_single_task_per_group(spark):
    from home_credit_data_engineering_spark.operators.evaluate import (
        grouped_binary_auc,
    )

    rows_a = [(1, 30), (1, 20), (1, 10), (0, 20), (0, 10), (0, 5)]
    rows_b = [(1, 9), (0, 2)]
    long = spark.createDataFrame(
        [("a", y, s) for y, s in rows_a] + [("b", y, s) for y, s in rows_b],
        schema="g string, y int, s long",
    )
    per = {r.group: r for r in grouped_binary_auc(long, "g", "y", "s").collect()}
    for g, rows in (("a", rows_a), ("b", rows_b)):
        single = binary_auc(
            spark.createDataFrame(rows, schema="y int, s long"), "y", "s"
        ).collect()[0]
        got = per[g]
        assert (got.n_pos, got.n_neg, got.n_thresholds) == (
            single.n_pos, single.n_neg, single.n_thresholds,
        )
        assert got.auc == single.auc
        assert got.avg_precision == single.avg_precision
    # degenerate group: all-positive -> NULL auc, AP defined
    long2 = long.unionByName(
        spark.createDataFrame([("c", 1, 5), ("c", 1, 7)], "g string, y int, s long")
    )
    per2 = {r.group: r for r in grouped_binary_auc(long2, "g", "y", "s").collect()}
    assert per2["c"].auc is None and per2["c"].avg_precision is not None
