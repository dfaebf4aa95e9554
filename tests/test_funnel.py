"""Funnel / cohort-retention operators on hand-computable fixtures."""

from __future__ import annotations

import datetime as dt

import pytest

from home_credit_data_engineering_spark.operators.funnel import (
    cohort_retention,
    funnel_counts,
    funnel_steps,
)


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # u1 completes the full funnel in order
        (1, _ts(1, 9), 1, "view"),
        (2, _ts(1, 10), 1, "click"),
        (3, _ts(2, 11), 1, "purchase"),
        # u2: purchase BEFORE any view — must stop at step 1
        (4, _ts(1, 8), 2, "purchase"),
        (5, _ts(1, 9), 2, "view"),
        # u3: view and click at the SAME timestamp — strict > excludes
        # the click; funnel stops at step 1
        (6, _ts(3, 9), 3, "view"),
        (7, _ts(3, 9), 3, "click"),
        # u4: view -> click, no purchase; also a later second view/click
        # that must not matter (min semantics)
        (8, _ts(1, 7), 4, "view"),
        (9, _ts(1, 8), 4, "click"),
        (10, _ts(5, 7), 4, "view"),
        (11, _ts(5, 8), 4, "click"),
        # u5 never views
        (12, _ts(1, 9), 5, "click"),
        (13, _ts(1, 10), 5, "purchase"),
    ]
    return spark.createDataFrame(
        rows, schema="event_id bigint, ts timestamp, user_id bigint, event_type string"
    )


def test_funnel_strict_ordering(spark, ev):
    steps = {
        (r["user_id"], r["step"]): r["step_ts"]
        for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()
    }
    # u1: all three steps, at the planted times
    assert steps[(1, 1)] == _ts(1, 9)
    assert steps[(1, 2)] == _ts(1, 10)
    assert steps[(1, 3)] == _ts(2, 11)
    # u2: view only (purchase was before the view)
    assert (2, 1) in steps and (2, 2) not in steps and (2, 3) not in steps
    # u3: same-timestamp click does not advance (strict >)
    assert (3, 1) in steps and (3, 2) not in steps
    # u4: first view/click pair wins
    assert steps[(4, 1)] == _ts(1, 7)
    assert steps[(4, 2)] == _ts(1, 8)
    assert (4, 3) not in steps
    # u5: never enters the funnel
    assert (5, 1) not in steps


def test_funnel_counts_and_conversion(spark, ev):
    rows = {r["step"]: r for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()}
    assert rows[1]["n_users"] == 4  # u1..u4
    assert rows[2]["n_users"] == 2  # u1, u4
    assert rows[3]["n_users"] == 1  # u1
    assert rows[1]["conversion"] == pytest.approx(1.0)
    assert rows[2]["conversion"] == pytest.approx(0.5)
    assert rows[3]["conversion"] == pytest.approx(0.25)


def test_funnel_rejects_empty_steps(spark, ev):
    with pytest.raises(ValueError):
        funnel_steps(ev, [])


def test_cohort_retention_grid(spark):
    rows = [
        # cohort A (day 1): u1 active days 1,2,4; u2 active day 1 only
        (1, _ts(1), 1, "view"),
        (2, _ts(2), 1, "view"),
        (3, _ts(4), 1, "view"),
        (4, _ts(1, 5), 2, "view"),
        # cohort B (day 2): u3 active days 2 and 4
        (5, _ts(2), 3, "view"),
        (6, _ts(4), 3, "view"),
        # duplicate same-day events must not double-count
        (7, _ts(1, 6), 2, "click"),
    ]
    ev = spark.createDataFrame(
        rows, schema="event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    got = {
        (str(r["cohort_day"]), r["day_offset"]): (r["n_active"], r["retention"])
        for r in cohort_retention(ev).collect()
    }
    assert got[("2024-01-01", 0)] == (2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 0.5)
    assert got[("2024-01-01", 3)] == (1, 0.5)
    assert got[("2024-01-02", 0)] == (1, 1.0)
    assert got[("2024-01-02", 2)] == (1, 1.0)
    # no offset-2 row for cohort A (nobody active on day 3)
    assert ("2024-01-01", 2) not in got


def test_funnel_within_horizon(spark, ev):
    # windowFunnel semantics: with a 26h horizon from step-1, u1's
    # purchase (day 2, 11:00 — 26h after the day-1 09:00 view) is ON the
    # inclusive bound and counts; with a 25h horizon it does not, while
    # the click (1h after the view) still does.
    from home_credit_data_engineering_spark.operators.funnel import (
        funnel_steps,
    )

    steps26 = {
        (r["user_id"], r["step"])
        for r in funnel_steps(
            ev, ["view", "click", "purchase"], within_seconds=26 * 3600
        ).collect()
    }
    assert (1, 3) in steps26
    steps25 = {
        (r["user_id"], r["step"])
        for r in funnel_steps(
            ev, ["view", "click", "purchase"], within_seconds=25 * 3600
        ).collect()
    }
    assert (1, 2) in steps25 and (1, 3) not in steps25
    # horizon never ADDS completions
    unconstrained = {
        (r["user_id"], r["step"])
        for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()
    }
    assert steps26 <= unconstrained and steps25 <= steps26


# ---------------------------------------------------------------------------
# markov_transitions
# ---------------------------------------------------------------------------


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, schema="event_id bigint, ts timestamp, user_id bigint, event_type string"
    )


def test_markov_transitions_hand_computed(spark):
    from datetime import datetime

    from home_credit_data_engineering_spark.operators.funnel import (
        markov_transitions,
    )

    t = lambda m: datetime(2026, 1, 1, 0, m)  # noqa: E731
    # user 1: a -> b -> a ; user 2: a -> b
    ev = _mk_events(
        spark,
        [
            (1, t(0), 1, "a"), (2, t(1), 1, "b"), (3, t(2), 1, "a"),
            (4, t(0), 2, "a"), (5, t(1), 2, "b"),
        ],
    )
    got = {(r.src, r.dst): r for r in markov_transitions(ev).collect()}
    assert got[("__start__", "a")].n == 2
    assert got[("a", "b")].n == 2
    assert got[("b", "a")].n == 1
    assert got[("b", "__end__")].n == 1
    assert got[("a", "__end__")].n == 1
    # outgoing probabilities from 'a': 2/3 to b, 1/3 to __end__
    assert got[("a", "b")].p == pytest.approx(2 / 3, abs=1e-6)
    assert got[("a", "__end__")].p == pytest.approx(1 / 3, abs=1e-6)
    assert got[("b", "a")].p == 0.5 and got[("b", "__end__")].p == 0.5
    assert got[("__start__", "a")].p == 1.0


def test_markov_transitions_tiebreak_pinned(spark):
    from datetime import datetime

    from home_credit_data_engineering_spark.operators.funnel import (
        markov_transitions,
    )

    ts = datetime(2026, 1, 1)
    # identical timestamps: order must follow event_id (x then y)
    ev = _mk_events(spark, [(1, ts, 7, "x"), (2, ts, 7, "y")])
    got = {(r.src, r.dst) for r in markov_transitions(ev).collect()}
    assert got == {("__start__", "x"), ("x", "y"), ("y", "__end__")}


def test_markov_single_event_user_start_and_end(spark):
    from datetime import datetime

    from home_credit_data_engineering_spark.operators.funnel import (
        markov_transitions,
    )

    ev = _mk_events(spark, [(1, datetime(2026, 1, 1), 3, "solo")])
    got = {(r.src, r.dst): r.n for r in markov_transitions(ev).collect()}
    assert got == {("__start__", "solo"): 1, ("solo", "__end__"): 1}


# ---------------------------------------------------------------------------
# rfm_segments / robust_anomalies
# ---------------------------------------------------------------------------


def test_rfm_segments_hand_computed(spark):
    from datetime import datetime

    from home_credit_data_engineering_spark.operators.funnel import rfm_segments

    t = lambda d: datetime(2026, 1, d)  # noqa: E731
    ev = spark.createDataFrame(
        [
            # user 1: recent, frequent, big spender -> 1/1/1
            (1, t(10), 1, "buy", 100.0), (2, t(9), 1, "buy", 100.0),
            (3, t(8), 1, "buy", 100.0),
            # user 2: middling
            (4, t(6), 2, "buy", 50.0), (5, t(5), 2, "buy", 10.0),
            # user 3: stale, single, tiny
            (6, t(1), 3, "buy", 1.0),
            # user 4: recentish single small
            (7, t(7), 4, "buy", 5.0),
        ],
        schema="event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    )
    rows = {r.user_id: r for r in rfm_segments(ev).collect()}
    assert rows[1].segment == "111"
    assert rows[1].recency_us == 0 and rows[1].frequency == 3
    assert rows[1].monetary == pytest.approx(300.0)
    assert rows[3].r_score == 4 and rows[3].f_score >= 3
    # 4 users, 4 tiles -> each score is a permutation of 1..4
    assert sorted(r.r_score for r in rows.values()) == [1, 2, 3, 4]


def test_rfm_validation(spark):
    from datetime import datetime

    from home_credit_data_engineering_spark.operators.funnel import rfm_segments

    ev = spark.createDataFrame(
        [(1, datetime(2026, 1, 1), 1, "x", 1.0)],
        schema="event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    )
    with pytest.raises(ValueError, match="n_tiles"):
        rfm_segments(ev, n_tiles=1)


def test_robust_anomalies_flags_outlier_not_bulk(spark):
    from datetime import datetime

    from home_credit_data_engineering_spark.operators.funnel import (
        robust_anomalies,
    )

    ts = datetime(2026, 1, 1)
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 500.0]
    ev = spark.createDataFrame(
        [(i, ts, 1, "m", v) for i, v in enumerate(vals)],
        schema="event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    )
    rows = {r.event_id: r for r in robust_anomalies(ev).collect()}
    assert rows[6].is_anomaly  # the 500 spike
    assert rows[6].rob_z > 3.5
    assert not any(rows[i].is_anomaly for i in range(6))


def test_robust_anomalies_mad_zero_fallback(spark):
    from datetime import datetime

    from home_credit_data_engineering_spark.operators.funnel import (
        robust_anomalies,
    )

    ts = datetime(2026, 1, 1)
    # constant series + one deviant: MAD = 0 -> rob_z NULL, deviation flags
    ev = spark.createDataFrame(
        [(i, ts, 1, "c", 5.0) for i in range(5)] + [(9, ts, 1, "c", 6.0)],
        schema="event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    )
    rows = {r.event_id: r for r in robust_anomalies(ev).collect()}
    assert all(r.rob_z is None for r in rows.values())
    assert rows[9].is_anomaly and not rows[0].is_anomaly


def test_markov_merge_equals_full_when_users_partition(spark):
    from datetime import datetime

    from home_credit_data_engineering_spark.operators.funnel import (
        markov_transitions,
        merge_markov_transitions,
    )

    t = lambda m: datetime(2026, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, t(0), 1, "a"), (2, t(1), 1, "b"),
        (3, t(0), 2, "a"), (4, t(1), 2, "a"), (5, t(2), 2, "b"),
        (6, t(0), 3, "b"),
    ]
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    full = spark.createDataFrame(rows, schema)
    day1 = spark.createDataFrame([r for r in rows if r[2] in (1,)], schema)
    day2 = spark.createDataFrame([r for r in rows if r[2] in (2, 3)], schema)
    merged = merge_markov_transitions(
        markov_transitions(day1), markov_transitions(day2)
    )
    got = {(r.src, r.dst): (r.n, r.p) for r in merged.collect()}
    expect = {
        (r.src, r.dst): (r.n, r.p) for r in markov_transitions(full).collect()
    }
    assert got == expect


def test_rfm_approx_matches_exact_on_distinct_values(spark):
    """8 users, 4 tiles, strictly distinct values in every dimension:
    the threshold scores must agree with exact NTILE tile-for-tile
    (GK at accuracy >> n returns exact order statistics)."""
    from datetime import datetime

    from home_credit_data_engineering_spark.operators.funnel import (
        rfm_segments,
        rfm_segments_approx,
    )

    t = lambda d: datetime(2026, 1, d)  # noqa: E731
    rows = []
    eid = 0
    # user u (1..8): last event on day u+1 (distinct recency), u events
    # (distinct frequency), value 10*u per event (distinct monetary)
    for u in range(1, 9):
        for k in range(u):
            eid += 1
            rows.append((eid, t(max(1, u + 1 - k)), u, "buy", 10.0 * u))
    ev = spark.createDataFrame(
        rows,
        schema="event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    )
    exact = {r.user_id: r for r in rfm_segments(ev).collect()}
    appr = {r.user_id: r for r in rfm_segments_approx(ev).collect()}
    assert set(exact) == set(appr)
    for u in exact:
        assert (
            exact[u].r_score, exact[u].f_score, exact[u].m_score,
            exact[u].segment,
        ) == (appr[u].r_score, appr[u].f_score, appr[u].m_score,
              appr[u].segment)


def test_rfm_approx_keeps_ties_in_one_tile(spark):
    """The documented divergence from NTILE: equal dimension values get
    EQUAL approx scores (NTILE would split them to force equal-count
    tiles)."""
    from datetime import datetime

    from home_credit_data_engineering_spark.operators.funnel import (
        rfm_segments_approx,
    )

    ts = datetime(2026, 1, 5)
    ev = spark.createDataFrame(
        [(u, ts, u, "x", 7.0) for u in range(1, 9)],  # all identical
        schema="event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    )
    rows = rfm_segments_approx(ev).collect()
    assert len({(r.r_score, r.f_score, r.m_score) for r in rows}) == 1
    assert all(1 <= r.r_score <= 4 for r in rows)


def test_rfm_approx_monotone_and_bounded(spark):
    from datetime import datetime, timedelta

    from home_credit_data_engineering_spark.operators.funnel import (
        rfm_segments_approx,
    )

    base = datetime(2026, 1, 1)
    ev = spark.createDataFrame(
        [
            (u * 100 + k, base + timedelta(hours=3 * u + k), u, "x",
             float((u * 13) % 37))
            for u in range(1, 31)
            for k in range(1 + u % 5)
        ],
        schema="event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    )
    rows = rfm_segments_approx(ev, n_tiles=4).collect()
    for s in ("r_score", "f_score", "m_score"):
        assert all(1 <= getattr(r, s) <= 4 for r in rows)
    # monotone: sort users by recency; r_score never decreases
    by_rec = sorted(rows, key=lambda r: r.recency_us)
    scores = [r.r_score for r in by_rec]
    assert scores == sorted(scores)
    # descending dims: sort by frequency desc; f_score never decreases
    by_freq = sorted(rows, key=lambda r: -r.frequency)
    fscores = [r.f_score for r in by_freq]
    assert fscores == sorted(fscores)


def test_rfm_approx_validation(spark):
    from datetime import datetime

    from home_credit_data_engineering_spark.operators.funnel import (
        rfm_segments_approx,
    )

    ev = spark.createDataFrame(
        [(1, datetime(2026, 1, 1), 1, "x", 1.0)],
        schema="event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    )
    with pytest.raises(ValueError, match="n_tiles"):
        rfm_segments_approx(ev, n_tiles=1)
    with pytest.raises(ValueError, match="accuracy"):
        rfm_segments_approx(ev, accuracy=10)
