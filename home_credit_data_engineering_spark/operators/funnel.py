"""Behavioral event analytics: ordered funnels and cohort retention.

Product-analytics operators over an event stream (the ClickHouse
``windowFunnel`` / Amplitude-style surface, re-expressed as relational
plans so DuckDB can replay them exactly):

- :func:`funnel_steps` / :func:`funnel_counts` — strictly-ordered
  multi-step funnel: a user completes step *k* at the earliest event of
  type *k* that happens strictly after their step *k-1* completion.
- :func:`cohort_retention` — classic cohort/retention matrix: users
  cohorted by first-activity period, retention = fraction of the cohort
  active again at each period offset.

100 TB posture
--------------
Every stage projects down to (user, timestamp) pairs before any
exchange — event payloads (props/value) never move. The funnel is one
aggregate per step plus an equi-join per step transition, each join
keyed on the user id with a 1-row-per-user build side (AQE broadcasts
it when small; at extreme user counts it's a shuffle join of two
id/ts-projected frames). Retention shuffles distinct (user, period)
pairs — bounded by users × periods, not by raw event count. The funnel
and retention operators use no windows, no per-user event collection,
and no Python; :func:`markov_transitions` is the one windowed member,
and its window partitions by user (never a global sort).

Determinism: timestamps compare exactly (microsecond integers under the
hood); rates round to 6 decimals over exact BIGINT counts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: float | None = None,
) -> DataFrame:
    """Per-user first-completion time of each funnel step, long form.

    Output: ``(user_id, step int (1-based), step_name, step_ts)`` — one
    row per user per completed step. Strict ordering: step *k* counts
    only events strictly later than the user's step *k-1* completion
    (same-microsecond events do NOT advance the funnel; documented
    tie-break, identical in the SQL twin). With ``within_seconds`` set,
    every step must additionally land within that horizon of the user's
    STEP-1 completion (ClickHouse ``windowFunnel`` semantics, inclusive
    bound).

    Greedy caveat (shared with windowFunnel): the chain anchors on the
    EARLIEST step-1 event — a user whose later step-1 occurrence would
    complete the funnel inside the horizon is not re-anchored.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    out: DataFrame | None = None
    prev: DataFrame | None = None
    for i, step in enumerate(steps, start=1):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("user_id"), F.col(ts_col).alias("__ts")
        )
        if prev is None:
            cur = ev.groupBy("user_id").agg(F.min("__ts").alias("step_ts"))
            cur = cur.select("user_id", "step_ts", F.col("step_ts").alias("__t1"))
        else:
            joined = ev.join(
                prev.select(
                    "user_id", F.col("step_ts").alias("__prev"), "__t1"
                ),
                "user_id",
            ).filter(F.col("__ts") > F.col("__prev"))
            if within_seconds is not None:
                joined = joined.filter(
                    F.col("__ts").cast("double")
                    <= F.col("__t1").cast("double") + F.lit(float(within_seconds))
                )
            cur = joined.groupBy("user_id", "__t1").agg(
                F.min("__ts").alias("step_ts")
            )
        leg = cur.select(
            "user_id",
            F.lit(i).cast("int").alias("step"),
            F.lit(step).alias("step_name"),
            "step_ts",
        )
        out = leg if out is None else out.unionByName(leg)
        prev = cur
    return out


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: float | None = None,
) -> DataFrame:
    """Funnel summary: ``(step, step_name, n_users, conversion)``.

    ``conversion`` is the fraction of step-1 completers still present at
    each step, rounded to 6 (exact BIGINT counts → one double divide).
    """
    per_step = funnel_steps(
        events, steps, user_col=user_col, ts_col=ts_col, type_col=type_col,
        within_seconds=within_seconds,
    )
    counts = per_step.groupBy("step", "step_name").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    base = counts.filter(F.col("step") == 1).select(
        F.col("n_users").alias("__base")
    )
    return (
        counts.crossJoin(F.broadcast(base))  # 1-row scalar
        .select(
            "step",
            "step_name",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("__base"), 6
            ).alias("conversion"),
        )
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily cohort retention: ``(cohort_day, day_offset, n_active,
    retention)``.

    Users are cohorted by their first active calendar day; ``n_active``
    counts distinct cohort users active again ``day_offset`` days later
    (offset 0 is the cohort size itself). ``retention`` = n_active /
    cohort size, rounded to 6.
    """
    activity = events.select(
        F.col(user_col).alias("user_id"), F.to_date(ts_col).alias("__day")
    ).distinct()
    first = activity.groupBy("user_id").agg(F.min("__day").alias("cohort_day"))
    joined = activity.join(first, "user_id").select(
        "user_id",
        "cohort_day",
        F.datediff("__day", "cohort_day").alias("day_offset"),
    )
    grid = joined.groupBy("cohort_day", "day_offset").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    size = grid.filter(F.col("day_offset") == 0).select(
        "cohort_day", F.col("n_active").alias("__size")
    )
    return (
        grid.join(F.broadcast(size), "cohort_day")
        .select(
            "cohort_day",
            F.col("day_offset").cast("int").alias("day_offset"),
            "n_active",
            F.round(F.col("n_active").cast("double") / F.col("__size"), 6).alias(
                "retention"
            ),
        )
    )


def markov_transitions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    start_state: str = "__start__",
    end_state: str = "__end__",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event journeys
    — the user-flow / next-action model behind Sankey journey diagrams
    and exit-point analysis.

    Each user's events are ordered by ``(ts, tiebreak)`` (a pinned total
    order, so both engines see identical journeys); every consecutive
    pair emits one ``src -> dst`` transition, plus a ``__start__ ->
    first`` and ``last -> __end__`` marker per user (entry/exit
    analysis). Output: ``(src, dst, n, p)`` with ``p = round(n /
    n_src, 6)`` — each source row's outgoing probabilities sum to ~1.

    Scale: one window partitioned BY USER (the natural key — no global
    sort) builds the lagged pairs; the transition aggregate is a
    combinable ``groupBy(src, dst)`` bounded by |event types|²; source
    totals are a second-level aggregate over that grid. Event payloads
    (props/value) never enter the plan.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    seq = events.select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__t"),
        F.lag(type_col).over(w).alias("__prev"),
        F.lead(type_col).over(w).alias("__next"),
    )
    inner = seq.select(
        F.coalesce(F.col("__prev"), F.lit(start_state)).alias("src"),
        F.col("__t").alias("dst"),
    )
    exits = seq.filter(F.col("__next").isNull()).select(
        F.col("__t").alias("src"), F.lit(end_state).alias("dst")
    )
    trans = (
        inner.unionByName(exits)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    trans = trans.localCheckpoint()  # grid-sized; two consumers below
    totals = trans.groupBy("src").agg(F.sum("n").alias("__n_src"))
    return trans.join(F.broadcast(totals), "src").select(
        "src",
        "dst",
        "n",
        F.round(F.col("n").cast("double") / F.col("__n_src"), 6).alias("p"),
    )


def rfm_segments(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_tiles: int = 4,
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic behavioral scoring grid, computed distributed with exact
    arithmetic.

    Per user: ``recency_us`` (microseconds between the user's last event
    and the corpus max timestamp — exact BIGINT), ``frequency`` (event
    count), ``monetary`` (per-event value rounded at 4 and summed as
    exact DECIMAL(18,4) — the stable-sum discipline, so the
    order-dependent double sum never appears — exported as the exact
    double). Each dimension then scores 1..n_tiles by
    NTILE — tile 1 = most recent / most frequent / highest spend — with
    ``user_id`` as the pinned tie-break, and ``segment`` concatenates
    the three scores ('111' = best customers, churn-risk = high R
    score with low F/M).

    Scale: one combinable per-user aggregate over the event stream; the
    NTILE windows run over the USER-level frame (one row per user —
    the exact-NTILE trade documented on ``operators/lm.py``; swap for
    ``perplexity_buckets_approx``-style threshold scoring beyond ~1e9
    users). The reference timestamp is a 1-row broadcast, not a collect.
    """
    if n_tiles < 2:
        raise ValueError(f"n_tiles must be >= 2, got {n_tiles}")
    per_user = _rfm_per_user(events, user_col, ts_col, value_col)
    w_r = Window.orderBy(F.col("recency_us").asc(), F.col("user_id").asc())
    w_f = Window.orderBy(F.col("frequency").desc(), F.col("user_id").asc())
    w_m = Window.orderBy(F.col("monetary").desc(), F.col("user_id").asc())
    return per_user.select(
        "user_id",
        "recency_us",
        "frequency",
        "monetary",
        F.ntile(n_tiles).over(w_r).alias("r_score"),
        F.ntile(n_tiles).over(w_f).alias("f_score"),
        F.ntile(n_tiles).over(w_m).alias("m_score"),
    ).withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


def _rfm_per_user(
    events: DataFrame, user_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """The shared per-user RFM aggregate: exact BIGINT recency vs the
    1-row broadcast corpus-max timestamp, event count, and stable-sum
    DECIMAL(18,4) monetary exported as double."""
    ref = events.agg(F.max(F.unix_micros(F.col(ts_col))).alias("__ref_us"))
    return (
        events.join(F.broadcast(ref), how="cross")
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(
            (
                F.max("__ref_us") - F.max(F.unix_micros(F.col(ts_col)))
            ).alias("recency_us"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(
                F.round(F.col(value_col), 4).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("monetary"),
        )
    )


def rfm_segments_approx(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_tiles: int = 4,
    accuracy: int = 10_000,
) -> DataFrame:
    """:func:`rfm_segments` past the exact-NTILE scale limit (the swap
    the r7/r8 docstrings promised): scores come from
    ``percentile_approx`` THRESHOLDS instead of global NTILE windows,
    so NOTHING ever funnels into one partition — the scale path beyond
    ~1e9 users.

    Per dimension the n_tiles-1 quantile boundaries are ONE 1-row
    GK-sketch aggregate over the user frame (rank error ≤ users/
    ``accuracy``); each user's score is 1 + the number of boundaries it
    crosses, via a broadcast of the 1-row threshold frame — same
    direction convention as the exact form (score 1 = most recent /
    most frequent / highest spend).

    Semantics vs :func:`rfm_segments` (documented approximation, bound
    by the verdict slot ``events_rfm_approx_verdict``): threshold
    scoring assigns EQUAL-VALUE users the same score (exact NTILE can
    split ties across tiles to force equal-count tiles), and boundary
    users may land one tile off by the sketch's rank error. Scores
    remain in [1, n_tiles] and monotone in the underlying dimension by
    construction.

    Plan shape: one combinable per-user aggregate → one 1-row
    percentile_approx aggregate (mergeable sketch, map-side combined) →
    one broadcast nested-loop-free crossJoin of the 1-row thresholds →
    a scan-local projection. Zero windows, zero sorts, zero Python.
    """
    if n_tiles < 2:
        raise ValueError(f"n_tiles must be >= 2, got {n_tiles}")
    if accuracy < 100:
        raise ValueError(f"accuracy must be >= 100, got {accuracy}")
    per_user = _rfm_per_user(events, user_col, ts_col, value_col)
    asc_qs = [i / n_tiles for i in range(1, n_tiles)]
    desc_qs = [1.0 - q for q in asc_qs]
    thresholds = per_user.agg(
        F.percentile_approx(
            "recency_us", F.array(*[F.lit(q) for q in asc_qs]), accuracy
        ).alias("__r_q"),
        F.percentile_approx(
            "frequency", F.array(*[F.lit(q) for q in desc_qs]), accuracy
        ).alias("__f_q"),
        F.percentile_approx(
            "monetary", F.array(*[F.lit(q) for q in desc_qs]), accuracy
        ).alias("__m_q"),
    )

    def asc_score(col: str, qs: str) -> F.Column:
        # ascending dimension (recency): score 1 = below every boundary
        return (
            F.lit(1)
            + F.size(F.filter(F.col(qs), lambda q: F.col(col) > q))
        ).cast("int")

    def desc_score(col: str, qs: str) -> F.Column:
        # descending dimension (frequency/monetary): score 1 = above all
        # boundaries. <= (not <) because the GK boundary at quantile
        # (n-i)/n IS the last member of tile i+1 under NTILE's
        # equal-count split — on distinct values the two forms then
        # agree tile-for-tile (pinned in test_funnel).
        return (
            F.lit(1)
            + F.size(F.filter(F.col(qs), lambda q: F.col(col) <= q))
        ).cast("int")

    return (
        per_user.join(F.broadcast(thresholds), how="cross")
        .select(
            "user_id",
            "recency_us",
            "frequency",
            "monetary",
            asc_score("recency_us", "__r_q").alias("r_score"),
            desc_score("frequency", "__f_q").alias("f_score"),
            desc_score("monetary", "__m_q").alias("m_score"),
        )
        .withColumn(
            "segment",
            F.concat(
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ),
        )
    )


def robust_anomalies(
    events: DataFrame,
    *,
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
    k: float = 3.5,
) -> DataFrame:
    """Median/MAD robust outlier scoring per event type (the
    Iglewicz-Hoaglin modified z-score, the standard robust alternative
    to mean/stddev — one extreme value cannot shift its own threshold).

    Per type: ``med = percentile(value, 0.5)``, ``mad =
    percentile(|value - med|, 0.5)``; each event scores ``rob_z =
    round((value - med) / (1.4826 * mad), 6)`` and flags
    ``is_anomaly = |rob_z| > k`` (k = 3.5 is the textbook threshold).
    A type with MAD = 0 (constant values) emits NULL rob_z and flags
    only values differing from the median.

    Scale: two percentile aggregates per type (exact order statistics
    — swap for approx_percentile beyond memory-per-group limits) and
    one broadcast join of the |types|-row stats frame back onto the
    stream; no global sort, no Python.
    """
    med = events.groupBy(F.col(type_col).alias("__t")).agg(
        F.percentile(F.col(value_col), F.lit(0.5)).alias("__med")
    )
    with_med = events.join(
        F.broadcast(med), F.col(type_col) == F.col("__t")
    )
    mad = with_med.groupBy(F.col(type_col).alias("__t2")).agg(
        F.percentile(
            F.abs(F.col(value_col) - F.col("__med")), F.lit(0.5)
        ).alias("__mad")
    )
    scored = with_med.join(
        F.broadcast(mad), F.col(type_col) == F.col("__t2")
    )
    dev = F.col(value_col) - F.col("__med")
    rob_z = F.when(
        F.col("__mad") > 0, F.round(dev / (1.4826 * F.col("__mad")), 6)
    )
    return scored.select(
        F.col(id_col).alias("event_id"),
        F.col(type_col).alias("event_type"),
        F.col(value_col).alias("value"),
        rob_z.alias("rob_z"),
        F.when(F.col("__mad") > 0, F.abs(rob_z) > F.lit(float(k)))
        .otherwise(dev != 0)
        .alias("is_anomaly"),
    )


def merge_markov_transitions(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge two Markov transition COUNT states cell-wise and re-derive
    probabilities — O(delta) journey-model refresh for batches that
    partition USERS (each user's full journey in one batch: transition
    counts are then additive across batches; a user split mid-journey
    across batches would lose the boundary transition, documented).

    Input/output shape matches :func:`markov_transitions` — ``p`` is
    recomputed from the merged counts, so merged ≡ full recompute.
    """
    trans = (
        state.select("src", "dst", "n")
        .unionByName(delta.select("src", "dst", "n"))
        .groupBy("src", "dst")
        .agg(F.sum("n").alias("n"))
    ).localCheckpoint()
    totals = trans.groupBy("src").agg(F.sum("n").alias("__n_src"))
    return trans.join(F.broadcast(totals), "src").select(
        "src",
        "dst",
        "n",
        F.round(F.col("n").cast("double") / F.col("__n_src"), 6).alias("p"),
    )
