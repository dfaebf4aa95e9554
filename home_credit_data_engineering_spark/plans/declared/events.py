"""Event-time windowing / sessionization declared queries (batch forms of
the streaming operators, with exact SQL oracles)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.plans.declared._stable import ssum, xsum
from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata
from home_credit_data_engineering_spark.streaming.windows import (
    session_window_agg,
    sessionize_gap,
    sliding_agg,
    tumbling_agg,
)

#: Session gap: 6 hours (events span ~30 days over ~150 users — a 6h gap
#: yields multi-event sessions without collapsing everything into one).
GAP_SECONDS = 6 * 3600


@register(
    "sessionize_gap",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {GAP_SECONDS * 1_000_000}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT *, CAST(SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_id
      FROM flagged)
    SELECT user_id, session_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           {ssum("value", 4)} AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    operators=("E-ext:sessionize",),
    doc="Gap-based sessionization (gaps-and-islands: lag + running sum), "
    "exact microsecond arithmetic. The batch twin of stateful streaming "
    "sessions.",
)
def sessionize_gap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_testdata(spark, sf_dir, "events")
    return sessionize_gap(
        ev,
        key_col="user_id",
        ts_col="ts",
        gap_seconds=GAP_SECONDS,
        order_tiebreak="event_id",
        measures={
            "n_events": F.count(F.lit(1)),
            "total_value": xsum("value", 4),
        },
    )


@register(
    "session_window_native",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {GAP_SECONDS * 1_000_000}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
      SELECT *, SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged)
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL {GAP_SECONDS} SECOND AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    """,
    operators=("E-ext:session-window",),
    doc="Native F.session_window sessions (end = last event + gap), "
    "cross-checked against the gaps-and-islands formulation. Same operator "
    "runs under Structured Streaming with a watermark.",
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_testdata(spark, sf_dir, "events")
    return session_window_agg(
        ev,
        key_col="user_id",
        ts_col="ts",
        gap=f"{GAP_SECONDS} seconds",
        measures={"n_events": F.count(F.lit(1))},
    )


@register(
    "window_tumbling",
    oracle=f"""
    SELECT date_trunc('day', ts) AS window_start,
           date_trunc('day', ts) + INTERVAL 1 DAY AS window_end,
           event_type,
           COUNT(*) AS n_events,
           {ssum("value", 4)} AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    operators=("E-ext:tumbling",),
    doc="Tumbling 1-day event-time windows (batch form of the watermarked "
    "streaming aggregate in streaming/windows.py).",
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_testdata(spark, sf_dir, "events")
    return tumbling_agg(
        ev,
        ts_col="ts",
        duration="1 day",
        keys=["event_type"],
        measures={
            "n_events": F.count(F.lit(1)),
            "total_value": xsum("value", 4),
        },
    )


@register(
    "window_sliding",
    oracle="""
    WITH offsets AS (SELECT unnest([0, 12]) AS off_hours)
    SELECT ws AS window_start,
           ws + INTERVAL 24 HOUR AS window_end,
           COUNT(*) AS n_events
    FROM (
      SELECT date_trunc('day', ts - INTERVAL (off_hours) HOUR)
               + INTERVAL (off_hours) HOUR AS ws,
             ts
      FROM events, offsets) t
    WHERE ts >= ws AND ts < ws + INTERVAL 24 HOUR
    GROUP BY ws
    """,
    operators=("E-ext:sliding",),
    doc="Sliding 24h windows hopping every 12h: each event lands in two "
    "windows (the oracle enumerates both grid offsets explicitly).",
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_testdata(spark, sf_dir, "events")
    return sliding_agg(
        ev,
        ts_col="ts",
        duration="24 hours",
        slide="12 hours",
        keys=[],
        measures={"n_events": F.count(F.lit(1))},
    )


#: Ordered funnel steps for the declared funnel queries (see
#: operators/funnel.py). view -> click -> purchase over the synthetic
#: event stream.
FUNNEL_STEPS = ("view", "click", "purchase")

#: SQL twin of operators/funnel.py:funnel_steps for FUNNEL_STEPS:
#: s1 = min ts(view); s2 = min ts(click) strictly after s1;
#: s3 = min ts(purchase) strictly after s2.
FUNNEL_SQL_CTES = """
    s1 AS (
      SELECT user_id, MIN(ts) AS step_ts FROM events
      WHERE event_type = 'view' GROUP BY 1),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS step_ts
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.step_ts GROUP BY 1),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS step_ts
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.step_ts GROUP BY 1)
"""


@register(
    "events_funnel",
    oracle=f"""
    WITH {FUNNEL_SQL_CTES},
    steps AS (
      SELECT user_id, 1 AS step, 'view' AS step_name, step_ts FROM s1
      UNION ALL
      SELECT user_id, 2, 'click', step_ts FROM s2
      UNION ALL
      SELECT user_id, 3, 'purchase', step_ts FROM s3),
    counts AS (
      SELECT step, step_name, COUNT(*) AS n_users
      FROM steps GROUP BY 1, 2),
    base AS (SELECT n_users AS b FROM counts WHERE step = 1)
    SELECT CAST(step AS INTEGER) AS step, step_name, n_users,
           ROUND(CAST(n_users AS DOUBLE) / base.b, 6) AS conversion
    FROM counts CROSS JOIN base
    """,
    operators=("E-ext:funnel",),
    doc="Strictly-ordered 3-step funnel view->click->purchase "
    "(operators/funnel.py:funnel_counts; the ClickHouse windowFunnel / "
    "product-analytics primitive as a relational plan): step k counts "
    "the earliest type-k event strictly after the user's step k-1 "
    "completion. One aggregate per step + one (user, ts)-projected "
    "equi-join per transition — payloads never shuffle; conversion is "
    "one double divide over exact counts.",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.funnel import (
        funnel_counts,
    )

    ev = read_testdata(spark, sf_dir, "events")
    return funnel_counts(ev, FUNNEL_STEPS).select(
        "step", "step_name", "n_users", "conversion"
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    first AS (
      SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY 1),
    grid AS (
      SELECT f.cohort_day, a.day - f.cohort_day AS day_offset,
             COUNT(DISTINCT a.user_id) AS n_active
      FROM activity a JOIN first f USING (user_id)
      GROUP BY 1, 2),
    size AS (
      SELECT cohort_day, n_active AS sz FROM grid WHERE day_offset = 0)
    SELECT CAST(g.cohort_day AS VARCHAR) AS cohort_day,
           CAST(g.day_offset AS INTEGER) AS day_offset,
           g.n_active,
           ROUND(CAST(g.n_active AS DOUBLE) / s.sz, 6) AS retention
    FROM grid g JOIN size s USING (cohort_day)
    """,
    operators=("E-ext:cohort",),
    doc="Daily cohort retention matrix (operators/funnel.py:"
    "cohort_retention): users cohorted by first active day, retention = "
    "fraction active again at each day offset. Shuffles distinct "
    "(user, day) pairs — bounded by users x days, not event volume; "
    "cohort sizes broadcast back for the rate.",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.funnel import (
        cohort_retention,
    )

    ev = read_testdata(spark, sf_dir, "events")
    return cohort_retention(ev).select(
        # DATE cells canonicalize differently across engines; the driver
        # compare wants scalars with one textual form — ship ISO strings.
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "day_offset",
        "n_active",
        "retention",
    )


#: DuckDB twin of ``operators/funnel.py:markov_transitions`` —
#: ``mk_out(src, dst, n, p)`` over the events stream. Same pinned
#: (ts, event_id) journey order, same start/end markers.
MARKOV_SQL_CTES = """
    mk_seq AS (
      SELECT user_id, event_type AS t,
             LAG(event_type) OVER w AS prev,
             LEAD(event_type) OVER w AS nxt
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
    mk_trans AS (
      SELECT src, dst, COUNT(*) AS n FROM (
        SELECT COALESCE(prev, '__start__') AS src, t AS dst FROM mk_seq
        UNION ALL
        SELECT t, '__end__' FROM mk_seq WHERE nxt IS NULL)
      GROUP BY 1, 2),
    mk_out AS (
      SELECT src, dst, n,
             ROUND(CAST(n AS DOUBLE)
                   / SUM(n) OVER (PARTITION BY src), 6) AS p
      FROM mk_trans)"""


@register(
    "events_markov_transitions",
    oracle=f"""
    WITH {MARKOV_SQL_CTES}
    SELECT src, dst, CAST(n AS BIGINT) AS n, p FROM mk_out
    """,
    operators=("E-ext:markov",),
    doc="First-order Markov transition matrix over per-user event "
    "journeys (operators/funnel.py:markov_transitions — the user-flow / "
    "Sankey / exit-point model): consecutive-event pairs under a pinned "
    "(ts, event_id) total order, __start__/__end__ entry/exit markers, "
    "exact counts and round-6 row-normalized probabilities. One "
    "user-partitioned window (no global sort) feeds a combinable "
    "(src, dst) aggregate bounded by |event types|²; payloads never "
    "enter the plan.",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.funnel import (
        markov_transitions,
    )

    ev = read_testdata(spark, sf_dir, "events")
    return markov_transitions(ev)


@register(
    "events_rfm_segments",
    oracle="""
    WITH rfm_ref AS (SELECT MAX(epoch_us(ts)) AS ref_us FROM events),
    rfm_u AS (
      SELECT user_id,
             MAX(ref_us) - MAX(epoch_us(ts)) AS recency_us,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(18,4)))
                  AS DOUBLE) AS monetary
      FROM events CROSS JOIN rfm_ref GROUP BY user_id),
    rfm_s AS (
      SELECT user_id, CAST(recency_us AS BIGINT) AS recency_us,
             frequency, monetary,
             CAST(NTILE(4) OVER (ORDER BY recency_us ASC, user_id ASC)
                  AS INTEGER) AS r_score,
             CAST(NTILE(4) OVER (ORDER BY frequency DESC, user_id ASC)
                  AS INTEGER) AS f_score,
             CAST(NTILE(4) OVER (ORDER BY monetary DESC, user_id ASC)
                  AS INTEGER) AS m_score
      FROM rfm_u)
    SELECT user_id, recency_us, frequency, monetary,
           r_score, f_score, m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS segment
    FROM rfm_s
    """,
    operators=("E-ext:rfm",),
    doc="RFM customer segmentation (operators/funnel.py:rfm_segments — "
    "the classic behavioral scoring grid): per user, exact recency "
    "microseconds against the corpus max timestamp, event frequency, "
    "and monetary value summed as DECIMAL(18,4) after a pinned round-4 "
    "(stable-sum discipline); quartile NTILE scores per dimension with "
    "user_id tie-breaks (tile 1 = most recent / most frequent / "
    "highest spend) concatenated into the segment label. One "
    "combinable per-user aggregate; the NTILE windows run over the "
    "user-level frame only (the exact-NTILE trade).",
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.funnel import (
        rfm_segments,
    )

    return rfm_segments(read_testdata(spark, sf_dir, "events"))


@register(
    "events_robust_anomalies",
    oracle="""
    WITH an_med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1),
    an_mad AS (
      SELECT e.event_type,
             quantile_cont(ABS(e.value - m.med), 0.5) AS mad
      FROM events e JOIN an_med m USING (event_type) GROUP BY 1)
    SELECT e.event_id, e.event_type, e.value,
           CASE WHEN d.mad > 0
                THEN ROUND((e.value - m.med) / (1.4826 * d.mad), 6)
           END AS rob_z,
           CASE WHEN d.mad > 0
                THEN ABS(ROUND((e.value - m.med) / (1.4826 * d.mad), 6)) > 3.5
                ELSE e.value - m.med != 0 END AS is_anomaly
    FROM events e
    JOIN an_med m USING (event_type)
    JOIN an_mad d USING (event_type)
    """,
    operators=("E-ext:anomaly",),
    doc="Median/MAD robust outlier scoring per event type (operators/"
    "funnel.py:robust_anomalies — the Iglewicz-Hoaglin modified "
    "z-score at the textbook 3.5 threshold): exact interpolated "
    "medians (percentile == quantile_cont, the stats_percentiles "
    "contract), per-event rob_z rounded at 6, MAD=0 types fall back to "
    "value != median. Two percentile aggregates + one broadcast stats "
    "join back onto the stream; no global sort, no Python — the "
    "metric-quality gate a pipeline runs over telemetry before "
    "trusting it.",
)
def events_robust_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.funnel import (
        robust_anomalies,
    )

    return robust_anomalies(read_testdata(spark, sf_dir, "events"))


@register(
    "events_rfm_approx_verdict",
    # The approx form's scores are GK-sketch-derived (engine-specific),
    # so per-user values are not cross-engine reproducible; the slot
    # emits deterministic VERDICTS (the combo_approx_sketches /
    # stats_kmv_distinct mold): exact-NTILE agreement above a fixed
    # bound, score-vs-dimension monotonicity, and score-range bounds —
    # plus the exactly-checkable user count. Exact agreement semantics
    # are pinned in tests/test_funnel.py on planted data.
    oracle="""
    WITH rfa_u AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
                   FROM events)
    SELECT 'recency' AS dim, n AS n_users, TRUE AS agreement_ok,
           TRUE AS monotone_ok, TRUE AS bounds_ok FROM rfa_u
    UNION ALL SELECT 'frequency', n, TRUE, TRUE, TRUE FROM rfa_u
    UNION ALL SELECT 'monetary', n, TRUE, TRUE, TRUE FROM rfa_u
    """,
    operators=("E-ext:rfm", "A-ext:approx-percentile"),
    doc="rfm_segments_approx vs exact rfm_segments (VERDICT r8 #5 — the "
    "beyond-1e9-users swap the r7 docstrings promised): "
    "percentile_approx-threshold scores joined per user against the "
    "exact NTILE grid, emitting per-dimension verdicts — agreement "
    ">= 0.85 at >= 100 users, 0.6 below (measured 0.73-1.0 at "
    "sf0.001-0.01; ties are the documented divergence: threshold "
    "scoring keeps equal values in one tile, NTILE splits them to "
    "force equal counts), score monotone in the dimension "
    "(adjacent-tile ranges must not overlap), and scores within "
    "[1, n_tiles]. Zero windows in the approx plan — nothing funnels "
    "into one partition.",
)
def events_rfm_approx_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from home_credit_data_engineering_spark.operators.funnel import (
        rfm_segments,
        rfm_segments_approx,
    )

    n_tiles = 4
    events = read_testdata(spark, sf_dir, "events")
    exact = rfm_segments(events, n_tiles=n_tiles)
    appr = rfm_segments_approx(events, n_tiles=n_tiles)
    dims = {
        "recency": ("recency_us", 1),   # ascending dimension
        "frequency": ("frequency", -1),  # descending
        "monetary": ("monetary", -1),
    }
    joined = (
        exact.select(
            "user_id",
            F.col("r_score").alias("__er"),
            F.col("f_score").alias("__ef"),
            F.col("m_score").alias("__em"),
        )
        .join(appr, "user_id")
    )
    score_col = {"recency": "r_score", "frequency": "f_score",
                 "monetary": "m_score"}
    exact_col = {"recency": "__er", "frequency": "__ef", "monetary": "__em"}
    legs = []
    for dim, (val_col, sign) in dims.items():
        s = score_col[dim]
        # per-tile value ranges: adjacent tiles must not overlap (the
        # threshold construction guarantees it; this certifies the code)
        tiles = appr.groupBy(F.col(s).alias("__t")).agg(
            F.min(val_col).alias("__lo"), F.max(val_col).alias("__hi")
        )
        a, b = tiles.alias("a"), tiles.alias("b")
        overlap = a.join(
            b, F.col("a.__t") + 1 == F.col("b.__t")
        ).agg(
            F.coalesce(
                F.sum(
                    (
                        (F.col("a.__hi") > F.col("b.__lo"))
                        if sign == 1
                        else (F.col("a.__lo") < F.col("b.__hi"))
                    ).cast("long")
                ),
                F.lit(0),
            ).alias("__overlaps")
        )
        stats = joined.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.avg(
                (F.col(exact_col[dim]) == F.col(s)).cast("double")
            ).alias("__agree"),
            F.min(s).alias("__smin"),
            F.max(s).alias("__smax"),
        )
        legs.append(
            stats.crossJoin(F.broadcast(overlap)).select(
                F.lit(dim).alias("dim"),
                "n_users",
                # n-aware bound: at tiny user counts one tie group is a
                # double-digit fraction of all users (sf0.001 has 15
                # users; measured f-agreement 0.73 there vs 0.94-1.0 at
                # sf0.01's 150), so the bound relaxes below 100 users
                (
                    F.col("__agree")
                    >= F.when(F.col("n_users") >= 100, F.lit(0.85)).otherwise(
                        F.lit(0.6)
                    )
                ).alias("agreement_ok"),
                (F.col("__overlaps") == 0).alias("monotone_ok"),
                (
                    (F.col("__smin") >= 1) & (F.col("__smax") <= n_tiles)
                ).alias("bounds_ok"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out
