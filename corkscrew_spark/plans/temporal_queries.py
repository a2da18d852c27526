"""Temporal / event-sequence queries: as-of join, sessions, streaks,
funnels, cohort retention.

The reference's change subsystem exposes per-resource timelines ordered
by timestamp (internal/changes/change_storage.go:249-272) and drift
windows (pkg/drift/detector.go); these queries generalize that temporal
surface to the cross-stream operators an event warehouse needs. All are
built on operators/temporal.py (union-merge as-of, gaps-and-islands
sessionization) — one shuffle on the entity key, no inequality joins.

Determinism rules as in plans/queries.py; every output column is
integer / timestamp / string-typed so oracle hashes match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from corkscrew_spark.operators import temporal
from corkscrew_spark.plans.queries import query, _t


@query(
    "asof_join_events",
    oracle="""
    WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
               FROM events WHERE event_type = 'purchase'),
         v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
               FROM events WHERE event_type = 'view'),
         j AS (SELECT p.purchase_id, p.user_id, p.purchase_ts, v.view_id, v.view_ts,
                      ROW_NUMBER() OVER (
                          PARTITION BY p.purchase_id
                          ORDER BY v.view_ts DESC, v.view_id DESC) AS rn
               FROM p LEFT JOIN v
                 ON v.user_id = p.user_id AND v.view_ts <= p.purchase_ts)
    SELECT purchase_id, user_id, purchase_ts, view_id, view_ts
    FROM j WHERE rn = 1
    ORDER BY purchase_id
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest view at or
    before it. The oracle is the quadratic-per-key formulation DuckDB can
    afford at sf0.01; the Spark plan is the union-merge (one shuffle on
    user_id, window carry-forward) that survives 100 TB."""
    ev = _t(spark, sf_dir)["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    return temporal.asof_join(
        purchases, views, key="user_id", left_ts="purchase_ts", right_ts="ts",
        right_payload=["view_id", "view_ts"], tiebreak="view_id",
    )


@query(
    "session_stats_30m",
    oracle="""
    WITH o AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (SELECT user_id, ts,
                 CAST(SUM(new_s) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
                 AS session_id
          FROM o)
    SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS started, MAX(ts) AS ended
    FROM s GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def session_stats_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-minute inactivity gap): lag +
    running sum inside one per-user window, then a per-session rollup —
    a single shuffle on user_id end to end. Gap compare is exact
    microseconds (unix_micros / epoch_us), no truncation ambiguity."""
    ev = _t(spark, sf_dir)["events"]
    return temporal.session_stats(
        ev, "user_id", "ts", gap_seconds=1800, order_tiebreak="event_id"
    )


@query(
    "funnel_steps",
    oracle="""
    WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events
                WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
                JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
                WHERE e.event_type = 'click' GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
                JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
                WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT 'step1_view' AS step, CAST(COUNT(*) AS BIGINT) AS entities FROM s1
    UNION ALL
    SELECT 'step2_click', CAST(COUNT(*) AS BIGINT) FROM s2
    UNION ALL
    SELECT 'step3_purchase', CAST(COUNT(*) AS BIGINT) FROM s3
    ORDER BY step
    """,
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel: step k+1 must happen strictly
    after the user's first qualifying step k. Single-pass sorted fold
    per user (one shuffle + a 1-row rollup) — no join chain, no window,
    no theta join."""
    ev = _t(spark, sf_dir)["events"]
    return temporal.funnel(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH f AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
               FROM events GROUP BY user_id),
         a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
    SELECT f.cohort,
           CAST(FLOOR(date_diff('day', f.cohort, a.wk) / 7) AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS users
    FROM a JOIN f ON a.user_id = f.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: cohort = ISO week of first
    activity, users counted per (cohort, week offset). Two aggregations
    sharing the user-key shuffle; ISO Monday week start in both engines."""
    ev = _t(spark, sf_dir)["events"]
    return temporal.cohort_retention(ev, "user_id", "ts")


@query(
    "activity_streaks",
    oracle="""
    WITH d AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
               FROM events),
         g AS (SELECT user_id, day,
                      ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
               FROM d),
         i AS (SELECT user_id, day - CAST(rn AS INTEGER) AS anchor FROM g),
         r AS (SELECT user_id, anchor, COUNT(*) AS streak
               FROM i GROUP BY user_id, anchor)
    SELECT user_id, CAST(MAX(streak) AS BIGINT) AS max_streak
    FROM r GROUP BY user_id
    ORDER BY user_id
    """,
)
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day run per user (islands trick:
    day − row_number is constant within a run). Every stage keys on
    user_id — one shuffle, no self-join."""
    ev = _t(spark, sf_dir)["events"]
    return temporal.activity_streaks(ev, "user_id", "ts")


@query(
    "interval_join_sessions",
    oracle="""
    WITH p AS (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'purchase' AND user_id < 10),
         o AS (SELECT user_id, ts, event_id,
                      CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                                > 604800000000
                           THEN 1 ELSE 0 END AS new_s
               FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (SELECT user_id,
                      CAST(SUM(new_s) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
                      AS session_id,
                      ts
               FROM o),
         iv AS (SELECT user_id AS s_user, session_id,
                       MIN(ts) AS started, MAX(ts) AS ended
                FROM s GROUP BY 1, 2),
         err AS (SELECT event_id, ts FROM events WHERE event_type = 'error')
    SELECT e.event_id, iv.s_user, iv.session_id
    FROM err e JOIN iv ON e.ts >= iv.started AND e.ts < iv.ended
    ORDER BY event_id, s_user, session_id
    """,
)
def interval_join_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via bucket blocking: error events matched into the
    purchase sessions (7-day gap) of users 0-9 whose [start, end) span
    contains them. The oracle affords the quadratic theta join at
    sf0.01; the Spark plan explodes intervals to day buckets and
    equi-joins on the bucket — shuffle volume is
    |points| + |intervals| x days_per_interval, never |points| x
    |intervals|."""
    ev = _t(spark, sf_dir)["events"]
    purch = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 10)
    )
    sess = temporal.session_stats(
        purch, "user_id", "ts", gap_seconds=7 * 86400, order_tiebreak="event_id"
    )
    iv = sess.select(
        F.col("user_id").alias("s_user"), "session_id", "started", "ended"
    )
    errs = ev.filter(F.col("event_type") == "error").select("event_id", "ts")
    return temporal.interval_join(
        errs, iv, "ts", "started", "ended", bucket_seconds=86400,
        point_keys=["event_id"], interval_keys=["s_user", "session_id"],
    )


@query(
    "daily_activity_dense",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MIN(date_trunc('day', ts)) AS DATE) AS lo,
               CAST(MAX(date_trunc('day', ts)) AS DATE) AS hi
        FROM events
    ),
    days AS (
        SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT d.day, t.event_type, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
    FROM days d
    CROSS JOIN types t
    LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
    ORDER BY d.day, t.event_type
    """,
)
def daily_activity_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: a generated (day x event_type) spine
    left-joined to the actual counts so silent days appear as explicit
    zeros — the gap-filling every time-series rollup needs before
    moving averages or anomaly thresholds make sense. The spine comes
    from a 1-row bounds aggregate exploded map-side (sequence +
    explode); the spine x dimension cross join is broadcast (both sides
    are metadata-sized at any event volume); only the counts agg
    shuffles."""
    ev = _t(spark, sf_dir)["events"]
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    types = ev.select("event_type").distinct()
    counts = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        days.crossJoin(F.broadcast(types))
        .join(counts, ["day", "event_type"], "left")
        .select("day", "event_type",
                F.coalesce("n", F.lit(0)).cast("long").alias("n_events"))
    )


@query(
    "asof_forward_next_purchase",
    oracle="""
    WITH e AS (SELECT event_id AS error_id, user_id, ts AS error_ts
               FROM events WHERE event_type = 'error'),
         p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
               FROM events WHERE event_type = 'purchase'),
         j AS (SELECT e.error_id, e.user_id, e.error_ts,
                      p.purchase_id, p.purchase_ts,
                      ROW_NUMBER() OVER (
                          PARTITION BY e.error_id
                          ORDER BY p.purchase_ts ASC, p.purchase_id DESC) AS rn
               FROM e LEFT JOIN p
                 ON p.user_id = e.user_id AND p.purchase_ts >= e.error_ts)
    SELECT error_id, user_id, error_ts,
           CASE WHEN epoch_us(purchase_ts) - epoch_us(error_ts) <= 86400000000
                THEN purchase_id END AS purchase_id,
           CASE WHEN epoch_us(purchase_ts) - epoch_us(error_ts) <= 86400000000
                THEN purchase_ts END AS purchase_ts
    FROM j WHERE rn = 1
    ORDER BY error_id
    """,
)
def asof_forward_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: each error matched to the user's
    NEXT purchase, voided when it is more than a day later — the
    recovery-time correlation. Same union-merge single-shuffle plan as
    the backward join with the time ordering reversed; the oracle
    affords the quadratic formulation at sf0.01."""
    ev = _t(spark, sf_dir)["events"]
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return temporal.asof_join(
        errors, purchases, key="user_id", left_ts="error_ts", right_ts="ts",
        right_payload=["purchase_id", "purchase_ts"], tiebreak="purchase_id",
        direction="forward", tolerance_seconds=86400,
    )


@query(
    "state_as_of",
    oracle="""
    WITH v AS (
        SELECT user_id, value, event_id, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to
        FROM events WHERE event_type = 'signup'
    )
    SELECT user_id, ROUND(value, 2) AS value_at, valid_from
    FROM v
    WHERE valid_from <= TIMESTAMP '2024-01-15'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15')
    ORDER BY user_id
    """,
)
def state_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-table reconstruction (`FOR SYSTEM_TIME AS OF` emulation):
    the signup event stream becomes versioned state via one lead()
    window (valid_from = event time, valid_to = next event), and the
    state at 2024-01-15 is the single version whose interval contains
    the instant — the query-side complement of warehouse.scd2_merge's
    storage-side versioning. One shuffle on the entity key."""
    ev = _t(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            "user_id", "value", "event_id",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
    )
    cutoff = F.lit("2024-01-15").cast("timestamp")
    return (
        v.filter(
            (F.col("valid_from") <= cutoff)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > cutoff))
        )
        .select("user_id", F.round("value", 2).alias("value_at"), "valid_from")
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH o AS (SELECT user_id, event_type,
                      LAG(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS prev
               FROM events)
    SELECT prev, event_type AS next, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY prev), 4)
               AS p
    FROM o WHERE prev IS NOT NULL
    GROUP BY prev, next
    ORDER BY prev, next
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: lag pairs from one per-user window, transition counts
    from one groupBy, row-normalized probabilities from a tiny
    |types|-partitioned window over the aggregated matrix (25 rows at
    any event volume) — the behavioral-model summary downstream
    sequence models sanity-check against."""
    ev = _t(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
    )
    counts = pairs.groupBy(
        "prev", F.col("event_type").alias("next")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wn = Window.partitionBy("prev")
    return (
        counts.select(
            "prev", "next",
            F.col("cnt").cast("long").alias("n"),
            F.round(F.col("cnt") * 1.0 / F.sum("cnt").over(wn), 4).alias("p"),
        )
    )


@query(
    "linear_interpolate_value",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, ts, epoch_us(ts) AS us,
               CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
        FROM events WHERE user_id < 10
    ),
    w AS (
        SELECT event_id, user_id, us, v,
               LAST_VALUE(v IGNORE NULLS) OVER wb AS pv,
               LAST_VALUE(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS)
                   OVER wb AS pus,
               FIRST_VALUE(v IGNORE NULLS) OVER wf AS nv,
               FIRST_VALUE(CASE WHEN v IS NOT NULL THEN us END IGNORE NULLS)
                   OVER wf AS nus
        FROM e
        WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               wf AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id,
           ROUND(CASE WHEN v IS NOT NULL THEN v
                 ELSE pv + (nv - pv) *
                      (CASE WHEN nus = pus THEN 0.5
                            ELSE (us - pus) * 1.0 / (nus - pus) END)
                 END, 4) AS value_filled
    FROM w ORDER BY event_id
    """,
)
def linear_interpolate_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted linear interpolation (operators/temporal.
    interpolate_linear): 'view' events are treated as missing
    observations and reconstructed from the nearest purchases on either
    side, weighted by actual elapsed time — the imputation complement of
    locf_gap_fill. Both window passes share one per-user shuffle; edges
    never extrapolate (stay NULL)."""
    ev = _t(spark, sf_dir)["events"]
    masked = ev.filter(F.col("user_id") < 10).withColumn(
        "v",
        F.when(F.col("event_type") == "view", F.lit(None).cast("double"))
        .otherwise(F.col("value")),
    )
    return (
        temporal.interpolate_linear(
            masked, "user_id", "ts", "v", "event_id", out_col="interp")
        .select(
            "event_id", "user_id",
            F.round(F.col("interp"), 4).alias("value_filled"),
        )
    )


@query(
    "ohlc_hourly",
    oracle="""
    SELECT event_type,
           date_trunc('hour', ts) AS bar_ts,
           first(value ORDER BY ts, event_id) AS open,
           MAX(value)                         AS high,
           MIN(value)                         AS low,
           last(value ORDER BY ts, event_id)  AS close,
           CAST(COUNT(*) AS BIGINT)           AS n_events
    FROM events
    WHERE ts < TIMESTAMP '2024-01-08'
    GROUP BY 1, 2
    ORDER BY event_type, bar_ts
    """,
)
def ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type over week one
    (``temporal.ohlc_bars``): the resample/downsample pass that turns a
    raw event stream into fixed-interval bars. open/close pick along the
    (ts, event_id) total order via min_by/max_by — deterministic under
    timestamp ties; all five aggregates combine map-side, one shuffle on
    the (type, hour) key."""
    e = _t(spark, sf_dir)["events"].filter(F.col("ts") < "2024-01-08")
    return (
        temporal.ohlc_bars(e, "ts", "value", "event_id",
                           by=("event_type",), bucket="hour")
    )


@query(
    "seasonal_anomaly_days",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    lagged AS (
        SELECT event_type, day, cnt,
               LAG(cnt, 7) OVER (PARTITION BY event_type ORDER BY day)
                   AS prev_week_cnt
        FROM daily
    )
    SELECT event_type, day, cnt, prev_week_cnt,
           cnt - prev_week_cnt AS dev,
           CAST(ABS(cnt - prev_week_cnt) * 10 > prev_week_cnt * 3 AS BIGINT)
               AS anomaly
    FROM lagged
    WHERE prev_week_cnt IS NOT NULL
    ORDER BY event_type, day
    """,
)
def seasonal_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive anomaly flags: each day's event volume against the
    same weekday one week earlier (lag-7 over per-type daily counts);
    a >30% swing flags, tested as integer cross-multiplication so the
    verdict is engine-exact. The window runs over PRE-AGGREGATED
    (type, day) rows — |types|x|days| state, never raw events — and is
    partitioned by type (no global window)."""
    e = _t(spark, sf_dir)["events"]
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.withColumn("prev_week_cnt", F.lag("cnt", 7).over(w))
    return (
        lagged.filter(F.col("prev_week_cnt").isNotNull())
        .select(
            "event_type", "day", "cnt", "prev_week_cnt",
            (F.col("cnt") - F.col("prev_week_cnt")).alias("dev"),
            (F.abs(F.col("cnt") - F.col("prev_week_cnt")) * 10
             > F.col("prev_week_cnt") * 3).cast("long").alias("anomaly"),
        )
    )


@query(
    "sequence_spans",
    oracle="""
    WITH s AS (SELECT event_id AS signup_id, user_id, ts AS signup_ts
               FROM events WHERE event_type = 'signup'),
         p AS (SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
               FROM events WHERE event_type = 'purchase'),
         e AS (SELECT user_id, event_id AS error_id, ts AS error_ts
               FROM events WHERE event_type = 'error'),
         j1 AS (SELECT s.signup_id, s.user_id, s.signup_ts,
                       p.purchase_id, p.purchase_ts,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.signup_id
                           ORDER BY p.purchase_ts ASC, p.purchase_id DESC) AS rn
                FROM s LEFT JOIN p
                  ON p.user_id = s.user_id AND p.purchase_ts >= s.signup_ts),
         step1 AS (SELECT signup_id, user_id, signup_ts,
                          purchase_id, purchase_ts
                   FROM j1 WHERE rn = 1),
         j2 AS (SELECT t.*, e.error_id, e.error_ts,
                       ROW_NUMBER() OVER (
                           PARTITION BY t.signup_id
                           ORDER BY e.error_ts ASC, e.error_id DESC) AS rn
                FROM step1 t LEFT JOIN e
                  ON e.user_id = t.user_id AND t.purchase_ts IS NOT NULL
                 AND e.error_ts >= t.purchase_ts)
    SELECT signup_id, user_id, signup_ts, purchase_id, purchase_ts,
           error_id, error_ts,
           CAST(purchase_id IS NOT NULL AND error_id IS NOT NULL AS BIGINT)
               AS complete,
           CASE WHEN error_id IS NOT NULL
                THEN (epoch_us(error_ts) - epoch_us(signup_ts)) // 1000000
           END AS span_seconds
    FROM j2 WHERE rn = 1 OR rn IS NULL
    ORDER BY signup_id
    """,
)
def sequence_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-pattern span extraction (MATCH_RECOGNIZE-lite): for every
    signup, the user's next purchase at-or-after it, then the next
    error at-or-after that purchase — the A→B→C match with its span.
    Composed as TWO chained forward as-of joins, each the union-merge
    single-shuffle plan (never an inequality join); a missing step
    leaves NULLs and an incomplete flag. The funnel counts how many
    users complete the pattern; this extracts each match itself."""
    ev = _t(spark, sf_dir)["events"]
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), "user_id",
        F.col("ts").alias("signup_ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"))
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts",
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"))
    step1 = temporal.asof_join(
        signups, purchases, key="user_id", left_ts="signup_ts", right_ts="ts",
        right_payload=["purchase_id", "purchase_ts"], tiebreak="purchase_id",
        direction="forward")
    # rows without a purchase can't match step 2; join them back after
    matched = step1.filter(F.col("purchase_ts").isNotNull())
    unmatched = step1.filter(F.col("purchase_ts").isNull())
    step2 = temporal.asof_join(
        matched, errors, key="user_id", left_ts="purchase_ts", right_ts="ts",
        right_payload=["error_id", "error_ts"], tiebreak="error_id",
        direction="forward")
    out = step2.unionByName(
        unmatched.withColumn("error_id", F.lit(None).cast("long"))
        .withColumn("error_ts", F.lit(None).cast("timestamp")))
    return (
        out.select(
            "signup_id", "user_id", "signup_ts", "purchase_id", "purchase_ts",
            "error_id", "error_ts",
            (F.col("purchase_id").isNotNull() & F.col("error_id").isNotNull())
            .cast("long").alias("complete"),
            F.when(
                F.col("error_id").isNotNull(),
                F.expr("(unix_micros(cast(error_ts as timestamp)) - "
                       "unix_micros(cast(signup_ts as timestamp))) "
                       "div 1000000")).alias("span_seconds"),
        )
    )


@query(
    "state_dwell_times",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS state, ts,
               LEAD(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS next_ts
        FROM events
    )
    SELECT state,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM((epoch_us(next_ts) - epoch_us(ts)) // 1000000) AS BIGINT)
               AS total_seconds,
           CAST(MAX((epoch_us(next_ts) - epoch_us(ts)) // 1000000) AS BIGINT)
               AS max_seconds
    FROM seq WHERE next_ts IS NOT NULL
    GROUP BY state ORDER BY state
    """,
)
def state_dwell_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-duration analysis: how long each entity dwells in a state
    before its next event (lead over the per-user timeline), rolled up
    per state — the state-machine residency metric behind MTTR-style
    ops reporting. One per-entity window over the event stream, whole-
    second integer arithmetic end to end."""
    e = _t(spark, sf_dir)["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", F.col("event_type").alias("state"), "ts",
        F.lead("ts").over(w).alias("next_ts"),
    ).filter(F.col("next_ts").isNotNull())
    secs = F.expr("(unix_micros(cast(next_ts as timestamp)) - "
                  "unix_micros(cast(ts as timestamp))) div 1000000")
    return (
        seq.groupBy("state")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum(secs).cast("long").alias("total_seconds"),
            F.max(secs).cast("long").alias("max_seconds"),
        )
    )


@query(
    "cusum_drift_days",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2
    ),
    ref AS (
        SELECT event_type,
               CAST(SUM(cnt) AS BIGINT) AS ref_sum,
               CAST(COUNT(*) AS BIGINT) AS n_ref
        FROM daily WHERE day < DATE '2024-01-08' GROUP BY 1
    ),
    dev AS (
        SELECT d.event_type, d.day, d.cnt,
               d.cnt * r.n_ref - r.ref_sum AS dev_scaled,
               r.ref_sum, r.n_ref
        FROM daily d JOIN ref r ON r.event_type = d.event_type
        WHERE d.day >= DATE '2024-01-08'
    ),
    cs AS (
        SELECT event_type, day, cnt, ref_sum, n_ref,
               SUM(dev_scaled) OVER (PARTITION BY event_type
                                     ORDER BY day) AS cusum_scaled
        FROM dev
    )
    SELECT event_type, day, cnt,
           CAST(cusum_scaled AS BIGINT) AS cusum_scaled,
           CAST(ABS(cusum_scaled) * 10 > ref_sum * 3 AS BIGINT) AS drifted
    FROM cs ORDER BY event_type, day
    """,
)
def cusum_drift_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily event volumes: deviations
    from the first-week reference accumulate per type; sustained drift
    pushes the cumulative sum past a fence a single spiky day cannot
    reach (the classic complement to the week-over-week flags of
    seasonal_anomaly_days). Deviations are integer-scaled by the
    reference day count — no float enters the verdict; the running sum
    is a type-partitioned window over |type|×|day| pre-aggregated
    rows."""
    e = _t(spark, sf_dir)["events"]
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    ref = (
        daily.filter(F.col("day") < F.lit("2024-01-08").cast("date"))
        .groupBy("event_type")
        .agg(F.sum("cnt").cast("long").alias("ref_sum"),
             F.count(F.lit(1)).cast("long").alias("n_ref"))
    )
    dev = (
        daily.filter(F.col("day") >= F.lit("2024-01-08").cast("date"))
        .join(F.broadcast(ref), "event_type")
        .withColumn("dev_scaled",
                    F.col("cnt") * F.col("n_ref") - F.col("ref_sum"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    return (
        dev.withColumn("cusum_scaled",
                       F.sum("dev_scaled").over(w).cast("long"))
        .select(
            "event_type", "day", "cnt", "cusum_scaled",
            (F.abs(F.col("cusum_scaled")) * 10 > F.col("ref_sum") * 3)
            .cast("long").alias("drifted"),
        )
    )


@query(
    "hourly_seasonality",
    oracle="""
    WITH hourly AS (
        SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, CAST(SUM(n_events) AS BIGINT) AS total
        FROM hourly GROUP BY 1
    )
    SELECT h.event_type, h.hr, h.n_events,
           CAST(h.n_events * 10000 // t.total AS BIGINT) AS share_bps
    FROM hourly h JOIN tot t ON t.event_type = h.event_type
    ORDER BY h.event_type, h.hr
    """,
)
def hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per event type with shares in
    exact basis points (integer floor division against the per-type
    total) — the load-shape fingerprint behind alert thresholds and
    capacity curves. Two aggs on (type, hour) / (type); the share join
    touches |type|×24 rows."""
    e = _t(spark, sf_dir)["events"]
    hourly = (
        e.groupBy("event_type", F.hour("ts").cast("long").alias("hr"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    tot = hourly.groupBy("event_type").agg(
        F.sum("n_events").cast("long").alias("total"))
    return (
        hourly.join(F.broadcast(tot), "event_type")
        .select(
            "event_type", "hr", "n_events",
            F.expr("n_events * 10000 div total").cast("long")
            .alias("share_bps"),
        )
    )


@query(
    "order_gap_profile",
    oracle="""
    WITH seq AS (
        SELECT o_custkey, o_orderdate,
               LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey)
                   AS prev_date
        FROM orders
    ),
    gaps AS (
        SELECT o_custkey,
               CAST(datediff('day', prev_date, o_orderdate) AS BIGINT)
                   AS gap_days
        FROM seq WHERE prev_date IS NOT NULL
    )
    SELECT CAST(gap_days // 30 AS BIGINT) AS gap_months,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(MIN(gap_days) AS BIGINT) AS min_days,
           CAST(MAX(gap_days) AS BIGINT) AS max_days
    FROM gaps GROUP BY 1 ORDER BY gap_months
    """,
)
def order_gap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap distribution: per-customer lag over the order
    timeline, gaps bucketed to 30-day months by integer division — the
    repurchase-cadence profile behind churn thresholds. The lag window
    is customer-partitioned over |orders| rows; everything downstream
    is integer day arithmetic."""
    o = _t(spark, sf_dir)["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey", "o_orderdate",
        F.lag("o_orderdate").over(w).alias("prev_date"),
    ).filter(F.col("prev_date").isNotNull())
    gaps = seq.select(
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.col("prev_date").cast("date"))
        .cast("long").alias("gap_days"))
    return (
        gaps.groupBy(F.expr("gap_days div 30").cast("long")
                     .alias("gap_months"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.min("gap_days").cast("long").alias("min_days"),
            F.max("gap_days").cast("long").alias("max_days"),
        )
    )
