"""Temporal / event-sequence operators: as-of join, sessionization,
activity streaks, funnels, cohort retention.

These are the event-analytics operators a change-tracking engine grows
into (the reference's change timeline, `internal/changes/change_storage.go`,
stops at per-resource ORDER BY timestamp; these generalize it to
cross-stream temporal correlation).

Scale shapes:

* **as-of join** is the union-merge formulation: tag both streams, union,
  one window pass per key carries the latest right-side row forward.
  ONE shuffle on the join key, zero inequality joins — the naive
  `l.ts >= r.ts` theta join is quadratic per key and is exactly what a
  100 TB as-of must never do.
* **sessionize / streaks** are gaps-and-islands: lag + running sum inside
  a per-entity window — one shuffle on the entity key, no self-joins.
* **funnel** is a single-pass sorted fold per entity (one shuffle, a
  JVM-side aggregate() walks each entity's step events in time order);
  **cohort retention** is two aggregations over the same shuffle key.

All outputs are integer/timestamp-typed (no float drift), so the DuckDB
oracles replay them hash-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str | list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              right_payload: list[str] | None = None,
              tiebreak: str | None = None,
              direction: str = "backward",
              tolerance_seconds: int | None = None) -> DataFrame:
    """For each left row, attach the closest right row on the same key
    (a single column or a list — pandas ``merge_asof`` ``by`` parity):
    the latest with ``right.ts <= left.ts`` (``direction="backward"``,
    the default) or the earliest with ``right.ts >= left.ts``
    (``"forward"``). Matches are inclusive; left rows with no candidate
    keep NULL payload. ``tolerance_seconds`` voids matches farther than
    the given gap (pandas ``merge_asof`` tolerance semantics).

    ``right_payload`` names the right columns to carry (default: all
    non-key, non-ts columns). ``tiebreak`` orders right rows that share a
    timestamp (highest wins) so the match is deterministic.

    Union-merge plan: rows of both sides are unioned with a side tag,
    sorted per key by (ts, side, tiebreak) inside one window, and the
    payload is carried forward with ``last(ignorenulls=True)``. Right
    rows sort before left rows at equal ts, which is what makes the
    join inclusive; ``forward`` simply reverses the time ordering.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    keys = [key] if isinstance(key, str) else list(key)
    if right_payload is None:
        right_payload = [c for c in right.columns
                         if c not in keys and c != right_ts]

    # The payload travels as ONE struct so the carried match is row-atomic
    # (independently-carried columns could mix two right rows when a
    # payload column is NULL). The matched timestamp rides along for the
    # tolerance check.
    pay_struct = F.struct(
        *[F.col(c).alias(c) for c in right_payload],
        F.col(right_ts).cast("timestamp").alias("__rts"),
    )
    pay_type = right.select(pay_struct.alias("p")).schema["p"].dataType
    key_cols = [f"__key{i}" for i in range(len(keys))]
    r = right.select(
        *[F.col(k).alias(kc) for k, kc in zip(keys, key_cols)],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        pay_struct.alias("__pay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    tb = (F.col("__pay")[tiebreak] if tiebreak else F.lit(0))
    l = left.select(
        *[F.col(k).alias(kc) for k, kc in zip(keys, key_cols)],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(pay_type).alias("__pay"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_order, F.col("__side"), tb)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l)
    out = (
        merged.select(
            "__side",
            F.col("__ts").alias("__lts"),
            *[f"__l_{c}" for c in left.columns],
            F.last("__pay", ignorenulls=True).over(w).alias("__pay"),
        )
        .filter(F.col("__side") == 1)
    )
    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_micros(F.col("__pay")["__rts"])
            - F.unix_micros(F.col("__lts").cast("timestamp"))
        )
        out = out.withColumn(
            "__pay",
            F.when(gap <= tolerance_seconds * 1_000_000, F.col("__pay")),
        )
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col("__pay")[c].alias(c) for c in right_payload],
    )


def sessionize(events: DataFrame, entity_col: str, ts_col: str,
               gap_seconds: int, order_tiebreak: str) -> DataFrame:
    """Assign gaps-and-islands session ids: a new session starts when the
    gap to the previous event of the same entity exceeds ``gap_seconds``.

    Adds ``session_id`` (1-based per entity, BIGINT). The comparison is
    exact (microseconds), no truncation ambiguity across engines.
    """
    w = Window.partitionBy(entity_col).orderBy(F.col(ts_col), F.col(order_tiebreak))
    # parquet NTZ timestamps need an explicit TIMESTAMP cast for
    # unix_micros; the session timezone is pinned UTC so the cast is a
    # pure reinterpretation.
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | (us - prev > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )


def session_stats(events: DataFrame, entity_col: str, ts_col: str,
                  gap_seconds: int, order_tiebreak: str) -> DataFrame:
    """One row per (entity, session): event count and time bounds."""
    s = sessionize(events, entity_col, ts_col, gap_seconds, order_tiebreak)
    return s.groupBy(entity_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("started"),
        F.max(ts_col).alias("ended"),
    )


def activity_streaks(events: DataFrame, entity_col: str, ts_col: str) -> DataFrame:
    """Longest run of consecutive active days per entity.

    Classic islands trick: day − row_number(day) is constant within a
    consecutive run, so the streak is a count per (entity, anchor).
    Two window-free aggregations + one per-entity window — single
    shuffle key throughout.
    """
    days = events.select(
        F.col(entity_col).alias("entity"),
        F.to_date(F.col(ts_col)).alias("day"),
    ).distinct()
    w = Window.partitionBy("entity").orderBy("day")
    runs = (
        days.withColumn("rn", F.row_number().over(w))
        .withColumn("anchor", F.date_sub(F.col("day"), F.col("rn")))
        .groupBy("entity", "anchor")
        .agg(F.count(F.lit(1)).alias("streak"))
    )
    return (
        runs.groupBy("entity")
        .agg(F.max("streak").cast("long").alias("max_streak"))
        .withColumnRenamed("entity", entity_col)
    )


def funnel(events: DataFrame, entity_col: str, ts_col: str, type_col: str,
           steps: list[str]) -> DataFrame:
    """Ordered-funnel reach: entities whose step k+1 happens strictly
    after their first qualifying step k.

    Returns (step, entities): step name in funnel order, BIGINT count of
    entities that reached it. Single-pass plan: per entity, the
    step-relevant events are collected and sorted once, and a JVM-side
    ``aggregate`` fold walks them in time order carrying the K reached
    timestamps — ONE shuffle on the entity key + a 1-row final rollup,
    vs the naive K join chains. Per-entity memory is bounded by that
    entity's step-typed event count (filtered before the collect).
    Step types must be distinct.
    """
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct")
    k_steps = len(steps)
    pairs = F.array_sort(
        F.collect_list(
            F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et"))
        )
    )
    init = F.struct(
        *[F.lit(None).cast("timestamp").alias(f"t{k}") for k in range(k_steps)]
    )

    def fold(acc, x):
        fields = []
        for k, name in enumerate(steps):
            hit = (x["et"] == name) & acc[f"t{k}"].isNull()
            if k > 0:
                hit = hit & acc[f"t{k - 1}"].isNotNull() & (
                    x["ts"].cast("timestamp") > acc[f"t{k - 1}"]
                )
            fields.append(
                F.when(hit, x["ts"].cast("timestamp"))
                .otherwise(acc[f"t{k}"])
                .alias(f"t{k}")
            )
        return F.struct(*fields)

    per_entity = (
        events.filter(F.col(type_col).isin(list(steps)))
        .groupBy(entity_col)
        .agg(F.aggregate(pairs, init, fold).alias("st"))
    )
    rollup = per_entity.agg(
        *[
            F.count(F.col(f"st.t{k}")).cast("long").alias(f"c{k}")
            for k in range(k_steps)
        ]
    )
    melted = rollup.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"step{k + 1}_{name}").alias("step"),
                        F.col(f"c{k}").alias("entities"),
                    )
                    for k, name in enumerate(steps)
                ]
            )
        ).alias("r")
    )
    return melted.select("r.step", "r.entities")


def cohort_retention(events: DataFrame, entity_col: str, ts_col: str) -> DataFrame:
    """Weekly cohort retention triangle.

    Cohort = ISO week of the entity's first event; for every later-or-equal
    active week, count distinct entities of that cohort still active.
    Returns (cohort, week_offset, users). Two aggregations sharing the
    entity-key shuffle; the cohort⋈activity join is on the entity key.
    """
    first = events.groupBy(F.col(entity_col).alias("entity")).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort")
    )
    active = events.select(
        F.col(entity_col).alias("entity"),
        F.date_trunc("week", F.col(ts_col)).alias("wk"),
    ).distinct()
    return (
        active.join(first, "entity")
        .groupBy(
            "cohort",
            (F.floor(F.datediff(F.col("wk"), F.col("cohort")) / 7))
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("entity").alias("users"))
    )


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_ts: str, start_ts: str, end_ts: str,
                  bucket_seconds: int = 3600,
                  point_keys: list[str] | None = None,
                  interval_keys: list[str] | None = None,
                  max_buckets_per_interval: int = 100_000) -> DataFrame:
    """Range join: each point row matched to every interval containing it
    (``start <= t < end``), without the cartesian product Spark would
    plan for a bare inequality join.

    Blocking: intervals are exploded to the fixed-width time buckets they
    overlap, points map to exactly one bucket, and the join is a plain
    equi-join on bucket with the interval predicate as a residual filter.
    Shuffle volume is |points| + |intervals| x avg_buckets_per_interval —
    pick ``bucket_seconds`` near the typical interval length so the
    expansion factor stays small. An interval column that is NULL or
    inverted (end <= start) contributes nothing.

    Returns the selected point columns + interval columns, one row per
    containment. Column name collisions must be resolved by the caller.
    """
    p_cols = point_keys if point_keys is not None else points.columns
    i_cols = interval_keys if interval_keys is not None else intervals.columns
    b = F.lit(bucket_seconds).cast("long")
    p_us = F.unix_micros(F.col(point_ts).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_ts).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_ts).cast("timestamp"))
    us_per_bucket = b * 1_000_000

    p = points.select(
        *p_cols, F.floor(p_us / us_per_bucket).alias("__bucket"),
        p_us.alias("__p_us"),
    )
    # Loud failure beats a silent multi-billion-row explode: an interval
    # spanning max_buckets_per_interval buckets means bucket_seconds is
    # mis-sized for this data (raise it, or pre-split giant intervals).
    first_bucket = F.floor(s_us / us_per_bucket)
    last_bucket = F.floor((e_us - 1) / us_per_bucket)
    guard = F.when(
        last_bucket - first_bucket >= max_buckets_per_interval,
        F.raise_error(F.lit(
            f"interval_join: an interval spans >= {max_buckets_per_interval} "
            f"buckets of {bucket_seconds}s — raise bucket_seconds or split "
            "the interval"))
    ).otherwise(last_bucket)
    i = (
        intervals.filter(
            F.col(start_ts).isNotNull() & F.col(end_ts).isNotNull()
            & (e_us > s_us)
        )
        .select(
            *i_cols,
            F.explode(
                # end is exclusive: a zero-length tail bucket is never
                # emitted because (e_us - 1) anchors the last bucket.
                F.sequence(first_bucket, guard)
            ).alias("__bucket"),
            s_us.alias("__s_us"),
            e_us.alias("__e_us"),
        )
    )
    return (
        p.join(i, "__bucket")
        .filter((F.col("__p_us") >= F.col("__s_us"))
                & (F.col("__p_us") < F.col("__e_us")))
        .select(*p_cols, *i_cols)
    )


def interpolate_linear(df: DataFrame, entity_col: str, ts_col: str,
                       value_col: str, order_tiebreak: str,
                       out_col: str = "interp") -> DataFrame:
    """Time-weighted linear interpolation of missing values.

    Rows whose ``value_col`` is NULL get
    ``prev + (next - prev) * (t - t_prev) / (t_next - t_prev)`` from the
    nearest non-null observations on either side (per entity, ordered by
    ``(ts, tiebreak)``). Leading/trailing NULLs (no neighbor on one side)
    stay NULL — interpolation never extrapolates; chain with LOCF
    (``last(ignorenulls)``) if edge filling is wanted.

    Scale shape: two window passes over the SAME per-entity shuffle
    (Catalyst plans one Sort+Exchange, both windows ride it) — the
    standard imputation step before model training, at one shuffle on the
    entity key. Equal-timestamp neighbors fall back to the midpoint
    (the time fraction is 0/0 there).

    Generalizes the reference's per-resource timeline ordering
    (internal/changes/change_storage.go:249-272) to value reconstruction
    between observations.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w_back = (
        Window.partitionBy(entity_col)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_fwd = (
        Window.partitionBy(entity_col)
        .orderBy(ts_col, order_tiebreak)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    obs_val = F.when(v.isNotNull(), v)
    obs_us = F.when(v.isNotNull(), us)
    prev_v = F.last(obs_val, ignorenulls=True).over(w_back)
    prev_us = F.last(obs_us, ignorenulls=True).over(w_back)
    next_v = F.first(obs_val, ignorenulls=True).over(w_fwd)
    next_us = F.first(obs_us, ignorenulls=True).over(w_fwd)
    frac = F.when(next_us == prev_us, F.lit(0.5)).otherwise(
        (us - prev_us) / (next_us - prev_us)
    )
    return df.withColumn(
        out_col,
        F.when(v.isNotNull(), v).otherwise(prev_v + (next_v - prev_v) * frac),
    )


def ohlc_bars(df: DataFrame, ts_col: str, value_col: str, tiebreak_col: str,
              by: tuple[str, ...] = (), bucket: str = "hour") -> DataFrame:
    """Time-bar downsampling: open/high/low/close + event count per
    (group, time-bucket) — the resample pass that turns a raw event
    stream into fixed-interval bars for dashboards / models.

    open/close are ``min_by``/``max_by`` over the total order
    (ts, tiebreak), so bars are deterministic even with equal
    timestamps. All five aggregates are commutative partial aggregates
    (map-side combine); the single shuffle is on the (group, bucket)
    key — at 100 TB the reduce state is |groups|x|buckets| rows, never
    the raw events.

    Returns (*by, bar_ts, open, high, low, close, n_events).
    """
    ordk = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return (
        df.groupBy(*by, F.date_trunc(bucket, F.col(ts_col)).alias("bar_ts"))
        .agg(
            F.min_by(value_col, ordk).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, ordk).alias("close"),
            F.count("*").alias("n_events"),
        )
    )
