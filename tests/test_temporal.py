"""Unit semantics for operators/temporal.py — the edge cases the sf0.01
differential can't isolate: inclusive as-of matching, tie-breaks,
row-atomic payload carry, gap boundaries, strict funnel ordering."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from corkscrew_spark.operators import temporal


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_inclusive_and_unmatched(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, lts=_ts("2024-01-01T10:00:00"), lid=100),  # exact-ts match
            Row(k=1, lts=_ts("2024-01-01T09:00:00"), lid=101),  # before any right
            Row(k=2, lts=_ts("2024-01-01T12:00:00"), lid=102),  # no right rows at all
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rts=_ts("2024-01-01T10:00:00"), val="a"),
            Row(k=1, rts=_ts("2024-01-01T11:00:00"), val="b"),
        ]
    )
    out = {
        r.lid: r.val
        for r in temporal.asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts",
            right_payload=["val"],
        ).collect()
    }
    assert out == {100: "a", 101: None, 102: None}


def test_asof_tiebreak_picks_highest(spark):
    left = spark.createDataFrame([Row(k=1, lts=_ts("2024-01-01T10:00:00"), lid=1)])
    right = spark.createDataFrame(
        [
            Row(k=1, rts=_ts("2024-01-01T09:00:00"), rid=5, val="low"),
            Row(k=1, rts=_ts("2024-01-01T09:00:00"), rid=9, val="high"),
        ]
    )
    rows = temporal.asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        right_payload=["rid", "val"], tiebreak="rid",
    ).collect()
    assert rows[0].rid == 9 and rows[0].val == "high"


def test_asof_payload_is_row_atomic(spark):
    """A NULL inside the latest payload must NOT be backfilled from an
    older right row — the struct carry keeps the match row-atomic."""
    left = spark.createDataFrame([Row(k=1, lts=_ts("2024-01-01T12:00:00"), lid=1)])
    right = spark.createDataFrame(
        [
            Row(k=1, rts=_ts("2024-01-01T10:00:00"), a="old-a", b="old-b"),
            Row(k=1, rts=_ts("2024-01-01T11:00:00"), a="new-a", b=None),
        ]
    )
    row = temporal.asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        right_payload=["a", "b"],
    ).collect()[0]
    assert (row.a, row.b) == ("new-a", None)


def test_sessionize_gap_boundary(spark):
    """Exactly-at-gap stays in the session; one microsecond over splits."""
    ev = spark.createDataFrame(
        [
            Row(u=1, ts=_ts("2024-01-01T10:00:00"), eid=1),
            Row(u=1, ts=_ts("2024-01-01T10:30:00"), eid=2),          # == 1800s
            Row(u=1, ts=_ts("2024-01-01T11:00:00.000001"), eid=3),   # 1800.000001s
        ]
    )
    got = {
        r.eid: r.session_id
        for r in temporal.sessionize(ev, "u", "ts", 1800, "eid").collect()
    }
    assert got == {1: 1, 2: 1, 3: 2}


def test_funnel_strictly_after(spark):
    """A step-2 event at the same instant as step 1 does not count."""
    t0 = _ts("2024-01-01T10:00:00")
    ev = spark.createDataFrame(
        [
            Row(u=1, ts=t0, et="view"),
            Row(u=1, ts=t0, et="click"),                      # simultaneous: no
            Row(u=2, ts=t0, et="view"),
            Row(u=2, ts=_ts("2024-01-01T10:01:00"), et="click"),  # after: yes
            Row(u=3, ts=t0, et="click"),                      # click w/o view: no
        ]
    )
    got = {r.step: r.entities for r in
           temporal.funnel(ev, "u", "ts", "et", ["view", "click"]).collect()}
    assert got == {"step1_view": 2, "step2_click": 1}


def test_activity_streaks_gap_resets(spark):
    ev = spark.createDataFrame(
        [Row(u=1, ts=_ts(f"2024-01-0{d}T09:00:00")) for d in (1, 2, 3, 5, 6)]
        + [Row(u=2, ts=_ts("2024-01-01T09:00:00"))]
        + [Row(u=2, ts=_ts("2024-01-01T17:00:00"))]  # same day twice: streak 1
    )
    got = {r.u: r.max_streak for r in
           temporal.activity_streaks(ev, "u", "ts").collect()}
    assert got == {1: 3, 2: 1}


def test_cohort_retention_offsets(spark):
    ev = spark.createDataFrame(
        [
            Row(u=1, ts=_ts("2024-01-01T09:00:00")),  # Mon wk0
            Row(u=1, ts=_ts("2024-01-10T09:00:00")),  # wk1
            Row(u=2, ts=_ts("2024-01-02T09:00:00")),  # wk0 cohort
        ]
    )
    rows = temporal.cohort_retention(ev, "u", "ts").collect()
    got = {(r.week_offset): r.users for r in rows}
    assert got == {0: 2, 1: 1}


def test_interval_join_containment(spark):
    pts = spark.createDataFrame(
        [
            Row(pid=1, ts=_ts("2024-01-01T10:30:00")),
            Row(pid=2, ts=_ts("2024-01-01T11:00:00")),  # == end: excluded
            Row(pid=3, ts=_ts("2024-01-01T10:00:00")),  # == start: included
            Row(pid=4, ts=_ts("2024-01-02T00:00:00")),  # no interval
        ]
    )
    iv = spark.createDataFrame(
        [
            Row(iid=10, s=_ts("2024-01-01T10:00:00"), e=_ts("2024-01-01T11:00:00")),
            Row(iid=11, s=_ts("2024-01-01T10:15:00"), e=_ts("2024-01-01T10:45:00")),
            Row(iid=12, s=_ts("2024-01-01T12:00:00"), e=_ts("2024-01-01T12:00:00")),  # empty
        ]
    )
    got = sorted(
        (r.pid, r.iid)
        for r in temporal.interval_join(
            pts, iv, "ts", "s", "e",
            bucket_seconds=600, point_keys=["pid"], interval_keys=["iid"],
        ).collect()
    )
    assert got == [(1, 10), (1, 11), (3, 10)]


def test_interval_join_bucket_width_invariance(spark):
    """The answer must not depend on the blocking bucket width."""
    pts = spark.createDataFrame(
        [Row(pid=i, ts=_ts(f"2024-01-01T{h:02d}:{m:02d}:00"))
         for i, (h, m) in enumerate([(9, 59), (10, 0), (13, 30), (23, 59)])]
    )
    iv = spark.createDataFrame(
        [
            Row(iid=1, s=_ts("2024-01-01T10:00:00"), e=_ts("2024-01-01T14:00:00")),
            Row(iid=2, s=_ts("2024-01-01T13:00:00"), e=_ts("2024-01-02T01:00:00")),
        ]
    )
    results = []
    for width in (60, 3600, 86400):
        rows = temporal.interval_join(
            pts, iv, "ts", "s", "e", bucket_seconds=width,
            point_keys=["pid"], interval_keys=["iid"],
        ).collect()
        results.append(sorted((r.pid, r.iid) for r in rows))
    assert results[0] == results[1] == results[2] == [(1, 1), (2, 1), (2, 2), (3, 2)]


# ---------------------------------------------------------------------------
# Property-based: the union-merge as-of join and windowed sessionization
# must agree with a brute-force reference on arbitrary inputs.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EPOCH = _ts("2024-01-01T00:00:00")
_TS = st.integers(min_value=0, max_value=5000)  # offsets in seconds


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lefts=st.lists(st.tuples(st.integers(0, 3), _TS), min_size=1, max_size=12),
    rights=st.lists(st.tuples(st.integers(0, 3), _TS), min_size=0, max_size=12),
)
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    from datetime import timedelta

    left = spark.createDataFrame(
        [Row(k=k, lts=_EPOCH + timedelta(seconds=s), lid=i)
         for i, (k, s) in enumerate(lefts)]
    )
    right = spark.createDataFrame(
        [Row(k=k, rts=_EPOCH + timedelta(seconds=s), rid=i)
         for i, (k, s) in enumerate(rights)],
        schema="k int, rts timestamp, rid int",
    )
    got = {
        r.lid: r.rid
        for r in temporal.asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts",
            right_payload=["rid"], tiebreak="rid",
        ).collect()
    }
    for i, (k, s) in enumerate(lefts):
        cands = [(rs, j) for j, (rk, rs) in enumerate(rights)
                 if rk == k and rs <= s]
        expect = max(cands)[1] if cands else None
        assert got[i] == expect, (i, k, s, cands)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=st.lists(st.tuples(st.integers(0, 2), _TS), min_size=1, max_size=15),
    gap=st.integers(min_value=1, max_value=1000),
)
def test_sessionize_matches_bruteforce(spark, events, gap):
    from datetime import timedelta

    df = spark.createDataFrame(
        [Row(u=u, ts=_EPOCH + timedelta(seconds=s), eid=i)
         for i, (u, s) in enumerate(events)]
    )
    got = {r.eid: r.session_id
           for r in temporal.sessionize(df, "u", "ts", gap, "eid").collect()}
    # brute force: sort each user's events by (ts, eid), split on gap
    by_user: dict[int, list[tuple[int, int]]] = {}
    for i, (u, s) in enumerate(events):
        by_user.setdefault(u, []).append((s, i))
    for u, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        for s, i in evs:
            if prev is None or s - prev > gap:
                sid += 1
            prev = s
            assert got[i] == sid, (u, s, i, gap, evs)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    points=st.lists(_TS, min_size=1, max_size=10),
    intervals=st.lists(st.tuples(_TS, _TS), min_size=1, max_size=8),
    bucket=st.sampled_from([60, 600, 7200]),
)
def test_interval_join_matches_bruteforce(spark, points, intervals, bucket):
    from datetime import timedelta

    pts = spark.createDataFrame(
        [Row(pid=i, ts=_EPOCH + timedelta(seconds=s)) for i, s in enumerate(points)]
    )
    iv = spark.createDataFrame(
        [Row(iid=i, s=_EPOCH + timedelta(seconds=min(a, b)),
             e=_EPOCH + timedelta(seconds=max(a, b)))
         for i, (a, b) in enumerate(intervals)]
    )
    got = sorted(
        (r.pid, r.iid)
        for r in temporal.interval_join(
            pts, iv, "ts", "s", "e", bucket_seconds=bucket,
            point_keys=["pid"], interval_keys=["iid"],
        ).collect()
    )
    expect = sorted(
        (i, j)
        for i, p in enumerate(points)
        for j, (a, b) in enumerate(intervals)
        if min(a, b) <= p < max(a, b)
    )
    assert got == expect


def test_interval_join_rejects_pathological_width(spark):
    """A years-long interval against second buckets fails loudly instead
    of exploding into billions of bucket rows."""
    import pytest as _pytest

    pts = spark.createDataFrame([Row(pid=1, ts=_ts("2024-01-01T00:00:00"))])
    iv = spark.createDataFrame(
        [Row(iid=1, s=_ts("2000-01-01T00:00:00"), e=_ts("2030-01-01T00:00:00"))]
    )
    with _pytest.raises(Exception, match="interval_join"):
        temporal.interval_join(
            pts, iv, "ts", "s", "e", bucket_seconds=1,
            point_keys=["pid"], interval_keys=["iid"],
        ).collect()


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), _TS, st.sampled_from(["a", "b", "c"])),
        min_size=1, max_size=20),
)
def test_funnel_matches_bruteforce(spark, events):
    from datetime import timedelta

    df = spark.createDataFrame(
        [Row(u=u, ts=_EPOCH + timedelta(seconds=s), et=et)
         for u, s, et in events]
    )
    got = {r.step: r.entities for r in
           temporal.funnel(df, "u", "ts", "et", ["a", "b", "c"]).collect()}
    # brute force per user: strictly-increasing min-times through a, b, c
    reached = [0, 0, 0]
    for u in {u for u, _, _ in events}:
        evs = [(s, et) for uu, s, et in events if uu == u]
        t_prev = None
        for step_i, step in enumerate(["a", "b", "c"]):
            cands = [s for s, et in evs
                     if et == step and (t_prev is None or s > t_prev)]
            if not cands:
                break
            t_prev = min(cands)
            reached[step_i] += 1
    assert got == {"step1_a": reached[0], "step2_b": reached[1],
                   "step3_c": reached[2]}


def test_asof_forward_direction(spark):
    left = spark.createDataFrame([Row(k=1, lts=_ts("2024-01-01T10:00:00"), lid=1)])
    right = spark.createDataFrame(
        [
            Row(k=1, rts=_ts("2024-01-01T09:00:00"), rid=1),   # before: ignored
            Row(k=1, rts=_ts("2024-01-01T10:30:00"), rid=2),   # earliest after
            Row(k=1, rts=_ts("2024-01-01T11:00:00"), rid=3),
        ]
    )
    row = temporal.asof_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        right_payload=["rid"], direction="forward",
    ).collect()[0]
    assert row.rid == 2


def test_asof_tolerance_voids_far_matches(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, lts=_ts("2024-01-01T10:00:00"), lid=1),  # 30 min gap: keep
            Row(k=2, lts=_ts("2024-01-01T10:00:00"), lid=2),  # 2 h gap: void
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rts=_ts("2024-01-01T09:30:00"), rid=10),
            Row(k=2, rts=_ts("2024-01-01T08:00:00"), rid=20),
        ]
    )
    got = {
        r.lid: r.rid
        for r in temporal.asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts",
            right_payload=["rid"], tolerance_seconds=3600,
        ).collect()
    }
    assert got == {1: 10, 2: None}


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 20)),
                    min_size=1, max_size=25),
)
def test_activity_streaks_matches_bruteforce(spark, events):
    from datetime import timedelta

    df = spark.createDataFrame(
        [Row(u=u, ts=_EPOCH + timedelta(days=d, hours=u)) for u, d in events]
    )
    got = {r.u: r.max_streak for r in
           temporal.activity_streaks(df, "u", "ts").collect()}
    for u in {u for u, _ in events}:
        days = sorted({d for uu, d in events if uu == u})
        best = run = 1
        for a, b in zip(days, days[1:]):
            run = run + 1 if b == a + 1 else 1
            best = max(best, run)
        assert got[u] == best, (u, days, got[u], best)


class TestInterpolateLinear:
    def _df(self, spark, rows):
        from pyspark.sql.types import (DoubleType, LongType, StructField,
                                       StructType, TimestampType)
        import datetime as dt
        schema = StructType([
            StructField("e", LongType()), StructField("i", LongType()),
            StructField("ts", TimestampType()), StructField("v", DoubleType()),
        ])
        base = dt.datetime(2025, 1, 1)
        data = [(e, i, base + dt.timedelta(seconds=s), v)
                for e, i, s, v in rows]
        return spark.createDataFrame(data, schema)

    def _run(self, spark, rows):
        from corkscrew_spark.operators import temporal
        df = self._df(spark, rows)
        out = temporal.interpolate_linear(df, "e", "ts", "v", "i")
        return {(r.e, r.i): r.interp for r in out.collect()}

    def test_time_weighted_interior(self, spark):
        got = self._run(spark, [
            (1, 1, 0, 10.0), (1, 2, 10, None), (1, 3, 40, 40.0),
        ])
        # 10s of a 40s gap: 10 + 30 * 0.25
        assert got[(1, 2)] == pytest.approx(17.5)

    def test_edges_never_extrapolate(self, spark):
        got = self._run(spark, [
            (1, 1, 0, None), (1, 2, 10, 5.0), (1, 3, 20, None),
        ])
        assert got[(1, 1)] is None and got[(1, 3)] is None
        assert got[(1, 2)] == 5.0

    def test_equal_timestamp_midpoint(self, spark):
        got = self._run(spark, [
            (1, 1, 5, 2.0), (1, 2, 5, None), (1, 3, 5, 6.0),
        ])
        assert got[(1, 2)] == pytest.approx(4.0)

    def test_entities_independent(self, spark):
        got = self._run(spark, [
            (1, 1, 0, 1.0), (1, 2, 5, None), (1, 3, 10, 3.0),
            (2, 1, 0, 100.0), (2, 2, 5, None), (2, 3, 10, 200.0),
        ])
        assert got[(1, 2)] == pytest.approx(2.0)
        assert got[(2, 2)] == pytest.approx(150.0)


class TestOhlcBars:
    def test_bar_semantics_and_tie_break(self, spark):
        from corkscrew_spark.operators import temporal
        rows = [
            # same timestamp for the first two: event_id breaks the tie
            (1, "2024-01-01 10:00:05", 50.0),
            (0, "2024-01-01 10:00:05", 10.0),
            (2, "2024-01-01 10:30:00", 99.0),
            (3, "2024-01-01 10:59:59", 20.0),
            (4, "2024-01-01 11:00:00", 7.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts string, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        bars = {r.bar_ts.hour: r
                for r in temporal.ohlc_bars(df, "ts", "value", "event_id").collect()}
        b10 = bars[10]
        assert b10.open == 10.0    # event_id 0 wins the equal-ts tie
        assert b10.high == 99.0 and b10.low == 10.0
        assert b10.close == 20.0 and b10.n_events == 4
        assert bars[11].open == bars[11].close == 7.0

    def test_grouped_bars(self, spark):
        from corkscrew_spark.operators import temporal
        df = spark.createDataFrame(
            [(1, "a", "2024-01-01 10:05:00", 1.0),
             (2, "b", "2024-01-01 10:06:00", 2.0)],
            "event_id long, k string, ts string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = temporal.ohlc_bars(df, "ts", "value", "event_id", by=("k",)).collect()
        assert {(r.k, r.n_events) for r in out} == {("a", 1), ("b", 1)}


def test_asof_join_composite_key(spark):
    """Multi-column key (pandas merge_asof `by` list): matches only
    where EVERY key column agrees."""
    import datetime as dt

    from corkscrew_spark.operators.temporal import asof_join

    def ts(h):
        return dt.datetime(2024, 1, 1, h)

    quotes = spark.createDataFrame(
        [("acct1", "AAA", ts(9), 10.0), ("acct1", "BBB", ts(9), 20.0),
         ("acct2", "AAA", ts(9), 99.0), ("acct1", "AAA", ts(11), 11.0)],
        "account string, symbol string, ts timestamp, px double")
    trades = spark.createDataFrame(
        [("acct1", "AAA", ts(10)), ("acct1", "BBB", ts(10)),
         ("acct2", "AAA", ts(10)), ("acct2", "BBB", ts(10))],
        "account string, symbol string, ts timestamp")

    got = {(r.account, r.symbol): r.px
           for r in asof_join(trades, quotes,
                              key=["account", "symbol"]).collect()}
    assert got == {("acct1", "AAA"): 10.0, ("acct1", "BBB"): 20.0,
                   ("acct2", "AAA"): 99.0, ("acct2", "BBB"): None}
