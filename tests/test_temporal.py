"""Semantic tests for temporal joins: the scalable formulations must
match naive quadratic reference computations on small inputs."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from real_estate_bigdata_spark.operators import temporal as tm

T0 = datetime(2024, 1, 1)


def _ts(minutes: float) -> datetime:
    return T0 + timedelta(minutes=minutes)


def test_asof_join_matches_naive(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(5), 1.0), (2, 10, _ts(10), 2.0), (3, 20, _ts(3), 3.0),
         (4, 30, _ts(7), 4.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [(100, 10, _ts(4), 10.0), (101, 10, _ts(5), 11.0), (102, 10, _ts(9), 12.0),
         (103, 20, _ts(6), 13.0), (104, 40, _ts(1), 14.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        r.event_id: (r.r_event_id, r.r_ts, r.r_value)
        for r in tm.asof_join(left, right, on="user_id").collect()
    }
    # naive: latest right with ts <= left.ts, ties by max event_id
    lrows = left.collect()
    rrows = right.collect()
    for lr in lrows:
        cands = [r for r in rrows if r.user_id == lr.user_id and r.ts <= lr.ts]
        expected = (None, None, None)
        if cands:
            best = max(cands, key=lambda r: (r.ts, r.event_id))
            expected = (best.event_id, best.ts, best.value)
        assert out[lr.event_id] == expected, lr.event_id
    # every left row exactly once
    assert len(out) == len(lrows)
    # tie at equal ts matched (event 1 at t=5 sees right 101 at t=5)
    assert out[1][0] == 101
    # user with no rights at all -> NULLs survive
    assert out[4] == (None, None, None)


def test_asof_join_null_payload_not_torn(spark):
    """A NULL in one payload column of the matching right row must NOT
    be backfilled from an older right row (atomic struct carry)."""
    left = spark.createDataFrame(
        [(1, 10, _ts(5), 1.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [(100, 10, _ts(1), 5.0), (101, 10, _ts(2), None)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    (row,) = tm.asof_join(left, right, on="user_id").collect()
    # the matched row is R101 (latest <= ts); its NULL value must survive
    assert (row.r_event_id, row.r_ts, row.r_value) == (101, _ts(2), None)


def test_asof_join_one_shuffle(spark):
    """The as-of plan must contain exactly ONE exchange (the key
    partition) — no join-shaped second shuffle."""
    left = spark.createDataFrame(
        [(1, 10, _ts(5), 1.0)], "event_id long, user_id long, ts timestamp, value double"
    )
    plan = tm.asof_join(left, left, on="user_id")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_interval_join_matches_naive(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(0)), (2, 10, _ts(50)), (3, 20, _ts(0))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100, 10, _ts(30), 1.0), (101, 10, _ts(61), 2.0), (102, 20, _ts(0), 3.0),
         (103, 20, _ts(59), 4.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        (r.event_id, r.r_event_id)
        for r in tm.interval_join(left, right, on="user_id", width_seconds=3600).collect()
    }
    # (1,100): 30min in (0,60] yes; (1,101): 61min > 60 no; (2,101): 11min yes
    # (3,102): ts equal -> strict > excludes; (3,103): 59min yes
    assert out == {(1, 100), (2, 101), (3, 103)}


def test_bucketed_range_join_matches_naive(spark):
    intervals = spark.createDataFrame(
        [(1, _ts(0), _ts(90)), (2, _ts(120), _ts(130)), (3, _ts(500), _ts(700))],
        "iv_id long, start timestamp, end timestamp",
    )
    points = spark.createDataFrame(
        [(100, _ts(45.0)), (101, _ts(90.0)), (102, _ts(91.0)), (103, _ts(125.0)),
         (104, _ts(600.0)), (105, _ts(710.0))],
        "pt_id long, ts timestamp",
    )
    out = {
        (r.iv_id, r.r_pt_id)
        for r in tm.bucketed_range_join(
            intervals, points, "start", "end", bucket_seconds=1800
        ).collect()
    }
    naive = set()
    for iv in intervals.collect():
        for p in points.collect():
            if iv.start <= p.ts <= iv.end:
                naive.add((iv.iv_id, p.pt_id))
    assert out == naive and (1, 101) in out and (1, 102) not in out


def test_order_priority_interval_not_date_truncated(spark):
    """Q4's lateness threshold is o_orderdate + 60 DAYS as a TIMESTAMP:
    an order placed at 10:00 shipped 59d19h later is NOT late. date_add
    would truncate the threshold to midnight and miscount it."""
    from real_estate_bigdata_spark.operators.joins import order_priority_checking

    orders = spark.createDataFrame(
        [(1, datetime(1996, 2, 1, 10, 0), "1-URGENT")],
        "o_orderkey long, o_orderdate timestamp, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [(1, datetime(1996, 4, 1, 5, 0))],
        "l_orderkey long, l_shipdate timestamp",
    )
    out = order_priority_checking(orders, lineitem, late_days=60).collect()
    assert out == []
    # and one genuinely late lineitem flips it
    late = spark.createDataFrame(
        [(1, datetime(1996, 4, 2, 11, 0))], "l_orderkey long, l_shipdate timestamp"
    )
    out2 = order_priority_checking(orders, late, late_days=60).collect()
    assert [(r.o_orderpriority, r.order_count) for r in out2] == [("1-URGENT", 1)]


def test_resample_ffill_semantics(spark):
    """r11: in-bucket mean, gap rows carried forward and flagged, no
    extrapolation past a key's last observation, per-key isolation,
    validation."""
    import datetime as dt

    import pytest

    from real_estate_bigdata_spark.operators.temporal import resample_ffill

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(minutes=10), 10.0),
        (1, t0 + dt.timedelta(minutes=50), 20.0),   # same hour: mean 15
        (1, t0 + dt.timedelta(hours=3), 30.0),      # hours 1-2 filled
        (2, t0, 5.0),                               # singleton span
        (None, t0, 1.0),                            # NULL key excluded
        (3, None, 9.0),                              # NULL ts excluded
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r.user_id, r.bucket_ts.hour): (r.value, r.filled)
        for r in resample_ffill(df, "user_id", "ts", "value").collect()
    }
    assert got[(1, 0)] == (15.0, False)
    assert got[(1, 1)] == (15.0, True)
    assert got[(1, 2)] == (15.0, True)
    assert got[(1, 3)] == (30.0, False)
    assert got[(2, 0)] == (5.0, False)
    # no extrapolation: user 1 ends at hour 3, user 2 at hour 0
    assert len(got) == 5
    assert all(k[0] in (1, 2) for k in got)
    with pytest.raises(ValueError, match="granularity"):
        resample_ffill(df, "user_id", "ts", "value", granularity="month")


def test_rolling_time_agg_range_semantics(spark):
    """r11: inclusive [t-7d, t] RANGE frame — boundary event included,
    stale events dropped, identical timestamps are peers, NULL
    key/time rows excluded, validation."""
    import datetime as dt

    import pytest

    from real_estate_bigdata_spark.operators.temporal import rolling_time_agg

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(days=7), 30.0),    # exactly 7d: inclusive
        (1, t0 + dt.timedelta(days=7), 50.0),    # same ts: RANGE peer
        (1, t0 + dt.timedelta(days=15), 40.0),   # everything aged out
        (2, t0, 1.0),
        (None, t0, 9.0),
        (2, None, 9.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = rolling_time_agg(df, "user_id", "ts", "value").collect()
    assert len(got) == 5
    by = {}
    for r in got:
        by.setdefault((r.user_id, r.ts), []).append(
            (r.n_window, r.sum_window)
        )
    assert by[(1, t0)] == [(1, 10.0)]
    # the two same-timestamp events are peers: both see all 3 rows
    assert by[(1, t0 + dt.timedelta(days=7))] == [(3, 90.0)] * 2
    assert by[(1, t0 + dt.timedelta(days=15))] == [(1, 40.0)]
    with pytest.raises(ValueError, match="window_days"):
        rolling_time_agg(df, "user_id", "ts", "value", window_days=0)
