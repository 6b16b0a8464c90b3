"""Funnel + cohort-retention semantics (r11): ordered-entry funnels
with horizons, out-of-order exclusion, cohort offsets — crafted
fixtures where every number is hand-checkable."""

from __future__ import annotations

import pytest

from real_estate_bigdata_spark.operators.events import (
    cohort_retention,
    funnel_conversion,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, ty) for i, (ts, u, ty) in enumerate(rows)], SCHEMA
    )


class TestFunnel:
    def test_ordered_entry_and_out_of_order_excluded(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        m = lambda k: t0 + dt.timedelta(minutes=k)  # noqa: E731
        rows = [
            # u1: clean view -> click -> purchase
            (m(0), 1, "view"), (m(5), 1, "click"), (m(9), 1, "purchase"),
            # u2: purchase BEFORE the funnel starts, never after -> stops at click
            (m(0), 2, "purchase"), (m(1), 2, "view"), (m(2), 2, "click"),
            # u3: click before view only -> stops at view
            (m(0), 3, "click"), (m(1), 3, "view"),
            # u4: LATER in-order click still counts (early click ignored)
            (m(0), 4, "click"), (m(1), 4, "view"), (m(30), 4, "click"),
            # u5: never views -> not in the funnel at all
            (m(0), 5, "click"), (m(1), 5, "purchase"),
        ]
        got = {
            r.step: r
            for r in funnel_conversion(
                _ev(spark, rows), ["view", "click", "purchase"]
            ).collect()
        }
        assert got["view"].n_users == 4      # u1-u4
        assert got["click"].n_users == 3     # u1, u2, u4
        assert got["purchase"].n_users == 1  # u1
        assert got["view"].conv_from_prev is None
        assert got["click"].conv_from_first == pytest.approx(0.75)
        assert got["purchase"].conv_from_prev == pytest.approx(1 / 3, abs=1e-6)

    def test_within_hours_caps_each_hop(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        h = lambda k: t0 + dt.timedelta(hours=k)  # noqa: E731
        rows = [
            (h(0), 1, "view"), (h(1), 1, "click"),    # inside 2h
            (h(0), 2, "view"), (h(3), 2, "click"),    # outside 2h
            # u3: first click outside, but horizon is per-HOP from the
            # view entry, so the late click never qualifies
            (h(0), 3, "view"), (h(5), 3, "click"),
        ]
        got = {
            r.step: r.n_users
            for r in funnel_conversion(
                _ev(spark, rows), ["view", "click"], within_hours=2.0
            ).collect()
        }
        assert got == {"view": 3, "click": 1}

    def test_fractional_within_hours_is_not_truncated(self, spark):
        """within_hours=1.5 must cap at 90 minutes, not 60 (r12 ADVICE:
        make_interval(hours=...) silently truncates fractional hours;
        the implementation now uses the decimal-capable secs arg)."""
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        m = lambda k: t0 + dt.timedelta(minutes=k)  # noqa: E731
        rows = [
            (m(0), 1, "view"), (m(75), 1, "click"),   # 75 min: in 1.5h
            (m(0), 2, "view"), (m(100), 2, "click"),  # 100 min: out
            (m(0), 3, "view"), (m(90), 3, "click"),   # exactly 90: in (<=)
        ]
        got = {
            r.step: r.n_users
            for r in funnel_conversion(
                _ev(spark, rows), ["view", "click"], within_hours=1.5
            ).collect()
        }
        assert got == {"view": 3, "click": 2}

    def test_validates_steps(self, spark):
        df = _ev(spark, [])
        with pytest.raises(ValueError, match=">= 2 steps"):
            funnel_conversion(df, ["view"])
        with pytest.raises(ValueError, match="distinct"):
            funnel_conversion(df, ["view", "view"])


class TestCohortRetention:
    def test_weekly_triangle(self, spark):
        import datetime as dt

        # week of 2024-01-01 (Mon) and week of 2024-01-08
        rows = [
            (dt.datetime(2024, 1, 2), 1, "view"),    # cohort w0
            (dt.datetime(2024, 1, 10), 1, "view"),   # active w1
            (dt.datetime(2024, 1, 3), 2, "view"),    # cohort w0, only w0
            (dt.datetime(2024, 1, 9), 3, "view"),    # cohort w1
            (dt.datetime(2024, 1, 16), 3, "view"),   # active w1+1
        ]
        got = {
            (str(r.cohort), r.period_offset): (r.n_active, r.retention)
            for r in cohort_retention(_ev(spark, rows)).collect()
        }
        assert got[("2024-01-01", 0)] == (2, 1.0)
        assert got[("2024-01-01", 1)] == (1, 0.5)
        assert got[("2024-01-08", 0)] == (1, 1.0)
        assert got[("2024-01-08", 1)] == (1, 1.0)
        assert len(got) == 4

    def test_day_granularity_and_validation(self, spark):
        import datetime as dt

        rows = [
            (dt.datetime(2024, 1, 1, 8), 1, "view"),
            (dt.datetime(2024, 1, 3, 9), 1, "view"),
        ]
        got = {
            (str(r.cohort), r.period_offset): r.n_active
            for r in cohort_retention(_ev(spark, rows), period="day").collect()
        }
        assert got == {("2024-01-01", 0): 1, ("2024-01-01", 2): 1}
        with pytest.raises(ValueError, match="period"):
            cohort_retention(_ev(spark, rows), period="month")
