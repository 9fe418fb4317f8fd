"""Resample operator tests — port of borsa-core/tests/resample_props.rs
properties and doc examples (resample.rs:322-480)."""

from __future__ import annotations

from decimal import Decimal

from borsa_spark.operators import (
    resample_to_daily,
    resample_to_minutes,
    resample_to_weekly,
)

from .conftest import candle, make_candles, ts

DAY = 86_400


def rows_by_ts(df):
    return {r["ts"]: r for r in df.collect()}


def test_daily_ohlc_rules(spark):
    # Two days: day0 has 3 candles, day1 has 1. OHLC first/max/min/last/sum.
    df = make_candles(
        spark,
        [
            candle(sec=3600, o=10, h=12, l=9, c=11, volume=100, seq=0),
            candle(sec=7200, o=11, h=15, l=10, c=14, volume=200, seq=1),
            candle(sec=10800, o=14, h=14, l=8, c=9, volume=None, seq=2),
            candle(sec=DAY + 60, o=20, h=21, l=19, c=20, volume=5, seq=3),
        ],
    )
    out = rows_by_ts(resample_to_daily(df))
    assert set(out) == {ts(0), ts(DAY)}
    d0 = out[ts(0)]
    assert d0["open"] == Decimal("10") and d0["close"] == Decimal("9")
    assert d0["high"] == Decimal("15") and d0["low"] == Decimal("8")
    assert d0["volume"] == 300
    assert d0["close_unadj"] is None
    d1 = out[ts(DAY)]
    assert d1["open"] == d1["close"] == Decimal("20") and d1["volume"] == 5


def test_all_null_volume_is_null(spark):
    df = make_candles(
        spark,
        [candle(sec=0, volume=None, seq=0), candle(sec=60, volume=None, seq=1)],
    )
    (row,) = resample_to_daily(df).collect()
    assert row["volume"] is None


def test_volume_saturation(spark):
    near_max = (1 << 63) - 2
    df = make_candles(
        spark,
        [candle(sec=0, volume=near_max, seq=0), candle(sec=60, volume=near_max, seq=1)],
    )
    (row,) = resample_to_daily(df).collect()
    assert row["volume"] == (1 << 63) - 1  # saturated, not overflowed


def test_weekly_monday_start(spark):
    # 1970-01-01 was a Thursday: epoch day 0 buckets to Monday 1969-12-29
    # (= -3 days). Use a ts in week 2: day 7 (Thu Jan 8) -> Monday Jan 5 (day 4).
    df = make_candles(
        spark,
        [
            candle(sec=7 * DAY + 100, o=5, seq=0),
            candle(sec=8 * DAY, o=6, seq=1),
            candle(sec=11 * DAY, o=7, seq=2),  # Mon Jan 12 -> next week
        ],
    )
    out = rows_by_ts(resample_to_weekly(df))
    assert set(out) == {ts(4 * DAY), ts(11 * DAY)}
    assert out[ts(4 * DAY)]["open"] == Decimal("5")
    assert out[ts(4 * DAY)]["close"] == Decimal("6")


def test_minutes_bucketing_and_passthrough(spark):
    df = make_candles(
        spark,
        [
            candle(sec=0, o=1, seq=0),
            candle(sec=59, o=2, seq=1),
            candle(sec=60, o=3, seq=2),
            candle(sec=150, o=4, seq=3),
        ],
    )
    out = rows_by_ts(resample_to_minutes(df, 1))
    assert set(out) == {ts(0), ts(60), ts(120)}
    assert out[ts(0)]["open"] == Decimal("1") and out[ts(0)]["close"] == Decimal("2")
    # m <= 0 passthrough
    assert resample_to_minutes(df, 0) is df


def test_idempotence_daily(spark):
    # resample_props.rs:66-92 — resampling a daily series again is identity.
    df = make_candles(
        spark,
        [
            candle(sec=0, o=1, h=3, l=0.5, c=2, volume=10, seq=0),
            candle(sec=DAY, o=2, h=4, l=1, c=3, volume=20, seq=1),
        ],
    )
    once = resample_to_daily(df)
    twice = resample_to_daily(once)
    a = sorted(once.collect(), key=lambda r: r["ts"])
    b = sorted(twice.collect(), key=lambda r: r["ts"])
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_equal_ts_first_last_by_seq(spark):
    # Stable sort: for equal ts, input order (seq) decides first/last.
    df = make_candles(
        spark,
        [
            candle(sec=0, o=1, c=10, seq=0),
            candle(sec=0, o=2, c=20, seq=1),
            candle(sec=0, o=3, c=30, seq=2),
        ],
    )
    (row,) = resample_to_daily(df).collect()
    assert row["open"] == Decimal("1") and row["close"] == Decimal("30")


def test_offset_aware_daily(spark):
    # resample.rs:183-210 — fixed +3600 offset shifts the day boundary.
    # ts = 23:30 UTC with +1h offset is already the *next* local day.
    off = 3600
    df = make_candles(
        spark,
        [
            candle(sec=DAY - 1800, o=1, utc_offset_seconds=off, seq=0),
            candle(sec=DAY + 100, o=2, utc_offset_seconds=off, seq=1),
        ],
    )
    out = rows_by_ts(resample_to_daily(df))
    # Local day start = day*86400 - offset = 23:00 UTC of the prior day.
    assert set(out) == {ts(DAY - off)}
    assert out[ts(DAY - off)]["open"] == Decimal("1")
    assert out[ts(DAY - off)]["close"] == Decimal("2")


def test_tz_aware_daily(spark):
    # America/New_York (UTC-5 in winter): 2021-01-02 03:00 UTC is local
    # 2021-01-01 22:00 -> buckets at local midnight 2021-01-01 05:00 UTC.
    base = 1609545600  # 2021-01-02 00:00:00 UTC
    df = make_candles(
        spark,
        [candle(sec=base + 3 * 3600, o=7, timezone="America/New_York", seq=0)],
    )
    (row,) = resample_to_daily(df).collect()
    assert row["ts"] == ts(1609477200)  # 2021-01-01 05:00:00 UTC


def test_multi_series_independent(spark):
    df = make_candles(
        spark,
        [
            candle(provider="provA", symbol="AAPL", sec=0, o=1, seq=0),
            candle(provider="provA", symbol="MSFT", sec=0, o=2, seq=1),
            candle(provider="provB", symbol="AAPL", sec=0, o=3, seq=2),
        ],
    )
    out = resample_to_daily(df).collect()
    assert len(out) == 3


def test_tz_daily_across_dst_spring_forward(spark):
    """DST hard part (SURVEY §7.3): buckets around the US spring-forward
    transition (2024-03-10, America/New_York). Candles on either side of the
    transition bucket to their own local midnights — 05:00Z before (EST) and
    04:00Z after (EDT)."""
    import datetime as dt

    def at(iso):
        return int(dt.datetime.fromisoformat(iso + "+00:00").timestamp())

    rows = [
        # 2024-03-09 23:00 local (EST, UTC-5) = 03-10 04:00Z -> day 03-09
        candle(sec=at("2024-03-10T04:00:00"), o=1,
               timezone="America/New_York", seq=0),
        # 2024-03-10 01:30 local (EST) = 06:30Z -> day 03-10 (midnight EST=05Z)
        candle(sec=at("2024-03-10T06:30:00"), o=2,
               timezone="America/New_York", seq=1),
        # 2024-03-10 15:00 local (EDT, UTC-4) = 19:00Z -> same day 03-10
        candle(sec=at("2024-03-10T19:00:00"), o=3,
               timezone="America/New_York", seq=2),
        # 2024-03-11 08:00 local (EDT) = 12:00Z -> day 03-11 (midnight=04Z)
        candle(sec=at("2024-03-11T12:00:00"), o=4,
               timezone="America/New_York", seq=3),
    ]
    out = resample_to_daily(make_candles(spark, rows)).orderBy("ts").collect()
    got = [(int(r.ts.timestamp()), float(r.open), float(r.close)) for r in out]
    assert got == [
        (at("2024-03-09T05:00:00"), 1.0, 1.0),
        (at("2024-03-10T05:00:00"), 2.0, 3.0),  # 23h day, midnight still EST
        (at("2024-03-11T04:00:00"), 4.0, 4.0),  # midnight now EDT
    ]


def test_tz_daily_across_dst_fall_back(spark):
    """Fall-back (2024-11-03): the 25-hour local day buckets once, at the
    EDT midnight (04:00Z)."""
    import datetime as dt

    def at(iso):
        return int(dt.datetime.fromisoformat(iso + "+00:00").timestamp())

    rows = [
        # 2024-11-03 00:30 EDT = 04:30Z
        candle(sec=at("2024-11-03T04:30:00"), o=1,
               timezone="America/New_York", seq=0),
        # 2024-11-03 01:30 (second occurrence, EST) = 06:30Z -> same local day
        candle(sec=at("2024-11-03T06:30:00"), o=2,
               timezone="America/New_York", seq=1),
        # 2024-11-03 23:00 EST = 11-04 04:00Z -> still local day 11-03
        candle(sec=at("2024-11-04T04:00:00"), o=3,
               timezone="America/New_York", seq=2),
    ]
    out = resample_to_daily(make_candles(spark, rows)).orderBy("ts").collect()
    assert len(out) == 1
    r = out[0]
    assert int(r.ts.timestamp()) == at("2024-11-03T04:00:00")
    assert (float(r.open), float(r.close), r.volume) == (1.0, 3.0, None)


def test_tz_daily_ambiguous_midnight_earlier_offset(spark):
    """Havana's fall-back is 01:00 -> 00:00, so local midnight on the
    transition date occurs TWICE; the bucket must map to the EARLIER
    instant (Ambiguous -> dt1, resample.rs:216-226). 2024-11-03 00:00
    America/Havana is 04:00Z (CDT, -04) or 05:00Z (CST, -05); the bucket
    is pinned at 04:00Z."""
    import datetime as dt

    def at(iso):
        return int(dt.datetime.fromisoformat(iso + "+00:00").timestamp())

    rows = [
        # 00:30 local, first pass (CDT) = 04:30Z
        candle(sec=at("2024-11-03T04:30:00"), o=1,
               timezone="America/Havana", seq=0),
        # 00:30 local, second pass (CST) = 05:30Z — same local day
        candle(sec=at("2024-11-03T05:30:00"), o=2,
               timezone="America/Havana", seq=1),
        # 12:00 local (CST) = 17:00Z — same local day
        candle(sec=at("2024-11-03T17:00:00"), o=3,
               timezone="America/Havana", seq=2),
    ]
    out = resample_to_daily(make_candles(spark, rows)).collect()
    assert len(out) == 1
    assert int(out[0].ts.timestamp()) == at("2024-11-03T04:00:00")
    assert (float(out[0].open), float(out[0].close)) == (1.0, 3.0)


def test_tz_weekly_monday_local(spark):
    """Weekly buckets at market-local Monday midnight (resample.rs:401-419).
    Tokyo (UTC+9, no DST): Sunday 20:00Z is already Monday 05:00 local."""
    import datetime as dt

    def at(iso):
        return int(dt.datetime.fromisoformat(iso + "+00:00").timestamp())

    rows = [
        # 2024-01-07 (Sun) 20:00Z = Mon 05:00 JST -> week of Mon 01-08 JST
        candle(sec=at("2024-01-07T20:00:00"), o=1, timezone="Asia/Tokyo", seq=0),
        # 2024-01-10 (Wed) 12:00Z -> same week
        candle(sec=at("2024-01-10T12:00:00"), o=2, timezone="Asia/Tokyo", seq=1),
    ]
    out = resample_to_weekly(make_candles(spark, rows)).collect()
    assert len(out) == 1
    # Monday 2024-01-08 00:00 JST = 2024-01-07 15:00Z
    assert int(out[0].ts.timestamp()) == at("2024-01-07T15:00:00")


def test_fill_gaps_forward_fills_and_flags(spark):
    from borsa_spark.operators import fill_gaps

    rows = [
        candle("provA", sec=0, o=1.0, c=1.0, volume=5, seq=0),
        # gap at t=60
        candle("provA", sec=120, o=3.0, c=3.0, volume=7, seq=1),
    ]
    out = {
        int(r.ts.timestamp()): r
        for r in fill_gaps(make_candles(spark, rows), 60).collect()
    }
    assert sorted(out) == [0, 60, 120]
    gap = out[60]
    assert (float(gap.close), gap.volume, gap.is_synthetic) == (1.0, 0, True)
    assert float(gap.open) == 1.0  # carried close, not null
    assert out[0].is_synthetic is False and out[120].is_synthetic is False
    assert out[120].volume == 7
    assert not any(r.is_off_spine for r in out.values())


def test_fill_gaps_keeps_and_flags_off_spine_rows(spark):
    """Mis-aligned input (ts != min+k*step) is kept + flagged, not dropped;
    strict=True raises instead."""
    import pytest

    from borsa_spark.operators import fill_gaps

    rows = [
        candle("provA", sec=0, o=1.0, c=1.0, volume=5, seq=0),
        candle("provA", sec=90, o=2.0, c=2.0, volume=3, seq=1),  # off-spine
        candle("provA", sec=120, o=3.0, c=3.0, volume=7, seq=2),
    ]
    out = {
        int(r.ts.timestamp()): r
        for r in fill_gaps(make_candles(spark, rows), 60).collect()
    }
    # spine 0/60/120 plus the preserved off-spine row at 90
    assert sorted(out) == [0, 60, 90, 120]
    assert out[90].is_off_spine and not out[90].is_synthetic
    assert float(out[90].close) == 2.0 and out[90].volume == 3
    assert out[60].is_synthetic and not out[60].is_off_spine
    # the synthetic spine row AFTER the off-spine row carries its close
    assert float(out[60].close) == 1.0

    with pytest.raises(ValueError, match="off_spine"):
        fill_gaps(make_candles(spark, rows), 60, strict=True)
