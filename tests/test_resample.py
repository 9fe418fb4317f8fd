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
