"""Interval inference, attribution, and monotonic gate tests — ports of
borsa-core/tests/interval_infer.rs, history.rs:588-634 attribution scenarios,
and router_stream_monotonic.rs / clock-skew behaviors (batch analog)."""

from __future__ import annotations

from borsa_spark.operators import (
    build_attribution,
    estimate_step_seconds,
    is_subdaily,
    monotonic_gate,
)
from borsa_spark.operators.merge import merge_candles, with_priority

from .conftest import candle, make_candles, ts

DAY = 86_400


def steps(spark, secs):
    df = make_candles(spark, [candle(sec=s, seq=i) for i, s in enumerate(secs)])
    rows = estimate_step_seconds(df).collect()
    return {r["symbol"]: r["step_seconds"] for r in rows}


def test_unique_mode(spark):
    # infer.rs doc: deltas 60,60,60,120,180 -> mode 60
    assert steps(spark, [0, 60, 120, 180, 300, 480]) == {"AAPL": 60}


def test_tie_falls_back_to_lower_median(spark):
    # deltas 60,60,120,120 -> no unique mode -> lower median 60
    assert steps(spark, [0, 60, 120, 240, 360]) == {"AAPL": 60}


def test_fewer_than_two_distinct_ts(spark):
    assert steps(spark, [0]) == {}
    assert steps(spark, [5, 5]) == {}


def test_duplicates_ignored(spark):
    # duplicate timestamps collapse before deltas
    assert steps(spark, [0, 0, 60, 60, 120]) == {"AAPL": 60}


def test_is_subdaily_thresholds(spark):
    # needs >=3 subdaily deltas AND >=60% ratio (infer.rs:122-158)
    df = make_candles(
        spark, [candle(sec=s, seq=i) for i, s in enumerate([0, 60, 120, 180, 240])]
    )
    assert is_subdaily(df).collect()[0]["subdaily"] is True

    df2 = make_candles(
        spark, [candle(sec=s, seq=i) for i, s in enumerate([0, 60, 120, DAY * 2, DAY * 4])]
    )  # 2 subdaily of 4 -> fails both thresholds
    assert is_subdaily(df2).collect()[0]["subdaily"] is False


def test_attribution_runs(spark):
    # history.rs:588-634 — contiguous same-provider runs; gaps don't split.
    prio = {"provA": 0, "provB": 1}
    df = with_priority(
        make_candles(
            spark,
            [
                candle(provider="provA", sec=0, seq=0),
                candle(provider="provA", sec=100, seq=1),
                candle(provider="provB", sec=200, seq=0),
                candle(provider="provA", sec=900, seq=2),  # gap, back to A
            ],
        ),
        prio,
    )
    merged = merge_candles(df)
    spans = sorted(
        build_attribution(merged).collect(), key=lambda r: r["span_start"]
    )
    assert [(s["provider"], s["span_start"], s["span_end"]) for s in spans] == [
        ("provA", ts(0), ts(100)),
        ("provB", ts(200), ts(200)),
        ("provA", ts(900), ts(900)),
    ]


def test_attribution_first_wins_ownership(spark):
    # Overlapping ts belongs to the higher-priority provider.
    prio = {"provA": 0, "provB": 1}
    df = with_priority(
        make_candles(
            spark,
            [
                candle(provider="provB", sec=0, seq=0),
                candle(provider="provB", sec=100, seq=1),
                candle(provider="provA", sec=100, seq=0),
            ],
        ),
        prio,
    )
    spans = sorted(
        build_attribution(merge_candles(df)).collect(),
        key=lambda r: r["span_start"],
    )
    assert [(s["provider"], s["n_candles"]) for s in spans] == [
        ("provB", 1), ("provA", 1),
    ]


def test_monotonic_gate_drop_older_keep_equal(spark):
    # filters.rs:41-63 via batch analog: arrival order = seq.
    rows = [
        candle(symbol="AAPL", sec=100, seq=0),
        candle(symbol="AAPL", sec=90, seq=1),   # older -> dropped
        candle(symbol="AAPL", sec=100, seq=2),  # equal -> kept
        candle(symbol="AAPL", sec=110, seq=3),  # newer -> kept
        candle(symbol="MSFT", sec=50, seq=4),   # other symbol independent
        candle(symbol="MSFT", sec=40, seq=5),   # older -> dropped
    ]
    out = monotonic_gate(make_candles(spark, rows))
    got = sorted((r["symbol"], r["seq"]) for r in out.collect())
    assert got == [("AAPL", 0), ("AAPL", 2), ("AAPL", 3), ("MSFT", 4)]


def test_monotonic_gate_drop_does_not_lower_watermark(spark):
    # a dropped old row must not reset the high-water mark
    rows = [
        candle(sec=100, seq=0),
        candle(sec=10, seq=1),   # dropped
        candle(sec=50, seq=2),   # still below 100 -> dropped
        candle(sec=100, seq=3),  # equal to hwm -> kept
    ]
    out = monotonic_gate(make_candles(spark, rows))
    assert sorted(r["seq"] for r in out.collect()) == [0, 3]


def test_sub_second_neighbors_collapse_before_the_sort(spark):
    # Dense-feed shape (the 10M-event drill's regression): many ticks
    # inside the same second must collapse BEFORE the per-key ordered
    # window and contribute no zero deltas — steps are whole-second
    # semantics, so [0, 0.25, 0.5, 60, 60.75, 120] infers 60 exactly
    # like [0, 60, 120] does.
    from pyspark.sql import functions as F

    from borsa_spark.operators.infer import _deltas

    rows = [0.0, 0.25, 0.5, 60.0, 60.75, 120.0]
    df = spark.createDataFrame(
        [("AAPL", float(s)) for s in rows], "symbol string, off double"
    ).select(
        "symbol",
        (F.timestamp_seconds(F.lit(1_700_000_000) + F.col("off"))).alias(
            "ts"
        ),
    )
    deltas = sorted(
        r["delta"] for r in _deltas(df).collect()
    )
    assert deltas == [60, 60]  # no zero rows, no sub-second remnants
    out = estimate_step_seconds(df).collect()
    assert {r["symbol"]: r["step_seconds"] for r in out} == {"AAPL": 60}
