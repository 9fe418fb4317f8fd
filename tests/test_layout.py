"""Bucketed-layout test: the first-wins merge over a symbol-bucketed candle
table must run WITHOUT a shuffle (the scan's bucketing satisfies the merge
window's clustering requirement)."""

from __future__ import annotations

import io
import contextlib

import pytest

from borsa_spark.operators.merge import merge_candles, with_priority
from borsa_spark.sources.layout import read_candles_table, write_bucketed_candles
from tests.conftest import candle, make_candles

DAY = 86_400


@pytest.fixture()
def bucketed_table(spark):
    # warehouse dir is a static conf; the default ./spark-warehouse (inside
    # the repo, gitignored) is fine for this test
    rows = [
        candle(prov, symbol=sym, sec=i * DAY, o=float(i), seq=i)
        for prov in ("provA", "provB")
        for sym in ("AAPL", "MSFT")
        for i in range(5)
    ]
    df = make_candles(spark, rows)
    write_bucketed_candles(df, "candles_bucketed", buckets=4)
    yield "candles_bucketed"
    spark.sql("DROP TABLE IF EXISTS candles_bucketed")


def test_merge_over_bucketed_table_has_no_shuffle(spark, bucketed_table):
    df = read_candles_table(spark, bucketed_table)
    merged = merge_candles(
        with_priority(df, {"provA": 0, "provB": 1})
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        merged.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan  # bucketing made the merge shuffle-free
    # and the result is still correct: provA wins everywhere
    out = merged.collect()
    assert len(out) == 10
    assert {str(r.provider) for r in out} == {"provA"}


def test_partitioned_bucketed_write_prunes_partitions(spark):
    """partition_cols + bucketing: a date-partition filter must prune at
    the scan (PartitionFilters), and the merge stays shuffle-free."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    rows = [
        candle("provA", symbol="AAPL", sec=i * DAY, o=float(i), seq=i)
        for i in range(6)
    ]
    df = make_candles(spark, rows).withColumn("dt", F.to_date("ts"))
    write_bucketed_candles(df, "candles_part", buckets=4,
                           partition_cols=["dt"])
    try:
        t = read_candles_table(spark, "candles_part").filter(
            F.col("dt") >= "1970-01-04"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            t.explain("formatted")
        plan = buf.getvalue()
        assert "PartitionFilters: [isnotnull(dt" in plan
        assert t.count() == 3
        merged = merge_candles(with_priority(t.drop("dt"), {"provA": 0}))
        buf2 = io.StringIO()
        with contextlib.redirect_stdout(buf2):
            merged.explain("formatted")
        assert "Exchange" not in buf2.getvalue()
    finally:
        spark.sql("DROP TABLE IF EXISTS candles_part")
