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


def test_sorted_layout_skips_files_on_time_range(spark, tmp_path):
    """Row-group/file stat skipping: events written time-SORTED across many
    files let a narrow ts-range filter decode only the files whose min/max
    straddle the range — the dominant access pattern for market data at
    scale (a day's query over a year's store). Written unsorted, every file
    contains the whole time span and nothing can be skipped. Receipt:
    input_file_name() over the filtered scan counts the files that actually
    produced rows."""
    from pyspark.sql import functions as F

    from borsa_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    n_files = 8
    sorted_dir = str(tmp_path / "sorted")
    unsorted_dir = str(tmp_path / "unsorted")
    # repartitionByRange -> each file owns a disjoint ts slice
    ev.repartitionByRange(n_files, "ts").sortWithinPartitions("ts") \
        .write.parquet(sorted_dir)
    # hash-shuffle on event_id -> every file spans the full time range
    ev.repartition(n_files, "event_id").write.parquet(unsorted_dir)

    # 3 of the fixture's 30 days: ~10% of rows, so every hash file holds
    # some (deterministic data -> deterministic counts) while the sorted
    # layout confines them to one or two range slices
    lo, hi = "2024-01-02 00:00:00", "2024-01-05 00:00:00"

    def files_read(path: str) -> int:
        df = (
            spark.read.parquet(path)
            .filter(F.col("ts").between(lo, hi))
            .select(F.input_file_name().alias("f"))
            .distinct()
        )
        return df.count()

    read_sorted = files_read(sorted_dir)
    read_unsorted = files_read(unsorted_dir)
    assert read_unsorted == n_files          # no skipping possible
    assert read_sorted <= 2                  # only the straddling slice(s)
    assert read_sorted < read_unsorted
    # same rows either way — skipping is a pure I/O win
    a = spark.read.parquet(sorted_dir).filter(F.col("ts").between(lo, hi))
    b = spark.read.parquet(unsorted_dir).filter(F.col("ts").between(lo, hi))
    assert a.count() == b.count() > 0
