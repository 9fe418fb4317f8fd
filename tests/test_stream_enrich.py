"""Stream-stream interval join (streaming/enrich.py): a live tick stream
joined to a live bar stream on symbol + event-time window, with watermarks
bounding the symmetric join state. Driven end-to-end over file streams with
availableNow; correctness is checked against the batch interval join over
the same data.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from borsa_spark.streaming.enrich import enrich_ticks_with_bars

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def _write(spark, tmp_path, name, rows, schema):
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / name)
    df.repartition(1).write.parquet(path)
    return path, df


def _run(spark, stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


class TestStreamStreamEnrich:
    def test_ticks_match_their_bar_and_batch_semantics(self, spark, tmp_path):
        ticks = [
            ("AAPL", _ts(5), 10.5),
            ("AAPL", _ts(65), 11.0),   # second bar
            ("AAPL", _ts(119), 9.0),   # second bar, below open
            ("MSFT", _ts(10), 20.0),
            ("MSFT", _ts(61), 30.0),   # MSFT has no second bar -> no match
        ]
        bars = [
            ("AAPL", _ts(0), 10.0),
            ("AAPL", _ts(60), 10.0),
            ("MSFT", _ts(0), 25.0),
        ]
        tick_path, tick_df = _write(
            spark, tmp_path, "ticks", ticks, "symbol string, ts timestamp, price double"
        )
        bar_path, bar_df = _write(
            spark, tmp_path, "bars", bars, "symbol string, bar_ts timestamp, open double"
        )
        st = spark.readStream.schema(tick_df.schema).parquet(tick_path)
        sb = spark.readStream.schema(bar_df.schema).parquet(bar_path)
        out = _run(
            spark,
            enrich_ticks_with_bars(st, sb, interval_seconds=60),
            tmp_path,
            "enriched",
        )
        got = {
            (r.symbol, r.ts, r.bar_ts, r.above_open) for r in out.collect()
        }
        # every tick lands in exactly its containing bar; MSFT@61 has none
        assert got == {
            ("AAPL", _ts(5), _ts(0), True),
            ("AAPL", _ts(65), _ts(60), True),
            ("AAPL", _ts(119), _ts(60), False),
            ("MSFT", _ts(10), _ts(0), False),
        }
        # batch replay of the identical join predicate agrees
        cond = (
            (tick_df.symbol == bar_df.symbol)
            & (tick_df.ts >= bar_df.bar_ts)
            & (tick_df.ts < bar_df.bar_ts + F.expr("INTERVAL 60 SECONDS"))
        )
        want = {
            (r["symbol"], r["ts"], r["bar_ts"], r["price"] > r["open"])
            for r in tick_df.join(bar_df, cond)
            .select(tick_df.symbol, "ts", "bar_ts", "price", "open")
            .collect()
        }
        assert got == want

    def test_join_state_is_symbol_keyed_stream_join(self, spark, tmp_path):
        # plan sanity: the streaming query compiles to a symmetric
        # stream-stream join (StreamingSymmetricHashJoin), not a static one
        ticks = [("AAPL", _ts(5), 10.5)]
        bars = [("AAPL", _ts(0), 10.0)]
        tick_path, tick_df = _write(
            spark, tmp_path, "t2", ticks, "symbol string, ts timestamp, price double"
        )
        bar_path, bar_df = _write(
            spark, tmp_path, "b2", bars, "symbol string, bar_ts timestamp, open double"
        )
        st = spark.readStream.schema(tick_df.schema).parquet(tick_path)
        sb = spark.readStream.schema(bar_df.schema).parquet(bar_path)
        joined = enrich_ticks_with_bars(st, sb, interval_seconds=60)
        q = (
            joined.writeStream.format("memory")
            .queryName("enrich_plan")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_plan"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        plan = q.explain  # touch attr to keep linters calm
        desc = q.lastProgress
        assert desc is not None
        # state operator present with both sides' watermarks applied
        ops = desc["stateOperators"]
        assert any("symmetricHashJoin" in (o.get("operatorName") or "")
                   for o in ops)


class TestWatermarkDerivation:
    def test_bar_default_accounts_for_actual_tick_watermark(self):
        from borsa_spark.streaming.enrich import _interval_to_seconds

        assert _interval_to_seconds("30 seconds") == 30
        assert _interval_to_seconds("10 minutes") == 600
        assert _interval_to_seconds("1 hour") == 3600
        import pytest as _pytest

        with _pytest.raises(ValueError, match="bar_watermark explicitly"):
            _interval_to_seconds("interval 30 seconds")

    def test_derived_default_respects_long_tick_watermark(self, spark, tmp_path):
        from borsa_spark.streaming.enrich import enrich_ticks_with_bars

        ticks = spark.createDataFrame(
            [("A", T0, 1.0)], "symbol string, ts timestamp, price double"
        )
        bars = spark.createDataFrame(
            [("A", T0, 1.0)], "symbol string, bar_ts timestamp, open double"
        )
        tick_path = str(tmp_path / "t"); ticks.write.parquet(tick_path)
        bar_path = str(tmp_path / "b"); bars.write.parquet(bar_path)
        st = spark.readStream.schema(ticks.schema).parquet(tick_path)
        sb = spark.readStream.schema(bars.schema).parquet(bar_path)
        j = enrich_ticks_with_bars(
            st, sb, interval_seconds=60, tick_watermark="10 minutes"
        )
        # bar watermark must be >= 600 + 60 + margin (690 s = 11m30s in
        # the analyzed plan's EventTimeWatermark rendering on bar_ts)
        plan = j._jdf.queryExecution().analyzed().toString()
        assert "11 minutes 30 seconds" in plan


class TestPartialBarEnricher:
    """Update-mode partial-bar enrichment (PartialBarEnricher): the
    delivered-updates client shape of router_stream_candles.rs — ticks
    stamped against the latest NON-FINAL bar state as of their batch,
    revisions included, mirroring the r5 update-mode candle test's feed."""

    def test_ticks_see_bar_state_as_of_their_batch(self, spark, tmp_path):
        from borsa_spark.streaming.enrich import PartialBarEnricher
        from borsa_spark.streaming.fanin import candle_stream

        schema = "symbol string, ts timestamp, price double, seq long"
        batches = [
            [("AAPL", _ts(0), 10.0, 0), ("AAPL", _ts(30), 11.0, 1)],
            [("AAPL", _ts(10), 9.0, 2), ("AAPL", _ts(30), 12.0, 3)],
            [("AAPL", _ts(95), 13.0, 4)],
        ]
        path = tmp_path / "pbe_ticks"
        path.mkdir()
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).repartition(1).write.parquet(
                str(path / f"batch_{i}")
            )
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(path / "batch_*"))
        )
        bars = candle_stream(
            src, interval_seconds=60, watermark="10 seconds",
            final_mode=False,
        )
        emissions: list[tuple[int, list]] = []
        q = (
            bars.writeStream.outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_pbe"))
            .trigger(availableNow=True)
            .foreachBatch(
                lambda df, bid: emissions.append((bid, df.collect()))
            )
            .start()
        )
        q.awaitTermination(120)
        assert len(emissions) >= 3

        # Replay the delivered-updates consumer: per batch, upsert that
        # batch's bar emissions, then stamp that batch's ticks.
        enr = PartialBarEnricher(spark, interval_seconds=60)
        stamped = {}
        by_bid = dict(sorted(emissions))
        for i, tick_rows in enumerate(batches):
            bar_rows = by_bid.get(i, [])
            if bar_rows:
                enr.upsert(
                    spark.createDataFrame(bar_rows, enr._schema)
                    if enr._schema is not None
                    else spark.createDataFrame(bar_rows),
                    batch_id=i,
                )
            ticks = spark.createDataFrame(tick_rows, schema)
            for r in enr.enrich(ticks).collect():
                stamped[int((r.ts - T0).total_seconds()), float(r.price)] = r

        # batch 0: tick 11.0@t30 stamped against the FIRST partial
        # (open 10, 2 ticks) — above_open, bar not final
        r = stamped[(30, 11.0)]
        assert float(r.open) == 10.0 and r.above_open is True
        assert r.bar_is_final is False
        # batch 1: the revision (9.0@t10) sees the REVISED partial —
        # same open, but now it stamps below-open correctly
        r = stamped[(10, 9.0)]
        assert float(r.open) == 10.0 and r.above_open is False
        assert r.bar_is_final is False
        # batch 2: tick 13.0@t95 belongs to the [60,120) window, whose
        # first partial emitted in the same batch (open = itself)
        r = stamped[(95, 13.0)]
        assert float(r.open) == 13.0 and r.above_open is False
        assert r.bar_is_final is False

    def test_retention_drops_stale_windows(self, spark):
        from borsa_spark.streaming.enrich import PartialBarEnricher

        schema = (
            "symbol string, ts timestamp, window_end timestamp, "
            "open double, high double, low double, close double, "
            "n_ticks long, interval string, is_final boolean"
        )
        def bar(sec, o):
            return ("AAPL", _ts(sec), _ts(sec + 60), o, o, o, o, 1,
                    "60s", False)

        enr = PartialBarEnricher(spark, interval_seconds=60,
                                 retain_windows=2)
        enr.upsert(spark.createDataFrame(
            [bar(0, 1.0), bar(60, 2.0), bar(120, 3.0), bar(240, 4.0)],
            schema,
        ))
        kept = {int((ts - T0).total_seconds()) for (_, ts) in enr._bars}
        # newest window starts at 240; horizon = 240 - 2*60 = 120
        assert kept == {120, 240}
        # enrich still works over the retained state only
        ticks = spark.createDataFrame(
            [("AAPL", _ts(125), 5.0), ("AAPL", _ts(5), 5.0)],
            "symbol string, ts timestamp, price double",
        )
        out = {int((r.ts - T0).total_seconds()): r
               for r in enr.enrich(ticks).collect()}
        assert float(out[125].open) == 3.0
        assert out[5].bar_ts is None  # dropped window -> null stamp
