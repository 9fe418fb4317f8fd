"""Streaming layer tests: supervisor SM scenarios (ports of the reference's
supervisor_sm_tests / failover / startup-fail suites), plus real Structured
Streaming runs of the monotonic gate, fan-in, and candle windowing using
file sources + availableNow triggers.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from borsa_spark.errors import AllProvidersFailed, ProviderTimeout, UnsupportedError
from borsa_spark.streaming import (
    BackoffTick,
    NotifyInitial,
    PreemptSessions,
    PState,
    RequestStart,
    ScheduleBackoffTick,
    SessionEnded,
    Shutdown,
    StartFailed,
    StartSucceeded,
    StopAll,
    candle_stream,
    collapse_stream_errors,
    fan_in,
    jitter_wait,
    make_supervisor,
    streaming_monotonic_gate,
)


class TestSupervisorSM:
    def test_startup_first_success_notifies(self):
        sm = make_supervisor([["AAPL"], ["AAPL"]])
        sm, actions = sm.handle(BackoffTick())  # kick off first round
        starts = [a for a in actions if isinstance(a, RequestStart)]
        assert starts and starts[0].id == 0 and starts[0].symbols == ("AAPL",)
        # provider 1 must NOT start for AAPL: provider 0 (earlier in chain)
        # is already Connecting it (coverage planning, T7)
        assert all(a.id == 0 for a in starts)
        sm, actions = sm.handle(StartSucceeded(id=0, symbols=("AAPL",)))
        assert any(isinstance(a, NotifyInitial) and a.ok for a in actions)
        assert sm.providers[0].state is PState.ACTIVE

    def test_startup_all_fail_collapses(self):
        # router_stream_startup_all_fail.rs
        sm = make_supervisor([["AAPL"], ["AAPL"]])
        sm, actions = sm.handle(BackoffTick())
        sm, actions = sm.handle(StartFailed(id=0, error=ProviderTimeout("p0")))
        # failure of 0 frees AAPL -> provider 1 starts
        starts = [a for a in actions if isinstance(a, RequestStart)]
        assert [a.id for a in starts] == [1]
        sm, actions = sm.handle(StartFailed(id=1, error=ProviderTimeout("p1")))
        notify = [a for a in actions if isinstance(a, NotifyInitial)]
        assert notify and not notify[0].ok
        assert isinstance(notify[0].error, AllProvidersFailed)

    def test_failover_then_failback_preempts(self):
        # router_stream_failover_failback.rs: primary fails, backup takes
        # over; primary recovers -> backup session preempted.
        sm = make_supervisor([["AAPL"], ["AAPL"]])
        sm, _ = sm.handle(BackoffTick())
        sm, actions = sm.handle(StartFailed(id=0, error=ProviderTimeout("p0")))
        sm, actions = sm.handle(StartSucceeded(id=1, symbols=("AAPL",)))
        assert sm.providers[1].state is PState.ACTIVE
        # tick clears provider 0's cooldown and retries it
        sm, actions = sm.handle(BackoffTick())
        starts = [a for a in actions if isinstance(a, RequestStart)]
        assert [a.id for a in starts] == [0]  # primary retried
        sm, actions = sm.handle(StartSucceeded(id=0, symbols=("AAPL",)))
        pre = [a for a in actions if isinstance(a, PreemptSessions)]
        assert pre and pre[0].provider_ids == (1,)

    def test_backoff_growth_and_reset(self):
        # get past startup with a success, then fail repeatedly while RUNNING
        sm = make_supervisor([["AAPL"]], min_backoff_ms=500, factor=2,
                             max_backoff_ms=4000)
        sm, _ = sm.handle(BackoffTick())
        sm, _ = sm.handle(StartSucceeded(id=0, symbols=("AAPL",)))
        sm, _ = sm.handle(SessionEnded(id=0))
        for expect in (1000, 2000, 4000, 4000):
            sm, actions = sm.handle(BackoffTick())  # retries the provider
            ticks = [a for a in actions if isinstance(a, ScheduleBackoffTick)]
            assert ticks[-1].delay_ms == expect
            sm, _ = sm.handle(StartFailed(id=0, error=ProviderTimeout("x")))
        # success from cooldown resets to min (supervisor_sm.rs:337-339)
        sm, _ = sm.handle(BackoffTick())
        sm, _ = sm.handle(StartSucceeded(id=0, symbols=("AAPL",)))
        assert sm.backoff_ms == 500

    def test_session_end_cooldown_and_restart(self):
        # router_stream_cooldown.rs
        sm = make_supervisor([["AAPL"]])
        sm, _ = sm.handle(BackoffTick())
        sm, _ = sm.handle(StartSucceeded(id=0, symbols=("AAPL",)))
        sm, actions = sm.handle(SessionEnded(id=0))
        assert sm.providers[0].state is PState.IN_COOLDOWN
        assert not any(isinstance(a, RequestStart) for a in actions)
        sm, actions = sm.handle(BackoffTick())
        starts = [a for a in actions if isinstance(a, RequestStart)]
        assert [a.id for a in starts] == [0]

    def test_per_provider_symbol_subsets(self):
        # router_stream_per_provider_subsets.rs: each provider only gets its
        # allowed symbols; uncovered symbols go to the next in chain.
        sm = make_supervisor(
            [["AAPL", "MSFT"], ["AAPL", "MSFT", "GOOG"]],
            provider_allow=[{"AAPL"}, {"MSFT", "GOOG"}],
        )
        sm, actions = sm.handle(BackoffTick())
        starts = {a.id: a.symbols for a in actions if isinstance(a, RequestStart)}
        assert starts[0] == ("AAPL",)
        assert set(starts[1]) == {"MSFT", "GOOG"}

    def test_shutdown_stops_all(self):
        sm = make_supervisor([["AAPL"]])
        sm, _ = sm.handle(BackoffTick())
        sm, actions = sm.handle(Shutdown())
        assert any(isinstance(a, StopAll) for a in actions)
        # terminal: further events are no-ops
        sm2, actions2 = sm.handle(StartSucceeded(id=0, symbols=("AAPL",)))
        assert actions2 == []

    def test_collapse_rules(self):
        assert isinstance(collapse_stream_errors("s", []), UnsupportedError)
        e = ProviderTimeout("x")
        assert collapse_stream_errors("s", [e]) is e
        assert isinstance(
            collapse_stream_errors("s", [e, e]), AllProvidersFailed
        )

    def test_downstream_closed_stops_all_sessions(self):
        # T9 downstream-drop: the consumer going away shuts the supervisor
        # down (session.rs:80-85 -> supervisor DownstreamClosed -> StopAll);
        # no further session-end bookkeeping is expected.
        from borsa_spark.streaming import DownstreamClosed

        sm = make_supervisor([["AAPL"]])
        sm, _ = sm.handle(BackoffTick())
        sm, _ = sm.handle(StartSucceeded(id=0, symbols=("AAPL",)))
        sm, actions = sm.handle(DownstreamClosed())
        assert any(isinstance(a, StopAll) for a in actions)
        assert sm.phase.value == "shutting_down"

    def test_jitter_bounds(self):
        rng = random.Random(42)
        for _ in range(100):
            v = jitter_wait(1000, 20, rng)
            assert 1000 <= v < 1200
        assert jitter_wait(1000, 0, rng) == 1000


@pytest.fixture()
def stream_rows(spark, tmp_path):
    """A deterministic out-of-order tick feed written as a file source."""
    import datetime as dt

    def ts(sec):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

    rows = [
        # (provider, symbol, ts, price, seq) — AAPL arrives out of order
        ("p0", "AAPL", ts(0), 10.0, 0),
        ("p0", "AAPL", ts(30), 11.0, 1),
        ("p0", "AAPL", ts(10), 9.0, 2),   # older than HWM(30) -> dropped
        ("p0", "AAPL", ts(30), 12.0, 3),  # equal -> allowed
        ("p0", "AAPL", ts(95), 13.0, 4),
        ("p0", "MSFT", ts(5), 20.0, 5),
        ("p0", "MSFT", ts(4), 19.0, 6),   # older -> dropped
        ("p1", "GOOG", ts(7), 30.0, 7),
    ]
    df = spark.createDataFrame(
        rows, "provider string, symbol string, ts timestamp, price double, seq long"
    )
    path = str(tmp_path / "ticks")
    df.repartition(1).write.parquet(path)
    return path, df.schema


def _run_stream(spark, stream_df, tmp_path, name, output_mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


class TestStructuredStreaming:
    def test_streaming_monotonic_gate(self, spark, stream_rows, tmp_path):
        path, schema = stream_rows
        src = spark.readStream.schema(schema).parquet(path)
        gated = streaming_monotonic_gate(src)
        out = _run_stream(spark, gated, tmp_path, "gate_out", "append")
        kept = sorted(r.seq for r in out.collect())
        assert kept == [0, 1, 3, 4, 5, 7]

    def test_fan_in_with_allow_sets(self, spark, stream_rows, tmp_path):
        path, schema = stream_rows
        s0 = spark.readStream.schema(schema).parquet(path).filter(
            F.col("provider") == "p0"
        )
        s1 = spark.readStream.schema(schema).parquet(path).filter(
            F.col("provider") == "p1"
        )
        merged = fan_in([s0, s1], allowed={0: ["AAPL"], 1: ["GOOG"]})
        out = _run_stream(spark, merged, tmp_path, "fanin_out")
        symbols = {r.symbol for r in out.collect()}
        assert symbols == {"AAPL", "GOOG"}  # MSFT pruned by allow-set

    def test_candle_stream_final_bars(self, spark, stream_rows, tmp_path):
        path, schema = stream_rows
        src = spark.readStream.schema(schema).parquet(path)
        bars = candle_stream(src, interval_seconds=60, watermark="10 seconds")
        out = _run_stream(spark, bars, tmp_path, "bars_out", "append")
        rows = {(r.symbol, r.ts.second + r.ts.minute * 60): r for r in out.collect()}
        aapl0 = rows[("AAPL", 0)]
        # window [0,60): ticks at 0,30,10,30 -> open by event time=10.0@t0,
        # high=12, low=9, close = max event-time (30, seq 3) -> 12
        assert (float(aapl0.open), float(aapl0.high), float(aapl0.low),
                float(aapl0.close), aapl0.n_ticks) == (10.0, 12.0, 9.0, 12.0, 4)
        # the [60,120) bar is NOT final: max event time 95 puts the watermark
        # at 85 < 120, so append mode withholds it — is_final semantics
        assert ("AAPL", 60) not in rows
        assert rows[("MSFT", 0)].n_ticks == 2

    def test_candle_stream_update_mode_partial_bars(
        self, spark, tmp_path
    ):
        """T12 update mode (reference is_final=false CandleUpdate
        semantics, connector.rs:270-288): partial bars re-emit as ticks
        arrive, every emission carries is_final=false, and the LAST
        re-emission of a bar equals the append-mode (watermark-closed)
        final bar — the keyed-upsert contract candle_stream's docstring
        promises."""
        import datetime as dt

        def ts(sec):
            return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

        schema = "symbol string, ts timestamp, price double, seq long"
        batches = [
            [("AAPL", ts(0), 10.0, 0), ("AAPL", ts(30), 11.0, 1)],
            [("AAPL", ts(10), 9.0, 2), ("AAPL", ts(30), 12.0, 3)],
            [("AAPL", ts(95), 13.0, 4)],  # moves the watermark past 60
        ]
        path = tmp_path / "upd_ticks"
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
            .option("checkpointLocation", str(tmp_path / "ckpt_upd"))
            .trigger(availableNow=True)
            .foreachBatch(
                lambda df, bid: emissions.append((bid, df.collect()))
            )
            .start()
        )
        q.awaitTermination(120)

        w0 = dt.datetime(2024, 1, 1)
        history = [
            r
            for _, rows in sorted(emissions)
            for r in rows
            if r.symbol == "AAPL" and r.ts == w0
        ]
        # the [0,60) bar re-emitted at least twice (each batch that
        # touched it), every time marked non-final
        assert len(history) >= 2
        assert all(r.is_final is False for r in history)
        # intermediate partials show the pre-revision state...
        first = history[0]
        assert (float(first.open), float(first.high), float(first.low),
                float(first.close), first.n_ticks) == (10.0, 11.0, 10.0,
                                                       11.0, 2)
        # ...and the last re-emission equals the append-mode final bar
        # over the same complete feed
        final_src = spark.readStream.schema(schema).parquet(
            str(path / "batch_*")
        )
        final_bars = candle_stream(
            final_src, interval_seconds=60, watermark="10 seconds"
        )
        out = _run_stream(spark, final_bars, tmp_path, "upd_final", "append")
        final = {
            (r.symbol, r.ts): r for r in out.collect()
        }[("AAPL", w0)]
        last = history[-1]
        assert (
            float(last.open), float(last.high), float(last.low),
            float(last.close), last.n_ticks,
        ) == (
            float(final.open), float(final.high), float(final.low),
            float(final.close), final.n_ticks,
        )
        assert final.is_final is True and last.is_final is False


class TestOptionStream:
    """S11: OptionUpdate multiplex — fan-in + allow-sets + per-underlying
    monotonic gate, mirroring router_stream_candles.rs's delivered-updates
    shape for the option update type (connector.rs:235-249,
    streaming/mod.rs:44-56)."""

    @pytest.fixture()
    def option_rows(self, spark, tmp_path):
        import datetime as dt
        from decimal import Decimal

        from borsa_spark import schemas

        def ts(sec):
            return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

        def upd(provider, sym, contract, right, strike, sec, price, seq):
            return (
                provider, sym, contract, right, Decimal(strike),
                dt.date(2024, 6, 21), ts(sec), Decimal(price),
                Decimal(price) - Decimal("0.05"),
                Decimal(price) + Decimal("0.05"),
                100, 5000, 0.25, seq,
            )

        rows = [
            # p0: AAPL contracts interleave; gate is per UNDERLYING, so the
            # C150 update at t=10 arrives after the P140 at t=30 -> dropped
            # even though it is a different contract (reference gates on
            # stream_symbol, not contract).
            upd("p0", "AAPL", "AAPL240621C150", "CALL", "150", 0, "5.00", 0),
            upd("p0", "AAPL", "AAPL240621P140", "PUT", "140", 30, "3.00", 1),
            upd("p0", "AAPL", "AAPL240621C150", "CALL", "150", 10, "5.10", 2),
            upd("p0", "AAPL", "AAPL240621C150", "CALL", "150", 30, "5.20", 3),
            upd("p0", "MSFT", "MSFT240621C400", "CALL", "400", 5, "7.00", 4),
            # p1 streams TSLA, but the allow-set only admits GOOG from p1
            upd("p1", "TSLA", "TSLA240621C200", "CALL", "200", 7, "9.00", 5),
            upd("p1", "GOOG", "GOOG240621P100", "PUT", "100", 8, "2.00", 6),
        ]
        df = spark.createDataFrame(rows, schema=schemas.OPTION_UPDATES)
        path = str(tmp_path / "opts")
        df.repartition(1).write.parquet(path)
        return path, schemas.OPTION_UPDATES

    def test_fan_in_allow_set_and_gate(self, spark, option_rows, tmp_path):
        from borsa_spark.streaming import option_stream

        path, schema = option_rows
        src = spark.readStream.schema(schema).parquet(path)
        p0 = src.filter(F.col("provider") == "p0")
        p1 = src.filter(F.col("provider") == "p1")
        out_df = option_stream([p0, p1], allowed={1: ["GOOG"]})
        out = _run_stream(spark, out_df, tmp_path, "opt_out", "append")
        kept = sorted(r.seq for r in out.collect())
        # seq 2 dropped (older than AAPL HWM 30); seq 3 kept (equal ts);
        # seq 5 dropped by p1's allow-set.
        assert kept == [0, 1, 3, 4, 6]
        by_seq = {r.seq: r for r in out.collect()}
        assert by_seq[3].contract_symbol == "AAPL240621C150"
        assert float(by_seq[6].strike) == 100.0

    def test_ungated_passthrough_keeps_all_allowed(
        self, spark, option_rows, tmp_path
    ):
        from borsa_spark.streaming import option_stream

        path, schema = option_rows
        src = spark.readStream.schema(schema).parquet(path)
        out_df = option_stream([src], gate=False)
        out = _run_stream(spark, out_df, tmp_path, "opt_raw", "append")
        assert sorted(r.seq for r in out.collect()) == list(range(7))


class TestRollupStream:
    def test_tiered_bars_stacked_stateful_ops(self, spark, tmp_path):
        """ticks -> 60s bars -> 300s bars in ONE streaming query (two
        stacked stateful aggregations, append mode). With max tick at
        t=590 and a 10s watermark, tier 1 closes bars through [480,540)
        and tier 2 closes exactly the [0,300) bucket."""
        import datetime as dt

        from borsa_spark.streaming.fanin import rollup_stream

        def ts(sec):
            return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

        rows = [
            ("AAPL", ts(0), 10.0, 0),
            ("AAPL", ts(30), 12.0, 1),
            ("AAPL", ts(90), 9.0, 2),
            ("AAPL", ts(250), 11.0, 3),
            ("AAPL", ts(400), 20.0, 4),
            ("AAPL", ts(590), 21.0, 5),
        ]
        df = spark.createDataFrame(
            rows, "symbol string, ts timestamp, price double, seq long"
        )
        path = str(tmp_path / "rollup_ticks")
        df.repartition(1).write.parquet(path)
        src = spark.readStream.schema(df.schema).parquet(path)
        bars = rollup_stream(src, [60, 300], watermark="10 seconds")
        out = _run_stream(spark, bars, tmp_path, "rollup_out", "append")
        got = {(r.symbol, int(r.ts.timestamp()) % 86400): r
               for r in out.collect()}
        assert set(got) == {("AAPL", 0)}  # only [0,300) closed at tier 2
        bar = got[("AAPL", 0)]
        # ticks in [0,300): 10@0, 12@30, 9@90, 11@250
        assert (float(bar.open), float(bar.high), float(bar.low),
                float(bar.close), bar.n_ticks) == (10.0, 12.0, 9.0, 11.0, 4)
        assert bar.interval == "300s" and bar.is_final

    def test_tier_divisibility_enforced(self, spark):
        import pytest

        from borsa_spark.streaming.fanin import rollup_stream

        df = spark.readStream.format("rate").load().selectExpr(
            "'A' AS symbol", "timestamp AS ts", "CAST(value AS DOUBLE) AS price"
        )
        with pytest.raises(ValueError, match="divide"):
            rollup_stream(df, [60, 90])


class TestStreamingExactDedup:
    def test_replays_dropped_within_watermark(self, spark, tmp_path):
        import datetime as dt

        from borsa_spark.streaming.fanin import streaming_exact_dedup

        def ts(sec):
            return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

        rows = [
            ("AAPL", ts(0), 10.0, 0),
            ("AAPL", ts(0), 10.0, 1),   # exact replay -> dropped
            ("AAPL", ts(5), 11.0, 2),
            ("MSFT", ts(0), 20.0, 3),
            ("MSFT", ts(0), 20.0, 4),   # replay -> dropped
        ]
        df = spark.createDataFrame(
            rows, "symbol string, ts timestamp, price double, seq long"
        )
        path = str(tmp_path / "replays")
        df.repartition(1).write.parquet(path)
        src = spark.readStream.schema(df.schema).parquet(path)
        deduped = streaming_exact_dedup(src, ["symbol", "ts", "price"])
        out = _run_stream(spark, deduped, tmp_path, "dedup_out")
        assert sorted((r.symbol, r.price) for r in out.collect()) == [
            ("AAPL", 10.0), ("AAPL", 11.0), ("MSFT", 20.0),
        ]


class TestClockSkew:
    def test_per_symbol_clocks_do_not_interfere(self, spark, tmp_path):
        """router_stream_clock_skew.rs: symbols with wildly different clock
        bases each keep their own high-water mark — one symbol's 'future'
        clock never drops another's updates."""
        import datetime as dt

        def ts(sec):
            return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

        rows = [
            ("FAST", ts(1_000_000), 1.0, 0),   # clock far ahead
            ("SLOW", ts(10), 2.0, 1),          # clock far behind: still passes
            ("FAST", ts(1_000_010), 1.1, 2),
            ("SLOW", ts(5), 2.1, 3),           # older within SLOW -> dropped
            ("SLOW", ts(20), 2.2, 4),
        ]
        df = spark.createDataFrame(
            rows, "symbol string, ts timestamp, price double, seq long"
        )
        path = str(tmp_path / "skew")
        df.repartition(1).write.parquet(path)
        src = spark.readStream.schema(df.schema).parquet(path)
        gated = streaming_monotonic_gate(src)
        out = _run_stream(spark, gated, tmp_path, "skew_out")
        assert sorted(r.seq for r in out.collect()) == [0, 1, 2, 4]


class TestRocksDBStateStore:
    def test_gate_on_rocksdb_provider(self, spark, stream_rows, tmp_path):
        """The stateful gate must run on RocksDBStateStoreProvider — the
        off-heap state backend for production scale (HDFSBacked keeps all
        state on the JVM heap; at millions of symbols that's the first thing
        to fall over)."""
        path, schema = stream_rows
        prev = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", ""
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        try:
            src = spark.readStream.schema(schema).parquet(path)
            gated = streaming_monotonic_gate(src)
            out = _run_stream(spark, gated, tmp_path, "gate_rocks", "append")
            assert sorted(r.seq for r in out.collect()) == [0, 1, 3, 4, 5, 7]
        finally:
            if prev:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev
                )
            else:
                spark.conf.unset(
                    "spark.sql.streaming.stateStore.providerClass"
                )


class TestSessionWindowStreaming:
    """w13's streaming half: the SAME session_window aggregation runs
    under Structured Streaming with a watermark — closed sessions match
    the batch computation over the same feed (T12's append-mode pattern
    for session windows)."""

    def test_closed_sessions_match_batch(self, spark, tmp_path):
        import datetime as dt

        import pyspark.sql.functions as F

        def ts(minute):
            return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute)

        schema = "user_id long, ts timestamp"
        # user 1: events at 0,10 (one session), 50 (second session);
        # user 2: single event; a late final event moves the watermark
        rows = [
            (1, ts(0)), (1, ts(10)), (1, ts(50)),
            (2, ts(5)),
            (9, ts(400)),  # watermark pusher
        ]
        path = tmp_path / "sess_events"
        path.mkdir()
        spark.createDataFrame(rows, schema).repartition(1).write.parquet(
            str(path / "b0")
        )
        src = spark.readStream.schema(schema).parquet(str(path / "b*"))
        agg = (
            src.withWatermark("ts", "10 seconds")
            .groupBy(
                "user_id",
                F.session_window("ts", "30 minutes").alias("w"),
            )
            .agg(F.count("*").alias("n_events"), F.min("ts").alias("start"))
        )
        out = _run_stream(spark, agg, tmp_path, "sess_out", "append")
        got = {
            (r.user_id, r.start): r.n_events
            for r in out.collect()
            if r.user_id != 9
        }
        # batch reference over the same rows
        batch = (
            spark.createDataFrame(rows, schema)
            .filter(F.col("user_id") != 9)
            .groupBy(
                "user_id",
                F.session_window("ts", "30 minutes").alias("w"),
            )
            .agg(F.count("*").alias("n_events"), F.min("ts").alias("start"))
        )
        want = {(r.user_id, r.start): r.n_events for r in batch.collect()}
        assert got == want
        assert got[(1, ts(0))] == 2   # 0 and 10 merged
        assert got[(1, ts(50))] == 1  # 50 is a fresh session (gap 40m)

    def test_late_event_merges_open_session_across_batches(
        self, spark, tmp_path
    ):
        """The r6-verdict late-merge case: an event arriving in a LATER
        micro-batch, inside an open session's gap, must MERGE into
        (extend) that session before it closes — and a truly late event
        must be dropped, diverging from the batch computation in exactly
        that one row (watermark discipline, not a bug).

        Two empirically-pinned Spark semantics this test documents:
        late rows drop on session-window END vs watermark (not event
        time), and the watermark used for filtering/eviction in batch N
        is the one COMMITTED after batch N-1 — it lags the data by one
        batch, which is why the drop needs a second pusher batch."""
        import datetime as dt

        import pyspark.sql.functions as F

        def ts(minute):
            return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute)

        schema = "user_id long, ts timestamp"
        batches = [
            # b0: user 1 session opens [0, 40) — events at 0 and 10
            [(1, ts(0)), (1, ts(10))],
            # b1: event at 25 — 15 min after the session's last event,
            # inside the 30-min gap: must merge, extending to [0, 55)
            [(1, ts(25))],
            # b2+b3: watermark pushers. After b2 the watermark computed
            # from its data is ~399:50, but filtering in b3 is what
            # first USES it (one-batch lag) — b3 closes/emits user 1's
            # merged session and commits the watermark for b4
            [(9, ts(400))],
            [(9, ts(401))],
            # b4: user 3's session window [1, 31) ends below the
            # committed watermark -> dropped by the stream, kept by the
            # batch reference
            [(3, ts(1))],
        ]
        path = tmp_path / "sess_late"
        path.mkdir()
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).repartition(1).write.parquet(
                str(path / f"b{i}")
            )
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(path / "b*"))
        )
        agg = (
            src.withWatermark("ts", "10 seconds")
            .groupBy(
                "user_id",
                F.session_window("ts", "30 minutes").alias("w"),
            )
            .agg(F.count("*").alias("n_events"), F.max("ts").alias("last"))
        )
        out = _run_stream(spark, agg, tmp_path, "sess_late_out", "append")
        got = {
            (r.user_id, r.w.start): r for r in out.collect() if r.user_id != 9
        }
        # the late arrival merged: ONE session for user 1, 3 events,
        # window extended to last-event + gap
        assert set(got) == {(1, ts(0))}
        sess = got[(1, ts(0))]
        assert sess.n_events == 3
        assert sess.last == ts(25)
        assert sess.w.end == ts(25 + 30)
        # batch over the same rows keeps user 3; the stream dropped it
        # below the watermark — assert the difference is exactly that row
        batch_rows = [r for b in batches for r in b]
        batch = (
            spark.createDataFrame(batch_rows, schema)
            .filter(F.col("user_id") != 9)
            .groupBy(
                "user_id",
                F.session_window("ts", "30 minutes").alias("w"),
            )
            .agg(F.count("*").alias("n_events"))
        )
        want = {(r.user_id, r.w.start) for r in batch.collect()}
        assert want - set(got) == {(3, ts(1))}
        assert set(got) <= want


class TestDropDuplicatesWithinWatermark:
    """Streaming dedup with bounded state: dropDuplicatesWithinWatermark
    keeps the dedup key only while it can still collide (the watermark
    horizon) — the native form of the ingest path's md5 anti-join for
    at-the-source tick dedup."""

    def test_in_window_duplicates_dropped(self, spark, tmp_path):
        import datetime as dt

        schema = "symbol string, seq long, ts timestamp, price double"

        def ts(sec):
            return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

        batches = [
            [("AAPL", 1, ts(0), 10.0), ("AAPL", 1, ts(1), 10.0)],  # dup seq
            [("AAPL", 1, ts(2), 10.0), ("AAPL", 2, ts(3), 11.0)],  # replay + new
        ]
        path = tmp_path / "ddw"
        path.mkdir()
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).repartition(1).write.parquet(
                str(path / f"b{i}")
            )
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(path / "b*"))
        )
        dedup = src.withWatermark("ts", "1 hour") \
            .dropDuplicatesWithinWatermark(["symbol", "seq"])
        out = _run_stream(spark, dedup, tmp_path, "ddw_out", "append")
        rows = out.collect()
        seqs = sorted((r.symbol, r.seq) for r in rows)
        assert seqs == [("AAPL", 1), ("AAPL", 2)]  # replays dropped


from borsa_spark.streaming.gate import _tws_available


class TestTwsAvailabilityGuard:
    """NEVER-skipped guard on the transformWithState skip itself: the
    equivalence tests below may only skip for EXACTLY the documented
    reason (google.protobuf absent from this container). If the probe
    fails any other way — a Spark upgrade renaming StatefulProcessor,
    a broken half-install — this fails loudly instead of letting the
    skip rot; the moment protobuf appears, _tws_available() flips and
    the full equivalence suite auto-activates (skip count drops to 0
    with no code change)."""

    def test_unavailability_reason_is_exactly_protobuf(self):
        from borsa_spark.streaming.gate import _tws_unavailable_reason

        # raises RuntimeError on any undocumented breakage
        reason = _tws_unavailable_reason()
        assert reason in (None, "google.protobuf absent")
        if reason is None:
            # runnable: the real equivalence tests below must not skip
            assert _tws_available()


@pytest.mark.skipif(
    not _tws_available(),
    reason="transformWithState needs the protobuf runtime "
           "(absent in this container); runs on real Spark 4 clusters",
)
class TestTransformWithStateGate:
    """T8 on Spark 4's transformWithState API: same kept-set as the
    legacy applyInPandasWithState gate over the same feed, RocksDB
    state store (required by the operator), cross-batch HWM state."""

    def test_same_kept_set_as_legacy_gate(self, spark, stream_rows,
                                          tmp_path):
        from borsa_spark.streaming.gate import (
            streaming_monotonic_gate_tws,
        )

        path, schema = stream_rows
        src = spark.readStream.schema(schema).parquet(path)
        gated = streaming_monotonic_gate_tws(src)
        q = (
            gated.writeStream.format("memory")
            .queryName("tws_gate_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .option(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        kept = sorted(r.seq for r in spark.table("tws_gate_out").collect())
        assert kept == [0, 1, 3, 4, 5, 7]  # == legacy gate's kept set

    def test_cross_batch_state(self, spark, tmp_path):
        import datetime as dt

        from borsa_spark.streaming.gate import (
            streaming_monotonic_gate_tws,
        )

        def ts(sec):
            return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

        schema = "symbol string, ts timestamp, seq long"
        batches = [
            [("AAPL", ts(100), 0)],
            [("AAPL", ts(50), 1),   # older than batch-0 HWM -> dropped
             ("AAPL", ts(100), 2),  # equal allowed
             ("AAPL", ts(200), 3)],
        ]
        path = tmp_path / "tws_ticks"
        path.mkdir()
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).repartition(1) \
                .write.parquet(str(path / f"b{i}"))
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(path / "b*"))
        )
        gated = streaming_monotonic_gate_tws(src)
        q = (
            gated.writeStream.format("memory")
            .queryName("tws_xbatch")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_txb"))
            .option(
                "spark.sql.streaming.stateStore.providerClass",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        kept = sorted(r.seq for r in spark.table("tws_xbatch").collect())
        assert kept == [0, 2, 3]  # HWM survived the batch boundary
