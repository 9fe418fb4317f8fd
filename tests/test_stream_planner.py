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
