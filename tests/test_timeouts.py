"""R7: per-provider wall-clock timeouts + whole-request deadline.

Ports of the reference's timeout machinery: provider_call_with_timeout
(borsa/src/core.rs:346-361), join_with_deadline / collapse rules
(borsa/src/router/util.rs:12-60), and the mock's Hang behavior
(borsa-mock/src/dynamic.rs:25-35).
"""

from __future__ import annotations

import time

import pytest

from borsa_spark.errors import (
    AllProvidersTimedOut,
    ProviderTimeout,
    RequestTimeout,
    collapse_errors,
)
from borsa_spark.router import HistoryRequest, history
from borsa_spark.router.deadline import Deadline, provider_call_with_timeout
from borsa_spark.sources.mock import Hang, ScriptedSource
from borsa_spark.sources.provider import Catalog
from tests.conftest import candle, make_candles


class TestProviderCallWithTimeout:
    def test_fast_call_returns_value(self):
        assert provider_call_with_timeout("p", "history", 1.0, lambda: 42) == 42

    def test_none_timeout_runs_inline(self):
        import threading

        tid = provider_call_with_timeout(
            "p", "history", None, lambda: threading.get_ident()
        )
        assert tid == threading.get_ident()  # no worker thread involved

    def test_elapse_maps_to_provider_timeout_with_blame(self):
        hang = Hang(seconds=2.0)
        t0 = time.monotonic()
        with pytest.raises(ProviderTimeout) as ei:
            provider_call_with_timeout("slowprov", "quote", 0.15, hang)
        assert time.monotonic() - t0 < 1.0  # gave up at the budget, not the stall
        assert ei.value.connector == "slowprov"
        assert "quote" in ei.value.message
        hang.release()

    def test_provider_error_passes_through(self):
        def boom():
            raise ProviderTimeout("inner", connector="x")

        with pytest.raises(ProviderTimeout) as ei:
            provider_call_with_timeout("p", "history", 1.0, boom)
        assert ei.value.connector == "x"


class TestCollapseRules:
    def test_single_timeout_collapses_to_all_timed_out(self):
        # util.rs:40-48: even a lone ProviderTimeout collapses.
        err = collapse_errors(1, [ProviderTimeout("t", connector="a")], "history")
        assert isinstance(err, AllProvidersTimedOut)

    def test_mixed_errors_do_not_collapse_to_timeout(self):
        errs = [ProviderTimeout("t", connector="a"), RequestTimeout("r")]
        err = collapse_errors(2, errs, "history")
        assert not isinstance(err, AllProvidersTimedOut)


class TestHistoryTimeouts:
    def test_hanging_provider_times_out_and_fallback_answers(self, spark):
        hang = Hang(seconds=30.0)
        try:
            slow = ScriptedSource("slow").script("history", hang)
            # Build the healthy frame BEFORE the request so its py4j calls
            # inside the budget are cheap; the budget must bound the stall,
            # not legitimate driver work on a loaded machine.
            fast_df = make_candles(spark, [candle("fast", sec=0, o=1.0)])
            fast = ScriptedSource("fast").script("history", fast_df)
            cat = Catalog().register(slow).register(fast)
            res = history(
                spark, cat, HistoryRequest(symbol="AAPL"),
                provider_timeout=3.0,
            )
            rows = res.candles.collect()
            assert {str(r.provider) for r in rows} == {"fast"}
            assert any("slow" in w and "history" in w for w in res.warnings)
        finally:
            hang.release()

    def test_all_hang_collapses_to_all_providers_timed_out(self, spark):
        h1, h2 = Hang(seconds=30.0), Hang(seconds=30.0)
        try:
            cat = (
                Catalog()
                .register(ScriptedSource("s1").script("history", h1))
                .register(ScriptedSource("s2").script("history", h2))
            )
            with pytest.raises(AllProvidersTimedOut):
                history(
                    spark, cat, HistoryRequest(symbol="AAPL"),
                    provider_timeout=0.2,
                )
        finally:
            h1.release()
            h2.release()

    def test_request_deadline_aborts_remaining_chain(self, spark):
        # First provider eats the whole request budget; the second is never
        # invoked — the router raises RequestTimeout instead of trying it.
        hang = Hang(seconds=5.0)
        try:
            slow = ScriptedSource("slow").script("history", hang)
            never = ScriptedSource("never").script(
                "history", make_candles(spark, [candle("never", sec=0, o=1.0)])
            )
            cat = Catalog().register(slow).register(never)
            with pytest.raises(RequestTimeout):
                history(
                    spark, cat, HistoryRequest(symbol="AAPL"),
                    request_timeout=0.25,
                )
            assert never.calls == []  # chain aborted before provider 2
        finally:
            hang.release()


class TestLatencyRace:
    """R4 (core.rs:560-616): completion order decides, not priority."""

    def _quotes(self, spark, provider):
        from borsa_spark.sources.mock import fixture_quotes_df

        return fixture_quotes_df(spark, provider)

    def test_slow_high_priority_loses_to_fast_low_priority(self, spark):
        from borsa_spark.router import quote

        slow_df = self._quotes(spark, "slowprov")
        fast_df = self._quotes(spark, "fastprov")

        def slow_fetch():
            time.sleep(1.2)
            return slow_df

        slow = ScriptedSource("slowprov").script("quote", slow_fetch)
        fast = ScriptedSource("fastprov").script("quote", fast_df)
        cat = Catalog().register(slow).register(fast)  # slow = priority 0

        out = quote(
            spark, cat, "AAPL", strategy="latency", provider_timeout=10.0
        ).collect()
        assert [str(r.provider) for r in out] == ["fastprov"]

    def test_failed_fast_provider_yields_to_slower_success(self, spark):
        from borsa_spark.errors import DataError
        from borsa_spark.router import quote

        slow_df = self._quotes(spark, "slowprov")

        def slow_fetch():
            time.sleep(0.3)
            return slow_df

        failing = ScriptedSource("failing").script(
            "quote", DataError("boom", connector="failing")
        )
        slow = ScriptedSource("slowprov").script("quote", slow_fetch)
        cat = Catalog().register(failing).register(slow)

        out = quote(
            spark, cat, "AAPL", strategy="latency", provider_timeout=10.0
        ).collect()
        assert [str(r.provider) for r in out] == ["slowprov"]

    def test_not_found_loser_accumulates_and_race_continues(self, spark):
        from borsa_spark.router import quote

        empty = self._quotes(spark, "emptyprov").filter("symbol = 'NOPE'")
        has = self._quotes(spark, "hasprov")

        def has_fetch():
            time.sleep(0.3)
            return has

        cat = (
            Catalog()
            .register(ScriptedSource("emptyprov").script("quote", empty))
            .register(ScriptedSource("hasprov").script("quote", has_fetch))
        )
        out = quote(
            spark, cat, "AAPL", strategy="latency", provider_timeout=10.0
        ).collect()
        assert [str(r.provider) for r in out] == ["hasprov"]

    def test_all_hang_collapses_to_all_providers_timed_out(self, spark):
        from borsa_spark.router import quote

        h1, h2 = Hang(seconds=30.0), Hang(seconds=30.0)
        try:
            cat = (
                Catalog()
                .register(ScriptedSource("s1").script("quote", h1))
                .register(ScriptedSource("s2").script("quote", h2))
            )
            with pytest.raises(AllProvidersTimedOut):
                quote(
                    spark, cat, "AAPL", strategy="latency",
                    provider_timeout=0.2,
                )
        finally:
            h1.release()
            h2.release()

    def test_race_providers_returns_winner_name(self):
        from borsa_spark.router.deadline import race_providers

        def slow():
            time.sleep(0.5)
            return "slow-value"

        winner, value = race_providers(
            [("a", slow), ("b", lambda: "fast-value")], "quote", 5.0
        )
        assert (winner, value) == ("b", "fast-value")


class TestFetchStrategyContrast:
    """router_quote_concurrency.rs: under the DEFAULT PriorityWithFallback
    strategy a faster lower-priority provider must NOT beat a slower
    higher-priority success — the exact inverse of the latency race."""

    def test_slow_high_priority_wins_under_priority_strategy(self, spark):
        from borsa_spark.router import quote
        from borsa_spark.sources.mock import ScriptedSource, fixture_quotes_df

        slow_df = fixture_quotes_df(spark, "slowprov")

        def slow_fetch():
            time.sleep(0.3)
            return slow_df

        slow = ScriptedSource("slowprov").script("quote", slow_fetch)
        fast = ScriptedSource("fastprov").script(
            "quote", fixture_quotes_df(spark, "fastprov")
        )
        cat = Catalog().register(slow).register(fast)  # slow = priority 0
        out = quote(spark, cat, "AAPL").collect()  # default: priority
        assert [str(r.provider) for r in out] == ["slowprov"]


class TestCapabilityHotSwap:
    """router_quote_provider_hot_swap.rs: a capability disappearing between
    calls surfaces as a routing error, never a crash."""

    def test_dropped_capability_errors_cleanly(self, spark):
        from borsa_spark.errors import UnsupportedError
        from borsa_spark.router import quote
        from borsa_spark.sources.mock import ScriptedSource, fixture_quotes_df

        src = ScriptedSource("hot").script(
            "quote", fixture_quotes_df(spark, "hot")
        )
        cat = Catalog().register(src)
        assert quote(spark, cat, "AAPL").count() == 1  # capability present

        # hot-swap: capability vanishes before the next call
        del src.behaviors["quote"]
        del src.tables["quote"]
        with pytest.raises(UnsupportedError):
            quote(spark, cat, "AAPL")
        with pytest.raises(UnsupportedError):
            quote(spark, cat, "AAPL", strategy="latency")


class TestDeadline:
    def test_no_budget_passes_provider_timeout_through(self):
        d = Deadline(None)
        assert d.clamp(3.0) == 3.0
        assert d.clamp(None) is None

    def test_clamp_to_remaining(self):
        d = Deadline(10.0)
        assert 0 < d.clamp(None) <= 10.0
        assert d.clamp(0.05) == 0.05

    def test_exhausted_budget_raises(self):
        d = Deadline(0.01, "history(X)")
        time.sleep(0.03)
        with pytest.raises(RequestTimeout):
            d.clamp(1.0)


class TestActionableCollapse:
    def test_all_not_found_collapses_to_not_found(self):
        from borsa_spark.errors import NotFoundError

        err = collapse_errors(
            2, [NotFoundError("a"), NotFoundError("b")], "history",
            not_found_what="history for X",
        )
        assert isinstance(err, NotFoundError)
        assert "history for X" in err.message

    def test_flatten_and_actionable(self):
        from borsa_spark.errors import (
            AllProvidersFailed,
            DataError,
            NotFoundError,
            UnsupportedError,
            flatten,
            is_actionable,
        )

        nested = AllProvidersFailed(
            [NotFoundError("x"),
             AllProvidersFailed([DataError("d"), UnsupportedError("u")])]
        )
        flat = flatten(nested)
        assert [type(e).__name__ for e in flat] == [
            "NotFoundError", "DataError", "UnsupportedError",
        ]
        assert is_actionable(nested)  # contains one actionable (DataError)
        assert not is_actionable(
            AllProvidersFailed([NotFoundError("x"), UnsupportedError("u")])
        )

    def test_stream_collapse_filters_non_actionable(self):
        from borsa_spark.errors import DataError, NotFoundError
        from borsa_spark.streaming import collapse_stream_errors

        out = collapse_stream_errors(
            "stream_quotes", [NotFoundError("x"), DataError("d")]
        )
        assert isinstance(out, DataError)  # NotFound filtered out
