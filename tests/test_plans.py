"""Routing policy (R1-R2) + interval planning (R6) — pure-Python unit tests.

Ported behaviors: borsa-types/tests/routing_policy_serde.rs semantics,
borsa/tests/router_history_interval_*.rs scenario expectations.
"""

from __future__ import annotations

import pytest

from borsa_spark.errors import UnsupportedError
from borsa_spark.plans import (
    INF,
    ResamplePlan,
    RoutingContext,
    RoutingPolicy,
    Selector,
    choose_effective_interval,
)


class TestRoutingPolicy:
    def test_no_rules_everything_eligible_at_inf(self):
        p = RoutingPolicy()
        assert p.providers.provider_rank(RoutingContext(), "x") == (INF, False)

    def test_global_rule_ranks(self):
        p = RoutingPolicy().providers_global(["a", "b"])
        ctx = RoutingContext(symbol="AAPL")
        assert p.providers.provider_rank(ctx, "a") == (0, False)
        assert p.providers.provider_rank(ctx, "b") == (1, False)
        assert p.providers.provider_rank(ctx, "zzz") == (INF, False)

    def test_global_strict_excludes_unlisted(self):
        p = RoutingPolicy().providers_global(["a"], strict=True)
        assert p.providers.provider_rank(RoutingContext(), "other") is None
        assert p.providers.provider_rank(RoutingContext(), "a") == (0, True)

    def test_specificity_symbol_beats_kind(self):
        p = (
            RoutingPolicy()
            .providers_for_kind("EQUITY", ["kind_prov"])
            .providers_for_symbol("AAPL", ["sym_prov"])
        )
        ctx = RoutingContext(symbol="AAPL", kind="EQUITY")
        assert p.providers.provider_rank(ctx, "sym_prov") == (0, False)
        # kind rule loses; kind_prov unlisted in the winning rule -> INF
        assert p.providers.provider_rank(ctx, "kind_prov") == (INF, False)

    def test_tie_later_rule_wins(self):
        p = (
            RoutingPolicy()
            .providers_for_kind("EQUITY", ["first"])
            .providers_for_kind("EQUITY", ["second"])
        )
        ctx = RoutingContext(kind="EQUITY")
        assert p.providers.provider_rank(ctx, "second") == (0, False)
        assert p.providers.provider_rank(ctx, "first") == (INF, False)

    def test_combined_selector_more_specific(self):
        p = (
            RoutingPolicy()
            .providers_for_symbol("AAPL", ["sym_only"])
            .providers_rule(
                Selector(symbol="AAPL", kind="EQUITY"), ["sym_kind"], strict=True
            )
        )
        ctx = RoutingContext(symbol="AAPL", kind="EQUITY")
        assert p.providers.provider_rank(ctx, "sym_kind") == (0, True)
        assert p.providers.provider_rank(ctx, "sym_only") is None  # strict

    def test_rule_miss_falls_back_to_global(self):
        p = (
            RoutingPolicy()
            .providers_global(["g1", "g2"])
            .providers_for_symbol("MSFT", ["m"])
        )
        ctx = RoutingContext(symbol="AAPL")
        assert p.providers.provider_rank(ctx, "g2") == (1, False)

    def test_normalize_rejects_unknown_and_dedups(self):
        p = RoutingPolicy().providers_global(["a", "ghost", "a", "b"])
        unknown = p.providers.normalize_and_collect_unknown({"a", "b"})
        assert unknown == [(Selector(), ["ghost"])]
        assert p.providers.global_rule == (["a", "b"], False)

    def test_exchange_scope_resolution(self):
        p = (
            RoutingPolicy()
            .exchanges_global(["NYSE", "NASDAQ"])
            .exchanges_for_kind("CRYPTO", ["BINANCE"])
            .exchanges_for_symbol("AAPL", ["NASDAQ"])
        )
        assert p.exchange_rank_map(RoutingContext(symbol="AAPL")) == {"NASDAQ": 0}
        assert p.exchange_rank_map(RoutingContext(kind="CRYPTO")) == {"BINANCE": 0}
        assert p.exchange_rank_map(RoutingContext(symbol="X")) == {
            "NYSE": 0, "NASDAQ": 1,
        }

    def test_exchange_sort_key_none_last(self):
        p = RoutingPolicy().exchanges_global(["NYSE"])
        ctx = RoutingContext()
        known = p.exchange_sort_key(ctx, "NYSE", 5)
        unknown = p.exchange_sort_key(ctx, "LSE", 1)
        none = p.exchange_sort_key(ctx, None, 0)
        assert known < unknown
        assert unknown < none  # same INF rank, but none_penalty orders after


class TestChooseEffectiveInterval:
    def test_exact_passthrough(self):
        assert choose_effective_interval(["1d", "1h"], "1h") == ("1h", None)

    def test_largest_divisor(self):
        # router_history_interval_largest_divisor.rs: 60m from {5m, 15m, 30m}
        eff, plan = choose_effective_interval(["5m", "15m", "30m"], "1h")
        assert eff == "30m"
        assert plan == ResamplePlan.for_minutes(60)

    def test_non_divisible_rejected(self):
        # router_history_interval_reject_non_divisible.rs
        with pytest.raises(UnsupportedError):
            choose_effective_interval(["30m"], "15m")

    def test_90m_from_30m(self):
        eff, plan = choose_effective_interval(["30m"], "90m")
        assert (eff, plan) == ("30m", ResamplePlan.for_minutes(90))

    def test_daily_from_coarsest_intraday(self):
        eff, plan = choose_effective_interval(["5m", "1h"], "1d")
        assert (eff, plan) == ("1h", ResamplePlan.daily())

    def test_weekly_prefers_daily(self):
        # router_history_weekly_fallback.rs
        eff, plan = choose_effective_interval(["1h", "1d"], "1wk")
        assert (eff, plan) == ("1d", ResamplePlan.weekly())

    def test_weekly_from_intraday(self):
        eff, plan = choose_effective_interval(["30m"], "1wk")
        assert (eff, plan) == ("30m", ResamplePlan.weekly())

    def test_calendar_passthrough(self):
        assert choose_effective_interval(["1d"], "3mo") == ("3mo", None)

    def test_daily_no_intraday_rejected(self):
        with pytest.raises(UnsupportedError):
            choose_effective_interval(["1wk"], "1d")


class TestRangeAndSerde:
    def test_range_to_bounds(self):
        import datetime as dt

        from borsa_spark.plans.intervals import range_to_bounds

        now = dt.datetime(2024, 7, 1, 12, 30)
        s, e = range_to_bounds("6mo", now)
        assert (now - s).days == 182 and e == now
        s, e = range_to_bounds("ytd", now)
        assert s == dt.datetime(2024, 1, 1) and e == now
        s, e = range_to_bounds("max", now)
        assert s is None and e == now
        with pytest.raises(UnsupportedError):
            range_to_bounds("7w", now)

    def test_history_request_range_resolution(self):
        import datetime as dt

        from borsa_spark.router import HistoryRequest

        req = HistoryRequest(symbol="AAPL", range="1mo")
        r = req.resolved(now=dt.datetime(2024, 7, 1))
        assert r.start == dt.datetime(2024, 6, 1) and r.end == dt.datetime(2024, 7, 1)
        # explicit period wins over range (range XOR period)
        req2 = HistoryRequest(symbol="AAPL", range="1mo",
                              start=dt.datetime(2020, 1, 1))
        assert req2.resolved().start == dt.datetime(2020, 1, 1)

    def test_policy_serde_round_trip(self):
        import json

        p = (
            RoutingPolicy()
            .providers_global(["a", "b"])
            .providers_for_symbol("AAPL", ["b"], strict=True)
            .providers_rule(Selector(kind="EQUITY", exchange="NYSE"), ["a"])
            .exchanges_global(["NYSE", "NASDAQ"])
            .exchanges_for_kind("CRYPTO", ["BINANCE"])
        )
        d = json.loads(json.dumps(p.to_dict()))  # through JSON
        q = RoutingPolicy.from_dict(d)
        ctx = RoutingContext(symbol="AAPL", kind="EQUITY", exchange="NYSE")
        for key in ("a", "b", "zzz"):
            assert p.providers.provider_rank(ctx, key) == \
                   q.providers.provider_rank(ctx, key)
        assert p.exchange_rank_map(RoutingContext(kind="CRYPTO")) == \
               q.exchange_rank_map(RoutingContext(kind="CRYPTO"))
        assert q.to_dict() == p.to_dict()
