"""Middleware tests — ports of borsa-middleware/tests/ behaviors
(cache TTL/LRU/negative/keys, quota windows + slice alignment, blacklist)."""

from __future__ import annotations

import pytest

from borsa_spark.errors import (
    NotFoundError,
    ProviderTimeout,
    QuotaExceeded,
    RateLimited,
    TemporarilyBlacklisted,
)
from borsa_spark.middleware import (
    Blacklist,
    MiddlewareStack,
    QuotaGuard,
    TTLCache,
    history_key,
)


class Clock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


class TestTTLCache:
    def test_hit_within_ttl_miss_after(self):
        clock = Clock()
        c = TTLCache(ttls={"quote": 2.0}, clock=clock)
        calls = []
        fn = lambda: calls.append(1) or "v"  # noqa: E731
        assert c.get_or_compute(("quote", "AAPL"), fn) == "v"
        assert c.get_or_compute(("quote", "AAPL"), fn) == "v"
        assert len(calls) == 1
        clock.t = 2.1
        c.get_or_compute(("quote", "AAPL"), fn)
        assert len(calls) == 2

    def test_lru_eviction(self):
        c = TTLCache(max_size=2, ttls={"quote": 100.0}, clock=Clock())
        c.get_or_compute(("quote", "A"), lambda: 1)
        c.get_or_compute(("quote", "B"), lambda: 2)
        c.get_or_compute(("quote", "A"), lambda: 0)  # touch A
        c.get_or_compute(("quote", "C"), lambda: 3)  # evicts B (LRU)
        calls = []
        c.get_or_compute(("quote", "B"), lambda: calls.append(1) or 9)
        assert calls  # B was recomputed
        calls2 = []
        c.get_or_compute(("quote", "A"), lambda: calls2.append(1) or 9)
        # A itself was evicted when B re-entered (size 2: [C, B])
        assert calls2

    def test_negative_caching_permanent_only(self):
        clock = Clock()
        c = TTLCache(ttls={"quote": 100.0}, default_negative_ttl=5.0, clock=clock)
        calls = []

        def not_found():
            calls.append(1)
            raise NotFoundError("nope")

        with pytest.raises(NotFoundError):
            c.get_or_compute(("quote", "GHOST"), not_found)
        with pytest.raises(NotFoundError):
            c.get_or_compute(("quote", "GHOST"), not_found)
        assert len(calls) == 1  # served from the negative store
        clock.t = 5.1
        with pytest.raises(NotFoundError):
            c.get_or_compute(("quote", "GHOST"), not_found)
        assert len(calls) == 2

        def transient():
            calls.append(1)
            raise ProviderTimeout("slow")

        with pytest.raises(ProviderTimeout):
            c.get_or_compute(("quote", "SLOW"), transient)
        with pytest.raises(ProviderTimeout):
            c.get_or_compute(("quote", "SLOW"), transient)
        assert len(calls) == 4  # transient errors never cached

    def test_history_key_flags_distinct(self):
        k1 = history_key("AAPL", "EQUITY", "1d", auto_adjust=True)
        k2 = history_key("AAPL", "EQUITY", "1d", auto_adjust=False)
        k3 = history_key("AAPL", "EQUITY", "1d", auto_adjust=True,
                         include_actions=True)
        assert len({k1, k2, k3}) == 3


class TestQuota:
    def test_window_budget_and_realignment(self):
        clock = Clock()
        q = QuotaGuard(limit=2, window_s=100.0, clock=clock)
        q.should_allow_call()
        q.should_allow_call()
        with pytest.raises(QuotaExceeded) as ei:
            q.should_allow_call()
        assert ei.value.remaining == 0
        assert ei.value.reset_in_s == pytest.approx(100.0)
        # jump 2.5 windows: boundary realigns to whole windows (t=200)
        clock.t = 250.0
        q.should_allow_call()
        assert q.last_reset == pytest.approx(200.0)

    def test_even_spread_slices(self):
        clock = Clock()
        q = QuotaGuard(limit=24, window_s=86_400.0, even_spread_hourly=True,
                       clock=clock)
        q.should_allow_call()  # slice budget = 1/h
        with pytest.raises(QuotaExceeded) as ei:
            q.should_allow_call()
        # slice exhausted but window has room -> temporary block w/ remaining
        assert ei.value.remaining == 23
        assert 0 < ei.value.reset_in_s <= 3600.0
        clock.t = 3600.0  # next slice
        q.should_allow_call()


class TestBlacklist:
    def test_rate_limit_gates_then_expires(self):
        clock = Clock()
        b = Blacklist(default_window_s=60.0, clock=clock)
        assert b.remaining_s() is None
        b.handle_error(RateLimited("429"))
        with pytest.raises(TemporarilyBlacklisted):
            b.check("prov")
        clock.t = 60.1
        b.check("prov")  # expired -> no raise


class TestStackOrdering:
    def test_cache_hit_skips_quota(self):
        clock = Clock()
        stack = MiddlewareStack(
            cache=TTLCache(ttls={"quote": 100.0}, clock=clock),
            quota=QuotaGuard(limit=1, window_s=100.0, clock=clock),
        )
        assert stack.call(("quote", "A"), lambda: "v") == "v"
        # quota is now exhausted, but the cache hit must not consume it
        assert stack.call(("quote", "A"), lambda: "w") == "v"
        with pytest.raises(QuotaExceeded):
            stack.call(("quote", "B"), lambda: "x")

    def test_blacklist_before_quota(self):
        clock = Clock()
        q = QuotaGuard(limit=10, window_s=100.0, clock=clock)
        b = Blacklist(default_window_s=60.0, clock=clock)
        stack = MiddlewareStack(blacklist=b, quota=q, connector="p")

        def ratelimited():
            raise RateLimited("429")

        with pytest.raises(RateLimited):
            stack.call(("quote", "A"), ratelimited)
        with pytest.raises(TemporarilyBlacklisted):
            stack.call(("quote", "A"), lambda: "v")
        # the blacklisted call must NOT have consumed quota
        assert q.calls_in_window == 1


class TestConnectorBuilder:
    """Ports of middleware_validation.rs + builder ordering semantics for
    the pluggable-layer builder."""

    def test_validation_fails_when_dependency_missing(self):
        from borsa_spark.middleware import (
            ConnectorBuilder,
            InvalidMiddlewareStack,
            QuotaGuard,
            QuotaLayer,
        )

        class CustomLayer:
            name = "custom"

            def validate(self, ctx):
                if not ctx.has_middleware(QuotaLayer):
                    raise InvalidMiddlewareStack(
                        "CustomLayer requires QuotaLayer to be present"
                    )

            def wrap(self, call):
                return call

        with pytest.raises(InvalidMiddlewareStack, match="requires QuotaLayer"):
            ConnectorBuilder("c").layer(CustomLayer()).build()

        # satisfied once the dependency is layered in (any order)
        call = (
            ConnectorBuilder("c")
            .layer(CustomLayer())
            .layer(QuotaLayer(QuotaGuard(limit=10)))
            .build()
        )
        assert call(("k",), lambda: 41) == 41

    def test_canonical_order_applies_regardless_of_layer_order(self):
        """Quota layered BEFORE cache must still sit inside it: a repeat
        (cached) call may not consume quota (builder.rs:31-38)."""
        from borsa_spark.middleware import (
            CacheLayer,
            ConnectorBuilder,
            QuotaGuard,
            QuotaLayer,
            TTLCache,
        )

        quota = QuotaGuard(limit=10)
        builder = (
            ConnectorBuilder("c")
            .layer(QuotaLayer(quota))   # inserted first...
            .layer(CacheLayer(TTLCache()))
        )
        assert builder.names() == ["cache", "quota"]  # ...but cache is outer
        call = builder.build()
        key = ("history", "AAPL")
        assert call(key, lambda: "v") == "v"
        assert call(key, lambda: "v") == "v"
        assert quota.calls_in_window == 1  # second call was a cache hit

    def test_custom_layer_wraps_and_observes(self):
        from borsa_spark.middleware import ConnectorBuilder

        seen = []

        class Audit:
            name = "audit"

            def wrap(self, call):
                def wrapped(key, fn):
                    seen.append(key)
                    return call(key, fn)

                return wrapped

        call = ConnectorBuilder("c").layer(Audit()).build()
        assert call(("q", "A"), lambda: 7) == 7
        assert seen == [("q", "A")]


class TestQuotaSerde:
    """quota_serde.rs ports: config and state survive a JSON round-trip."""

    def test_quota_config_roundtrip(self):
        from borsa_spark.middleware import QuotaConfig

        cfg = QuotaConfig(limit=500, window_s=120.0, strategy="weighted")
        de = QuotaConfig.from_json(cfg.to_json())
        assert de.limit == 500
        assert de.window_s == 120.0
        assert de.strategy == "weighted"
        with pytest.raises(ValueError, match="unknown quota strategy"):
            QuotaConfig.from_json('{"limit": 1, "window_s": 1, '
                                  '"strategy": "nope"}')

    def test_quota_state_roundtrip_and_snapshot(self):
        from borsa_spark.middleware import QuotaConfig, QuotaState

        st = QuotaState(limit=1000, remaining=321, reset_in_s=8.5)
        de = QuotaState.from_json(st.to_json())
        assert (de.limit, de.remaining, de.reset_in_s) == (1000, 321, 8.5)

        clock = Clock()
        guard = QuotaConfig(limit=3, window_s=60.0).guard(clock=clock)
        guard.should_allow_call()
        guard.should_allow_call()
        clock.t = 10.0
        snap = QuotaState.of(guard)
        assert (snap.limit, snap.remaining, snap.reset_in_s) == (3, 1, 50.0)


class TestWeightedQuota:
    def test_cost_deducts_multiple_units(self):
        from borsa_spark.middleware import QuotaConfig, QuotaExceeded

        g = QuotaConfig(limit=10, window_s=60, strategy="weighted").guard(
            clock=lambda: 0.0
        )
        g.should_allow_call(cost=7)
        g.should_allow_call(cost=3)  # exactly exhausts the window
        import pytest as _pytest

        with _pytest.raises(QuotaExceeded):
            g.should_allow_call(cost=1)
        with _pytest.raises(ValueError):
            g.should_allow_call(cost=0)

    def test_unit_cost_behavior_unchanged(self):
        from borsa_spark.middleware import QuotaConfig, QuotaExceeded

        g = QuotaConfig(limit=2, window_s=60).guard(clock=lambda: 0.0)
        g.should_allow_call()
        g.should_allow_call()
        import pytest as _pytest

        with _pytest.raises(QuotaExceeded):
            g.should_allow_call()

    def test_from_json_defaults_window(self):
        from borsa_spark.middleware import QuotaConfig

        cfg = QuotaConfig.from_json('{"limit": 5, "strategy": "weighted"}')
        assert cfg.window_s == QuotaConfig.window_s
        assert cfg.strategy == "weighted"

    def test_slice_exceeding_cost_fails_loudly_not_starves(self):
        from borsa_spark.middleware import QuotaConfig

        g = QuotaConfig(
            limit=24, window_s=86400, strategy="even_spread_hourly"
        ).guard(clock=lambda: 0.0)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="per-slice allowance"):
            g.should_allow_call(cost=2)  # allowed_per_slice = 1

    def test_window_exceeding_cost_fails_loudly_not_starves(self):
        # symmetric with the slice guard: cost > window limit can never
        # succeed, so QuotaExceeded's reset_in_s would be a false promise
        from borsa_spark.middleware import QuotaConfig

        g = QuotaConfig(limit=5, window_s=60, strategy="weighted").guard(
            clock=lambda: 0.0
        )
        import pytest as _pytest

        with _pytest.raises(ValueError, match="window limit"):
            g.should_allow_call(cost=6)
        g.should_allow_call(cost=5)  # the full budget itself still admits
