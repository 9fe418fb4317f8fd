"""Routing & middleware tour — the Spark-native analogs of reference
examples 12 (per-symbol priority), 13 (fetch strategies), 14 (merge
strategies) and 24 (quota middleware) (/root/reference/borsa/examples/).

Run: python examples/routing_tour.py
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from borsa_spark.middleware import (  # noqa: E402
    MiddlewareStack,
    QuotaGuard,
    TTLCache,
    history_key,
)
from borsa_spark.errors import QuotaExceeded  # noqa: E402
from borsa_spark.plans import RoutingPolicy  # noqa: E402
from borsa_spark.router import HistoryRequest, history, quote  # noqa: E402
from borsa_spark.router.deadline import race_providers  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402
from borsa_spark.sources import load_table  # noqa: E402
from borsa_spark.sources.provider import Catalog, fixture_source  # noqa: E402

SF = "/root/testdata/sf0.001"


def quote_catalog(spark):
    """Two quote providers over the events table: 'fast' (stale prices) and
    'accurate' (the real latest values) — example 12's connector pair."""
    ev = load_table(spark, SF, "events")
    cat = Catalog()
    for name, tweak in (("fast", F.col("value") + 1), ("accurate", F.col("value"))):
        q = ev.select(
            F.lit(name).alias("provider"),
            F.col("event_type").alias("symbol"),
            F.lit("EQUITY").alias("kind"),
            F.lit(None).cast("string").alias("exchange"),
            F.col("ts"),
            tweak.cast("decimal(38,9)").alias("price"),
            F.lit(None).cast("decimal(38,9)").alias("previous_close"),
            F.lit("USD").alias("currency"),
            F.col("event_id").alias("seq"),
        )
        cat.register(fixture_source(name, quote=q))
    return cat


def ex12_per_symbol_priority(spark) -> None:
    """12: RoutingPolicy flips which provider wins per symbol."""
    cat = quote_catalog(spark)
    cat.policy = (
        RoutingPolicy()
        .providers_for_symbol("click", ["accurate", "fast"])
        .providers_for_symbol("view", ["fast", "accurate"])
    )
    print("== 12: per-symbol priority ==")
    for sym in ("click", "view"):
        row = quote(spark, cat, sym).limit(1).collect()[0]
        print(f"   {sym}: served by {row.provider} at {row.price}")


def ex13_fetch_strategies(spark) -> None:
    """13: PriorityWithFallback (declarative, default) vs the Latency race
    (first completion wins, driver-side because it is about wall-clock)."""
    cat = quote_catalog(spark)
    print("== 13: fetch strategies ==")
    row = quote(spark, cat, "click").limit(1).collect()[0]
    print(f"   priority-with-fallback: {row.provider} (registration order)")

    def slow_accurate():
        time.sleep(0.5)
        return "accurate@100.0"

    def fast_inaccurate():
        time.sleep(0.05)
        return "fast@101.0"

    winner, value = race_providers(
        [("accurate", slow_accurate), ("fast", fast_inaccurate)],
        capability="quote",
        provider_timeout=2.0,
    )
    print(f"   latency race: {winner} won with {value}")


def ex14_merge_strategies(spark) -> None:
    """14: fast-limited (3 days) vs slow-comprehensive (5 days) history
    providers; 'fallback' takes the best single provider, 'deep' unions and
    first-wins-merges so the limited provider's window still wins where it
    has data."""
    base = dt.datetime(2024, 1, 1)

    def mk(name, days, base_price):
        rows = [
            (
                name, "AAPL", "EQUITY", base + dt.timedelta(days=d),
                float(base_price + d), float(base_price + d + 2),
                float(base_price + d - 2), float(base_price + d + 1),
                None, 1_000_000 + d, "USD", True, None, None, d, "1d",
            )
            for d in range(days)
        ]
        return spark.createDataFrame(
            rows,
            "provider string, symbol string, kind string, ts timestamp, "
            "open double, high double, low double, close double, "
            "close_unadj double, volume long, currency string, "
            "adjusted boolean, timezone string, utc_offset_seconds long, "
            "seq long, interval string",
        ).select(
            "provider", "symbol", "kind", "ts",
            F.col("open").cast("decimal(38,9)"),
            F.col("high").cast("decimal(38,9)"),
            F.col("low").cast("decimal(38,9)"),
            F.col("close").cast("decimal(38,9)"),
            F.col("close_unadj").cast("decimal(38,9)"),
            "volume", "currency", "adjusted", "timezone",
            "utc_offset_seconds", "seq", "interval",
        )

    cat = Catalog()
    cat.register(fixture_source("fast-limited", history_intervals=("1d",),
                                history=mk("fast-limited", 3, 100)))
    cat.register(fixture_source("slow-comprehensive", history_intervals=("1d",),
                                history=mk("slow-comprehensive", 5, 500)))

    req = HistoryRequest(symbol="AAPL", interval="1d",
                         start=base, end=base + dt.timedelta(days=6))
    print("== 14: merge strategies ==")
    fb = history(spark, cat, req, strategy="fallback").candles
    print(f"   fallback: {fb.count()} candles, providers="
          f"{sorted(r.provider for r in fb.select('provider').distinct().collect())}")
    deep = history(spark, cat, req, strategy="deep")
    counts = {
        r.provider: r.n
        for r in deep.candles.groupBy("provider").agg(F.count("*").alias("n")).collect()
    }
    print(f"   deep merge: {deep.candles.count()} candles, per-provider {counts}")
    print("   attribution spans:")
    deep.attribution.orderBy("span_start").show(5, truncate=False)


def ex24_quota_middleware(spark) -> None:
    """24: wrap a provider call path in quota (+cache) middleware — a cache
    hit must not consume quota; exhausting the quota fails fast."""
    print("== 24: quota middleware ==")
    calls = {"n": 0}

    def fetch():
        calls["n"] += 1
        return f"history-batch-{calls['n']}"

    stack = MiddlewareStack(
        cache=TTLCache(),  # default per-capability TTLs (history: 1h)
        quota=QuotaGuard(limit=2, window_s=86_400),
        connector="yf",
    )
    key = history_key("AAPL", "EQUITY", "1d", None, None)
    for i in range(3):
        v = stack.call(key, fetch)  # 1 fetch, then cache hits
        print(f"   call {i}: {v} (provider calls so far: {calls['n']})")
    stack.call(history_key("MSFT", "EQUITY", "1d", None, None), fetch)
    try:
        stack.call(history_key("GOOG", "EQUITY", "1d", None, None), fetch)
    except QuotaExceeded as e:
        print(f"   third distinct fetch rejected: {type(e).__name__}: {e}")


def main() -> None:
    spark = get_spark("routing-tour")
    ex12_per_symbol_priority(spark)
    ex13_fetch_strategies(spark)
    ex14_merge_strategies(spark)
    ex24_quota_middleware(spark)
    print("routing tour OK")


if __name__ == "__main__":
    main()
