"""13 — Fetch strategies: PriorityWithFallback (default), an explicit
sequential chain with a tighter per-provider timeout, and the Latency
race (reference: borsa/examples/13_fetch_strategies.rs).

Over table-backed sources PriorityWithFallback collapses into one
declarative union + priority window; Latency is a real wall-clock race
(`race_providers`) where completion order, not priority, decides. The
third scenario makes that visible by giving the high-priority provider a
deliberately slow fetch.

Run: python examples/13_fetch_strategies.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import get_catalog, latest_quote_table  # noqa: E402

from borsa_spark.router import quote  # noqa: E402
from borsa_spark.router.deadline import race_providers  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402
from borsa_spark.sources import load_table  # noqa: E402

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("ex13_fetch_strategies")
    cat = get_catalog(spark)
    symbol = "view"

    # Default: PriorityWithFallback — one union, priority window.
    q = quote(spark, cat, symbol)  # strategy="priority" is the default
    print(f"priority strategy -> {q.first().provider}")

    # Explicit sequential fallback with a tighter per-provider timeout:
    # the same declarative plan, but each provider invocation is bounded.
    q = quote(spark, cat, symbol, strategy="priority", provider_timeout=0.8)
    print(f"priority + 800ms provider_timeout -> {q.first().provider}")

    # Latency-first: fire all providers concurrently, first success wins.
    ev = load_table(spark, SF, "events")

    def slow_fetch():
        time.sleep(1.0)  # simulated slow high-priority connector
        return latest_quote_table(ev, "slow-primary")

    def fast_fetch():
        return latest_quote_table(ev, "fast-secondary")

    winner, df = race_providers(
        [("slow-primary", slow_fetch), ("fast-secondary", fast_fetch)],
        "quote", provider_timeout=5.0,
    )
    print(f"latency strategy -> {winner} (completion order decides)")
    df.select("provider", "symbol", "price").show(2, truncate=False)
    print("Examples ran successfully.")
    spark.stop()


if __name__ == "__main__":
    main()
