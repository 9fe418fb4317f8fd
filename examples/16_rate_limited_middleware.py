"""16 — Rate-limited provider behind the middleware stack (reference:
borsa/examples/16_yf_rate_limited.rs, which demos a client-side limiter in
front of a live API).

There is no live API here, so the demo drives the same middleware the
router mounts — TTL cache, quota guard, blacklist — against a fake
connector that starts returning RateLimited after N calls:
- cache hits never touch the connector (and never consume quota);
- the quota guard fails fast BEFORE the connector when the budget is gone;
- a RateLimited error blacklists the connector for its retry-after window,
  so follow-up calls short-circuit client-side instead of hammering the
  provider.

Run: python examples/16_rate_limited_middleware.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from borsa_spark.errors import (  # noqa: E402
    QuotaExceeded,
    RateLimited,
    TemporarilyBlacklisted,
)
from borsa_spark.middleware import (  # noqa: E402
    Blacklist,
    MiddlewareStack,
    QuotaGuard,
    TTLCache,
    history_key,
)

CONNECTOR_BUDGET = 3  # the fake API rate-limits after this many calls


def main() -> None:
    calls = {"n": 0}

    def fetch():
        calls["n"] += 1
        if calls["n"] > CONNECTOR_BUDGET:
            raise RateLimited("upstream says slow down (retry in 60s)")
        return f"history-batch-{calls['n']}"

    stack = MiddlewareStack(
        cache=TTLCache(),          # per-capability TTLs (history: 1h)
        quota=QuotaGuard(limit=10, window_s=86_400),
        blacklist=Blacklist(default_window_s=60.0),
        connector="rate-limited-upstream",
    )

    print("== repeated identical request: one upstream call, then cache ==")
    key = history_key("AAPL", "EQUITY", "1d", None, None)
    for i in range(3):
        v = stack.call(key, fetch)
        print(f"   call {i}: {v} (upstream calls: {calls['n']})")

    print("== distinct requests burn the upstream budget ==")
    for symbol in ("MSFT", "GOOG", "TSLA"):
        k = history_key(symbol, "EQUITY", "1d", None, None)
        try:
            v = stack.call(k, fetch)
            print(f"   {symbol}: {v} (upstream calls: {calls['n']})")
        except RateLimited as e:
            print(f"   {symbol}: upstream rate-limited -> {e}")

    print("== follow-ups short-circuit on the client-side blacklist ==")
    try:
        stack.call(history_key("NVDA", "EQUITY", "1d", None, None), fetch)
    except TemporarilyBlacklisted as e:
        print(f"   NVDA: {type(e).__name__}: {e} "
              f"(upstream calls still {calls['n']})")

    print("== cached entries keep serving while blacklisted ==")
    print(f"   AAPL: {stack.call(key, fetch)} "
          f"(upstream calls still {calls['n']})")

    print("== a tight quota fails fast before the connector ==")
    tight = MiddlewareStack(
        cache=TTLCache(), quota=QuotaGuard(limit=1, window_s=86_400),
        connector="tight",
    )
    tight.call(history_key("A", "EQUITY", "1d", None, None), lambda: "ok")
    try:
        tight.call(history_key("B", "EQUITY", "1d", None, None), lambda: "ok")
    except QuotaExceeded as e:
        print(f"   second distinct fetch: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
