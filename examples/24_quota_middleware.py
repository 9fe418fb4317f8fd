"""24 — Quota middleware: wrap a connector with a quota-aware layer and
fetch through it (reference: borsa/examples/24_quota_middleware.rs).

The reference wraps its connector in QuotaAwareConnector{limit: 1000,
window: 24h, strategy: Unit} and fetches one quote. Here the same
QuotaGuard (fixed aligned window, optional even-spread-hourly slicing)
is mounted in the MiddlewareStack in front of a quote fetch; the demo
also shows the fail-fast QuotaExceeded path the Unit strategy implies.

Run: python examples/24_quota_middleware.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import get_catalog  # noqa: E402

from borsa_spark.errors import QuotaExceeded  # noqa: E402
from borsa_spark.middleware import MiddlewareStack, QuotaGuard  # noqa: E402
from borsa_spark.router import quote  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("ex24_quota_middleware")
    cat = get_catalog(spark)

    # QuotaConfig{limit: 1000, window: 24h, strategy: Unit} analog.
    stack = MiddlewareStack(
        quota=QuotaGuard(limit=1000, window_s=24 * 60 * 60),
        connector="mock",
    )

    def fetch():
        return quote(spark, cat, "click").first()

    row = stack.call(("quote", "click"), fetch)
    print(f"fetched: {row.symbol!r} @ ${float(row.price):.2f} "
          f"(quota used: {stack.quota.calls_in_window}/1000)")

    # What the Unit strategy buys you: the guard fails fast client-side
    # once the window budget is gone — no call reaches the provider.
    tiny = MiddlewareStack(quota=QuotaGuard(limit=2, window_s=3600),
                           connector="mock")
    for i in range(3):
        try:
            tiny.call(("quote", "click"), fetch)
            print(f"call {i}: allowed")
        except QuotaExceeded as e:
            print(f"call {i}: QuotaExceeded (remaining={e.remaining}, "
                  f"resets in ~{e.reset_in_s:.0f}s)")
    spark.stop()


if __name__ == "__main__":
    main()
