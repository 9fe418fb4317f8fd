"""11 — Upcoming events: earnings dates and ex-dividend dates for a
watchlist (reference: borsa/examples/11_upcoming_events.rs).

The reference loops symbols and awaits `calendar()` per symbol.
Spark-first: the calendar scan takes the whole watchlist as one IN
predicate (or a distributed symbol frame) — one plan, one job, sorted by
soonest event.

Run: python examples/11_upcoming_events.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import SYMBOLS, get_catalog  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from borsa_spark.router import tables as rt  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("ex11_upcoming_events")
    cat = get_catalog(spark)

    print(f"# Upcoming events for watchlist {SYMBOLS}\n")
    cal = rt.calendar(cat, SYMBOLS)
    cal.select(
        "symbol", "earnings_date", "ex_dividend_date",
        F.datediff("earnings_date", "ex_dividend_date").alias("gap_days"),
    ).orderBy("earnings_date", "symbol").show(10, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
