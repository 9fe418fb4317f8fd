"""19 — News: latest stories for a symbol, capped by count and filtered
by tab (reference: borsa/examples/19_news.rs).

`news()` pushes the tab filter into the scan and applies the per-symbol
count cap as a recency window inside the plan
(NewsRequest{count, tab}).

Run: python examples/19_news.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import get_catalog  # noqa: E402

from borsa_spark.router import tables as rt  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("ex19_news")
    cat = get_catalog(spark)
    symbol = "purchase"

    print(f"Fetching 5 latest news stories for {symbol}...")
    rt.news(cat, [symbol], count=5, tab="news").select(
        "symbol", "ts", "title", "publisher"
    ).show(5, truncate=False)

    print("Press releases only:")
    rt.news(cat, [symbol], count=3, tab="press_releases").select(
        "symbol", "ts", "title"
    ).show(3, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
