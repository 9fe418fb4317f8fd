"""03 — Search: free-text instrument search with a kind filter and limit
(reference: borsa/examples/03_search.rs).

The reference builds a SearchRequest("tesla").kind(Equity).limit(5) and
prints a formatted table. Spark-first: `search()` is one union of
provider search scans with case-insensitive substring match pushed into
each scan, exchange-preference dedup as a window rank, and LIMIT folded
into the plan.

Run: python examples/03_search.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import get_catalog  # noqa: E402

from borsa_spark.router import search  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("ex03_search")
    cat = get_catalog(spark)

    query = "o"  # matches logout/login/logout... like the ref's "tesla"
    print(f"Searching for {query!r} (kind=EQUITY, limit=5)...")
    results = search(spark, cat, query, kind="EQUITY", limit=5)

    print("\n## Search Results:")
    results.select("symbol", "name", "exchange").show(5, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
