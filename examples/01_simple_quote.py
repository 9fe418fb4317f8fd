"""01 — Simple quote: build the router, register a connector, fetch one
quote (reference: borsa/examples/01_simple_quote.rs).

The reference builds `Borsa` with one connector and awaits
`borsa.quote(&instrument)`. Spark-first: register the provider's quote
table in a Catalog and call `quote()` — routing, exchange enforcement,
and fallback all compile into one declarative plan; the "await" is the
single Spark job that materializes the winning row.

Run: python examples/01_simple_quote.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import get_catalog  # noqa: E402

from borsa_spark.router import quote  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("ex01_simple_quote")
    # 1-2. Create the connector fixture and register it with the router.
    cat = get_catalog(spark)

    # 3. Define the instrument we want to query.
    symbol, kind = "purchase", "EQUITY"

    # 4. Fetch the quote; the router handles routing and fallback.
    print(f"Fetching quote for {symbol}...")
    q = quote(spark, cat, symbol, kind=kind)

    # 5. Print the result.
    q.select("symbol", "price", "previous_close", "currency",
             "exchange", "day_volume").show(1, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
