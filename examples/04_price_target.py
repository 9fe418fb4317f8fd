"""04 — Analyst price target: low/mean/high and analyst count for one
symbol (reference: borsa/examples/04_price_target.rs).

The reference awaits `analyst_price_target(&instrument)` and formats the
four fields. Spark-first: the price-target capability scan is a
first-non-empty-provider-wins table read; for a watchlist the identical
plan serves every symbol in one job.

Run: python examples/04_price_target.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import get_catalog  # noqa: E402

from borsa_spark.router import tables as rt  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("ex04_price_target")
    cat = get_catalog(spark)
    symbol = "view"

    print(f"Fetching analyst price target for {symbol}...")
    row = rt.price_target(cat, [symbol]).first()

    print(f"\n## Analyst Price Target for {symbol}")
    if row and row.low is not None and row.mean is not None:
        print(f"- Based on {row.number_of_analysts} analysts:")
        print(f"  - High:   ${float(row.high):.2f}")
        print(f"  - Mean:   ${float(row.mean):.2f}")
        print(f"  - Low:    ${float(row.low):.2f}")
    else:
        print("- No complete analyst price target data available.")
    spark.stop()


if __name__ == "__main__":
    main()
