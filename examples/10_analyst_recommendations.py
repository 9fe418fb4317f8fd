"""10 — Analyst recommendations: the recommendation matrix, its summary,
and recent upgrades/downgrades (reference:
borsa/examples/10_analyst_recommendations.rs).

Three capability scans over the winning provider; the
upgrades/downgrades recency sort and head-N are part of the single
declarative plan, not driver-side slicing.

Run: python examples/10_analyst_recommendations.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import get_catalog  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from borsa_spark.router import tables as rt  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("ex10_recommendations")
    cat = get_catalog(spark)
    symbol = "click"

    print(f"# Analyst recommendations: {symbol}\n")
    print("## Recommendation matrix")
    rt.recommendations(cat, [symbol]).select(
        "symbol", "period", "strong_buy", "buy", "hold", "sell", "strong_sell"
    ).show(4, truncate=False)

    print("## Summary")
    rt.recommendations_summary(cat, [symbol]).select(
        "symbol", "mean_rating", "n_analysts"
    ).show(1, truncate=False)

    print("## Recent upgrades / downgrades")
    rt.upgrades_downgrades(cat, [symbol]).orderBy(
        F.col("ts").desc()
    ).select("symbol", "ts", "firm", "action", "from_grade", "to_grade") \
     .show(5, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
