"""06 — Fundamentals deep dive: income statement, balance sheet, cash
flow (annual + quarterly) and earnings history for one symbol
(reference: borsa/examples/06_fundamentals_deep_dive.rs).

The reference awaits seven connector calls and prints each section.
Spark-first: all statement tables are capability scans over the same
provider fixture; annual vs quarterly is a pushed-down equality filter
(`{"quarterly": bool}`), and the whole deep-dive for N symbols is the
same set of plans run once.

Run: python examples/06_fundamentals_deep_dive.py
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
    spark = get_spark("ex06_fundamentals")
    cat = get_catalog(spark)
    symbol = "signup"

    sections = [
        ("Income Statement (annual)", rt.income_statement, False,
         ["period", "revenue", "net_income"]),
        ("Income Statement (quarterly)", rt.income_statement, True,
         ["period", "revenue", "net_income"]),
        ("Balance Sheet (annual)", rt.balance_sheet, False,
         ["period", "total_assets", "total_debt"]),
        ("Cash Flow (quarterly)", rt.cashflow, True,
         ["period", "operating_cashflow", "free_cashflow"]),
    ]
    print(f"# Fundamentals deep dive: {symbol}\n")
    for title, fn, quarterly, cols in sections:
        print(f"## {title}")
        fn(cat, [symbol], quarterly=quarterly).select(
            "symbol", *cols
        ).orderBy(F.col("period").desc()).show(4, truncate=False)

    print("## Earnings history (EPS actual vs estimate)")
    rt.earnings(cat, [symbol]).select(
        "symbol", "period", "eps_actual", "eps_estimate",
        F.round(F.col("eps_actual") - F.col("eps_estimate"), 4)
         .alias("surprise"),
    ).orderBy(F.col("period").desc()).show(4, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
