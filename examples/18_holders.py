"""18 — Holders: major-holders breakdown, top institutional and mutual
fund holders, insider activity (reference: borsa/examples/18_holders.rs).

Six capability scans of the holders family (S7's macro-generated router
methods); top-N holders is an in-plan window, not driver-side sorting.

Run: python examples/18_holders.py
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
    spark = get_spark("ex18_holders")
    cat = get_catalog(spark)
    symbol = "view"

    print(f"# Holders: {symbol}\n")
    print("## Major holders breakdown")
    rt.major_holders(cat, [symbol]).select(
        "symbol", "insiders_pct", "institutions_pct"
    ).show(1, truncate=False)

    print("## Top institutional holders")
    rt.institutional_holders(cat, [symbol]).orderBy(
        F.col("shares").desc()
    ).select("symbol", "holder", "shares", "report_date").show(5,
                                                               truncate=False)

    print("## Top mutual fund holders")
    rt.mutual_fund_holders(cat, [symbol]).orderBy(
        F.col("shares").desc()
    ).select("symbol", "holder", "shares").show(5, truncate=False)

    print("## Insider transactions (most recent)")
    rt.insider_transactions(cat, [symbol]).orderBy(F.col("ts").desc()).select(
        "symbol", "insider", "transaction", "shares", "ts"
    ).show(5, truncate=False)

    print("## Insider roster")
    rt.insider_roster(cat, [symbol]).orderBy(
        F.col("shares_owned").desc()
    ).show(5, truncate=False)

    print("## Net share purchase activity")
    rt.net_share_purchase(cat, [symbol]).show(1, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
