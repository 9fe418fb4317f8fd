"""20 — ESG: sustainability scores for a watchlist (reference:
borsa/examples/20_esg.rs).

One esg capability scan serves the whole watchlist; the reference's
per-symbol await loop becomes a single job.

Run: python examples/20_esg.py
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
    spark = get_spark("ex20_esg")
    cat = get_catalog(spark)

    print(f"# ESG scores for {SYMBOLS}\n")
    rt.esg(cat, SYMBOLS).orderBy(F.col("total_esg").desc()).select(
        "symbol", "total_esg", "environment", "social", "governance"
    ).show(10, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
