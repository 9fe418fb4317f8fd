"""07 — Financial snapshot: one symbol's quote, profile, latest income
statement, and upcoming calendar in a single composed view (reference:
borsa/examples/07_financial_snapshot.rs).

The reference makes four awaited connector calls and prints sections.
Spark-first: each section is a capability scan and the snapshot is one
join-composed DataFrame — for a WATCHLIST of symbols the same plan runs
once, not once per symbol.

Run: python examples/07_financial_snapshot.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from borsa_spark import schemas  # noqa: E402
from borsa_spark.router import quote  # noqa: E402
from borsa_spark.router import tables as rt  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402
from borsa_spark.sources import load_table  # noqa: E402
from borsa_spark.sources.provider import Catalog, fixture_source  # noqa: E402

SF = "/root/testdata/sf0.001"


def build_catalog(spark) -> Catalog:
    ev = load_table(spark, SF, "events")
    sym = F.col("event_type").alias("symbol")

    w = Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    quotes_tbl = (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.lit("prov0").alias("provider"), sym,
            F.lit("EQUITY").alias("kind"),
            F.col("value").cast(schemas.MONEY).alias("price"),
            (F.col("value") * 0.99).cast(schemas.MONEY)
             .alias("previous_close"),
            F.lit("USD").alias("currency"),
            F.lit("NASDAQ").alias("exchange"),
        )
    )
    stmt = ev.groupBy(
        sym, F.date_trunc("quarter", F.col("ts")).alias("period")
    ).agg(
        F.round(F.sum("value"), 2).alias("revenue"),
        F.round(F.avg("value"), 4).alias("margin"),
    ).withColumn("provider", F.lit("prov0")) \
     .withColumn("quarterly", F.lit(True))
    cal = ev.groupBy(sym).agg(
        F.date_add(F.max(F.col("ts")).cast("date"), 30).alias("earnings_date")
    ).withColumn("provider", F.lit("prov0"))
    profile = ev.groupBy(sym).agg(
        F.count("*").cast("long").alias("n_events"),
    ).withColumn("provider", F.lit("prov0")).withColumn(
        "name", F.concat(F.upper(F.col("symbol")), F.lit(" Corp."))
    )

    cat = Catalog()
    cat.register(
        fixture_source(
            "prov0",
            quote=quotes_tbl,
            income_statement=stmt,
            calendar=cal,
            profile=profile,
        )
    )
    return cat


def main() -> None:
    spark = get_spark("ex07_financial_snapshot")
    cat = build_catalog(spark)
    symbol = "purchase"

    print(f"# Financial snapshot: {symbol}\n")
    print("## Quote")
    quote(spark, cat, symbol).select(
        "symbol", "price", "previous_close", "currency"
    ).show(1)

    print("## Profile")
    rt.profile(cat, [symbol]).select("symbol", "name", "n_events").show(1)

    print("## Latest quarterly income statement")
    w = Window.partitionBy("symbol").orderBy(F.col("period").desc())
    stmt = rt.income_statement(cat, [symbol], quarterly=True)
    stmt.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).select("symbol", "period", "revenue", "margin").show(1)

    print("## Calendar")
    rt.calendar(cat, [symbol]).select("symbol", "earnings_date").show(1)

    # the composed one-plan snapshot a watchlist would use
    print("## One-plan snapshot (entire catalog, single job)")
    rt.profile(cat).join(
        rt.calendar(cat).select("symbol", "earnings_date"), "symbol"
    ).show(5)
    spark.stop()


if __name__ == "__main__":
    main()
