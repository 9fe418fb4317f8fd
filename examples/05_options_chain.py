"""05 — Options chain: list expirations, fetch the chain for the nearest
expiry, show sample calls (reference: borsa/examples/05_options_chain.rs).

The reference asks the connector for expirations, then the chain for one
expiry. Spark-first: expirations are `SELECT DISTINCT expiry` over the
winning provider's chain table, and the single-expiry chain is the same
scan with the expiry filter pushed down — both one declarative plan, both
batched over every requested symbol at once.

Run: python examples/05_options_chain.py
"""

from __future__ import annotations

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from borsa_spark import schemas  # noqa: E402
from borsa_spark.router import tables as rt  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402
from borsa_spark.sources import load_table  # noqa: E402
from borsa_spark.sources.provider import Catalog, fixture_source  # noqa: E402

SF = "/root/testdata/sf0.001"


def build_catalog(spark) -> Catalog:
    """Option legs derived deterministically from the events table: per
    symbol, three strikes around the mean value, two expiries."""
    ev = load_table(spark, SF, "events")
    base = ev.groupBy(F.col("event_type").alias("symbol")).agg(
        F.round(F.avg("value"), 2).alias("px")
    )
    expiries = F.array(
        F.lit(dt.date(2026, 9, 18)), F.lit(dt.date(2026, 12, 18))
    )
    legs = (
        base.select(
            F.lit("prov0").alias("provider"),
            "symbol",
            F.explode(expiries).alias("expiry"),
            F.col("px"),
        )
        .select(
            "provider", "symbol", "expiry", "px",
            F.explode(
                F.array(
                    F.struct(F.lit("call").alias("kind"),
                             (F.col("px") * 1.1).alias("strike")),
                    F.struct(F.lit("call").alias("kind"),
                             (F.col("px") * 1.2).alias("strike")),
                    F.struct(F.lit("put").alias("kind"),
                             (F.col("px") * 0.9).alias("strike")),
                )
            ).alias("leg"),
        )
        .select(
            "provider", "symbol", "expiry",
            F.concat(F.col("symbol"), F.lit("-"),
                     F.date_format("expiry", "yyMMdd"), F.lit("-"),
                     F.col("leg.kind"),
                     F.round(F.col("leg.strike"), 0).cast("int"))
             .alias("contract"),
            F.col("leg.kind").alias("kind"),
            F.col("leg.strike").cast(schemas.MONEY).alias("strike"),
            F.col("px").cast(schemas.MONEY).alias("last_price"),
        )
    )
    cat = Catalog()
    cat.register(fixture_source("prov0", option_chain=legs))
    return cat


def main() -> None:
    spark = get_spark("ex05_options_chain")
    cat = build_catalog(spark)
    symbol = "click"

    print(f"Fetching option expirations for {symbol}...")
    exps = rt.option_expirations(cat, [symbol]).collect()
    print(f"Found {len(exps)} expiration dates.")
    nearest = exps[0].expiry
    print(f"Fetching chain for nearest date: {nearest}...")

    chain = rt.option_chain(cat, [symbol], expiry=nearest)
    calls = chain.filter(F.col("kind") == "call")
    puts = chain.filter(F.col("kind") == "put")
    print(f"\n## Option Chain for {symbol} (Expires {nearest})")
    print(f"- Found {calls.count()} call options.")
    print(f"- Found {puts.count()} put options.")

    print("\n--- Sample Call Options ---")
    calls.select("contract", "strike", "last_price").orderBy("strike").show(5)
    spark.stop()


if __name__ == "__main__":
    main()
