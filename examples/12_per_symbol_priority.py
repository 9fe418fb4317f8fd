"""12 — Per-symbol priority: a routing policy that prefers the fast
provider by default but overrides to the slow/accurate provider for one
special symbol (reference: borsa/examples/12_per_symbol_priority.rs).

The reference defines Fast/Slow connectors returning $100.00 / $999.99
and a RoutingPolicyBuilder with `providers_for_kind` + a
`providers_for_symbol` override. Here the two providers are fixture
quote tables with exactly those prices; the policy object is the same
rule algebra (best-rule specificity, later-wins ties), and the winning
provider per symbol is decided by the plan's priority window — per-row,
in one job, not per-request.

Run: python examples/12_per_symbol_priority.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from borsa_spark import schemas  # noqa: E402
from borsa_spark.plans.routing_policy import RoutingPolicy  # noqa: E402
from borsa_spark.router import quote  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402
from borsa_spark.sources import load_table  # noqa: E402
from borsa_spark.sources.provider import Catalog, fixture_source  # noqa: E402

SF = "/root/testdata/sf0.001"


def quote_table(spark, provider: str, price: float):
    ev = load_table(spark, SF, "events")
    return ev.select(F.col("event_type").alias("symbol")).distinct().select(
        F.lit(provider).alias("provider"), "symbol",
        F.lit("EQUITY").alias("kind"),
        F.lit(price).cast(schemas.MONEY).alias("price"),
        F.lit(None).cast(schemas.MONEY).alias("previous_close"),
        F.lit("USD").alias("currency"),
        F.lit(None).cast("string").alias("exchange"),
    )


def main() -> None:
    spark = get_spark("ex12_per_symbol_priority")

    # 1. Two providers: fast-but-inaccurate ($100.00), slow-but-accurate
    #    ($999.99) — same prices as the reference's mock connectors.
    cat = Catalog()
    cat.register(fixture_source("fast-but-inaccurate",
                                quote=quote_table(spark, "fast-but-inaccurate", 100.0)))
    cat.register(fixture_source("slow-but-accurate",
                                quote=quote_table(spark, "slow-but-accurate", 999.99)))

    # 2. Default priority for EQUITY + a per-symbol override for 'purchase'.
    special = "purchase"
    cat.policy = (
        RoutingPolicy()
        .providers_for_kind("EQUITY",
                            ["fast-but-inaccurate", "slow-but-accurate"])
        .providers_for_symbol(special,
                              ["slow-but-accurate", "fast-but-inaccurate"])
    )
    cat.validate_policy()

    # SCENARIO 1: a normal symbol follows the default (fast wins).
    normal = "click"
    row = quote(spark, cat, normal, kind="EQUITY").first()
    print(f"Result for {normal!r}: ${float(row.price):.2f} "
          f"(from {row.provider}, as per default priority)")

    # SCENARIO 2: the special symbol follows the override (slow wins).
    row = quote(spark, cat, special, kind="EQUITY").first()
    print(f"Result for {special!r}: ${float(row.price):.2f} "
          f"(from {row.provider}, due to the per-symbol override)")
    spark.stop()


if __name__ == "__main__":
    main()
