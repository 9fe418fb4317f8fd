"""15 — Routing policy: exchange-scoped provider rules and strict mode
(reference: borsa/examples/15_routing_policy_exchange_and_strict.rs).

Demonstrates the policy layer steering the SAME catalog three ways:
1. default registration order;
2. an exchange-scoped rule flipping which provider serves XETRA lookups;
3. strict mode dropping every provider a rule does not name — a lookup
   that only a non-listed provider could serve now fails loudly instead of
   silently falling back.

Run: python examples/15_routing_policy_exchange_and_strict.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from borsa_spark import schemas  # noqa: E402
from borsa_spark.errors import UnsupportedError  # noqa: E402
from borsa_spark.plans.routing_policy import RoutingPolicy  # noqa: E402
from borsa_spark.router import quote  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402
from borsa_spark.sources import load_table  # noqa: E402
from borsa_spark.sources.provider import Catalog, fixture_source  # noqa: E402

SF = "/root/testdata/sf0.001"


def build_catalog(spark) -> Catalog:
    """Two providers quoting the same symbols: 'global_a' tags rows NASDAQ,
    'euro_b' tags the same symbols XETRA at a slightly different price."""
    ev = load_table(spark, SF, "events")
    cat = Catalog()
    for name, exch, tweak in (
        ("global_a", "NASDAQ", F.col("value")),
        ("euro_b", "XETRA", F.col("value") * 0.92),
    ):
        q = ev.groupBy(F.col("event_type").alias("symbol")).agg(
            F.round(F.avg(tweak), 2).alias("__px")
        ).select(
            F.lit(name).alias("provider"),
            "symbol",
            F.lit("EQUITY").alias("kind"),
            F.lit(exch).alias("exchange"),
            F.col("__px").cast(schemas.MONEY).alias("price"),
            F.lit("USD" if exch == "NASDAQ" else "EUR").alias("currency"),
        )
        cat.register(fixture_source(name, quote=q))
    return cat


def show_winner(spark, cat, label, **kw) -> None:
    try:
        row = quote(spark, cat, "click", **kw).limit(1).collect()
    except UnsupportedError as e:
        print(f"   {label}: REJECTED ({type(e).__name__}: {e})")
        return
    if not row:
        print(f"   {label}: no quote survived enforcement")
        return
    r = row[0]
    print(f"   {label}: {r.provider} @ {r.price} {r.currency} ({r.exchange})")


def main() -> None:
    spark = get_spark("ex15_routing_policy")
    cat = build_catalog(spark)

    print("== 1. registration order (no policy) ==")
    show_winner(spark, cat, "click")

    print("== 2. exchange-scoped rule: XETRA lookups prefer euro_b ==")
    cat.policy = RoutingPolicy().providers_for_exchange(
        "XETRA", ["euro_b", "global_a"]
    )
    show_winner(spark, cat, "click on XETRA", exchange="XETRA")
    show_winner(spark, cat, "click (no exchange ask)")

    print("== 3. strict: only euro_b may serve XETRA; NASDAQ asks that ==")
    print("      only global_a could serve are now rejected under a strict")
    print("      global rule naming euro_b alone ==")
    cat.policy = RoutingPolicy().providers_global(["euro_b"], strict=True)
    show_winner(spark, cat, "click on XETRA (strict)", exchange="XETRA")
    # euro_b has no NASDAQ rows; with global_a strict-excluded the exchange
    # enforcement leaves nothing — the failure is loud at the result, and
    # an unlisted-provider-only capability raises Unsupported.
    show_winner(spark, cat, "click on NASDAQ (strict)", exchange="NASDAQ")
    spark.stop()


if __name__ == "__main__":
    main()
