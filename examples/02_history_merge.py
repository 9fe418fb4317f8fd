"""02 — History merge with attribution: two providers, a routing policy
putting the sparse-but-trusted one first, and the merged series showing
exactly which provider won each bar (reference:
borsa/examples/02_history_merge.rs).

Spark-first: the reference's per-provider fetch + BTreeMap merge loop is
one declarative program — per-provider scans union, and first-wins is a
min_by AGGREGATION keyed (symbol, ts) with map-side partial combine, so a
hot symbol collapses before the shuffle. Attribution falls out of the
same frame (lag -> change-flag -> run id), no second pass over the data.

Run: python examples/02_history_merge.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from borsa_spark.plans.routing_policy import RoutingPolicy  # noqa: E402
from borsa_spark.router import HistoryRequest, history  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402
from borsa_spark.sources import load_table  # noqa: E402
from borsa_spark.sources.provider import Catalog, fixture_source  # noqa: E402

SF = "/root/testdata/sf0.001"


def build_catalog(spark) -> Catalog:
    """'trusted' carries every third day only (sparse, preferred);
    'bulk' carries the full range. The merge must take trusted's bars
    where they exist and fill the gaps from bulk."""
    ev = load_table(spark, SF, "events")
    v = F.col("value").cast("decimal(38,9)")
    base = ev.select(
        F.col("event_type").alias("symbol"),
        F.lit("EQUITY").alias("kind"),
        "ts",
        v.alias("open"), v.alias("high"), v.alias("low"), v.alias("close"),
        F.lit(None).cast("decimal(38,9)").alias("close_unadj"),
        F.lit(1).cast("long").alias("volume"),
        F.lit("USD").alias("currency"),
        F.lit(True).alias("adjusted"),
        F.lit(None).cast("string").alias("timezone"),
        F.lit(None).cast("long").alias("utc_offset_seconds"),
        F.col("event_id").alias("seq"),
        F.lit("1m").alias("interval"),
    )
    cat = Catalog()
    trusted = base.filter(F.dayofmonth("ts") % 3 == 0).select(
        F.lit("trusted").alias("provider"), "*"
    )
    bulk = base.select(F.lit("bulk").alias("provider"), "*")
    # registration order would put bulk behind trusted anyway; make the
    # preference explicit the reference's way — a kind-scoped policy rule
    cat.register(fixture_source("bulk", history_intervals=("1m",), history=bulk))
    cat.register(
        fixture_source("trusted", history_intervals=("1m",), history=trusted)
    )
    cat.policy = RoutingPolicy().providers_for_kind(
        "EQUITY", ["trusted", "bulk"]
    )
    return cat


def main() -> None:
    spark = get_spark("ex02_history_merge")
    cat = build_catalog(spark)
    print("Fetching daily history for 'click' (priority: trusted, bulk)...")
    res = history(
        spark, cat, HistoryRequest(symbol="click", interval="1d")
    )

    print("== merged daily bars (winning provider rides along, first 10) ==")
    res.candles.orderBy("ts").select(
        "symbol", "ts", "close", "provider"
    ).show(10)

    print("== who contributed how many bars ==")
    res.attribution.groupBy("provider").agg(
        F.sum("n_candles").alias("n_bars")
    ).orderBy("provider").show()

    print("== contiguous attribution spans (provider handoffs, first 8) ==")
    res.attribution.orderBy("span_start").select(
        "provider", "span_start", "span_end", "n_candles"
    ).show(8)
    spark.stop()


if __name__ == "__main__":
    main()
