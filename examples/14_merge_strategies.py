"""14 — Merge strategies: Deep vs Fallback history merge over two
providers with complementary coverage (reference:
borsa/examples/14_merge_strategies.rs).

The reference builds two mock connectors — a premium one with rich but
gappy coverage and a basic one with complete-but-coarser data — and runs
the same HistoryRequest under MergeStrategy::Deep (union every
provider's rows, first-wins per timestamp) and MergeStrategy::Fallback
(first provider with *any* usable data wins outright). Both are one
declarative program here; Deep is a union + per-timestamp priority
window, Fallback prunes the union to the first non-empty provider.

Run: python examples/14_merge_strategies.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from borsa_spark.router import HistoryRequest, history  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402
from borsa_spark.sources import load_table  # noqa: E402
from borsa_spark.sources.provider import Catalog, fixture_source  # noqa: E402

SF = "/root/testdata/sf0.001"


def candles(ev, provider: str, keep: F.Column):
    px = F.col("value").cast("decimal(38,9)")
    return ev.filter(keep).select(
        F.lit(provider).alias("provider"),
        F.col("event_type").alias("symbol"),
        F.lit("EQUITY").alias("kind"), F.col("ts"),
        px.alias("open"), px.alias("high"), px.alias("low"), px.alias("close"),
        F.lit(None).cast("decimal(38,9)").alias("close_unadj"),
        F.lit(1).cast("long").alias("volume"),
        F.lit("USD").alias("currency"), F.lit(True).alias("adjusted"),
        F.lit(None).cast("string").alias("timezone"),
        F.lit(None).cast("long").alias("utc_offset_seconds"),
        F.col("event_id").alias("seq"), F.lit("1m").alias("interval"),
    )


def main() -> None:
    spark = get_spark("ex14_merge_strategies")
    ev = load_table(spark, SF, "events")

    # premium: gappy (misses every third calendar day outright — the gap
    # must be coarser than the resample bucket to survive aggregation);
    # basic: complete coverage.
    cat = Catalog()
    cat.register(fixture_source(
        "premium", history_intervals=("1m",),
        history=candles(ev, "premium", F.dayofmonth("ts") % 3 != 0)))
    cat.register(fixture_source(
        "basic", history_intervals=("1m",),
        history=candles(ev, "basic", F.lit(True))))

    req = HistoryRequest(symbol="purchase", interval="1d")

    print("# Deep strategy (default): union both providers, premium wins "
          "per-bucket, basic fills premium's gaps")
    deep = history(spark, cat, req, strategy="deep")
    deep_rows = deep.candles.count()
    per_prov = deep.candles.groupBy("provider").count().collect()
    print(f"  rows: {deep_rows}; by provider: "
          f"{ {r['provider']: r['count'] for r in per_prov} }")

    print("# Fallback strategy: first provider with usable data wins "
          "outright — no cross-provider stitching")
    fb = history(spark, cat, req, strategy="fallback")
    fb_rows = fb.candles.count()
    per_prov = fb.candles.groupBy("provider").count().collect()
    print(f"  rows: {fb_rows}; by provider: "
          f"{ {r['provider']: r['count'] for r in per_prov} }")

    print("\nGuidance (as the reference concludes):")
    print("  - Use Deep for maximum data completeness")
    print("  - Use Fallback for API rate limit efficiency")
    spark.stop()


if __name__ == "__main__":
    main()
