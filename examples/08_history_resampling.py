"""08 — History resampling: one symbol's minute-ish feed rolled up to
hourly, daily, and weekly bars (reference:
borsa/examples/08_history_resampling.rs).

Spark-first: each resample tier is ONE groupBy over (symbol, bucket) with
min_by/max_by open/close picks — map-side partial aggregation means the
shuffle moves one row per bucket, not per tick, and the cascade
(minute -> hourly -> daily) aggregates each tier from the much smaller
tier below it, never re-reading the raw feed.

Run: python examples/08_history_resampling.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from borsa_spark.operators import (  # noqa: E402
    resample_to_daily,
    resample_to_minutes,
    resample_to_weekly,
)
from borsa_spark.session import get_spark  # noqa: E402
from borsa_spark.sources import load_table  # noqa: E402

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("ex08_history_resampling")
    ev = load_table(spark, SF, "events").filter(
        F.col("event_type") == "click"
    )
    v = F.col("value")
    candles = ev.select(
        F.lit("prov").alias("provider"),
        F.col("event_type").alias("symbol"),
        F.lit("equity").alias("kind"),
        "ts",
        v.alias("open"), v.alias("high"), v.alias("low"), v.alias("close"),
        F.lit(None).cast("decimal(38,9)").alias("close_unadj"),
        F.col("user_id").cast("long").alias("volume"),
        F.lit("USD").alias("currency"),
        F.lit(True).alias("adjusted"),
        F.lit(None).cast("string").alias("timezone"),
        F.lit(None).cast("long").alias("utc_offset_seconds"),
        F.col("event_id").alias("seq"),
    )

    print(f"raw ticks: {candles.count()}")
    hourly = resample_to_minutes(candles, 60)
    print("== hourly bars (first 5) ==")
    hourly.orderBy("ts").select(
        "symbol", "ts", "open", "high", "low", "close", "volume"
    ).show(5)

    daily = resample_to_daily(hourly)  # cascade: aggregates the hourly tier
    print("== daily bars from the hourly tier ==")
    daily.orderBy("ts").select(
        "symbol", "ts", "open", "high", "low", "close", "volume"
    ).show(5)

    weekly = resample_to_weekly(daily)  # Monday-start weeks
    print("== weekly (Monday) bars from the daily tier ==")
    weekly.orderBy("ts").select(
        "symbol", "ts", "open", "high", "low", "close", "volume"
    ).show(5)
    spark.stop()


if __name__ == "__main__":
    main()
