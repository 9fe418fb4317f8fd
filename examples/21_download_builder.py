"""21 — Bulk download: many symbols' history in one call, with a failure
report instead of an exception (reference:
borsa/examples/21_download_builder.rs).

The reference fans out one async task per symbol. Spark-first: symbols are
grouped by PLAN SIGNATURE (which providers serve them at which effective
interval) and each group runs as a single `symbol IN (...)` history
pipeline — a thousand symbols under a uniform policy is ONE Spark program,
and unresolvable symbols come back as a report DataFrame (anti-join), not
a thrown error.

Run: python examples/21_download_builder.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from borsa_spark.router import download  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402
from borsa_spark.sources import load_table  # noqa: E402
from borsa_spark.sources.provider import Catalog, fixture_source  # noqa: E402

SF = "/root/testdata/sf0.001"


def build_catalog(spark) -> Catalog:
    ev = load_table(spark, SF, "events")
    v = F.col("value").cast("decimal(38,9)")
    candles = ev.select(
        F.lit("prov0").alias("provider"),
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
    cat.register(
        fixture_source("prov0", history_intervals=("1m",), history=candles)
    )
    return cat


def main() -> None:
    spark = get_spark("ex21_download_builder")
    cat = build_catalog(spark)

    wanted = ["click", "view", "purchase", "no_such_symbol"]
    print(f"Downloading daily history for {wanted} — one plan, one report")
    candles, failed = download(spark, cat, wanted, interval="1d")

    print("== per-symbol daily bar counts ==")
    candles.groupBy("symbol").agg(
        F.count("*").alias("n_bars"),
        F.min("ts").alias("first_bar"),
        F.max("ts").alias("last_bar"),
    ).orderBy("symbol").show()

    print("== failure report (not an exception) ==")
    failed.show()
    spark.stop()


if __name__ == "__main__":
    main()
