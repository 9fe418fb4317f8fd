"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query: the full borsa history pipeline
  (monotonic gate -> daily resample -> priority merge -> attribution flags)
  over the sf0.001 events feed.
- ``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
  SURVEY.md §2, declared in borsa_spark.queries with a DuckDB oracle each.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: merged multi-provider daily series with provider attribution."""
    from pyspark.sql import functions as F

    from borsa_spark.operators import (
        build_attribution,
        merge_history,
        monotonic_gate,
        resample_to_daily,
    )
    from borsa_spark.sources import load_table

    ev = load_table(spark, SF0001, "events")
    candles = ev.select(
        F.concat(F.lit("prov"), (F.col("user_id") % 2).cast("string")).alias(
            "provider"
        ),
        F.col("event_type").alias("symbol"),
        F.lit("EQUITY").alias("kind"),
        F.col("ts"),
        F.col("value").cast("decimal(38,9)").alias("open"),
        F.col("value").cast("decimal(38,9)").alias("high"),
        F.col("value").cast("decimal(38,9)").alias("low"),
        F.col("value").cast("decimal(38,9)").alias("close"),
        F.lit(None).cast("decimal(38,9)").alias("close_unadj"),
        F.lit(1).cast("long").alias("volume"),
        F.lit("USD").alias("currency"),
        F.lit(True).alias("adjusted"),
        F.lit(None).cast("string").alias("timezone"),
        F.lit(None).cast("long").alias("utc_offset_seconds"),
        F.col("event_id").alias("seq"),
    )
    gated = monotonic_gate(candles, key="symbol", order_col="seq")
    daily = resample_to_daily(gated)
    merged, _, _flags = merge_history(daily, priorities={"prov0": 0, "prov1": 1})
    attr = build_attribution(merged)
    return merged.join(
        attr.select("symbol", "provider", "run_idx"),
        ["symbol", "provider"],
        "left_semi",
    ).orderBy("symbol", "ts")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from borsa_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from borsa_spark.queries import ORACLES

    return dict(ORACLES)
