"""Interval inference (SURVEY §2.6 O6, §2.2 subdaily heuristic).

Semantics match borsa-core/src/timeseries/infer.rs:

estimate_step_seconds (:51-113): from positive adjacent timestamp deltas of
the ts-sorted, ts-deduped series, return the unique mode; if the top
frequency is shared by several deltas, return the *lower median* of all
deltas. Fewer than two distinct timestamps -> null.

is_subdaily (:122-158): true iff at least 3 adjacent deltas are < 86400 s AND
at least 60% of adjacent deltas are (subdaily*5 >= total*3).

Both are per-series scalars; implemented as one aggregation pipeline per
symbol — window for deltas (one shuffle on symbol), then a groupBy. All
JVM-side; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DAY = 86_400


def _deltas(df: DataFrame, key: str = "symbol") -> DataFrame:
    """Positive adjacent deltas (seconds) per series, duplicates collapsed."""
    ts = df.select(key, "ts").dropDuplicates([key, "ts"])
    w = Window.partitionBy(key).orderBy("ts")
    return (
        ts.withColumn("__prev", F.lag("ts").over(w))
        .filter(F.col("__prev").isNotNull())
        .select(
            key,
            (F.unix_timestamp("ts") - F.unix_timestamp("__prev")).alias("delta"),
        )
        .filter(F.col("delta") > 0)
    )


def estimate_step_seconds(df: DataFrame, key: str = "symbol") -> DataFrame:
    """Per-series representative step: (key, step_seconds).

    Series with <2 distinct timestamps are absent from the output (the
    reference returns None for them).
    """
    deltas = _deltas(df, key)

    counts = deltas.groupBy(key, "delta").agg(F.count("*").alias("n"))
    wk = Window.partitionBy(key)
    mode = (
        counts.withColumn("__maxn", F.max("n").over(wk))
        .filter(F.col("n") == F.col("__maxn"))
        .groupBy(key)
        .agg(
            F.count("*").alias("n_candidates"),
            F.min("delta").alias("mode_delta"),
        )
    )

    wsorted = Window.partitionBy(key).orderBy("delta")
    med = (
        deltas.withColumn("__rn", F.row_number().over(wsorted))
        .withColumn("__n", F.count("*").over(wk))
        .filter(F.col("__rn") == F.floor((F.col("__n") + 1) / 2))
        .select(key, F.col("delta").alias("median_delta"))
    )

    return (
        mode.join(med, key, "inner")
        .select(
            key,
            F.when(F.col("n_candidates") == 1, F.col("mode_delta"))
            .otherwise(F.col("median_delta"))
            .alias("step_seconds"),
        )
    )


def is_subdaily(df: DataFrame, key: str = "symbol") -> DataFrame:
    """Per-series subdaily flag: (key, subdaily BOOLEAN)."""
    deltas = _deltas(df, key)
    return deltas.groupBy(key).agg(
        (
            (F.sum(F.when(F.col("delta") < DAY, 1).otherwise(0)) >= 3)
            & (
                F.sum(F.when(F.col("delta") < DAY, 1).otherwise(0)) * 5
                >= F.count("*") * 3
            )
        ).alias("subdaily")
    )
