"""Provider attribution spans (SURVEY §2.4 A9, §2.5 W4).

Semantics match `build_attribution` (borsa/src/router/history.rs:588-634):
after the first-wins merge, each timestamp has a winning provider; contiguous
same-provider runs (ordered by ts) collapse to (provider, span_start,
span_end). Time gaps do NOT break a run — only a provider change does.

Spark mapping: the classic lag -> change-flag -> running-sum run-id
sessionization, then one groupBy. Two window passes + one aggregation over
the merged series, all partitioned by symbol.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_attribution(merged: DataFrame, key: str = "symbol") -> DataFrame:
    """(key, provider, span_start TIMESTAMP, span_end TIMESTAMP, n_candles).

    ``merged`` must carry one row per (key, ts) with the winning provider
    (output of operators.merge.merge_candles).
    """
    w = Window.partitionBy(key).orderBy("ts")
    runs = (
        merged.select(key, "ts", "provider")
        .withColumn("__prev", F.lag("provider").over(w))
        .withColumn(
            "__chg",
            F.when(
                F.col("__prev").isNull() | (F.col("__prev") != F.col("provider")),
                1,
            ).otherwise(0),
        )
        .withColumn("__run", F.sum("__chg").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ))
    )
    return (
        runs.groupBy(key, "__run")
        .agg(
            F.any_value("provider").alias("provider"),
            F.min("ts").alias("span_start"),
            F.max("ts").alias("span_end"),
            F.count("*").alias("n_candles"),
        )
        .withColumnRenamed("__run", "run_idx")
    )
