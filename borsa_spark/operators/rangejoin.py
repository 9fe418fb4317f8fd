"""Range (interval) join — points matched into [start, end] intervals.

Spark expresses a range join as a non-equi join, which falls back to
broadcast-nested-loop or a cartesian per key — O(|points| x |intervals|)
per key at scale. This implementation is the bucketize trick:

1. explode each interval into the fixed-size time buckets it overlaps
   (JVM-side ``sequence`` + ``explode`` — rows grow by span/bucket, a
   constant chosen to fit the data's span distribution);
2. equi-join points on (key, bucket) — a plain shuffled hash join;
3. post-filter the exact containment predicate.

Cost is linear in |points| + |interval-buckets|, never quadratic; the
bucket size trades explode factor against join selectivity. This is the
standard open-source answer to the range-join-hint feature of managed
Spark runtimes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str = "ts",
    start_col: str = "span_start",
    end_col: str = "span_end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join: every (point, interval) pair on the same key with
    ``start_col <= point_ts <= end_col`` (inclusive both ends). A point
    matching several intervals appears once per match.
    """

    def bkt(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / bucket_seconds)

    iv = intervals.withColumn(
        "__b",
        F.explode(F.sequence(bkt(F.col(start_col)), bkt(F.col(end_col)))),
    )
    pt = points.withColumn("__b", bkt(F.col(point_ts)))
    return (
        pt.join(iv, [on, "__b"])
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__b")
    )
