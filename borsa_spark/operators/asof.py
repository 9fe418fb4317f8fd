"""As-of (time-travel) join — the canonical trades⨝quotes operator.

Spark has no native ASOF JOIN; the naive formulations are a range join
(explodes to |L|x|R| per key before filtering) or a per-key Python loop.
This implementation is the scalable union trick:

1. tag right rows 0 and left rows 1, union them on (key, ts, tag);
2. one window per key ordered by (ts, tag, seq) carries the right payload
   forward with ``last(col, ignorenulls=True)``;
3. keep only left rows — each now holds the latest right row with
   ``right_ts <= left_ts`` (backward as-of; ties at equal ts match because
   the right tag sorts first).

Cost shape: ONE shuffle on the key + a per-partition sort — identical to a
sort-merge join, with no candidate blowup regardless of how many right
rows precede a left row. At 100 TB this is the difference between a
time-proximity join that finishes and one that materializes a cross
product per symbol.

``tolerance`` (seconds) post-filters matches older than the window,
nulling the right payload (pandas.merge_asof semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "symbol",
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance: float | None = None,
    suffix: str = "_right",
    right_seq: str | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gains the most recent right row
    with ``right_ts <= left_ts`` on the same key (equal timestamps match).

    ``right_cols`` are the right payload columns to carry (default: every
    right column except the key and timestamp). The matched right
    timestamp is always emitted as ``{right_ts}{suffix}``. Rows with no
    match (or outside ``tolerance``) keep NULL payloads.

    ``right_seq`` names a right column that breaks ties among right rows
    sharing (key, ts) — without it, pre-dedup the right side to one row
    per (key, ts) or the winner among equal-ts right rows is
    partition-order-dependent.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]

    carried = [f"{c}{suffix}" for c in right_cols] + [f"{right_ts}{suffix}"]

    seq_expr = (
        F.col(right_seq).cast("long") if right_seq is not None else F.lit(0)
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        seq_expr.alias("__seq"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns if c != on],
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(0).alias("__seq"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(
            f"{right_ts}{suffix}"
        ),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns if c != on],
    )
    u = r.unionByName(l)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc(), F.col("__seq").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        on,
        "__ts",
        "__tag",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in carried],
        *[c for c in u.columns if c.startswith("__l_")],
    )
    out = filled.filter(F.col("__tag") == 1)

    if tolerance is not None:
        in_window = (
            F.col("__ts").cast("double")
            - F.col(f"{right_ts}{suffix}").cast("double")
        ) <= float(tolerance)
        out = out.select(
            on, "__ts", "__tag",
            *[
                F.when(in_window, F.col(c)).alias(c)
                for c in carried
            ],
            *[c for c in out.columns if c.startswith("__l_")],
        )

    return out.select(
        F.col(on),
        F.col("__ts").alias(left_ts),
        *[
            F.col(f"__l_{c}").alias(c)
            for c in left.columns
            if c != on and c != left_ts
        ],
        *carried,
    )
