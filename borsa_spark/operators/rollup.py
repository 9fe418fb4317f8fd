"""Incrementally-maintained OHLCV rollups (continuous aggregates).

The hypertable continuous-aggregate shape (TimescaleDB's public docs
describe the semantics; the reference engine materializes full rollups
only — /root/reference/borsa-core resample paths — so incremental
maintenance is beyond-reference): keep the rollup in MERGEABLE state
form so a new batch of ticks folds into the materialized aggregate
with a keyed merge, never re-reading history.

Mergeable state per (symbol, bucket): ``first_ts/first_seq`` +
``open`` (value at the earliest (ts, seq)), ``last_ts/last_seq`` +
``close``, ``high``, ``low``, ``n_bars``, ``sum_value``. All of OHLCV
is reconstructible from any partition of the input because each field
is associative under :func:`rollup_merge` — open follows the smaller
(first_ts, first_seq), close the larger (last_ts, last_seq), the rest
are max/min/sum.

Scale shape (100 TB): the state table is stored partitioned by bucket
day. A batch touches a bounded set of DIRTY buckets;
:func:`merge_into_rollup` prunes the state scan to those partitions
(PartitionFilters, no full-state read) and rewrites ONLY them via
dynamic partition overwrite — per-batch cost is O(batch + dirty
partitions), independent of the rollup's total history. The in-memory
composition (state → merge → finalize) is gated against a full
recompute oracle (query c6): incremental == full, hash-matched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

STATE_COLS = [
    "symbol", "bucket", "first_ts", "first_seq", "last_ts", "last_seq",
    "open", "close", "high", "low", "n_bars", "sum_value",
]


def rollup_state(candles: DataFrame, trunc: str = "day") -> DataFrame:
    """Partial-aggregate a candle/tick relation (symbol, ts, value,
    seq) into mergeable per-(symbol, bucket) rollup state. One
    map-side-combined groupBy; (ts, seq) is the total order so
    duplicate timestamps stay deterministic.

    Null-ts ticks are DROPPED here: they cannot be bucketed, and
    letting them through would land their state in the Hive default
    partition (`pday=__HIVE_DEFAULT_PARTITION__`), which the
    maintainer's pday-keyed resolution can never read back — committed
    yet unreachable state (round-8 review finding)."""
    ord_key = F.struct("ts", "seq")
    return (
        candles.filter(F.col("ts").isNotNull())
        .groupBy(
            "symbol", F.date_trunc(trunc, "ts").alias("bucket")
        )
        .agg(
            F.min_by(ord_key, ord_key).alias("__f"),
            F.max_by(ord_key, ord_key).alias("__l"),
            F.min_by("value", ord_key).alias("open"),
            F.max_by("value", ord_key).alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.count("*").alias("n_bars"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "symbol", "bucket",
            F.col("__f.ts").alias("first_ts"),
            F.col("__f.seq").alias("first_seq"),
            F.col("__l.ts").alias("last_ts"),
            F.col("__l.seq").alias("last_seq"),
            "open", "close", "high", "low", "n_bars", "sum_value",
        )
    )


def _pick(
    cond: Column, a: Column, b: Column,
    a_present: Column, b_present: Column,
) -> Column:
    """b if a's ROW is absent, a if b's row is absent, else by cond.
    Presence is judged per ROW (the full-outer join side), never per
    column: a legitimately-NULL value (e.g. a null tick) must not make
    one field follow a different side than its ordering columns —
    that would break merge associativity."""
    return (
        F.when(~a_present, b).when(~b_present, a).when(cond, a).otherwise(b)
    )


def rollup_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two mergeable-state relations keyed on (symbol, bucket).
    Associative and commutative: open/close follow the (ts, seq) total
    order, high/low/n/sum combine null-safely — so state built from
    ANY partition of the input merges to the same rollup."""
    an = a.select([F.col(c).alias(f"a_{c}") for c in STATE_COLS])
    bn = b.select([F.col(c).alias(f"b_{c}") for c in STATE_COLS])
    joined = an.join(
        bn,
        (F.col("a_symbol") == F.col("b_symbol"))
        & (F.col("a_bucket") == F.col("b_bucket")),
        "full_outer",
    )
    # row-presence witnesses: n_bars is non-null on every present row
    ap = F.col("a_n_bars").isNotNull()
    bp = F.col("b_n_bars").isNotNull()
    a_first = F.struct(F.col("a_first_ts"), F.col("a_first_seq"))
    b_first = F.struct(F.col("b_first_ts"), F.col("b_first_seq"))
    a_last = F.struct(F.col("a_last_ts"), F.col("a_last_seq"))
    b_last = F.struct(F.col("b_last_ts"), F.col("b_last_seq"))
    a_wins_open = a_first < b_first
    a_wins_close = a_last > b_last
    return joined.select(
        F.coalesce("a_symbol", "b_symbol").alias("symbol"),
        F.coalesce("a_bucket", "b_bucket").alias("bucket"),
        _pick(a_wins_open, F.col("a_first_ts"), F.col("b_first_ts"),
              ap, bp).alias("first_ts"),
        _pick(a_wins_open, F.col("a_first_seq"), F.col("b_first_seq"),
              ap, bp).alias("first_seq"),
        _pick(a_wins_close, F.col("a_last_ts"), F.col("b_last_ts"),
              ap, bp).alias("last_ts"),
        _pick(a_wins_close, F.col("a_last_seq"), F.col("b_last_seq"),
              ap, bp).alias("last_seq"),
        _pick(a_wins_open, F.col("a_open"), F.col("b_open"),
              ap, bp).alias("open"),
        _pick(a_wins_close, F.col("a_close"), F.col("b_close"),
              ap, bp).alias("close"),
        F.greatest("a_high", "b_high").alias("high"),
        F.least("a_low", "b_low").alias("low"),
        (
            F.coalesce("a_n_bars", F.lit(0))
            + F.coalesce("b_n_bars", F.lit(0))
        ).alias("n_bars"),
        (
            F.coalesce("a_sum_value", F.lit(0.0))
            + F.coalesce("b_sum_value", F.lit(0.0))
        ).alias("sum_value"),
    )


def rollup_cascade(state: DataFrame, trunc: str = "day") -> DataFrame:
    """Re-bucket mergeable state to a COARSER granularity — the
    hypertable cascade: the hourly continuous aggregate feeds the
    daily one without ever touching raw ticks. Exact because every
    state field is associative across buckets too: open/close follow
    the (first_ts, first_seq)/(last_ts, last_seq) total order, the
    rest are max/min/sum. One vocab-sized partial-agg groupBy."""
    first_key = F.struct("first_ts", "first_seq")
    last_key = F.struct("last_ts", "last_seq")
    return (
        state.groupBy(
            "symbol", F.date_trunc(trunc, "bucket").alias("bucket")
        )
        .agg(
            F.min_by(first_key, first_key).alias("__f"),
            F.max_by(last_key, last_key).alias("__l"),
            F.min_by("open", first_key).alias("open"),
            F.max_by("close", last_key).alias("close"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.sum("n_bars").alias("n_bars"),
            F.sum("sum_value").alias("sum_value"),
        )
        .select(
            "symbol", "bucket",
            F.col("__f.first_ts").alias("first_ts"),
            F.col("__f.first_seq").alias("first_seq"),
            F.col("__l.last_ts").alias("last_ts"),
            F.col("__l.last_seq").alias("last_seq"),
            "open", "close", "high", "low", "n_bars", "sum_value",
        )
    )


def rollup_finalize(state: DataFrame) -> DataFrame:
    """User-facing OHLCV from mergeable state — the exact column
    contract of the a2/a3/a4 full-recompute rollups (queries.py
    ``_OHLC_ORACLE``), so incremental and full results hash-compare."""
    return state.select(
        "symbol",
        F.unix_timestamp("bucket").alias("bucket_ts"),
        "open",
        F.round("high", 2).alias("high"),
        F.round("low", 2).alias("low"),
        "close",
        "n_bars",
        F.round("sum_value", 2).alias("sum_value"),
    )


def write_rollup(state: DataFrame, state_dir: str) -> None:
    """Materialize state partitioned by bucket day — the layout
    :func:`merge_into_rollup` prunes and selectively rewrites."""
    (
        state.withColumn("pday", F.date_format("bucket", "yyyy-MM-dd"))
        .write.mode("overwrite")
        .partitionBy("pday")
        .parquet(state_dir)
    )


def merge_into_rollup(
    spark: SparkSession, state_dir: str, batch: DataFrame,
    trunc: str = "day",
) -> list[str]:
    """Fold a tick batch into a materialized state table, touching only
    the DIRTY partitions. Returns the dirty partition-day list.

    The incremental-maintenance contract: the state scan carries a
    partition filter on the dirty days (pruned at planning, no full
    read), and the write uses dynamic partition overwrite so untouched
    partitions' files are left byte-identical on disk. The dirty-day
    collect is bounded control-plane data (distinct calendar days in
    one batch).

    NOT crash-safe: this reads ``state_dir`` and dynamic-partition-
    overwrites the same path in one job. The commit lands after the
    reads complete, but a crash MID-commit can leave some dirty
    partitions rewritten and others not, with no record that the batch
    was half-applied — re-running then double-counts the rewritten
    days. Use it only for one-shot backfills where a failure is
    answered by rebuilding from scratch via :func:`write_rollup`; for
    replayed deliveries (``foreachBatch``) use
    ``streaming.rollup.RollupMaintainer``, whose version-log +
    marker-last protocol is exactly-once under crash and replay."""
    # lazy: the dirty-pday collect below is the first action and
    # materializes the checkpoint as a side effect — eager ran the
    # identical batch aggregation as its own separate job first
    # (round 14; one job per batch saved, the merge still reads the
    # persisted RDD, never the lineage)
    batch_state = rollup_state(batch, trunc).localCheckpoint(eager=False)
    dirty = [
        r.pday
        for r in batch_state.select(
            F.date_format("bucket", "yyyy-MM-dd").alias("pday")
        )
        .distinct()
        .collect()
    ]
    if not dirty:
        return dirty
    current = spark.read.parquet(state_dir).filter(
        F.col("pday").isin(dirty)
    ).drop("pday")
    merged = rollup_merge(current, batch_state)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.withColumn(
                "pday", F.date_format("bucket", "yyyy-MM-dd")
            )
            .write.mode("overwrite")
            .partitionBy("pday")
            .parquet(state_dir)
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev
            )
    return dirty


def read_rollup(spark: SparkSession, state_dir: str) -> DataFrame:
    return spark.read.parquet(state_dir).drop("pday")
