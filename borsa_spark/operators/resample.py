"""OHLCV bucket resampling (SURVEY §2.4 A1–A5).

Semantics match the reference resampler (borsa-core/src/timeseries/resample.rs):

- Buckets are assigned by a bucket function of ``ts`` (UTC daily at
  resample.rs:350-355, Monday-start weekly at :11-19/:401-403, arbitrary
  minutes at :447-456; timezone/offset-aware variants at :183-320).
- Per bucket: open = first by ts, high = max, low = min, close = last by ts,
  volume = sum ignoring NULLs (all-NULL bucket -> NULL), saturating
  (resample.rs:176-179 clamps at u64::MAX; we clamp at LongType max —
  a documented divergence, SURVEY §2.4 A7).
- Output ``ts`` is the bucket start; ``close_unadj`` is cleared (:331).
- Mixed currencies within a bucket or across the series are an error
  (validated separately, see operators.validate — Spark transforms are lazy
  so validation is an explicit action the router runs before merging).
- Empty input or ``minutes <= 0`` passes through unchanged (:447-456).

Spark mapping: one ``groupBy(symbol..., bucket)`` with ``min_by/max_by`` over
``(ts, seq)`` — a single shuffle per resample; no Python is involved, the whole
aggregation stays in Tungsten codegen. At 100 TB the shuffle keys on
``(symbol, bucket)`` which is naturally high-cardinality and unskewed.

First/last determinism: rows carry a ``seq`` column (input order within a
series). The reference sorts by ts with a *stable* sort (resample.rs:34), so
equal-ts rows keep input order; ``min_by(open, struct(ts, seq))`` reproduces
exactly that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

LONG_MAX = (1 << 63) - 1

#: Columns that identify one logical series; resampling never mixes series.
SERIES_KEYS = ["provider", "symbol"]

_PASSTHRU = ["kind", "currency", "adjusted", "timezone", "utc_offset_seconds"]


def _local_shift_seconds() -> Column:
    """Per-row shift (seconds) from UTC into the bucketing frame.

    Precedence (resample.rs:279-320): timezone > utc_offset_seconds > UTC.
    The timezone path converts via the IANA tz database
    (from_utc_timestamp), the offset path is fixed arithmetic.
    """
    return F.coalesce(F.col("utc_offset_seconds"), F.lit(0)).cast("long")


def _bucket_expr(mode: str, minutes: int | None = None) -> Column:
    """Bucket-start timestamp for a row, honoring timezone/offset metadata.

    - tz-annotated rows bucket at market-local midnight / Monday / minute
      (resample.rs:212-277). Implemented with from_utc_timestamp /
      to_utc_timestamp; DST-ambiguous local midnights resolve to the earlier
      offset, matching the reference's `LocalResult::Ambiguous -> dt1` choice
      for day/week bucketing (resample.rs:216-226).
    - offset-annotated rows shift, floor, shift back (resample.rs:183-210).
    - otherwise plain UTC flooring.
    """
    ts = F.col("ts")
    epoch = F.unix_timestamp(ts)

    if mode == "daily":
        utc_bucket = F.timestamp_seconds((F.floor(epoch / 86400)) * 86400)
        tz_bucket = F.to_utc_timestamp(
            F.date_trunc("day", F.from_utc_timestamp(ts, F.col("timezone"))),
            F.col("timezone"),
        )
        off = _local_shift_seconds()
        off_bucket = F.timestamp_seconds(
            F.floor((epoch + off) / 86400) * 86400 - off
        )
    elif mode == "weekly":
        # Monday-start week: day - ((day + 3) mod 7) since epoch day 0 was a
        # Thursday (resample.rs:11-13). date_trunc('week') is Monday-start in
        # Spark, matching.
        day = F.floor(epoch / 86400)
        ws = day - (day + 3) % 7
        utc_bucket = F.timestamp_seconds(ws * 86400)
        tz_bucket = F.to_utc_timestamp(
            F.date_trunc("week", F.from_utc_timestamp(ts, F.col("timezone"))),
            F.col("timezone"),
        )
        off = _local_shift_seconds()
        sday = F.floor((epoch + off) / 86400)
        sws = sday - (sday + 3) % 7
        off_bucket = F.timestamp_seconds(sws * 86400 - off)
    elif mode == "minutes":
        step = int(minutes) * 60
        utc_bucket = F.timestamp_seconds(F.floor(epoch / step) * step)
        # Local-minute bucketing: minutes-from-local-midnight flooring
        # (resample.rs:245-277). Equivalent to flooring the local wall clock.
        local_epoch = F.unix_timestamp(F.from_utc_timestamp(ts, F.col("timezone")))
        tz_bucket = F.to_utc_timestamp(
            F.timestamp_seconds(F.floor(local_epoch / step) * step),
            F.col("timezone"),
        )
        off = _local_shift_seconds()
        off_bucket = F.timestamp_seconds(F.floor((epoch + off) / step) * step - off)
    else:  # pragma: no cover
        raise ValueError(f"unknown bucket mode {mode!r}")

    return (
        F.when(F.col("timezone").isNotNull(), tz_bucket)
        .when(F.col("utc_offset_seconds").isNotNull(), off_bucket)
        .otherwise(utc_bucket)
    )


def _saturated(total: Column) -> Column:
    """Clamp a DECIMAL(38,0) sum at LongType max, preserving NULL (all-NULL
    bucket -> NULL; F.least alone would skip the NULL and return the clamp)."""
    return (
        F.when(total.isNull(), F.lit(None))
        .otherwise(F.least(total, F.lit(LONG_MAX).cast("decimal(38,0)")))
        .cast("long")
    )


def _resample_by(
    df: DataFrame, bucket: Column, keys: list[str] | None = None
) -> DataFrame:
    keys = SERIES_KEYS if keys is None else keys
    ord_key = F.struct(F.col("ts"), F.coalesce(F.col("seq"), F.lit(0)))
    agg = (
        df.withColumn("__bucket", bucket)
        .groupBy(*keys, "__bucket")
        .agg(
            F.min_by("open", ord_key).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", ord_key).alias("close"),
            # sum ignores NULLs; all-NULL -> NULL. Accumulate in DECIMAL(38,0)
            # (the reference uses a u128 accumulator, resample.rs:48) then
            # saturate at LongType max.
            _saturated(F.sum(F.col("volume").cast("decimal(38,0)"))).alias("volume"),
            F.min("seq").alias("seq"),
            # Series-level attributes are constant within a series; pick the
            # first row's value deterministically (min_by over (ts, seq)).
            *[F.min_by(c, ord_key).alias(c) for c in _PASSTHRU],
        )
        .withColumn("close_unadj", F.lit(None).cast("decimal(38,9)"))
        .withColumnRenamed("__bucket", "ts")
    )
    return agg.select(
        *keys, "kind", "ts", "open", "high", "low", "close",
        "close_unadj", "volume", "currency", "adjusted", "timezone",
        "utc_offset_seconds", "seq",
    )


def resample_to_daily(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """A2/A5: daily OHLCV buckets (resample.rs:350-371)."""
    return _resample_by(df, _bucket_expr("daily"), keys)


def resample_to_weekly(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """A3/A5: Monday-start weekly buckets (resample.rs:401-419)."""
    return _resample_by(df, _bucket_expr("weekly"), keys)


def resample_to_minutes(
    df: DataFrame, minutes: int, keys: list[str] | None = None
) -> DataFrame:
    """A4/A5: arbitrary-minute buckets (resample.rs:447-480).

    ``minutes <= 0`` is a passthrough, matching resample.rs:448-450.
    """
    if minutes <= 0:
        return df
    return _resample_by(df, _bucket_expr("minutes", minutes), keys)


def resample(
    df: DataFrame,
    plan: str,
    minutes: int | None = None,
    keys: list[str] | None = None,
) -> DataFrame:
    """Apply a ResamplePlan by name: 'daily' | 'weekly' | 'minutes'."""
    if plan == "daily":
        return resample_to_daily(df, keys)
    if plan == "weekly":
        return resample_to_weekly(df, keys)
    if plan == "minutes":
        if minutes is None:
            raise ValueError("minutes plan requires a minutes value")
        return resample_to_minutes(df, minutes, keys)
    raise ValueError(f"unknown resample plan {plan!r}")


def fill_gaps(
    candles: DataFrame,
    step_seconds: int,
    keys: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Gap-fill a bucketed series into a continuous spine: for every key,
    generate all step-aligned buckets between its min and max ts, carry
    the last known close forward into missing buckets (open=high=low=
    close=carried value, volume 0), and flag synthetic rows.

    Input rows whose ts is NOT min+k*step for their key (mis-bucketed
    input or a wrong ``step_seconds``) are NEVER silently dropped: the
    candles side joins the spine FULL OUTER, off-spine rows survive with
    ``is_off_spine=true``, and ``strict=True`` turns any such row into a
    ValueError (one O(1)-result validation action).

    The spine is built JVM-side per key (`sequence` + `explode` — no
    driver loop, no cross join with a global calendar); the forward fill
    is one `last(ignorenulls)` window over the same key partitioning the
    join used, so the whole op is a single shuffle family. The model-
    ready "continuous series" a training pipeline feeds to sequence
    models.
    """
    keys = SERIES_KEYS if keys is None else keys
    spine = (
        candles.groupBy(*keys)
        .agg(F.min("ts").alias("__lo"), F.max("ts").alias("__hi"))
        .select(
            *keys,
            F.explode(
                F.sequence(
                    F.unix_timestamp("__lo"),
                    F.unix_timestamp("__hi"),
                    F.lit(step_seconds),
                )
            ).alias("__sec"),
        )
        .select(*keys, F.timestamp_seconds(F.col("__sec")).alias("ts"))
        .withColumn("__on_spine", F.lit(True))
    )
    joined = spine.join(candles, [*keys, "ts"], "full_outer")
    w = (
        Window.partitionBy(*keys)
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("close", ignorenulls=True).over(w)
    synthetic = F.col("close").isNull()
    out = joined.select(
        *keys,
        "ts",
        F.coalesce("open", carried).alias("open"),
        F.coalesce("high", carried).alias("high"),
        F.coalesce("low", carried).alias("low"),
        F.coalesce("close", carried).alias("close"),
        F.when(synthetic, F.lit(0)).otherwise(F.col("volume"))
        .cast("long").alias("volume"),
        synthetic.alias("is_synthetic"),
        F.col("__on_spine").isNull().alias("is_off_spine"),
    )
    if strict:
        bad = out.filter("is_off_spine").limit(1).count()
        if bad:
            raise ValueError(
                "fill_gaps: input rows are not aligned to "
                f"min+k*{step_seconds}s for their key (is_off_spine=true); "
                "fix the bucketing or pass strict=False to keep+flag them"
            )
    return out
