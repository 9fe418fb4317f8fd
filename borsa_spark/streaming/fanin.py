"""Stream fan-in (T1) + allowed-symbol filter (P6) + candle windowing (T12).

Reference: per-provider sessions push into one mpsc(1024) channel
(borsa/src/router/stream.rs:56); each session drops symbols outside its
allow-set (session.rs:64-69). CandleUpdate bars carry `is_final` set by the
provider on bar close (connector.rs:270-288).

Spark mapping:
- fan-in = `union` of per-source streaming DataFrames (backpressure is
  native to micro-batching — the reference's bounded-channel blocking, T9,
  has no analog to implement);
- allow filter = `filter(symbol isin allowed)` per source BEFORE the union
  so it prunes at the source;
- candle bars = watermark + tumbling window aggregation. In append mode the
  bar emits once, when the watermark passes the window end — that IS
  `is_final=true`. In update mode partial bars stream out with
  `is_final=false` until closed. This is the Spark-native upgrade over the
  reference's provider-computed bars (SURVEY §2.8 note).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fan_in(
    sources: list[DataFrame], allowed: dict[int, list[str]] | None = None
) -> DataFrame:
    """Union per-provider streams; optional per-source allow-sets (P6).

    ``allowed[i]`` restricts source i to those symbols; omitted indexes pass
    everything (session.rs:64-69 drop-branch).
    """
    pruned = []
    for i, src in enumerate(sources):
        if allowed and i in allowed:
            src = src.filter(F.col("symbol").isin(allowed[i]))
        pruned.append(src)
    return reduce(lambda a, b: a.unionByName(b), pruned)


def option_stream(
    sources: list[DataFrame],
    allowed: dict[int, list[str]] | None = None,
    gate: bool = True,
) -> DataFrame:
    """S11: multiplexed option-update stream (stream.rs:480-521).

    The reference streams OptionUpdate through the SAME generic machinery
    as quotes — fan-in of per-provider sessions, per-session allow-sets,
    and the monotonic gate keyed on the update's ``stream_symbol()``, which
    for options is the UNDERLYING security symbol
    (streaming/mod.rs:44-56). Contract identity (``contract_symbol``)
    rides along as payload; gating is per-underlying event time, exactly
    the reference semantics.

    Input frames must be OPTION_UPDATES-shaped (schemas.py).
    """
    merged = fan_in(sources, allowed)
    if gate:
        from borsa_spark.streaming.gate import streaming_monotonic_gate

        merged = streaming_monotonic_gate(merged, key="symbol")
    return merged


def streaming_exact_dedup(
    updates: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop replays of the same key within the
    watermark horizon (`dropDuplicatesWithinWatermark`).

    This is the compatibility-mode alternative to the monotonic gate for
    sources that re-deliver identical updates (at-least-once feeds), and the
    streaming form of the training-pipeline exact dedup: key on the content
    hash to dedup documents as they arrive. State is bounded by the
    watermark (the gate's state never expires without TTL).
    """
    return updates.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def candle_stream(
    updates: DataFrame,
    interval_seconds: int,
    watermark: str = "30 seconds",
    ts_col: str = "ts",
    price_col: str = "price",
    volume_col: str | None = "volume",
    final_mode: bool = True,
) -> DataFrame:
    """T12: tick stream -> OHLCV bars at a tumbling interval.

    Emits one row per (symbol, window) with open/high/low/close from
    event-time ordering. ``final_mode=True`` is for outputMode('append'):
    every emitted bar is watermark-closed, so ``is_final`` is true.
    Pass ``final_mode=False`` when running in 'update' mode — partial bars
    re-emit as ticks arrive and Spark does not expose per-row closedness,
    so ``is_final`` is false for every row (a bar's final form is the last
    re-emission; downstream keyed upserts make that the surviving value).

    DOCUMENTED DIVERGENCE from the reference contract
    (borsa-core connector.rs: "is_final reflects when the upstream
    provider has closed the interval"): there, the closing update of a
    watermark-closed bar WOULD carry is_final=true even in update mode.
    Spark's update-mode agg output has no per-row "this emission closed
    the group" signal, so here even the last re-emission of a closed bar
    is is_final=false. Consumers needing the reference semantics should
    run append mode (every row final) or join update-mode bars against
    an append-mode stream of the same aggregation, treating presence in
    the append stream as the closed marker.
    """
    win = F.window(F.col(ts_col), f"{interval_seconds} seconds")
    ord_key: Column = F.struct(F.col(ts_col), F.col("seq")) if "seq" in updates.columns else F.col(ts_col)
    aggs = [
        F.min_by(price_col, ord_key).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(price_col, ord_key).alias("close"),
        F.count("*").alias("n_ticks"),
    ]
    if volume_col is not None and volume_col in updates.columns:
        aggs.append(F.sum(volume_col).alias("volume"))
    return (
        updates.withWatermark(ts_col, watermark)
        .groupBy(F.col("symbol"), win.alias("window"))
        .agg(*aggs)
        .select(
            "symbol",
            F.col("window.start").alias("ts"),
            F.col("window.end").alias("window_end"),
            "open", "high", "low", "close", "n_ticks",
            *( ["volume"] if volume_col is not None and "volume" in updates.columns else [] ),
            # CANDLE_UPDATES parity (connector.rs:270-288): the requested
            # interval travels with each bar; is_final truthfulness depends
            # on the output mode (see final_mode in the docstring).
            F.lit(f"{interval_seconds}s").alias("interval"),
            F.lit(bool(final_mode)).alias("is_final"),
        )
    )


def rollup_stream(
    updates: DataFrame,
    tier_seconds: list[int],
    watermark: str = "30 seconds",
    ts_col: str = "ts",
    price_col: str = "price",
) -> DataFrame:
    """Tiered continuous aggregation ("hypertable rollup" shape): ticks ->
    bars at tier_seconds[0] -> coarser bars re-aggregated FROM the previous
    tier, one streaming query with stacked stateful operators (append mode
    + watermarks, supported since Spark 3.4/4.x).

    Why tiers instead of N independent aggregations over raw ticks: each
    coarser tier consumes tier-bar rows (orders of magnitude fewer than
    ticks), so state and shuffle per tier shrink geometrically — the same
    reason time-series stores cascade their continuous aggregates. OHLC
    composes exactly: open of a coarse bucket = open of its earliest fine
    bar, high = max of highs, volume/n_ticks sum (cascade == direct is
    oracle-checked batch-side by a10_rollup_cascade).

    Returns the final tier with bucket-start ``ts``.
    """
    if not tier_seconds:
        raise ValueError("tier_seconds must be non-empty")
    if any(b % a for a, b in zip(tier_seconds, tier_seconds[1:])):
        raise ValueError("each tier must divide the next")
    # Tier 1: the only withWatermark in the query. Coarser tiers chain via
    # window-on-window (F.window over the previous tier's window STRUCT),
    # which propagates the event-time watermark through each aggregation —
    # re-applying withWatermark on intermediate output would add a second
    # watermark node that sees no data until tier 1 emits, pinning the
    # global (min-of-nodes) watermark at zero and deadlocking eviction.
    ord_key = F.struct(F.col("window.start"))
    out = (
        updates.withWatermark(ts_col, watermark)
        .groupBy(
            F.col("symbol"),
            F.window(F.col(ts_col), f"{tier_seconds[0]} seconds").alias(
                "window"
            ),
        )
        .agg(
            F.min_by(price_col, F.col(ts_col)).alias("open"),
            F.max(price_col).alias("high"),
            F.min(price_col).alias("low"),
            F.max_by(price_col, F.col(ts_col)).alias("close"),
            F.count("*").alias("n_ticks"),
        )
    )
    for step in tier_seconds[1:]:
        out = (
            out.groupBy(
                F.col("symbol"),
                F.window(F.col("window"), f"{step} seconds").alias("window"),
            )
            .agg(
                F.min_by("open", ord_key).alias("open"),
                F.max("high").alias("high"),
                F.min("low").alias("low"),
                F.max_by("close", ord_key).alias("close"),
                F.sum("n_ticks").alias("n_ticks"),
            )
        )
    return out.select(
        "symbol",
        F.col("window.start").alias("ts"),
        F.col("window.end").alias("window_end"),
        "open", "high", "low", "close", "n_ticks",
        F.lit(f"{tier_seconds[-1]}s").alias("interval"),
        F.lit(True).alias("is_final"),
    )
