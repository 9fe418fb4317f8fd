"""Stream-stream enrichment: a watermarked interval join between two live
streams — the Structured Streaming capability the rest of the streaming
layer (stateful gates, windowed bars, fan-in unions) does not exercise.

Use case from the reference's surface: the quote stream and the candle
stream run concurrently (borsa streams both; connector.rs exposes
QUOTE_UPDATES and CANDLE_UPDATES); a consumer wants each tick stamped
with the bar it belongs to — e.g. "this trade printed above its minute
bar's open". That is a stream-stream INNER join on symbol plus an
event-time interval: tick.ts ∈ [bar_start, bar_start + interval).

Spark executes this with symmetric join state on both sides; the
watermarks bound that state: a bar row can be dropped from state once
no tick older than (bar_start + interval) can still arrive, and vice
versa. Without the time-range condition the state would grow without
bound — the interval predicate is what makes the join admissible in
append mode.

Scale shape: state is keyed by symbol (co-partitioned with the sources'
natural keying, same as the gate), each side holds at most
watermark-window's worth of rows per symbol, and the join itself
shuffles both streams once on the symbol key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_UNIT_SECONDS = {
    "millisecond": 0.001, "milliseconds": 0.001,
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
}


def _interval_to_seconds(spec: str) -> int:
    """Parse the simple 'N unit' watermark strings Spark accepts. The
    derived bar-watermark default must account for the ACTUAL tick
    watermark — hardcoding the default's 30 s would silently under-size
    the bar state whenever a caller passes a longer tick watermark."""
    parts = spec.strip().split()
    if len(parts) == 2 and parts[1].lower() in _UNIT_SECONDS:
        try:
            return int(float(parts[0]) * _UNIT_SECONDS[parts[1].lower()])
        except ValueError:
            pass
    raise ValueError(
        f"cannot derive a bar watermark from tick watermark {spec!r};"
        " pass bar_watermark explicitly."
    )


def enrich_ticks_with_bars(
    ticks: DataFrame,
    bars: DataFrame,
    interval_seconds: int,
    tick_watermark: str = "30 seconds",
    bar_watermark: str | None = None,
) -> DataFrame:
    """Join a live tick stream to a live bar stream: each tick matches the
    bar whose [bar_ts, bar_ts + interval) window contains it, same symbol.

    ``ticks``: streaming (symbol, ts, price[, ...]); ``bars``: streaming
    (symbol, bar_ts, open[, ...]) — e.g. `candle_stream`'s output renamed,
    or a second source publishing reference bars. The bar watermark must
    be >= the tick watermark + interval so a bar is still in join state
    when its last admissible tick arrives — the DEFAULT derives exactly
    that (tick watermark + interval + 30 s margin) from
    ``interval_seconds``, because a fixed default silently drops
    late-in-bar matches the moment the interval outgrows it. Passing an
    explicit smaller ``bar_watermark`` is a deliberate freshness/state
    trade the caller owns.

    Returns (symbol, ts, price, bar_ts, open, above_open) in append mode.
    """
    if bar_watermark is None:
        bar_watermark = (
            f"{_interval_to_seconds(tick_watermark) + interval_seconds + 30}"
            " seconds"
        )
    t = ticks.withWatermark("ts", tick_watermark).alias("t")
    b = bars.withWatermark("bar_ts", bar_watermark).alias("b")
    cond = (
        (F.col("t.symbol") == F.col("b.symbol"))
        & (F.col("t.ts") >= F.col("b.bar_ts"))
        & (
            F.col("t.ts")
            < F.col("b.bar_ts") + F.expr(f"INTERVAL {interval_seconds} SECONDS")
        )
    )
    return t.join(b, cond, "inner").select(
        F.col("t.symbol").alias("symbol"),
        F.col("t.ts").alias("ts"),
        F.col("t.price").alias("price"),
        F.col("b.bar_ts").alias("bar_ts"),
        F.col("b.open").alias("open"),
        (F.col("t.price") > F.col("b.open")).alias("above_open"),
    )
