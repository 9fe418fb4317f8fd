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


class PartialBarEnricher:
    """Partial-bar-aware enrichment: the delivered-updates CLIENT shape
    from the reference (borsa-core router_stream_candles.rs — a consumer
    of is_final=false CandleUpdates keeps the latest bar per (symbol,
    window) and stamps concurrent ticks against it).

    `enrich_ticks_with_bars` above joins ticks to watermark-CLOSED bars
    (append mode): correct values, but a tick printed mid-window waits
    out the watermark before it can be stamped. This class is the
    freshness-side variant for update mode, where Spark cannot run a
    stream-stream join after an update-mode aggregation: drive
    `candle_stream(..., final_mode=False)` through ``foreachBatch`` into
    :meth:`upsert`, and stamp each tick micro-batch with :meth:`enrich`
    — every tick sees the bar state AS OF its batch, revisions included.

    State discipline: the upsert keeps ONE row per (symbol, window) —
    the client-side cache the reference consumer holds. Its size is
    bounded by |symbols| x |windows still receiving updates| (the
    watermark closes windows, so this does not grow with stream
    length); ``retain_windows`` additionally drops bars older than K
    windows behind the newest per symbol. The enrichment join itself
    broadcasts this small state against the tick batch — Spark-native,
    no driver loop over ticks."""

    def __init__(self, spark, interval_seconds: int,
                 retain_windows: int | None = None):
        self.spark = spark
        self.interval_seconds = interval_seconds
        self.retain_windows = retain_windows
        self._bars: dict = {}
        self._schema = None

    def upsert(self, bar_batch: DataFrame, batch_id: int = 0) -> None:
        """foreachBatch sink for the update-mode bar stream: latest
        emission wins per (symbol, window). The collect is the bounded
        state handoff (open bars only), not a data-plane move."""
        if self._schema is None:
            self._schema = bar_batch.schema
        for r in bar_batch.collect():
            self._bars[(r["symbol"], r["ts"])] = r
        if self.retain_windows is not None:
            newest: dict = {}
            for (sym, ts) in self._bars:
                if sym not in newest or ts > newest[sym]:
                    newest[sym] = ts
            horizon = {
                sym: ts.timestamp()
                - self.retain_windows * self.interval_seconds
                for sym, ts in newest.items()
            }
            self._bars = {
                (sym, ts): row
                for (sym, ts), row in self._bars.items()
                if ts.timestamp() >= horizon[sym]
            }

    def bars(self) -> DataFrame:
        if self._schema is None or not self._bars:
            raise ValueError("no bar state upserted yet")
        return self.spark.createDataFrame(
            list(self._bars.values()), schema=self._schema
        )

    def enrich(self, ticks: DataFrame) -> DataFrame:
        """Stamp a (symbol, ts, price[, ...]) tick batch with the latest
        known bar covering each tick: (symbol, ts, price, bar_ts, open,
        above_open, bar_is_final). Left join — a tick whose window has
        produced no emission yet carries nulls rather than being
        dropped (the consumer can re-stamp it after the next upsert)."""
        b = F.broadcast(self.bars()).alias("b")
        t = ticks.alias("t")
        cond = (
            (F.col("t.symbol") == F.col("b.symbol"))
            & (F.col("t.ts") >= F.col("b.ts"))
            & (F.col("t.ts") < F.col("b.window_end"))
        )
        return t.join(b, cond, "left").select(
            F.col("t.symbol").alias("symbol"),
            F.col("t.ts").alias("ts"),
            F.col("t.price").alias("price"),
            F.col("b.ts").alias("bar_ts"),
            F.col("b.open").alias("open"),
            (F.col("t.price") > F.col("b.open")).alias("above_open"),
            F.col("b.is_final").alias("bar_is_final"),
        )
