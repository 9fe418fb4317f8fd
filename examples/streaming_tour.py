"""Streaming tour — the Spark-native analogs of reference examples
00 (tracing) and 17 (streaming) (/root/reference/borsa/examples/).

What the reference does with a tracing subscriber + an async tick loop,
Structured Streaming does with a StreamingQueryListener (observability)
and a supervised multi-provider stream (the stream_quotes facade):
plan -> assign symbols per provider -> fan-in -> monotonic gate ->
file sink, drained with availableNow triggers.

Run: python examples/streaming_tour.py
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from borsa_spark.router.stream import stream_quotes  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402
from borsa_spark.sources import load_table  # noqa: E402
from borsa_spark.sources.provider import Catalog, Source  # noqa: E402
from borsa_spark.streaming import (  # noqa: E402
    StreamInstrument,
    candle_stream,
)

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("streaming_tour")
    work = tempfile.mkdtemp(prefix="streaming_tour_")

    # 00_tracing analog: a StreamingQueryListener sees every lifecycle
    # event — the observability hook a tracing subscriber provides in the
    # reference. (The Spark UI / event log carries the same data.)
    from pyspark.sql.streaming import StreamingQueryListener

    events: list[str] = []

    class Tracer(StreamingQueryListener):
        def onQueryStarted(self, e):
            events.append(f"started {e.name or e.id}")

        def onQueryProgress(self, e):
            events.append(
                f"progress {e.progress.name or e.progress.id}: "
                f"{e.progress.numInputRows} rows"
            )

        def onQueryIdle(self, e):  # pragma: no cover - timing dependent
            pass

        def onQueryTerminated(self, e):
            events.append(f"terminated {e.id}")

    spark.streams.addListener(Tracer())

    # a tick feed derived from the driver's events table, materialized as
    # the stream source (one file = one replayable feed)
    ev = load_table(spark, SF, "events")
    ticks = ev.select(
        F.col("event_type").alias("symbol"),
        "ts",
        F.col("value").alias("price"),
        F.col("event_id").alias("seq"),
    )
    feed_path = os.path.join(work, "feed")
    ticks.repartition(1).write.parquet(feed_path)
    schema = ticks.schema

    def feed():
        return spark.readStream.schema(schema).parquet(feed_path)

    # 17_streaming: two providers, supervised assignment, monotonic gate
    cat = Catalog()
    cat.register(Source(name="p0", tables={"stream_quotes": feed}))
    cat.register(Source(name="p1", tables={"stream_quotes": feed}))

    symbols = [r[0] for r in ticks.select("symbol").distinct().collect()]
    handle = stream_quotes(
        spark,
        cat,
        [StreamInstrument(s) for s in symbols],
        sink_dir=os.path.join(work, "sink"),
    )
    print("== supervisors healthy:", handle.ok, "==")
    handle.process_available()
    out = handle.output()
    print("== gated tick stream (monotonic per symbol) ==")
    out.groupBy("symbol").agg(
        F.count("*").alias("n_ticks"),
        F.round(F.max("price"), 2).alias("max_price"),
    ).orderBy("symbol").show()

    print("== stream progress (reference: handle.recv loop telemetry) ==")
    for p in handle.progress()[:3]:
        print(
            f"  provider={p['provider']} batch={p['batch_id']} "
            f"rows={p['num_input_rows']} state={p['state']}"
        )
    handle.stop()

    # bars computed FROM ticks (candle_stream), availableNow drain
    bars = candle_stream(
        feed(), interval_seconds=3600, watermark="10 seconds"
    )
    q = (
        bars.writeStream.format("memory")
        .queryName("tour_bars")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(work, "ckpt_bars"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        raise RuntimeError("bar drain did not finish")
    print("== hourly bars from ticks (final bars only, append mode) ==")
    spark.table("tour_bars").orderBy("symbol", "ts").show(5)

    print("== tracing events seen ==")
    for e in events[:5]:
        print("  ", e)
    print(f"   ... {len(events)} total")

    spark.stop()


if __name__ == "__main__":
    main()
