"""28 — Stream-stream enrichment: join the live tick stream to the live
bar stream (no reference analog — borsa streams quotes and candles as
separate subscriptions; this is the Spark-native way to correlate them).

Two file streams play a tick feed and a bar feed; the watermarked
interval join stamps each tick with its containing minute bar and
whether it printed above the bar's open. The interval predicate is what
bounds the symmetric join state — without it the join would be
inadmissible in append mode.

Run: python examples/28_stream_enrich.py
"""

from __future__ import annotations

import datetime as dt
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from borsa_spark.session import get_spark  # noqa: E402
from borsa_spark.streaming.enrich import enrich_ticks_with_bars  # noqa: E402

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(sec: int) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


def main() -> None:
    spark = get_spark("ex28_stream_enrich")
    with tempfile.TemporaryDirectory() as work:
        ticks = spark.createDataFrame(
            [
                ("AAPL", _ts(5), 10.5),
                ("AAPL", _ts(65), 11.0),
                ("AAPL", _ts(119), 9.0),
                ("MSFT", _ts(10), 20.0),
            ],
            "symbol string, ts timestamp, price double",
        )
        bars = spark.createDataFrame(
            [
                ("AAPL", _ts(0), 10.0),
                ("AAPL", _ts(60), 10.0),
                ("MSFT", _ts(0), 25.0),
            ],
            "symbol string, bar_ts timestamp, open double",
        )
        ticks.write.parquet(f"{work}/ticks")
        bars.write.parquet(f"{work}/bars")

        st = spark.readStream.schema(ticks.schema).parquet(f"{work}/ticks")
        sb = spark.readStream.schema(bars.schema).parquet(f"{work}/bars")
        enriched = enrich_ticks_with_bars(st, sb, interval_seconds=60)

        q = (
            enriched.writeStream.format("memory")
            .queryName("enriched")
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        print("== ticks stamped with their live bar ==")
        spark.table("enriched").orderBy("symbol", "ts").show()

        # Update-mode variant (round 6): the delivered-updates client
        # shape — partial bars upserted per batch, ticks stamped against
        # the latest (possibly still-open) bar instead of waiting out
        # the watermark.
        from borsa_spark.streaming.enrich import PartialBarEnricher

        bar_schema = (
            "symbol string, ts timestamp, window_end timestamp, "
            "open double, high double, low double, close double, "
            "n_ticks long, interval string, is_final boolean"
        )
        enr = PartialBarEnricher(spark, interval_seconds=60)
        enr.upsert(spark.createDataFrame(
            [("AAPL", _ts(60), _ts(120), 10.8, 11.0, 10.8, 11.0, 2,
              "60s", False)],
            bar_schema,
        ))
        live = spark.createDataFrame(
            [("AAPL", _ts(65), 11.0), ("AAPL", _ts(119), 9.0)],
            "symbol string, ts timestamp, price double",
        )
        print("== same ticks stamped against the PARTIAL bar ==")
        enr.enrich(live).orderBy("ts").show()
    spark.stop()


if __name__ == "__main__":
    main()
