"""17 — Streaming: start a supervised quote stream, consume ~20 updates,
stop gracefully (reference: borsa/examples/17_streaming.rs).

The reference's DynamicMockConnector scripts 20 QuoteUpdates; the stream
handle is stopped after ~5 s. Here the live feed is Spark's rate source
shaped into quote updates (deterministic prices), routed through the
full facade: planner -> supervisor -> allow-set filter -> monotonic gate
-> parquet sink fan-in. `StreamHandle.stop()` is the graceful-shutdown
path (T10).

Run: python examples/17_streaming.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from borsa_spark.router.stream import stream_quotes  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402
from borsa_spark.sources.formats import rate_quote_stream  # noqa: E402
from borsa_spark.sources.provider import Catalog, Source  # noqa: E402
from borsa_spark.streaming import StreamInstrument  # noqa: E402


def main() -> None:
    spark = get_spark("ex17_streaming")
    symbol = "AAPL"

    cat = Catalog().register(
        Source(
            name="live",
            tables={
                "stream_quotes": lambda: rate_quote_stream(
                    spark, [symbol, "MSFT"], rows_per_second=20
                )
            },
        )
    )

    print(f"Starting stream for {symbol}... (until 20 updates or ~30s)")
    with tempfile.TemporaryDirectory(prefix="ex17_") as sink:
        handle = stream_quotes(
            spark, cat, [StreamInstrument(symbol)],
            sink_dir=os.path.join(sink, "out"),
            trigger_available_now=False,  # continuous micro-batches
        )
        try:
            deadline = time.time() + 30
            seen = 0
            while time.time() < deadline and seen < 20:
                try:
                    rows = handle.output().orderBy("seq").collect()
                except Exception:  # sink not yet materialized
                    rows = []
                for r in rows[seen:]:
                    print(f"update: symbol={r.symbol} price={r.price} "
                          f"seq={r.seq}")
                seen = len(rows)
                time.sleep(0.5)
            print(f"received {seen} updates")
        finally:
            handle.stop()
            print("stream stopped")
    spark.stop()


if __name__ == "__main__":
    main()
