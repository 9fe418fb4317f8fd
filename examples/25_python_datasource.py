"""25 — First-class Spark mounts for the provider layer: the PySpark 4
Python Data Source formats (no reference analog — borsa-yfinance mounts
through an async client; the Spark-native form is a registered source).

Shows all three formats from sources/datasource.py:
- batch:  spark.read.format("borsa_history")         (per-symbol partitions)
- stream: spark.readStream.format("borsa_quote_stream") (replayable offsets,
          websocket->polling fallback recorded in the offset JSON)
- sink:   .writeStream.format("borsa_tick_sink")     (two-phase commit +
          manifest; only manifested parts are readable)

Run: python examples/25_python_datasource.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from borsa_spark.session import get_spark  # noqa: E402
from borsa_spark.sources.datasource import (  # noqa: E402
    read_tick_sink,
    register_datasources,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
SYMS = "click,view,purchase,signup,error"


def main() -> None:
    spark = get_spark("ex25_datasource")
    register_datasources(spark)

    # Batch mount: one InputPartition per symbol, Arrow-batch reads.
    hist = (
        spark.read.format("borsa_history")
        .option("path", SF)
        .option("symbols", SYMS)
        .load()
    )
    print(f"batch: {hist.count()} ticks over "
          f"{hist.rdd.getNumPartitions()} per-symbol partitions")
    hist.show(3)

    # Stream mount -> transactional sink, drained to completion.
    out = tempfile.mkdtemp()
    q = (
        spark.readStream.format("borsa_quote_stream")
        .option("path", SF)
        .option("symbols", SYMS)
        .option("batch_rows", "400")
        .load()
        .writeStream.format("borsa_tick_sink")
        .option("path", out)
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(processingTime="0 seconds")
        .start()
    )
    total = hist.count()
    deadline = time.time() + 90
    while time.time() < deadline and read_tick_sink(spark, out).count() < total:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    print(f"stream->sink: {read_tick_sink(spark, out).count()} manifested rows")
    spark.stop()


if __name__ == "__main__":
    main()
