"""30 — Incrementally-maintained OHLCV rollups + the streaming
continuous aggregate (no reference analog — the reference materializes
full rollups only; this is the hypertable continuous-aggregate layer
the Spark engine adds).

The rollup lives as MERGEABLE per-(symbol, day) state. The batch path
folds new ticks in by rewriting only the dirty day-partitions; the
streaming path maintains the same state exactly-once under
``foreachBatch`` via a versioned partition log (committed files are
never mutated), which makes time travel free.

Run: python examples/30_incremental_rollup.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from borsa_spark.operators.rollup import (  # noqa: E402
    merge_into_rollup,
    read_rollup,
    rollup_finalize,
    rollup_state,
    write_rollup,
)
from borsa_spark.session import get_spark  # noqa: E402
from borsa_spark.sources import load_table  # noqa: E402
from borsa_spark.streaming.rollup import RollupMaintainer  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("ex30_rollup")
    ev = load_table(spark, SF, "events")
    ticks = ev.select(
        F.col("event_type").alias("symbol"), "ts", "value",
        F.col("event_id").alias("seq"),
    )
    cutoff = F.lit("2024-01-25").cast("timestamp")

    # -- batch maintenance: dirty-partition-only rewrite ------------------
    with tempfile.TemporaryDirectory() as work:
        write_rollup(rollup_state(ticks.filter(F.col("ts") < cutoff)), work)
        dirty = merge_into_rollup(
            spark, work, ticks.filter(F.col("ts") >= cutoff)
        )
        print(f"batch merge rewrote {len(dirty)} dirty day-partitions")
        rollup_finalize(read_rollup(spark, work)).orderBy(
            F.desc("bucket_ts"), "symbol"
        ).show(5)

    # -- streaming maintenance: exactly-once version log ------------------
    rm = RollupMaintainer(spark, tempfile.mkdtemp())
    rm.build(ticks.filter(F.col("ts") < cutoff))
    late = ticks.filter(F.col("ts") >= cutoff)
    rm.process_batch(late.filter(F.col("seq") % 2 == 0), 0)
    rm.process_batch(late.filter(F.col("seq") % 2 == 1), 1)
    rm.process_batch(late.filter(F.col("seq") % 2 == 1), 1)  # replay: noop
    print("current head (after 2 committed micro-batches):")
    rm.finalized().orderBy(F.desc("bucket_ts"), "symbol").show(3)
    print("time travel to the base snapshot (batch -1):")
    rollup_finalize(rm.state_as_of(-1)).orderBy(
        F.desc("bucket_ts"), "symbol"
    ).show(3)
    print("CDC deltas for batch 1 (before/after images):")
    rm.changes_for(1).select(
        "change", "symbol", "bucket_ts",
        "before_n_bars", "after_n_bars",
        "before_close", "after_close",
    ).orderBy("bucket_ts", "symbol").show(5)
    print("compact:", rm.compact())

    spark.stop()


if __name__ == "__main__":
    main()
