"""27 — Streaming source-drift monitoring (no reference analog — the
continuous-ingest observability layer of the training-data pipeline).

Batches of the fixture corpus score low KL against each other; a
register flip (synthetic spam wave) trips the alert before the batch
would fold into corpus state.

Run: python examples/27_drift_monitor.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from borsa_spark.session import get_spark  # noqa: E402
from borsa_spark.sources import load_table  # noqa: E402
from borsa_spark.streaming.drift import DriftMonitor  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("ex27_drift")
    docs = load_table(spark, SF, "documents")
    mon = DriftMonitor(spark, tempfile.mkdtemp(), alert_kl=0.5)

    mon.process_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
    mon.process_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)
    spam = spark.createDataFrame(
        [(i, "buy cheap pills now limited offer click here") for i in range(50)],
        "doc_id long, text string",
    )
    mon.process_batch(spam, 2)

    for e in mon.drift_log():
        flag = "ALERT" if e["alert"] else "ok   "
        print(f"batch {e['batch']}: kl={e['kl']:.4f} [{flag}] "
              f"tokens={e['batch_tokens']} new_vocab={e['new_vocab']}")
    spark.stop()


if __name__ == "__main__":
    main()
