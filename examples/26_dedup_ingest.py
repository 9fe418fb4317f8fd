"""26 — Continuous training-data ingestion: streaming dedup admission
(no reference analog — this is the LLM-pipeline layer the Spark engine
adds on top of borsa's market-data surface).

Documents arrive in micro-batches; each batch is screened (intra-batch
exact dedup, exact-vs-corpus, MinHash near-dup vs the corpus's STORED
band keys) and only survivors join the corpus state. Batch replays are
idempotent (per-batch state dirs + commit markers).

Run: python examples/26_dedup_ingest.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from borsa_spark.session import get_spark  # noqa: E402
from borsa_spark.sources import load_table  # noqa: E402
from borsa_spark.streaming.ingest import DedupIngest  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("ex26_ingest")
    docs = load_table(spark, SF, "documents")

    ing = DedupIngest(spark, tempfile.mkdtemp(), threshold=0.5)
    # Two crawl waves over the real corpus; the second contains near-dups
    # of the first (this fixture corpus has organic near-duplicates).
    ing.process_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
    ing.process_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)

    for entry in ing.admission_log():
        print(f"batch {entry['batch']}: received {entry['received']}, "
              f"admitted {entry['admitted']}, rejected {entry['rejected']}")
    print(f"corpus state: {ing.corpus_arrays().count()} documents")
    spark.stop()


if __name__ == "__main__":
    main()
