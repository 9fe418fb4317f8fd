"""32 — End-to-end crawl corpus prep: raw HTML to a deduplicated,
language-tagged training corpus in ONE fused DAG (the c11 query's
composition; no reference analog — the LLM-pipeline layer the Spark
engine adds on top of borsa's market-data surface).

Stage chain, each from its own oracled operator:

    f84 HTML extraction  -> f71 canonical-URL dedup ->
    f86 C4 line/page cleaning -> f53 blocklist density ->
    f1 exact doc dedup -> cross-doc paragraph rewrite (round 9) ->
    f85 trained char-bigram language ID

The corpus parquet is scanned ONCE: extraction and cleaning fuse into
the scan as JVM projections, the relation persists before the first
multi-consumer stage, and every dedup group-by and NB model pass reads
the cache (plan-guarded: tests/test_plan_shapes.py
`test_c11_crawl_dag_single_corpus_scan`).

Run: python examples/32_corpus_prep_e2e.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from borsa_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from borsa_spark.functions.langid import charngram_nb_langid
    from borsa_spark.queries import _c11_stages, c11_stage_counts

    spark = get_spark("ex32_corpus_prep")

    # per-stage admission accounting — every stage is load-bearing on
    # this fixture (tracking-param URLs, lorem pages, blocklist lines,
    # planted content copies, shared boilerplate paragraphs)
    counts = c11_stage_counts(spark, SF)
    order = ["fixture", "extracted", "url_deduped", "line_filtered",
             "blocklisted", "exact_deduped", "para_deduped"]
    print("admission funnel:")
    prev = None
    for stage in order:
        n = counts[stage]
        delta = "" if prev is None else f"  ({n - prev:+d})"
        print(f"  {stage:>14}: {n}{delta}")
        prev = n
    print(f"  boilerplate paragraph cut from {counts['boilerplate_cut']} "
          "docs (kept once, corpus-wide)")

    # trained language ID over the survivors (80% md5-bucket train split)
    s = _c11_stages(spark, SF)
    bkt = s["hash_bucket"](F.col("doc_id"), "c11", 10)
    tagged = charngram_nb_langid(s["para_deduped"], train=bkt < 8)
    holdout = tagged.filter(
        s["hash_bucket"](F.col("doc_id"), "c11", 10) >= 8
    )
    acc = holdout.select(
        F.avg((F.col("lang") == F.col("pred")).cast("double")).alias("a")
    ).first().a
    print(f"langid holdout: {holdout.count()} docs, accuracy {acc:.3f}")
    holdout.groupBy("pred").count().orderBy("pred").show()

    s["extracted"].unpersist()
    s["para_deduped"].unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
