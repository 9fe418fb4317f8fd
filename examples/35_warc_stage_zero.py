"""35 — WARC ingestion: crawl stage ZERO (round 11): from Common-Crawl
layout bytes to a scored corpus, plus the two other round-11 operators.

    1. Encode a synthetic crawl into real .warc.gz files (one gzip
       member per record — the seekable Common Crawl layout), read
       them back through the `warc` Data Source's record walk, apply
       the response/2xx/text-html gates, and extract text (f96/f84).
    2. The minhash exact-dedup pre-pass (collapse_exact=True): the
       boilerplate cohort folds ONCE instead of once per copy, output
       provably identical to the uncollapsed run.
    3. Residual-coded IVFPQ (f97, Jegou §IV-A): codes quantize
       x - coarse_centroid; per-probe query tables cancel the offset.

Run: python examples/35_warc_stage_zero.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from borsa_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from pyspark.sql import functions as F

    from borsa_spark.functions import dedup as dd
    from borsa_spark.functions.html import extract_html
    from borsa_spark.queries import _f95_fixture, _f96_records
    from borsa_spark.sources import load_table
    from borsa_spark.sources import warc as W

    spark = get_spark("example-35")

    # -- 1. WARC round trip: encode -> gzip members -> walk -> text --
    ids = load_table(spark, SF, "documents").select("doc_id").withColumn(
        "__file", F.col("doc_id") % 4
    )
    with tempfile.TemporaryDirectory() as work:
        summary = W.write_warc_files(ids, work, _f96_records,
                                     "__file", "doc_id")
        print("== WARC files written (one gzip member per record) ==")
        summary.show(truncate=False)
        rec = W.read_warc(spark, work)
        print("== record mix (request/warcinfo/response, statuses) ==")
        rec.groupBy("warc_type", "http_status").count().orderBy(
            "warc_type", "http_status"
        ).show()
        docs = W.warc_html_docs(rec)
        ext = extract_html(F.col("html"))
        out = docs.select(
            "url", ext["extracted"].alias("text"),
            ext["kept_blocks"].alias("kept_blocks"),
        )
        print("== extracted corpus (chrome dropped, content kept) ==")
        out.orderBy("url").show(3, truncate=60)
        n = out.count()
        print(f"    {n} docs survived the type/status/content gates\n")

    # -- 2. exact-dedup pre-pass: identical output, one fold per text --
    fixture = _f95_fixture(spark, SF)
    base = dd.minhash_dedup_pairs(fixture, 3, 0.5, collapse_exact=False)
    coll = dd.minhash_dedup_pairs(fixture, 3, 0.5, collapse_exact=True)
    a = {tuple(r) for r in base.collect()}
    b = {tuple(r) for r in coll.collect()}
    n_reps = fixture.select(F.md5("text")).distinct().count()
    print("== minhash exact-dedup pre-pass ==")
    print(f"    docs: {fixture.count()}, distinct texts (fold inputs "
          f"under collapse): {n_reps}")
    print(f"    pairs identical: {a == b} ({len(a)} pairs)\n")

    # -- 3. residual IVFPQ --------------------------------------------
    from borsa_spark.functions.pq import (
        ivfpq_residual_topk,
        pq_codebooks_seed_residual,
    )

    emb = load_table(spark, SF, "embeddings")
    coarse = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
    )
    books = pq_codebooks_seed_residual(emb, coarse, m=4, k=8, min_id=8)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    print("== residual IVFPQ top-3 per query (f97) ==")
    ivfpq_residual_topk(
        emb, q, coarse, books, m=4, k_top=3, n_probe=2
    ).orderBy("q_id", "rank").show()

    spark.stop()


if __name__ == "__main__":
    main()
