"""31 — Crawl stage zero: raw HTML to deduplicated, language-tagged text
(no reference analog — the LLM-pipeline layer the Spark engine adds on
top of borsa's market-data surface).

The round-7/8 crawl family end to end, everything JVM-side until the
model scores: HTML boilerplate extraction (f84) -> canonical-URL dedup
(f71) -> trained char-bigram language ID (f85) -> quality gate. The
fixture wraps each document's text in messy HTML (script/style junk, a
link-dominated nav, a short footer) exactly like the f84 oracle gate.

Run: python examples/31_crawl_stage_zero.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from borsa_spark.functions.html import html_extract_docs  # noqa: E402
from borsa_spark.functions.langid import (  # noqa: E402
    charngram_nb_langid,
    langid_fixture_spark_sql,
)
from borsa_spark.functions.text import hash_bucket, quality_score  # noqa: E402
from borsa_spark.functions.urls import canonicalize_url  # noqa: E402
from borsa_spark.session import get_spark  # noqa: E402
from borsa_spark.sources import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("ex31_crawl")

    # 1. a "crawl": per-language text (the f85 fixture) wrapped in messy
    # HTML with boilerplate chrome, fetched under tracking-decorated URLs
    docs = load_table(spark, SF, "documents").selectExpr(
        "doc_id", *langid_fixture_spark_sql()
    )
    crawl = docs.select(
        "doc_id", "lang",
        F.concat(
            F.lit("<html><head><script>junk()</script></head><body>"
                  '<div><a href="/">home</a> <a href="/a">about us and '
                  "other navigation links</a></div><p>"),
            F.col("text"),
            F.lit("</p><div>(c) 2026</div></body></html>"),
        ).alias("html"),
        F.concat(
            F.lit("HTTPS://Crawl.example.com/doc/"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit("?utm_source=feed&gclid=g"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )

    # 2. boilerplate removal at scan speed (zero shuffle)
    extracted = html_extract_docs(crawl).join(
        crawl.select("doc_id", "lang", "url"), "doc_id"
    )
    print("extraction:", extracted.filter(F.col("kept_blocks") > 0).count(),
          "of", extracted.count(), "docs kept a content block")

    # 3. URL dedup: tracking params stripped, case folded -> refetches
    # of the same resource collapse to one canonical key
    survivors = (
        extracted.withColumn("canon", canonicalize_url(F.col("url")))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("canon").orderBy("doc_id")
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    print("url dedup:", extracted.count(), "->", survivors.count(),
          "canonical pages")

    # 4. trained language ID on the extracted text (80% md5 train split)
    tagged = charngram_nb_langid(
        survivors.select("doc_id", "lang",
                         F.col("extracted").alias("text")),
        train=hash_bucket(F.col("doc_id"), "ex31", 10) < 8,
    )
    acc = tagged.select(
        F.avg((F.col("lang") == F.col("pred")).cast("double")).alias("a")
    ).first().a
    print(f"langid: {tagged.count()} docs tagged, accuracy {acc:.3f}")
    tagged.groupBy("pred").count().orderBy("pred").show()

    # 5. quality gate on the extracted text
    scored = survivors.select(
        "doc_id", quality_score(F.col("extracted")).alias("q")
    )
    print("quality: mean", round(scored.agg(F.avg("q")).first()[0], 4))
    spark.stop()


if __name__ == "__main__":
    main()
