"""36 — the compliant crawl frontier + the columnar index (round 13).

    1. robots.txt captures land as WARC bytes; `warc_robots` bridges
       them to (host, robots_txt), `parse_robots`/`crawl_delays`/
       `sitemap_pointers` turn those into the rules, politeness, and
       discovery relations (RFC 9309 + sitemaps.org).
    2. `parse_sitemap` walks robots pointer → sitemapindex → urlset;
       `robots_eval` verdicts every discovered URL for our agent —
       the robots-filtered frontier.
    3. A CDX index over the same crawl persists as a SURT-sorted
       columnar index (`write_cdx_index`); a host-scoped
       `lookup_cdx` + `fetch_records` point-reads one host's pages
       without scanning the crawl (the cc-index-table shape).

Run: python examples/36_crawl_frontier.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from borsa_spark.session import get_spark  # noqa: E402

AGENT = "borsa-bot"


def main() -> None:
    from pyspark.sql import functions as F

    from borsa_spark.functions import robots as R
    from borsa_spark.sources import warc as W

    spark = get_spark("example-36")

    # --- a tiny synthetic crawl: robots captures + pages, as WARC ---
    hosts = [f"site{i}.example.org" for i in range(4)]

    def robots_body(i: int) -> bytes:
        body = ("User-agent: *\nDisallow: /private/\n"
                "Crawl-delay: 5\n"
                f"Sitemap: https://{hosts[i]}/sitemap.xml\n")
        if i % 2 == 0:  # even hosts give our agent its own group
            body += f"User-agent: {AGENT}\nDisallow: /draft/\n"
        return body.encode()

    def rec(url: str, body: bytes, ctype: str = "text/html") -> bytes:
        return W.warc_record(
            "response",
            {"WARC-Target-URI": url,
             "Content-Type": "application/http; msgtype=response"},
            W.http_response(200, "OK", {"Content-Type": ctype}, body),
        )

    pages = [
        (f"https://{h}/{kind}/p{n}",
         f"<html><body>{h} {kind} {n}</body></html>".encode())
        for h in hosts
        for kind in ("public", "private", "draft")
        for n in range(2)
    ]
    sitemaps = {
        h: ("<urlset>" + "".join(
            f"<url><loc>https://{h}/{kind}/p{n}</loc></url>"
            for kind in ("public", "private", "draft")
            for n in range(2)
        ) + "</urlset>").encode()
        for h in hosts
    }
    work = tempfile.mkdtemp(prefix="ex36_")
    blob = b"".join(
        [W.gzip_member(rec(f"https://{h}/robots.txt", robots_body(i),
                           "text/plain"))
         for i, h in enumerate(hosts)]
        + [W.gzip_member(rec(u, b)) for u, b in pages]
    )
    with open(os.path.join(work, "crawl.warc.gz"), "wb") as f:
        f.write(blob)

    records = W.read_warc(spark, work)

    # --- 1. robots relations from bytes ---
    robots = R.warc_robots(records)
    rules = R.parse_robots(robots)
    print("== rules ==")
    rules.orderBy("host", "agent", "pattern").show(truncate=False)
    print("== crawl delays ==")
    R.crawl_delays(robots).orderBy("host", "agent").show()

    # --- 2. sitemap walk + robots verdicts = the frontier ---
    sm_bodies = spark.createDataFrame(
        [(f"https://{h}/sitemap.xml", h, x.decode())
         for h, x in sitemaps.items()],
        "sitemap_url string, host string, sitemap_xml string",
    )
    discovered = R.parse_sitemap(
        R.sitemap_pointers(robots).select("sitemap_url")
        .join(sm_bodies, "sitemap_url")
    ).filter(F.col("kind") == "urlset").select(F.col("loc").alias("url"))
    frontier = R.robots_eval(discovered, rules, AGENT)
    print("== frontier verdicts (even hosts: own group; odd: '*') ==")
    frontier.orderBy("url").show(30, truncate=False)

    # --- 3. columnar index: host lookup without scanning the crawl ---
    idx_dir = tempfile.mkdtemp(prefix="ex36_cdx_")
    W.write_cdx_index(W.warc_cdx(spark, work), idx_dir, index_files=2)
    hit = W.lookup_cdx(W.read_cdx_index(spark, idx_dir),
                       "org,example,site1)")
    print("== site1 via the SURT index (pushed prefix lookup) ==")
    fetched = W.fetch_records(hit)
    fetched.select("target_uri", "http_status",
                   F.length("body").alias("bytes")).show(truncate=False)


if __name__ == "__main__":
    main()
