"""URL canonicalization contract: every rule of the urls.py module
docstring pinned on handcrafted spellings, plus idempotence and the
dedup grouping/quarantine behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from borsa_spark.functions.urls import canonicalize_url, url_dedup_groups

CASES = [
    # clean URL is untouched
    ("https://site3.example.com/p/5?a=1&b=2",
     "https://site3.example.com/p/5?a=1&b=2"),
    # scheme/host case-fold + param sort
    ("HTTPS://Site3.EXAMPLE.com/p/5?b=2&a=1",
     "https://site3.example.com/p/5?a=1&b=2"),
    # default port + trailing slash + fragment all stripped
    ("https://site3.example.com:443/p/5/?a=1&b=2#frag",
     "https://site3.example.com/p/5?a=1&b=2"),
    ("http://site3.example.com:80/p/5",
     "http://site3.example.com/p/5"),
    # tracking params dropped (name is case-insensitive)
    ("https://site3.example.com/p/5?utm_source=news&a=1&gclid=g9&b=2",
     "https://site3.example.com/p/5?a=1&b=2"),
    ("https://site3.example.com/p/5?UTM_Source=news",
     "https://site3.example.com/p/5"),
    # non-default port and scheme are preserved — never over-merge
    ("http://site3.example.com:8080/p/5?a=1&b=2",
     "http://site3.example.com:8080/p/5?a=1&b=2"),
    ("ftp://files.example.com:21/pub/", "ftp://files.example.com:21/pub"),
    # root path collapses to bare origin
    ("https://site3.example.com/", "https://site3.example.com"),
    # userinfo never reaches the canonical key
    ("https://user:pw@site3.example.com/p/5",
     "https://site3.example.com/p/5"),
    # empty params dropped; '=' in values survives sorting bytewise
    ("https://h.example.com/x?&&b=2&a=c=d",
     "https://h.example.com/x?a=c=d&b=2"),
    # www is NOT stripped (distinct resources)
    ("https://www.site3.example.com/p/5",
     "https://www.site3.example.com/p/5"),
    # unparseable / null quarantine to NULL
    ("not a url", None),
    (None, None),
]


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.c
        for r in df.select(
            canonicalize_url(F.col("url")).alias("c")
        ).collect()
    ]


class TestCanonicalizeUrl:
    def test_contract_cases(self, spark):
        got = _canon(spark, [u for u, _ in CASES])
        want = [w for _, w in CASES]
        assert got == want

    def test_idempotent(self, spark):
        """canonicalize(canonicalize(u)) == canonicalize(u): canonical
        spellings are fixed points, so re-running a dedup pass over
        already-canonical keys is a no-op."""
        first = [c for c in _canon(spark, [u for u, _ in CASES])
                 if c is not None]
        assert _canon(spark, first) == first


class TestUrlDedupGroups:
    def test_groups_and_quarantine(self, spark):
        rows = [
            (1, "https://a.example.com/x?b=2&a=1"),
            (2, "HTTPS://A.Example.com/x/?a=1&b=2#f"),
            (3, "https://a.example.com/x?a=1&b=2&utm_source=s"),
            (4, "https://a.example.com/x"),   # different (no query)
            (5, "junk ://"),                  # quarantined
            (6, None),                        # quarantined
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out = {
            r.canonical_url: (r.n_docs, r.keeper)
            for r in url_dedup_groups(df).collect()
        }
        assert out == {
            "https://a.example.com/x?a=1&b=2": (3, 1),
            "https://a.example.com/x": (1, 4),
        }


@pytest.mark.parametrize("bad", ["", "   ", "http://", "//nohost/path"])
def test_hostless_is_null(spark, bad):
    assert _canon(spark, [bad]) == [None]


class TestTrackingParamPolicy:
    """ADVICE r8: bare 'ref' is content-significant on many hosts
    (branch/revision selectors) — the conservative default keeps it;
    callers widen via tracking_params."""

    def test_ref_param_preserved_by_default(self, spark):
        got = _canon(spark, ["https://code.example.com/r/repo?ref=main"])
        assert got == ["https://code.example.com/r/repo?ref=main"]

    def test_caller_supplied_list_can_strip_ref(self, spark):
        from borsa_spark.functions.urls import TRACKING_PARAMS

        df = spark.createDataFrame(
            [("https://h.example.com/x?ref=abc&a=1",)], "url string"
        )
        got = [
            r.c
            for r in df.select(
                canonicalize_url(
                    F.col("url"), TRACKING_PARAMS + ("ref",)
                ).alias("c")
            ).collect()
        ]
        assert got == ["https://h.example.com/x?a=1"]

    def test_default_list_has_no_ref(self):
        from borsa_spark.functions.urls import TRACKING_PARAMS

        assert "ref" not in TRACKING_PARAMS


SURT_CASES = [
    # the canonical example: scheme dropped, host reversed, lowercased
    ("https://Example.ORG/Doc/5", "org,example)/doc/5"),
    # www / www<digits> stripped when >= 2 labels remain
    ("https://www.example.org/p", "org,example)/p"),
    ("http://www2.example.org/p", "org,example)/p"),
    # ... but NOT when stripping would eat the registrable domain
    ("https://www.com/x", "com,www)/x"),
    # default ports dropped per scheme, others kept after the host
    ("https://example.org:443/p", "org,example)/p"),
    ("http://example.org:80/p", "org,example)/p"),
    ("https://example.org:8080/p", "org,example:8080)/p"),
    # fragment dropped; trailing-slash runs stripped; query sorted
    # bytewise with duplicates kept
    ("https://example.org/a/b/?b=2&a=1#frag", "org,example)/a/b?a=1&b=2"),
    ("https://example.org/x?b=2&a=1&b=1", "org,example)/x?a=1&b=1&b=2"),
    # userinfo never reaches the key
    ("https://u:pw@example.org/p", "org,example)/p"),
    # root collapses to host)
    ("https://example.org/", "org,example)"),
    # unparseable quarantines to NULL
    ("not a url", None),
    (None, None),
]


class TestSurtKey:
    def test_contract_cases(self, spark):
        from borsa_spark.functions.urls import surt_key

        df = spark.createDataFrame(
            [(u,) for u, _ in SURT_CASES], "url string"
        )
        got = [
            r.s for r in df.select(surt_key(F.col("url")).alias("s"))
            .collect()
        ]
        assert got == [want for _, want in SURT_CASES]

    def test_spelling_variants_share_one_key(self, spark):
        # the merge the index exists for: every crawl spelling of one
        # resource sorts to the same key
        from borsa_spark.functions.urls import surt_key

        spellings = [
            "https://www.site.example.org/doc/1?b=2&a=1",
            "HTTPS://Site.Example.ORG:443/doc/1/?a=1&b=2#top",
            "https://site.example.org/doc/1?b=2&a=1",
        ]
        df = spark.createDataFrame([(u,) for u in spellings],
                                   "url string")
        keys = {
            r.s for r in df.select(surt_key(F.col("url")).alias("s"))
            .collect()
        }
        assert keys == {"org,example,site)/doc/1?a=1&b=2"}

    def test_host_prefix_covers_subdomains(self, spark):
        # reversed labels make domain scope a bytewise prefix — the
        # property write_cdx_index's range layout builds on
        from borsa_spark.functions.urls import surt_key

        urls = [
            "https://example.org/",
            "https://a.example.org/x",
            "https://b.a.example.org/y",
            "https://other.org/z",
            # the documented over-match: a BARE host prefix (no
            # ')'/','/':' terminator) also catches sibling hosts that
            # merely extend the label — lookup_cdx's docstring warns
            # exactly this, so pin it as intended behavior
            "https://example-other.org/w",
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        keys = [
            r.s for r in df.select(surt_key(F.col("url")).alias("s"))
            .collect()
        ]
        assert [k.startswith("org,example") for k in keys] == [
            True, True, True, False, True
        ]
        # subdomain scope = 'org,example,' prefix (host itself uses ')')
        assert [k.startswith("org,example,") for k in keys] == [
            False, True, True, False, False
        ]
        # exact-host scope = 'org,example)' — no siblings, no subdomains
        assert [k.startswith("org,example)") for k in keys] == [
            True, False, False, False, False
        ]


class TestSurtReviewCatches:
    """Round-13 in-round review findings on surt_key, pinned."""

    def test_fqdn_trailing_dot_stays_in_host_range(self, spark):
        # 'example.org.' is the same host; an unstripped empty label
        # would reverse into a LEADING comma and escape the host's
        # prefix range
        from borsa_spark.functions.urls import surt_key

        df = spark.createDataFrame(
            [("https://example.org./p",), ("https://example.org/p",)],
            "url string",
        )
        keys = {
            r.s for r in df.select(surt_key(F.col("url")).alias("s"))
            .collect()
        }
        assert keys == {"org,example)/p"}

    def test_zero_padded_ports_normalize(self, spark):
        from borsa_spark.functions.urls import surt_key

        df = spark.createDataFrame(
            [("https://example.org:007/p",),
             ("https://example.org:7/p",),
             ("https://example.org:0443/p",)],
            "url string",
        )
        keys = [
            r.s for r in df.select(surt_key(F.col("url")).alias("s"))
            .collect()
        ]
        assert keys[0] == keys[1] == "org,example:7)/p"
        # zero-padded DEFAULT port is recognized as default
        assert keys[2] == "org,example)/p"

    def test_ipv6_hosts_key_stably(self, spark):
        from borsa_spark.functions.urls import surt_key

        df = spark.createDataFrame(
            [("http://[2001:db8::1]:8080/x",),
             ("http://[2001:db8::1]:80/x",)],
            "url string",
        )
        keys = [
            r.s for r in df.select(surt_key(F.col("url")).alias("s"))
            .collect()
        ]
        assert keys[0] == "[2001:db8::1]:8080)/x"
        assert keys[1] == "[2001:db8::1])/x"  # default port dropped
