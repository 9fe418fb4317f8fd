"""robots.txt parsing + evaluation (functions/robots.py): every RFC
9309 rule the module docstring claims, pinned on handcrafted bodies —
group structure, group selection exclusivity, longest-match with the
allow tie-break, wildcard/anchor translation, and the default-allow
edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from borsa_spark.functions.robots import (
    _pattern_regex,
    parse_robots,
    robots_eval,
)

BODY_A = """# politeness file
User-agent: *
Disallow: /block/
Allow: /block/open/
Disallow: /tmp/*.bak$
Crawl-delay: 2

User-agent: borsa-bot
User-agent: other-bot
Disallow: /doc/
"""

BODY_B = """Disallow: /pregroup/
User-agent: *
Disallow:
Allow: /
"""


def _rules(spark):
    robots = spark.createDataFrame(
        [("a.example.org", BODY_A), ("b.example.org", BODY_B)],
        "host string, robots_txt string",
    )
    return parse_robots(robots)


def _verdicts(spark, rules, agent):
    urls = spark.createDataFrame(
        [
            (1, "https://a.example.org/block/x"),
            (2, "https://a.example.org/block/open/x"),
            (3, "https://a.example.org/doc/5"),
            (4, "https://a.example.org/tmp/a.bak"),
            (5, "https://a.example.org/tmp/a.bakx"),
            (6, "https://b.example.org/pregroup/z"),
            (7, "https://norobots.example.org/x"),
            (8, "https://a.example.org"),
        ],
        "doc_id long, url string",
    )
    out = robots_eval(urls, rules, agent).collect()
    return {r.doc_id: (r.allowed, r.decisive_rule) for r in out}


class TestParseRobots:
    def test_rules_relation(self, spark):
        rows = {
            (r.host, r.agent, r.directive, r.pattern): (
                r.pattern_regex, r.pattern_len
            )
            for r in _rules(spark).collect()
        }
        assert set(rows) == {
            ("a.example.org", "*", "disallow", "/block/"),
            ("a.example.org", "*", "allow", "/block/open/"),
            ("a.example.org", "*", "disallow", "/tmp/*.bak$"),
            # consecutive User-agent lines share ONE rule block
            ("a.example.org", "borsa-bot", "disallow", "/doc/"),
            ("a.example.org", "other-bot", "disallow", "/doc/"),
            # pre-group '/pregroup/' and the empty Disallow dropped
            ("b.example.org", "*", "allow", "/"),
        }
        # wildcard + anchor translate; specificity is octet length
        assert rows[("a.example.org", "*", "disallow", "/tmp/*.bak$")] \
            == (r"^/tmp/.*\.bak$", 11)
        assert rows[("a.example.org", "*", "allow", "/block/open/")][1] \
            == 12

    def test_regex_metas_stay_literal(self, spark):
        df = spark.createDataFrame(
            [("/a.b(c)+[d]{1}|e^f?g",), ("/x$y*z",)], "pattern string"
        )
        got = [
            r.rx for r in df.select(
                _pattern_regex(F.col("pattern")).alias("rx")
            ).collect()
        ]
        assert got[0] == r"^/a\.b\(c\)\+\[d\]\{1\}\|e\^f\?g"
        # inner '$' literal, only the trailing one anchors; '*' is the
        # one live wildcard
        assert got[1] == r"^/x\$y.*z"


class TestRobotsEval:
    def test_specific_group_excludes_star(self, spark):
        got = _verdicts(spark, _rules(spark), "Borsa-Bot")
        assert got[3] == (False, "/doc/")     # its own rule applies
        assert got[1] == (True, None)         # '*' rules do NOT
        assert got[4] == (True, None)
        assert got[2] == (True, None)

    def test_star_group_semantics(self, spark):
        got = _verdicts(spark, _rules(spark), "stranger")
        assert got[1] == (False, "/block/")
        # longest match wins the tie against the shorter disallow
        assert got[2] == (True, "/block/open/")
        assert got[3] == (True, None)
        # wildcard + '$' anchor: .bak blocked, .bakx escapes
        assert got[4] == (False, "/tmp/*.bak$")
        assert got[5] == (True, None)

    def test_default_allow_edges(self, spark):
        got = _verdicts(spark, _rules(spark), "stranger")
        # pre-group rule was ignored; Allow: / matches everything
        assert got[6] == (True, "/")
        # host with no robots at all
        assert got[7] == (True, None)
        # empty path evaluates as '/'
        assert got[8] == (True, None)

    def test_allow_disallow_equal_length_tie(self, spark):
        robots = spark.createDataFrame(
            [("t.example.org",
              "User-agent: *\nDisallow: /p/aa\nAllow: /p/ab\n")],
            "host string, robots_txt string",
        )
        urls = spark.createDataFrame(
            [(1, "https://t.example.org/p/ab/q")],
            "doc_id long, url string",
        )
        # both patterns are length 5 but only one MATCHES — sanity
        # that non-matching rules never join the argmax
        [r] = robots_eval(urls, parse_robots(robots), "x").collect()
        assert (r.allowed, r.decisive_rule) == (True, "/p/ab")

    def test_true_tie_prefers_allow(self, spark):
        robots = spark.createDataFrame(
            [("t.example.org",
              "User-agent: *\nDisallow: /p/*\nAllow: /p/a\n")],
            "host string, robots_txt string",
        )
        urls = spark.createDataFrame(
            [(1, "https://t.example.org/p/a")],
            "doc_id long, url string",
        )
        # '/p/*' and '/p/a' both match and both have length 4:
        # the least restrictive rule must win
        [r] = robots_eval(urls, parse_robots(robots), "x").collect()
        assert (r.allowed, r.decisive_rule) == (True, "/p/a")

    def test_query_string_is_part_of_the_match_target(self, spark):
        robots = spark.createDataFrame(
            [("t.example.org",
              "User-agent: *\nDisallow: /search?priv=1\n")],
            "host string, robots_txt string",
        )
        urls = spark.createDataFrame(
            [(1, "https://t.example.org/search?priv=1&x=2"),
             (2, "https://t.example.org/search")],
            "doc_id long, url string",
        )
        got = {
            r.doc_id: r.allowed
            for r in robots_eval(urls, parse_robots(robots),
                                 "x").collect()
        }
        assert got == {1: False, 2: True}


    def test_same_length_same_directive_tie_is_deterministic(
            self, spark):
        # two length-4 disallows both match: the verdict is forced,
        # and the reported decisive_rule must be stable across runs
        # (bytewise-max pattern breaks the tie)
        robots = spark.createDataFrame(
            [("t.example.org",
              "User-agent: *\nDisallow: /p/*\nDisallow: /p/a\n")],
            "host string, robots_txt string",
        )
        urls = spark.createDataFrame(
            [(1, "https://t.example.org/p/a")],
            "doc_id long, url string",
        )
        from borsa_spark.functions.robots import (parse_robots,
                                                  robots_eval)
        got = {
            (r.allowed, r.decisive_rule)
            for _ in range(3)
            for r in robots_eval(urls, parse_robots(robots),
                                 "x").collect()
        }
        assert got == {(False, "/p/a")}


class TestSitemaps:
    def test_pointer_extraction(self, spark):
        from borsa_spark.functions.robots import sitemap_pointers

        body = ("User-agent: *\nDisallow: /x\n"
                "Sitemap: https://h.example.org/a.xml\n"
                "  SITEMAP:\thttps://h.example.org/b.xml\n"
                "NotASitemap: https://h.example.org/c.xml\n")
        robots = spark.createDataFrame(
            [("h.example.org", body), ("empty.example.org", "")],
            "host string, robots_txt string",
        )
        got = {
            (r.host, r.sitemap_url)
            for r in sitemap_pointers(robots).collect()
        }
        assert got == {
            ("h.example.org", "https://h.example.org/a.xml"),
            ("h.example.org", "https://h.example.org/b.xml"),
        }

    def test_parse_kinds_and_entities(self, spark):
        from borsa_spark.functions.robots import parse_sitemap

        urlset = ('<?xml version="1.0"?><urlset>'
                  "<url><loc> https://h/p?a=1&amp;b=2 </loc></url>"
                  "<url><loc>https://h/&amp;lt;odd&amp;gt;</loc></url>"
                  "</urlset>")
        index = ("<sitemapindex><sitemap>"
                 "<loc>https://h/child.xml</loc>"
                 "</sitemap></sitemapindex>")
        df = spark.createDataFrame(
            [("h", urlset), ("h", index)],
            "host string, sitemap_xml string",
        )
        got = {(r.kind, r.loc) for r in parse_sitemap(df).collect()}
        assert got == {
            # whitespace trimmed, '&amp;' decoded
            ("urlset", "https://h/p?a=1&b=2"),
            # decode order: '&amp;lt;' is the FOUR characters '&lt;'
            # written safely — it must decode to '&lt;', never '<'
            ("urlset", "https://h/&lt;odd&gt;"),
            ("index", "https://h/child.xml"),
        }

    def test_malformed_xml_keeps_wellformed_locs(self, spark):
        from borsa_spark.functions.robots import parse_sitemap

        broken = ("<urlset><url><loc>https://h/ok</loc></url>"
                  "<url><loc>https://h/torn")  # truncated mid-element
        df = spark.createDataFrame(
            [("h", broken), ("h", None)],
            "host string, sitemap_xml string",
        )
        got = [r.loc for r in parse_sitemap(df).collect()]
        assert got == ["https://h/ok"]


class TestCrawlDelays:
    def test_group_scoped_delays(self, spark):
        from borsa_spark.functions.robots import crawl_delays

        body = ("User-agent: *\nDisallow: /x\nCrawl-delay: 10\n"
                "User-agent: fast-bot\nCrawl-delay: 1\n"
                "Crawl-delay: 3\n"          # several in one group: min
                "User-agent: bad-bot\nCrawl-delay: soon\n")  # non-numeric
        robots = spark.createDataFrame(
            [("h.example.org", body)], "host string, robots_txt string"
        )
        got = {
            (r.host, r.agent): r.crawl_delay_s
            for r in crawl_delays(robots).collect()
        }
        assert got == {
            ("h.example.org", "*"): 10.0,
            ("h.example.org", "fast-bot"): 1.0,
        }

    def test_delay_only_group_does_not_leak_into_prior_group(
            self, spark):
        # group ids are assigned over ALL group directives: UA:b after
        # a's crawl-delay starts a NEW group — a's delay must not
        # attach to b, and a's rules must not attach to b either
        from borsa_spark.functions.robots import (crawl_delays,
                                                  parse_robots)

        body = ("User-agent: a\nCrawl-delay: 2\n"
                "User-agent: b\nDisallow: /x\n")
        robots = spark.createDataFrame(
            [("h.example.org", body)], "host string, robots_txt string"
        )
        delays = {
            r.agent: r.crawl_delay_s
            for r in crawl_delays(robots).collect()
        }
        assert delays == {"a": 2.0}
        rules = {(r.agent, r.pattern)
                 for r in parse_robots(robots).collect()}
        assert rules == {("b", "/x")}

    def test_same_agent_groups_merge_minwise(self, spark):
        from borsa_spark.functions.robots import crawl_delays

        body = ("User-agent: a\nCrawl-delay: 5\n"
                "User-agent: z\nDisallow: /q\n"
                "User-agent: a\nCrawl-delay: 2\n")
        robots = spark.createDataFrame(
            [("h.example.org", body)], "host string, robots_txt string"
        )
        delays = {
            r.agent: r.crawl_delay_s
            for r in crawl_delays(robots).collect()
        }
        assert delays == {"a": 2.0}


class TestWarcRobots:
    def test_bridge_gates_and_decode(self, spark, tmp_path):
        from borsa_spark.functions.robots import parse_robots, warc_robots
        from borsa_spark.sources import warc as W

        def _resp_record(url, body, status=200, ctype="text/plain"):
            return W.warc_record(
                "response",
                {"WARC-Target-URI": url,
                 "Content-Type": "application/http; msgtype=response"},
                W.http_response(status, "X", {"Content-Type": ctype},
                                body),
            )

        recs = [
            _resp_record("https://A.Example.ORG/robots.txt",
                         b"User-agent: *\nDisallow: /priv/\n",
                         ctype="text/plain"),
            # content-type deliberately NOT gated
            _resp_record("https://b.example.org/robots.txt",
                         b"User-agent: *\nAllow: /\n",
                         ctype="application/octet-stream"),
            # 404 capture = crawl-anything: must NOT produce a row
            _resp_record("https://c.example.org/robots.txt",
                         b"User-agent: *\nDisallow: /\n", status=404),
            # not the robots path
            _resp_record("https://a.example.org/robots.txt.bak",
                         b"User-agent: *\nDisallow: /\n"),
            # malformed UTF-8 degrades, never raises
            _resp_record("https://d.example.org/robots.txt",
                         b"User-agent: *\nDisallow: /\xff\xfe/\n"),
        ]
        p = tmp_path / "robots.warc.gz"
        p.write_bytes(b"".join(W.gzip_member(r) for r in recs))
        bridged = warc_robots(W.read_warc(spark, str(tmp_path)))
        got = {r.host: r.robots_txt for r in bridged.collect()}
        assert set(got) == {"a.example.org", "b.example.org",
                            "d.example.org"}
        assert "�" in got["d.example.org"]  # lenient decode
        rules = {(r.host, r.pattern)
                 for r in parse_robots(bridged).collect()}
        assert ("a.example.org", "/priv/") in rules
