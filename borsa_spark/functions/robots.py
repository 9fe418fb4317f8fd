"""robots.txt parsing + URL filtering (RFC 9309) for crawl pipelines.

A training-data pipeline that ingests crawls must be able to answer
"which of these URLs does the site's robots.txt allow for my agent?" —
for recrawl politeness, for opt-out compliance audits, and for
filtering corpora against CURRENT robots rules (Common Crawl publishes
per-crawl robots.txt captures as their own WARC set for exactly these
uses). This module turns robots.txt bodies into a rules relation and
evaluates URL sets against it, entirely with JVM expressions — line
structure via one per-host window, wildcard rules via regex columns,
evaluation via one host-keyed equi-join.

Spec facts the implementation follows (RFC 9309, public):

- A robots.txt is line-based: ``User-agent``, ``Allow``, ``Disallow``
  directives (case-insensitive names), ``#`` comments to end-of-line.
- CONSECUTIVE ``User-agent`` lines open ONE group sharing the rule
  block that follows; a ``User-agent`` line appearing after rules
  starts a new group. Rules before any group are invalid → ignored.
- Multiple groups naming the same agent merge (rules combine).
- A crawler obeys the group(s) matching its product token
  (case-insensitive); if none match, the ``*`` group; if neither
  exists, everything is allowed. When a specific group matches, the
  ``*`` group does NOT apply. (Token matching here is EXACT
  case-insensitive — the RFC's longest-prefix product-token match is
  out of scope and documented; crawl-analytics callers pass the
  literal token they care about.)
- Rule patterns prefix-match the URL's path-and-query, byte-exact and
  case-sensitive, with two metacharacters: ``*`` (any sequence) and a
  TRAILING ``$`` (end anchor).
- Decision: the MOST SPECIFIC matching rule wins (longest pattern in
  octets); on a length tie, the least restrictive (Allow) wins. No
  matching rule → allowed. An empty pattern (``Disallow:``) imposes
  no restriction → dropped at parse.
- Other directives (Crawl-delay, Sitemap, ...) are not rules; the
  group parser drops them. ``Sitemap:`` pointers are group-INDEPENDENT
  and have their own flat extraction (`sitemap_pointers`), paired
  with `parse_sitemap` for the discovery side of the frontier.

Scale shape: parsing is a projection + ONE window keyed (host) over
robots bodies (a robots.txt is small by convention — the RFC caps
mandatory parsing at 500 KiB; one crawl's robots set is ~hosts rows,
millions, not billions). Evaluation is ONE hash equi-join on host —
rules-side rows per host are tens, so there is no build-side
explosion; at crawl scale this is a plain shuffle join AQE handles,
and the matched-rule argmax is a partial-aggregatable max_by, not a
window. Rule regexes are column values, so matching runs through the
JVM's regexp_like off the codegen fast path — acceptable because the
rules side is small and the join output is what it costs anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: regex metacharacters to neutralize in robots patterns — everything
#: except '*' (wildcard, translated) and '$' (only a TRAILING one is
#: an anchor; inner '$' are literal and get escaped separately)
_META = r"[\.\[\]\(\)\+\?\^\{\}\|\\]"


def _pattern_regex(pattern: Column) -> Column:
    """Java regex equivalent of a robots rule pattern: anchored prefix
    match, ``*`` -> ``.*``, one trailing ``$`` -> end anchor, every
    other regex meta (and inner ``$``) literal."""
    anchored = pattern.endswith("$")
    core = F.when(
        anchored, F.substring(pattern, F.lit(1), F.length(pattern) - 1)
    ).otherwise(pattern)
    esc = F.regexp_replace(core, _META, r"\\$0")
    esc = F.regexp_replace(esc, r"\$", r"\\\$")
    body = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(
        F.lit("^"), body, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


#: every group-scoped directive the module understands. Group ids are
#: ALWAYS assigned over this full set: filtering a consumer's subset
#: out BEFORE the window would make User-agent lines separated only by
#: the dropped kind look consecutive and wrongly merge their groups
#: (e.g. 'UA:a / Disallow:/x / UA:b / Crawl-delay:2' must not hand
#: a's group the delay). Directives outside this set (unknown
#: extensions) are dropped pre-window — two UA lines separated only by
#: an unknown line therefore merge, matching the reference parser's
#: skip-unrecognized-lines behavior.
_GROUP_DIRECTIVES = ("allow", "disallow", "crawl-delay")


def _grouped_lines(
    robots: DataFrame, host_col: str, body_col: str,
    directives: tuple[str, ...],
):
    """Shared line machinery for the group-scoped directive consumers:
    comment-stripped, directive-split robots lines with RFC group ids
    assigned by one per-host window over ALL `_GROUP_DIRECTIVES`,
    then filtered to ``user-agent`` + the caller's ``directives``.
    Returns (grouped_lines, is_ua_column)."""
    lines = (
        robots.select(
            F.col(host_col).alias("host"),
            F.posexplode(
                F.split(F.coalesce(F.col(body_col), F.lit("")), r"\r?\n")
            ).alias("pos", "line"),
        )
        .select(
            "host", "pos",
            F.trim(F.regexp_replace("line", "#.*$", "")).alias("line"),
        )
        .filter(F.col("line") != "")
        .select(
            "host", "pos",
            F.lower(
                F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1)
            ).alias("directive"),
            F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1))
            .alias("value"),
        )
        .filter(
            F.col("directive").isin("user-agent", *_GROUP_DIRECTIVES)
        )
    )
    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("directive") == "user-agent"
    grouped = lines.withColumn(
        "group_id",
        F.sum(
            (is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False)))
            .cast("int")
        ).over(w),
    ).filter(is_ua | F.col("directive").isin(*directives))
    return grouped, is_ua


def parse_robots(
    robots: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> the rules relation: one row per
    (host, agent, directive, pattern) with the translated
    ``pattern_regex`` and octet-length ``pattern_len`` evaluation
    needs. Group structure per the RFC: consecutive User-agent lines
    share the following rule block; pre-group rules are ignored;
    same-agent groups merge downstream (evaluation reads ALL rows for
    an agent). Non-rule directives and empty patterns drop here.

    Plan: split/posexplode the body's lines, one window over
    (host) ordered by line position to assign group ids (the ONLY
    non-projection step — robots bodies are small by spec, ≤500 KiB
    mandatory parsing, so per-host line counts are bounded), then ONE
    aggregation collecting each group's agents and rules together,
    exploded into pairs."""
    grouped, is_ua = _grouped_lines(
        robots, host_col, body_col, ("allow", "disallow")
    )
    # ONE aggregation collects each group's agent set and rule list,
    # then two explodes pair them — an agents⋈rules self-join here
    # would evaluate the windowed lines subtree twice (collect_*
    # skip NULLs, so the when()s split the lines without a pre-filter;
    # groups with no agents = pre-group rules, dropped by the size
    # guard)
    per_group = (
        grouped.groupBy("host", "group_id")
        .agg(
            F.collect_set(F.when(is_ua, F.lower("value")))
            .alias("agents"),
            F.collect_list(
                F.when(
                    ~is_ua & (F.col("value") != ""),
                    F.struct(F.col("directive"),
                             F.col("value").alias("pattern")),
                )
            ).alias("rules"),
        )
        .filter((F.size("agents") > 0) & (F.size("rules") > 0))
    )
    return (
        per_group
        .select("host", F.explode("agents").alias("agent"), "rules")
        .select("host", "agent", F.explode("rules").alias("r"))
        .select(
            "host", "agent", "r.directive", "r.pattern",
            _pattern_regex(F.col("r.pattern")).alias("pattern_regex"),
            F.octet_length("r.pattern").alias("pattern_len"),
        )
    )


def crawl_delays(
    robots: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """``Crawl-delay`` per (host, agent): the de-facto politeness
    directive (not in RFC 9309 but honored by Bing/Yandex and
    published in real robots files; a recrawl scheduler reads this
    next to the rules relation). Group-scoped like Allow/Disallow;
    when one group states several delays the MINIMUM wins here —
    politeness bounds err low. Non-numeric values drop (try_cast).
    Same plan shape as `parse_robots`: the shared window + one
    aggregation, exploded per agent."""
    grouped, is_ua = _grouped_lines(
        robots, host_col, body_col, ("crawl-delay",)
    )
    per_group = (
        grouped.groupBy("host", "group_id")
        .agg(
            F.collect_set(F.when(is_ua, F.lower("value")))
            .alias("agents"),
            F.min(
                F.when(~is_ua, F.col("value").try_cast("double"))
            ).alias("crawl_delay_s"),
        )
        .filter(
            (F.size("agents") > 0) & F.col("crawl_delay_s").isNotNull()
        )
    )
    return (
        per_group
        .select("host", F.explode("agents").alias("agent"),
                "crawl_delay_s")
        # same-agent groups merge min-wise, mirroring the rules merge
        .groupBy("host", "agent")
        .agg(F.min("crawl_delay_s").alias("crawl_delay_s"))
    )


def warc_robots(records: DataFrame) -> DataFrame:
    """The WARC → robots bridge: from a crawl's record relation
    (`sources/warc.py` WARC_SCHEMA — Common Crawl publishes robots
    captures as their own WARC set), keep 2xx ``response`` records
    whose URI path is exactly ``/robots.txt`` and emit
    (host, robots_txt) ready for `parse_robots` / `crawl_delays` /
    `sitemap_pointers`. Content-Type is deliberately NOT gated —
    real servers label robots.txt text/plain, text/html, even
    application/octet-stream, and RFC 9309 parsing doesn't depend on
    it; bodies decode as lenient UTF-8 (the `warc_html_docs` cast
    stance: garbage degrades to replacement chars, never kills the
    job). Non-2xx captures are dropped — per the RFC an unavailable
    robots.txt means crawl-anything, which is exactly
    `robots_eval`'s default for hosts absent from the rules
    relation. Pure column expressions over the scan."""
    host = F.lower(F.try_parse_url(F.col("target_uri"), F.lit("HOST")))
    path = F.try_parse_url(F.col("target_uri"), F.lit("PATH"))
    return (
        records.filter(
            (F.col("warc_type") == "response")
            & F.col("http_status").between(200, 299)
            & (path == "/robots.txt")
        )
        .filter(host.isNotNull())
        .select(
            host.alias("host"),
            F.col("body").cast("string").alias("robots_txt"),
        )
    )


def sitemap_pointers(
    robots: DataFrame, host_col: str = "host", body_col: str = "robots_txt"
) -> DataFrame:
    """``Sitemap:`` pointers from robots bodies: (host, sitemap_url).
    Per the sitemaps.org protocol (public) the directive is
    group-INDEPENDENT — it may appear anywhere in the file and names
    an absolute URL — so this is a flat line extraction, not part of
    `parse_robots`' group machinery (which rightly ignores it)."""
    return robots.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(
                F.coalesce(F.col(body_col), F.lit("")),
                F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"), F.lit(1)
            )
        ).alias("sitemap_url"),
    )


#: the five XML character entities, decode order matters: '&amp;' LAST
#: or '&amp;lt;' would double-decode into '<'
_XML_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&apos;", "'"), ("&amp;", "&"))


def _xml_unescape(col: Column) -> Column:
    for ent, ch in _XML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def parse_sitemap(
    sitemaps: DataFrame, body_col: str = "sitemap_xml",
    keep_cols: tuple[str, ...] = ("host",),
) -> DataFrame:
    """Explode sitemap XML bodies (sitemaps.org protocol) into one row
    per ``<loc>``: ``keep_cols`` + (kind, loc) where kind is
    ``urlset`` (leaf — locs are page URLs) or ``index``
    (``<sitemapindex>`` — locs are FURTHER sitemap URLs the caller
    fetches and feeds back; the protocol caps nesting in practice at
    one index level, 50k locs / 50 MB per file). Entity references in
    locs decode in the spec's order ('&amp;' last). This is a
    regex-level extraction of the one element the frontier needs —
    not an XML parser; malformed markup yields however many
    well-formed <loc> elements it still contains."""
    kind = F.when(
        F.col(body_col).contains("<sitemapindex"), F.lit("index")
    ).otherwise(F.lit("urlset"))
    return sitemaps.select(
        *keep_cols, kind.alias("kind"),
        F.explode(
            F.regexp_extract_all(
                F.coalesce(F.col(body_col), F.lit("")),
                F.lit(r"(?s)<loc>\s*(.*?)\s*</loc>"), F.lit(1)
            )
        ).alias("loc"),
    ).withColumn("loc", _xml_unescape(F.col("loc")))


def robots_eval(
    urls: DataFrame, rules: DataFrame, agent: str, url_col: str = "url"
) -> DataFrame:
    """Evaluate every row of ``urls`` against ``rules`` (from
    `parse_robots`) for ``agent``: adds ``allowed`` (boolean; hosts
    without an applicable group default to allowed) and
    ``decisive_rule`` (the winning rule's pattern, NULL when no rule
    matched). Matching follows the RFC: the crawler's group is the
    exact case-insensitive agent token if any host group names it,
    else ``*``; the longest matching pattern decides; Allow wins
    length ties; match target is the URL's path-and-query.

    Plan: group selection is a per-host max flag (partial-agg
    groupBy + one equi-join back), evaluation is ONE host-keyed
    equi-join followed by a max_by argmax — no windows over the big
    side, no cross join, rule regexes ride as columns."""
    mine = rules.filter(
        F.col("agent").isin(agent.lower(), "*")
    ).withColumn("is_specific", (F.col("agent") != "*").cast("int"))
    # group selection as a window over the RULES side (small — tens of
    # rows per host), not a groupBy + self-join: the join form
    # re-evaluates the whole parse subtree once per branch (3 windowed
    # parses in the physical plan before this was rewritten)
    applicable = mine.withColumn(
        "use_specific",
        F.max("is_specific").over(Window.partitionBy("host")),
    ).filter(F.col("is_specific") == F.col("use_specific"))

    u = urls.withColumn(
        "__host", F.lower(F.try_parse_url(F.col(url_col), F.lit("HOST")))
    ).withColumn(
        "__target",
        F.concat(
            F.coalesce(
                F.nullif(
                    F.try_parse_url(F.col(url_col), F.lit("PATH")),
                    F.lit(""),
                ),
                F.lit("/"),
            ),
            F.coalesce(
                F.concat(
                    F.lit("?"),
                    F.try_parse_url(F.col(url_col), F.lit("QUERY")),
                ),
                F.lit(""),
            ),
        ),
    )
    joined = u.join(
        applicable.select("host", "directive", "pattern",
                          "pattern_regex", "pattern_len"),
        u["__host"] == applicable["host"],
        "left",
    ).withColumn(
        "__match",
        F.expr("regexp_like(__target, pattern_regex)"),
    )
    verdict = (
        joined.groupBy(*[F.col(c) for c in urls.columns], "__host",
                       "__target")
        .agg(
            F.max_by(
                F.struct(
                    F.col("directive").alias("directive"),
                    F.col("pattern").alias("pattern"),
                ),
                F.when(
                    F.col("__match"),
                    F.struct(
                        F.col("pattern_len").alias("l"),
                        (F.col("directive") == "allow").cast("int")
                        .alias("a"),
                        # deterministic tiebreak: two same-length rules
                        # of the SAME directive matching one URL would
                        # otherwise report an arbitrary decisive_rule
                        # (verdict unaffected, but re-runs must agree)
                        F.col("pattern").alias("p"),
                    ),
                ),
            ).alias("__win"),
            F.max(F.col("__match").cast("int")).alias("__any"),
        )
        .select(
            *urls.columns,
            F.when(
                F.coalesce(F.col("__any"), F.lit(0)) == 0, F.lit(True)
            ).otherwise(F.col("__win.directive") == "allow")
            .alias("allowed"),
            F.when(
                F.coalesce(F.col("__any"), F.lit(0)) == 1,
                F.col("__win.pattern"),
            ).alias("decisive_rule"),
        )
    )
    return verdict
