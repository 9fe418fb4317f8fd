"""URL canonicalization + URL-keyed dedup for web-crawl pipelines.

The first dedup pass over any crawl corpus is by URL, not by content:
the same page is fetched through case-varied hosts, tracking-parameter
decorations (utm_*, gclid, ...), default-port spellings, trailing
slashes, and fragments. Canonicalizing those spellings to one key
collapses refetches for the cost of a scan — before any content hash,
shingle, or embedding is computed (the CCNet / C4 / RefinedWeb
pre-step; see Penedo et al. 2023 §3.1 "URL filtering", public paper).

Everything is built-in pyspark.sql.functions (`parse_url`, regex,
array lambdas) — JVM-side, whole-stage-codegen'd, no Python in the hot
path. At 100 TB this is a narrow projection at scan speed followed by
one hash-partitioned groupBy on the canonical key.

Canonicalization contract (documented, deliberately conservative):
- scheme and host lowercased; userinfo dropped (the canonical key is
  rebuilt from HOST — credentials never belong in a dedup key);
- default ports dropped (http:80, https:443), others kept;
- fragment dropped;
- path: trailing '/' runs stripped ('/a/b/' == '/a/b'; '/' == '');
  no dot-segment or percent-encoding normalization (documented out of
  scope — both need a spec-complete resolver to be safe);
- query: tracking params dropped (TRACKING_PARAMS, name matched
  case-insensitively), empty fragments dropped, survivors sorted
  bytewise and rejoined ('b=2&a=1' == 'a=1&b=2');
- 'www.' is NOT stripped: www and bare hosts can serve different
  content; URL canonicalization must never merge distinct resources.

Unparseable URLs canonicalize to NULL so callers can quarantine them
instead of silently merging garbage into one key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Query parameters that never identify a resource — analytics and
#: click-attribution decorations (Google/Facebook/Microsoft/Mailchimp).
#: Deliberately NOT included: bare "ref" — it is content-significant on
#: many real sites (selects a branch/revision on code hosts), and the
#: module contract is that canonicalization must never merge distinct
#: resources. Callers who know their corpus can widen the list via the
#: ``tracking_params`` argument.
TRACKING_PARAMS: tuple[str, ...] = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "mc_eid",
)

_DEFAULT_PORTS: dict[str, str] = {"http": "80", "https": "443"}


def _part(url: Column, part: str) -> Column:
    # try_parse_url: malformed URLs yield NULL parts (and so a NULL
    # canonical) instead of failing the scan — quarantine, don't abort.
    return F.try_parse_url(url, F.lit(part))


def canonical_query(
    query: Column, tracking_params: tuple[str, ...] = TRACKING_PARAMS
) -> Column:
    """Sorted, tracking-stripped query string ('' when nothing survives).

    split on '&', drop empty params and ``tracking_params`` (name = text
    before the first '=', compared lowercased), bytewise sort, rejoin.
    """
    params = F.array_sort(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda p: (p != "")
            & ~F.lower(F.substring_index(p, "=", 1)).isin(*tracking_params),
        )
    )
    return F.array_join(params, "&")


def canonicalize_url(
    url: Column, tracking_params: tuple[str, ...] = TRACKING_PARAMS
) -> Column:
    """The canonical spelling of ``url`` per the module contract, or NULL
    when the URL has no parseable scheme/host."""
    scheme = F.lower(_part(url, "PROTOCOL"))
    host = F.lower(_part(url, "HOST"))
    port = F.regexp_extract(_part(url, "AUTHORITY"), ":([0-9]+)$", 1)
    is_default = F.coalesce(
        *[
            F.when((scheme == s) & (port == p), F.lit(True))
            for s, p in _DEFAULT_PORTS.items()
        ],
        F.lit(False),
    )
    port_part = F.when(
        (port == "") | is_default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_replace(F.coalesce(_part(url, "PATH"), F.lit("")),
                            "/+$", "")
    q = canonical_query(_part(url, "QUERY"), tracking_params)
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.when(
        scheme.isNotNull() & host.isNotNull() & (host != ""),
        F.concat(scheme, F.lit("://"), host, port_part, path, q_part),
    )


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key for ``url`` —
    the sort key Common Crawl's CDX/CDXJ and columnar indexes use
    (public format: pywb / webarchive-commons SURT, e.g.
    ``org,example)/path?q=1``). Reversing the host labels makes ONE
    bytewise sort range cover a host and all its subdomains, so an
    index sorted on this key answers host- and domain-scoped lookups
    by range/prefix scan — the property `write_cdx_index` builds on.

    Contract (deliberately explicit where SURT implementations vary):
    - scheme, userinfo, and fragment dropped; the whole key lowercased
      (the pywb convention — SURT keys are lookup keys, not resources,
      so over-merge risk trades against lookup recall here, UNLIKE
      `canonicalize_url` which must never merge distinct resources);
    - one leading ``www`` / ``www<digits>`` host label stripped, but
      only when at least two labels remain (``www.example.org`` ->
      ``org,example``; ``www.com`` stays ``com,www`` — stripping there
      would alias the registrable domain itself);
    - host labels reversed and comma-joined;
    - non-default port kept as ``:port`` after the reversed host
      (http:80 / https:443 dropped);
    - ``)`` separator, then the path with trailing-'/' runs stripped;
    - query: empty params dropped, survivors bytewise-sorted and
      rejoined — ALL params kept (an index key must find the URL as
      crawled; tracking-param dropping belongs to dedup, not lookup);
    - NULL when the URL has no parseable scheme/host (callers
      quarantine: a NULL key must never join two garbage URLs).
    """
    low = F.lower(url)
    scheme = _part(low, "PROTOCOL")
    # FQDN trailing dot ('example.org.') names the same host — strip
    # it, or the empty final label reverses into a LEADING comma and
    # the key escapes its host's prefix range (review catch). Bracket
    # (IPv6) hosts have no dot labels and pass through unreversed —
    # still a stable, self-consistent key.
    host = F.regexp_replace(_part(low, "HOST"), r"\.+$", "")
    host_nw = F.when(
        host.rlike(r"^www[0-9]*\..+\."),
        F.regexp_replace(host, r"^www[0-9]*\.", ""),
    ).otherwise(host)
    rev_host = F.array_join(F.reverse(F.split(host_nw, r"\.")), ",")
    # leading zeros stripped (':007' and ':7' are one port — and the
    # default-port comparison below is string-typed, review catch)
    raw_port = F.regexp_extract(_part(low, "AUTHORITY"),
                                ":([0-9]+)$", 1)
    port = F.when(raw_port == "", raw_port).otherwise(
        raw_port.cast("long").cast("string")
    )
    is_default = F.coalesce(
        *[
            F.when((scheme == s) & (port == p), F.lit(True))
            for s, p in _DEFAULT_PORTS.items()
        ],
        F.lit(False),
    )
    port_part = F.when(
        (port == "") | is_default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_replace(F.coalesce(_part(low, "PATH"), F.lit("")),
                            "/+$", "")
    q = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.coalesce(_part(low, "QUERY"), F.lit("")), "&"),
                lambda p: p != "",
            )
        ),
        "&",
    )
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.when(
        scheme.isNotNull() & host.isNotNull() & (host != ""),
        F.concat(rev_host, port_part, F.lit(")"), path, q_part),
    )


def url_dedup_groups(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Group rows by canonical URL: (canonical_url, n_docs, keeper) with
    keeper = min id — the deterministic survivor a re-run reproduces.
    Unparseable URLs (NULL canonical) are quarantined out of the result.

    Scale shape: canonicalization is per-row codegen at scan speed; the
    only shuffle is one partial-aggregatable groupBy hash-keyed on the
    canonical URL (no skew beyond genuinely hot pages — and a hot
    canonical key is exactly the dedup signal, its group collapses to
    one row map-side first)."""
    return (
        df.select(
            canonicalize_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col),
        )
        .filter(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min(id_col).cast("long").alias("keeper"),
        )
    )
