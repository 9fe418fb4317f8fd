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
