"""Generic capability scans — the macro family (S5-S8).

The reference generates one router method per capability from a single macro
(fundamentals/holders/analysis/options/news/esg/profile — borsa/src/router/
fundamentals.rs etc., macro macros.rs:13-85): try providers in priority
order, first usable response wins wholesale.

Spark mapping: union eligible provider scans with a priority column; per
symbol keep ALL rows of the highest-priority provider that has any rows
(first non-empty response wins, not row-wise mixing). One window, one
filter — a single job for any number of symbols, which is the 100 TB-shape
win over the reference's per-symbol sequential loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from borsa_spark.errors import UnsupportedError
from borsa_spark.plans.routing_policy import RoutingContext
from borsa_spark.sources.provider import Catalog

#: capability -> extra equality filters applied at the scan
#: (e.g. quarterly flag for statements, expiry date for option chains).


def capability_scan(
    catalog: Catalog,
    capability: str,
    symbols: "list[str] | str | DataFrame | None" = None,
    kind: str | None = None,
    filters: dict[str, object] | None = None,
    group_keys: list[str] | None = None,
) -> DataFrame:
    """First-non-empty-provider-wins scan for any table capability.

    ``group_keys`` defines the granularity at which a provider wins
    (default: per symbol). ``filters`` are pushed-down equality predicates,
    e.g. {"quarterly": True} for statement tables or
    {"expiry": date} for option chains (connector.rs:52-306).

    ``symbols`` may be a list (IN predicate), "*" (no symbol predicate), or
    a one-column ``symbol`` DataFrame (left-semi join — keeps the symbol set
    distributed instead of collected to the driver).
    """
    ctx = RoutingContext(kind=kind)
    eligible = catalog.eligible(ctx, capability)
    if not eligible:
        raise UnsupportedError(f"{capability}: no eligible provider")
    group_keys = group_keys or ["symbol"]

    frames = []
    for idx, source in eligible:
        df = source.table(capability)
        if isinstance(symbols, DataFrame):
            df = df.join(symbols.select("symbol"), "symbol", "left_semi")
        elif symbols == "*":
            pass  # full-catalog scan
        elif symbols is not None:
            df = df.filter(F.col("symbol").isin(symbols))
        for col, val in (filters or {}).items():
            df = df.filter(F.col(col) == F.lit(val))
        frames.append(df.withColumn("priority", F.lit(idx)))
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)

    w = Window.partitionBy(*group_keys)
    return (
        union.withColumn("__best", F.min("priority").over(w))
        .filter(F.col("priority") == F.col("__best"))
        .drop("__best")
    )


def income_statement(catalog, symbols=None, quarterly=False, **kw):
    return capability_scan(
        catalog, "income_statement", symbols, filters={"quarterly": quarterly}, **kw
    )


def balance_sheet(catalog, symbols=None, quarterly=False, **kw):
    return capability_scan(
        catalog, "balance_sheet", symbols, filters={"quarterly": quarterly}, **kw
    )


def cashflow(catalog, symbols=None, quarterly=False, **kw):
    return capability_scan(
        catalog, "cashflow", symbols, filters={"quarterly": quarterly}, **kw
    )


def earnings(catalog, symbols=None, **kw):
    return capability_scan(catalog, "earnings", symbols, **kw)


def calendar(catalog, symbols=None, **kw):
    return capability_scan(catalog, "calendar", symbols, **kw)


def option_chain(catalog, symbols=None, expiry=None, **kw):
    filters = {"expiry": expiry} if expiry is not None else None
    return capability_scan(catalog, "option_chain", symbols, filters=filters, **kw)


def news(catalog, symbols=None, count=None, tab=None, **kw):
    """News scan; ``count`` caps stories per symbol by recency, ``tab``
    selects news|press_releases|all
    (NewsRequest{count, tab} — borsa-middleware/src/cache.rs:86-91)."""
    filters = {"tab": tab} if tab is not None and tab != "all" else None
    df = capability_scan(catalog, "news", symbols, filters=filters, **kw)
    if count is not None:
        w = Window.partitionBy("symbol").orderBy(F.col("ts").desc())
        df = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= count)
            .drop("__rn")
        )
    return df


def option_expirations(catalog, symbols=None, **kw):
    """S8: available option expiry dates per symbol — distinct expiries from
    the winning provider's chain (connector.rs options expirations)."""
    df = capability_scan(catalog, "option_chain", symbols, **kw)
    return df.select("symbol", "expiry").distinct().orderBy("symbol", "expiry")


def _simple(capability: str):
    def f(catalog, symbols=None, **kw):
        return capability_scan(catalog, capability, symbols, **kw)

    f.__name__ = capability
    f.__doc__ = f"{capability} scan (macro family, macros.rs:13-85)."
    return f


recommendations = _simple("recommendations")
recommendations_summary = _simple("recommendations_summary")
upgrades_downgrades = _simple("upgrades_downgrades")
price_target = _simple("price_target")
major_holders = _simple("major_holders")
institutional_holders = _simple("institutional_holders")
mutual_fund_holders = _simple("mutual_fund_holders")
insider_transactions = _simple("insider_transactions")
insider_roster = _simple("insider_roster")
net_share_purchase = _simple("net_share_purchase")
profile = _simple("profile")
isin = _simple("isin")
esg = _simple("esg")
options = _simple("options")
