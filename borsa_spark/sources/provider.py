"""Provider source abstraction + the catalog (planner input).

The reference's extensibility point is the connector trait family
(borsa-core/src/connector.rs:25-306: 25 capability traits discovered via
``as_*_provider`` accessors). Our Spark-native analog: a ``Source`` exposes
one DataFrame per capability; the ``Catalog`` is the ordered registry the
planner filters (kind support, capability, routing policy) to decide which
scans enter the generated DataFrame program.

A capability method returns a DataFrame in the canonical schema for that
capability (schemas.py). For live systems a Source would wrap a DataSourceV2
/ JDBC / Kafka reader; for the correctness gate, ``FixtureSource`` wraps
parquet-backed DataFrames — same planner, same pipeline, different scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from borsa_spark.errors import NotFoundError, UnsupportedError
from borsa_spark.plans.routing_policy import RoutingContext, RoutingPolicy

#: Capability vocabulary (connector.rs trait-per-capability).
CAPABILITIES = [
    "history", "quote", "search", "earnings", "income_statement",
    "balance_sheet", "cashflow", "calendar", "recommendations",
    "recommendations_summary", "upgrades_downgrades", "price_target",
    "major_holders", "institutional_holders", "mutual_fund_holders",
    "insider_transactions", "insider_roster", "net_share_purchase",
    "profile", "isin", "esg", "news", "options", "option_chain",
    "stream_quotes", "stream_candles", "stream_options",
]

ALL_KINDS = frozenset(
    {"EQUITY", "ETF", "INDEX", "CRYPTO", "FUTURE", "FOREX", "FUND"}
)


@dataclass
class Source:
    """A provider: capability DataFrames + metadata the planner reads.

    ``tables`` maps capability -> a zero-arg DataFrame factory (or a constant
    DataFrame). The per-capability scan templates in the router add the
    symbol/interval/date predicates — those reach the parquet scan as pushed
    filters because the factory returns an untouched declarative scan.
    """

    name: str
    kinds: frozenset[str] = field(default_factory=lambda: ALL_KINDS)
    history_intervals: tuple[str, ...] = ()
    tables: dict[str, DataFrame | Callable[[], DataFrame]] = field(
        default_factory=dict
    )

    def capabilities(self) -> set[str]:
        return set(self.tables)

    def supports_kind(self, kind: str | None) -> bool:
        return kind is None or kind in self.kinds

    def supports(self, capability: str) -> bool:
        return capability in self.tables

    def table(self, capability: str) -> DataFrame:
        t = self.tables.get(capability)
        if t is None:
            raise UnsupportedError(capability, connector=self.name)
        df = t() if callable(t) else t
        # Every capability row is provider-tagged so downstream merge /
        # attribution / blame logic can run without re-deriving lineage.
        if "provider" not in df.columns:
            df = df.withColumn("provider", F.lit(self.name))
        return df


@dataclass
class Catalog:
    """Ordered provider registry + routing policy evaluation (R1-R2, P1-P2).

    Registration order is the final tie-break in provider priority
    (borsa/src/core.rs:407-425 ordered_for_context).
    """

    sources: list[Source] = field(default_factory=list)
    policy: RoutingPolicy = field(default_factory=RoutingPolicy)

    def register(self, source: Source) -> Catalog:
        if any(s.name == source.name for s in self.sources):
            raise ValueError(f"duplicate source {source.name!r}")
        self.sources.append(source)
        return self

    def get(self, name: str) -> Source:
        for s in self.sources:
            if s.name == name:
                return s
        raise NotFoundError(f"source {name!r}")

    def validate_policy(self) -> None:
        """Reject policies naming unknown connectors (core.rs:190-215)."""
        known = {s.name for s in self.sources}
        unknown = self.policy.providers.normalize_and_collect_unknown(known)
        if unknown:
            details = "; ".join(
                f"{sel}: {names}" for sel, names in unknown
            )
            raise UnsupportedError(f"policy references unknown connectors: {details}")

    def ordered_for_context(self, ctx: RoutingContext) -> list[tuple[int, Source]]:
        """All policy-eligible sources ordered by (policy rank, registration
        idx); strict-excluded sources are dropped. Returns (order_idx, source)
        pairs — order_idx is the merge priority."""
        keyed = []
        for reg_idx, s in enumerate(self.sources):
            r = self.policy.providers.provider_rank(ctx, s.name)
            if r is None:
                continue  # excluded by a strict rule
            keyed.append(((r[0], reg_idx), s))
        keyed.sort(key=lambda kv: kv[0])
        return [(i, s) for i, (_, s) in enumerate(keyed)]

    def eligible(
        self, ctx: RoutingContext, capability: str
    ) -> list[tuple[int, Source]]:
        """P1+P2: kind-support and capability filters over the ordered list
        (borsa/src/router/history.rs:388-403, macros.rs:45-48)."""
        out = [
            (idx, s)
            for idx, s in self.ordered_for_context(ctx)
            if s.supports_kind(ctx.kind) and s.supports(capability)
        ]
        return out


def catalog_df(spark, catalog: Catalog):
    """S2: the provider capability/interval registry as a DataFrame
    (schemas.SOURCE_CATALOG) — the queryable form of the planner's metadata
    (`provider_intervals(provider, kind, interval)` in SURVEY §2.1), e.g.
    for joining eligibility into data-side reports."""
    from borsa_spark import schemas

    rows = [
        (
            s.name,
            i,
            sorted(s.kinds),
            sorted(s.capabilities()),
            list(s.history_intervals),
        )
        for i, s in enumerate(catalog.sources)
    ]
    return spark.createDataFrame(rows, schema=schemas.SOURCE_CATALOG)


def fixture_source(
    name: str,
    kinds: frozenset[str] | None = None,
    history_intervals: tuple[str, ...] = ("1d",),
    **tables: DataFrame,
) -> Source:
    """Convenience constructor for test/fixture providers."""
    return Source(
        name=name,
        kinds=kinds if kinds is not None else ALL_KINDS,
        history_intervals=history_intervals,
        tables=dict(tables),
    )
