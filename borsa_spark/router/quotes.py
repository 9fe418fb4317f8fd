"""Quote lookups: single (R3 fallback / R4 latency, P4 exchange enforcement)
and batch (A8 partial-failure aggregate).

Reference: borsa/src/router/quotes.rs:8-71, core.rs:276-296 (exchange
enforcement), core.rs:499-616 (fetch strategies).

Spark-first translation of the fetch strategies: PriorityWithFallback's
"try providers in order until one returns a usable quote" collapses — for
table-backed sources — into ONE declarative query: union all eligible
provider scans, drop rows failing exchange enforcement, keep the
lowest-priority (= highest-preference) surviving row per symbol. Providers
that would have errored or returned NotFound simply contribute no rows, which
is exactly what "continue to the next provider" means. Latency racing (R4) is
a wall-clock scheduling concern for live APIs; over tables both strategies
produce the same winner, so `strategy` only gates live-source scheduling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from borsa_spark.errors import NotFoundError, UnsupportedError
from borsa_spark.plans.routing_policy import RoutingContext
from borsa_spark.sources.provider import Catalog


def _quote_union(
    catalog: Catalog, ctx: RoutingContext, enforce_exchange: bool = True
) -> DataFrame:
    eligible = catalog.eligible(ctx, "quote")
    if not eligible:
        raise UnsupportedError("quote: no eligible provider")
    frames = []
    for idx, source in eligible:
        frames.append(source.table("quote").withColumn("priority", F.lit(idx)))
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    if enforce_exchange and ctx.exchange is not None:
        # P4: mismatched exchange => NotFound (=> fallback); missing exchange
        # passes through (core.rs:276-296).
        union = union.filter(
            F.col("exchange").isNull() | (F.col("exchange") == ctx.exchange)
        )
    return union


def quote(
    spark: SparkSession,
    catalog: Catalog,
    symbol: str,
    kind: str | None = None,
    exchange: str | None = None,
) -> DataFrame:
    """Best quote for one symbol: highest-priority surviving provider row."""
    ctx = RoutingContext(symbol=symbol, kind=kind, exchange=exchange)
    union = _quote_union(catalog, ctx).filter(F.col("symbol") == symbol)
    w = Window.partitionBy("symbol").orderBy(F.col("priority").asc())
    return (
        union.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def quotes(
    spark: SparkSession,
    catalog: Catalog,
    symbols: list[str],
    kind: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """A8: batch quotes -> (successes, failures). Failures are requested
    symbols with no surviving row from any provider (quotes.rs:38-71) — an
    anti-join, not an exception, preserving partial results."""
    if len(set(symbols)) != len(symbols):
        # duplicate-symbol validation (download.rs:10-26 applies the same rule)
        raise ValueError("duplicate symbols in batch quote request")
    ctx = RoutingContext(kind=kind)
    union = _quote_union(catalog, ctx, enforce_exchange=False).filter(
        F.col("symbol").isin(symbols)
    )
    w = Window.partitionBy("symbol").orderBy(F.col("priority").asc())
    best = (
        union.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    requested = spark.createDataFrame(
        [(s,) for s in symbols], "symbol string"
    )
    failures = requested.join(best, "symbol", "left_anti")
    return best, failures


def quote_or_raise(
    spark: SparkSession,
    catalog: Catalog,
    symbol: str,
    kind: str | None = None,
    exchange: str | None = None,
):
    """Single-quote action: collect the one winning row or raise NotFound."""
    rows = quote(spark, catalog, symbol, kind, exchange).limit(1).collect()
    if not rows:
        raise NotFoundError(f"quote for {symbol}")
    return rows[0]
