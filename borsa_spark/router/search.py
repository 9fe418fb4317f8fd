"""Search fan-out + exchange-preference dedup (S4, J3, O4).

Reference: macro borsa_router_search (borsa/src/router/macros.rs:88-198) +
dedup_search_results_by_exchange (borsa/src/core.rs:298-332) + exchange sort
key (borsa-types/src/routing_policy.rs:805-817).

Semantics:
- fan out the query to every eligible provider, concatenate results in
  provider traversal order (global order = provider priority, then the
  provider's own result order);
- per symbol keep the best result by (exchange preference rank, none-last,
  original index); output ordered by each symbol's FIRST-SEEN index (stable
  wrt provider order, not the winner's index); truncate to limit.

Spark mapping: one union + two windows (best-per-symbol, first-seen order).
The exchange preference rank is compiled into a literal CASE expression from
the routing policy (scope resolution symbol > kind > global), so ranking
happens JVM-side with no join against a rank table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from borsa_spark.plans.routing_policy import INF, RoutingContext, RoutingPolicy
from borsa_spark.errors import UnsupportedError
from borsa_spark.sources.provider import Catalog

_BIG = 1 << 20


def _rank_in(exchanges: list[str], col: Column) -> Column:
    expr = F.lit(INF)
    for i, e in reversed(list(enumerate(exchanges))):
        expr = F.when(col == e, F.lit(i)).otherwise(expr)
    return expr


def exchange_rank_expr(policy: RoutingPolicy, req_kind: str | None) -> Column:
    """Per-row exchange preference rank from the scoped policy.

    Scope resolution (routing_policy.rs resolve_rank_map): a symbol-scoped
    list, if one exists for the row's symbol, is used exclusively; else a
    kind-scoped list (context kind = requested kind, else the row's kind);
    else the global list; else no ranking (everything INF).
    """
    ex = F.col("exchange")
    kind_ctx = F.lit(req_kind) if req_kind is not None else F.col("kind")

    expr = F.lit(INF)
    if ("global",) in policy.exchanges:
        expr = _rank_in(policy.exchanges[("global",)], ex)
    for scope, lst in policy.exchanges.items():
        if scope[0] == "kind":
            expr = F.when(kind_ctx == scope[1], _rank_in(lst, ex)).otherwise(expr)
    for scope, lst in policy.exchanges.items():
        if scope[0] == "symbol":
            expr = F.when(
                F.col("symbol") == scope[1], _rank_in(lst, ex)
            ).otherwise(expr)
    return expr


def search(
    spark: SparkSession,
    catalog: Catalog,
    query: str,
    kind: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """Free-text instrument search with exchange-preference dedup."""
    ctx = RoutingContext(kind=kind)
    eligible = catalog.eligible(ctx, "search")
    if not eligible:
        raise UnsupportedError("search: no eligible provider")

    frames = []
    for idx, source in eligible:
        df = source.table("search")
        # S4: free-text match — case-insensitive substring over symbol+name.
        q = F.lower(F.lit(query))
        df = df.filter(
            F.lower(F.col("symbol")).contains(q) | F.lower(F.col("name")).contains(q)
        )
        if kind is not None:
            df = df.filter(F.col("kind") == kind)
        frames.append(
            df.withColumn(
                "orig_idx",
                F.lit(idx) * _BIG + F.coalesce(F.col("result_idx"), F.lit(0)),
            )
        )
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)

    rank = exchange_rank_expr(catalog.policy, kind)
    none_penalty = F.when(F.col("exchange").isNull(), F.lit(INF)).otherwise(F.lit(0))
    wsym = Window.partitionBy("symbol")
    best = (
        union.withColumn("__rank", rank)
        .withColumn("__np", none_penalty)
        .withColumn(
            "__rn",
            F.row_number().over(
                wsym.orderBy(
                    F.col("__rank").asc(),
                    F.col("__np").asc(),
                    F.col("orig_idx").asc(),
                )
            ),
        )
        .withColumn("first_seen", F.min("orig_idx").over(wsym))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__rank", "__np")
        .orderBy("first_seen")
    )
    if limit is not None:
        best = best.limit(limit)
    return best
