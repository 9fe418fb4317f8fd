"""Graph centrality over document-similarity graphs: PageRank as a
declarative DataFrame program.

Why it's here: web-scale training corpora weight documents by link/graph
importance (Common Crawl page ranks are a standard quality prior), and
the near-dup pair relation the dedup family already produces IS a graph —
centrality over it surfaces template hubs (one doc near-duplicating many
others) far more directly than pair counts. The same operator runs on a
real hyperlink edge list unchanged.

Spark shape: one power iteration = one equi-join (edge src -> current
rank) + one map-side-combinable groupBy on dst + a left join back to the
node universe. No driver-side state beyond the node count; ranks snap to
a fixed number of decimals each round (the kmeans 6dp-recurrence
convention, functions/similarity.py) so both engines walk the same
fixpoint despite differing float summation orders.

Dangling nodes (out-degree 0) contribute only the teleport term — their
rank mass is NOT redistributed. That is a documented deviation from the
textbook formulation chosen for oracle portability (redistribution adds
a global scalar each round, one more cross-engine summation surface);
ranks still order identically for hub detection, which is the use here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    snap: int = 8,
    persist_edges: bool = True,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(id, pr) after ``iters`` snapped power iterations.

    ``edges``: (src, dst) DIRECTED — pass both directions for an
    undirected graph. ``nodes``: (id), the rank universe (isolated nodes
    hold the teleport floor). The one driver-side action is the node
    count (metadata-cheap; callers that know N can't avoid it anyway —
    it is the teleport denominator).

    ``persist_edges=False`` lets long-lived callers (or callers passing
    an already-cached relation) manage the cache themselves — by default
    the cache lifetime is harness-owned (clearCache per query), the
    repo's standard contract.

    ``checkpoint_every``: every K iterations the rank relation is
    ``localCheckpoint``-ed (eager), truncating lineage. Without this each
    round nests the previous round's plan, so iters≳10 over a large graph
    hits planner blowup / lineage OOM; with it plan depth is bounded by K
    regardless of iters. 0 disables (only sensible for tiny iters).
    """
    n = nodes.count()
    # The edge relation is consumed 2x per iteration (contrib join + deg)
    # and its lineage may be an expensive pipeline (the near-dup pair
    # generation); persist it once — without this every iteration
    # re-executes the full upstream plan (measured 43 s -> ~8 s at
    # sf0.01).
    if persist_edges:
        edges = edges.persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("__deg"))
    pr = nodes.select("id", F.round(F.lit(1.0 / n), snap).alias("pr"))
    teleport = (1.0 - damping) / n
    for i in range(iters):
        contrib = (
            edges.join(pr, edges["src"] == pr["id"])
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("__deg")).alias("__c"))
        )
        pr = (
            nodes.join(contrib, nodes["id"] == contrib["dst"], "left")
            .select(
                nodes["id"],
                F.round(
                    teleport + damping * F.coalesce(F.col("__c"), F.lit(0.0)),
                    snap,
                ).alias("pr"),
            )
        )
        if (
            checkpoint_every
            and (i + 1) % checkpoint_every == 0
            and (i + 1) < iters
        ):
            pr = pr.localCheckpoint(eager=True)
    return pr


def sql_pagerank_round(prev: str, k: int, damping: float = 0.85,
                       snap: int = 8) -> str:
    """One DuckDB power-iteration CTE pair (contrib{k}, pr{k}) over the
    ``edges``/``deg``/``nn`` CTEs — the oracle mirror of `pagerank`'s
    loop body, same snap each round."""
    return f"""
    contrib{k} AS (
      SELECT e.dst AS id, sum(p.pr / g.deg) AS c
      FROM edges e
      JOIN {prev} p ON p.id = e.src
      JOIN deg g ON g.id = e.src
      GROUP BY e.dst),
    pr{k} AS (
      SELECT d.doc_id AS id,
             round({1.0 - damping} / nn.n + {damping} * coalesce(c.c, 0),
                   {snap}) AS pr
      FROM documents d CROSS JOIN nn
      LEFT JOIN contrib{k} c ON c.id = d.doc_id)
    """
