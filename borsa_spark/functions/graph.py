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

Two formulations, both oracle-portable:

- default (``redistribute_dangling=False``): dangling nodes (out-degree
  0) contribute only the teleport term — their rank mass is NOT
  redistributed. The cheapest variant; ranks still order identically for
  hub detection.
- textbook (``redistribute_dangling=True``): each round the dangling
  mass D = Σ pr(v) over out-degree-0 nodes is shared uniformly —
  pr' = (1-d)/n + d·(Σ contribs + D/n). D is one extra scalar aggregate
  per round, snapped like the ranks so both engines agree; it rides into
  the rank update as a broadcast 1-row relation (no driver round-trip).

``weight_col`` generalizes out-degree to out-WEIGHT: a source's rank is
split proportionally to edge weight (w / Σ_out w) instead of uniformly
(1 / deg) — similarity-weighted centrality over the near-dup graph,
where a 0.9-Jaccard edge should carry more mass than a 0.5 one.
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
    weight_col: str | None = None,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """(id, pr) after ``iters`` snapped power iterations.

    ``edges``: (src, dst) DIRECTED — pass both directions for an
    undirected graph. ``nodes``: (id), the rank universe (isolated nodes
    hold the teleport floor). The one driver-side action is the node
    count (metadata-cheap; callers that know N can't avoid it anyway —
    it is the teleport denominator).

    ``weight_col``: optional edge-weight column; a source's rank is then
    distributed as w / Σ_out(w) instead of 1 / out-degree. Weights must
    be positive (a zero-total source divides by zero exactly as a
    zero-degree one would — both are "dangling" and excluded from deg).

    ``redistribute_dangling=True`` switches to the textbook recurrence:
    the summed rank of out-degree-0 nodes is re-shared uniformly each
    round (see module docstring). The scalar rides as a broadcast 1-row
    crossJoin — no extra driver action, one extra aggregate per round.

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
    out_mass = (
        F.sum(weight_col) if weight_col is not None else F.count("*")
    )
    deg = edges.groupBy("src").agg(out_mass.alias("__deg"))
    share = (
        F.col("pr") * F.col(weight_col) / F.col("__deg")
        if weight_col is not None
        else F.col("pr") / F.col("__deg")
    )
    pr = nodes.select("id", F.round(F.lit(1.0 / n), snap).alias("pr"))
    teleport = (1.0 - damping) / n
    for i in range(iters):
        if redistribute_dangling and i > 0:
            # The dangling aggregate references pr a SECOND time per
            # iteration; without truncation both references re-execute
            # the full rank lineage (2x per round, compounding across
            # rounds — measured 23 s vs 13 s at sf0.1 for 3 iters).
            # An eager localCheckpoint materializes the one-row-per-node
            # relation once per round: flat, linear cost.
            pr = pr.localCheckpoint(eager=True)
        contrib = (
            edges.join(pr, edges["src"] == pr["id"])
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(share).alias("__c"))
        )
        new_mass = F.coalesce(F.col("__c"), F.lit(0.0))
        base = nodes.join(contrib, nodes["id"] == contrib["dst"], "left")
        if redistribute_dangling:
            # D = Σ pr over sources with no outgoing mass. One scalar per
            # round, snapped (cross-engine summation orders differ), then
            # broadcast into the rank update as a 1-row relation.
            dang = (
                pr.join(deg, pr["id"] == deg["src"], "left_anti")
                .agg(
                    F.round(
                        F.coalesce(F.sum("pr"), F.lit(0.0)), snap
                    ).alias("__dang")
                )
            )
            base = base.crossJoin(F.broadcast(dang))
            new_mass = new_mass + F.col("__dang") / n
        pr = base.select(
            nodes["id"],
            F.round(teleport + damping * new_mass, snap).alias("pr"),
        )
        if (
            checkpoint_every
            and (i + 1) % checkpoint_every == 0
            and (i + 1) < iters
        ):
            pr = pr.localCheckpoint(eager=True)
    return pr


def sql_pagerank_round(prev: str, k: int, damping: float = 0.85,
                       snap: int = 8, weighted: bool = False,
                       redistribute: bool = False) -> str:
    """One DuckDB power-iteration CTE group (contrib{k}[, dang{k}], pr{k})
    over the ``edges``/``deg``/``nn`` CTEs — the oracle mirror of
    `pagerank`'s loop body, same snap each round. ``weighted`` expects
    ``edges(src, dst, w)`` and ``deg`` as Σw per src; ``redistribute``
    adds the dangling-mass CTE (prev ranks whose id has no deg row)."""
    share = "p.pr * e.w / g.deg" if weighted else "p.pr / g.deg"
    mass = "coalesce(c.c, 0)"
    dang_cte = ""
    dang_join = ""
    if redistribute:
        dang_cte = f"""
    dang{k} AS (
      SELECT round(coalesce(sum(p.pr), 0), {snap}) AS m
      FROM {prev} p LEFT JOIN deg g ON g.id = p.id
      WHERE g.id IS NULL),"""
        dang_join = f" CROSS JOIN dang{k} dg"
        mass = f"(coalesce(c.c, 0) + dg.m / nn.n)"
    return f"""
    contrib{k} AS (
      SELECT e.dst AS id, sum({share}) AS c
      FROM edges e
      JOIN {prev} p ON p.id = e.src
      JOIN deg g ON g.id = e.src
      GROUP BY e.dst),{dang_cte}
    pr{k} AS (
      SELECT d.doc_id AS id,
             round({1.0 - damping} / nn.n + {damping} * {mass},
                   {snap}) AS pr
      FROM documents d CROSS JOIN nn{dang_join}
      LEFT JOIN contrib{k} c ON c.id = d.doc_id)
    """
