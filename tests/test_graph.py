"""PageRank (functions/graph.py): hand-checkable fixpoints on tiny graphs
plus the structural properties hub detection relies on."""

from __future__ import annotations

import pyspark.sql.functions as F

from borsa_spark.functions.graph import pagerank


def _pr(spark, edge_rows, node_ids, iters=3):
    edges = spark.createDataFrame(edge_rows, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id long")
    return {
        r["id"]: r["pr"] for r in pagerank(edges, nodes, iters=iters).collect()
    }


class TestPageRank:
    def test_isolated_nodes_hold_teleport_floor(self, spark):
        got = _pr(spark, [(1, 2), (2, 1)], [1, 2, 3])
        assert abs(got[3] - 0.15 / 3) < 1e-8  # teleport only
        assert got[1] == got[2] > got[3]      # symmetric pair above floor

    def test_hub_outranks_leaves(self, spark):
        # star: leaves 2..5 <-> hub 1 (undirected)
        edges = []
        for leaf in (2, 3, 4, 5):
            edges += [(1, leaf), (leaf, 1)]
        got = _pr(spark, edges, [1, 2, 3, 4, 5])
        assert got[1] > got[2]
        assert got[2] == got[3] == got[4] == got[5]

    def test_two_cycle_fixpoint_value(self, spark):
        # A <-> B with damping .85: pr stays at the uniform fixpoint 0.5
        # (each node receives the other's full rank)
        got = _pr(spark, [(1, 2), (2, 1)], [1, 2], iters=5)
        assert abs(got[1] - 0.5) < 1e-8 and abs(got[2] - 0.5) < 1e-8

    def test_mass_bounded(self, spark):
        # without dangling redistribution total mass <= 1 and >= teleport
        got = _pr(spark, [(1, 2)], [1, 2, 3])
        total = sum(got.values())
        assert 0.15 <= total <= 1.0 + 1e-8

    def test_checkpoint_bounds_plan_depth_at_iters_10(self, spark):
        # chain graph 0->1->...->N: 10 iterations with checkpoint_every=3
        # must keep the analyzed plan bounded by the last checkpoint
        # window (<= 3 iterations' joins), not grow linearly with iters.
        n = 5_000
        edges = spark.range(n - 1).selectExpr("id AS src", "id + 1 AS dst")
        nodes = spark.range(n).selectExpr("id")
        pr = pagerank(edges, nodes, iters=10, checkpoint_every=3)
        plan = pr._jdf.queryExecution().analyzed().toString()
        # each iteration contributes 3 Join nodes; 10 unchecked iterations
        # would show ~30 — the last checkpoint at i=9 leaves exactly 1
        joins = plan.count("Join")
        assert joins <= 3 * 3, f"plan kept {joins} joins — lineage not cut"
        # and the ranks still match the uncheckpointed program exactly
        base = {
            r["id"]: r["pr"]
            for r in pagerank(
                edges, nodes, iters=10, checkpoint_every=0
            ).collect()
        }
        got = {r["id"]: r["pr"] for r in pr.collect()}
        assert got == base

    def test_dangling_redistribution_conserves_mass(self, spark):
        # 1 -> 2, node 2 dangling, node 3 isolated: with redistribution
        # total mass stays 1 every round (up to snap); without, it leaks.
        edges = spark.createDataFrame([(1, 2)], "src long, dst long")
        nodes = spark.createDataFrame([(1,), (2,), (3,)], "id long")
        got = {
            r["id"]: r["pr"]
            for r in pagerank(
                edges, nodes, iters=4, redistribute_dangling=True
            ).collect()
        }
        assert abs(sum(got.values()) - 1.0) < 1e-6
        # and the unredistributed variant really does sit below 1
        leaky = sum(
            r["pr"] for r in pagerank(edges, nodes, iters=4).collect()
        )
        assert leaky < 1.0 - 1e-3

    def test_dangling_redistribution_uniform_on_empty_graph(self, spark):
        # no edges: every node is dangling; the textbook recurrence has
        # the uniform distribution as an exact fixpoint.
        edges = spark.createDataFrame([], "src long, dst long")
        nodes = spark.createDataFrame([(i,) for i in range(4)], "id long")
        got = {
            r["id"]: r["pr"]
            for r in pagerank(
                edges, nodes, iters=3, redistribute_dangling=True
            ).collect()
        }
        for v in got.values():
            assert abs(v - 0.25) < 1e-8

    def test_weighted_split_proportional_to_weight(self, spark):
        # 1 -> 2 (w=3), 1 -> 3 (w=1): node 2 receives 3x node 3's share
        # of node 1's rank. One iteration makes the split directly legible.
        edges = spark.createDataFrame(
            [(1, 2, 3.0), (1, 3, 1.0)], "src long, dst long, w double"
        )
        nodes = spark.createDataFrame([(1,), (2,), (3,)], "id long")
        got = {
            r["id"]: r["pr"]
            for r in pagerank(
                edges, nodes, iters=1, weight_col="w"
            ).collect()
        }
        teleport = 0.15 / 3
        share2 = got[2] - teleport
        share3 = got[3] - teleport
        # ranks snap at 8dp, so the 3x comparison carries up to 3 half-ulps
        assert abs(share2 - 3 * share3) < 2e-8

    def test_uniform_weights_match_unweighted(self, spark):
        # constant weights must reduce exactly to the unweighted program
        rows = [(1, 2), (2, 3), (3, 1), (1, 3)]
        edges = spark.createDataFrame(rows, "src long, dst long")
        wedges = spark.createDataFrame(
            [(s, d, 2.5) for s, d in rows], "src long, dst long, w double"
        )
        nodes = spark.createDataFrame([(1,), (2,), (3,)], "id long")
        base = {
            r["id"]: r["pr"] for r in pagerank(edges, nodes, iters=3).collect()
        }
        got = {
            r["id"]: r["pr"]
            for r in pagerank(
                wedges, nodes, iters=3, weight_col="w"
            ).collect()
        }
        assert got == base

    def test_persist_edges_opt_out(self, spark):
        edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
        nodes = spark.createDataFrame([(1,), (2,)], "id long")

        # The global persistent-RDD count is racy: earlier tests' cache
        # entries are released asynchronously by the ContextCleaner, so
        # count-equality can fail if a GC lands between the two reads.
        # Assert no NEW ids appear instead — removals are tolerated.
        def _persistent_ids():
            it = (
                spark.sparkContext._jsc.sc()
                .getPersistentRDDs()
                .keySet()
                .iterator()
            )
            ids = set()
            while it.hasNext():
                ids.add(it.next())
            return ids

        before = _persistent_ids()
        pagerank(edges, nodes, iters=2, persist_edges=False).collect()
        leaked = _persistent_ids() - before
        assert not leaked, f"pagerank leaked cache entries: {leaked}"
