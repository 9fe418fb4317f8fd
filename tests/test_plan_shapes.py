"""Physical-plan regression guards: the perf claims in SCALE.md must stay
true as code evolves — pushdown reaches the scan, dims broadcast, the merge
partially aggregates, and bucketed layouts stay shuffle-free."""

from __future__ import annotations

import contextlib
import io

import pytest

from borsa_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES[name](spark, SF).explain("formatted")
    return buf.getvalue()


def final_plan_of(spark, name: str) -> str:
    """The post-execution AQE plan (collect first so ReusedExchange is
    visible); everything after '== Initial Plan ==' is pre-AQE text."""
    df = QUERIES[name](spark, SF)
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().split("== Initial Plan ==")[0]


class TestPlanShapes:
    def test_q6_filters_pushed_to_scan(self, spark):
        plan = plan_of(spark, "rel_q6_revenue_filter")
        assert "PushedFilters:" in plan
        assert "GreaterThanOrEqual(l_shipdate" in plan
        assert "LessThan(l_quantity" in plan

    def test_q1_column_pruning_and_partial_agg(self, spark):
        plan = plan_of(spark, "rel_q1_pricing_summary")
        # 7 of 11 lineitem columns read
        import re

        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and m.group(1).count(":") == 7
        assert "partial_" in plan  # map-side combine

    def test_q3_broadcasts_dims_and_takeordered(self, spark):
        plan = plan_of(spark, "rel_q3_top_orders")
        assert plan.count("BroadcastHashJoin") >= 2
        assert "TakeOrderedAndProject" in plan  # top-k without global sort

    def test_merge_is_partial_aggregation(self, spark):
        plan = plan_of(spark, "j1_merge_first_wins")
        assert "partial_min_by" in plan  # skew-resilient argmin merge
        assert "row_number" not in plan

    def test_monotonic_gate_single_window_no_udf(self, spark):
        plan = plan_of(spark, "p7_monotonic_gate")
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_events_scan_prunes_columns(self, spark):
        plan = plan_of(spark, "s12_download_summary")
        # only event_type, ts, value should be read (not user_id/event_id)
        import re

        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m is not None
        cols = {c.split(":")[0] for c in m.group(1).split(",")}
        assert "user_id" not in cols

    def test_a5_tz_single_aggregation_no_python(self, spark):
        # tz-aware bucketing is pure JVM expressions: exactly one shuffle
        # (the groupBy), map-side partial combine, no Python in the path.
        plan = plan_of(spark, "a5_tz_daily")
        assert "partial_" in plan
        assert "EvalPython" not in plan
        assert plan.count("Exchange") <= 2  # agg shuffle (+AQE reuse line)

    def test_s11_latest_uses_window_group_limit(self, spark):
        # latest-per-contract should push the rank-1 limit into the shuffle
        # (WindowGroupLimit), not materialize full per-key sorts first.
        plan = plan_of(spark, "s11_option_latest")
        assert "WindowGroupLimit" in plan
        assert "EvalPython" not in plan

    def test_f16_single_arrow_python_stage(self, spark):
        # encode (fixture gen) + decode are two mapInPandas stages and the
        # only Python in the plan; everything around them is JVM-side.
        plan = plan_of(spark, "f16_media_features")
        assert plan.count("ArrowEvalPython") <= 2
        assert "MapInPandas" in plan or "ArrowEvalPython" in plan

    def test_sessionize_single_shuffle(self, spark):
        # lag window, running-sum window, and the session aggregate all
        # reuse ONE user_id exchange (HashPartitioning(user_id) satisfies
        # the (user_id, session_no) clustering requirement).
        import re

        plan = plan_of(spark, "f21_sessionize")
        assert len(set(re.findall(r"Exchange \((\d+)\)", plan))) == 1
        assert "EvalPython" not in plan

    def test_rollup_cascade_two_tiers_two_shuffles(self, spark):
        import re

        plan = plan_of(spark, "a10_rollup_cascade")
        assert len(set(re.findall(r"Exchange \((\d+)\)", plan))) <= 2
        assert "partial_" in plan

    def test_quality_gate_broadcasts_medians(self, spark):
        plan = plan_of(spark, "f23_quality_median_gate")
        assert "BroadcastHashJoin" in plan

    def test_range_join_no_nested_loop(self, spark):
        # the bucketized formulation must never plan a cartesian /
        # broadcast-nested-loop join
        plan = plan_of(spark, "o8_range_join")
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_asof_query_join_free(self, spark):
        plan = plan_of(spark, "o7_asof_join")
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestRound3PlanShapes:
    """Pin the SCALE.md claims for the training-mix stages."""

    def test_stratified_sample_is_pure_filter(self, spark):
        plan = plan_of(spark, "f31_stratified_sample")
        assert "Exchange" not in plan          # zero shuffle
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_intra_doc_repetition_is_scan_speed(self, spark):
        plan = plan_of(spark, "f32_intra_doc_repetition")
        assert "Exchange" not in plan          # in-row array math only
        assert "Generate" not in plan          # no explode

    def test_simhash_inrow_has_no_shuffle(self, spark):
        # round 13: on a NARROW (single-file) input the plan carries
        # exactly one round-robin widen Exchange (widen_if_narrow) so
        # the in-row shingle math runs session-wide; there is still no
        # hash/aggregate shuffle and no explode, and the only Filter
        # below the exchange is the CHEAP word-count predicate — never
        # a duplicated copy of the shingle-build expression
        plan = plan_of(spark, "f8_simhash")
        assert plan.count("Exchange (") == 1  # the widen, nothing else
        assert "RoundRobinPartitioning" in plan
        assert "hashpartitioning" not in plan
        assert "Generate" not in plan
        # the pre-exchange side (scan + cheap filter) must not carry a
        # duplicated copy of the shingle pipeline
        pre_exchange = plan.split("RoundRobinPartitioning")[0]
        assert "array_distinct" not in pre_exchange

    def test_quantized_cosine_broadcasts_and_rank_pushes(self, spark):
        plan = plan_of(spark, "f37_quantized_cosine_topk")
        assert "BroadcastExchange" in plan      # query side broadcast
        assert "WindowGroupLimit" in plan       # top-5 rank pushdown

    def test_packing_python_is_grouped_arrow_only(self, spark):
        plan = plan_of(spark, "f38_sequence_packing")
        assert "FlatMapGroupsInPandas" in plan  # the one sanctioned UDF
        assert "BatchEvalPython" not in plan    # never row-at-a-time


class TestRound4PlanShapes:
    """Pin the round-4 dedup plan claims from SCALE.md."""

    def test_minhash_signature_inrow_is_scan_speed(self, spark):
        from borsa_spark.functions import dedup as dd
        from borsa_spark.sources import load_table

        docs = load_table(spark, SF, "documents")
        sig = dd.minhash_signature_inrow(docs, 3)
        plan = sig._jdf.queryExecution().executedPlan().toString()
        # round 13: a NARROW single-file input carries exactly the
        # round-robin widen Exchange (widen_if_narrow) and nothing
        # else — still no hash/aggregate shuffle, still no explode,
        # and no duplicated shingle build below the exchange
        assert plan.count("Exchange") == 1
        assert "RoundRobinPartitioning" in plan
        assert "hashpartitioning" not in plan
        assert "Generate" not in plan          # no explode
        # toString prints root-first, so the text AFTER the exchange
        # line is the scan side: cheap word-count filter only, never a
        # duplicated shingle build
        assert "array_distinct" not in plan.split(
            "RoundRobinPartitioning")[1]

    def test_f7_signature_not_grouped(self, spark):
        """f7's signature comes from the in-row path: the plan must not
        contain the 60-aggregate groupBy over the exploded relation (one
        hash-aggregate family keyed on id would betray the grouped path).
        The only explodes left are the 12-element band-key arrays."""
        plan = plan_of(spark, "f7_minhash_dedup_pairs")
        # grouped signature would aggregate 60 min() columns; the in-row
        # path computes them as array_min projections instead
        assert "array_min" in plan

    def test_f7_verify_is_array_intersect(self, spark):
        """The exploded shingle relation must not exist anywhere in f7's
        plan: verification joins candidate pairs to the (id, shingles
        array) relation and intersects in-row. A per-shingle explode would
        reintroduce the corpus-sized verify shuffle family."""
        plan = plan_of(spark, "f7_minhash_dedup_pairs")
        assert "array_intersect" in plan
        # every Generate in the plan is a band-key explode (12-element
        # array of band structs), never a shingle explode
        import re

        for args in re.findall(r"Arguments: explode\(([^\n]*)", plan):
            assert "shingle" not in args, args

    def test_star_contraction_rounds_are_logarithmic(self, spark):
        """A 100-link chain converges within ~log2(n)+2 rounds — pinned by
        giving star contraction ONLY 10 rounds (label prop would need 100;
        sim says 100-chain needs 8)."""
        from pyspark.sql import functions as F

        from borsa_spark.functions import dedup as dd

        n = 101
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
        )
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        out = dd.dup_clusters(pairs, nodes, max_iters=10)
        assert out.filter(F.col("comp") == 0).count() == n

    def test_quality_gate_is_scan_speed(self, spark):
        """f43's ensemble gate is pure in-row math: no shuffle, no explode,
        no Python — the plan is a single scan-project pipeline."""
        plan = plan_of(spark, "f43_quality_gate")
        assert "Exchange" not in plan
        assert "Generate" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


class TestRound4RetrievalPlanShapes:
    """Pin the SCALE.md claims for the round-4 retrieval/connector ops."""

    def test_doc_chunks_zero_shuffle(self, spark):
        plan = plan_of(spark, "f44_doc_chunks")
        assert "Exchange" not in plan          # in-row + one explode only
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan

    def test_pii_scrub_is_scan_speed(self, spark):
        plan = plan_of(spark, "f47_pii_scrub")
        assert "Exchange" not in plan
        assert "Generate" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan

    def test_bm25_broadcasts_panel_and_stats(self, spark):
        plan = plan_of(spark, "f45_bm25_topk")
        assert "BroadcastExchange" in plan     # panel + stats broadcast
        assert "CartesianProduct" not in plan  # stats ride a broadcast NLJ

    def test_bpe_pairs_single_corpus_shuffle(self, spark):
        # One corpus-proportional Exchange (the pair groupBy); the rank
        # window's single-partition Exchange runs over the vocab aggregate.
        plan = plan_of(spark, "f49_bpe_pair_counts")
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
        assert plan.count("Exchange hashpartitioning") <= 2

    def test_datasource_history_is_pure_scan(self, spark):
        plan = plan_of(spark, "c1_datasource_history")
        assert "Exchange" not in plan          # per-symbol partitions, no shuffle
        assert "BatchEvalPython" not in plan   # Arrow batch reads


class TestRound4ContinuedPlanShapes:
    """Pin the SCALE.md claims for f52-f54, w11, and the new TPC-H shapes."""

    def test_blocklist_filter_is_scan_speed(self, spark):
        plan = plan_of(spark, "f53_blocklist_filter")
        assert "Exchange" not in plan          # in-row array ops only
        assert "Generate" not in plan          # no explode
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan

    def test_training_order_avoids_global_single_partition(self, spark):
        # The corpus-sized window must partition on the key prefix; the only
        # SinglePartition exchange allowed is the 256-row offset table's.
        plan = plan_of(spark, "f54_training_order")
        assert "hashpartitioning(__bucket" in plan
        assert plan.count("SinglePartition") <= 2  # tree + detail line, once
        assert "BroadcastExchange" in plan     # offsets ride a broadcast

    def test_semdedup_intracluster_join_is_equi(self, spark):
        # Candidate generation must be an equi-join on the cluster id; the
        # only nested-loop joins are the broadcast-tiny centroid assigns.
        plan = plan_of(spark, "f52_semdedup")
        assert "CartesianProduct" not in plan
        # every nested-loop occurrence is the Broadcast variant
        assert plan.count("NestedLoopJoin") == plan.count(
            "BroadcastNestedLoopJoin"
        )

    def test_q17_decorrelated_agg_joins_on_partkey(self, spark):
        plan = plan_of(spark, "rel_q17_small_qty_revenue")
        assert "BroadcastHashJoin" in plan     # brand-filtered part dim
        assert "partial_avg" in plan           # per-part avg combines map-side
        assert "CartesianProduct" not in plan

    def test_q22_anti_join_and_scalar_broadcast(self, spark):
        plan = plan_of(spark, "rel_q22_dormant_balance")
        assert "LeftAnti" in plan
        assert "CartesianProduct" not in plan  # 1-row scalar rides broadcast NLJ

    def test_bollinger_single_symbol_shuffle(self, spark):
        plan = plan_of(spark, "w11_bollinger")
        assert plan.count("Exchange hashpartitioning") <= 1
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan

    def test_macd_single_shuffle_two_windows(self, spark):
        # hourly agg shuffles on symbol once; both window passes reuse the
        # same (symbol, bucket) distribution — no second hash exchange
        plan = plan_of(spark, "w12_macd")
        assert plan.count("hashpartitioning(symbol") <= 1
        assert plan.count("Window") >= 2  # fast/slow pass + signal pass
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan

    def test_q19_disjunction_decomposed_to_both_scans(self, spark):
        # Catalyst must derive each side's OR-of-ANDs implication and push
        # it below the join: quantity ranges reach the lineitem scan,
        # brand+size conjuncts reach the part scan.
        plan = plan_of(spark, "rel_q19_disjunctive_revenue")
        assert "Or(Or(And(GreaterThanOrEqual(l_quantity" in plan
        assert "EqualTo(p_brand,Brand#1)" in plan
        assert "BroadcastHashJoin" in plan

    def test_q21_semi_and_anti_with_prefiltered_probes(self, spark):
        plan = plan_of(spark, "rel_q21_returned_without_discount")
        assert "LeftSemi" in plan and "LeftAnti" in plan
        assert "EqualTo(l_returnflag,R)" in plan      # probe pre-filtered
        assert "GreaterThan(l_discount,0.05)" in plan  # at the scan

    def test_hll_partials_combine_map_side(self, spark):
        plan = plan_of(spark, "x4_hll_sketch_merge")
        assert "partial_hll_sketch_agg" in plan  # sketches build map-side
        assert "partial_hll_union_agg" in plan   # merge combines map-side

    def test_o13_interval_join_compiles_to_equi_join(self, spark):
        # the tumbling-window containment rewrites to an equi-join on the
        # hour bucket — no range/nested-loop join anywhere
        plan = plan_of(spark, "o13_bar_enrich_join")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_q20_prefix_pushes_and_chains_semi_joins(self, spark):
        plan = plan_of(spark, "rel_q20_part_promotion_suppliers")
        assert "StringStartsWith(p_name,red)" in plan  # LIKE 'red%' pushed
        assert plan.count("LeftSemi") >= 2             # the semi-join chain

    def test_q7_dual_role_dims_broadcast_with_derived_pushdown(self, spark):
        # nation joins twice; each role's scan gets the derived
        # single-side implication (n_name = A OR n_name = B) pushed down
        plan = plan_of(spark, "rel_q7_nation_volume")
        assert plan.count("Or(EqualTo(n_name,NATION_") >= 2
        assert "SortMergeJoin" not in plan  # all dims broadcast at this SF
        assert "partial_" in plan

    def test_q8_share_is_one_aggregation_pass(self, spark):
        # numerator (CASE) and denominator fold in the SAME groupBy —
        # exactly one aggregation exchange, no self-join of volume
        import re

        plan = plan_of(spark, "rel_q8_market_share")
        assert "partial_sum" in plan
        agg_exchanges = re.findall(r"Exchange hashpartitioning\(o_year", plan)
        assert len(agg_exchanges) <= 1

    def test_q9_star_broadcasts_every_dim(self, spark):
        plan = plan_of(spark, "rel_q9_nation_year_profit")
        assert plan.count("BroadcastHashJoin") >= 3  # part, supplier, nation
        assert "partial_" in plan

    def test_inverted_index_caps_postings_below_shuffle(self, spark):
        # the postings sample must be capped BEFORE any aggregation buffer
        # exists: row_number() <= cap plans as WindowGroupLimit (one
        # partial instance map-side under the Exchange, one final above),
        # so a stop word's postings never materialize in collect_list's
        # buffer or the window sort. df/cf ride a separate plain groupBy.
        plan = plan_of(spark, "f46_inverted_index")
        assert plan.count("WindowGroupLimit") >= 2  # partial + final
        # the collect_list aggregate must CONSUME the group-limited branch:
        # in the formatted tree parents print before children, so the
        # ObjectHashAggregate (collect_list) line precedes WindowGroupLimit
        assert "ObjectHashAggregate" in plan
        assert plan.index("ObjectHashAggregate") < plan.index("WindowGroupLimit")
        # the stats branch stays a partial-aggregated count/sum
        assert "partial_count" in plan or "partial_sum" in plan

    def test_rolling_corr_windows_are_pair_keyed(self, spark):
        # every window in w10 partitions by (sym_a, sym_b): a global
        # ORDER BY day_idx window would plan an Exchange SinglePartition
        # and collapse the whole panel onto one task
        plan = plan_of(spark, "w10_rolling_corr")
        assert "SinglePartition" not in plan

    def test_pagerank_hub_panel_is_take_ordered(self, spark):
        # the top-100 hub cut plans as TakeOrderedAndProject (per-
        # partition top-k), so the only rank window runs over 100 rows —
        # never a corpus-wide SinglePartition sort
        plan = plan_of(spark, "f56_similarity_pagerank")
        assert "TakeOrderedAndProject" in plan

    def test_weighted_pagerank_dangling_mass_broadcasts(self, spark):
        # f57's dangling-mass scalar must ride into the rank update as a
        # BROADCAST 1-row relation (BroadcastNestedLoopJoin), never a
        # shuffled join of rank rows against the aggregate; the hub
        # panel stays TakeOrdered like f56's
        plan = plan_of(spark, "f57_weighted_pagerank")
        assert "TakeOrderedAndProject" in plan
        assert "BroadcastNestedLoopJoin" in plan

    def test_repetition_signals_prunes_and_partial_aggs(self, spark):
        # unigram stats are in-row; the bigram side is two partial-
        # aggregatable groupBys keyed by doc_id — never a global window
        plan = plan_of(spark, "f64_repetition_signals")
        assert "SinglePartition" not in plan
        assert "partial_" in plan
        import re

        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and m.group(1) == "doc_id:bigint,text:string"

    def test_stratified_sample_is_scan_plus_filter(self, spark):
        # membership is one codegen'd md5 + modulo per row
        # (text.stratified_sample, f31's engine): the whole query must
        # plan as scan -> filter with NO shuffle anywhere
        plan = plan_of(spark, "f31_stratified_sample")
        assert "Exchange" not in plan
        assert "md5" in plan  # the hash runs inside the filter condition

    def test_winnow_single_doc_keyed_shuffle(self, spark):
        # one Exchange hashpartitioning(doc_id) feeds the window AND both
        # phases of the countDistinct rewrite — the fingerprint pipeline
        # never reshuffles and never collapses to a single partition
        plan = plan_of(spark, "f67_winnow_fingerprints")
        assert plan.count("Exchange") <= 2  # tree node + Arguments line
        assert "SinglePartition" not in plan
        assert "windowspecdefinition(doc_id" in plan
        assert "partial_" in plan


class TestRound7PlanShapes:
    def test_url_canon_is_scan_plus_one_shuffle(self, spark):
        # canonicalization is per-row codegen (no Python), the URL here
        # derives from doc_id alone so the scan reads ONE column, and
        # the whole dedup is a single canonical-key groupBy shuffle
        plan = plan_of(spark, "f71_url_canon_dedup")
        assert "EvalPython" not in plan
        assert plan.count("Exchange") <= 2  # tree node + Arguments line
        import re

        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and m.group(1) == "doc_id:bigint"

    def test_paragraph_dedup_partial_aggs_no_single_partition(self, spark):
        plan = plan_of(spark, "f72_paragraph_dedup")
        assert "SinglePartition" not in plan
        assert "partial_" in plan
        assert "EvalPython" not in plan

    def _final_plan(self, spark, name):
        return final_plan_of(spark, name)

    def test_unigram_lm_single_corpus_scan(self, spark):
        # vocab and totals roll up the per-(doc, token) tf exchange, so
        # the executed plan must read the corpus ONCE and reuse the
        # exchange for both derived relations (the 100 TB contract:
        # 1 scan, not 3)
        final = self._final_plan(spark, "f73_unigram_lm_score")
        assert final.count("Scan parquet") == 1
        assert "ReusedExchange" in final

    def test_bigram_backoff_single_corpus_scan(self, spark):
        # bigram/context/unigram LM relations and the scoring side all
        # roll up one per-(doc, flag, w1, w2) tf exchange: 1 scan
        final = self._final_plan(spark, "f78_bigram_backoff_score")
        assert final.count("Scan parquet") == 1
        assert "ReusedExchange" in final

    def test_dsir_single_corpus_scan(self, spark):
        # raw/target distributions and the scoring side all derive from
        # one per-(doc, flag, bucket) tf exchange: 1 scan, not 5
        final = self._final_plan(spark, "f74_dsir_weights")
        assert final.count("Scan parquet") == 1
        assert "ReusedExchange" in final


class TestBpeAndRollupShapes:
    """Round-7 additions: BPE training rounds and the mergeable rollup
    must keep their SCALE.md shapes — vocab-sized partial aggs, 1-row
    TakeOrdered argmax, broadcast merge application, Python-free."""

    def test_bpe_round_is_partial_agg_plus_takeordered(self, spark):
        import contextlib
        import io

        from borsa_spark.functions.bpe import _merge_round, _word_vocab
        from borsa_spark.sources import load_table

        docs = load_table(spark, SF, "documents")
        vocab = _word_vocab(docs, "text")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            _merge_round(vocab).explain("formatted")
        plan = buf.getvalue()
        assert "partial_sum" in plan  # map-side combine on pair counts
        assert "TakeOrderedAndProject" in plan  # argmax, no global sort
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_bpe_merge_application_broadcasts_argmax(self, spark):
        import contextlib
        import io

        from borsa_spark.functions.bpe import (
            _apply_merge,
            _merge_round,
            _word_vocab,
        )
        from borsa_spark.sources import load_table

        docs = load_table(spark, SF, "documents")
        vocab = _word_vocab(docs, "text").localCheckpoint(eager=True)
        best = _merge_round(vocab).localCheckpoint(eager=True)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            _apply_merge(vocab, best).explain("formatted")
        plan = buf.getvalue()
        # 1-row argmax rides as a broadcast relation; the vocab side
        # must not shuffle or sort to apply a merge
        assert "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "Exchange hashpartitioning" not in plan

    def test_rollup_state_is_one_partial_agg(self, spark):
        import contextlib
        import io

        from pyspark.sql import functions as F

        from borsa_spark.operators.rollup import rollup_state
        from borsa_spark.sources import load_table

        ev = load_table(spark, SF, "events")
        ticks = ev.select(
            F.col("event_type").alias("symbol"), "ts", "value",
            F.col("event_id").alias("seq"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rollup_state(ticks).explain("formatted")
        plan = buf.getvalue()
        assert "partial_min_by" in plan  # map-side combine before shuffle
        assert plan.count(" Exchange (") == 1  # exactly one shuffle
        assert "Window" not in plan  # mergeable state needs no windows
        assert "BatchEvalPython" not in plan


class TestRound8PlanShapes:
    def test_html_extract_is_scan_plus_project_zero_shuffle(self, spark):
        # crawl stage zero must run at scan speed: per-row regex/array
        # projection, no Python, no exchange of any kind
        plan = plan_of(spark, "f84_html_extract")
        assert "EvalPython" not in plan
        assert "Exchange" not in plan
        import re

        m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
        assert m and "doc_id:bigint" in m.group(1)

    def test_langid_nb_model_relations_broadcast(self, spark):
        # the NB model (counts/totals/priors/vocab) is bounded by
        # charset^2 x n_langs: every join against the corpus-sized tf
        # relation must be broadcast, never a sort-merge shuffle
        plan = plan_of(spark, "f85_langid_nb")
        assert "SortMergeJoin" not in plan
        assert plan.count("BroadcastHashJoin") >= 3
        assert "BroadcastNestedLoopJoin" in plan  # tiny label panel
        assert "EvalPython" not in plan

    def test_c4_line_filter_is_scan_plus_project_zero_shuffle(self, spark):
        plan = plan_of(spark, "f86_c4_line_filter")
        assert "EvalPython" not in plan
        assert "Exchange" not in plan

    def test_image_band_join_decodes_once(self, spark):
        # the round-9 f90 fix: the band relation is localCheckpointed
        # inside _band_near_pairs, so the pairing join's legs read
        # stored blocks (ExistingRDD) and the PNG-decode MapInPandas
        # subtree appears ZERO times in the join plan — previously it
        # ran once per join side (2x decode, the dominant cost at
        # image-crawl scale)
        plan = plan_of(spark, "f90_image_dhash_pairs")
        assert "MapInPandas" not in plan
        assert "ExistingRDD" in plan

    def test_image_band_guard_broadcasts_bucket_counts(self, spark):
        # the hot-bucket guard's count relation is <= 2048 rows (8
        # bands x 256 byte keys): it must broadcast into the semi-join,
        # never shuffle the band relation a second time
        plan = plan_of(spark, "f91_image_band_guard")
        assert "MapInPandas" not in plan
        assert "BroadcastHashJoin" in plan

    def test_c11_crawl_dag_single_corpus_scan(self, spark):
        # the end-to-end crawl DAG reads the documents parquet ONCE:
        # extraction/cleaning fuse into the scan, the relation persists
        # before the first multi-consumer stage, and every dedup/NB
        # pass reads the cache (explain prints the cached subtree at
        # each reference, so count DISTINCT scan node ids, not lines)
        import re

        plan = plan_of(spark, "c11_crawl_corpus_prep")
        scan_ids = set(re.findall(r"Scan parquet\s+\((\d+)\)", plan))
        assert len(scan_ids) == 1
        assert "EvalPython" not in plan  # all JVM until the argmax
        assert "InMemoryTableScan" in plan

    def test_audio_band_pairing_inherits_image_guards(self, spark):
        # f92 rides the shared _band_near_pairs: decode once
        # (checkpointed band relation, no MapInPandas in the join) and
        # the bucket-count guard broadcasts
        plan = plan_of(spark, "f92_audio_envelope_pairs")
        assert "MapInPandas" not in plan
        assert "ExistingRDD" in plan
        assert "BroadcastHashJoin" in plan

    def test_c12_training_mix_topk_and_bounded_scans(self, spark):
        # the training-mix DAG: the DSIR draw must compile to
        # TakeOrderedAndProject (per-partition k-heaps, never a global
        # sort of the corpus), packing is exactly ONE Arrow-batched
        # FlatMapGroupsInPandas over the k-bounded sample, the k-row
        # pick broadcasts back against docs, and the corpus parquet is
        # read a bounded <= 3 times (features checkpoint + gate + llr;
        # the logreg feature relation itself is an ExistingRDD)
        import re

        plan = plan_of(spark, "c12_training_mix")
        assert "TakeOrderedAndProject" in plan
        pack_ids = set(
            re.findall(r"FlatMapGroupsInPandas\s+\((\d+)\)", plan)
        )
        assert len(pack_ids) == 1
        scan_ids = set(re.findall(r"Scan parquet\s+\((\d+)\)", plan))
        assert len(scan_ids) <= 3
        assert "ExistingRDD" in plan
        assert "SortMergeJoin" not in plan

    def test_q11_q15_dual_consumer_aggregates_run_once(self, spark):
        # both queries feed one aggregated relation to TWO consumers
        # (the relation itself + a broadcast scalar over it); Spark
        # does not reuse the subtree by itself (round-9 audit: 6 and 3
        # parquet scans, zero ReusedExchange), so the relation persists
        # — pin one scan per table and the cache on both read paths
        import re

        for name, n_tables in (
            ("rel_q11_important_stock", 3),
            ("rel_q15_top_supplier", 2),
        ):
            plan = plan_of(spark, name)
            scan_ids = set(
                re.findall(r"\((\d+)\)\s+Scan parquet", plan)
            )
            assert len(scan_ids) == n_tables, name
            imts = set(
                re.findall(r"\((\d+)\)\s+InMemoryTableScan", plan)
            )
            assert len(imts) == 2, name
            spark.catalog.clearCache()

    def test_iterative_trainers_cut_lineage(self, spark):
        # round-9 executed-plan audit fixes: kmeans persists its
        # feature relation and checkpoints the k-row centroids per
        # round (f52 ran TEN embedding scans before; now the pair
        # stage reads 2 scans + the persisted m on both sides)
        import re

        for name, max_scans in (
            ("f52_semdedup", 2),
            ("f20_kmeans_clusters", 1),
        ):
            plan = plan_of(spark, name)
            scan_ids = set(
                re.findall(r"\((\d+)\)\s+Scan parquet", plan)
            )
            assert len(scan_ids) <= max_scans, (name, len(scan_ids))
            assert "ExistingRDD" in plan, name
            spark.catalog.clearCache()

    def test_langid_runtime_reuse(self, spark):
        # f85's round-9 final form: train-side quantities are
        # CONDITIONAL sums over the shared tf exchange (the f74/f78
        # de-canonicalization rule — a pushed-down train filter
        # specialized every consumer's scan: 7 real corpus scans,
        # zero reuse, final-plan verified). The FINAL AQE plan must
        # hold at <= 3 scans (scores' full-width explode + counts'
        # pruned explode variant Catalyst collapses to, + the light
        # pre-explode doc-count scan) with ReusedExchange live.
        # Checkpoint (3 eager scans) and tf-persist (10x text bytes)
        # forms were measured and rejected this round.
        final = final_plan_of(spark, "f85_langid_nb")
        assert final.count("Scan parquet") <= 3
        assert "ReusedExchange" in final
        spark.catalog.clearCache()

    def test_self_join_intermediates_persist(self, spark):
        # round-9 audit, second batch: relations feeding a df-cap agg
        # plus both sides of a self-join (f61 anchors, f68
        # fingerprints, f5's deliberate-quadratic shingles), a
        # vocab-sized aggregate with four consumers (f42), and the
        # bloom bench set probed by k chained broadcast joins (f76)
        # all persist — the corpus text scan appears once (f76: once
        # per side of the bench/corpus split)
        import re

        for name, max_scans in (
            ("f61_substring_spans", 1),
            ("f5_ngram_jaccard_pairs", 1),
            ("f68_winnow_pairs", 1),
            ("f42_source_kl_divergence", 1),
            ("f76_bloom_decontaminate", 2),
        ):
            plan = plan_of(spark, name)
            scan_ids = set(
                re.findall(r"\((\d+)\)\s+Scan parquet", plan)
            )
            assert len(scan_ids) <= max_scans, (name, len(scan_ids))
            spark.catalog.clearCache()

    def test_f93_candidate_spans_anchor_restriction(self, spark):
        # the two-stage extractor must build anchors only for
        # candidate docs and read the persisted anchor relation on
        # both join sides; the pair list itself persists (three
        # consumers). The left-semi restriction is asserted on the
        # anchor relation's own plan (the query plan hides it inside
        # the InMemoryRelation).
        import contextlib
        import io
        import re

        from borsa_spark.functions.dedup import (
            _span_anchors,
            repeated_substring_spans_for_pairs,  # noqa: F401
        )
        from borsa_spark.sources import load_table

        plan = plan_of(spark, "f93_candidate_substring_spans")
        imts = set(re.findall(r"\((\d+)\)\s+InMemoryTableScan", plan))
        assert len(imts) >= 3  # anchors x2 sides + pairs
        spark.catalog.clearCache()
        # rebuild the restricted anchor relation the way the function
        # does and pin the semi-join gate in ITS plan
        docs = load_table(spark, SF, "documents")
        pairs = spark.createDataFrame(
            [(1, 2)], "id_a long, id_b long"
        )
        ids = (
            pairs.select(pairs.id_a.alias("id"))
            .unionByName(pairs.select(pairs.id_b.alias("id")))
            .distinct()
        )
        anch = _span_anchors(docs, 5, "text", "doc_id").join(
            ids, "id", "left_semi"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            anch.explain("formatted")
        assert "LeftSemi" in buf.getvalue()


class TestRound10PlanShapes:
    """Final-AQE-plan guards for the round-10 queries (the audit that
    wrote them caught c13's node list re-running the decode outside
    the checkpoint — these pin the fixed shapes)."""

    def test_f94_rewrite_bounded_scans_and_jvm_only(self, spark):
        # span removal reads the corpus parquet at most twice (screen
        # lineage + the rewrite scan; anchors ride the persisted
        # relations, visible as TableCacheQueryStage), and the cut is
        # a JVM higher-order filter — no Python anywhere
        import re

        plan = final_plan_of(spark, "f94_span_removal_rewrite")
        scan_ids = set(re.findall(r"Scan parquet\s+\((\d+)\)", plan))
        assert len(scan_ids) <= 2
        assert "TableCacheQueryStage" in plan
        assert "EvalPython" not in plan
        assert "MapInPandas" not in plan
        spark.catalog.clearCache()

    def test_f95_single_corpus_scan(self, spark):
        # the capped minhash default keeps f7's shape: one corpus scan
        # (persisted shingle-array relation feeds signature fold and
        # both verify sides), candidates equi-join only
        import re

        plan = final_plan_of(spark, "f95_minhash_crawl_guard")
        scan_ids = set(re.findall(r"Scan parquet\s+\((\d+)\)", plan))
        assert len(scan_ids) == 1
        assert "MapInPandas" not in plan
        assert "EvalPython" not in plan
        spark.catalog.clearCache()

    def test_c13_decodes_once_into_checkpoint(self, spark):
        # the decode subtree must be cut by the band-relation
        # localCheckpoint (ExistingRDD) and NOT re-run for the node
        # list — nodes come from the docs scan (1 parquet scan total)
        import re

        plan = final_plan_of(spark, "c13_image_crawl_clusters")
        scan_ids = set(re.findall(r"Scan parquet\s+\((\d+)\)", plan))
        assert len(scan_ids) == 1
        assert "ExistingRDD" in plan
        assert "MapInPandas" not in plan
        spark.catalog.clearCache()


class TestRound11PlanShapes:
    def test_warc_read_is_one_datasource_scan(self, spark, tmp_path):
        # the WARC relation (round 13: rewired onto the registered
        # `warc` Python Data Source): ONE BatchScan and nothing else
        # Python-side — no binaryFile materialization, no MapInPandas
        # stage; the html funnel's type/status/content-type gates sit
        # ABOVE the scan as plain filters (map-only, no shuffle)
        from pyspark.sql import functions as F

        from borsa_spark.sources import warc as W

        W.write_warc_files(
            spark.range(8).select(
                F.col("id"), (F.col("id") % 2).alias("__file")
            ),
            str(tmp_path),
            _warc_rec,
        )
        rel = W.read_warc(spark, str(tmp_path))
        docs = W.warc_html_docs(rel)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            docs.explain("formatted")
        plan = buf.getvalue()
        import re

        assert len(re.findall(r"\(\d+\) BatchScan warc", plan)) == 1
        assert "MapInPandas" not in plan  # the walk IS the scan now
        assert "Exchange" not in plan  # record walk + gates: map-only
        assert "BatchEvalPython" not in plan  # Arrow path, never pickled
        # splitting off: one task per file, the Common Crawl unit
        assert rel.rdd.getNumPartitions() == 2

    def test_f97_model_relations_broadcast_corpus_never_self_joins(
        self, spark
    ):
        # residual IVFPQ: the code table joins BROADCAST model
        # relations (probed lists + per-list query tables); the only
        # corpus-keyed aggregation families are the encode argmin and
        # the (q, vec) ADC partial agg — no corpus self-join exists
        plan = final_plan_of(spark, "f97_ivfpq_residual_topk")
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
        assert "SortMergeJoin" not in plan
        spark.catalog.clearCache()


def _warc_rec(row):
    from borsa_spark.sources import warc as W

    yield W.warc_record(
        "response",
        {"WARC-Target-URI": f"http://x/{row['id']}",
         "Content-Type": "application/http; msgtype=response"},
        W.http_response(200, "OK", {"Content-Type": "text/html"},
                        b"<p>plan fixture body long enough here.</p>"),
    )


def _plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestRound12PlanShapes:
    @staticmethod
    def _fixture(spark, tmp_path, n=64):
        from pyspark.sql import functions as F

        from borsa_spark.sources import warc as W

        W.write_warc_files(
            spark.range(n).select(
                F.col("id"), (F.col("id") % 2).alias("__file")
            ),
            str(tmp_path), _warc_rec,
        )
        return str(tmp_path)

    def test_split_read_is_one_scan_task_per_byte_range(self, spark,
                                                        tmp_path):
        # the split reader (round 13: rewired onto the `warc` Data
        # Source): byte ranges ARE the input partitions of ONE
        # BatchScan — the old round-robin fan-out exchange over a
        # (path,start,end) relation is GONE, zero shuffles; partitions
        # = split count
        import os

        from borsa_spark.sources import warc as W

        d = self._fixture(spark, tmp_path)
        [fname] = [x for x in os.listdir(d) if x.endswith(".warc.gz")
                   and "part-0" in x]
        path = os.path.join(d, fname)
        split = max(64, os.path.getsize(path) // 5)
        parts = W.read_warc_split(spark, path, split_bytes=split)
        plan = _plan_str(parts)
        import re

        assert len(re.findall(r"\(\d+\) BatchScan warc", plan)) == 1
        assert "MapInPandas" not in plan
        assert "Exchange" not in plan  # the fan-out shuffle is gone
        assert "BatchEvalPython" not in plan
        n_splits = -(-os.path.getsize(path) // split)
        assert parts.rdd.getNumPartitions() == n_splits > 1

    def test_cdx_filter_prunes_before_any_fetch_io(self, spark,
                                                   tmp_path):
        # index -> arbitrary predicate -> point fetch: the predicate
        # must sit between the two Arrow walks (filter the INDEX, not
        # the fetched records), and the fetch side's only exchanges
        # are the distinct + the by-file repartition
        from pyspark.sql import functions as F

        from borsa_spark.sources import warc as W

        d = self._fixture(spark, tmp_path)
        idx = W.warc_cdx(spark, d)
        picked = idx.filter(F.col("target_uri").endswith("7"))
        fetched = W.fetch_records(picked)
        plan = _plan_str(fetched)
        import re

        walks = [m.start() for m in re.finditer(r"\(\d+\) MapInPandas",
                                                plan)]
        assert len(walks) == 2  # index walk + fetch walk, nothing more
        filt = plan.find("Filter")
        assert filt >= 0
        assert "BatchEvalPython" not in plan
        # the fetch input carries ONLY (warc_file, offset): column
        # pruning reached the index walk's projection
        assert "hashpartitioning(warc_file" in plan


def _host_rec(row):
    """Multi-host record maker for the columnar-index plan tests:
    host varies with id so the SURT range partitioning has real key
    spread."""
    from borsa_spark.sources import warc as W

    i = row["id"]
    yield W.warc_record(
        "response",
        {"WARC-Target-URI": f"https://h{i % 7:02d}.example.org/p/{i}",
         "Content-Type": "application/http; msgtype=response"},
        W.http_response(200, "OK", {"Content-Type": "text/html"},
                        b"<p>plan fixture body long enough here.</p>"),
    )


class TestRound13PlanShapes:
    @staticmethod
    def _index(spark, tmp_path, n=96, index_files=3):
        from pyspark.sql import functions as F

        from borsa_spark.sources import warc as W

        warc_dir = str(tmp_path / "warc")
        idx_dir = str(tmp_path / "cdx")
        W.write_warc_files(
            spark.range(n).select(
                F.col("id"), (F.col("id") % 2).alias("__file")
            ),
            warc_dir, _host_rec,
        )
        W.write_cdx_index(W.warc_cdx(spark, warc_dir), idx_dir,
                          index_files=index_files)
        return idx_dir

    def test_lookup_pushes_startswith_into_the_parquet_scan(
            self, spark, tmp_path):
        # the whole point of the sorted columnar index: a prefix
        # lookup must reach the scan as a pushed StringStartsWith
        # (min/max row-group + file pruning), one scan, no shuffle,
        # no Python
        import re

        from borsa_spark.sources import warc as W

        idx_dir = self._index(spark, tmp_path)
        hit = W.lookup_cdx(W.read_cdx_index(spark, idx_dir),
                           "org,example,h03)")
        plan = _plan_str(hit)
        assert re.search(r"PushedFilters:.*StringStartsWith\(surt",
                         plan), plan
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
        assert "Exchange" not in plan
        assert "MapInPandas" not in plan
        assert "BatchEvalPython" not in plan

    def test_index_files_are_disjoint_and_row_groups_sorted(
            self, spark, tmp_path):
        # what makes the pruning REAL, asserted from the parquet
        # footers themselves: every output file owns a disjoint surt
        # range (repartitionByRange) and row-group stats are tight
        # (sortWithinPartitions) — min/max pruning follows from
        # parquet semantics, no Spark internals needed
        import glob
        import os

        import pyarrow.parquet as pq

        idx_dir = self._index(spark, tmp_path)
        spans = []
        for f in glob.glob(os.path.join(idx_dir, "part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            col = [md.schema.column(i).name
                   for i in range(md.num_columns)].index("surt")
            groups = []
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(col).statistics
                assert st is not None and st.has_min_max
                groups.append((st.min, st.max))
            # row groups sorted and non-overlapping within the file
            for (lo1, hi1), (lo2, hi2) in zip(groups, groups[1:]):
                assert hi1 <= lo2
            if groups:
                spans.append((groups[0][0], groups[-1][1]))
        assert len(spans) >= 2  # the range exchange really spread
        spans.sort()
        for (_, hi), (lo, _) in zip(spans, spans[1:]):
            assert hi <= lo  # files own disjoint surt ranges

    def test_host_rollup_never_touches_payload_bytes(self, spark,
                                                     tmp_path):
        # the c16 shape: host analytics from the index alone — one
        # parquet scan, zero WARC walks (MapInPandas absent), one
        # aggregate exchange keyed on the host projection
        import re

        from pyspark.sql import functions as F

        from borsa_spark.sources import warc as W

        idx_dir = self._index(spark, tmp_path)
        rollup = (
            W.read_cdx_index(spark, idx_dir)
            .filter(F.col("warc_type") == "response")
            .groupBy(F.regexp_extract("surt", r"^([^):]*)", 1)
                     .alias("surt_host"))
            .agg(F.count("*").alias("n_pages"))
        )
        plan = _plan_str(rollup)
        assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
        assert "MapInPandas" not in plan
        assert "BatchEvalPython" not in plan
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
        # partial aggregation below the exchange (map-side combine)
        assert plan.find("HashAggregate") < plan.find("Exchange")

    def test_robots_eval_has_one_parse_subtree_and_one_join(
            self, spark):
        # parse_robots must not re-evaluate the windowed lines subtree
        # per consumer (the agents-join form planned 5 Window nodes /
        # 2 parses; the collect+explode form plans exactly 3: lag +
        # group-id sum + the group-selection max), and evaluation is
        # ONE equi-join with zero Python
        import re

        from pyspark.sql import functions as F

        from borsa_spark.functions.robots import (parse_robots,
                                                  robots_eval)

        robots = spark.createDataFrame(
            [("h.example.org",
              "User-agent: *\nDisallow: /a\nUser-agent: b\nAllow: /b")],
            "host string, robots_txt string",
        )
        urls = spark.range(64).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("https://h.example.org/p/"),
                     F.col("id")).alias("url"),
        )
        out = robots_eval(urls, parse_robots(robots), "b")
        plan = _plan_str(out)
        assert len(re.findall(r"\(\d+\) Window", plan)) == 3
        joins = re.findall(r"\(\d+\) (\w*Join\w*)", plan)
        assert len(joins) == 1
        assert "BatchEvalPython" not in plan
        assert "MapInPandas" not in plan
        assert "CartesianProduct" not in plan


class TestWidenGuardsR14:
    """Round-14 hardening of `widen_if_narrow` (r13 verdict #5 +
    ADVICE): the round-robin widen is strictly a SMALL-narrow-input
    fix — it must not stack on composed use and must not fire on a
    relation whose bytes already yield a parallelism-wide scan."""

    def test_widen_does_not_stack(self, spark):
        from borsa_spark.functions import dedup as dd
        from borsa_spark.sources import load_table

        docs = load_table(spark, SF, "documents")
        once = dd.widen_if_narrow(docs)
        twice = dd.widen_if_narrow(once)
        assert twice is once  # short-circuit, not a second exchange
        plan = twice._jdf.queryExecution().executedPlan().toString()
        assert plan.count("RoundRobinPartitioning") == 1

    def test_widen_skips_when_bytes_already_scan_wide(self, spark):
        from borsa_spark.functions import dedup as dd
        from borsa_spark.sources import load_table

        prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
        # force "huge relation" semantics: at 1 KiB splits the ~600 KB
        # single-file documents table already scans wider than
        # defaultParallelism, so the exchange would buy nothing
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
        try:
            docs = load_table(spark, SF, "documents")
            out = dd.widen_if_narrow(docs)
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "RoundRobinPartitioning" not in plan
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", prev)

    def test_widen_still_fires_on_narrow_local_input(self, spark):
        from borsa_spark.functions import dedup as dd
        from borsa_spark.sources import load_table

        docs = load_table(spark, SF, "documents")
        plan = dd.widen_if_narrow(docs)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "RoundRobinPartitioning" in plan
