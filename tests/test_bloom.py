"""Bloom prefilter contracts (f76): no false negatives (two-stage ==
exact single-stage), real selectivity on disjoint vocab, bounded filter
size, and the no-corpus-shuffle probe plan."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from borsa_spark.functions.dedup import (
    bloom_bits_fit,
    bloom_decontaminate,
    bloom_prefilter,
    shingles,
)

M = 1 << 14
K = 3


def _docs(spark):
    # ids % 7 == 0 are "benchmark"; doc 8 copies doc 0's text (true
    # overlap), docs 9+ use a disjoint vocabulary (no overlap).
    rows = [(i, " ".join(f"b{i}w{j}" for j in range(12))) for i in (0, 7)]
    rows += [(8, rows[0][1])]
    rows += [
        (i, " ".join(f"c{i}w{j}" for j in range(12))) for i in (9, 10, 11)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBloomDecontaminate:
    def test_matches_exact_plan(self, spark):
        docs = _docs(spark)
        got = {
            (r.doc_id, r.n_shared)
            for r in bloom_decontaminate(
                docs, F.col("id") % 7 == 0, n=8, m_bits=M, k=K
            ).collect()
        }
        sh = shingles(docs, 8)
        bench = sh.filter(F.col("id") % 7 == 0).select("shingle").distinct()
        exact = {
            (r.id, r.n)
            for r in sh.filter(F.col("id") % 7 != 0)
            .join(bench, "shingle")
            .groupBy("id")
            .agg(F.count("*").cast("long").alias("n"))
            .collect()
        }
        assert got == exact
        assert 8 in {d for d, _ in got}  # the copied doc is flagged

    def test_prefilter_is_selective_on_disjoint_vocab(self, spark):
        docs = _docs(spark)
        sh = shingles(docs, 8)
        bench = sh.filter(F.col("id") % 7 == 0).select("shingle").distinct()
        bloom = bloom_bits_fit(bench, "shingle", M, K)
        disjoint = sh.filter(F.col("id") >= 9)
        n_in = disjoint.count()
        n_surv = bloom_prefilter(disjoint, "shingle", bloom, M, K).count()
        # ~10 bench shingles in 2^14 bits: FPR ~ (3*10/16384)^3 ~ 1e-8.
        # Even one survivor would be a 1-in-1e6 event here.
        assert n_in > 0 and n_surv == 0

    def test_filter_relation_is_bounded(self, spark):
        docs = _docs(spark)
        bench = (
            shingles(docs, 8)
            .filter(F.col("id") % 7 == 0)
            .select("shingle")
            .distinct()
        )
        bits = bloom_bits_fit(bench, "shingle", M, K)
        assert bits.count() <= M // 64

    def test_probe_broadcasts_and_stays_python_free(self, spark):
        docs = _docs(spark)
        df = bloom_decontaminate(
            docs, F.col("id") % 7 == 0, n=8, m_bits=M, k=K
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # k probe joins + the exact confirm join, all broadcast
        assert plan.count("BroadcastHashJoin") >= K + 1
        assert "EvalPython" not in plan
