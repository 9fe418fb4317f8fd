"""Unit pins for the hashed-logreg quality classifier (f77): it must
actually LEARN on separable data, be deterministic under repartition,
and keep its training passes off the corpus scan (checkpointed feature
relation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from borsa_spark.functions.classifier import hashed_logreg_scores


def _docs(spark, n=80):
    # separable: positive docs speak ham-bigrams, negatives spam-bigrams
    rows = [
        (
            i,
            ("good clean prose flows here" if i % 2 == 0
             else "buy pills now click spam"),
            "pos" if i % 2 == 0 else "neg",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


class TestHashedLogreg:
    def test_learns_separable_corpus(self, spark):
        out = hashed_logreg_scores(
            _docs(spark), F.col("source") == "pos", iters=6
        ).collect()
        pos = [r.prob for r in out if r.label == 1]
        neg = [r.prob for r in out if r.label == 0]
        assert min(pos) > max(neg)
        assert min(pos) > 0.5 > max(neg)

    def test_deterministic_under_repartition(self, spark):
        docs = _docs(spark)
        a = sorted(
            (r.doc_id, r.prob)
            for r in hashed_logreg_scores(
                docs, F.col("source") == "pos"
            ).collect()
        )
        b = sorted(
            (r.doc_id, r.prob)
            for r in hashed_logreg_scores(
                docs.repartition(7), F.col("source") == "pos"
            ).collect()
        )
        assert a == b

    def test_short_docs_emit_no_row(self, spark):
        docs = spark.createDataFrame(
            [(1, "one two three", "pos"), (2, "solo", "neg")],
            "doc_id long, text string, source string",
        )
        out = hashed_logreg_scores(docs, F.col("source") == "pos")
        assert {r.doc_id for r in out.collect()} == {1}

    def test_scoring_plan_reads_checkpoint_not_corpus(self, spark):
        import contextlib
        import io

        from borsa_spark.queries import QUERIES

        df = QUERIES["f77_logreg_quality_score"](
            spark, "/root/testdata/sf0.001"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        # training checkpointed the feature relation; the returned
        # scoring plan must derive from it (no fresh corpus scan per
        # iteration or per score pass)
        assert "Scan parquet" not in buf.getvalue()


class TestEmptyCorpus:
    def test_all_short_docs_raise_clearly(self, spark):
        import pytest

        # ADVICE r8: n_docs == 0 previously hit a raw ZeroDivisionError
        docs = spark.createDataFrame(
            [(1, "solo", "pos"), (2, "word", "neg")],
            "doc_id long, text string, source string",
        )
        with pytest.raises(ValueError, match="empty feature relation"):
            hashed_logreg_scores(docs, F.col("source") == "pos")
