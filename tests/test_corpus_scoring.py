"""Unit pins for the corpus-scoring / paragraph-dedup family (f72-f74):
hand-computed expectations on constructed corpora, independent of the
DuckDB oracle replay (which re-runs the same math at sf scale)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from borsa_spark.functions.dedup import paragraph_dedup_stats
from borsa_spark.functions.text import (
    dsir_importance_weights,
    unigram_logprob_scores,
)


def _words(tag: str, n: int) -> str:
    return " ".join(f"{tag}{i}" for i in range(n))


PARA_A = _words("a", 12)
PARA_C = _words("c", 3)
PARA_D = _words("d", 12)
PARA_E = _words("e", 12)


class TestParagraphDedup:
    def test_counts(self, spark):
        rows = [
            (1, PARA_A + " " + _words("b", 12)),   # A shared with doc 2
            (2, PARA_A + " " + PARA_C),            # A + 3-word tail chunk
            (3, PARA_D),                           # unique single para
            (4, PARA_E + " " + PARA_E),            # self-repeat only
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: (r.n_paras, r.n_dup_paras, r.n_words, r.n_dup_words)
            for r in paragraph_dedup_stats(docs, para_words=12).collect()
        }
        assert out == {
            1: (2, 1, 24, 12),
            2: (2, 1, 15, 12),
            3: (1, 0, 12, 0),
            # df counts DISTINCT docs: a paragraph repeated only within
            # one document is not corpus-duplicated.
            4: (2, 0, 24, 0),
        }


class TestUnigramLogprob:
    def test_exact_tiny_corpus(self, spark):
        # counts: a=2 b=2 c=1; N=5, V=3 -> p(a)=p(b)=3/8, p(c)=2/8
        docs = spark.createDataFrame(
            [(1, "a a b"), (2, "b c")], "doc_id long, text string"
        )
        out = {
            r.doc_id: (r.n_tokens, r.avg_logprob)
            for r in unigram_logprob_scores(docs).collect()
        }
        assert out[1] == (3, round(math.log(3 / 8), 4))
        assert out[2] == (
            2, round((math.log(3 / 8) + math.log(2 / 8)) / 2, 4)
        )


class TestDsirWeights:
    def test_target_vocab_scores_higher(self, spark):
        rows = [
            (1, "aa bb aa bb aa", "tgt"),
            (2, "cc dd cc dd cc", "raw"),
            # same features as the target doc, but NOT in the target
            # set: llr is a pure function of content, so it must equal
            # doc 1's weight exactly.
            (3, "aa bb aa bb aa", "raw"),
            (4, "solo", "raw"),  # < 2 tokens -> no features, no row
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        out = {
            r.doc_id: (r.n_bigrams, r.llr)
            for r in dsir_importance_weights(
                docs, F.col("source") == "tgt"
            ).collect()
        }
        assert set(out) == {1, 2, 3}
        assert out[1][0] == 4 and out[2][0] == 4
        assert out[3] == out[1]
        assert out[1][1] > out[2][1]


class TestBigramBackoff:
    def test_exact_tiny_corpus(self, spark):
        from borsa_spark.functions.text import bigram_backoff_scores

        # train = docs 1,2. Train bigram counts: (a,b)=2 (b,a)=2
        # (b,c)=1; derived ctx: a=2 b=3 x=0; uni: b=2 a=2 c=1 x=0 y=0;
        # N=5, V=3. Seen: s(a,b)=2/2 s(b,a)=2/3 s(b,c)=1/3; unseen
        # backoff: 0.4*(0+1)/(5+3) = 0.05 for (b,x) and (x,y).
        docs = spark.createDataFrame(
            [(1, "a b a b a"), (2, "b c"), (3, "a b x y")],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: (r.n_bigrams, r.avg_logscore)
            for r in bigram_backoff_scores(
                docs, F.col("doc_id") != 3
            ).collect()
        }
        assert out[1] == (4, round(math.log(2 / 3) / 2, 4))
        assert out[2] == (1, round(math.log(1 / 3), 4))
        assert out[3] == (3, round(2 * math.log(0.05) / 3, 4))

    def test_heldout_scores_below_train(self, spark):
        from borsa_spark.functions.text import bigram_backoff_scores

        # identical content scores identically regardless of split
        # membership; a doc full of unseen bigrams scores lower.
        docs = spark.createDataFrame(
            [
                (1, "p q p q p q"),
                (2, "p q p q p q"),
                (3, "zz yy xx ww"),
            ],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: r.avg_logscore
            for r in bigram_backoff_scores(
                docs, F.col("doc_id") == 1
            ).collect()
        }
        assert out[1] == out[2]
        assert out[3] < out[1]


class TestDsirGumbelTopk:
    def _docs(self, spark, n=60):
        rows = [
            (i, f"w{i % 7} w{(i + 1) % 7} w{(i + 2) % 5} w{i % 3}",
             "tgt" if i % 5 == 0 else "raw")
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )

    def test_deterministic_under_repartition(self, spark):
        from borsa_spark.functions.text import dsir_gumbel_topk

        docs = self._docs(spark)
        tgt = F.col("source") == "tgt"
        a = {r.doc_id for r in dsir_gumbel_topk(docs, tgt, k=10).collect()}
        b = {
            r.doc_id
            for r in dsir_gumbel_topk(
                docs.repartition(7), tgt, k=10
            ).collect()
        }
        assert a == b and len(a) == 10

    def test_new_salt_draws_a_different_sample(self, spark):
        from borsa_spark.functions.text import dsir_gumbel_topk

        docs = self._docs(spark)
        tgt = F.col("source") == "tgt"
        a = {r.doc_id for r in dsir_gumbel_topk(docs, tgt, k=10).collect()}
        b = {
            r.doc_id
            for r in dsir_gumbel_topk(
                docs, tgt, k=10, salt="other"
            ).collect()
        }
        assert a != b  # independent draw (also re-salts the features)

    def test_topk_is_take_ordered_not_global_sort(self, spark):
        import contextlib
        import io

        from borsa_spark.functions.text import dsir_gumbel_topk

        docs = self._docs(spark)
        df = dsir_gumbel_topk(docs, F.col("source") == "tgt", k=10)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        assert "TakeOrderedAndProject" in buf.getvalue()
