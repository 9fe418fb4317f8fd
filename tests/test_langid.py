"""Trained char-bigram NB language ID (f85): it must learn the f85
fixture's languages, beat the f4 stopword-argmax heuristic on the same
held-out docs (the whole point of training), and behave sanely on a
tiny handcrafted corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from borsa_spark.functions.langid import (
    LANG_POOLS,
    charngram_nb_langid,
    langid_fixture_spark_sql,
)
from borsa_spark.functions.text import hash_bucket, lang_guess


def _fixture(spark, n=600):
    return spark.range(n).selectExpr(
        "id as doc_id", *langid_fixture_spark_sql()
    )


def _holdout(col):
    return hash_bucket(col, "f85", 10) >= 8


class TestCharngramNb:
    def test_beats_stopword_argmax_on_holdout(self, spark):
        docs = _fixture(spark)
        nb = charngram_nb_langid(
            docs, train=hash_bucket(F.col("doc_id"), "f85", 10) < 8
        ).filter(_holdout(F.col("doc_id")))
        nb_rows = nb.collect()
        nb_acc = sum(r.lang == r.pred for r in nb_rows) / len(nb_rows)

        f4_rows = (
            docs.filter(_holdout(F.col("doc_id")))
            .select("lang", lang_guess(F.col("text")).alias("pred"))
            .collect()
        )
        f4_acc = sum(r.lang == r.pred for r in f4_rows) / len(f4_rows)

        # mode-0 docs (a third) have zero stopwords, where f4's argmax
        # degenerates to 'en'; the trained model reads the char signature
        assert nb_acc > f4_acc, (nb_acc, f4_acc)
        assert nb_acc >= 0.95, nb_acc
        assert f4_acc <= 0.85, f4_acc

    def test_scores_every_doc_not_just_holdout(self, spark):
        docs = _fixture(spark, n=200)
        nb = charngram_nb_langid(
            docs, train=hash_bucket(F.col("doc_id"), "f85", 10) < 8
        )
        assert nb.count() == 200

    def test_handcrafted_separable_corpus(self, spark):
        rows = []
        for i, (lg, pool) in enumerate(LANG_POOLS.items()):
            for j in range(6):
                text = " ".join(pool[(j + k) % len(pool)] for k in range(10))
                rows.append((i * 10 + j, lg, text))
        docs = spark.createDataFrame(
            rows, "doc_id long, lang string, text string"
        )
        # train on doc_id % 10 < 4 (j in 0..3), test the rest
        out = charngram_nb_langid(
            docs, train=(F.col("doc_id") % 10) < 4
        ).filter((F.col("doc_id") % 10) >= 4)
        got = {r.doc_id: (r.lang, r.pred) for r in out.collect()}
        acc = sum(lg == p for lg, p in got.values()) / len(got)
        assert acc == 1.0, got

    def test_short_text_emits_no_row(self, spark):
        docs = spark.createDataFrame(
            [(1, "en", "a"), (2, "en", "the of and in to")],
            "doc_id long, lang string, text string",
        )
        out = charngram_nb_langid(docs, train=F.lit(True))
        assert {r.doc_id for r in out.collect()} == {2}


class TestModelEquivalence:
    """The Spark NB must equal an independent pure-Python NB replay —
    the third implementation, independent of both the DataFrame plan
    and the DuckDB oracle — on randomized small corpora."""

    def _python_nb(self, rows, train_ids, snap=4):
        import math
        from collections import Counter, defaultdict

        def bigrams(t):
            return [t[i:i + 2] for i in range(len(t) - 1)]

        counts = defaultdict(Counter)
        nd = Counter()
        n_train = 0
        for doc_id, lang, text in rows:
            if len(text) < 2 or doc_id not in train_ids:
                continue
            counts[lang].update(bigrams(text))
            nd[lang] += 1
            n_train += 1
        vocab = {bg for c in counts.values() for bg in c}
        v = len(vocab)
        tot = {lg: sum(c.values()) for lg, c in counts.items()}
        preds = {}
        for doc_id, lang, text in rows:
            if len(text) < 2:
                continue
            tf = Counter(bigrams(text))
            best = None
            for lg in sorted(counts):
                s = sum(
                    n * math.log((counts[lg].get(bg, 0) + 1.0)
                                 / (tot[lg] + v))
                    for bg, n in tf.items()
                ) + math.log(nd[lg] / n_train)
                s = round(s, snap)
                # max score, ties to the ascending label
                if best is None or s > best[0]:
                    best = (s, lg)
            preds[doc_id] = (lang, best[1])
        return preds

    def test_random_corpora_match_python_model(self, spark):
        import random

        rng = random.Random(42)
        langs = list(LANG_POOLS)
        for trial in range(3):
            rows = []
            for i in range(60):
                lg = langs[rng.randrange(5)]
                pool = LANG_POOLS[lg]
                n = rng.randrange(2, 12)
                text = " ".join(
                    pool[rng.randrange(len(pool))] for _ in range(n)
                )
                rows.append((i, lg, text))
            train_ids = {i for i in range(60) if i % 5 != trial % 5}
            docs = spark.createDataFrame(
                rows, "doc_id long, lang string, text string"
            )
            got = {
                r.doc_id: (r.lang, r.pred)
                for r in charngram_nb_langid(
                    docs, train=(F.col("doc_id") % 5) != (trial % 5)
                ).collect()
            }
            want = self._python_nb(rows, train_ids)
            assert got == want, f"trial {trial}"
