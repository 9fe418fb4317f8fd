"""Property-based model equivalence for the round-6 text operators:
repetition_signals and winnow_fingerprints vs pure-Python reference
models over machine-chosen word sequences (tiny alphabet to force
repetition, empty-ish docs, single words). One Spark run per example
batch keeps the fuzz affordable."""

from __future__ import annotations

import hashlib
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from borsa_spark.functions import text as tx

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

# small alphabet -> dense repetition; sizes cover the k+w-1 boundary
DOC = st.lists(
    st.sampled_from(["a", "b", "c", "ab"]), min_size=1, max_size=24
)
BATCH = st.lists(DOC, min_size=1, max_size=6)


def model_repetition(words):
    bigrams = Counter(
        f"{words[i]} {words[i + 1]}" for i in range(len(words) - 1)
    )
    top = max(bigrams.values()) if bigrams else 0
    return (
        len(words),
        len(set(words)),
        top,
        sum(bigrams.values()),
    )


def model_winnow(words, k, w):
    if len(words) < k + w - 1:
        return None
    hs = [
        hashlib.md5(" ".join(words[i : i + k]).encode()).hexdigest()
        for i in range(len(words) - k + 1)
    ]
    fps = [min(hs[i : i + w]) for i in range(len(hs) - w + 1)]
    return (len(hs), len(set(fps)), min(fps), max(fps))


class TestRepetitionModelEquivalence:
    @SET
    @given(batch=BATCH)
    def test_matches_counter_model(self, spark, batch):
        docs = spark.createDataFrame(
            [(i, " ".join(ws)) for i, ws in enumerate(batch)],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_words, r.n_distinct, r.top_c, r.n_bigrams)
            for r in tx.repetition_signals(docs).collect()
        }
        for i, ws in enumerate(batch):
            assert got[i] == model_repetition(ws), ws


class TestWinnowModelEquivalence:
    @SET
    @given(batch=BATCH, k=st.integers(1, 3), w=st.integers(1, 4))
    def test_matches_sliding_model(self, spark, batch, k, w):
        docs = spark.createDataFrame(
            [(i, " ".join(ws)) for i, ws in enumerate(batch)],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_grams, r.n_fp, r.min_fp, r.max_fp)
            for r in tx.winnow_fingerprints(docs, k=k, w=w).collect()
        }
        for i, ws in enumerate(batch):
            want = model_winnow(ws, k, w)
            if want is None:
                assert i not in got, (ws, k, w)
            else:
                assert got[i] == want, (ws, k, w)
