"""Retrieval ops (functions/retrieval.py) + PII scrub (functions/text.py).

The registry queries f44-f47 pin these against the DuckDB oracle on the
fixture corpus; these tests pin the behavior the clean corpus cannot
witness — dirty PII text, chunk-boundary math, postings caps, BM25
ordering — on constructed rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from borsa_spark.functions.retrieval import (
    bm25_topk,
    doc_chunks,
    inverted_index,
)
from borsa_spark.functions.text import pii_scrub


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDocChunks:
    def test_chunk_boundary_math(self, spark):
        # 10 tokens, window 4, stride 3: chunks at 0,3,6 cover to token 10
        # -> ceil((10-4)/3)+1 = 3 chunks; last is the 4-token tail 6..9.
        docs = _docs(spark, [(1, " ".join(f"t{i}" for i in range(10)))])
        got = doc_chunks(docs, window=4, stride=3).orderBy("chunk_idx").collect()
        assert [(r.chunk_idx, r.start_tok, r.n_tokens) for r in got] == [
            (0, 0, 4),
            (1, 3, 4),
            (2, 6, 4),
        ]

    def test_short_doc_is_one_chunk(self, spark):
        docs = _docs(spark, [(1, "a b")])
        got = doc_chunks(docs, window=4, stride=3).collect()
        assert len(got) == 1 and got[0].n_tokens == 2

    def test_tail_shorter_than_window(self, spark):
        # 11 tokens, window 4, stride 3 -> chunks 0,3,6,9; last has 2 tokens.
        docs = _docs(spark, [(1, " ".join("x" * 1 for _ in range(11)))])
        got = doc_chunks(docs, window=4, stride=3).orderBy("chunk_idx").collect()
        assert [r.n_tokens for r in got] == [4, 4, 4, 2]

    def test_invalid_params(self, spark):
        with pytest.raises(ValueError):
            doc_chunks(_docs(spark, [(1, "a")]), window=0)


class TestInvertedIndex:
    def test_postings_cap_keeps_true_df(self, spark):
        rows = [(i, "common word") for i in range(30)]
        got = {
            r.term: r
            for r in inverted_index(_docs(spark, rows), postings_cap=5).collect()
        }
        assert got["common"].df == 30 and got["common"].cf == 30
        assert got["common"].postings == "0,1,2,3,4"  # capped, ascending

    def test_cf_counts_occurrences(self, spark):
        got = inverted_index(_docs(spark, [(7, "a a a b")])).collect()
        by = {r.term: r for r in got}
        assert by["a"].df == 1 and by["a"].cf == 3 and by["b"].cf == 1


class TestBM25:
    def test_rarer_term_scores_higher(self, spark):
        rows = [(1, "rare common"), (2, "common filler"), (3, "common junk")]
        panel = [(1, "rare"), (2, "common")]
        got = bm25_topk(_docs(spark, rows), panel=panel, k=3).collect()
        rare_hits = [r for r in got if r.query_id == 1]
        common_hits = [r for r in got if r.query_id == 2]
        assert [r.doc_id for r in rare_hits] == [1]
        assert len(common_hits) == 3
        # idf of the corpus-wide term is lower than the singleton term's
        assert rare_hits[0].score > max(r.score for r in common_hits)

    def test_rank_deterministic_on_ties(self, spark):
        rows = [(5, "tie x"), (3, "tie y"), (4, "tie z")]
        got = bm25_topk(_docs(spark, rows), panel=[(1, "tie")], k=3).collect()
        # identical tf/dl -> identical score; doc_id breaks the tie
        assert [r.doc_id for r in sorted(got, key=lambda r: r.rank)] == [3, 4, 5]


class TestPiiScrub:
    DIRTY = [
        (1, "contact bob.smith+x@example.co.uk or 555-123-4567 today"),
        (2, "ssn 123-45-6789 leaked from 10.0.0.1 twice: 123-45-6789"),
        (3, "clean text with no identifiers at all"),
    ]

    def test_counts(self, spark):
        got = {r.doc_id: r for r in pii_scrub(_docs(spark, self.DIRTY)).collect()}
        assert (got[1].n_email, got[1].n_phone) == (1, 1)
        assert (got[2].n_ssn, got[2].n_ipv4) == (2, 1)
        assert (
            got[3].n_email,
            got[3].n_ssn,
            got[3].n_phone,
            got[3].n_ipv4,
        ) == (0, 0, 0, 0)

    def test_redaction_hash_changes_only_dirty_docs(self, spark):
        docs = _docs(spark, self.DIRTY)
        got = {r.doc_id: r.redacted_hash for r in pii_scrub(docs).collect()}
        plain = {
            r.doc_id: r.h
            for r in docs.select("doc_id", F.md5("text").alias("h")).collect()
        }
        assert got[1] != plain[1] and got[2] != plain[2]
        assert got[3] == plain[3]

    def test_redacted_text_has_tags(self, spark):
        # Re-run the replacement chain directly to inspect the text form.
        from borsa_spark.functions.text import PII_PATTERNS

        red = F.col("text")
        for tag, pat in PII_PATTERNS:
            red = F.regexp_replace(red, pat, f"[{tag}]")
        out = {
            r.doc_id: r.red
            for r in _docs(spark, self.DIRTY).select("doc_id", red.alias("red")).collect()
        }
        assert "[EMAIL]" in out[1] and "[PHONE]" in out[1]
        assert out[2].count("[SSN]") == 2 and "[IPV4]" in out[2]
        assert out[3] == self.DIRTY[2][1]
