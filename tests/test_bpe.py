"""Unit pins for distributed BPE training (f80/f81): the learned merge
table must match a hand-computable corpus, the replace cascade must
converge on adjacent runs, merged symbols must compose across rounds,
the separator char must be unforgeable from hostile input, and the
application join must be deterministic under repartition."""

from __future__ import annotations

import duckdb
import pytest

from borsa_spark.functions.bpe import (
    SEP,
    bpe_token_counts,
    learn_bpe,
    sql_bpe_token_counts,
    sql_learn_bpe,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


class TestLearnBpe:
    def test_hand_computed_merges(self, spark):
        # "low" x4, "lower" x2: round 1 pair counts — (l,o) 6, (o,w) 6,
        # (w,e) 2, (e,r) 2. Tie on 6 -> lexicographic (l,o) wins.
        # Round 2: (lo,w) 6 wins. Round 3: (low,e) 2 vs (e,r) 2 ->
        # (e,r) lexicographically first.
        docs = _docs(spark, ["low low low low", "lower lower"])
        out = learn_bpe(docs, 3).orderBy("step").collect()
        assert [(r.left, r.right, r.merged, r.pair_count) for r in out] == [
            ("l", "o", "lo", 6),
            ("lo", "w", "low", 6),
            ("e", "r", "er", 2),
        ]

    def test_merged_symbols_compose_across_rounds(self, spark):
        # Single word repeated: merges must chain a+b, ab+c, abc+d.
        docs = _docs(spark, ["abcd abcd abcd"])
        out = learn_bpe(docs, 3).orderBy("step").collect()
        assert [r.merged for r in out] == ["ab", "abc", "abcd"]

    def test_adjacent_run_cascade_converges(self, spark):
        # "aaaa" -> (a,a) count 3 (overlapping, Sennrich counting);
        # the replace cascade must fully merge the run to [aa, aa]
        # so round 2 sees pair (aa, aa).
        docs = _docs(spark, ["aaaa aaaa"])
        out = learn_bpe(docs, 2).orderBy("step").collect()
        assert (out[0].left, out[0].right, out[0].pair_count) == ("a", "a", 6)
        assert (out[1].left, out[1].right) == ("aa", "aa")

    def test_separator_char_is_scrubbed(self, spark):
        # Hostile text containing the separator cannot forge symbol
        # boundaries: '·' is stripped before segmentation.
        docs = _docs(spark, [f"a{SEP}b a{SEP}b"])
        out = learn_bpe(docs, 1).collect()
        assert [(out[0].left, out[0].right, out[0].pair_count)] == [
            ("a", "b", 2)
        ]

    def test_oracle_equivalence_synthetic(self, spark):
        rows = [
            "the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "the five boxing wizards jump quickly",
            "aaaa abab the the the",
        ] * 3
        docs = _docs(spark, rows)
        got = [
            (r.step, r.left, r.right, r.merged, r.pair_count)
            for r in learn_bpe(docs, 10).orderBy("step").collect()
        ]
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)", list(enumerate(rows))
        )
        want = con.execute(
            sql_learn_bpe(10) + " ORDER BY step"
        ).fetchall()
        assert got == [tuple(w) for w in want]


class TestBpeTokenCounts:
    def test_counts_and_compression(self, spark):
        # After 2 merges on this corpus ("ab" dominates), "ababab"
        # should compress below its char count.
        docs = _docs(spark, ["ababab ababab", "ab ab ab ab", "cd cd"])
        out = {
            r.doc_id: (r.n_words, r.n_bpe_tokens)
            for r in bpe_token_counts(docs, 2).collect()
        }
        assert out[1] == (4, 4)  # "ab" fully merged: 1 token per word
        assert out[0][0] == 2
        assert out[0][1] < 12  # fewer tokens than chars

    def test_deterministic_under_repartition(self, spark):
        docs = _docs(
            spark,
            ["the quick brown fox", "the lazy dog", "quick quick fox"] * 5,
        )
        a = sorted(
            (r.doc_id, r.n_words, r.n_bpe_tokens)
            for r in bpe_token_counts(docs, 4).collect()
        )
        b = sorted(
            (r.doc_id, r.n_words, r.n_bpe_tokens)
            for r in bpe_token_counts(docs.repartition(7), 4).collect()
        )
        assert a == b

    def test_oracle_equivalence_synthetic(self, spark):
        rows = ["sphinx of black quartz judge my vow", "judge my vow now"] * 4
        docs = _docs(spark, rows)
        got = sorted(
            (r.doc_id, r.n_words, r.n_bpe_tokens)
            for r in bpe_token_counts(docs, 6).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)", list(enumerate(rows))
        )
        want = sorted(
            tuple(w)
            for w in con.execute(sql_bpe_token_counts(6)).fetchall()
        )
        assert got == want


class TestOracleShape:
    def test_materialized_ctes(self):
        # DuckDB inlines CTEs by default; each round references v{k}
        # twice, so without MATERIALIZED the unrolled oracle plan is
        # exponential in n_merges (observed: >500 s at 12 rounds).
        sql = sql_learn_bpe(12)
        assert sql.count("AS MATERIALIZED") >= 12 * 3 + 2
        assert "AS (" not in sql.replace("AS MATERIALIZED (", "")


class TestApplyBpe:
    def test_apply_learned_merges_equals_retraining(self, spark):
        rows = [
            "the quick brown fox jumps over the lazy dog",
            "pack my box with five dozen liquor jugs",
            "the five boxing wizards jump quickly",
        ] * 4
        docs = _docs(spark, rows)
        merges = [
            (r.left, r.right)
            for r in learn_bpe(docs, 6).orderBy("step").collect()
        ]
        from borsa_spark.functions.bpe import apply_bpe

        got = sorted(
            (r.doc_id, r.n_words, r.n_bpe_tokens)
            for r in apply_bpe(docs, merges).collect()
        )
        want = sorted(
            (r.doc_id, r.n_words, r.n_bpe_tokens)
            for r in bpe_token_counts(docs, 6).collect()
        )
        assert got == want

    def test_apply_transfers_to_unseen_corpus(self, spark):
        train = _docs(spark, ["ab ab ab ab", "abc abc"])
        merges = [
            (r.left, r.right)
            for r in learn_bpe(train, 2).orderBy("step").collect()
        ]
        from borsa_spark.functions.bpe import apply_bpe

        # new corpus: "abab" compresses via the learned 'ab' merge even
        # though it never appeared in training; "xyz" stays char-level
        new = _docs(spark, ["abab xyz"])
        row = apply_bpe(new, merges).collect()[0]
        assert row.n_words == 2
        # "abab" -> depends on learned merges ("ab" then "abc"): the
        # 'ab' merge turns it into 2 symbols; "xyz" stays 3 chars
        assert row.n_bpe_tokens == 5

    def test_apply_no_merges_counts_chars(self, spark):
        from borsa_spark.functions.bpe import apply_bpe

        docs = _docs(spark, ["ab cde"])
        row = apply_bpe(docs, []).collect()[0]
        assert (row.n_words, row.n_bpe_tokens) == (2, 5)


class TestExhaustionAndEdges:
    def test_rounds_past_merge_capacity_are_noops(self, spark):
        # "ab ab cd": merges (a,b) then (c,d) exhaust every pair; the
        # remaining rounds must be no-ops, not vocab annihilation.
        docs = _docs(spark, ["ab ab cd"])
        out = learn_bpe(docs, 5).orderBy("step").collect()
        assert [(r.left, r.right) for r in out] == [("a", "b"), ("c", "d")]
        counts = {
            r.doc_id: (r.n_words, r.n_bpe_tokens)
            for r in bpe_token_counts(docs, 5).collect()
        }
        assert counts == {0: (3, 3)}  # every word fully merged, none lost

    def test_zero_merges_returns_typed_empty_table(self, spark):
        docs = _docs(spark, ["ab cd"])
        out = learn_bpe(docs, 0)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            "step", "left", "right", "merged", "pair_count"
        ]

    def test_apply_holds_at_tokenizer_scale(self, spark):
        # a realistic merge-table size must not blow the expression
        # converter's stack (merges ride as DATA in one aggregate fold,
        # not as nested replace nodes) — 2000 merges was a reproduced
        # StackOverflowError under the chained-expression design
        from borsa_spark.functions.bpe import apply_bpe

        docs = _docs(spark, ["low lower lowest low low"] * 3)
        real = [
            (r.left, r.right)
            for r in learn_bpe(docs, 5).orderBy("step").collect()
        ]
        pad = [(f"z{i}", f"q{i}") for i in range(2000 - len(real))]
        want = sorted(tuple(r) for r in apply_bpe(docs, real).collect())
        got = sorted(
            tuple(r) for r in apply_bpe(docs, real + pad).collect()
        )
        assert got == want  # non-matching pad merges are no-ops
