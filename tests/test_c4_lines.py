"""C4 line-filter contract (functions/text.py c4_line_filter): every
rule pinned on handcrafted lines, plus the empty/degenerate shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from borsa_spark.functions.text import c4_line_filter

GOOD = "the quick brown fox jumps over the dog."

CASES = [
    # (line, kept?)
    (GOOD, True),
    ("he said \"hello there my good friend.\"", True),
    ("is this a question with enough words?", True),
    ("exclamation line with plenty of words here!", True),
    ("short line.", False),                      # < 5 words
    ("this line has six words but no terminal mark", False),
    ("please enable javascript to view this page.", False),
    ("JAVASCRIPT required for this page to work.", False),  # case-fold
    ("lorem ipsum dolor sit amet text here.", False),
    ("a config snippet { with brace inside }.", False),
    ("   padded line with several words inside.   ", True),  # trimmed
    ("", False),
]


class TestC4LineFilter:
    def test_contract_cases(self, spark):
        text = "\n".join(l for l, _ in CASES)
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        row = df.select(c4_line_filter(F.col("text")).alias("o")).collect()[0].o
        want_kept = [l.strip() for l, k in CASES if k]
        assert row.n_lines == len(CASES)
        assert row.n_kept == len(want_kept)
        assert row.clean_text == "\n".join(want_kept)

    def test_nothing_survives_gives_empty_not_null(self, spark):
        df = spark.createDataFrame(
            [(1, "short.\nno terminal here at all")],
            "doc_id long, text string",
        )
        row = df.select(c4_line_filter(F.col("text")).alias("o")).collect()[0].o
        assert row.clean_text == "" and row.n_kept == 0

    def test_min_words_is_a_parameter(self, spark):
        df = spark.createDataFrame(
            [(1, "three words here.")], "doc_id long, text string"
        )
        row = df.select(
            c4_line_filter(F.col("text"), min_words=3).alias("o")
        ).collect()[0].o
        assert row.n_kept == 1
