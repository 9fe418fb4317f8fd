"""C4 cleaning contract (functions/text.py c4_line_filter): every rule
pinned on handcrafted lines AT THE LEVEL the paper applies it — line
rules drop lines, page rules flag the page — plus degenerate shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from borsa_spark.functions.text import c4_line_filter

GOOD = "the quick brown fox jumps over the dog."

LINE_CASES = [
    # (line, kept?)
    (GOOD, True),
    ("he said \"hello there my good friend.\"", True),
    ("is this a question with enough words?", True),
    ("exclamation line with plenty of words here!", True),
    ("three words here.", True),                 # C4 line min is 3
    ("two words.", False),                       # < 3 words
    ("this line has six words but no terminal mark", False),
    ("please enable javascript to view this page.", False),
    ("JAVASCRIPT required for this page to work.", False),  # case-fold
    # page-rule markers do NOT drop the line (they flag the page)
    ("lorem ipsum dolor sit amet text here.", True),
    ("a config snippet { with brace inside }.", True),
    ("   padded line with several words inside.   ", True),  # trimmed
    # C4 tokenizes on ANY whitespace: tabs / runs of spaces separate
    # words too (was: literal-space split collapsed this to 1 token)
    ("tab\tseparated\twords\there.", True),
    ("double  spaced   words  here.", True),
    ("", False),
]


def _one(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return df.select(c4_line_filter(F.col("text"), **kw).alias("o")) \
        .collect()[0].o


class TestC4LineFilter:
    def test_line_rules(self, spark):
        text = "\n".join(l for l, _ in LINE_CASES)
        row = _one(spark, text)
        want_kept = [l.strip() for l, k in LINE_CASES if k]
        assert row.n_lines == len(LINE_CASES)
        assert row.n_kept == len(want_kept)
        assert row.clean_text == "\n".join(want_kept)

    def test_page_flag_rules(self, spark):
        assert _one(spark, GOOD).page_flagged is False
        assert _one(spark, GOOD + "\nsee the Lorem Ipsum filler.") \
            .page_flagged is True
        assert _one(spark, GOOD + "\nvar x = { a: 1 };") \
            .page_flagged is True

    def test_nothing_survives_gives_empty_not_null(self, spark):
        row = _one(spark, "two words.\nno terminal here at all")
        assert row.clean_text == "" and row.n_kept == 0

    def test_min_words_is_a_parameter(self, spark):
        assert _one(spark, "two words.", min_words=2).n_kept == 1
