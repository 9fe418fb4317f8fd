"""Property tests for the HTML extractor (functions/html.py): prose
wrapped in markup always comes back whitespace-normalized, and
script/style/comment content NEVER leaks — for arbitrary generated
prose and junk, not just the handcrafted contract table."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from borsa_spark.functions.html import html_extract_docs

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# prose: words of letters/digits — long enough to clear min_chars once
# joined, and free of markup metacharacters by construction
word_st = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=8
)
prose_st = st.lists(word_st, min_size=8, max_size=30).map(" ".join).filter(
    lambda t: len(t) >= 30
)
# junk that may contain '<', quotes, braces — but never the closing tag
# of the element it is placed in (the one spec-level requirement)
junk_st = st.text(
    alphabet="abc<>{}()\"'=;: \n\t/!-", min_size=0, max_size=40
).filter(lambda s: "</" not in s.lower())


def _run(spark, htmls):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(htmls)], "doc_id long, html string"
    )
    return {
        r.doc_id: (r.extracted, r.kept_blocks)
        for r in html_extract_docs(df).collect()
    }


class TestExtractHtmlProps:
    @SETTINGS
    @given(prose=prose_st, junk=junk_st)
    def test_prose_survives_junk_never_leaks(self, spark, prose, junk):
        html = (
            f"<script>{junk}</script><style>{junk}</style>"
            f"<!-- {junk.replace('--', '-')} -->"
            f"<p>{prose}</p>"
        )
        got_text, got_blocks = _run(spark, [html])[0]
        want = re.sub(r"\s+", " ", prose).strip()
        assert got_text == want
        assert got_blocks == 1

    @SETTINGS
    @given(paras=st.lists(prose_st, min_size=1, max_size=4))
    def test_every_long_block_kept_in_order(self, spark, paras):
        html = "".join(f"<p>{p}</p>" for p in paras)
        got_text, got_blocks = _run(spark, [html])[0]
        want = [re.sub(r"\s+", " ", p).strip() for p in paras]
        assert got_blocks == len(paras)
        assert got_text == "\n".join(want)

    @SETTINGS
    @given(prose=prose_st)
    def test_inline_markup_and_whitespace_normalize(self, spark, prose):
        words = prose.split(" ")
        # bold a word, sprinkle newlines/tabs — visible text unchanged
        words[0] = f"<b>{words[0]}</b>"
        html = "<p>\n" + " \t ".join(words) + "\n</p>"
        got_text, _ = _run(spark, [html])[0]
        assert got_text == re.sub(r"\s+", " ", prose).strip()

    @SETTINGS
    @given(prose=prose_st)
    def test_fully_linked_block_always_dropped(self, spark, prose):
        html = f'<p><a href="/x">{prose}</a></p>'
        got_text, got_blocks = _run(spark, [html])[0]
        assert (got_text, got_blocks) == ("", 0)
