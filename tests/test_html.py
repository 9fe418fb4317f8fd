"""HTML-to-text extraction contract: every rule of the html.py module
docstring pinned on handcrafted fragments (the tests/test_urls.py
pattern), plus the block-accounting and empty-result conventions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from borsa_spark.functions.html import extract_html, html_extract_docs

PROSE = "this is a long enough body paragraph of real prose content"

CASES = [
    # plain paragraph survives
    (f"<p>{PROSE}</p>", PROSE, 1),
    # script content removed WITH body, even containing '<'
    (f'<script>if(a<b){{alert("junk")}}</script><p>{PROSE}</p>',
     PROSE, 1),
    ("<SCRIPT TYPE='x'>var the_of_and = 1;</SCRIPT>"
     f"<p>{PROSE}</p>", PROSE, 1),
    # style and comments removed
    (f"<style>.c{{color:red}}</style><p>{PROSE}</p>", PROSE, 1),
    (f"<!-- hidden boilerplate words --><p>{PROSE}</p>", PROSE, 1),
    # inline tags stripped, whitespace normalized, case-folded tags
    (f'<P CLASS="x">\n<B>{PROSE}</B>\n</P>', PROSE, 1),
    (f"<p>{PROSE.replace('body', '<i>body</i>')}</p>", PROSE, 1),
    # short block dropped by LENGTH
    ("<p>too short</p>", "", 0),
    # long but fully-linked block dropped by DENSITY
    (f'<p><a href="/x">{PROSE}</a></p>', "", 0),
    # nav: long enough, mostly anchor text -> dropped by density
    ('<div><a href="/a">home</a> '
     '<a href="/b">about us and more links here</a></div>', "", 0),
    # a small link inside real prose is fine (density under 0.3)
    (f'<p>{PROSE} see <a href="/m">docs</a></p>',
     f"{PROSE} see docs", 1),
    # two blocks joined with newline; <br> is a boundary
    (f"<p>{PROSE}</p><br><p>{PROSE}</p>", f"{PROSE}\n{PROSE}", 2),
    # heading + list items are their own blocks
    (f"<h1>{PROSE}</h1><li>{PROSE}</li>", f"{PROSE}\n{PROSE}", 2),
    # nothing survives -> '' (not NULL) and 0 blocks
    ("<div><a href='/'>x</a></div>", "", 0),
]


def _run(spark, htmls):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(htmls)], "doc_id long, html string"
    )
    return {
        r.doc_id: (r.extracted, r.kept_blocks)
        for r in html_extract_docs(df).collect()
    }


class TestExtractHtml:
    def test_contract_cases(self, spark):
        got = _run(spark, [h for h, _, _ in CASES])
        for i, (html, want_text, want_blocks) in enumerate(CASES):
            assert got[i] == (want_text, want_blocks), html

    def test_null_html_yields_null_struct_fields(self, spark):
        df = spark.createDataFrame([(1, None)], "doc_id long, html string")
        row = html_extract_docs(df).collect()[0]
        assert row.extracted is None and row.kept_blocks is None

    def test_thresholds_are_parameters(self, spark):
        df = spark.createDataFrame(
            [(1, "<p>tiny but kept</p>")], "doc_id long, html string"
        )
        out = df.select(
            extract_html(F.col("html"), min_chars=5)["extracted"].alias("e")
        ).collect()
        assert out[0].e == "tiny but kept"

    def test_plain_text_without_tags_is_one_block(self, spark):
        got = _run(spark, [PROSE])
        assert got[0] == (PROSE, 1)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001"])
def test_f84_runs_on_documents(spark, sf):
    from borsa_spark.queries import QUERIES

    out = QUERIES["f84_html_extract"](spark, sf)
    rows = out.collect()
    assert len(rows) > 0
    by_v = {r.doc_id % 4: r for r in rows}
    assert by_v[0].kept_blocks == 1 and by_v[0].extracted
    assert by_v[2].kept_blocks == 0 and by_v[2].extracted == ""
