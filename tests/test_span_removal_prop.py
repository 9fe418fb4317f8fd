"""Property test: `dedup.remove_repeated_spans` matches a pure-Python
keep-first model on random corpora and random (possibly overlapping,
duplicated, reversed-adjacent) span sets — the f94 cutting step cannot
drift from the Lee-et-al. semantics without failing here."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# (doc lengths, span specs): spans name (a_idx, b_idx, start_a,
# start_b, len) by DOC INDEX; the strategy clamps to valid ranges.
corpus_st = st.lists(st.integers(1, 30), min_size=2, max_size=6)
span_st = st.lists(
    st.tuples(
        st.integers(0, 5), st.integers(0, 5),
        st.integers(1, 25), st.integers(1, 25), st.integers(1, 12),
    ),
    min_size=0,
    max_size=8,
)


def _model(docs: dict[int, list[str]], spans) -> dict[int, tuple[str, int]]:
    """Reference implementation: collect id_b-side removal positions
    per doc (a plain set — overlap merge for free), cut, keep order."""
    removed: dict[int, set[int]] = {d: set() for d in docs}
    for id_a, id_b, _sa, sb, ln in spans:
        removed[id_b].update(range(sb, sb + ln))  # 1-based positions
    out = {}
    for d, toks in docs.items():
        kept = [t for i, t in enumerate(toks, 1) if i not in removed[d]]
        out[d] = (" ".join(kept), len(toks) - len(kept))
    return out


class TestRemoveRepeatedSpansProps:
    @SETTINGS
    @given(lens=corpus_st, raw_spans=span_st)
    def test_model_equivalence(self, spark, lens, raw_spans):
        from borsa_spark.functions.dedup import remove_repeated_spans

        docs = {
            i: [f"t{i}w{j}" for j in range(n)]
            for i, n in enumerate(lens)
        }
        spans = []
        for a, b, sa, sb, ln in raw_spans:
            a, b = a % len(lens), b % len(lens)
            if a == b:
                continue
            a, b = min(a, b), max(a, b)  # id_a < id_b contract
            # clamp starts into each doc; the length may overhang doc_b
            # (the engine must simply not match positions past the end)
            sa = 1 + sa % len(docs[a])
            sb = 1 + sb % len(docs[b])
            spans.append((a, b, sa, sb, ln))
        docs_df = spark.createDataFrame(
            [(d, " ".join(t)) for d, t in docs.items()],
            "doc_id long, text string",
        )
        spans_df = spark.createDataFrame(
            spans,
            "id_a long, id_b long, start_a long, start_b long,"
            " len_tokens long",
        )
        got = {
            r.doc_id: (r.text, r.n_tokens_removed)
            for r in remove_repeated_spans(docs_df, spans_df).collect()
        }
        assert got == _model(docs, spans)
