"""The minhash exact-dedup pre-pass (round 11): collapse md5-identical
texts to a representative before shingling, re-expand pairs after —
provably IDENTICAL output to the uncollapsed pipeline, capped or not.

The fixture is adversarial on purpose: an identical cohort OVER the
cap (must re-expand to nothing — the weighted occupancy decision), an
identical cohort UNDER it (must re-expand to all C(m,2) pairs at 1.0),
cross-group near-dups with multiplicity on BOTH sides, sub-n-word
identical docs (no shingles — no pairs either way), and unique docs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from borsa_spark.functions import dedup as dd


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # hot identical cohort: 30 copies, over cap=8 -> weighted cap
    # excludes every bucket it touches
    for i in range(30):
        rows.append((100 + i, "common boiler plate sentence words here"))
    # cool identical cohort: 5 copies, under cap -> C(5,2) pairs at 1.0
    for i in range(5):
        rows.append((200 + i, "alpha beta gamma delta epsilon zeta"))
    # near-dup groups with multiplicity both sides (last word swapped:
    # 8 shared of 10 distinct trigrams -> jaccard 0.8 >= 0.5)
    for i in range(3):
        rows.append(
            (300 + i, "one two three four five six seven eight nine ten")
        )
    for i in range(2):
        rows.append(
            (400 + i, "one two three four five six seven eight nine zz")
        )
    for i in range(10):
        rows.append(
            (500 + i, f"unique u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f")
        )
    # sub-n-word docs: no shingles -> invisible to the pipeline,
    # identical or not
    rows += [(600, "hi there"), (601, "hi there"), (602, "x")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _canon(out):
    return sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in out.select("id_a", "id_b", "jaccard").collect()
    )


class TestCollapseExactEquivalence:
    @pytest.mark.parametrize("cap", [8, None])
    def test_identical_output_capped_and_exhaustive(self, corpus, cap):
        base = _canon(
            dd.minhash_dedup_pairs(
                corpus, 3, 0.5, max_bucket_size=cap, collapse_exact=False
            )
        )
        coll = _canon(
            dd.minhash_dedup_pairs(
                corpus, 3, 0.5, max_bucket_size=cap, collapse_exact=True
            )
        )
        assert coll == base
        assert len(base) > 0

    def test_capped_semantics_of_the_cohorts(self, corpus):
        got = _canon(
            dd.minhash_dedup_pairs(corpus, 3, 0.5, max_bucket_size=8)
        )
        ids = {i for p in got for i in p[:2]}
        # the 30-copy cohort is capped out entirely
        assert not any(100 <= i < 130 for i in ids)
        # the 5-copy cohort re-expands to all C(5,2) pairs at 1.0
        small = [p for p in got if 200 <= p[0] < 205]
        assert len(small) == 10
        assert all(j == 1.0 for _, _, j in small)
        # cross-group near-dups expand 3 x 2 member pairs, same jaccard
        cross = [p for p in got if 300 <= p[0] < 303 and 400 <= p[1] < 402]
        assert len(cross) == 6
        assert len({j for _, _, j in cross}) == 1
        # sub-n-word identical docs never pair
        assert not any(i >= 600 for i in ids)

    def test_rep_side_pays_the_fold_not_the_cohort(self, corpus):
        """The wall claim, structurally: with collapse on, the signature
        fold input is the DISTINCT-text relation — 16 reps here (1
        boiler + 1 small cohort + 2 near-dup + 10 unique + 2 short)
        instead of the 53-doc corpus."""
        assert corpus.count() == 53
        n_reps = corpus.select(F.md5("text")).distinct().count()
        assert n_reps == 16
