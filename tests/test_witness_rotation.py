"""The driver-witness rotation at the tail of queries.py: the driver's
correctness gate only records the first 50 registry entries, so the
ordering IS the coverage policy — least-witnessed first, then stalest
green, then registration order. Tested over synthetic CORRECTNESS
artifacts (no Spark needed)."""

from __future__ import annotations

import json

from borsa_spark.queries import _witness_order, _witness_stats


def _write(tmp_path, rnd: int, rows: dict) -> None:
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))


GREEN = {"rows_match": True, "hash_match": True}
ROWS_ONLY = {"rows_match": True}  # no oracle -> hash_match absent counts
RED = {"rows_match": False, "hash_match": False}
HASH_RED = {"rows_match": True, "hash_match": False}


class TestWitnessStats:
    def test_counts_and_latest_round(self, tmp_path):
        _write(tmp_path, 1, {"a": GREEN, "b": GREEN})
        _write(tmp_path, 3, {"a": GREEN, "c": GREEN})
        stats = _witness_stats(str(tmp_path))
        assert stats["a"] == (2, 3)
        assert stats["b"] == (1, 1)
        assert stats["c"] == (1, 3)

    def test_red_rows_are_not_witnesses(self, tmp_path):
        _write(tmp_path, 1, {"a": RED, "b": HASH_RED, "c": ROWS_ONLY})
        stats = _witness_stats(str(tmp_path))
        assert "a" not in stats
        assert "b" not in stats
        # rows-only (no oracle) still counts: the driver recorded the
        # strongest check that applies to that query
        assert stats["c"] == (1, 1)

    def test_malformed_artifact_skipped(self, tmp_path):
        (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
        _write(tmp_path, 2, {"a": GREEN})
        assert _witness_stats(str(tmp_path)) == {"a": (1, 2)}


class TestWitnessOrder:
    def test_unwitnessed_sort_first_in_registration_order(self):
        names = ["q1", "q2", "q3", "q4"]
        stats = {"q1": (1, 1), "q3": (2, 2)}
        assert _witness_order(names, stats) == ["q2", "q4", "q1", "q3"]

    def test_stalest_green_first_among_equal_counts(self):
        # all witnessed once; the ROUND of the witness leads so the
        # 50-row window keeps refreshing the oldest greens
        names = ["q1", "q2", "q3"]
        stats = {"q1": (1, 4), "q2": (1, 1), "q3": (1, 2)}
        assert _witness_order(names, stats) == ["q2", "q3", "q1"]

    def test_staleness_dominates_count(self):
        # (round 6) staleness LEADS: a thrice-witnessed query whose last
        # green is old refreshes before a once-witnessed fresher one —
        # with 132 queries / 50 rows per round, count-first parks stale
        # greens behind every newer single-witness query for rounds
        names = ["q1", "q2"]
        stats = {"q1": (3, 1), "q2": (1, 4)}
        assert _witness_order(names, stats) == ["q1", "q2"]

    def test_count_breaks_ties_within_a_round(self):
        names = ["q1", "q2"]
        stats = {"q1": (2, 3), "q2": (1, 3)}
        assert _witness_order(names, stats) == ["q2", "q1"]

    def test_registration_order_is_the_final_tiebreak(self):
        names = ["qz", "qa", "qm"]
        stats = {n: (1, 1) for n in names}
        assert _witness_order(names, stats) == ["qz", "qa", "qm"]

    def test_end_to_end_over_synthetic_artifacts(self, tmp_path):
        _write(tmp_path, 1, {"a": GREEN, "b": GREEN, "c": GREEN})
        _write(tmp_path, 2, {"a": GREEN, "d": GREEN})
        _write(tmp_path, 3, {"a": GREEN, "b": GREEN})
        names = ["a", "b", "c", "d", "e"]
        got = _witness_order(names, _witness_stats(str(tmp_path)))
        # e unwitnessed (round 0 leads); c's last green r1, d's r2;
        # a and b share last-green r3, so count breaks the tie (b twice,
        # a three times)
        assert got == ["e", "c", "d", "b", "a"]
