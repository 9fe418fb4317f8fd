"""Unit pins for the incremental rollup (c6): merge must be
associative/commutative against a one-shot aggregate, duplicate
timestamps must stay deterministic via the seq tie-break, and the
partitioned maintenance path must prune the state scan to dirty days
and leave untouched partitions byte-identical on disk."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from borsa_spark.operators.rollup import (
    merge_into_rollup,
    read_rollup,
    rollup_finalize,
    rollup_merge,
    rollup_state,
    write_rollup,
)


def _ts(day: int, sec: int) -> dt.datetime:
    return dt.datetime(2024, 1, day, 0, 0, 0) + dt.timedelta(seconds=sec)


def _candles(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, ts timestamp, value double, seq long"
    )


FIX = [
    ("A", _ts(1, 10), 5.0, 1),
    ("A", _ts(1, 20), 9.0, 2),
    ("A", _ts(1, 5), 3.0, 3),
    ("A", _ts(2, 1), 7.0, 4),
    ("B", _ts(1, 30), 2.0, 5),
    ("B", _ts(3, 2), 11.0, 6),
    ("B", _ts(3, 1), 4.0, 7),
]


def _final_rows(df):
    return sorted(
        tuple(r) for r in rollup_finalize(df).collect()
    )


class TestMergeSemantics:
    def test_merge_equals_one_shot(self, spark):
        full = rollup_state(_candles(spark, FIX))
        a = rollup_state(_candles(spark, FIX[:3]))
        b = rollup_state(_candles(spark, FIX[3:]))
        assert _final_rows(rollup_merge(a, b)) == _final_rows(full)

    def test_merge_commutes(self, spark):
        a = rollup_state(_candles(spark, FIX[:4]))
        b = rollup_state(_candles(spark, FIX[4:]))
        assert _final_rows(rollup_merge(a, b)) == _final_rows(
            rollup_merge(b, a)
        )

    def test_open_close_follow_ts_order_across_batches(self, spark):
        # batch B carries the EARLIEST tick of day 1: merged open must
        # switch to it, close must stay with batch A's latest.
        a = rollup_state(_candles(spark, [("A", _ts(1, 50), 8.0, 1)]))
        b = rollup_state(_candles(spark, [("A", _ts(1, 1), 2.0, 2)]))
        row = rollup_finalize(rollup_merge(a, b)).collect()[0]
        assert (row.open, row.close, row.n_bars) == (2.0, 8.0, 2)

    def test_duplicate_ts_breaks_ties_on_seq(self, spark):
        rows = [("A", _ts(1, 0), 1.0, 2), ("A", _ts(1, 0), 9.0, 1)]
        one = rollup_finalize(rollup_state(_candles(spark, rows))).collect()[0]
        assert (one.open, one.close) == (9.0, 1.0)
        m = rollup_merge(
            rollup_state(_candles(spark, rows[:1])),
            rollup_state(_candles(spark, rows[1:])),
        )
        two = rollup_finalize(m).collect()[0]
        assert (two.open, two.close) == (9.0, 1.0)


class TestPartitionedMaintenance:
    def _file_bytes(self, root):
        out = {}
        for dirpath, _, names in os.walk(root):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(dirpath, n)
                    with open(p, "rb") as f:
                        out[os.path.relpath(p, root)] = f.read()
        return out

    def test_only_dirty_partitions_rewritten(self, spark, tmp_path):
        root = str(tmp_path / "state")
        write_rollup(rollup_state(_candles(spark, FIX)), root)
        before = self._file_bytes(root)
        batch = _candles(
            spark,
            [("A", _ts(2, 30), 1.0, 8), ("A", _ts(4, 0), 6.0, 9)],
        )
        dirty = merge_into_rollup(spark, root, batch)
        assert sorted(dirty) == ["2024-01-02", "2024-01-04"]
        after = self._file_bytes(root)
        untouched_before = {
            k: v for k, v in before.items()
            if "2024-01-02" not in k and "2024-01-04" not in k
        }
        untouched_after = {
            k: v for k, v in after.items()
            if "2024-01-02" not in k and "2024-01-04" not in k
        }
        assert untouched_before == untouched_after
        assert any("2024-01-04" in k for k in after)  # new day appears

        # and the merged table equals a full recompute
        all_rows = FIX + [("A", _ts(2, 30), 1.0, 8), ("A", _ts(4, 0), 6.0, 9)]
        want = _final_rows(rollup_state(_candles(spark, all_rows)))
        got = _final_rows(read_rollup(spark, root))
        assert got == want

    def test_state_scan_is_partition_pruned(self, spark, tmp_path):
        root = str(tmp_path / "state")
        write_rollup(rollup_state(_candles(spark, FIX)), root)
        pruned = spark.read.parquet(root).filter(
            F.col("pday").isin(["2024-01-02"])
        )
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "2024-01-02" in plan
        assert pruned.count() == 1  # day 2 holds one (A) state row

    def test_empty_batch_is_a_noop(self, spark, tmp_path):
        root = str(tmp_path / "state")
        write_rollup(rollup_state(_candles(spark, FIX)), root)
        before = self._file_bytes(root)
        dirty = merge_into_rollup(spark, root, _candles(spark, []))
        assert dirty == []
        assert self._file_bytes(root) == before


class TestMergeAlgebra:
    def test_random_partitions_merge_to_identical_state(self, spark):
        # associativity + commutativity over arbitrary 3-way splits
        # (including empty parts): fold order must never matter.
        import random

        rows = [
            (sym, _ts(1 + i % 4, (i * 37) % 86_000), float((i * 13) % 97),
             i)
            for i, sym in enumerate(
                ["A", "B", "C"][i % 3] for i in range(40)
            )
        ]
        want = _final_rows(rollup_state(_candles(spark, rows)))
        rng = random.Random(7)
        for _ in range(5):
            buckets = [[], [], []]
            for r in rows:
                buckets[rng.randrange(3)].append(r)
            states = [
                rollup_state(_candles(spark, b)) for b in buckets
            ]
            order = rng.sample(range(3), 3)
            merged = rollup_merge(
                rollup_merge(states[order[0]], states[order[1]]),
                states[order[2]],
            )
            assert _final_rows(merged) == want


class TestNullValueTicks:
    def test_null_value_does_not_split_row_identity(self, spark):
        # a NULL-valued tick is the bucket's earliest: merged open must
        # stay NULL (that row won) and first_ts must come from the SAME
        # side — per-column null-picking would mix sides and break
        # associativity
        a = rollup_state(_candles(spark, [("A", _ts(1, 1), None, 1)]))
        b = rollup_state(_candles(spark, [("A", _ts(1, 9), 5.0, 2)]))
        m = rollup_merge(a, b).collect()[0]
        assert m.first_ts == _ts(1, 1) and m.first_seq == 1
        assert m.open is None and m.close == 5.0
        # and both merge orders agree
        m2 = rollup_merge(b, a).collect()[0]
        assert (m.first_ts, m.open, m.close) == (
            m2.first_ts, m2.open, m2.close
        )


class TestCascade:
    def test_hourly_to_daily_equals_direct_daily(self, spark):
        from borsa_spark.operators.rollup import rollup_cascade

        rows = [
            ("A", _ts(1, 3_600 * h + s), float((h * 7 + s) % 50), h * 100 + s)
            for h in range(5)
            for s in (0, 30, 59)
        ] + [("B", _ts(2, 10), 4.0, 999)]
        hourly = rollup_state(_candles(spark, rows), trunc="hour")
        got = _final_rows(rollup_cascade(hourly, trunc="day"))
        want = _final_rows(rollup_state(_candles(spark, rows), trunc="day"))
        assert got == want

    def test_cascade_composes_with_merge(self, spark):
        # merge two hourly states, THEN cascade == cascade of the
        # one-shot daily — the full associativity story
        from borsa_spark.operators.rollup import rollup_cascade

        a = rollup_state(_candles(spark, FIX[:4]), trunc="hour")
        b = rollup_state(_candles(spark, FIX[4:]), trunc="hour")
        got = _final_rows(rollup_cascade(rollup_merge(a, b), trunc="day"))
        want = _final_rows(rollup_state(_candles(spark, FIX), trunc="day"))
        assert got == want


def test_null_ts_ticks_dropped_not_hive_default_partition(spark):
    # a null-ts tick cannot be bucketed; letting it through would land
    # state in pday=__HIVE_DEFAULT_PARTITION__, unreadable by the
    # maintainer's pday-keyed resolution (round-8 review finding)
    import datetime as dt

    from borsa_spark.operators.rollup import rollup_state

    rows = [
        ("A", dt.datetime(2024, 1, 1, 0, 0, 5), 1.0, 1),
        ("A", None, 99.0, 2),
    ]
    df = spark.createDataFrame(
        rows, "symbol string, ts timestamp, value double, seq long"
    )
    got = rollup_state(df).collect()
    assert len(got) == 1
    assert got[0].n_bars == 1 and got[0].high == 1.0
