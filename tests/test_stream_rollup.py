"""Exactly-once pins for the streaming continuous aggregate
(streaming/rollup.py): micro-batched maintenance must equal a one-shot
rollup, committed and UNCOMMITTED replays must not double-count,
committed files must never be mutated, compaction must preserve state,
and a live foreachBatch drive must land the same result."""

from __future__ import annotations

import datetime as dt
import os
import time

from borsa_spark.operators.rollup import rollup_finalize, rollup_state
from borsa_spark.streaming.rollup import RollupMaintainer


def _ts(day: int, sec: int) -> dt.datetime:
    return dt.datetime(2024, 1, day) + dt.timedelta(seconds=sec)


def _candles(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, ts timestamp, value double, seq long"
    )


BASE = [
    ("A", _ts(1, 10), 5.0, 1),
    ("A", _ts(2, 5), 3.0, 2),
    ("B", _ts(1, 7), 8.0, 3),
]
B0 = [("A", _ts(2, 50), 9.0, 4), ("A", _ts(3, 1), 2.0, 5)]
B1 = [("A", _ts(2, 1), 7.0, 6), ("B", _ts(4, 2), 1.0, 7)]


def _want(spark, rows):
    return sorted(
        tuple(r)
        for r in rollup_finalize(rollup_state(_candles(spark, rows))).collect()
    )


def _got(rm):
    return sorted(tuple(r) for r in rm.finalized().collect())


class TestMicroBatchMaintenance:
    def test_batches_equal_one_shot(self, spark, tmp_path):
        rm = RollupMaintainer(spark, str(tmp_path / "state"))
        rm.build(_candles(spark, BASE))
        rm.process_batch(_candles(spark, B0), 0)
        rm.process_batch(_candles(spark, B1), 1)
        assert _got(rm) == _want(spark, BASE + B0 + B1)

    def test_committed_replay_is_noop(self, spark, tmp_path):
        rm = RollupMaintainer(spark, str(tmp_path / "state"))
        rm.build(_candles(spark, BASE))
        rm.process_batch(_candles(spark, B0), 0)
        rm.process_batch(_candles(spark, B0), 0)  # foreachBatch replay
        assert _got(rm) == _want(spark, BASE + B0)

    def test_uncommitted_replay_does_not_double_count(self, spark, tmp_path):
        rm = RollupMaintainer(spark, str(tmp_path / "state"))
        rm.build(_candles(spark, BASE))
        rm.process_batch(_candles(spark, B0), 0)
        # crash AFTER the version dir landed but BEFORE the marker
        os.remove(rm._marker_path("batch-0"))
        rm.process_batch(_candles(spark, B0), 0)  # replay
        assert _got(rm) == _want(spark, BASE + B0)

    def test_committed_versions_never_mutated(self, spark, tmp_path):
        rm = RollupMaintainer(spark, str(tmp_path / "state"))
        rm.build(_candles(spark, BASE))
        basefiles = {}
        for dirpath, _, names in os.walk(rm._version_dir("base")):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(dirpath, n)
                    with open(p, "rb") as f:
                        basefiles[p] = f.read()
        rm.process_batch(_candles(spark, B0), 0)
        rm.process_batch(_candles(spark, B1), 1)
        for p, blob in basefiles.items():
            with open(p, "rb") as f:
                assert f.read() == blob

    def test_empty_batch_commits_a_marker(self, spark, tmp_path):
        rm = RollupMaintainer(spark, str(tmp_path / "state"))
        rm.build(_candles(spark, BASE))
        rm.process_batch(_candles(spark, []), 0)
        assert os.path.exists(rm._marker_path("batch-0"))
        assert _got(rm) == _want(spark, BASE)

    def test_compact_preserves_state_and_folds_chain(self, spark, tmp_path):
        rm = RollupMaintainer(spark, str(tmp_path / "state"))
        rm.build(_candles(spark, BASE))
        rm.process_batch(_candles(spark, B0), 0)
        rm.process_batch(_candles(spark, B1), 1)
        want = _got(rm)
        out = rm.compact()
        assert sorted(out["superseded"]) == ["base", "batch-0", "batch-1"]
        assert _got(rm) == want
        # post-compact batches keep working
        rm.process_batch(
            _candles(spark, [("B", _ts(4, 9), 4.0, 8)]), 2
        )
        assert _got(rm) == _want(
            spark, BASE + B0 + B1 + [("B", _ts(4, 9), 4.0, 8)]
        )


class TestLiveDrive:
    def test_foreachbatch_drive(self, spark, tmp_path):
        src = tmp_path / "incoming"
        src.mkdir()
        _candles(spark, B0).coalesce(1).write.parquet(str(src / "b1"))
        _candles(spark, B1).coalesce(1).write.parquet(str(src / "b2"))
        stream = (
            spark.readStream.schema(
                "symbol string, ts timestamp, value double, seq long"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        rm = RollupMaintainer(spark, str(tmp_path / "state"))
        rm.build(_candles(spark, BASE))
        q = rm.attach(stream, str(tmp_path / "ckpt"))
        deadline = time.time() + 120
        while time.time() < deadline and not os.path.exists(
            rm._marker_path("batch-1")
        ):
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(30)
        assert _got(rm) == _want(spark, BASE + B0 + B1)


class TestTimeTravel:
    def test_state_as_of_each_batch(self, spark, tmp_path):
        rm = RollupMaintainer(spark, str(tmp_path / "state"))
        rm.build(_candles(spark, BASE))
        rm.process_batch(_candles(spark, B0), 0)
        rm.process_batch(_candles(spark, B1), 1)

        def snap(batch_id):
            from borsa_spark.operators.rollup import rollup_finalize

            return sorted(
                tuple(r)
                for r in rollup_finalize(rm.state_as_of(batch_id)).collect()
            )

        assert snap(-1) == _want(spark, BASE)
        assert snap(0) == _want(spark, BASE + B0)
        assert snap(1) == _want(spark, BASE + B0 + B1)
        assert snap(99) == _got(rm)  # beyond head == current

    def test_compaction_supersedes_history(self, spark, tmp_path):
        rm = RollupMaintainer(spark, str(tmp_path / "state"))
        rm.build(_candles(spark, BASE))
        rm.process_batch(_candles(spark, B0), 0)
        rm.process_batch(_candles(spark, B1), 1)
        rm.compact()
        from borsa_spark.operators.rollup import rollup_finalize

        # pre-compact snapshots are gone (folded into compact-1); the
        # as-of at the compact seq returns the folded state
        assert sorted(
            tuple(r)
            for r in rollup_finalize(rm.state_as_of(1)).collect()
        ) == _want(spark, BASE + B0 + B1)
        assert rollup_finalize(rm.state_as_of(0)).count() == 0


class TestParamsGuard:
    def test_trunc_mismatch_refused(self, spark, tmp_path):
        import pytest

        RollupMaintainer(spark, str(tmp_path / "s"), trunc="day")
        with pytest.raises(ValueError, match="built with"):
            RollupMaintainer(spark, str(tmp_path / "s"), trunc="hour")


class TestChangesFor:
    def test_cdc_rows_match_batch_effect(self, spark, tmp_path):
        rm = RollupMaintainer(spark, str(tmp_path / "state"))
        rm.build(_candles(spark, BASE))
        rm.process_batch(_candles(spark, B1), 0)
        # B1 touches (A, day 2) [exists -> update] and (B, day 4) [new]
        rows = {
            (r.change, r.symbol): r for r in rm.changes_for(0).collect()
        }
        assert set(rows) == {("update", "A"), ("insert", "B")}
        upd = rows[("update", "A")]
        assert (upd.before_n_bars, upd.after_n_bars) == (1, 2)
        # B1's day-2 tick lands at second 1, EARLIER than base's
        # second-5 tick: open flips to the new earliest, close stays
        assert upd.before_open == 3.0 and upd.after_open == 7.0
        assert upd.after_close == 3.0
        ins = rows[("insert", "B")]
        assert ins.before_n_bars is None and ins.after_n_bars == 1

    def test_same_day_untouched_symbol_not_emitted(self, spark, tmp_path):
        # day 1 holds A and B; a batch touching only A's day-1 bucket
        # must not emit a no-op row for B
        rm = RollupMaintainer(spark, str(tmp_path / "state"))
        rm.build(_candles(spark, BASE))
        rm.process_batch(_candles(spark, [("A", _ts(1, 99), 4.0, 9)]), 0)
        got = rm.changes_for(0).collect()
        assert [r.symbol for r in got] == ["A"]

    def test_uncommitted_batch_raises(self, spark, tmp_path):
        import pytest

        rm = RollupMaintainer(spark, str(tmp_path / "state"))
        rm.build(_candles(spark, BASE))
        with pytest.raises(ValueError, match="no committed marker"):
            rm.changes_for(0)


class TestCompactIdempotence:
    def test_double_compact_is_a_noop_not_state_loss(self, spark, tmp_path):
        rm = RollupMaintainer(spark, str(tmp_path / "state"))
        rm.build(_candles(spark, BASE))
        rm.process_batch(_candles(spark, B0), 0)
        want = _got(rm)
        rm.compact()
        out = rm.compact()  # idle-period re-run: must not destroy state
        assert out == {"version": "compact-0", "superseded": []}
        assert _got(rm) == want


class TestEmptyBatchCdc:
    def test_empty_batch_cdc_keeps_full_schema(self, spark, tmp_path):
        rm = RollupMaintainer(spark, str(tmp_path / "state"))
        rm.build(_candles(spark, BASE))
        rm.process_batch(_candles(spark, []), 0)
        cdc = rm.changes_for(0)
        assert cdc.count() == 0
        assert "after_n_bars" in cdc.columns  # consumers can still select
        rm.process_batch(_candles(spark, B0), 1)
        assert set(cdc.columns) == set(rm.changes_for(1).columns)


class TestTornMarkers:
    """ADVICE r8: a crash mid-marker-write must never read as committed.
    Markers are written temp-then-rename (atomic on POSIX) and the
    replay short-circuit requires a PARSEABLE marker."""

    def test_torn_marker_reprocesses_not_drops(self, spark, tmp_path):
        rm = RollupMaintainer(spark, str(tmp_path / "state"))
        rm.build(_candles(spark, BASE))
        rm.process_batch(_candles(spark, B0), 0)
        # simulate a crash that tore the marker file mid-write
        with open(rm._marker_path("batch-0"), "w") as f:
            f.write('{"version": "batch-0", "se')
        rm.process_batch(_candles(spark, B0), 0)  # foreachBatch replay
        assert _got(rm) == _want(spark, BASE + B0)

    def test_empty_marker_reprocesses(self, spark, tmp_path):
        rm = RollupMaintainer(spark, str(tmp_path / "state"))
        rm.build(_candles(spark, BASE))
        rm.process_batch(_candles(spark, B0), 0)
        open(rm._marker_path("batch-0"), "w").close()  # 0-byte marker
        rm.process_batch(_candles(spark, B0), 0)
        assert _got(rm) == _want(spark, BASE + B0)

    def test_inflight_tmp_marker_is_invisible(self, spark, tmp_path):
        rm = RollupMaintainer(spark, str(tmp_path / "state"))
        rm.build(_candles(spark, BASE))
        rm.process_batch(_candles(spark, B0), 0)
        # a crash between temp-write and rename leaves only the .tmp:
        # the batch is uncommitted, resolution ignores it, replay works
        os.rename(
            rm._marker_path("batch-0"), rm._marker_path("batch-0") + ".tmp"
        )
        assert _got(rm) == _want(spark, BASE)  # batch-0 invisible
        rm.process_batch(_candles(spark, B0), 0)
        assert _got(rm) == _want(spark, BASE + B0)

    def test_markers_written_atomically(self, spark, tmp_path):
        rm = RollupMaintainer(spark, str(tmp_path / "state"))
        rm.build(_candles(spark, BASE))
        rm.process_batch(_candles(spark, B0), 0)
        bdir = os.path.join(str(tmp_path / "state"), "_batches")
        assert not [f for f in os.listdir(bdir) if f.endswith(".tmp")]


def _want_trunc(spark, rows, trunc):
    return sorted(
        tuple(r)
        for r in rollup_finalize(
            rollup_state(_candles(spark, rows), trunc)
        ).collect()
    )


class TestTieredMaintainer:
    """Two-tier (hourly -> daily) exactly-once: both tiers must equal
    their one-shot recomputes under replays and the inter-tier crash
    window (streaming/rollup.py TieredRollupMaintainer)."""

    def _tm(self, spark, tmp_path):
        from borsa_spark.streaming.rollup import TieredRollupMaintainer

        return TieredRollupMaintainer(spark, str(tmp_path / "tiered"))

    def _check_both(self, spark, tm, rows):
        daily = sorted(tuple(r) for r in tm.finalized().collect())
        hourly = sorted(
            tuple(r) for r in tm.hourly.finalized().collect()
        )
        assert daily == _want_trunc(spark, rows, "day")
        assert hourly == _want_trunc(spark, rows, "hour")

    def test_batches_equal_one_shot_both_tiers(self, spark, tmp_path):
        tm = self._tm(spark, tmp_path)
        tm.build(_candles(spark, BASE))
        tm.process_batch(_candles(spark, B0), 0)
        tm.process_batch(_candles(spark, B1), 1)
        self._check_both(spark, tm, BASE + B0 + B1)

    def test_committed_replay_is_noop(self, spark, tmp_path):
        tm = self._tm(spark, tmp_path)
        tm.build(_candles(spark, BASE))
        tm.process_batch(_candles(spark, B0), 0)
        tm.process_batch(_candles(spark, B0), 0)
        self._check_both(spark, tm, BASE + B0)

    def test_crash_between_tiers_then_replay(self, spark, tmp_path):
        tm = self._tm(spark, tmp_path)
        tm.build(_candles(spark, BASE))
        # tier 1 commits, then the process dies before tier 2 runs
        tm.hourly.process_batch(_candles(spark, B0), 0)
        # daily head is stale but CONSISTENT (still the base state)
        assert sorted(tuple(r) for r in tm.finalized().collect()) == \
            _want_trunc(spark, BASE, "day")
        # the delivery replays in full
        tm.process_batch(_candles(spark, B0), 0)
        self._check_both(spark, tm, BASE + B0)

    def test_torn_daily_marker_reprocesses_tier2(self, spark, tmp_path):
        tm = self._tm(spark, tmp_path)
        tm.build(_candles(spark, BASE))
        tm.process_batch(_candles(spark, B0), 0)
        with open(tm.daily._marker_path("batch-0"), "w") as f:
            f.write("{torn")
        tm.process_batch(_candles(spark, B0), 0)
        self._check_both(spark, tm, BASE + B0)

    def test_empty_batch_commits_markers_in_both_tiers(
        self, spark, tmp_path
    ):
        tm = self._tm(spark, tmp_path)
        tm.build(_candles(spark, BASE))
        tm.process_batch(_candles(spark, []), 0)
        assert tm.hourly._load_marker("batch-0") is not None
        assert tm.daily._load_marker("batch-0") is not None
        self._check_both(spark, tm, BASE)

    def test_foreachbatch_drive(self, spark, tmp_path):
        import os as _os

        src = str(tmp_path / "src")
        _os.makedirs(src)
        _candles(spark, BASE + B0).coalesce(1).write.mode(
            "overwrite"
        ).parquet(src)
        tm = self._tm(spark, tmp_path)
        tm.build(_candles(spark, []))
        stream = spark.readStream.schema(
            "symbol string, ts timestamp, value double, seq long"
        ).parquet(src)
        q = tm.attach(stream, str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        self._check_both(spark, tm, BASE + B0)

    def test_compaction_mid_stream_both_tiers(self, spark, tmp_path):
        # folding either tier's version chain between deliveries must
        # not disturb subsequent batches or the heads
        tm = self._tm(spark, tmp_path)
        tm.build(_candles(spark, BASE))
        tm.process_batch(_candles(spark, B0), 0)
        tm.hourly.compact()
        tm.daily.compact()
        tm.process_batch(_candles(spark, B1), 1)
        self._check_both(spark, tm, BASE + B0 + B1)
