"""PySpark Python Data Source mounts for the provider layer
(sources/datasource.py): per-symbol partitioned batch history scan and the
offset-replayable quote tick stream with websocket->polling fallback
(borsa-yfinance adapter.rs:352-382 YfStream semantics, Spark-mounted)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from borsa_spark.errors import InvalidArgError
from borsa_spark.sources.datasource import (
    WebsocketUnavailable,
    _QuoteStreamReader,
    register_datasources,
)

SF = "/root/testdata/sf0.001"
SYMS = "click,view,purchase,signup,error"


@pytest.fixture()
def registered(spark):
    register_datasources(spark)
    return spark


def _direct(spark, symbols):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type").isin(*symbols.split(",")))
        .select(
            F.col("event_type").alias("symbol"),
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us_s"),
            F.col("value").alias("price"),
            F.col("event_id").alias("seq"),
        )
    )


class TestBatchHistorySource:
    def test_matches_direct_parquet_read(self, registered):
        spark = registered
        got = (
            spark.read.format("borsa_history")
            .option("path", SF)
            .option("symbols", SYMS)
            .load()
        )
        # ts cast: Spark's cast(ts as long) is seconds; the source emits
        # micros — compare on micros//1e6 alongside the exact price/seq.
        got_set = {
            (r.symbol, r.ts_us, r.price, r.seq) for r in got.collect()
        }
        want_set = {
            (r.symbol, r.ts_us_s, r.price, r.seq)
            for r in _direct(spark, SYMS).collect()
        }
        assert got_set == want_set and len(got_set) == 1000

    def test_one_partition_per_symbol(self, registered):
        df = (
            registered.read.format("borsa_history")
            .option("path", SF)
            .option("symbols", "click,view")
            .load()
        )
        assert df.rdd.getNumPartitions() == 2

    def test_missing_symbols_option_raises(self, registered):
        with pytest.raises(Exception) as ei:
            (
                registered.read.format("borsa_history")
                .option("path", SF)
                .load()
                .collect()
            )
        assert "symbols" in str(ei.value)

    def test_unknown_symbol_reads_empty(self, registered):
        df = (
            registered.read.format("borsa_history")
            .option("path", SF)
            .option("symbols", "NOPE")
            .load()
        )
        # Empty, not an error: absence is the router's P3 empty-result
        # filter's concern, not a transport failure.
        assert df.count() == 0


class TestQuoteStreamReaderUnit:
    OPTS = {"path": SF, "symbols": "click,view", "batch_rows": "100"}

    def test_fallback_resolves_to_polling(self):
        r = _QuoteStreamReader(dict(self.OPTS))
        assert r.initialOffset() == {"seq": 0, "method": "polling"}

    def test_explicit_websocket_fails_loudly(self):
        r = _QuoteStreamReader({**self.OPTS, "method": "websocket"})
        with pytest.raises(WebsocketUnavailable):
            r.initialOffset()

    def test_forced_websocket_ok_branch(self):
        r = _QuoteStreamReader({**self.OPTS, "_force_websocket_ok": "true"})
        assert r.initialOffset()["method"] == "websocket"

    def test_bad_method_rejected(self):
        with pytest.raises(InvalidArgError):
            _QuoteStreamReader({**self.OPTS, "method": "carrier_pigeon"})

    def test_offsets_partition_log_without_gap_or_overlap(self):
        r = _QuoteStreamReader(dict(self.OPTS))
        off = r.initialOffset()
        seen = []
        while True:
            rows, nxt = r.read(off)
            rows = list(rows)
            if not rows:
                break
            seen.extend(rows)
            assert nxt["seq"] == off["seq"] + len(rows)
            off = nxt
        # Totally ordered, complete, no dupes.
        import pyarrow.parquet as pq

        want = len(
            [
                v
                for v in pq.read_table(
                    f"{SF}/events.parquet", columns=["event_type"]
                )
                .column("event_type")
                .to_pylist()
                if v in ("click", "view")
            ]
        )
        assert len(seen) == len({t[3] for t in seen}) == want
        assert seen == sorted(seen, key=lambda t: (t[1], t[3]))

    def test_replay_is_deterministic(self):
        r1 = _QuoteStreamReader(dict(self.OPTS))
        o0 = r1.initialOffset()
        rows, o1 = r1.read(o0)
        rows = list(rows)
        # A fresh reader instance (as after query restart) replays the
        # exact committed range — the exactly-once contract.
        r2 = _QuoteStreamReader(dict(self.OPTS))
        assert list(r2.readBetweenOffsets(o0, o1)) == rows


class TestQuoteStreamEndToEnd:
    def test_stream_drains_to_batch_equivalent(self, registered, tmp_path):
        spark = registered
        sdf = (
            spark.readStream.format("borsa_quote_stream")
            .option("path", SF)
            .option("symbols", SYMS)
            .option("batch_rows", "300")
            .load()
        )
        q = (
            sdf.writeStream.format("memory")
            .queryName("ds_ticks")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        # availableNow drains only the prefetched first batch for a
        # SimpleDataSourceStreamReader, so poll until the log is consumed.
        import time

        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM ds_ticks").head().c >= 1000:
                break
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(30)
        got = spark.sql("SELECT symbol, ts_us, price, seq FROM ds_ticks")
        batch = (
            spark.read.format("borsa_history")
            .option("path", SF)
            .option("symbols", SYMS)
            .load()
        )
        assert got.count() == 1000
        assert (
            got.exceptAll(batch).count() == 0
            and batch.exceptAll(got).count() == 0
        )


class TestTickSink:
    """Transactional sink: two-phase commit with a manifest; only
    manifested parts are readable (exactly-once read side)."""

    def test_stream_to_sink_roundtrip(self, registered, tmp_path):
        spark = registered
        out = str(tmp_path / "out")
        sdf = (
            spark.readStream.format("borsa_quote_stream")
            .option("path", SF)
            .option("symbols", SYMS)
            .option("batch_rows", "400")
            .load()
        )
        q = (
            sdf.writeStream.format("borsa_tick_sink")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        import time

        from borsa_spark.sources.datasource import read_tick_sink

        deadline = time.time() + 120
        while time.time() < deadline:
            if read_tick_sink(spark, out).count() >= 1000:
                break
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(30)
        got = read_tick_sink(spark, out)
        batch = (
            spark.read.format("borsa_history")
            .option("path", SF)
            .option("symbols", SYMS)
            .load()
        )
        assert got.count() == 1000
        assert got.exceptAll(batch).count() == 0

    def test_unmanifested_parts_invisible(self, registered, tmp_path):
        # A part file dropped in the dir without a manifest entry must not
        # be read back: crash-between-moves leaves garbage, never rows.
        import pyarrow as pa
        import pyarrow.parquet as pq

        from borsa_spark.sources.datasource import (
            _ARROW_TICK_SCHEMA,
            read_tick_sink,
        )

        out = tmp_path / "orphan"
        out.mkdir()
        pq.write_table(
            pa.table(
                {"symbol": ["x"], "ts_us": [1], "price": [1.0], "seq": [1]},
                schema=_ARROW_TICK_SCHEMA,
            ),
            str(out / "part-0-deadbeef.parquet"),
        )
        assert read_tick_sink(registered, str(out)).count() == 0

    def test_replayed_batch_commits_once(self, registered, tmp_path):
        # Direct unit drive of the writer: commit the same batchId twice
        # (restart raced the checkpoint) -> second commit is dropped.
        import json

        from borsa_spark.sources.datasource import _TickStreamWriter

        out = tmp_path / "replay"
        out.mkdir()
        w = _TickStreamWriter({"path": str(out)})

        class _Ctx:  # stand-in for TaskContext on the driver
            @staticmethod
            def partitionId():
                return 0

        import borsa_spark.sources.datasource as dsmod
        import pyspark

        orig = pyspark.TaskContext.get
        pyspark.TaskContext.get = staticmethod(lambda: _Ctx())
        try:
            m1 = w.write(iter([("a", 1, 1.0, 1)]))
            w.commit([m1], batchId=7)
            m2 = w.write(iter([("a", 1, 1.0, 1)]))
            w.commit([m2], batchId=7)  # replay: must not double-commit
        finally:
            pyspark.TaskContext.get = orig
        manifests = list(out.glob("manifest-*.json"))
        assert len(manifests) == 1
        doc = json.loads(manifests[0].read_text())
        assert len(doc["parts"]) == 1
        from borsa_spark.sources.datasource import read_tick_sink

        assert read_tick_sink(registered, str(out)).count() == 1
        # replayed staging file was cleaned up
        assert list((out / "_staging").glob("*.parquet")) == []

    def test_abort_cleans_staging(self, registered, tmp_path):
        from borsa_spark.sources.datasource import _TickStreamWriter

        out = tmp_path / "abort"
        out.mkdir()
        w = _TickStreamWriter({"path": str(out)})

        class _Ctx:
            @staticmethod
            def partitionId():
                return 3

        import pyspark

        orig = pyspark.TaskContext.get
        pyspark.TaskContext.get = staticmethod(lambda: _Ctx())
        try:
            m = w.write(iter([("b", 2, 2.0, 2)]))
        finally:
            pyspark.TaskContext.get = orig
        w.abort([m], batchId=1)
        assert list((out / "_staging").glob("*.parquet")) == []
        assert list(out.glob("manifest-*.json")) == []


class TestSymbolAutoDiscovery:
    def test_auto_matches_explicit_universe(self, registered):
        auto = (
            registered.read.format("borsa_history")
            .option("path", SF)
            .option("symbols", "auto")
            .load()
        )
        explicit = (
            registered.read.format("borsa_history")
            .option("path", SF)
            .option("symbols", SYMS)
            .load()
        )
        assert auto.rdd.getNumPartitions() == 5
        assert auto.count() == explicit.count() == 1000

    def test_auto_without_path_raises(self, registered):
        with pytest.raises(Exception) as ei:
            (
                registered.read.format("borsa_history")
                .option("symbols", "auto")
                .load()
                .collect()
            )
        assert "path" in str(ei.value)


class TestRestartRecovery:
    def test_exactly_once_across_query_restart(self, registered, tmp_path):
        """Kill the stream mid-log, restart from the same checkpoint:
        the sink must end with every tick exactly once — source offsets
        (readBetweenOffsets replay) + sink manifests (replayed batchIds
        dropped) compose into end-to-end exactly-once."""
        import time

        from borsa_spark.sources.datasource import read_tick_sink

        spark = registered
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        def start():
            return (
                spark.readStream.format("borsa_quote_stream")
                .option("path", SF)
                .option("symbols", SYMS)
                .option("batch_rows", "150")
                .load()
                .writeStream.format("borsa_tick_sink")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="0 seconds")
                .start()
            )

        q = start()
        # let a few batches commit, then kill mid-run
        deadline = time.time() + 60
        while time.time() < deadline and read_tick_sink(spark, out).count() < 300:
            time.sleep(0.2)
        q.stop()
        q.awaitTermination(30)
        mid = read_tick_sink(spark, out).count()
        assert 0 < mid < 1000  # genuinely mid-log

        q2 = start()
        deadline = time.time() + 90
        while time.time() < deadline and read_tick_sink(spark, out).count() < 1000:
            time.sleep(0.3)
        q2.stop()
        q2.awaitTermination(30)

        got = read_tick_sink(spark, out)
        assert got.count() == 1000                      # no loss
        assert got.select("seq").distinct().count() == 1000  # no dups
