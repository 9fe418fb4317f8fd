"""Streaming soak: multi-batch failover/failback through the real
controller over a live rate source, and gate-state survival across a query
restart on the RocksDB state store.

The scenario tests in test_streaming.py drive the pure state machine with
scripted events and run single availableNow drains; this module is the
integration soak the reference exercises with its long-running failover
examples (borsa/src/router/streaming/controller.rs event loop +
filters.rs gate state): real StreamingQuery handles, multiple micro-batches
per phase, RocksDB-backed state, and a query restart that must resume the
gate's high-water mark from the checkpoint rather than re-admitting stale
rows.
"""

from __future__ import annotations

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F

from borsa_spark.errors import ProviderTimeout
from borsa_spark.streaming import streaming_monotonic_gate
from borsa_spark.streaming.controller import launch_plan
from borsa_spark.streaming.planner import SupervisorPlan

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _ts(sec: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
        seconds=sec
    )


@pytest.fixture()
def rocksdb_state(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, "")
    spark.conf.set(key, ROCKSDB)
    try:
        yield
    finally:
        if prev:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)


class TestGateStateSurvivesRestart:
    def test_hwm_restored_from_rocksdb_checkpoint(
        self, spark, tmp_path, rocksdb_state
    ):
        """Run the gate, stop the query, append OLDER rows, restart from the
        same checkpoint: the restored HWM must reject them. If state did not
        survive, the first stale row would pass (first-row-always-passes on
        fresh state) — so any stale emission is a hard failure."""
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        schema = "symbol string, ts timestamp, price double, seq long"

        def drain():
            # file sink, not memory: the memory sink cannot recover from a
            # checkpoint, and checkpoint recovery is exactly what this test
            # is about
            stream = spark.readStream.schema(schema).parquet(src)
            gated = streaming_monotonic_gate(stream, key="symbol")
            q = (
                gated.writeStream.format("parquet")
                .outputMode("append")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120)

        rows1 = [("AAPL", _ts(100), 1.0, 1), ("AAPL", _ts(200), 2.0, 2),
                 ("AAPL", _ts(300), 3.0, 3)]
        spark.createDataFrame(rows1, schema).write.mode("append").parquet(src)
        drain()
        got1 = {r.seq for r in spark.read.parquet(out).collect()}
        assert got1 == {1, 2, 3}

        # run 2: two stale rows (must be dropped by the RESTORED hwm=300),
        # one equal (allowed), two fresh
        rows2 = [("AAPL", _ts(150), 9.0, 4), ("AAPL", _ts(250), 9.0, 5),
                 ("AAPL", _ts(300), 3.5, 6), ("AAPL", _ts(350), 4.0, 7),
                 ("AAPL", _ts(400), 5.0, 8)]
        spark.createDataFrame(rows2, schema).write.mode("append").parquet(src)
        drain()
        got2 = {r.seq for r in spark.read.parquet(out).collect()} - got1
        assert got2 == {6, 7, 8}, f"stale rows re-admitted: {got2}"


class TestFailoverRocksdbSoak:
    def test_failover_rocksdb_soak(self, spark, tmp_path, rocksdb_state):
        """Primary serves multiple live micro-batches; dies; the controller
        fails over to the backup (real query, real batches); the primary
        recovers and the controller preempts the backup (failback). All
        sessions are rate-source queries through the stateful gate on
        RocksDB — the full control loop against live streams, not a
        scripted drain."""
        down = {"p0": False}
        queries: dict[str, list] = {"p0": [], "p1": []}

        def start_fn(provider: str, symbols: tuple[str, ...]):
            if down.get(provider):
                raise ProviderTimeout(provider)
            stream = (
                spark.readStream.format("rate")
                .option("rowsPerSecond", "200")
                .load()
                .select(
                    F.lit(symbols[0]).alias("symbol"),
                    F.col("timestamp").alias("ts"),
                    F.col("value").cast("double").alias("price"),
                    F.col("value").alias("seq"),
                )
            )
            gated = streaming_monotonic_gate(stream, key="symbol")
            q = (
                gated.writeStream.format("noop")
                .outputMode("append")
                .option(
                    "checkpointLocation",
                    str(tmp_path / f"ckpt_{provider}_{len(queries[provider])}"),
                )
                .trigger(processingTime="250 milliseconds")
                .start()
            )
            queries[provider].append(q)
            return q

        def wait_batches(q, n: int, timeout: float = 60.0) -> None:
            t0 = time.time()
            while time.time() - t0 < timeout:
                p = q.lastProgress
                if p is not None and p.get("batchId", -1) >= n:
                    return
                time.sleep(0.25)
            raise AssertionError(
                f"query did not reach batch {n} in {timeout}s: "
                f"{q.lastProgress}"
            )

        plan = SupervisorPlan(
            kind="EQUITY",
            exchange=None,
            providers=["p0", "p1"],
            provider_symbols=[{"AAPL"}, {"AAPL"}],
            required_symbols={"AAPL"},
        )
        ctl = launch_plan(plan, start_fn)
        try:
            # phase 1: primary live, multiple micro-batches
            assert ctl.initial_result == (True, None)
            (q0,) = queries["p0"]
            wait_batches(q0, 2)

            # phase 2: primary dies mid-flight -> failover to backup
            down["p0"] = True
            q0.stop()
            ctl.session_ended("p0")
            ctl.advance_ms(120_000)  # fire the retry tick: p0 fails, p1 starts
            assert queries["p1"], "backup was not started on failover"
            (q1,) = queries["p1"]
            assert 1 in ctl.sessions and 0 not in ctl.sessions
            wait_batches(q1, 2)

            # phase 3: primary recovers -> failback preempts the backup
            down["p0"] = False
            ctl.advance_ms(240_000)
            assert len(queries["p0"]) == 2, "primary was not restarted"
            q0b = queries["p0"][1]
            wait_batches(q0b, 2)
            assert 0 in ctl.sessions and 1 not in ctl.sessions
            # the backup's query was actually stopped, not just forgotten
            t0 = time.time()
            while q1.isActive and time.time() - t0 < 30:
                time.sleep(0.25)
            assert not q1.isActive
            assert q0b.isActive
        finally:
            ctl.shutdown()
        for qs in queries.values():
            for q in qs:
                assert not q.isActive  # graceful shutdown stopped everything
