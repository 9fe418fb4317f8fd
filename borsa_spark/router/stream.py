"""Top-level streaming API: `stream_quotes` (reference Borsa::stream_quotes,
borsa/src/router/stream.rs:377-406 over the generic engine at :16-326).

Ties the pieces together end-to-end:
planner (grouping, eligibility, strict rejection, primary assignment) ->
one supervisor+controller per plan -> per-provider Spark streaming queries,
each reading the provider's stream source, filtered to the session's
allow-set (P6), gated monotonic (T8, when enforced), writing APPEND into a
shared sink directory — the Spark-native fan-in (T1): the merged stream IS
the sink, readable as a batch table or a downstream readStream.

Why sink-level fan-in instead of a single union query: failover/preemption
(T4-T7) must start/stop *individual provider* sources at runtime; a static
union query cannot drop a member. One query per provider session, all
appending to one location, preserves both the supervision semantics and a
single merged consumer view.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from borsa_spark.errors import BorsaSparkError, ProviderTimeout
from borsa_spark.router.history import _BIG  # noqa: F401 (doc cross-ref)
from borsa_spark.sources.provider import Catalog
from borsa_spark.streaming.controller import StreamController, launch_plan
from borsa_spark.streaming.gate import streaming_monotonic_gate
from borsa_spark.streaming.planner import StreamInstrument, plan_stream


@dataclass
class StreamHandle:
    """Graceful shutdown handle (T10 — borsa-core/src/stream.rs:54-160)."""

    controllers: list[StreamController]
    sink_path: str
    spark: SparkSession
    schema: object = None

    def output(self) -> DataFrame:
        """The merged fan-in as a batch view of everything delivered so far."""
        return self.spark.read.schema(self.schema).parquet(self.sink_path)

    def process_available(self, timeout_s: int = 120) -> None:
        """Drain all currently-available source data (availableNow sessions)."""
        for ctl in self.controllers:
            for q in list(ctl.sessions.values()):
                if hasattr(q, "awaitTermination"):
                    q.awaitTermination(timeout_s)

    def stop(self) -> None:
        for ctl in self.controllers:
            ctl.shutdown()

    @property
    def ok(self) -> bool:
        return all(
            ctl.initial_result is not None and ctl.initial_result[0]
            for ctl in self.controllers
        )


def stream_quotes(
    spark: SparkSession,
    catalog: Catalog,
    instruments: list[StreamInstrument],
    sink_dir: str,
    enforce_monotonic: bool = True,
    trigger_available_now: bool = True,
    min_backoff_ms: int = 500,
    max_backoff_ms: int = 30_000,
) -> StreamHandle:
    """Plan + supervise + run the multi-provider quote stream.

    Each Source must expose a ``stream_quotes`` table entry that is a
    zero-arg factory returning a *streaming* DataFrame (e.g. a
    ``readStream`` on the provider's feed) in QUOTE_UPDATES shape.
    ``stream_enforce_monotonic_timestamps`` maps to ``enforce_monotonic``
    (borsa-types/src/config.rs:145-149, default on).
    """
    plans = plan_stream(catalog, instruments, "stream_quotes")

    os.makedirs(sink_dir, exist_ok=True)
    controllers: list[StreamController] = []
    schema_holder: dict = {}
    qid = [0]

    def make_start_fn(plan):
        def start_fn(provider: str, symbols: tuple[str, ...]):
            source = catalog.get(provider)
            df = source.table("stream_quotes")
            if not df.isStreaming:
                raise ProviderTimeout(
                    f"{provider}: stream_quotes table is not streaming",
                    connector=provider,
                )
            df = df.filter(F.col("symbol").isin(list(symbols)))  # P6
            if enforce_monotonic:
                df = streaming_monotonic_gate(df, key="symbol")
            schema_holder.setdefault("schema", df.schema)
            qid[0] += 1
            writer = (
                df.writeStream.format("parquet")
                .option("path", sink_dir)
                .option(
                    "checkpointLocation",
                    os.path.join(sink_dir, f"_ckpt_{provider}_{qid[0]}"),
                )
                .outputMode("append")
            )
            if trigger_available_now:
                writer = writer.trigger(availableNow=True)
            return writer.start()

        return start_fn

    for plan in plans:
        controllers.append(
            launch_plan(
                plan,
                make_start_fn(plan),
                stop_fn=lambda name, q: q.stop() if q.isActive else None,
                min_backoff_ms=min_backoff_ms,
                max_backoff_ms=max_backoff_ms,
            )
        )

    handle = StreamHandle(
        controllers=controllers,
        sink_path=sink_dir,
        spark=spark,
        schema=schema_holder.get("schema"),
    )
    if not handle.ok:
        errors = [
            ctl.initial_result[1]
            for ctl in controllers
            if ctl.initial_result and not ctl.initial_result[0]
        ]
        handle.stop()
        raise errors[0] if errors else BorsaSparkError("stream startup failed")
    return handle
