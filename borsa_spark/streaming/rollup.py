"""Streaming continuous aggregates: the OHLCV rollup maintained
per micro-batch, exactly once.

The batch half (operators/rollup.py) rewrites dirty partitions in
place — safe for a one-shot backfill, NOT for ``foreachBatch``: a
replayed half-applied batch would merge the batch into state that
already contains it and double-count. The streaming maintainer
therefore never mutates a committed file. State is a tiny transaction
log:

    state_dir/versions/base/          partitioned by pday (build())
    state_dir/versions/batch-<id>/    dirty pdays only, merged result
    state_dir/_batches/batch-<id>.json   commit marker, written LAST

A partition day resolves to the NEWEST committed version that wrote it
(markers record their pdays; foreachBatch ids are monotonic). The
merge for batch N reads ONLY committed versions, writes its result to
``versions/batch-N`` in overwrite mode, and commits the marker last —
so a replay of an uncommitted batch recomputes the identical output
from the identical committed inputs (idempotent), and a replay of a
committed batch returns before touching state. Same two-phase-commit
discipline as `DedupIngest` (streaming/ingest.py) and the
`borsa_tick_sink` manifest.

Scale shape: per-batch cost is O(batch + dirty partitions) — the dirty
read is partition-pruned per version dir, and untouched days are never
opened. ``compact()`` folds the version chain back to one dir when it
grows long (marker supersedes, delete after — crash leaves either the
old chain or the new base, never a torn mix).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from borsa_spark.streaming import markers
from borsa_spark.operators.rollup import (
    rollup_cascade,
    rollup_finalize,
    rollup_merge,
    rollup_state,
)

_STATE_SCHEMA = (
    "symbol string, bucket timestamp, first_ts timestamp, first_seq long,"
    " last_ts timestamp, last_seq long, open double, close double,"
    " high double, low double, n_bars long, sum_value double"
)


class RollupMaintainer:
    """Continuous OHLCV aggregate over ``foreachBatch`` micro-batches.
    Attach with :meth:`attach`, or drive :meth:`process_batch` directly
    (the unit-test / backfill path)."""

    def __init__(self, spark: SparkSession, state_dir: str,
                 trunc: str = "day"):
        self.spark = spark
        self.state_dir = state_dir
        self.trunc = trunc
        os.makedirs(os.path.join(state_dir, "_batches"), exist_ok=True)
        os.makedirs(os.path.join(state_dir, "versions"), exist_ok=True)
        self._guard_params()

    def _guard_params(self) -> None:
        """A maintainer reopened with a different bucket granularity
        would silently merge mis-bucketed state; refuse instead (the
        `guard_state_mode` convention, streaming/ingest.py)."""
        path = os.path.join(self.state_dir, "_params.json")
        params = {"trunc": self.trunc}
        if os.path.exists(path):
            with open(path) as f:
                stored = json.load(f)
            if stored != params:
                raise ValueError(
                    f"rollup state at {self.state_dir} was built with "
                    f"{stored}, reopened with {params}"
                )
        else:
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(params, f)
            os.rename(tmp, path)

    # -- version-log bookkeeping -------------------------------------------

    def _marker_path(self, name: str) -> str:
        return os.path.join(self.state_dir, "_batches", f"{name}.json")

    def _write_marker(self, name: str, payload: dict) -> None:
        """Atomic commit — see streaming/markers.py for the protocol
        (parseable-marker replays, torn markers read as uncommitted;
        ADVICE r7: a torn plain-open marker passed the os.path.exists
        replay check while _markers() skipped it)."""
        markers.write_marker(self._marker_path(name), payload)

    def _load_marker(self, name: str) -> dict | None:
        return markers.load_marker(self._marker_path(name))

    def _version_dir(self, name: str) -> str:
        return os.path.join(self.state_dir, "versions", name)

    def _markers(self) -> list[dict]:
        """Committed markers in application order: base, then batch /
        compact markers by ascending batch id (a compact marker sorts
        AFTER the last batch it folded)."""
        return sorted(
            markers.read_log(os.path.join(self.state_dir, "_batches")),
            key=lambda m: (m.get("seq", -1), 1 if m.get("compact") else 0),
        )

    def _mapping(self) -> dict[str, str]:
        """pday -> committed version dir name holding its newest state."""
        mapping: dict[str, str] = {}
        for m in self._markers():
            for pday in m.get("pdays", []):
                mapping[pday] = m["version"]
        return mapping

    def _read_versions(self, mapping: dict[str, str]) -> DataFrame:
        """Union the resolved (version dir, pday set) reads — each one
        partition-pruned to the pdays that still resolve to it."""
        by_dir: dict[str, list[str]] = {}
        for pday, ver in mapping.items():
            by_dir.setdefault(ver, []).append(pday)
        df = None
        for ver, pdays in sorted(by_dir.items()):
            part = (
                self.spark.read.schema(_STATE_SCHEMA + ", pday string")
                .parquet(self._version_dir(ver))
                .filter(F.col("pday").isin(pdays))
                .drop("pday")
            )
            df = part if df is None else df.unionByName(part)
        if df is None:
            return self.spark.createDataFrame([], _STATE_SCHEMA)
        return df

    # -- public surface ------------------------------------------------------

    def _commit_version(
        self, state: DataFrame, name: str, seq: int
    ) -> list[str]:
        """Write ``state`` as version ``name`` and commit its marker
        LAST; returns the pday list. The shared write half of build /
        process_batch / replace_batch. The pday set is read back from
        the written directory's ``pday=`` partition names — free, and
        it never re-executes the (possibly expensive merge) plan a
        second time (round-8 review finding: a distinct().collect() on
        the plan here doubled the per-batch read work)."""
        state.withColumn(
            "pday", F.date_format("bucket", "yyyy-MM-dd")
        ).write.mode("overwrite").partitionBy("pday").parquet(
            self._version_dir(name)
        )
        pdays = sorted(
            d.split("=", 1)[1]
            for d in os.listdir(self._version_dir(name))
            if d.startswith("pday=")
        )
        if "__HIVE_DEFAULT_PARTITION__" in pdays:
            # unbucketable (null-bucket) state would be committed yet
            # unreadable by the pday-keyed resolution; rollup_state
            # drops null-ts ticks so this is unreachable — keep it loud
            raise ValueError(
                f"version {name} wrote a null-bucket partition; "
                "null-ts ticks must be dropped before the maintainer"
            )
        self._write_marker(
            name, {"version": name, "seq": seq, "pdays": pdays}
        )
        return pdays

    def build(self, candles: DataFrame) -> None:
        """Materialize the base rollup (idempotent overwrite; marker
        last, the same discipline as a batch)."""
        self.build_from_state(rollup_state(candles, self.trunc))

    def build_from_state(self, state: DataFrame) -> None:
        """Base build from ALREADY-AGGREGATED mergeable state — the
        cascaded-tier entry point (the daily tier's base is the hourly
        tier's base re-bucketed, never a second tick scan)."""
        self._commit_version(state, "base", -1)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        name = f"batch-{batch_id}"
        if self._load_marker(name) is not None:
            return  # replayed micro-batch with a PARSEABLE marker: final
        # lazy: the dirty-pday collect below is the first action and
        # materializes the checkpoint as a side effect — eager ran the
        # identical batch aggregation as its own separate job first
        # (round 14; one job per processed batch saved, the merge
        # still reads the persisted RDD, never the lineage)
        batch_state = rollup_state(batch_df, self.trunc).localCheckpoint(
            eager=False
        )
        dirty = sorted(
            r.pday
            for r in batch_state.select(
                F.date_format("bucket", "yyyy-MM-dd").alias("pday")
            )
            .distinct()
            .collect()
        )
        if dirty:
            # merge against COMMITTED state only; overwrite our own
            # version dir (uncommitted replay redoes identical output)
            mapping = {
                p: v for p, v in self._mapping().items() if p in dirty
            }
            merged = rollup_merge(self._read_versions(mapping), batch_state)
            self._commit_version(merged, name, int(batch_id))
        else:
            self._write_marker(
                name, {"version": name, "seq": int(batch_id), "pdays": []}
            )

    def replace_batch(self, new_state: DataFrame, batch_id: int) -> None:
        """Commit ``new_state`` — the COMPLETE mergeable state of every
        pday it contains — as this batch's version. Replacement
        semantics per partition day (resolution already maps each pday
        to its newest committed version), used by cascaded tiers whose
        input is a parent tier's already-merged state: merging would
        double-count, because the parent state is cumulative, not a
        delta. Same replay discipline as process_batch: parseable
        marker short-circuits, uncommitted replay rewrites identical
        output."""
        name = f"batch-{batch_id}"
        if self._load_marker(name) is not None:
            return
        self._commit_version(new_state, name, int(batch_id))

    def dirty_days_for(self, batch_id: int) -> list[str]:
        """The pday set a committed batch touched — the key index of
        its change log (`changes_for` restricted to partition keys),
        readable without opening any data file."""
        m = self._load_marker(f"batch-{batch_id}")
        if m is None:
            raise ValueError(f"batch {batch_id} has no committed marker")
        return list(m.get("pdays", []))

    def current_state(self) -> DataFrame:
        return self._read_versions(self._mapping())

    def state_as_of(self, batch_id: int) -> DataFrame:
        """Time travel: the rollup as it stood after ``batch_id``
        committed (base = -1). Free with the version log — resolution
        just ignores later markers. Compaction trades this away for
        the folded range: versions at or below a compact marker's seq
        are superseded and no longer addressable."""
        mapping: dict[str, str] = {}
        for m in self._markers():
            if m.get("seq", -1) > batch_id:
                continue
            for pday in m.get("pdays", []):
                mapping[pday] = m["version"]
        return self._read_versions(mapping)

    def finalized(self) -> DataFrame:
        return rollup_finalize(self.current_state())

    def changes_for(self, batch_id: int) -> DataFrame:
        """CDC view of one committed batch: (change, symbol, bucket_ts,
        before-* / after-*) rows for every rollup key the batch
        touched — 'insert' for new buckets, 'update' with both images
        otherwise. Downstream caches/sinks consume this instead of
        re-diffing snapshots; it reads the batch's own version dir plus
        the PRIOR state of only its dirty days (partition-pruned), so
        the CDC cost matches the merge cost, not the history size."""
        m = self._load_marker(f"batch-{batch_id}")
        if m is None:
            raise ValueError(f"batch {batch_id} has no committed marker")
        pdays = m.get("pdays", [])
        if not pdays:
            # same 15-column contract as a non-empty batch: consumers
            # must not crash on a quiet micro-batch
            cols = ", ".join(
                f"{side}_{c} {'long' if c == 'n_bars' else 'double'}"
                for side in ("after", "before")
                for c in ("open", "high", "low", "close", "n_bars",
                          "sum_value")
            )
            return self.spark.createDataFrame(
                [], f"change string, symbol string, bucket_ts long, {cols}"
            )
        after = self._read_versions(
            {p: f"batch-{batch_id}" for p in pdays}
        )
        prev_map = {}
        for m in self._markers():
            if m.get("seq", -1) >= batch_id:
                continue
            for pday in m.get("pdays", []):
                if pday in pdays:
                    prev_map[pday] = m["version"]
        before = self._read_versions(prev_map)
        a = rollup_finalize(after).select(
            "symbol", "bucket_ts",
            *[F.col(c).alias(f"after_{c}") for c in
              ("open", "high", "low", "close", "n_bars", "sum_value")],
        )
        b = rollup_finalize(before).select(
            "symbol", "bucket_ts",
            *[F.col(c).alias(f"before_{c}") for c in
              ("open", "high", "low", "close", "n_bars", "sum_value")],
        )
        joined = a.join(b, ["symbol", "bucket_ts"], "left")
        # a dirty DAY rewrite carries along same-day buckets the batch
        # never touched (their state is copied verbatim); real changes
        # always increment n_bars, so no-op rows are filterable exactly
        return joined.filter(
            F.col("before_n_bars").isNull()
            | (F.col("before_n_bars") != F.col("after_n_bars"))
        ).select(
            F.when(F.col("before_n_bars").isNull(), F.lit("insert"))
            .otherwise(F.lit("update"))
            .alias("change"),
            "*",
        )

    def attach(self, stream_df: DataFrame, checkpoint: str, **opts):
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(**(opts or {"availableNow": True}))
            .start()
        )

    def compact(self) -> dict:
        """Fold the committed version chain into one dir. Marker last:
        a crash leaves either the old chain (new dir is invisible
        garbage) or the new compact state (old dirs are garbage,
        resolution ignores them); cleanup of superseded dirs happens
        only after the compact marker is durable."""
        committed = self._markers()
        batch_seqs = [m["seq"] for m in committed]
        through = max(batch_seqs) if batch_seqs else -1
        mapping = self._mapping()
        name = f"compact-{through}"
        if self._load_marker(name) is not None:
            # nothing new since the last compact: re-running would read
            # versions/compact-N while statically overwriting the SAME
            # directory — the delete lands before the tasks read, and
            # the only copy of the state is destroyed. Idempotent no-op.
            return {"version": name, "superseded": []}
        cur = self._read_versions(mapping).withColumn(
            "pday", F.date_format("bucket", "yyyy-MM-dd")
        )
        cur.write.mode("overwrite").partitionBy("pday").parquet(
            self._version_dir(name)
        )
        self._write_marker(
            name,
            {
                "version": name,
                "seq": int(through),
                "compact": True,
                "pdays": sorted(mapping),
            },
        )
        # superseded markers + dirs are garbage now; best-effort removal
        removed = []
        for m in committed:
            if m["version"] == name:
                continue
            try:
                os.remove(self._marker_path(m["version"]))
                shutil.rmtree(
                    self._version_dir(m["version"]), ignore_errors=True
                )
                removed.append(m["version"])
            except OSError:
                pass
        return {"version": name, "superseded": removed}


class TieredRollupMaintainer:
    """Chained continuous aggregates — hourly AND daily maintained
    exactly-once from ONE ``foreachBatch`` delivery (the TimescaleDB
    "continuous aggregate on a continuous aggregate" shape, public
    docs; the reference's resample tower a2->a3 recomputes from ticks,
    this maintains both tiers incrementally).

    Protocol per micro-batch:
      1. the hourly tier absorbs the batch (`process_batch` — replay-
         idempotent, marker-last);
      2. the daily tier consumes the hourly tier's CHANGE LOG for this
         batch — the committed marker's pday set (`dirty_days_for`, the
         partition-key index of `changes_for`) — and re-derives the
         daily state of exactly those days from the hourly tier's
         state via `rollup_cascade`, committing it with REPLACEMENT
         semantics (`replace_batch`). The full CDC images are not the
         input here: finalization rounds and drops the merge fields
         (first/last ts+seq), and mergeable-state maintenance of
         max/min needs the parent state, not deltas.

    Exactly-once across BOTH tiers under crash/replay: a replay after
    full commit no-ops both tiers (parseable markers); a crash BETWEEN
    tiers leaves the hourly marker committed, and the replayed delivery
    no-ops tier 1 then recomputes tier 2 from the hourly state of the
    marker's pdays — final for this batch id, so the rewrite is
    bit-identical. Monotonic batch ids (the Structured Streaming
    contract: batch N replays only before N+1 starts) are assumed,
    exactly as in `RollupMaintainer`.

    Scale shape: tier-1 cost is O(batch + dirty partitions); tier-2
    cost is O(hourly state of the dirty DAYS) — ~24 rows per dirty
    symbol-day, never the tick history. A k-tier tower pays each tier
    only its parent's state size."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.hourly = RollupMaintainer(
            spark, os.path.join(state_dir, "hourly"), trunc="hour"
        )
        self.daily = RollupMaintainer(
            spark, os.path.join(state_dir, "daily"), trunc="day"
        )

    def build(self, candles: DataFrame) -> None:
        """Base builds for both tiers from ONE tick aggregation: the
        hourly base materializes, the daily base cascades from it."""
        self.hourly.build(candles)
        hourly_base = self.hourly.current_state()
        self.daily.build_from_state(rollup_cascade(hourly_base, "day"))

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self.hourly.process_batch(batch_df, batch_id)
        dirty_days = self.hourly.dirty_days_for(batch_id)
        if not dirty_days:
            self.daily.replace_batch(
                self.daily.spark.createDataFrame([], _STATE_SCHEMA),
                batch_id,
            )
            return
        # the hourly state of exactly the dirty days, partition-pruned
        mapping = {
            p: v
            for p, v in self.hourly._mapping().items()
            if p in set(dirty_days)
        }
        hourly_state = self.hourly._read_versions(mapping)
        self.daily.replace_batch(
            rollup_cascade(hourly_state, "day"), batch_id
        )

    def finalized(self) -> DataFrame:
        """The DAILY head (the tower's public face); the hourly head
        stays available as ``self.hourly.finalized()``."""
        return self.daily.finalized()

    def attach(self, stream_df: DataFrame, checkpoint: str, **opts):
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(**(opts or {"availableNow": True}))
            .start()
        )
