"""``spark.read.format("warc")`` — the WARC codec as a registered
PySpark Python Data Source, unifying whole-file and byte-range split
planning behind ONE user-facing format.

Reference spec: the same ISO 28500 / WARC 1.1 + Common Crawl layout
facts `sources/warc.py` documents (that module owns the codec; this
one owns the Spark V2 mount). Why a Data Source instead of the two
binaryFile→mapInPandas entry points it unifies:

- **The source picks the plan.** `partitions()` compares each file's
  size against ``split_bytes`` and emits either one whole-file task or
  ceil(size / split_bytes) byte-range tasks — callers stop choosing
  between `read_warc` and `read_warc_split` by hand, and a mixed
  directory (many 1-GB crawl files + one 40-GB repack) gets the right
  shape per file in one read.
- **Fewer copies, no caps.** binaryFile materializes the whole
  compressed file JVM-side and ships it to Python over Arrow; the
  source's executors open the file directly (pyarrow.fs) and stream
  it chunk-by-chunk, so per-task memory is one batch + one in-flight
  record even for whole-file tasks, and binaryFile's 2 GB cap is gone
  for every path, not just the split reader.
- **No fan-out shuffle.** The old split reader round-robined a tiny
  (path, start, end) relation into tasks — one Exchange per read. A
  Data Source's input partitions ARE the tasks; the split plan is
  `BatchScan warc` with zero exchanges.

Options (all strings, per the Data Source contract):

- ``path`` (required; also set by ``.load(path)``) — a directory or a
  single file; any scheme pyarrow.fs resolves (local, hdfs://, s3://).
- ``pattern`` (default ``*.warc*``) — filename glob within ``path``.
- ``errors`` (``strict`` default | ``lenient``) — lenient quarantines
  malformations as PARSE_ERROR_TYPE rows exactly like `read_warc`.
- ``split_bytes`` — ``auto`` (default): files ≤ 1 GiB read as ONE
  whole-file task (the Common Crawl unit — one task per ~1 GB file is
  the right grain at 90k files per crawl); larger ``.gz`` files fan
  into 1 GiB byte ranges. ``never``: always whole-file (`read_warc`
  semantics). An integer: every ``.gz`` file larger than it splits at
  that granularity and record_index switches to the offset-derived
  convention for the whole read (`read_warc_split` semantics).

record_index conventions (unchanged from the functions this unifies):
whole-file tasks emit the dense per-file ordinal with lenient
quarantine rows interleaved in stream order; byte-range tasks emit
``member_offset + ordinal`` (split-size-independent) with quarantine
rows at ``-offset - 1``.

Streaming: ``spark.readStream.format("warc")`` tails a landing
directory — each micro-batch reads the files that appeared since the
last committed offset (offset = the set of (path, size) seen), through
the same partition planner and record walk, executor-side. Honest
limitation, measured before shipping: the Python streaming API exposes
no admission control to ``Trigger.AvailableNow`` — Spark captures ONE
``latestOffset`` snapshot and drains it as ONE batch, so a
``maxFilesPerTrigger`` throttle inside ``latestOffset`` would strand
the backlog (spiked: a +2-files-per-call throttle under availableNow
processed 2 of 6 files and terminated). Therefore ``maxFilesPerTrigger``
here bounds only processing-time-trigger batches, and
`warc.read_warc_stream` (Spark's native file stream source, which DOES
re-trigger per file under availableNow) remains the entry point for
the one-admission-batch-per-WARC-file ingest pattern.
"""

from __future__ import annotations

import io
from typing import Iterator

import pyarrow as pa
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from borsa_spark.sources import warc as W

#: auto-split threshold AND auto-split granularity: the Common Crawl
#: file unit is ~1 GB, so "one task per file" and "1 GiB per task"
#: coincide at the production shape; only files BIGGER than this (a
#: re-packed corpus, a 40 GB mega-WARC) fan into byte ranges
AUTO_SPLIT_BYTES = 1 << 30

#: Arrow mirror of warc.WARC_SCHEMA (field order must match — Spark
#: zips the source's arrow batches against the declared schema)
_ARROW_WARC_SCHEMA = pa.schema(
    [
        ("warc_file", pa.string()),
        ("record_index", pa.int64()),
        ("warc_type", pa.string()),
        ("target_uri", pa.string()),
        ("warc_date", pa.string()),
        ("record_id", pa.string()),
        ("content_type", pa.string()),
        ("content_length", pa.int64()),
        ("http_status", pa.int64()),
        ("http_content_type", pa.string()),
        ("headers", pa.map_(pa.string(), pa.string())),
        ("body", pa.binary()),
    ]
)


def _parse_options(options: dict) -> tuple[str, str, bool, int | None, bool]:
    """(path, pattern, lenient, split_bytes|None, offset_keys).
    split_bytes None = never split; offset_keys True = the explicit
    split-mode record_index convention applies to EVERY partition."""
    path = options.get("path", "")
    if not path:
        raise ValueError(
            "format('warc') requires a path — .load(path) or "
            ".option('path', ...)"
        )
    pattern = options.get("pattern", "*.warc*")
    lenient = W._lenient(options.get("errors", "strict"))
    raw = str(options.get("split_bytes", "auto")).strip().lower()
    if raw == "never":
        split, offset_keys = None, False
    elif raw == "auto":
        split, offset_keys = AUTO_SPLIT_BYTES, False
    else:
        split = int(raw)
        if split < 1:
            raise ValueError(f"split_bytes must be >= 1, got {split}")
        offset_keys = True
    return path, pattern, lenient, split, offset_keys


class _WarcPartition(InputPartition):
    """One input task: a whole file (start=0, whole=True) or a byte
    range of one. ``offset_keys`` picks the record_index convention."""

    def __init__(self, path: str, start: int, end: int,
                 whole: bool, offset_keys: bool):
        self.path = path
        self.start = start
        self.end = end
        self.whole = whole
        self.offset_keys = offset_keys


def _plan(files, split: int | None,
          offset_keys: bool) -> list[_WarcPartition]:
    """The unified planner: per (path, size), one whole-file partition
    when the file is at or under the split size (or splitting is off,
    or the file is not gzip-member seekable — a plain ``.warc`` has no
    member boundaries to resync at); else ceil(size/split) ranges."""
    parts: list[_WarcPartition] = []
    for p, size in files:
        if split is not None and size > split and p.endswith(".gz"):
            for s in range(0, size, split):
                parts.append(_WarcPartition(
                    p, s, min(s + split, size), False, True
                ))
        else:
            parts.append(_WarcPartition(p, 0, size, True, offset_keys))
    return parts


def _flush(rows: list[dict]) -> pa.RecordBatch:
    return pa.RecordBatch.from_pylist(rows, schema=_ARROW_WARC_SCHEMA)


def _partition_batches(filesystem, part: _WarcPartition,
                       lenient: bool) -> Iterator[pa.RecordBatch]:
    """Executor-side read of one partition, yielding bounded Arrow
    batches (W._BATCH_ROWS rows / W._BATCH_BYTES payload bytes,
    whichever first) straight into Spark's columnar ingest — the same
    memory contract as every walker in `sources/warc.py`: one batch +
    one in-flight record resident, never the decompressed stream."""
    rows: list[dict] = []
    nbytes = 0
    errlog: list = []
    drained = 0
    dense_i = 0  # dense ordinal for whole-file (non-offset-key) tasks

    def drain_errors():
        nonlocal drained, dense_i
        while drained < len(errlog):
            off, msg = errlog[drained]
            if part.offset_keys or not part.whole:
                idx = -off - 1  # the disjoint split-mode error keyspace
            else:
                idx = dense_i
                dense_i += 1
            rows.append(W._error_row(part.path, idx, off, msg))
            drained += 1

    with filesystem.open_input_file(part.path) as f:
        if part.whole:
            head = f.read(2)
            f.seek(0)
            if head == b"\x1f\x8b":
                members = W._members_from_file(
                    f, 0, part.end, lenient=lenient, errlog=errlog
                )
            elif part.end == 0:
                members = iter(())  # zero-byte upload artifact: 0 rows
            else:
                # plain .warc: one pseudo-member spanning the file
                # (bounded by the file, exactly like binaryFile was)
                members = iter([(0, part.end, f.read())])
            walk = W._parse_records(members, lenient, errlog)
        else:
            walk = W._split_records(
                f, part.start, part.end, lenient, errlog
            )
        for off, _mend, k, hdr, payload in walk:
            drain_errors()
            if part.offset_keys or not part.whole:
                idx = off + k
            else:
                idx = dense_i
                dense_i += 1
            rows.append(W._record_row(part.path, idx, hdr, payload))
            nbytes += len(payload)
            if len(rows) >= W._BATCH_ROWS or nbytes >= W._BATCH_BYTES:
                yield _flush(rows)
                rows, nbytes = [], 0
        drain_errors()
    if rows:
        yield _flush(rows)


def _resolve_fs(path: str):
    """The filesystem for ``path`` (local fallback for scheme-less
    paths) WITHOUT listing — the reader carries only this into task
    closures; a 90k-file crawl listing must not ride along pickled."""
    from pyarrow import fs as pafs

    try:
        filesystem, _ = pafs.FileSystem.from_uri(path)
    except Exception:  # plain local path, no scheme
        filesystem = pafs.LocalFileSystem()
    return filesystem


class _WarcBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        (self.path, self.pattern, self.lenient, self.split,
         self.offset_keys) = _parse_options(options)
        # resolve the filesystem HERE, not in partitions(): the reader
        # is pickled to executors when it is CREATED, so state set
        # later on the driver's copy never reaches read() (pyarrow
        # filesystems pickle into the task closure, unlike the JVM
        # Hadoop gateway). The listing itself happens at planning time
        # in partitions() — driver-only, never pickled.
        self.filesystem = _resolve_fs(self.path)

    def partitions(self) -> list[InputPartition]:
        _, files = W._list_files(self.path, self.pattern)
        parts = _plan(files, self.split, self.offset_keys)
        # an empty directory must yield an empty relation, not a
        # planner error: Spark requires >= 1 partition, so emit one
        # empty sentinel task
        return parts or [_WarcPartition("", 0, 0, True, False)]

    def read(self, part: _WarcPartition) -> Iterator[pa.RecordBatch]:
        if not part.path:  # the empty-directory sentinel
            return
        yield from _partition_batches(self.filesystem, part,
                                      self.lenient)


class _WarcStreamReader(DataSourceStreamReader):
    """Directory-tailing micro-batch reader. Offset = the set of files
    seen, as ``{"files": {path: size}}`` — a new batch's partitions
    are planned from exactly the files in ``end`` missing from
    ``start``, so replay of a committed range is deterministic as long
    as landed files are immutable (the standard landing-dir contract,
    same as Spark's file stream source). Files are never re-read:
    growth of the offset dict is one (path, size) entry per file,
    the same bookkeeping the native file source keeps in its
    checkpoint log. See the module docstring for the availableNow /
    maxFilesPerTrigger limitation."""

    def __init__(self, options: dict):
        (self.path, self.pattern, self.lenient, self.split,
         self.offset_keys) = _parse_options(options)
        raw = (options.get("maxFilesPerTrigger")
               or options.get("maxfilespertrigger"))
        self.max_files = int(raw) if raw else None
        self.filesystem = _resolve_fs(self.path)
        self._last: dict[str, int] = {}

    def _listing(self) -> dict[str, int]:
        _, files = W._list_files(self.path, self.pattern)
        return {p: s for p, s in files}

    def initialOffset(self) -> dict:
        return {"files": {}}

    def latestOffset(self) -> dict:
        cur = self._listing()
        new = sorted(p for p in cur if p not in self._last)
        if self.max_files is not None:
            new = new[: self.max_files]
        off = dict(self._last)
        off.update({p: cur[p] for p in new})
        self._last = off
        return {"files": off}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        seen = start.get("files", {})
        batch = [(p, int(s)) for p, s in sorted(end["files"].items())
                 if p not in seen]
        # restart resync: the checkpoint is the truth, not this
        # process's memory of its own latestOffset calls
        merged = dict(self._last)
        merged.update({p: int(s) for p, s in end["files"].items()})
        self._last = merged
        parts = _plan(batch, self.split, self.offset_keys)
        return parts or [_WarcPartition("", 0, 0, True, False)]

    def read(self, part: _WarcPartition) -> Iterator[pa.RecordBatch]:
        if not part.path:
            return
        yield from _partition_batches(self.filesystem, part,
                                      self.lenient)

    def commit(self, end: dict) -> None:
        pass


class WarcDataSource(DataSource):
    """``spark.read.format("warc").load(dir)`` /
    ``spark.readStream.format("warc").load(dir)`` — see the module
    docstring for options and plan shapes."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self):
        return W.WARC_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _WarcBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _WarcStreamReader(self.options)


def register(spark) -> None:
    """Idempotent per-session registration of the ``warc`` format.
    Re-registering is harmless (it replaces the entry) but WARNs on
    every call, and the wrappers call this per read — so mark done
    sessions with an attribute ON the session object (its lifetime is
    exactly the registration's; an id()-keyed set would go stale when
    a collected session's id is reused by a new, unregistered one)."""
    if not getattr(spark, "_borsa_warc_registered", False):
        spark.dataSource.register(WarcDataSource)
        spark._borsa_warc_registered = True
