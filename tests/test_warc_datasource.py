"""The registered ``warc`` Python Data Source
(sources/warc_datasource.py): option surface, the unified whole-file /
byte-range planner, record_index conventions, and the streaming
reader's documented semantics. The wrapped entry points (read_warc /
read_warc_split) are exercised across tests/test_warc.py; this module
pins what the FORMAT adds."""

from __future__ import annotations

import os

import pytest

from borsa_spark.sources import warc as W
from borsa_spark.sources import warc_datasource as WD


def _resp(url: str, body: bytes) -> bytes:
    return W.warc_record(
        "response",
        {"WARC-Target-URI": url,
         "Content-Type": "application/http; msgtype=response"},
        W.http_response(200, "OK", {"Content-Type": "text/html"}, body),
    )


class TestPlanner:
    """The unified planner, unit-level (sizes are free here; the auto
    threshold is 1 GiB, which no fixture should materialize)."""

    def test_auto_small_files_stay_whole(self):
        parts = WD._plan([("a.warc.gz", 100), ("b.warc.gz", 200)],
                         WD.AUTO_SPLIT_BYTES, False)
        assert [(p.path, p.start, p.end, p.whole, p.offset_keys)
                for p in parts] == [
            ("a.warc.gz", 0, 100, True, False),
            ("b.warc.gz", 0, 200, True, False),
        ]

    def test_auto_oversized_gz_fans_out(self):
        big = WD.AUTO_SPLIT_BYTES * 2 + 5
        parts = WD._plan([("big.warc.gz", big), ("s.warc.gz", 9)],
                         WD.AUTO_SPLIT_BYTES, False)
        ranges = [p for p in parts if not p.whole]
        assert len(ranges) == 3  # ceil(big / 1 GiB)
        assert ranges[0].start == 0
        assert ranges[-1].end == big
        # ranges tile the file exactly
        for a, b in zip(ranges, ranges[1:]):
            assert a.end == b.start
        assert all(p.offset_keys for p in ranges)
        # the small sibling is untouched, dense keys
        [small] = [p for p in parts if p.whole]
        assert not small.offset_keys

    def test_plain_warc_never_splits(self):
        # no gzip member boundaries to resync at — a plain .warc must
        # stay whole no matter its size
        big = WD.AUTO_SPLIT_BYTES * 3
        parts = WD._plan([("huge.warc", big)], WD.AUTO_SPLIT_BYTES,
                         False)
        assert len(parts) == 1 and parts[0].whole

    def test_explicit_split_keys_every_partition(self):
        # read_warc_split semantics: offset-derived record_index even
        # for files too small to split
        parts = WD._plan([("s.warc.gz", 50), ("b.warc.gz", 300)],
                         100, True)
        assert all(p.offset_keys for p in parts)
        assert sum(not p.whole for p in parts) == 3  # b's 3 ranges


class TestFormatSurface:
    def test_format_read_equals_read_warc(self, spark, tmp_path):
        for i in range(4):
            W.write_warc(str(tmp_path / f"f{i}.warc.gz"),
                         [_resp(f"http://d/{i}", b"<p>x</p>")])
        WD.register(spark)
        direct = (spark.read.format("warc").load(str(tmp_path))
                  .collect())
        wrapped = W.read_warc(spark, str(tmp_path)).collect()

        def key(rows):
            return sorted((r.warc_file, r.record_index, r.target_uri,
                           bytes(r.body)) for r in rows)

        assert key(direct) == key(wrapped) and len(direct) == 4

    def test_option_validation(self, spark, tmp_path):
        WD.register(spark)
        with pytest.raises(Exception, match="split_bytes"):
            (spark.read.format("warc")
             .option("split_bytes", "0").load(str(tmp_path)).count())
        with pytest.raises(Exception, match="strict|lenient"):
            (spark.read.format("warc")
             .option("errors", "wat").load(str(tmp_path)).count())
        with pytest.raises(Exception, match="path"):
            spark.read.format("warc").load().count()

    def test_empty_directory_is_an_empty_relation(self, spark,
                                                  tmp_path):
        WD.register(spark)
        df = spark.read.format("warc").load(str(tmp_path))
        assert df.count() == 0
        assert df.schema == W.WARC_SCHEMA

    def test_plain_uncompressed_warc_reads(self, spark, tmp_path):
        recs = [_resp(f"http://p/{i}", b"<p>y</p>") for i in range(3)]
        (tmp_path / "plain.warc").write_bytes(b"".join(recs))
        WD.register(spark)
        rows = (spark.read.format("warc").load(str(tmp_path))
                .collect())
        assert sorted(r.target_uri for r in rows) == [
            f"http://p/{i}" for i in range(3)
        ]
        # whole-file dense ordinals
        assert sorted(r.record_index for r in rows) == [0, 1, 2]

    def test_record_index_conventions(self, spark, tmp_path):
        recs = [_resp(f"http://k/{i}", b"<p>z</p>") for i in range(3)]
        p = str(tmp_path / "k.warc.gz")
        W.write_warc(p, recs)
        dense = W.read_warc(spark, str(tmp_path)).collect()
        assert sorted(r.record_index for r in dense) == [0, 1, 2]
        offs = W.read_warc_split(spark, p, split_bytes=60).collect()
        idx = sorted(r.record_index for r in offs)
        assert idx[0] == 0 and idx[1] > 0  # member offsets, not 0,1,2
        assert len(set(idx)) == 3


class TestStreamFormat:
    """readStream.format('warc'): snapshot-per-trigger semantics —
    and the documented availableNow limitation pinned exactly as
    measured (ONE batch draining the whole snapshot; per-file batch
    granularity needs read_warc_stream's native file source)."""

    def test_available_now_drains_snapshot_as_one_batch(
        self, spark, tmp_path
    ):
        src = tmp_path / "land"
        src.mkdir()
        for i in range(3):
            W.write_warc(str(src / f"f{i}.warc.gz"),
                         [_resp(f"http://s/{i}", b"<p>s</p>")])
        WD.register(spark)
        batches = []

        def fb(df, bid):
            batches.append((bid, df.count()))

        q = (spark.readStream.format("warc").load(str(src))
             .writeStream.foreachBatch(fb)
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert batches == [(0, 3)]  # one snapshot batch, all 3 files

        # files are never re-read: a new file + the SAME checkpoint
        # yields exactly the new file's records (offset = set of files
        # seen; the batch is the set difference)
        W.write_warc(str(src / "f9.warc.gz"),
                     [_resp("http://s/9", b"<p>n</p>")])
        batches.clear()
        q2 = (spark.readStream.format("warc").load(str(src))
              .writeStream.foreachBatch(fb)
              .option("checkpointLocation", str(tmp_path / "ck"))
              .trigger(availableNow=True).start())
        q2.awaitTermination(120)
        assert sum(n for _, n in batches) == 1
