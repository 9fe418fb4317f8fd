"""Streaming dedup-admission ingest (streaming/ingest.py): persisted
corpus state, exact+near-dup screening per micro-batch, idempotent batch
replay, and a live foreachBatch drive over a file stream."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from borsa_spark.sources import load_table
from borsa_spark.streaming.ingest import DedupIngest

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BATCH1 = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "sphinx of black quartz judge my vow"),
]
BATCH2 = [
    (10, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (11, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
    (12, "completely different content about spark partitions"),
    (13, "completely different content about spark partitions"),  # intra dup
]


class TestDedupIngestBatches:
    def test_first_batch_admits_all(self, spark, tmp_path):
        ing = DedupIngest(spark, str(tmp_path / "s1"))
        ing.process_batch(_docs(spark, BATCH1), 0)
        log = ing.admission_log()
        assert log == [
            {"batch": 0, "received": 3, "admitted": 3, "rejected": 0,
             "rejected_quality": 0, "hot_buckets": 0}
        ]
        assert ing.corpus_arrays().count() == 3

    def test_second_batch_screens_exact_near_and_intra(self, spark, tmp_path):
        ing = DedupIngest(spark, str(tmp_path / "s2"))
        ing.process_batch(_docs(spark, BATCH1), 0)
        ing.process_batch(_docs(spark, BATCH2), 1)
        log = ing.admission_log()[1]
        # 10 exact-dup, 11 near-dup, 13 intra-batch dup -> only 12 admitted
        assert log == {"batch": 1, "received": 4, "admitted": 1,
                       "rejected": 3, "rejected_quality": 0,
                       "hot_buckets": 0}
        ids = {r.id for r in ing.corpus_arrays().collect()}
        assert ids == {1, 2, 3, 12}

    def test_combined_batch_plus_corpus_bucket_cap(self, spark, tmp_path):
        """Round-10: the text gate's hot-bucket cap counts STORED corpus
        occupancy too (the image ingest's fix applied here). Repeating
        a 4-word phrase k times yields IDENTICAL shingle sets (hence
        identical signatures and band buckets) with DISTINCT md5 for
        every k — the text analog of distinct-color flat images: the
        exact screen admits them, and only the combined cap keeps the
        stored bucket from driving future joins."""

        def boiler(k):
            return ("x y z w " * k).strip()

        ing = DedupIngest(spark, str(tmp_path / "scap"),
                          max_bucket_size=5)
        b0 = [(i, boiler(2 + i)) for i in range(8)]  # cohort > cap alone
        b0.append((100, BATCH1[0][1]))               # one normal doc
        ing.process_batch(_docs(spark, b0), 0)
        assert ing.admission_log()[0] == {
            "batch": 0, "received": 9, "admitted": 9, "rejected": 0,
            "rejected_quality": 0, "hot_buckets": 12,
        }
        # batch 1: 3 MORE boiler variants (batch-side 3 <= cap, but
        # combined with the 8 stored it is 11 > 5 -> excluded with
        # accounting); a genuine near-dup of the normal doc still
        # screens through its un-hot buckets and is rejected
        b1 = [(20 + i, boiler(10 + i)) for i in range(3)]
        b1.append((101, BATCH2[1][1]))  # near dup of doc 100's text
        ing.process_batch(_docs(spark, b1), 1)
        assert ing.admission_log()[1] == {
            "batch": 1, "received": 4, "admitted": 3, "rejected": 1,
            "rejected_quality": 0, "hot_buckets": 12,
        }
        ids = {r.id for r in ing.corpus_arrays().collect()}
        assert ids == set(range(8)) | {100} | {20, 21, 22}
        # the accounting survives compaction: hot_buckets sums like the
        # other admission totals (never a silent cap, even folded)
        from borsa_spark.streaming.ingest import compact_state

        compact_state(ing)
        log = ing.admission_log()
        assert len(log) == 1
        assert log[0]["hot_buckets"] == 24

    def test_colliding_stored_keys_cannot_merge_buckets(
        self, spark, tmp_path, monkeypatch
    ):
        """Round-12 (r11 verdict "What's wrong" #2): cap occupancy is
        counted by BOTH stored band hashes, so a primary-key collision
        can no longer merge two sub-cap buckets past the cap and
        EXCLUDE true candidate pairs — the forbidden direction.
        Constructed collision: force band_key to a constant for every
        row (the worst case — all stored buckets share the primary
        key) while band_key2 keeps the real per-tuple value. Single-key
        counting sees one giant hot bucket and screens NOTHING; double-
        key counting must keep every true bucket sub-cap and still
        reject the near-dup."""
        from borsa_spark.functions import dedup as dd

        real = dd.lsh_band_keys

        def forced_collision(sig, with_values=False, with_key2=False):
            out = real(sig, with_values=with_values, with_key2=with_key2)
            return out.withColumn("band_key", F.lit(0).cast("long"))

        monkeypatch.setattr(dd, "lsh_band_keys", forced_collision)
        ing = DedupIngest(spark, str(tmp_path / "scol"),
                          max_bucket_size=4)
        b0 = BATCH1 + [
            (4, "alpha beta gamma delta epsilon zeta eta"),
            (5, "one two three four five six seven eight"),
            (6, "norse myths feature ravens wolves and ships"),
        ]
        ing.process_batch(_docs(spark, b0), 0)
        # 6 distinct docs, every band row key-colliding: by single-key
        # counting each band bucket holds 6 > 4 (hot); by (key, key2)
        # every TRUE bucket holds 1 — nothing may go hot
        assert ing.admission_log()[0]["hot_buckets"] == 0
        ing.process_batch(_docs(spark, [(11, BATCH2[1][1])]), 1)
        log = ing.admission_log()[1]
        # the near-dup of stored doc 1 MUST still be caught: its true
        # bucket is (1 batch + 1 corpus) = 2 <= 4 — a merged-count cap
        # would have excluded the bucket and admitted the duplicate
        assert log == {"batch": 1, "received": 1, "admitted": 0,
                       "rejected": 1, "rejected_quality": 0,
                       "hot_buckets": 0}
        assert {r.id for r in ing.corpus_arrays().collect()} == {
            1, 2, 3, 4, 5, 6
        }

    def test_replayed_batch_is_noop(self, spark, tmp_path):
        ing = DedupIngest(spark, str(tmp_path / "s3"))
        ing.process_batch(_docs(spark, BATCH1), 0)
        before = ing.corpus_arrays().count()
        ing.process_batch(_docs(spark, BATCH1), 0)  # foreachBatch replay
        assert ing.corpus_arrays().count() == before
        assert len(ing.admission_log()) == 1

    def test_matches_f35_pair_semantics(self, spark, tmp_path):
        # Ingesting the odd docs against a corpus pre-seeded with the even
        # docs must reject exactly the docs f35's cross-set pair relation
        # flags (plus exact/intra dups, of which this corpus has none).
        from borsa_spark.functions import dedup as dd

        docs = load_table(spark, SF, "documents").limit(200)
        ing = DedupIngest(spark, str(tmp_path / "s4"))
        ing.process_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
        ing.process_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)
        rejected_near = (
            dd.minhash_pairs_against_inrow(
                docs, F.col("id") % 2 == 0, threshold=0.5
            )
            .select("id_a")
            .distinct()
        )
        want_rejected = {r.id_a for r in rejected_near.collect()}
        odd_ids = {
            r.doc_id
            for r in docs.filter(F.col("doc_id") % 2 == 1).collect()
        }
        got_ids = {r.id for r in ing.corpus_arrays().collect()}
        got_admitted_odd = got_ids & odd_ids
        # no exact dups between odd docs in this fixture slice
        assert got_admitted_odd == odd_ids - want_rejected


class TestDedupIngestStream:
    def test_foreachbatch_drive(self, spark, tmp_path):
        # Two parquet files arriving one per trigger -> two micro-batches.
        src = tmp_path / "incoming"
        src.mkdir()
        _docs(spark, BATCH1).coalesce(1).write.parquet(str(src / "b1"))
        _docs(spark, BATCH2).coalesce(1).write.parquet(str(src / "b2"))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        ing = DedupIngest(spark, str(tmp_path / "state"))
        q = ing.attach(stream, str(tmp_path / "ckpt"))
        deadline = time.time() + 120
        while time.time() < deadline and len(ing.admission_log()) < 2:
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(30)
        log = ing.admission_log()
        assert sum(e["received"] for e in log) == 7
        assert sum(e["admitted"] for e in log) == 4
        assert ing.corpus_arrays().count() == 4


class TestCrashReplay:
    def test_uncommitted_replay_does_not_double_state(self, spark, tmp_path):
        # Crash AFTER state write but BEFORE marker: replay must leave one
        # copy (per-batch overwrite), not two (append would double).
        import os

        ing = DedupIngest(spark, str(tmp_path / "s5"))
        ing.process_batch(_docs(spark, BATCH1), 0)
        marker = str(tmp_path / "s5" / "_batches" / "batch-0.json")
        os.remove(marker)  # simulate crash before commit
        assert ing.corpus_arrays().count() == 0  # uncommitted: invisible
        ing.process_batch(_docs(spark, BATCH1), 0)  # replay
        assert ing.corpus_arrays().count() == 3
        assert len(ing.admission_log()) == 1


class TestCompaction:
    def test_compact_preserves_state_and_log_totals(self, spark, tmp_path):
        from borsa_spark.streaming.ingest import compact_state

        ing = DedupIngest(spark, str(tmp_path / "s6"))
        ing.process_batch(_docs(spark, BATCH1), 0)
        ing.process_batch(_docs(spark, BATCH2), 1)
        before_ids = {r.id for r in ing.corpus_arrays().collect()}
        res = compact_state(ing)
        assert res["compacted"] == 2
        assert {r.id for r in ing.corpus_arrays().collect()} == before_ids
        log = ing.admission_log()
        assert len(log) == 1
        assert log[0]["received"] == 7 and log[0]["admitted"] == 4
        # ingest continues against the compacted state
        ing.process_batch(
            _docs(spark, [(20, "the quick brown fox jumps over the lazy dog")]),
            2,
        )
        assert ing.admission_log()[-1]["admitted"] == 0  # still a known dup

    def test_crash_between_marker_and_cleanup_no_double_count(
        self, spark, tmp_path
    ):
        # Simulate: compaction marker written, old markers NOT yet deleted.
        import json as _json

        from borsa_spark.streaming.ingest import compact_state

        ing = DedupIngest(spark, str(tmp_path / "s7"))
        ing.process_batch(_docs(spark, BATCH1), 0)
        ing.process_batch(_docs(spark, BATCH2), 1)
        # snapshot old markers, compact, then restore them (the "crash")
        bdir = tmp_path / "s7" / "_batches"
        old = {p.name: p.read_text() for p in bdir.glob("batch-*.json")}
        compact_state(ing)
        for name, content in old.items():
            (bdir / name).write_text(content)
        # also restore old data dirs? they were removed; superseded markers
        # must be ignored even when their data is gone.
        log = ing.admission_log()
        assert len(log) == 1 and "compacted_from" in log[0]
        assert ing.corpus_arrays().count() == 4  # not 8


class TestQualityGate:
    """The optional admission gate rejects before any dedup work: gated
    docs never enter corpus state and are accounted separately."""

    def test_blocklisted_doc_never_reaches_state(self, spark, tmp_path):
        from borsa_spark.streaming.ingest import admission_gate

        ing = DedupIngest(
            spark,
            str(tmp_path / "q"),
            quality_gate=admission_gate(
                blocklist=("casino",), max_block_density=0.0, min_tokens=4
            ),
        )
        batch = BATCH1 + [
            (4, "casino casino casino jackpot"),     # blocklisted
            (5, "too short"),                        # under min_tokens
        ]
        ing.process_batch(_docs(spark, batch), 0)
        log = ing.admission_log()
        assert log[0]["received"] == 5
        assert log[0]["rejected_quality"] == 2
        assert log[0]["admitted"] == 3
        ids = {r["id"] for r in ing.corpus_arrays().collect()}
        assert ids == {1, 2, 3}

    def test_gate_composes_with_dedup_screening(self, spark, tmp_path):
        from borsa_spark.streaming.ingest import admission_gate

        ing = DedupIngest(
            spark,
            str(tmp_path / "q2"),
            quality_gate=admission_gate(min_tokens=4),
        )
        ing.process_batch(_docs(spark, BATCH1), 0)
        ing.process_batch(_docs(spark, BATCH2 + [(14, "tiny doc")]), 1)
        log = ing.admission_log()
        # batch 2: 5 received, 1 quality-gated (14), exact dup 10, near
        # dup 11, intra dup 13 -> only 12 admitted
        assert log[1]["received"] == 5
        assert log[1]["rejected_quality"] == 1
        assert log[1]["admitted"] == 1
        ids = {r["id"] for r in ing.corpus_arrays().collect()}
        assert 12 in ids and 14 not in ids and 10 not in ids


class TestStateModeGuard:
    def test_hash_mode_flip_is_refused(self, spark, tmp_path, monkeypatch):
        ing = DedupIngest(spark, str(tmp_path / "m"))
        ing.process_batch(_docs(spark, BATCH1), 0)
        monkeypatch.setenv("BORSA_SPARK_SHINGLE_HASH", "xxhash64")
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="hash modes"):
            ing.process_batch(_docs(spark, BATCH2), 1)

    def test_compaction_id_never_collides_with_stream_ids(self, spark, tmp_path):
        # the compaction marker lives in a string namespace ("c0"), so a
        # later stream batch can use ANY integer id without being
        # silently treated as a replay
        from borsa_spark.streaming.ingest import compact_state

        ing = DedupIngest(spark, str(tmp_path / "c"))
        ing.process_batch(_docs(spark, BATCH1), 0)
        ing.process_batch(_docs(spark, BATCH2), 1)
        res = compact_state(ing)
        assert res["into"] == "c0"
        big_id = 10_000_000  # would have hit the old max+1M reserved range
        ing.process_batch(
            _docs(spark, [(30, "fresh text about adaptive query execution")]),
            big_id,
        )
        assert ing.admission_log()[-1]["batch"] == big_id
        assert ing.admission_log()[-1]["admitted"] == 1

    def test_third_compaction_allocates_fresh_id(self, spark, tmp_path):
        # c-ids must come from max-on-disk, not a count of live strings —
        # a count would reuse "c1" on the third compaction and destroy
        # the live compacted state it collides with
        from borsa_spark.streaming.ingest import compact_state

        ing = DedupIngest(spark, str(tmp_path / "c3x"))
        ing.process_batch(_docs(spark, BATCH1), 0)
        ing.process_batch(_docs(spark, BATCH2), 1)
        assert compact_state(ing)["into"] == "c0"
        ing.process_batch(
            _docs(spark, [(40, "first fresh doc about catalyst rules")]), 2
        )
        assert compact_state(ing)["into"] == "c1"
        ing.process_batch(
            _docs(spark, [(41, "second fresh doc about tungsten codegen")]), 3
        )
        assert compact_state(ing)["into"] == "c2"
        ids = {r.id for r in ing.corpus_arrays().collect()}
        assert ids == {1, 2, 3, 12, 40, 41}


class TestImageDedupIngest:
    """Image admission gate (streaming/ingest.py ImageDedupIngest):
    dHash-vs-stored-bands screening with the text ingest's marker
    protocol — decode once per batch, exact md5 screens first, stored
    corpus never re-decoded."""

    def _png(self, seed, bump=False):
        import numpy as np

        from borsa_spark.functions import multimodal as mm

        px = np.random.default_rng(seed).integers(
            0, 256, size=(8, 9, 1)
        ).astype(np.uint8)
        if bump:
            px[0, 0, 0] = (int(px[0, 0, 0]) + 7) % 256
        return mm.encode_png_pixels(px, filter_type=4)

    def _assets(self, spark, rows):
        return spark.createDataFrame(
            [(i, bytearray(p)) for i, p in rows],
            "asset_id long, payload binary",
        )

    def test_screens_exact_near_and_intra(self, spark, tmp_path):
        from borsa_spark.streaming.ingest import ImageDedupIngest

        ing = ImageDedupIngest(spark, str(tmp_path / "img1"))
        b1 = [(1, self._png(1)), (2, self._png(2)), (3, self._png(3))]
        ing.process_batch(self._assets(spark, b1), 0)
        assert ing.admission_log() == [
            {"batch": 0, "received": 3, "admitted": 3, "rejected": 0,
             "hot_buckets": 0}
        ]
        b2 = [
            (10, self._png(1)),             # exact dup of 1 (same bytes)
            (11, self._png(2, bump=True)),  # near dup of 2 (hamming <= 1)
            (12, self._png(9)),             # fresh
            (13, self._png(9)),             # intra-batch exact dup of 12
        ]
        ing.process_batch(self._assets(spark, b2), 1)
        assert ing.admission_log()[1] == {
            "batch": 1, "received": 4, "admitted": 1, "rejected": 3,
            "hot_buckets": 0,
        }
        assert {r.id for r in ing.corpus_hashes().collect()} == {1, 2, 3, 12}

    def _flat_png(self, color):
        import numpy as np

        from borsa_spark.functions import multimodal as mm

        px = np.full((8, 9, 1), color % 256, dtype=np.uint8)
        return mm.encode_png_pixels(px, filter_type=4)

    def test_combined_batch_plus_corpus_bucket_cap(self, spark, tmp_path):
        """Round-10 ADVICE fix: the hot-bucket cap must count STORED
        corpus occupancy, not just the batch side. Distinct-color flat
        images differ in md5 (exact screen misses them) but all dHash
        to all-zero bands; once a flat cohort is admitted, the corpus
        all-zero bucket must keep future batches' candidate joins
        bounded — combined occupancy over the cap excludes the bucket
        and the marker accounts for it (never a silent cap)."""
        from borsa_spark.streaming.ingest import ImageDedupIngest

        ing = ImageDedupIngest(
            spark, str(tmp_path / "imgcap"), max_bucket_size=10
        )
        # batch 0: 12 distinct-color flats (cohort > cap even alone)
        # plus one normal image — everything admits (corpus empty, the
        # flat bucket is already hot), 4 wide bands accounted
        b0 = [(i, self._flat_png(i * 10)) for i in range(12)]
        b0.append((100, self._png(5)))
        ing.process_batch(self._assets(spark, b0), 0)
        assert ing.admission_log()[0] == {
            "batch": 0, "received": 13, "admitted": 13, "rejected": 0,
            "hot_buckets": 4,
        }
        # batch 1: 5 MORE flat colors — batch-side cohort (5) is under
        # the cap, but combined with the 12 stored it is 17 > 10, so
        # the bucket stays excluded (bounded join work) and the flats
        # admit with accounting; a genuine near-dup of the normal image
        # still screens through its un-hot buckets and is rejected
        b1 = [(20 + i, self._flat_png(150 + i * 7)) for i in range(5)]
        b1.append((101, self._png(5, bump=True)))
        ing.process_batch(self._assets(spark, b1), 1)
        assert ing.admission_log()[1] == {
            "batch": 1, "received": 6, "admitted": 5, "rejected": 1,
            "hot_buckets": 4,
        }
        assert {r.id for r in ing.corpus_hashes().collect()} == (
            set(range(12)) | {100} | set(range(20, 25))
        )

    def test_crash_replay_is_exactly_once(self, spark, tmp_path):
        import os

        from borsa_spark.streaming.ingest import ImageDedupIngest

        ing = ImageDedupIngest(spark, str(tmp_path / "img2"))
        b1 = [(1, self._png(1)), (2, self._png(2))]
        ing.process_batch(self._assets(spark, b1), 0)
        # crash AFTER state write, BEFORE marker: state invisible
        marker = str(tmp_path / "img2" / "_batches" / "batch-0.json")
        os.remove(marker)
        assert ing.corpus_hashes().count() == 0
        ing.process_batch(self._assets(spark, b1), 0)  # replay
        assert ing.corpus_hashes().count() == 2
        assert len(ing.admission_log()) == 1
        # committed replay: short-circuits, no double state
        ing.process_batch(self._assets(spark, b1), 0)
        assert ing.corpus_hashes().count() == 2

    def test_banding_mode_flip_refused(self, spark, tmp_path):
        import pytest

        from borsa_spark.streaming.ingest import ImageDedupIngest

        ing = ImageDedupIngest(spark, str(tmp_path / "img3"),
                               rows_per_band=2, max_hamming=3)
        ing.process_batch(
            self._assets(spark, [(1, self._png(1))]), 0
        )
        with pytest.raises(RuntimeError, match="band join"):
            ImageDedupIngest(spark, str(tmp_path / "img3"),
                             rows_per_band=1, max_hamming=3)
        # per-batch guard (not just construction): a live instance must
        # refuse once the state is re-stamped beneath it
        import json as _json
        import os as _os

        mode = str(tmp_path / "img3" / "_mode.json")
        stamped = _json.load(open(mode))
        stamped["rows_per_band"] = 4
        with open(mode, "w") as f:
            _json.dump(stamped, f)
        with pytest.raises(RuntimeError, match="band join"):
            ing.process_batch(
                self._assets(spark, [(2, self._png(2))]), 1
            )

    def test_pigeonhole_bound_enforced(self, spark, tmp_path):
        import pytest

        from borsa_spark.streaming.ingest import ImageDedupIngest

        with pytest.raises(ValueError, match="max_hamming"):
            ImageDedupIngest(spark, str(tmp_path / "img4"),
                             rows_per_band=2, max_hamming=4)

    def test_foreachbatch_drive(self, spark, tmp_path):
        # live Structured Streaming drive over a file stream — the
        # production attach() path, availableNow drain
        from borsa_spark.streaming.ingest import ImageDedupIngest

        src = str(tmp_path / "imgsrc")
        self._assets(
            spark, [(1, self._png(1)), (2, self._png(1))]  # 1 exact dup
        ).write.parquet(src)
        schema = spark.read.parquet(src).schema
        ing = ImageDedupIngest(spark, str(tmp_path / "img5"))
        q = ing.attach(
            spark.readStream.schema(schema).parquet(src),
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.processAllAvailable()
        q.stop()
        log = ing.admission_log()
        assert sum(e["received"] for e in log) == 2
        assert sum(e["admitted"] for e in log) == 1

    def test_image_compaction_preserves_state_and_totals(
        self, spark, tmp_path
    ):
        from borsa_spark.streaming.ingest import (
            ImageDedupIngest,
            compact_image_state,
        )

        ing = ImageDedupIngest(spark, str(tmp_path / "img6"))
        ing.process_batch(
            self._assets(spark, [(1, self._png(1)), (2, self._png(2))]), 0
        )
        ing.process_batch(
            self._assets(spark, [(3, self._png(3)),
                                 (4, self._png(1))]), 1  # exact dup
        )
        before_h = sorted(map(tuple, ing.corpus_hashes().collect()))
        before_b = sorted(map(tuple, ing.corpus_bands().collect()))
        out = compact_image_state(ing)
        assert out["compacted"] == 2
        assert sorted(map(tuple, ing.corpus_hashes().collect())) == before_h
        assert sorted(map(tuple, ing.corpus_bands().collect())) == before_b
        log = ing.admission_log()
        assert len(log) == 1
        assert log[0]["received"] == 4 and log[0]["admitted"] == 3
        # screening still works against compacted state
        ing.process_batch(
            self._assets(spark, [(10, self._png(2)),   # exact dup of 2
                                 (11, self._png(20))]), 2
        )
        assert ing.admission_log()[-1]["admitted"] == 1

    def test_audio_stream_through_the_same_gate(self, spark, tmp_path):
        # the hasher parameter: audio_dhash slots into the identical
        # admission gate; the hash kind is part of the state identity
        import numpy as np
        import pytest

        from borsa_spark.functions import multimodal as mm
        from borsa_spark.streaming.ingest import ImageDedupIngest

        def wav(seed, bump=False):
            amps = (np.random.default_rng(seed)
                    .integers(0, 256, 72).astype(np.int64))
            if bump:
                amps[0] = (int(amps[0]) + 7) % 256
            sign = np.where(np.arange(1800) % 2 == 0, 1.0, -1.0)
            return mm.encode_wav(sign * (np.repeat(amps, 25) / 256.0),
                                 8000)

        ing = ImageDedupIngest(
            spark, str(tmp_path / "aud1"),
            hasher=mm.audio_dhash, kind="audio_dhash",
        )
        ing.process_batch(
            self._assets(spark, [(1, wav(1)), (2, wav(2))]), 0
        )
        ing.process_batch(
            self._assets(spark, [
                (10, wav(1)),             # exact dup (same bytes)
                (11, wav(2, bump=True)),  # near dup (hamming <= 1)
                (12, wav(9)),             # fresh
            ]), 1,
        )
        assert ing.admission_log()[1] == {
            "batch": 1, "received": 3, "admitted": 1, "rejected": 2,
            "hot_buckets": 0,
        }
        # image-kind state refuses an audio-kind instance and vice versa
        with pytest.raises(RuntimeError, match="band join"):
            ImageDedupIngest(spark, str(tmp_path / "aud1"))
