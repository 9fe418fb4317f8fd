"""Materialized corpus-prep checkpoint: compute the expensive shared
relations of the dedup family ONCE, commit each to parquet, and serve
every downstream consumer — including later incremental batches — from
the stored copy.

Why this exists: the gate queries (f7/f17/f24/f33/f36/f51) are
deliberately self-contained — each rebuilds shingle arrays, signatures,
and verified pairs from the raw documents so the driver can hash it in
isolation. A real 100 TB curation run cannot afford that: the shingle
fold alone is a full-corpus scan, and at least four pipeline stages
(pair generation, clustering, survivor selection, split assignment)
consume the SAME intermediate relations. This module is the production
composition root (the Spark-native phase-checkpoint pattern:
stable-storage parquet between phases, not executor-memory
``.persist()`` whose lifetime dies with the session).

Layout: each stage directory holds committed PART directories —
``<workdir>/<stage>/b000``, ``b001``, … — each with a ``_DONE.json``
marker written LAST (the streaming-ingest discipline from
`streaming/ingest.py`): a crash mid-write leaves a marker-less part
that readers never see and the next build/extend redoes. Markers record
the build parameters (shingle n, threshold, bucket cap, AND the active
shingle-hash mode) — a cached artifact built under
``BORSA_SPARK_SHINGLE_HASH=xxhash64`` refuses to serve an md5-mode
consumer instead of silently mixing hash domains.

Stage semantics:

    shingle_arrays  additive   (id, shingles array<long>)  scan-speed fold
    signatures      additive   (id, h0..h59)               in-row from arrays
    pairs           additive   (id_a < id_b, jaccard)      banded LSH + verify
    clusters        snapshot   (id, comp)                  star contraction

Additive stages are read as the union of all committed parts; the
clusters stage is a SNAPSHOT (connected components are global — new
edges can merge old components) whose marker records how many pair
parts it folded, so a clusters snapshot that predates the latest
``extend()`` reads as stale instead of silently serving old components.

``extend(new_docs)`` is the batch analog of the streaming DedupIngest:
the new batch pays its own shingle/signature cost, cross-set candidates
join NEW band keys against STORED band keys (the corpus side is never
re-shingled), intra-batch pairs come from the standard banded self-join
over the new signatures only, and clusters are refolded from the stored
pair parts. With no bucket cap, ``build(A); extend(B)`` is pair- and
cluster-identical to ``build(A ∪ B)`` (tested). With a
``max_bucket_size`` cap the incremental path is a SUPERSET: new
candidates apply the cap at union occupancy exactly like a full build,
but pairs already committed from a bucket that was under the cap at
build time are kept even though a from-scratch build over the union
would skip that (now-oversized) bucket — the cap is a COST guard on
candidate generation, never a semantic filter, and verified-true pairs
are not retracted (tested: incremental ⊇ full, extras all intra-A).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from borsa_spark.functions import dedup as _dd
from borsa_spark.functions import text as _tx

_MARKER = "_DONE.json"

STAGES = ("shingle_arrays", "signatures", "pairs", "clusters")
_ADDITIVE = ("shingle_arrays", "signatures", "pairs")


@dataclass(frozen=True)
class PrepParams:
    """Build parameters stamped into every part marker.

    ``max_bucket_size`` defaults to the crawl-safe cap (round-10 flip,
    matching `dedup.minhash_candidates`); pass ``None`` explicitly for
    the unguarded exhaustive band join. The cap is part of the artifact
    fingerprint, so a corpus built under one cap refuses extension
    under another."""

    n: int = 3
    threshold: float = 0.5
    max_bucket_size: int | None = _dd.CRAWL_MAX_BUCKET

    def fingerprint(self) -> dict:
        d = asdict(self)
        # the hash mode changes every shingle value: part of the identity
        d["shingle_hash"] = os.environ.get("BORSA_SPARK_SHINGLE_HASH", "md5")
        return d


class CorpusArtifacts:
    """Filesystem-backed corpus-prep checkpoint rooted at ``workdir``.

    ``build(docs)`` materializes the base part of every stage;
    ``extend(new_docs)`` admits an incremental batch against the stored
    relations; accessors read committed parquet. At cluster scale
    ``workdir`` is an object-store prefix and each part is the hand-off
    point between pipeline phases (retryable independently,
    inspectable, shareable across jobs — none of which an in-session
    ``.persist()`` gives you).
    """

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        params: PrepParams | None = None,
    ):
        self.spark = spark
        self.workdir = workdir
        self.params = params or PrepParams()

    # -- part bookkeeping ---------------------------------------------------

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def _part_dirs(self, stage: str) -> list[str]:
        root = self._stage_dir(stage)
        if not os.path.isdir(root):
            return []
        return sorted(
            os.path.join(root, d)
            for d in os.listdir(root)
            if d.startswith("b")
        )

    def _part_marker(self, part_dir: str) -> dict | None:
        try:
            with open(os.path.join(part_dir, _MARKER)) as f:
                marker = json.load(f)
        except (OSError, ValueError):
            return None
        if marker.get("params") != self.params.fingerprint():
            return None
        return marker

    def _marker_committed_parts(self, stage: str) -> list[str]:
        return [p for p in self._part_dirs(stage) if self._part_marker(p)]

    def _committed_parts(self, stage: str) -> list[str]:
        """VISIBLE parts. The base part ``b000`` stands on its own marker
        (build's stages resume independently — each derives from its
        committed predecessor). Extension parts ``b001+`` are one
        TRANSACTION across the three additive stages: batch ``bNNN`` is
        visible only when all three stages committed it, so a crash
        between extend()'s per-stage commits leaves the whole batch
        invisible everywhere instead of a torn corpus (arrays including
        batch B while pairs/clusters silently predate it)."""
        mine = self._marker_committed_parts(stage)
        if stage not in _ADDITIVE:
            return mine
        # one committed-name set per stage (3 listdir+marker sweeps total,
        # not O(stages x parts^2) re-scans): a batch is visible iff its
        # name is committed in ALL THREE additive stages
        all_done = set.intersection(
            *(
                {
                    os.path.basename(q)
                    for q in self._marker_committed_parts(s)
                }
                for s in _ADDITIVE
            )
        )
        return [
            p
            for p in mine
            if os.path.basename(p) == "b000"
            or os.path.basename(p) in all_done
        ]

    def committed(self, stage: str) -> bool:
        """True iff the stage has >= 1 visible part under these params,
        and — for the clusters snapshot — it folds the current pair
        parts (an extend() that crashed before refolding reads stale)."""
        parts = self._committed_parts(stage)
        if not parts:
            return False
        if stage == "clusters":
            marker = self._part_marker(parts[-1])
            return marker.get("pair_parts") == len(
                self._committed_parts("pairs")
            )
        return True

    def _next_part(self, stage: str) -> str:
        # index from VISIBLE parts, not raw directories: a crash-stray
        # part dir (written but never fully committed across stages) is
        # overwritten by the retried batch rather than skipped forever
        n = len(self._committed_parts(stage))
        return os.path.join(self._stage_dir(stage), f"b{n:03d}")

    def _commit_part(self, stage: str, df: DataFrame, **extra) -> str:
        path = self._next_part(stage)
        df.write.mode("overwrite").parquet(path)
        rows = self.spark.read.parquet(path).count()
        marker = {"params": self.params.fingerprint(), "rows": rows, **extra}
        # marker LAST: readers treat a marker-less part as absent
        tmp = os.path.join(path, _MARKER + ".tmp")
        with open(tmp, "w") as f:
            json.dump(marker, f)
        os.replace(tmp, os.path.join(path, _MARKER))
        return path

    def _read(self, stage: str) -> DataFrame:
        if not self.committed(stage):
            raise RuntimeError(
                f"corpus artifact {stage!r} at {self._stage_dir(stage)} is"
                f" absent, crash-partial, stale, or built with different"
                f" params ({self.params.fingerprint()}); run build()/"
                f"extend() first."
            )
        parts = self._committed_parts(stage)
        if stage not in _ADDITIVE:  # snapshot: latest committed part wins
            return self.spark.read.parquet(parts[-1])
        out = self.spark.read.parquet(parts[0])
        for p in parts[1:]:
            out = out.unionByName(self.spark.read.parquet(p))
        return out

    # -- build --------------------------------------------------------------

    def build(self, docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> dict:
        """Materialize every missing stage from ``docs``; returns
        {stage: "built" | "cached"}. Stages read committed predecessors
        from parquet, so a crash resumes from the last marker."""
        p = self.params
        report: dict[str, str] = {}

        if not self.committed("shingle_arrays"):
            arr = _dd.shingle_array(docs, p.n, text_col, id_col)
            self._commit_part("shingle_arrays", arr)
            report["shingle_arrays"] = "built"
        else:
            report["shingle_arrays"] = "cached"

        if not self.committed("signatures"):
            arr = self._read("shingle_arrays")
            self._commit_part("signatures", _dd.signature_from_array(arr))
            report["signatures"] = "built"
        else:
            report["signatures"] = "cached"

        if not self.committed("pairs"):
            sig = self._read("signatures")
            cands = _dd.minhash_candidates(
                sig, max_bucket_size=p.max_bucket_size
            )
            arr = self._read("shingle_arrays").filter(
                F.size("shingles") > 0
            )
            self._commit_part(
                "pairs", _dd.verify_jaccard_inrow(cands, arr, p.threshold)
            )
            report["pairs"] = "built"
        else:
            report["pairs"] = "cached"

        if not self.committed("clusters"):
            self._refold_clusters()
            report["clusters"] = "built"
        else:
            report["clusters"] = "cached"

        return report

    def _refold_clusters(self) -> None:
        pairs = self._read("pairs")
        nodes = self._read("shingle_arrays").select("id")
        self._commit_part(
            "clusters",
            _dd.dup_clusters(pairs.select("id_a", "id_b"), nodes),
            pair_parts=len(self._committed_parts("pairs")),
        )

    # -- incremental admission ----------------------------------------------

    def extend(self, new_docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> dict:
        """Admit an incremental batch against the stored corpus: the new
        batch pays its own shingle/signature cost; the corpus side is
        served from parquet (never re-shingled). Appends array/signature/
        pair parts, then refolds the clusters snapshot. Crash-safe at
        part granularity AND idempotent per id: already-admitted ids are
        anti-joined out up front, so a rerun after ANY crash window —
        including the one where all three additive parts committed but
        the clusters refold didn't — admits only genuinely new docs
        (no duplicate array/signature rows, no self-pairs) and just heals
        the stale clusters snapshot if that is all that's missing."""
        p = self.params
        stored_ids = self._read("shingle_arrays").select(
            F.col("id").alias(id_col)
        )
        # Idempotence must hold WITHIN the batch too: a duplicated id in
        # one batch would otherwise produce duplicate array/signature
        # rows and jaccard-1.0 self-pairs downstream.
        new_docs = new_docs.dropDuplicates([id_col]).join(
            stored_ids, id_col, "left_anti"
        )
        if not new_docs.take(1):
            # every id is already admitted (e.g. a retried extend() after
            # a crash between the pairs commit and the clusters refold):
            # the only thing possibly missing is the snapshot
            if not self.committed("clusters"):
                self._refold_clusters()
                clusters = "refolded"
            else:
                clusters = "cached"
            return {
                "batch_parts": len(self._committed_parts("pairs")) - 1,
                "new_pairs": "already_admitted",
                "clusters": clusters,
            }
        new_arr = _dd.shingle_array(new_docs, p.n, text_col, id_col)
        new_sig = _dd.signature_from_array(new_arr)

        # cross-set candidates: NEW band keys vs STORED band keys; the
        # bucket cap applies to union-bucket occupancy like a full build,
        # counted by the EXACT band tuple (both sides re-derive from
        # signatures, so the collision-can-only-ADD invariant holds here
        # exactly as in minhash_candidates — round-10 review)
        old_sig = self._read("signatures")
        capped = p.max_bucket_size is not None
        new_bk = _dd.lsh_band_keys(new_sig, with_values=capped)
        old_bk = _dd.lsh_band_keys(old_sig, with_values=capped)
        if capped:
            union_counts = (
                new_bk.select("band", "band_vals")
                .unionByName(old_bk.select("band", "band_vals"))
                .groupBy("band", "band_vals")
                .agg(F.count("*").alias("__n"))
                .filter(F.col("__n") <= p.max_bucket_size)
                .select("band", "band_vals")
            )
            new_bk = new_bk.join(
                union_counts, ["band", "band_vals"], "left_semi"
            ).drop("band_vals")
            old_bk = old_bk.join(
                union_counts, ["band", "band_vals"], "left_semi"
            ).drop("band_vals")
        cross = (
            new_bk.select(F.col("id").alias("new_id"), "band", "band_key")
            .join(
                old_bk.select(F.col("id").alias("old_id"), "band", "band_key"),
                ["band", "band_key"],
            )
            .select("new_id", "old_id")
            .distinct()
        )
        # intra-batch candidates: banded self-join over the NEW band keys —
        # reusing new_bk keeps the bucket cap at union occupancy, exactly
        # what a from-scratch build over the full corpus would apply
        a_bk = new_bk.select(F.col("id").alias("id_a"), "band", "band_key")
        b_bk = new_bk.select(F.col("id").alias("id_b"), "band", "band_key")
        intra = (
            a_bk.join(b_bk, ["band", "band_key"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        # canonical (least, greatest) ordering matches the full build
        cands = (
            cross.select(
                F.least("new_id", "old_id").alias("id_a"),
                F.greatest("new_id", "old_id").alias("id_b"),
            )
            .unionByName(intra.select("id_a", "id_b"))
            .distinct()
        )
        arr_all = (
            self._read("shingle_arrays")
            .unionByName(new_arr)
            .filter(F.size("shingles") > 0)
        )
        new_pairs = _dd.verify_jaccard_inrow(cands, arr_all, p.threshold)

        # commit order: arrays -> signatures -> pairs -> refold clusters.
        # A crash between any two leaves the clusters marker's pair_parts
        # count behind, so committed("clusters") reads stale and the next
        # build()/extend() refolds.
        self._commit_part("shingle_arrays", new_arr)
        self._commit_part("signatures", new_sig)
        self._commit_part("pairs", new_pairs)
        self._refold_clusters()
        return {
            "batch_parts": len(self._committed_parts("pairs")) - 1,
            "new_pairs": "built",
            "clusters": "refolded",
        }

    # -- accessors ----------------------------------------------------------

    def shingle_arrays(self) -> DataFrame:
        return self._read("shingle_arrays")

    def signatures(self) -> DataFrame:
        return self._read("signatures")

    def pairs(self) -> DataFrame:
        return self._read("pairs")

    def clusters(self) -> DataFrame:
        return self._read("clusters")

    # -- downstream stages (parquet-scan cost, never corpus-scan cost) ------

    def survivors(self, docs: DataFrame) -> DataFrame:
        """Dedup survivor selection from the stored clusters (f33's rule:
        keep the longest doc per component, doc_id tie-break)."""
        from pyspark.sql import Window

        labeled = self.clusters().select(
            F.col("id").alias("doc_id"), F.col("comp").alias("component")
        )
        joined = labeled.join(docs.select("doc_id", "n_chars"), "doc_id")
        w = Window.partitionBy("component").orderBy(
            F.col("n_chars").desc(), F.col("doc_id").asc()
        )
        wc = Window.partitionBy("component")
        return (
            joined.withColumn("rk", F.row_number().over(w))
            .withColumn("n_members", F.count("*").over(wc))
            .filter(F.col("rk") == 1)
            .select(
                "component",
                F.col("doc_id").alias("kept_doc_id"),
                F.col("n_chars").alias("kept_n_chars"),
                F.col("n_members").cast("long").alias("n_members"),
                (F.col("n_members") - 1).cast("long").alias("n_dropped"),
            )
        )

    def split_assign(self) -> DataFrame:
        """Leakage-safe split from the stored clusters (f36's rule: hash
        the CLUSTER id so near-dup groups never straddle train/test)."""
        return self.clusters().select(
            F.col("id").alias("doc_id"),
            F.col("comp").alias("component"),
            _tx.split_assign(F.col("comp")).alias("split"),
        )
