"""Materialized corpus-prep checkpoint: compute the expensive shared
relations of the dedup family ONCE, commit each to parquet, and serve
every downstream consumer from the stored copy.

Why this exists: the gate queries (f7/f17/f24/f33/f36/f51) are
deliberately self-contained — each rebuilds shingle arrays, signatures,
and verified pairs from the raw documents so the driver can hash it in
isolation. A real 100 TB curation run cannot afford that: the shingle
fold alone is a full-corpus scan, and at least four pipeline stages
(pair generation, clustering, survivor selection, split assignment)
consume the SAME intermediate relations. This module is the production
composition root the reference's pipeline users would reach for
(borsa's batch prep has no direct analog — this is the Spark-native
phase-checkpoint pattern: stable-storage parquet between phases, not
executor-memory ``.persist()`` whose lifetime dies with the session).

Crash-safety follows the repo's streaming-ingest discipline
(`streaming/ingest.py`): every stage writes its parquet directory first
and a `_DONE.json` marker LAST; a crash between the two leaves a
stage directory without a marker, which the next `build()` treats as
absent and rebuilds. Markers record the build parameters (shingle n,
threshold, bucket cap, AND the active shingle-hash mode) — a cached
artifact built under `BORSA_SPARK_SHINGLE_HASH=xxhash64` refuses to
serve an md5-mode consumer instead of silently mixing hash domains.

Stage DAG (each reads only committed predecessors):

    shingle_arrays  (id, shingles array<long>)       scan-speed fold
    signatures      (id, h0..h59)                    in-row from arrays
    pairs           (id_a, id_b, jaccard)            banded LSH + verify
    clusters        (id, comp)                       star contraction

Downstream helpers (`survivors`, `split_assign`) are thin declarative
reads over the stored relations — running them twice costs two parquet
scans, never two corpus scans.
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


@dataclass(frozen=True)
class PrepParams:
    """Build parameters stamped into every stage marker."""

    n: int = 3
    threshold: float = 0.5
    max_bucket_size: int | None = None

    def fingerprint(self) -> dict:
        d = asdict(self)
        # the hash mode changes every shingle value: part of the identity
        d["shingle_hash"] = os.environ.get("BORSA_SPARK_SHINGLE_HASH", "md5")
        return d


class CorpusArtifacts:
    """Filesystem-backed corpus-prep checkpoint rooted at ``workdir``.

    ``build(docs)`` materializes any missing/stale stage and returns a
    report of what was built vs served from cache; accessors read the
    committed parquet. At cluster scale ``workdir`` is an object-store
    prefix and each stage directory is the hand-off point between
    pipeline phases (retryable independently, inspectable, shareable
    across jobs — none of which an in-session ``.persist()`` gives you).
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

    # -- stage bookkeeping --------------------------------------------------

    def _dir(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def _marker_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), _MARKER)

    def committed(self, stage: str) -> bool:
        """True iff the stage's marker exists AND matches the params."""
        try:
            with open(self._marker_path(stage)) as f:
                marker = json.load(f)
        except (OSError, ValueError):
            return False
        return marker.get("params") == self.params.fingerprint()

    def _commit(self, stage: str, df: DataFrame) -> int:
        path = self._dir(stage)
        df.write.mode("overwrite").parquet(path)
        rows = self.spark.read.parquet(path).count()
        marker = {"params": self.params.fingerprint(), "rows": rows}
        # marker LAST: readers treat a marker-less directory as absent
        tmp = self._marker_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(marker, f)
        os.replace(tmp, self._marker_path(stage))
        return rows

    def _read(self, stage: str) -> DataFrame:
        if not self.committed(stage):
            raise RuntimeError(
                f"corpus artifact {stage!r} at {self._dir(stage)} is absent,"
                f" crash-partial, or built with different params"
                f" ({self.params.fingerprint()}); run build() first."
            )
        return self.spark.read.parquet(self._dir(stage))

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
            self._commit("shingle_arrays", arr)
            report["shingle_arrays"] = "built"
        else:
            report["shingle_arrays"] = "cached"

        if not self.committed("signatures"):
            arr = self._read("shingle_arrays")
            self._commit("signatures", _dd.signature_from_array(arr))
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
            self._commit(
                "pairs", _dd.verify_jaccard_inrow(cands, arr, p.threshold)
            )
            report["pairs"] = "built"
        else:
            report["pairs"] = "cached"

        if not self.committed("clusters"):
            pairs = self._read("pairs")
            nodes = self._read("shingle_arrays").select("id")
            self._commit("clusters", _dd.dup_clusters(pairs, nodes))
            report["clusters"] = "built"
        else:
            report["clusters"] = "cached"

        return report

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
