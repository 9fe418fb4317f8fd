"""Persisted IVF vector index: train once, probe cheaply, survive the
session.

The gate query `f15_ivf_topk` retrains k-means and reassigns the corpus
on every call — correct for a hash-checkable oracle, wrong for serving:
at 100 TB the assignment pass is a full-corpus broadcast-argmin scan
you want to pay once. `VectorIndex` is the production shape:

- **build(emb)**: train coarse centroids (`kmeans_centroids`, the same
  6dp-snapped Lloyd recurrence the f20/f52 oracles pin), assign every
  vector (rounded broadcast-argmin, see `_assign` — the corpus never
  shuffles), pre-fold each vector's L2 norm, and commit both relations
  with the marker-last discipline (`functions/pipeline.py` analog).
  The inverted lists are written ``partitionBy("centroid_id")``, so a
  probe becomes a PARTITION-PRUNED scan: a query that probes 2 of 64
  lists reads 2/64ths of the index files, enforced by the parquet
  layout rather than hoped for from a join.
- **search(queries)**: broadcast the (tiny) centroid table, rank each
  query's ``n_probe`` nearest lists, collect the probed centroid ids
  (bounded by k — driver-side by design, it IS the partition filter),
  scan only those lists, brute-force cosine within them, rank top-k.
  Output contract matches `ivf_topk` exactly (tested equal).

The index directory is shareable across sessions and jobs. Corpus
growth is handled incrementally: **add(new_emb)** assigns the new batch
against the FROZEN stored centroids and commits it as a new part
(marker-last, append-only ids) — the standard IVF serving pattern where
the coarse quantizer outlives many ingest batches; retrain with
`build(..., overwrite=True)` when drift warrants.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from borsa_spark.functions import similarity as _sim

_MARKER = "_DONE.json"


class VectorIndex:
    """Filesystem-backed IVF index rooted at ``workdir``."""

    def __init__(self, spark: SparkSession, workdir: str, k: int = 8,
                 iters: int = 2):
        self.spark = spark
        self.workdir = workdir
        self.k = k
        self.iters = iters

    # -- bookkeeping --------------------------------------------------------

    def _params(self) -> dict:
        return {"k": self.k, "iters": self.iters}

    def _marker_path(self) -> str:
        return os.path.join(self.workdir, _MARKER)

    def _marker(self) -> dict | None:
        try:
            with open(self._marker_path()) as f:
                marker = json.load(f)
        except (OSError, ValueError):
            return None
        if marker.get("params") != self._params():
            return None
        if "parts" not in marker:
            # a pre-parts-format marker validates params but its lists
            # live at a different layout; serving it would KeyError (or
            # silently see no data) — read it as absent so callers get
            # the loud "run build() first" instead
            return None
        return marker

    def committed(self) -> bool:
        return self._marker() is not None

    def _write_marker(self, parts: list[str], stats: dict) -> None:
        # marker LAST, atomically: a part directory without its entry in
        # the marker's parts list is invisible to every reader
        marker = {"params": self._params(), "parts": parts, "stats": stats}
        tmp = self._marker_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(marker, f)
        os.replace(tmp, self._marker_path())

    def _assign(self, emb: DataFrame, cents: DataFrame,
                id_col: str, emb_col: str) -> DataFrame:
        # ROUNDED argmin (4dp, cid tie-break) — the kmeans_assign/oracle
        # convention. The unrounded `ivf_assign` ranks identically except
        # when two centroids sit within 1e-4 of each other, where engines'
        # float summation order could pick different lists and break the
        # c4 hash; the snap removes that divergence class entirely.
        from pyspark.sql import Window

        e = emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(emb_col).alias("embedding"),
            F.transform(F.col(emb_col), lambda x: x.cast("double")).alias("__v"),
        )
        dist = F.round(_sim.sq_l2(F.col("__v"), F.col("cemb")), 4)
        w = Window.partitionBy("vec_id").orderBy(
            dist.asc(), F.col("cid").asc()
        )
        return (
            e.crossJoin(F.broadcast(cents))
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1)
            .select(
                "vec_id",
                "embedding",
                _sim.norm2(F.col("__v")).alias("__norm"),
                F.col("cid").alias("centroid_id"),
            )
        )

    # -- build / incremental add --------------------------------------------

    def build(self, emb: DataFrame, id_col: str = "vec_id",
              emb_col: str = "embedding", overwrite: bool = False) -> dict:
        """Train + assign + commit the base part. Returns
        {n_vectors, n_centroids}."""
        marker = self._marker()
        if marker is not None and not overwrite:
            return marker["stats"]
        if marker is not None:
            # overwrite: retract the marker FIRST so a crash mid-rebuild
            # leaves an uncommitted index (readers error loudly) instead
            # of the old marker validating new centroids over old lists
            os.remove(self._marker_path())
        cents = _sim.kmeans_centroids(emb, k=self.k, iters=self.iters,
                                      id_col=id_col, emb_col=emb_col)
        cents.write.mode("overwrite").parquet(
            os.path.join(self.workdir, "centroids")
        )
        cents = self.spark.read.parquet(
            os.path.join(self.workdir, "centroids")
        )
        part = os.path.join(self.workdir, "lists", "b000")
        (
            self._assign(emb, cents, id_col, emb_col)
            .write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(part)
        )
        stats = {
            "n_vectors": self.spark.read.parquet(part).count(),
            "n_centroids": cents.count(),
        }
        self._write_marker(["b000"], stats)
        return stats

    def add(self, new_emb: DataFrame, id_col: str = "vec_id",
            emb_col: str = "embedding") -> dict:
        """Incrementally index a new vector batch: assign against the
        STORED centroids (no retrain — the coarse quantizer is frozen, the
        standard IVF serving pattern; retrain by `build(..., overwrite=
        True)` when drift warrants) and commit as a new part. The marker's
        parts list is rewritten LAST, so a crash mid-write leaves an
        invisible part directory that the retried add simply overwrites.
        New ids must be disjoint from indexed ids (append-only contract).
        """
        marker = self._marker()
        if marker is None:
            raise RuntimeError(
                f"vector index at {self.workdir} has no committed base;"
                " run build() first."
            )
        parts = marker["parts"]
        name = f"b{len(parts):03d}"
        part = os.path.join(self.workdir, "lists", name)
        cents = self.centroids()
        (
            self._assign(new_emb, cents, id_col, emb_col)
            .write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(part)
        )
        n_new = self.spark.read.parquet(part).count()
        stats = dict(marker["stats"])
        stats["n_vectors"] += n_new
        self._write_marker(parts + [name], stats)
        return {"part": name, "n_added": n_new, **stats}

    # -- accessors ----------------------------------------------------------

    def _require(self) -> dict:
        marker = self._marker()
        if marker is None:
            raise RuntimeError(
                f"vector index at {self.workdir} is absent, crash-partial,"
                f" or built with different params ({self._params()});"
                f" run build() first."
            )
        return marker

    def centroids(self) -> DataFrame:
        self._require()
        return self.spark.read.parquet(
            os.path.join(self.workdir, "centroids")
        )

    def lists(self) -> DataFrame:
        """Union of the committed parts. Each part is read as its own
        partitioned relation, so a centroid_id filter prunes directories
        within EVERY part (pruning verified in tests across parts)."""
        marker = self._require()
        out = None
        for name in marker["parts"]:
            df = self.spark.read.parquet(
                os.path.join(self.workdir, "lists", name)
            )
            out = df if out is None else out.unionByName(df)
        return out

    # -- search -------------------------------------------------------------

    def probe_plan(self, queries: DataFrame, n_probe: int = 2,
                   q_id: str = "q_id", q_emb: str = "q_emb") -> DataFrame:
        """(q_id, q_emb, centroid_id) — each query's n_probe nearest
        lists, ranked by snapped squared-L2 against the broadcast
        centroid table (4dp-snapped distance + cid tie-break — the
        kmeans_assign/oracle convention, see _assign)."""
        cents = self.centroids()
        w = Window.partitionBy(q_id).orderBy(
            F.round(_sim.sq_l2(F.col(q_emb), F.col("cemb")), 4).asc(),
            F.col("cid").asc(),
        )
        return (
            queries.crossJoin(F.broadcast(cents))
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= n_probe)
            .select(q_id, q_emb, F.col("cid").alias("centroid_id"))
        )

    def search(self, queries: DataFrame, k: int = 5, n_probe: int = 2,
               q_id: str = "q_id", q_emb: str = "q_emb") -> DataFrame:
        """Top-k cosine neighbors per query over the probed lists only.

        The distinct probed centroid ids (≤ index k — a handful of longs)
        are collected and applied as a STATIC partition filter on the
        lists scan, so the parquet reader opens only the probed
        directories; the per-query routing then joins on centroid_id.
        Same output contract as `similarity.ivf_topk`.
        """
        probed = self.probe_plan(queries, n_probe, q_id, q_emb)
        probed = probed.withColumn("__qn", _sim.norm2(F.col(q_emb)))
        cids = [
            r["centroid_id"]
            for r in probed.select("centroid_id").distinct().collect()
        ]
        lists = self.lists().filter(F.col("centroid_id").isin(cids))
        sim = F.round(
            _sim.dot(F.col(q_emb), F.col("embedding"))
            / (F.col("__qn") * F.col("__norm")),
            4,
        )
        j = (
            probed.join(lists, "centroid_id")
            .filter(F.col(q_id) != F.col("vec_id"))
            .select(q_id, F.col("vec_id").alias("c_id"),
                    sim.alias("cosine_sim"))
        )
        wr = Window.partitionBy(q_id).orderBy(
            F.col("cosine_sim").desc(), F.col("c_id").asc()
        )
        return (
            j.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= k)
            .select(q_id, "c_id", "cosine_sim", "rank")
        )
