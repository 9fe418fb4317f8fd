"""Streaming source-drift monitoring: per-batch KL divergence of the
incoming token distribution against the accumulated corpus distribution —
the continuous form of query f42 (per-source KL), run as a foreachBatch
hook beside `DedupIngest`.

Why a pipeline wants this: a crawl source silently changing register
(language flip, template change, spam flood) shifts its unigram
distribution long before quality filters catch individual documents. The
monitor scores every arriving batch against the corpus-so-far and raises
a loud flag when KL exceeds the alert threshold, BEFORE the batch is
folded into state.

Scale shape: token counts shuffle once per batch (token-hash keyed,
map-side combined); the KL sum runs over the batch's vocabulary
(vocab-sized, not corpus-sized). Corpus state is one (token, count)
parquet relation per committed batch — compact-able exactly like the
ingest state. Laplace smoothing over the union vocabulary keeps KL
finite for tokens the corpus has never seen (those are precisely the
drift signal).

Same exactly-once discipline as ingest.py: per-batch state dirs written
in overwrite mode, marker last, replays idempotent.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from borsa_spark.functions.dedup import token_hash64
from borsa_spark.streaming import markers

_COUNTS_SCHEMA = "token_hash long, n long"


class DriftMonitor:
    """KL(batch ‖ corpus) per micro-batch with persisted corpus counts."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        alert_kl: float = 0.5,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.alert_kl = alert_kl
        os.makedirs(os.path.join(state_dir, "_batches"), exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.state_dir, name)

    def drift_log(self) -> list[dict]:
        # committed-batch-dirs + marker-last protocol, shared helpers
        # in streaming/markers.py (torn/in-flight files skipped — one
        # torn marker must not wedge the stream); numeric batch order,
        # not the lexicographic listdir order (batch-10 < batch-2)
        return sorted(
            markers.read_log(self._path("_batches")),
            key=lambda e: e["batch"],
        )

    def corpus_counts(self) -> DataFrame:
        committed = [
            os.path.join(self._path("counts"), f"batch-{e['batch']}")
            for e in self.drift_log()
        ]
        committed = [p for p in committed if os.path.exists(p)]
        if committed:
            return (
                self.spark.read.schema(_COUNTS_SCHEMA)
                .parquet(*committed)
                .groupBy("token_hash")
                .agg(F.sum("n").alias("n"))
            )
        return self.spark.createDataFrame([], _COUNTS_SCHEMA)

    @staticmethod
    def _batch_counts(docs: DataFrame) -> DataFrame:
        toks = docs.select(
            F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        return toks.groupBy(token_hash64(F.col("tok")).alias("token_hash")).agg(
            F.count("*").alias("n")
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # corpus token counts are keyed by token_hash64, whose value space
        # depends on BORSA_SPARK_SHINGLE_HASH — same identity rule as the
        # ingest state (a mode flip would report the whole vocab as new)
        from borsa_spark.streaming.ingest import guard_state_mode

        guard_state_mode(self.state_dir, {"kind": "drift"})
        marker = os.path.join(self._path("_batches"), f"batch-{batch_id}.json")
        if markers.load_marker(marker) is not None:
            return  # replay with a PARSEABLE marker: committed

        bc = self._batch_counts(batch_df.select("text")).persist()
        corpus = self.corpus_counts()

        # KL(P_batch ‖ Q_corpus) with Laplace smoothing over the union
        # vocab: P = (n_b + 1) / (N_b + V), Q = (n_c + 1) / (N_c + V).
        # First batch (empty corpus): score 0.0 by definition — there is
        # nothing to drift from.
        joined = bc.alias("b").join(
            corpus.alias("c"), "token_hash", "full"
        ).select(
            F.coalesce(F.col("b.n"), F.lit(0)).alias("nb"),
            F.coalesce(F.col("c.n"), F.lit(0)).alias("nc"),
        ).persist()
        row = joined.agg(
            F.sum("nb").alias("Nb"),
            F.sum("nc").alias("Nc"),
            F.count("*").alias("V"),
        ).first()
        if row.Nc and row.Nb:
            kl_expr = (
                ((F.col("nb") + 1) / F.lit(float(row.Nb + row.V)))
                * F.log(
                    ((F.col("nb") + 1) / F.lit(float(row.Nb + row.V)))
                    / ((F.col("nc") + 1) / F.lit(float(row.Nc + row.V)))
                )
            )
            # Sum over the batch's smoothed support (nb >= 0 rows all
            # contribute; restrict to union vocab rows, which `joined` is).
            kl = float(joined.agg(F.sum(kl_expr)).first()[0] or 0.0)
        else:
            kl = 0.0
        n_new = joined.filter((F.col("nc") == 0) & (F.col("nb") > 0)).count()

        bc.write.mode("overwrite").parquet(
            self._path(f"counts/batch-{batch_id}")
        )
        markers.write_marker(
            marker,
            {
                "batch": int(batch_id),
                "kl": round(kl, 6),
                "alert": bool(kl > self.alert_kl),
                "batch_tokens": int(row.Nb or 0),
                "new_vocab": int(n_new),
            },
        )
        bc.unpersist()
        joined.unpersist()

    def attach(self, stream_df: DataFrame, checkpoint: str):
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .start()
        )


_MOMENTS_SCHEMA = "__d int, pos int, s double, n long"


class EmbeddingDriftMonitor:
    """Embedding-distribution drift per micro-batch — the vector-side
    sibling of the unigram-KL monitor above, built on f82's one-pass
    moment aggregation (functions/pca.py `_moment_agg`): each batch
    reduces to its d²+d Gram/mean sums, which are ASSOCIATIVE, so the
    corpus state is just the per-batch moment relations summed —
    no raw vector is ever re-read.

    Why a pipeline wants this: an embedding model silently swapped,
    re-normalized, or fed a shifted domain moves the embedding cloud's
    mean and covariance long before any per-document filter notices.
    Per batch we score

        mean_shift = ||mu_b - mu_c||_2 / sqrt(trace(cov_c) / d)
        cov_shift  = ||cov_b - cov_c||_F / ||cov_c||_F

    (shift in units of the corpus's own spread — scale-free, so one
    threshold works across embedding models) and alert when either
    exceeds its threshold, BEFORE the batch is folded into state.

    Scale shape: the only distributed work is the batch's moment
    aggregation (d²+d+1 grouping keys, corpus-size-independent,
    map-side combined); corpus state is a d²+d-row parquet per
    committed batch; the assembly and norms are bounded d×d driver
    math (the pca.py `_assemble` path). Same marker-last exactly-once
    protocol as the token monitor, with the atomic temp-then-rename
    markers of streaming/rollup.py."""

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        alert_mean_shift: float = 0.5,
        alert_cov_shift: float = 0.5,
        embedding_col: str = "embedding",
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.alert_mean_shift = alert_mean_shift
        self.alert_cov_shift = alert_cov_shift
        self.embedding_col = embedding_col
        os.makedirs(os.path.join(state_dir, "_batches"), exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.state_dir, name)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(
            self._path("_batches"), f"batch-{batch_id}.json"
        )

    def drift_log(self) -> list[dict]:
        return sorted(
            markers.read_log(self._path("_batches")),
            key=lambda e: e["batch"],
        )

    def corpus_moments(self) -> DataFrame:
        committed = [
            self._path(f"moments/batch-{e['batch']}")
            for e in self.drift_log()
        ]
        committed = [p for p in committed if os.path.exists(p)]
        if not committed:
            return self.spark.createDataFrame([], _MOMENTS_SCHEMA)
        return (
            self.spark.read.schema(_MOMENTS_SCHEMA)
            .parquet(*committed)
            .groupBy("__d", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
        )

    @staticmethod
    def _assemble(rows):
        """(cov, mean, n) from collected moment rows — pca.py's
        assembly contract (bounded d²+d driver data)."""
        from borsa_spark.functions.pca import _assemble

        return _assemble(rows, fast=False)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from borsa_spark.functions.pca import _moment_agg

        if markers.load_marker(self._marker(batch_id)) is not None:
            return  # replay with a PARSEABLE marker: committed
        import numpy as np

        bm = _moment_agg(
            batch_df.select(self.embedding_col), self.embedding_col
        )
        batch_rows = bm.collect()
        corpus_rows = self.corpus_moments().collect()

        # A changed embedding WIDTH is the most blatant model swap the
        # monitor exists to catch — it must raise an ALERT marker, not
        # crash the stream (round-8 review finding: _assemble's mixed-
        # dimension guard, or the numpy broadcast on mean_b - mean_c,
        # would otherwise throw and crash-loop the foreachBatch). The
        # offending batch's moments are QUARANTINED (not folded into
        # state) so the corpus keeps one consistent width.
        batch_ds = sorted({r["__d"] for r in batch_rows})
        corpus_ds = sorted({r["__d"] for r in corpus_rows})
        dim_change = bool(
            len(batch_ds) > 1
            or (batch_ds and corpus_ds and batch_ds != corpus_ds)
        )

        metrics = {"mean_shift": 0.0, "cov_shift": 0.0}
        if dim_change:
            alert = True
        else:
            if batch_rows and corpus_rows:
                cov_b, mean_b, _ = self._assemble(batch_rows)
                cov_c, mean_c, _ = self._assemble(corpus_rows)
                d = len(mean_c)
                spread = float(
                    np.sqrt(max(np.trace(cov_c) / d, 1e-300))
                )
                cnorm = float(np.linalg.norm(cov_c))
                metrics["mean_shift"] = round(
                    float(np.linalg.norm(mean_b - mean_c)) / spread, 6
                )
                metrics["cov_shift"] = round(
                    float(np.linalg.norm(cov_b - cov_c))
                    / max(cnorm, 1e-300),
                    6,
                )
            alert = bool(
                metrics["mean_shift"] > self.alert_mean_shift
                or metrics["cov_shift"] > self.alert_cov_shift
            )
        if batch_rows and not dim_change:
            self.spark.createDataFrame(
                [
                    (r["__d"], r["pos"], float(r["s"]), int(r["n"]))
                    for r in batch_rows
                ],
                _MOMENTS_SCHEMA,
            ).coalesce(1).write.mode("overwrite").parquet(
                self._path(f"moments/batch-{batch_id}")
            )
        # n per (width, pos) is the vector count of that width group;
        # total arrivals = one representative per width, summed (a
        # single-width batch reduces to rows[0]['n'])
        n_by_width: dict = {}
        for r in batch_rows:
            n_by_width.setdefault(r["__d"], int(r["n"]))
        markers.write_marker(
            self._marker(batch_id),
            {
                "batch": int(batch_id),
                "n_vectors": int(sum(n_by_width.values())),
                **metrics,
                "dim_change": dim_change,
                "batch_dims": batch_ds,
                "corpus_dims": corpus_ds,
                "alert": alert,
            },
        )

    def attach(self, stream_df: DataFrame, checkpoint: str):
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .start()
        )
