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
        # NOTE: this is the same committed-batch-dirs + marker-last
        # protocol as DedupIngest (streaming/ingest.py), minus the
        # compaction supersession logic — drift state has no compactor.
        # If one is ever added, fold these into the shared manifest rules
        # there (admission_log's compacted_from handling) rather than
        # growing a second diverging copy.
        out = []
        bdir = self._path("_batches")
        for f in sorted(os.listdir(bdir)):
            with open(os.path.join(bdir, f)) as fh:
                out.append(json.load(fh))
        return out

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
        if os.path.exists(marker):
            return

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
        with open(marker, "w") as f:
            json.dump(
                {
                    "batch": int(batch_id),
                    "kl": round(kl, 6),
                    "alert": bool(kl > self.alert_kl),
                    "batch_tokens": int(row.Nb or 0),
                    "new_vocab": int(n_new),
                },
                f,
            )
        bc.unpersist()
        joined.unpersist()

    def attach(self, stream_df: DataFrame, checkpoint: str):
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .start()
        )
