"""Streaming drift monitor (streaming/drift.py): KL(batch ‖ corpus) with
Laplace smoothing, alert thresholding, idempotent replays."""

from __future__ import annotations

from pyspark.sql import functions as F

from borsa_spark.sources import load_table
from borsa_spark.streaming.drift import DriftMonitor

SF = "/root/testdata/sf0.001"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


STABLE = ["spark join filter merge sort window"] * 20


class TestDriftMonitor:
    def test_first_batch_scores_zero(self, spark, tmp_path):
        mon = DriftMonitor(spark, str(tmp_path / "d1"))
        mon.process_batch(_docs(spark, STABLE), 0)
        log = mon.drift_log()
        assert log[0]["kl"] == 0.0 and log[0]["alert"] is False

    def test_stable_batches_stay_quiet_shifted_batch_alerts(
        self, spark, tmp_path
    ):
        mon = DriftMonitor(spark, str(tmp_path / "d2"), alert_kl=0.5)
        mon.process_batch(_docs(spark, STABLE), 0)
        mon.process_batch(_docs(spark, STABLE), 1)
        # register flip: entirely new vocabulary
        spam = ["buy cheap pills now limited offer click here"] * 20
        mon.process_batch(_docs(spark, spam), 2)
        log = mon.drift_log()
        assert log[1]["alert"] is False and log[1]["kl"] < 0.1
        assert log[2]["alert"] is True and log[2]["kl"] > 0.5
        assert log[2]["new_vocab"] > 0

    def test_replay_idempotent(self, spark, tmp_path):
        mon = DriftMonitor(spark, str(tmp_path / "d3"))
        mon.process_batch(_docs(spark, STABLE), 0)
        first = mon.drift_log()
        mon.process_batch(_docs(spark, STABLE), 0)
        assert mon.drift_log() == first

    def test_real_corpus_batches_low_drift(self, spark, tmp_path):
        # Two halves of the same fixture corpus share a distribution: the
        # second half must score low against the first.
        docs = load_table(spark, SF, "documents")
        mon = DriftMonitor(spark, str(tmp_path / "d4"), alert_kl=0.5)
        mon.process_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
        mon.process_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)
        log = mon.drift_log()
        assert log[1]["kl"] < 0.1 and log[1]["alert"] is False
