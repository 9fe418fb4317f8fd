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


def _vecs(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)],
        "vec_id long, embedding array<float>",
    )


class TestEmbeddingDriftMonitor:
    """Vector-side drift (streaming/drift.py EmbeddingDriftMonitor):
    mean/cov shift from f82's mergeable one-pass moments."""

    def _cloud(self, n, d, seed, scale=None, shift=0.0):
        import numpy as np

        rng = np.random.default_rng(seed)
        x = rng.normal(size=(n, d))
        if scale is not None:
            x = x * np.asarray(scale)
        return x + shift

    def test_first_batch_scores_zero(self, spark, tmp_path):
        from borsa_spark.streaming.drift import EmbeddingDriftMonitor

        mon = EmbeddingDriftMonitor(spark, str(tmp_path / "e1"))
        mon.process_batch(_vecs(spark, self._cloud(50, 6, 1)), 0)
        log = mon.drift_log()
        assert log[0]["mean_shift"] == 0.0
        assert log[0]["cov_shift"] == 0.0
        assert log[0]["alert"] is False

    def test_planted_covariance_shift_alerts(self, spark, tmp_path):
        from borsa_spark.streaming.drift import EmbeddingDriftMonitor

        mon = EmbeddingDriftMonitor(spark, str(tmp_path / "e2"))
        # two in-distribution batches build the corpus...
        mon.process_batch(_vecs(spark, self._cloud(80, 6, 1)), 0)
        mon.process_batch(_vecs(spark, self._cloud(80, 6, 2)), 1)
        # ...then a batch whose covariance is stretched 4x along the
        # first axis (same mean) — the model-swap signature
        mon.process_batch(
            _vecs(spark, self._cloud(80, 6, 3, scale=[4, 1, 1, 1, 1, 1])),
            2,
        )
        log = {e["batch"]: e for e in mon.drift_log()}
        assert log[1]["alert"] is False, log[1]
        assert log[2]["cov_shift"] > log[1]["cov_shift"] * 3
        assert log[2]["alert"] is True, log[2]

    def test_planted_mean_shift_alerts(self, spark, tmp_path):
        from borsa_spark.streaming.drift import EmbeddingDriftMonitor

        mon = EmbeddingDriftMonitor(spark, str(tmp_path / "e3"))
        mon.process_batch(_vecs(spark, self._cloud(80, 6, 1)), 0)
        mon.process_batch(_vecs(spark, self._cloud(80, 6, 2)), 1)
        mon.process_batch(
            _vecs(spark, self._cloud(80, 6, 3, shift=2.0)), 2
        )
        log = {e["batch"]: e for e in mon.drift_log()}
        assert log[1]["alert"] is False
        assert log[2]["mean_shift"] > 0.5
        assert log[2]["alert"] is True

    def test_replay_idempotent_and_torn_marker_reprocesses(
        self, spark, tmp_path
    ):
        import os

        from borsa_spark.streaming.drift import EmbeddingDriftMonitor

        mon = EmbeddingDriftMonitor(spark, str(tmp_path / "e4"))
        batch = _vecs(spark, self._cloud(50, 6, 1))
        mon.process_batch(batch, 0)
        mon.process_batch(batch, 0)  # committed replay: no-op
        assert len(mon.drift_log()) == 1
        mon.process_batch(_vecs(spark, self._cloud(50, 6, 2)), 1)
        first = mon.drift_log()
        # tear batch 1's marker: the replay must re-process, and the
        # recomputed metrics are identical (deterministic moments)
        with open(mon._marker(1), "w") as f:
            f.write("{torn")
        mon.process_batch(_vecs(spark, self._cloud(50, 6, 2)), 1)
        assert mon.drift_log() == first
        assert not [
            f for f in os.listdir(mon._path("_batches"))
            if f.endswith(".tmp")
        ]


class TestMarkerRobustness:
    """Round-8 review: torn markers must read as uncommitted in BOTH
    monitors, and a dimension change must alert, never crash."""

    def test_token_monitor_torn_marker_reprocesses(self, spark, tmp_path):
        mon = DriftMonitor(spark, str(tmp_path / "t1"))
        mon.process_batch(_docs(spark, STABLE), 0)
        mon.process_batch(_docs(spark, STABLE), 1)
        import os

        marker = os.path.join(
            mon._path("_batches"), "batch-1.json"
        )
        with open(marker, "w") as f:
            f.write('{"batch": 1, "k')  # crash-torn
        # the torn file neither wedges the log nor reads as committed
        assert [e["batch"] for e in mon.drift_log()] == [0]
        mon.process_batch(_docs(spark, STABLE), 1)
        log = mon.drift_log()
        assert [e["batch"] for e in log] == [0, 1]
        assert log[1]["alert"] is False

    def test_token_monitor_log_is_numeric_order(self, spark, tmp_path):
        mon = DriftMonitor(spark, str(tmp_path / "t2"))
        for b in (0, 1, 2, 10):  # 'batch-10' < 'batch-2' lexically
            mon.process_batch(_docs(spark, STABLE), b)
        assert [e["batch"] for e in mon.drift_log()] == [0, 1, 2, 10]

    def test_embedding_dim_change_alerts_not_crashes(
        self, spark, tmp_path
    ):
        import numpy as np

        from borsa_spark.streaming.drift import EmbeddingDriftMonitor

        mon = EmbeddingDriftMonitor(spark, str(tmp_path / "t3"))
        rng = np.random.default_rng(5)
        mon.process_batch(_vecs(spark, rng.normal(size=(150, 6))), 0)
        # the embedding model is swapped: width 6 -> 8. Must ALERT.
        mon.process_batch(_vecs(spark, rng.normal(size=(150, 8))), 1)
        log = {e["batch"]: e for e in mon.drift_log()}
        assert log[1]["alert"] is True and log[1]["dim_change"] is True
        assert log[1]["batch_dims"] == [8]
        assert log[1]["corpus_dims"] == [6]
        # the offending batch is quarantined: the corpus stays width-6
        # and a following width-6 batch scores normally
        mon.process_batch(_vecs(spark, rng.normal(size=(150, 6))), 2)
        log = {e["batch"]: e for e in mon.drift_log()}
        assert log[2]["dim_change"] is False
        assert log[2]["alert"] is False

    def test_embedding_mixed_width_batch_alerts(self, spark, tmp_path):
        import numpy as np

        from borsa_spark.streaming.drift import EmbeddingDriftMonitor

        mon = EmbeddingDriftMonitor(spark, str(tmp_path / "t4"))
        rng = np.random.default_rng(6)
        mon.process_batch(_vecs(spark, rng.normal(size=(40, 6))), 0)
        rows = [(1, [0.1] * 6), (2, [0.2] * 8)]
        mixed = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        mon.process_batch(mixed, 1)
        log = {e["batch"]: e for e in mon.drift_log()}
        assert log[1]["alert"] is True and log[1]["dim_change"] is True
        assert log[1]["batch_dims"] == [6, 8]
