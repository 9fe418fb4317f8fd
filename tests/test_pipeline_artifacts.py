"""CorpusArtifacts: the materialized corpus-prep checkpoint must (a) give
bit-identical results to the self-contained query pipelines, (b) serve
repeat consumers from parquet without recomputing, (c) treat crash-partial
stages (directory without marker) as absent, and (d) refuse to serve
artifacts built under different parameters or shingle-hash mode.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from borsa_spark.functions import dedup as _dd
from borsa_spark.functions.pipeline import CorpusArtifacts, PrepParams

SF001 = "/root/testdata/sf0.001"


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet")


def test_build_matches_self_contained_pipeline(spark, docs, tmp_path):
    art = CorpusArtifacts(spark, str(tmp_path))
    report = art.build(docs)
    assert set(report.values()) == {"built"}

    direct = _dd.minhash_dedup_pairs(docs, n=3, threshold=0.5)
    got = {tuple(r) for r in art.pairs().collect()}
    want = {tuple(r) for r in direct.collect()}
    assert got == want

    nodes = docs.select(F.col("doc_id").alias("id"))
    direct_cc = {
        tuple(r)
        for r in _dd.dup_clusters(
            direct.select("id_a", "id_b"), nodes
        ).collect()
    }
    assert {tuple(r) for r in art.clusters().collect()} == direct_cc


def test_second_build_is_fully_cached(spark, docs, tmp_path):
    art = CorpusArtifacts(spark, str(tmp_path))
    art.build(docs)
    marker = os.path.join(str(tmp_path), "pairs", "b000", "_DONE.json")
    before = os.path.getmtime(marker)
    report = art.build(docs)
    assert set(report.values()) == {"cached"}
    assert os.path.getmtime(marker) == before  # nothing rewritten


def test_crash_partial_stage_is_rebuilt(spark, docs, tmp_path):
    art = CorpusArtifacts(spark, str(tmp_path))
    art.build(docs)
    # simulate a crash between parquet write and marker write
    os.remove(os.path.join(str(tmp_path), "clusters", "b000", "_DONE.json"))
    report = art.build(docs)
    assert report["clusters"] == "built"
    assert report["pairs"] == "cached"  # predecessors untouched


def test_param_mismatch_refuses_stale_artifacts(spark, docs, tmp_path):
    CorpusArtifacts(spark, str(tmp_path), PrepParams(n=3)).build(docs)
    other = CorpusArtifacts(spark, str(tmp_path), PrepParams(n=5))
    assert not other.committed("pairs")
    with pytest.raises(RuntimeError, match="different params"):
        other.pairs()


def test_hash_mode_is_part_of_artifact_identity(spark, docs, tmp_path):
    art = CorpusArtifacts(spark, str(tmp_path))
    art.build(docs)
    # forge a marker claiming the other hash mode: must read as stale
    marker_path = os.path.join(
        str(tmp_path), "signatures", "b000", "_DONE.json"
    )
    with open(marker_path) as f:
        marker = json.load(f)
    marker["params"]["shingle_hash"] = "xxhash64"
    with open(marker_path, "w") as f:
        json.dump(marker, f)
    assert not art.committed("signatures")


def test_downstream_helpers_match_gate_queries(spark, docs, tmp_path):
    from borsa_spark.queries import QUERIES

    art = CorpusArtifacts(spark, str(tmp_path))
    art.build(docs)
    got = {tuple(r) for r in art.survivors(docs).collect()}
    want = {tuple(r) for r in QUERIES["f33_dedup_survivors"](spark, SF001).collect()}
    assert got == want

    splits = art.split_assign()
    assert splits.count() == docs.count()
    names = {r["split"] for r in splits.select("split").distinct().collect()}
    assert names <= {"train", "valid", "test"}
    # leakage-safety: every component lands in exactly one split
    leaks = (
        splits.groupBy("component")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
    )
    assert leaks.count() == 0


class TestIncrementalExtend:
    """extend(B) after build(A) must equal build(A ∪ B), reuse the stored
    corpus side, and keep the stale-clusters crash window detectable."""

    def _split(self, docs):
        a = docs.filter(F.col("doc_id") % 3 != 0)
        b = docs.filter(F.col("doc_id") % 3 == 0)
        return a, b

    def test_extend_matches_full_build(self, spark, docs, tmp_path):
        a, b = self._split(docs)
        inc = CorpusArtifacts(spark, str(tmp_path / "inc"))
        inc.build(a)
        inc.extend(b)
        full = CorpusArtifacts(spark, str(tmp_path / "full"))
        full.build(docs)
        assert {tuple(r) for r in inc.pairs().collect()} == {
            tuple(r) for r in full.pairs().collect()
        }
        assert {tuple(r) for r in inc.clusters().collect()} == {
            tuple(r) for r in full.clusters().collect()
        }

    def test_extend_with_bucket_cap_is_superset_of_full_build(
        self, spark, docs, tmp_path
    ):
        # The cap is a cost guard, not semantics: new candidates apply it
        # at union occupancy (like a full build), but pairs committed from
        # a bucket that was under the cap at build(A) time are NOT
        # retracted when B pushes that bucket over — so incremental ⊇
        # full, and every extra pair is an intra-A verified-true pair.
        cap = PrepParams(max_bucket_size=3)
        a, b = self._split(docs)
        inc = CorpusArtifacts(spark, str(tmp_path / "inc"), cap)
        inc.build(a)
        inc.extend(b)
        full = CorpusArtifacts(spark, str(tmp_path / "full"), cap)
        full.build(docs)
        got = {tuple(r) for r in inc.pairs().collect()}
        want = {tuple(r) for r in full.pairs().collect()}
        assert got >= want
        a_ids = {r["doc_id"] for r in a.select("doc_id").collect()}
        for id_a, id_b, _j in got - want:
            assert id_a in a_ids and id_b in a_ids

    def test_crash_before_refold_reads_stale_and_recovers(
        self, spark, docs, tmp_path
    ):
        import shutil

        a, b = self._split(docs)
        art = CorpusArtifacts(spark, str(tmp_path))
        art.build(a)
        art.extend(b)
        # simulate the crash window: pairs part b001 committed but the
        # clusters refold never happened -> drop the newest clusters part
        clusters_parts = sorted(
            os.listdir(os.path.join(str(tmp_path), "clusters"))
        )
        shutil.rmtree(
            os.path.join(str(tmp_path), "clusters", clusters_parts[-1])
        )
        assert not art.committed("clusters")  # stale, not silently served
        with pytest.raises(RuntimeError, match="stale"):
            art.clusters()
        report = art.build(docs)  # recovery refolds from stored pairs
        assert report["clusters"] == "built"
        assert report["pairs"] == "cached"
        full = CorpusArtifacts(spark, str(tmp_path / "full2"))
        full.build(docs)
        assert {tuple(r) for r in art.clusters().collect()} == {
            tuple(r) for r in full.clusters().collect()
        }

    def test_crash_between_additive_commits_leaves_batch_invisible(
        self, spark, docs, tmp_path
    ):
        # Crash window: extend committed the arrays part but not the
        # signatures/pairs parts. The whole batch must be invisible in
        # EVERY additive stage (no torn corpus), and the retried extend
        # overwrites the stray part under the same index.
        import shutil

        a, b = self._split(docs)
        art = CorpusArtifacts(spark, str(tmp_path))
        art.build(a)
        art.extend(b)
        # roll back: drop signatures/pairs b001 and the clusters refold,
        # leaving only arrays/b001 committed (the torn state)
        for stage, part in (("signatures", "b001"), ("pairs", "b001"),
                            ("clusters", "b001")):
            shutil.rmtree(os.path.join(str(tmp_path), stage, part))
        n_a = a.count()
        assert art.shingle_arrays().count() == n_a  # batch B invisible
        assert art.committed("clusters")  # base-only view is consistent
        report = art.extend(b)  # retry: same index, stray overwritten
        assert report["batch_parts"] == 1
        assert art.shingle_arrays().count() == docs.count()
        full = CorpusArtifacts(spark, str(tmp_path / "full3"))
        full.build(docs)
        assert {tuple(r) for r in art.clusters().collect()} == {
            tuple(r) for r in full.clusters().collect()
        }

    def test_retried_extend_after_refold_crash_is_idempotent(
        self, spark, docs, tmp_path
    ):
        # Crash window the OTHER side of the pairs commit: all three
        # additive parts of batch B committed (batch fully visible) but
        # the clusters refold never ran. A retried extend(B) must NOT
        # re-admit the batch (no duplicate array rows, no jaccard-1.0
        # self-pairs) — it detects every id as already admitted and just
        # heals the stale snapshot.
        import shutil

        a, b = self._split(docs)
        art = CorpusArtifacts(spark, str(tmp_path))
        art.build(a)
        art.extend(b)
        clusters_parts = sorted(
            os.listdir(os.path.join(str(tmp_path), "clusters"))
        )
        shutil.rmtree(
            os.path.join(str(tmp_path), "clusters", clusters_parts[-1])
        )
        assert not art.committed("clusters")  # the stale state
        n_pairs_before = art.pairs().count()
        report = art.extend(b)  # the retry the docstring promises
        assert report["new_pairs"] == "already_admitted"
        assert report["clusters"] == "refolded"
        # no duplicate rows, no self-pairs, counts unchanged
        assert art.shingle_arrays().count() == docs.count()
        arrs = art.shingle_arrays().groupBy("id").count()
        assert arrs.filter(F.col("count") > 1).count() == 0
        assert art.pairs().count() == n_pairs_before
        full = CorpusArtifacts(spark, str(tmp_path / "full4"))
        full.build(docs)
        assert {tuple(r) for r in art.clusters().collect()} == {
            tuple(r) for r in full.clusters().collect()
        }
        # and a retry when nothing at all is missing is a clean no-op
        report2 = art.extend(b)
        assert report2["new_pairs"] == "already_admitted"
        assert report2["clusters"] == "cached"
