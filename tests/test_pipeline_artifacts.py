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
    marker = os.path.join(str(tmp_path), "pairs", "_DONE.json")
    before = os.path.getmtime(marker)
    report = art.build(docs)
    assert set(report.values()) == {"cached"}
    assert os.path.getmtime(marker) == before  # nothing rewritten


def test_crash_partial_stage_is_rebuilt(spark, docs, tmp_path):
    art = CorpusArtifacts(spark, str(tmp_path))
    art.build(docs)
    # simulate a crash between parquet write and marker write
    os.remove(os.path.join(str(tmp_path), "clusters", "_DONE.json"))
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
    marker_path = os.path.join(str(tmp_path), "signatures", "_DONE.json")
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
