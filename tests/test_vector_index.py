"""VectorIndex: the persisted IVF index must return exactly what the
per-query-retrained `ivf_topk` path returns with the same trained
centroids, prune the lists scan to the probed partitions, and survive
reopen from a fresh handle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from borsa_spark.functions import similarity as _sim
from borsa_spark.functions.vector_index import VectorIndex

SF001 = "/root/testdata/sf0.001"


@pytest.fixture()
def emb(spark):
    return spark.read.parquet(f"{SF001}/embeddings.parquet")


@pytest.fixture()
def queries(emb):
    return emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )


def test_search_matches_ivf_topk(spark, emb, queries, tmp_path):
    idx = VectorIndex(spark, str(tmp_path), k=8, iters=2)
    stats = idx.build(emb)
    assert stats["n_vectors"] == emb.count()
    assert stats["n_centroids"] == 8

    got = {tuple(r) for r in idx.search(queries, k=5, n_probe=2).collect()}
    cents = idx.centroids()
    want = {
        tuple(r)
        for r in _sim.ivf_topk(emb, queries, cents, k=5, n_probe=2).collect()
    }
    assert got == want


def test_probe_prunes_list_partitions(spark, emb, queries, tmp_path):
    idx = VectorIndex(spark, str(tmp_path), k=8, iters=2)
    idx.build(emb)
    one_query = queries.limit(1)
    probed = idx.probe_plan(one_query, n_probe=2)
    cids = {r["centroid_id"] for r in probed.collect()}
    assert len(cids) == 2
    # the filtered scan must read only the probed partition directories:
    # the plan carries a PartitionFilter and the executed scan touches
    # exactly the probed directories (inputFiles() lists pre-pruning, so
    # check what was actually read via input_file_name()).
    import contextlib
    import io

    lists = idx.lists().filter(F.col("centroid_id").isin([int(c) for c in cids]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        lists.explain("formatted")
    assert "PartitionFilters: [centroid_id" in buf.getvalue()
    read = {
        r["f"]
        for r in lists.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert read
    for f in read:
        assert any(f"centroid_id={c}" in f for c in cids)
    assert len(read) < len(set(idx.lists().inputFiles()))  # strictly pruned


def test_reopen_from_fresh_handle_and_param_guard(spark, emb, queries, tmp_path):
    VectorIndex(spark, str(tmp_path), k=8, iters=2).build(emb)
    reopened = VectorIndex(spark, str(tmp_path), k=8, iters=2)
    assert reopened.committed()
    assert reopened.search(queries, k=3, n_probe=1).count() == 10 * 3

    other = VectorIndex(spark, str(tmp_path), k=16, iters=2)
    assert not other.committed()
    with pytest.raises(RuntimeError, match="different params"):
        other.lists()


def test_build_is_idempotent_until_overwrite(spark, emb, tmp_path):
    idx = VectorIndex(spark, str(tmp_path), k=8, iters=2)
    first = idx.build(emb)
    import os

    marker = os.path.join(str(tmp_path), "_DONE.json")
    before = os.path.getmtime(marker)
    again = idx.build(emb)  # served from the marker, no recompute
    assert again == first
    assert os.path.getmtime(marker) == before
    rebuilt = idx.build(emb, overwrite=True)
    assert rebuilt == first
    assert os.path.getmtime(marker) > before


class TestIncrementalAdd:
    def test_add_matches_rebuild_with_same_centroids(self, spark, emb, queries, tmp_path):
        base = emb.filter(F.col("vec_id") % 2 == 0)
        rest = emb.filter(F.col("vec_id") % 2 == 1)
        idx = VectorIndex(spark, str(tmp_path), k=8, iters=2)
        idx.build(base)
        report = idx.add(rest)
        assert report["n_added"] == rest.count()
        assert report["n_vectors"] == emb.count()
        # search over base+added == ivf_topk over the full corpus with the
        # SAME (base-trained) centroids
        got = {tuple(r) for r in idx.search(queries, k=5, n_probe=2).collect()}
        want = {
            tuple(r)
            for r in _sim.ivf_topk(
                emb, queries, idx.centroids(), k=5, n_probe=2
            ).collect()
        }
        assert got == want

    def test_crash_partial_add_is_invisible_then_retried(self, spark, emb, tmp_path):
        import json
        import os

        base = emb.filter(F.col("vec_id") % 2 == 0)
        rest = emb.filter(F.col("vec_id") % 2 == 1)
        idx = VectorIndex(spark, str(tmp_path), k=8, iters=2)
        idx.build(base)
        idx.add(rest)
        # simulate the crash: roll the marker back to pre-add (part b001
        # exists on disk but is not listed)
        marker_path = os.path.join(str(tmp_path), "_DONE.json")
        with open(marker_path) as f:
            marker = json.load(f)
        marker["parts"] = ["b000"]
        marker["stats"]["n_vectors"] -= rest.count()
        with open(marker_path, "w") as f:
            json.dump(marker, f)
        assert idx.lists().count() == base.count()  # stray part invisible
        report = idx.add(rest)  # retry overwrites the stray directory
        assert report["part"] == "b001"
        assert idx.lists().count() == emb.count()

    def test_add_requires_committed_base(self, spark, emb, tmp_path):
        idx = VectorIndex(spark, str(tmp_path), k=8, iters=2)
        with pytest.raises(RuntimeError, match="no committed base"):
            idx.add(emb)


def test_legacy_marker_without_parts_reads_as_absent(spark, tmp_path):
    import json
    import os

    os.makedirs(str(tmp_path), exist_ok=True)
    with open(os.path.join(str(tmp_path), "_DONE.json"), "w") as f:
        json.dump({"params": {"k": 8, "iters": 2}, "stats": {}}, f)
    idx = VectorIndex(spark, str(tmp_path), k=8, iters=2)
    assert not idx.committed()  # pre-parts layout: absent, not a KeyError
    with pytest.raises(RuntimeError, match="run build"):
        idx.lists()
