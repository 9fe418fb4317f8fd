"""Pins for distributed PCA (f82 + pca_fit/pca_project): the covariance
pass must match numpy exactly, the fitted components must be an
orthonormal eigenbasis with descending variances, projections must
carry exactly the per-component variances, whitening must unit-scale
them, and the sign convention must make the whole fit deterministic."""

from __future__ import annotations

import numpy as np
import pytest

from borsa_spark.functions.pca import (
    embedding_covariance,
    pca_fit,
    pca_project,
)


def _embs(spark, n=60, d=8, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic cloud: variance concentrated along a few directions
    basis = rng.normal(size=(d, d))
    scales = np.array([5.0, 3.0, 1.0] + [0.2] * (d - 3))
    pts = rng.normal(size=(n, d)) * scales @ basis.T + rng.normal(size=d)
    return (
        spark.createDataFrame(
            [(i, [float(x) for x in row], 0) for i, row in enumerate(pts)],
            "vec_id long, embedding array<float>, label int",
        ),
        pts.astype(np.float32).astype(np.float64),
    )


class TestCovariance:
    def test_matches_numpy_population_covariance(self, spark):
        df, pts = _embs(spark)
        got = {
            (r.i, r.j): r.cov for r in embedding_covariance(df).collect()
        }
        want = np.cov(pts, rowvar=False, bias=True)
        for (i, j), v in got.items():
            assert v == pytest.approx(want[i][j], abs=2e-8)
        assert len(got) == pts.shape[1] ** 2


class TestFitProject:
    def test_components_orthonormal_descending(self, spark):
        df, _ = _embs(spark)
        model = pca_fit(df, k=4)
        comps = np.array(model["components"])
        assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-9)
        vs = model["variances"]
        assert vs == sorted(vs, reverse=True) and vs[0] > vs[-1]

    def test_projection_variance_equals_eigenvalues(self, spark):
        df, _ = _embs(spark)
        model = pca_fit(df, k=3)
        proj = np.array(
            [r.proj for r in pca_project(df, model).collect()]
        )
        got = proj.var(axis=0)  # population variance, mean-centered data
        assert np.allclose(got, model["variances"][:3], rtol=1e-6)

    def test_whitening_unit_variance(self, spark):
        df, _ = _embs(spark)
        model = pca_fit(df, k=3)
        proj = np.array(
            [r.proj for r in pca_project(df, model, whiten=True).collect()]
        )
        assert np.allclose(proj.var(axis=0), 1.0, rtol=1e-5)

    def test_sign_convention_is_deterministic(self, spark):
        df, _ = _embs(spark)
        a = pca_fit(df, k=2)
        b = pca_fit(df.repartition(7), k=2)
        assert np.allclose(a["components"], b["components"], atol=1e-9)

    def test_reconstruction_error_shrinks_with_k(self, spark):
        df, pts = _embs(spark)
        errs = []
        for k in (1, 3, 6):
            model = pca_fit(df, k=k)
            comps = np.array(model["components"])
            mean = np.array(model["mean"])
            rows = pca_project(df, model).collect()
            ids = np.array([r.vec_id for r in rows])
            proj = np.array([r.proj for r in rows])
            recon = proj @ comps + mean
            errs.append(float(np.mean((recon - pts[ids]) ** 2)))
        assert errs[0] > errs[1] > errs[2]


class TestFastPath:
    def test_fast_covariance_equals_reference(self, spark):
        df, _ = _embs(spark)
        from borsa_spark.functions.pca import embedding_covariance_fast

        slow_df = embedding_covariance(df)
        fast_df = embedding_covariance_fast(df.repartition(5))
        # round 13: f82 switched to the fast path, which relies on the
        # two paths emitting the SAME schema (j int, not bigint)
        assert (
            fast_df.schema.simpleString() == slow_df.schema.simpleString()
        )
        slow = {(r.i, r.j): r.cov for r in slow_df.collect()}
        fast = {(r.i, r.j): r.cov for r in fast_df.collect()}
        assert set(slow) == set(fast)
        for key, v in slow.items():
            assert fast[key] == pytest.approx(v, abs=2e-8)

    def test_fast_fit_matches(self, spark):
        df, _ = _embs(spark)
        a = pca_fit(df, k=3)
        b = pca_fit(df, k=3, fast=True)
        assert np.allclose(a["components"], b["components"], atol=1e-6)
        assert np.allclose(a["variances"], b["variances"], atol=1e-8)


class TestEdges:
    def test_empty_corpus_raises_clearly(self, spark):
        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<float>, label int"
        )
        with pytest.raises(ValueError, match="empty corpus"):
            pca_fit(empty, 2)
        with pytest.raises(ValueError, match="empty corpus"):
            pca_fit(empty, 2, fast=True)

    def test_null_embeddings_skipped_by_both_paths(self, spark):
        from borsa_spark.functions.pca import embedding_covariance_fast

        df, _ = _embs(spark, n=20)
        # null vector, null ELEMENT, and NaN element must all be
        # skipped identically by both paths (a null element skews the
        # explode path's sums; either poisons the fast path's Gram)
        withnull = df.unionByName(
            spark.createDataFrame(
                [
                    (999, None, 0),
                    (998, [1.0, None] + [0.5] * 6, 0),
                    (997, [float("nan")] + [0.25] * 7, 0),
                ],
                "vec_id long, embedding array<float>, label int",
            )
        )
        slow = {
            (r.i, r.j): r.cov
            for r in embedding_covariance(withnull).collect()
        }
        fast = {
            (r.i, r.j): r.cov
            for r in embedding_covariance_fast(withnull).collect()
        }
        clean = {
            (r.i, r.j): r.cov for r in embedding_covariance(df).collect()
        }
        for key, v in clean.items():
            assert slow[key] == pytest.approx(v, abs=2e-8)
            assert fast[key] == pytest.approx(v, abs=2e-8)

    def test_covariance_plan_reuses_one_scan(self, spark):
        import contextlib
        import io

        df, _ = _embs(spark, n=20)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            embedding_covariance(df).explain()
        plan = buf.getvalue()
        # the moment aggregate is checkpointed before products/means
        # split, so the final plan contains NO posexplode at all — the
        # corpus-sized work happened exactly once upstream
        assert "Generate" not in plan
        assert plan.count("Scan ExistingRDD") >= 2  # both read the ckpt

    def test_fast_covariance_plan_reuses_one_scan(self, spark):
        # round 14 (r13 verdict #1): the fast path's d²+d+1-row agg is
        # likewise checkpointed before its five consumers split —
        # without it Catalyst pushes each kind-filter below the agg and
        # the corpus is scanned + Gram-computed once PER consumer (the
        # r13 after-plan showed 5 MapInPandas subtrees, 0 reused)
        import contextlib
        import io

        from borsa_spark.functions.pca import embedding_covariance_fast

        df, _ = _embs(spark, n=20)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            embedding_covariance_fast(df).explain()
        plan = buf.getvalue()
        assert "MapInPandas" not in plan  # Gram stage ran upstream, once
        assert plan.count("Scan ExistingRDD") >= 2


class TestMixedDimensions:
    def test_mixed_width_corpus_raises(self, spark):
        # ADVICE r8: pos keys collide across widths in the explode
        # path's assembly — must refuse loudly, not return wrong cov
        df = spark.createDataFrame(
            [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])],
            "vec_id long, embedding array<float>",
        )
        with pytest.raises(ValueError, match=r"mixed embedding.*\[2, 3\]"):
            pca_fit(df, 1)
