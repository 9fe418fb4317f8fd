"""Distributed PCA / whitening for the embedding pipeline.

The classic two-phase shape (the public Spark MLlib RowMatrix design —
computePrincipalComponents aggregates a Gram matrix and eigensolves on
the driver; reimplemented here DataFrame-first with no mllib
dependency): the DATA-sized work is one pass computing the d×d
covariance (d = embedding width, 64 here — thousands at most in
practice), the d×d eigendecomposition is bounded driver math (numpy
`eigh` on a symmetric matrix), and projection/whitening are in-row
column expressions over broadcast components. Dimension reduction and
whitening are standard preprocessing for the ANN / SemDeDup family
(functions/similarity.py) — distances in the whitened space are
Mahalanobis distances in the original.

Scale shape: the covariance pass explodes each vector's in-row outer
product to (pos, prod) and partial-aggregates — 4096 grouping keys
regardless of corpus size, so the map-side combine collapses the d²
amplification before any shuffle; means ride the same pass. Everything
else is O(d²) driver work or in-row arithmetic. Accumulation is cast
to double BEFORE multiplication so both engines sum in float64 (the
oracle rounds to 8dp; float32 products would diverge at far coarser
digits)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def embedding_covariance(
    embs: DataFrame, col: str = "embedding"
) -> DataFrame:
    """The d×d population covariance as (i, j, cov) rows, cov rounded
    to 8dp: cov_ij = E[x_i x_j] − E[x_i]E[x_j]. One corpus pass: the
    in-row outer product rides a single posexplode into a 4096-key
    partial agg; the means reuse the diagonal pass structure."""
    d = F.size(F.col(col))
    prods = embs.select(
        d.alias("__d"),
        F.posexplode(
            F.expr(
                f"flatten(transform({col}, x ->"
                f" transform({col}, y ->"
                " cast(x as double) * cast(y as double))))"
            )
        ).alias("pos", "prod"),
    )
    sums = prods.groupBy(
        (F.col("pos") / F.col("__d")).cast("long").alias("i"),
        (F.col("pos") % F.col("__d")).alias("j"),
    ).agg(F.sum("prod").alias("s"), F.count("*").alias("n"))
    means = (
        embs.select(
            F.posexplode(
                F.expr(f"transform({col}, x -> cast(x as double))")
            ).alias("k", "x")
        )
        .groupBy("k")
        .agg((F.sum("x") / F.count("*")).alias("m"))
    )
    mi = means.select(F.col("k").alias("i"), F.col("m").alias("mi"))
    mj = means.select(F.col("k").alias("j"), F.col("m").alias("mj"))
    return (
        sums.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            F.round(
                F.col("s") / F.col("n") - F.col("mi") * F.col("mj"), 8
            ).alias("cov"),
        )
    )


def sql_embedding_covariance(table: str = "embeddings") -> str:
    """DuckDB oracle: the same one-pass sums/means/combination."""
    return f"""
    WITH x AS (
      SELECT vec_id, u.i - 1 AS k, CAST(e[u.i] AS DOUBLE) AS v
      FROM (SELECT vec_id, embedding AS e FROM {table})
           , unnest(range(1, len(e) + 1)) AS u(i)),
    s AS (
      SELECT a.k AS i, b.k AS j, sum(a.v * b.v) AS s, count(*) AS n
      FROM x a JOIN x b USING (vec_id)
      GROUP BY 1, 2),
    m AS (SELECT k, sum(v) / count(*) AS m FROM x GROUP BY k)
    SELECT s.i::BIGINT AS i, s.j::BIGINT AS j,
           round(s.s / s.n - mi.m * mj.m, 8) AS cov
    FROM s JOIN m mi ON mi.k = s.i JOIN m mj ON mj.k = s.j
    """


def pca_fit(
    embs: DataFrame, k: int, col: str = "embedding"
) -> dict:
    """Fit PCA on the corpus: returns {mean, components, variances}
    as plain Python lists (bounded d / k×d / k driver data — the
    n_probe-centroids convention). Components are rows of V^T for the
    top-k eigenvalues, each sign-normalized so its largest-magnitude
    coordinate is positive (eigh's sign is otherwise arbitrary and
    would break determinism)."""
    import numpy as np

    rows = embedding_covariance(embs, col).collect()
    d = max(r.i for r in rows) + 1
    cov = np.zeros((d, d))
    for r in rows:
        cov[r.i][r.j] = r.cov
    mean = [
        r.m
        for r in embs.select(
            F.posexplode(
                F.expr(f"transform({col}, x -> cast(x as double))")
            ).alias("k", "x")
        )
        .groupBy("k")
        .agg((F.sum("x") / F.count("*")).alias("m"))
        .orderBy("k")
        .collect()
    ]
    vals, vecs = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(vals)[::-1][:k]
    comps, variances = [], []
    for idx in order:
        v = vecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        comps.append([float(c) for c in v])
        variances.append(float(max(vals[idx], 0.0)))
    return {"mean": mean, "components": comps, "variances": variances}


def pca_project(
    embs: DataFrame,
    model: dict,
    col: str = "embedding",
    id_col: str = "vec_id",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project every embedding onto the fitted components — (id_col,
    proj: array<double>) with proj[c] = (x − mean)·comp_c, divided by
    sqrt(variance_c) when whitening. Pure in-row arithmetic over
    broadcast literals; the corpus is touched once and never shuffles."""
    import math

    coords = []
    for c, comp in enumerate(model["components"]):
        dot = F.aggregate(
            F.zip_with(
                F.expr(f"transform({col}, x -> cast(x as double))"),
                F.array(*[F.lit(w) for w in comp]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        center = sum(m * w for m, w in zip(model["mean"], comp))
        coord = dot - F.lit(center)
        if whiten:
            coord = coord / F.lit(
                math.sqrt(model["variances"][c]) + eps
            )
        coords.append(coord)
    return embs.select(id_col, F.array(*coords).alias("proj"))
