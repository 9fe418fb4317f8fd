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


def embedding_covariance_fast(
    embs: DataFrame, col: str = "embedding"
) -> DataFrame:
    """The scale path for the same (i, j, cov) relation: per-partition
    numpy ``X^T X`` / column sums / counts via Arrow-batched
    `mapInPandas` (BLAS does the d² work in-core), then ONE partial
    agg over d²+d+1 keyed partials. Bit-comparable to
    `embedding_covariance` at 8dp (same float64 accumulation, order
    differences below the round); the JVM explode path remains the
    oracle-matched reference. Measured 100x-tier speedup in SCALE.md."""
    import numpy as np
    import pandas as pd

    def part(batches):
        gram = None
        sums = None
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[col].to_numpy()).astype(np.float64)
            if gram is None:
                gram = X.T @ X
                sums = X.sum(axis=0)
            else:
                gram += X.T @ X
                sums += X.sum(axis=0)
            n += len(X)
        if n == 0:
            return
        d = gram.shape[0]
        pos = np.arange(d * d)
        yield pd.DataFrame(
            {
                "kind": ["g"] * (d * d) + ["m"] * d + ["n"],
                "pos": np.concatenate([pos, np.arange(d), [0]]),
                "val": np.concatenate([gram.ravel(), sums, [float(n)]]),
            }
        )

    parts = embs.mapInPandas(part, "kind string, pos long, val double")
    agg = parts.groupBy("kind", "pos").agg(F.sum("val").alias("v"))
    n_rel = agg.filter(F.col("kind") == "n").select(
        F.col("v").alias("n_total")
    )
    m_rel = agg.filter(F.col("kind") == "m").select(
        F.col("pos").alias("k"), F.col("v").alias("s")
    )
    d_rel = m_rel.groupBy().agg(F.count("*").alias("d"))
    g = (
        agg.filter(F.col("kind") == "g")
        .crossJoin(F.broadcast(d_rel))
        .crossJoin(F.broadcast(n_rel))
        .select(
            (F.col("pos") / F.col("d")).cast("long").alias("i"),
            (F.col("pos") % F.col("d")).alias("j"),
            F.col("v"),
            F.col("n_total"),
        )
    )
    mi = m_rel.select(F.col("k").alias("i"), F.col("s").alias("si"))
    mj = m_rel.select(F.col("k").alias("j"), F.col("s").alias("sj"))
    return (
        g.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            F.round(
                F.col("v") / F.col("n_total")
                - (F.col("si") / F.col("n_total"))
                * (F.col("sj") / F.col("n_total")),
                8,
            ).alias("cov"),
        )
    )


def pca_fit(
    embs: DataFrame, k: int, col: str = "embedding", fast: bool = False
) -> dict:
    """Fit PCA on the corpus: returns {mean, components, variances}
    as plain Python lists (bounded d / k×d / k driver data — the
    n_probe-centroids convention). Components are rows of V^T for the
    top-k eigenvalues, each sign-normalized so its largest-magnitude
    coordinate is positive (eigh's sign is otherwise arbitrary and
    would break determinism). ``fast=True`` swaps in the Arrow/numpy
    covariance pass (identical at the 8dp snap)."""
    import numpy as np

    cov_fn = embedding_covariance_fast if fast else embedding_covariance
    rows = cov_fn(embs, col).collect()
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
