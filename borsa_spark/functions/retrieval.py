"""Retrieval-side corpus operators: sliding-window chunking, an inverted
index, and BM25 scoring — the ops that turn a cleaned corpus into the
structures a RAG / search / eval pipeline consumes.

All three are declarative DataFrame programs over the whitespace-token
convention shared with functions/text.py (``split(text, ' ')`` ==
DuckDB ``string_split``), so every one is oracle-checkable and stays
JVM-side: the only Python here is plan construction.

Scale shapes (100 TB corpus):
- ``doc_chunks`` is IN-ROW arithmetic + one explode — no shuffle at all;
  chunk rows stream out of the scan partition that produced the document.
  Emits a hash per chunk, not the chunk text, so downstream dedup/shuffle
  moves 8-byte-ish keys (same discipline as the shingle pipeline).
- ``inverted_index`` is one explode + a map-side-combinable stats groupBy
  + a WindowGroupLimit-capped postings branch. Postings are CAPPED (top-N
  doc ids) BELOW the shuffle with the true df/cf kept alongside — a full
  postings list for a stop word would be a single hot row of unbounded
  size; the cap is explicit, never silent, and never buffered.
- ``bm25_topk`` broadcasts the query panel (a handful of rows) against
  the exploded term stream, so the only real shuffle is the per-(query,
  doc) tf aggregation; corpus stats (N, avgdl) ride in as a broadcast
  1-row cross join computed once.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SEP = " "


def _toks(col: str = "text"):
    return F.split(F.col(col), TOKEN_SEP)


def doc_chunks(
    docs: DataFrame, window: int = 64, stride: int = 48
) -> DataFrame:
    """Sliding-window chunking: (doc_id, chunk_idx, start_tok, n_tokens,
    chunk_hash) with ``window``-token chunks every ``stride`` tokens.
    The last chunk is the tail remainder (shorter than ``window``); a doc
    shorter than one window is exactly one chunk. chunk count =
    1 + ceil((n - window) / stride) for n > window.

    Everything is in-row: split, a `sequence` of chunk starts, one
    explode, `slice`, `md5(array_join(...))`. No shuffle, no Python.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    n = F.size(_toks())
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.ceil((n - window) / F.lit(float(stride))).cast("long") + 1
    )
    out = docs.select(
        "doc_id",
        _toks().alias("__toks"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_idx"
        ),
    )
    chunk = F.expr(f"slice(__toks, chunk_idx * {stride} + 1, {window})")
    return out.select(
        "doc_id",
        "chunk_idx",
        (F.col("chunk_idx") * stride).cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.array_join(chunk, TOKEN_SEP)).alias("chunk_hash"),
    )


def sql_doc_chunks(window: int = 64, stride: int = 48) -> str:
    """DuckDB oracle for doc_chunks (same chunk math, list slicing)."""
    return f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents),
    m AS (
      SELECT doc_id, toks,
             CASE WHEN n <= {window} THEN 1
                  ELSE cast(ceil((n - {window}) / {stride}.0) AS BIGINT) + 1
             END AS n_chunks
      FROM t),
    e AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
      FROM m)
    SELECT doc_id, chunk_idx,
           (chunk_idx * {stride})::BIGINT AS start_tok,
           len(toks[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {window}])::BIGINT
             AS n_tokens,
           md5(array_to_string(
             toks[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {window}], ' '))
             AS chunk_hash
    FROM e
    """


def inverted_index(docs: DataFrame, postings_cap: int = 20) -> DataFrame:
    """Postings per term: (term, df, cf, postings) where df = documents
    containing the term, cf = total occurrences, postings = the first
    ``postings_cap`` doc_ids (ascending) comma-joined. df/cf are the TRUE
    totals — only the materialized posting sample is capped, so a stop
    word cannot blow up a single row (loud cap: df tells the reader how
    much was elided).

    Scale shape: df/cf come from a plain map-side-combinable groupBy
    (constant-size buffers). The postings sample is capped BEFORE any
    aggregation buffer exists: ``row_number() OVER (PARTITION BY term
    ORDER BY doc_id) <= cap`` — Spark plans that filter as a
    WindowGroupLimit, truncating each term's group to ``cap`` rows
    map-side, below the shuffle. A stop word's postings therefore never
    materialize anywhere: not in the agg buffer (the pre-fix shape built
    the FULL list in `collect_list` before `slice` capped it) and not in
    the window sort. The final stats⋈postings join is vocab-keyed on both
    sides, both already hashed by term."""
    if postings_cap < 1:
        # rn <= 0 would empty the postings branch and the inner join
        # would then drop every stats row — reject loudly instead.
        raise ValueError(f"postings_cap must be >= 1, got {postings_cap}")
    tf = (
        docs.select("doc_id", F.explode(_toks()).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    stats = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )
    rn = F.row_number().over(Window.partitionBy("term").orderBy("doc_id"))
    postings = (
        tf.select("term", "doc_id")
        .withColumn("__rn", rn)
        .filter(F.col("__rn") <= postings_cap)
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
    )
    return stats.join(postings, "term")


def sql_inverted_index(postings_cap: int = 20) -> str:
    return f"""
    WITH tf AS (
      SELECT unnest(string_split(text, ' ')) AS term, doc_id
      FROM documents),
    per_doc AS (
      SELECT term, doc_id, count(*) AS tf FROM tf GROUP BY term, doc_id)
    SELECT term,
           count(*)::BIGINT AS df,
           sum(tf)::BIGINT AS cf,
           array_to_string(list_sort(list(doc_id))[1:{postings_cap}], ',')
             AS postings
    FROM per_doc GROUP BY term
    """


#: Fixed evaluation panel: (query_id, term). Multi-term queries over the
#: corpus vocabulary — tiny by construction, always broadcast.
BM25_PANEL: list[tuple[int, str]] = [
    (1, "spark"), (1, "join"),
    (2, "window"), (2, "merge"), (2, "sort"),
    (3, "hash"), (3, "scan"),
    (4, "stream"), (4, "batch"), (4, "vector"),
]


def bm25_topk(
    docs: DataFrame,
    panel: list[tuple[int, str]] | None = None,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    persist_tf: bool = True,
) -> DataFrame:
    """BM25 top-``k`` docs per panel query: (query_id, rank, doc_id,
    score). Standard Robertson/Sparck-Jones BM25:

        idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)
        s(q, d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Plan: corpus stats (N, avgdl) are one aggregated row cross-joined
    (broadcast) onto the scores; the panel is a broadcast join against the
    exploded term stream, so only the (query, doc) tf groupBy shuffles.
    Rank is deterministic: (score desc, doc_id asc) with globally-unique
    doc_id as the tiebreak.
    """
    spark = docs.sparkSession
    panel = panel if panel is not None else BM25_PANEL
    pdf = spark.createDataFrame(panel, "query_id long, term string")
    toks = docs.select(
        "doc_id", F.size(_toks()).alias("dl"), F.explode(_toks()).alias("term")
    )
    # tf for panel terms only: the broadcast semi-filter prunes the term
    # stream before the shuffle.
    tf = (
        toks.join(F.broadcast(pdf.select("term").distinct()), "term")
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    # Two consumers (df_t build side + the score join) and no
    # ReusedExchange across them: persist the panel-hit aggregate so the
    # corpus explode runs once. Bounded: <= |panel terms| x docs
    # containing them. The bench/oracle harnesses clearCache() per query;
    # long-lived library sessions pass persist_tf=False or manage the
    # cache themselves.
    if persist_tf:
        tf = tf.persist()
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    stats = docs.select(
        F.count("*").alias("n_docs"),
        F.avg(F.size(_toks())).alias("avgdl"),
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(pdf), "term")
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "doc_id",
            F.round("score", 4).alias("score"),
        )
    )


def sql_bm25_topk(
    panel: list[tuple[int, str]] | None = None,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    panel = panel if panel is not None else BM25_PANEL
    values = ", ".join(f"({q}, '{t}')" for q, t in panel)
    return f"""
    WITH panel(query_id, term) AS (VALUES {values}),
    toks AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl,
             unnest(string_split(text, ' ')) AS term
      FROM documents),
    tf AS (
      SELECT term, doc_id, count(*) AS tf, min(dl) AS dl
      FROM toks WHERE term IN (SELECT DISTINCT term FROM panel)
      GROUP BY term, doc_id),
    df_t AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    stats AS (
      SELECT count(*) AS n_docs, avg(len(string_split(text, ' '))) AS avgdl
      FROM documents),
    scored AS (
      SELECT p.query_id, tf.doc_id,
             sum(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                 * (tf.tf * ({k1} + 1))
                 / (tf.tf + {k1} * (1 - {b} + {b} * tf.dl / s.avgdl)))
               AS score
      FROM tf JOIN df_t d USING (term)
              JOIN panel p USING (term)
              CROSS JOIN stats s
      GROUP BY p.query_id, tf.doc_id),
    ranked AS (
      SELECT query_id, doc_id, score,
             row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
      FROM scored)
    SELECT query_id, rank::BIGINT AS rank, doc_id, round(score, 4) AS score
    FROM ranked WHERE rank <= {k}
    """


def boilerplate_fraction(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    min_df: int = 2,
) -> DataFrame:
    """Per-document boilerplate share (the RefinedWeb/C4 line-dedup stage
    at chunk granularity): a chunk whose hash appears in >= ``min_df``
    DISTINCT documents is boilerplate (navigation, legal footers, site
    templates); each document reports how much of it is made of such
    chunks. Downstream either drops high-fraction docs or strips the
    flagged chunks.

    Scale shape: chunks come from the zero-shuffle in-row chunker; the
    document-frequency table groups 16-byte chunk hashes (map-side
    combinable, shuffles hashes not text), the flag joins back on the
    hash, and the per-doc rollup keys on doc_id. Three hash-keyed
    shuffles, none carrying text — at corpus scale the df table is also
    the natural place to cap (a hash shared by millions of docs is
    boilerplate at ANY df; the groupBy stays bounded because the value
    is just a count).
    """
    ch = doc_chunks(docs, window, stride).select("doc_id", "chunk_hash")
    df_tab = ch.groupBy("chunk_hash").agg(
        F.countDistinct("doc_id").alias("__df")
    )
    flagged = ch.join(df_tab, "chunk_hash").withColumn(
        "__boiler", (F.col("__df") >= min_df).cast("int")
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("__boiler").cast("long").alias("n_boilerplate"),
        )
        .withColumn(
            "boiler_frac",
            F.round(F.col("n_boilerplate") / F.col("n_chunks"), 4),
        )
    )


def sql_boilerplate_fraction(
    window: int = 64, stride: int = 48, min_df: int = 2
) -> str:
    """DuckDB oracle for boilerplate_fraction (over the f44 chunk CTE)."""
    return f"""
    WITH ch AS ({sql_doc_chunks(window, stride)}),
    dfs AS (
      SELECT chunk_hash, count(DISTINCT doc_id) AS df
      FROM ch GROUP BY chunk_hash)
    SELECT ch.doc_id,
           count(*)::BIGINT AS n_chunks,
           sum(CASE WHEN dfs.df >= {min_df} THEN 1 ELSE 0 END)::BIGINT
             AS n_boilerplate,
           round(sum(CASE WHEN dfs.df >= {min_df} THEN 1 ELSE 0 END)
                 / count(*)::DOUBLE, 4) AS boiler_frac
    FROM ch JOIN dfs USING (chunk_hash)
    GROUP BY ch.doc_id
    """


__all__ = [
    "BM25_PANEL",
    "bm25_topk",
    "boilerplate_fraction",
    "doc_chunks",
    "inverted_index",
    "sql_bm25_topk",
    "sql_boilerplate_fraction",
    "sql_doc_chunks",
    "sql_inverted_index",
]


def _self_check() -> None:  # pragma: no cover - dev aid
    assert math.isclose(
        math.log((500 - 10 + 0.5) / (10 + 0.5) + 1), 3.8385, rel_tol=1e-3
    )
