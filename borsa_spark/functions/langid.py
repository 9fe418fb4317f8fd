"""Trained character-n-gram language identification.

`text.lang_guess` (f4) is the zero-training stopword-argmax heuristic;
real crawl pipelines train a character-n-gram model instead (the
public fastText/langid.py lineage — McCandless's langid and Joulin et
al. 2016 both reduce to linear models over char-n-gram counts, and the
closed-form count version is multinomial Naive Bayes, Manning IR
§13.2). This module fits that NB model IN the engine on a labeled
split and scores every document:

    p(lang | doc) ∝ p(lang) · Π_bg p(bg | lang)^tf(doc, bg)
    p(bg | lang) = (c(lang, bg) + 1) / (tot(lang) + V)   (add-1)

with char bigrams, prior = train-doc share, V = distinct train
bigrams. Everything is counts — no iteration — so the DuckDB oracle
replays the identical closed form (`sql_charngram_nb_langid`).

Portability: per-(doc, lang) scores are snapped to ``snap`` decimals
before the argmax and ties break on ascending label, so cross-engine
float-summation-order drift (~1e-13 on a few-hundred-term ln sum)
cannot flip a prediction (the `functions/classifier.py` convention).

Scale shape: ONE corpus scan builds the per-(doc, bigram) tf relation;
the model is bounded by charset² × n_langs (a few thousand rows —
broadcast everywhere it appears); scoring is tf × (tiny label panel)
with a doc_id-keyed final aggregation and a 5-rows-per-doc window for
the argmax. Nothing scales with corpus size except the tf relation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _char_bigrams(text_col: str) -> Column:
    """All overlapping 2-char substrings, 1-based — identical to
    DuckDB's list_transform(range(1, length(t)), i -> substr(t, i, 2))
    on the ASCII corpora this runs over."""
    return F.expr(
        f"transform(sequence(1, length({text_col}) - 1),"
        f" i -> substring({text_col}, i, 2))"
    )


def charngram_nb_langid(
    docs: DataFrame,
    train: Column,
    label_col: str = "lang",
    text_col: str = "text",
    snap: int = 4,
) -> DataFrame:
    """Fit char-bigram multinomial NB on rows where ``train`` holds,
    score EVERY document (>= 2 chars of text): (doc_id, <label_col>,
    pred). Callers filter to the holdout for accuracy measurement.

    The whole train+score DAG is LAZY (runtime exchange reuse keeps it
    at one corpus scan PER ACTION — see the body comment): a caller
    firing several actions on the result re-trains per action and
    should persist the returned frame first."""
    base = docs.select(
        "doc_id",
        F.col(label_col),
        F.col(text_col).alias("__t"),
        train.alias("__tr"),
    ).filter(F.length("__t") >= 2)
    # ONE corpus scan AT RUNTIME — the f74/f78 de-canonicalization
    # lesson applied here (round 9): train-side quantities are
    # CONDITIONAL SUMS over the shared per-(doc, label, flag, bigram)
    # tf exchange, never a `filter("__tr")` — a pushed-down train
    # filter specializes each consumer's scan (the naive form ran
    # SEVEN real corpus scans, zero ReusedExchange, final-plan
    # verified), while the conditional form keeps every consumer on
    # the IDENTICAL exchange so AQE's ReusedExchange executes the
    # scan+explode once. Two alternatives were measured and rejected
    # this round: persisting tf (per-(doc, bigram) rows are ~10x the
    # raw text bytes — 2.7x slower) and eagerly checkpointing the
    # model (train-then-score, 3 scans — strictly worse than reuse's
    # 1). Zero-count (__c = 0) model rows are numerically inert: the
    # scoring join coalesces missing and 0 to the same +1 smoothing,
    # and tot gains 0; labels/vocab read the __c > 0 subset (a
    # post-aggregation filter, which cannot push below the exchange).
    tf = base.select(
        "doc_id", label_col, "__tr",
        F.explode(_char_bigrams("__t")).alias("__bg"),
    ).groupBy("doc_id", label_col, "__tr", "__bg").agg(
        F.count("*").alias("__tf")
    )
    counts = tf.groupBy(F.col(label_col).alias("__ml"), "__bg").agg(
        F.sum(
            F.when(F.col("__tr"), F.col("__tf")).otherwise(F.lit(0))
        ).alias("__c")
    )
    trained = counts.filter(F.col("__c") > 0)
    labels = trained.select("__ml").distinct()
    tot = counts.groupBy("__ml").agg(F.sum("__c").alias("__tot"))
    vocab = trained.agg(F.countDistinct("__bg").alias("__v"))
    # doc counts from the PRE-explode base (a light no-bigram scan):
    # deriving them from tf would add a third column-pruning variant
    # of the explode subtree (Catalyst prunes per consumer, and
    # differently-pruned exchanges cannot reuse). nd's own exchange
    # is shared by the scoring join and the ntr total.
    nd = (
        base.filter("__tr")
        .groupBy(F.col(label_col).alias("__ml"))
        .agg(F.count("*").alias("__nd"))
    )
    ntr = nd.agg(F.sum("__nd").alias("__n"))
    scores = (
        tf.crossJoin(F.broadcast(labels))
        .join(F.broadcast(counts), ["__ml", "__bg"], "left")
        .join(F.broadcast(tot), "__ml")
        .join(F.broadcast(nd), "__ml")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(ntr))
        .groupBy("doc_id", label_col, "__ml")
        .agg(
            F.round(
                F.sum(
                    F.col("__tf")
                    * F.log(
                        (F.coalesce(F.col("__c"), F.lit(0)) + 1.0)
                        / (F.col("__tot") + F.col("__v"))
                    )
                )
                + F.first(F.log(F.col("__nd") / F.col("__n"))),
                snap,
            ).alias("__score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("__score").desc(), F.col("__ml").asc()
    )
    return (
        scores.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", label_col, F.col("__ml").alias("pred"))
    )


#: f85 fixture pools: 5 stopwords (matching text.STOPWORDS, so the f4
#: heuristic plays on home turf) + 3 language-distinctive words per
#: language. ASCII only (engine string semantics identical). Mode-0
#: docs draw ONLY from the distinctive tail — zero stopword hits, so
#: the f4 argmax degenerates to its all-tie default ('en') while the
#: char-bigram NB still sees each language's character signature.
LANG_POOLS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "quick", "brown", "jumps"),
    "es": ("el", "la", "de", "que", "y", "perro", "casa", "verde"),
    "de": ("der", "die", "und", "das", "ist", "haus", "berg", "blau"),
    "fr": ("le", "les", "et", "des", "une", "chien", "maison", "ville"),
    "zh": ("de", "shi", "le", "zai", "he", "ma", "wo", "ni"),
}

_IDX_CASE = (
    "case when ({div5}) % 3 = 0"
    " then 6 + (doc_id + 2*i) % 3"
    " else 1 + (doc_id*7 + 3*i) % 8 end"
)


def langid_fixture_spark_sql() -> list[str]:
    """Spark SQL expressions (two selectExpr items over `documents`)
    yielding the deterministic (lang, text) fixture from doc_id —
    12 words from the doc's language pool, word indices analytic."""
    langs = list(LANG_POOLS)
    pools = "array(" + ", ".join(
        "array(" + ", ".join(f"'{w}'" for w in LANG_POOLS[lg]) + ")"
        for lg in langs
    ) + ")"
    lang_arr = "array(" + ", ".join(f"'{lg}'" for lg in langs) + ")"
    idx = _IDX_CASE.format(div5="doc_id div 5")
    return [
        f"element_at({lang_arr}, cast(doc_id % 5 + 1 as int)) as lang",
        f"array_join(transform(sequence(1, 12), i -> "
        f"element_at(element_at({pools}, cast(doc_id % 5 + 1 as int)), "
        f"cast({idx} as int))), ' ') as text",
    ]


def langid_fixture_duckdb_sql(table: str = "documents") -> str:
    """DuckDB CTE body producing the IDENTICAL (doc_id, lang, text)."""
    langs = list(LANG_POOLS)
    pools = "[" + ", ".join(
        "[" + ", ".join(f"'{w}'" for w in LANG_POOLS[lg]) + "]"
        for lg in langs
    ) + "]"
    lang_arr = "[" + ", ".join(f"'{lg}'" for lg in langs) + "]"
    idx = _IDX_CASE.format(div5="doc_id // 5")
    return (
        f"SELECT doc_id, {lang_arr}[(doc_id % 5 + 1)::INT] AS lang, "
        f"array_to_string(list_transform(range(1, 13), i -> "
        f"{pools}[(doc_id % 5 + 1)::INT][({idx})::INT]), ' ') AS text "
        f"FROM {table}"
    )


def sql_charngram_nb_langid(
    docs_sql: str, train_sql: str, snap: int = 4,
    out_where: str | None = None,
) -> str:
    """DuckDB oracle mirroring `charngram_nb_langid`: ``docs_sql`` must
    yield (doc_id, lang, text); ``train_sql`` is the split predicate
    over those columns; ``out_where`` optionally restricts the scored
    output (e.g. to the holdout). Count-closed-form — no iteration to
    unroll."""
    return f"""
    WITH docs AS ({docs_sql}),
    base AS (
      SELECT doc_id, lang, text, ({train_sql}) AS tr
      FROM docs WHERE length(text) >= 2),
    toks AS (
      SELECT doc_id, lang, tr,
             unnest(list_transform(range(1, length(text)),
                    i -> substr(text, i::INT, 2))) AS bg
      FROM base),
    tf AS (
      SELECT doc_id, lang, tr, bg, count(*) AS tf
      FROM toks GROUP BY 1, 2, 3, 4),
    counts AS (
      SELECT lang AS ml, bg, sum(tf) AS c
      FROM tf WHERE tr GROUP BY 1, 2),
    labels AS (SELECT DISTINCT ml FROM counts),
    tot AS (SELECT ml, sum(c) AS tot FROM counts GROUP BY 1),
    vocab AS (SELECT count(DISTINCT bg) AS v FROM counts),
    nd AS (SELECT lang AS ml, count(*) AS ndl FROM base WHERE tr
           GROUP BY 1),
    ntr AS (SELECT count(*) AS n FROM base WHERE tr),
    scores AS (
      SELECT tf.doc_id, tf.lang, labels.ml,
             round(sum(tf.tf * ln((coalesce(c.c, 0) + 1.0)
                                  / (t.tot + v.v)))
                   + ln(nd.ndl * 1.0 / ntr.n), {snap}) AS score
      FROM tf CROSS JOIN labels
      LEFT JOIN counts c ON c.ml = labels.ml AND c.bg = tf.bg
      JOIN tot t ON t.ml = labels.ml
      JOIN nd ON nd.ml = labels.ml
      CROSS JOIN vocab v CROSS JOIN ntr
      GROUP BY tf.doc_id, tf.lang, labels.ml, nd.ndl, ntr.n)
    SELECT doc_id, lang, ml AS pred FROM scores
    {f"WHERE {out_where}" if out_where else ""}
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, ml ASC) = 1
    """
