"""Text-analysis operators for large-scale training-data pipelines.

All column expressions are built-in pyspark.sql.functions — JVM-side,
whole-stage-codegen'd, no Python in the hot path. Each has an exact ANSI-SQL
equivalent (declared in borsa_spark.queries) so the DuckDB oracle can verify
it; at 100 TB these run as a single scan + narrow projection with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Small per-language stopword sets for the n-gram/stopword language
#: heuristic. Order matters: ties resolve to the earlier language.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "les", "et", "des", "une"),
    "zh": ("de", "shi", "le", "zai", "he"),
}

#: word-ish tokens: letter runs, digit runs, or single punctuation — a
#: BPE-ish pre-tokenizer shape expressible as one portable regex.
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"

PUNCT_CLASS = "[.,!?;:]"


def tokens(text: Column) -> Column:
    """Whitespace tokens (single-space split; empty tokens preserved so the
    count matches the SQL string_split exactly)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def regex_token_count(text: Column) -> Column:
    """Count of TOKEN_REGEX matches — the BPE-ish token estimate."""
    return F.regexp_count(F.lower(text), F.lit(TOKEN_REGEX))


def punct_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(PUNCT_CLASS))


def distinct_token_ratio(text: Column) -> Column:
    t = tokens(text)
    return F.size(F.array_distinct(t)) / F.size(t)


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    return F.size(
        F.filter(tokens(F.lower(text)), lambda t: t.isin(*STOPWORDS[lang]))
    )


def lang_guess(text: Column) -> Column:
    """Argmax of per-language stopword hits; ties go to the earlier language
    in STOPWORDS order. Deterministic, fully JVM-side."""
    hits = {lg: stopword_hits(text, lg) for lg in STOPWORDS}
    langs = list(STOPWORDS)
    expr = F.lit(langs[-1])
    for lg in reversed(langs[:-1]):
        cond = None
        for other in langs[langs.index(lg) + 1:]:
            c = hits[lg] >= hits[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lg)).otherwise(expr)
    return expr


def quality_score(text: Column, target_tokens: int = 50) -> Column:
    """Length-saturation × lexical-diversity score in [0, 1] — the classic
    cheap pretraining-quality heuristic (length + repetition)."""
    return F.round(
        F.least(F.lit(1.0), token_count(text) / F.lit(float(target_tokens)))
        * distinct_token_ratio(text),
        4,
    )


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the punctuation-stripped,
    lower-cased text. Stable across engines (md5 is bit-identical)."""
    return F.md5(F.regexp_replace(F.lower(text), "[^a-z0-9 ]", ""))


def sql_stopword_hits(text_sql: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(lower({text_sql}), ' '), "
        f"t -> t IN ({words})))"
    )


def sql_lang_guess(text_sql: str) -> str:
    """DuckDB SQL mirroring lang_guess()."""
    langs = list(STOPWORDS)
    hits = {lg: sql_stopword_hits(text_sql, lg) for lg in langs}
    case = f"'{langs[-1]}'"
    for lg in reversed(langs[:-1]):
        conds = " AND ".join(
            f"{hits[lg]} >= {hits[o]}" for o in langs[langs.index(lg) + 1:]
        )
        case = f"CASE WHEN {conds} THEN '{lg}' ELSE {case} END"
    return case


def hash_bucket(id_col: Column, salt: str, n_buckets: int = 10_000) -> Column:
    """Portable deterministic bucket: 60-bit md5 hash of "salt:id" mod
    n_buckets — stable across runs, partitionings, and engines (no rand(),
    no row-order dependence); re-salting gives an independent assignment.
    SQL equivalent (DuckDB):
    ``('0x' || substr(md5('salt:' || id::VARCHAR), 1, 15))::BIGINT % n``.
    """
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))), 1, 15
            ),
            16, 10,
        ).cast("long"),
        F.lit(n_buckets),
    )


def sql_hash_bucket(id_sql: str, salt: str, n_buckets: int = 10_000) -> str:
    """DuckDB SQL mirroring hash_bucket()."""
    return (
        f"('0x' || substr(md5('{salt}:' || ({id_sql})::VARCHAR), 1, 15))"
        f"::BIGINT % {n_buckets}"
    )


def split_assign(id_col: Column, weights: dict[str, float] | None = None,
                 salt: str = "split") -> Column:
    """Deterministic, engine-portable train/valid/test assignment.

    bucket = `hash_bucket` (portable 60-bit md5 mod 10_000); cut points
    from cumulative weights. The split a 100 TB pipeline can re-derive
    from the id alone without a membership table.
    """
    weights = weights or {"train": 0.9, "valid": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = hash_bucket(id_col, salt)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cut = int(round(acc * 10_000))
        cond = bucket < F.lit(cut)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    return (expr.otherwise(last) if expr is not None else F.lit(last))


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------

#: (tag, pattern) — patterns restricted to the regex subset Java
#: (Spark JVM) and RE2 (DuckDB) agree on: no backrefs, no lookaround.
PII_PATTERNS: list[tuple[str, str]] = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("SSN", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("PHONE", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("IPV4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII accounting + redaction: (doc_id, n_email, n_ssn,
    n_phone, n_ipv4, redacted_hash). Detection is `regexp_count` per
    pattern; redaction replaces each match with `[TAG]` — applied in
    PII_PATTERNS order, so SSN/PHONE run on email-redacted text (an email
    local part can contain digit runs; ordering is part of the contract).
    The hash of the redacted text is emitted instead of the text itself:
    the gate checks the transform without shipping a second copy of the
    corpus through the comparator.

    All JVM-side regex at scan speed — the 100 TB shape. A clean corpus
    yields all-zero counts and redacted_hash == md5(text); behavior on
    dirty text is pinned by tests/test_retrieval_pii.py on constructed
    rows (this fixture corpus contains no PII, production corpora do).
    """
    t = F.col(text_col)
    # Column-valued patterns (not F.expr / SQL literals): Spark SQL string
    # literals eat backslashes, the Python API passes the regex verbatim.
    counts = [
        F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{tag.lower()}")
        for tag, pat in PII_PATTERNS
    ]
    red = t
    for tag, pat in PII_PATTERNS:
        red = F.regexp_replace(red, pat, f"[{tag}]")
    return docs.select("doc_id", *counts, F.md5(red).alias("redacted_hash"))


def sql_pii_scrub(text_sql: str = "text") -> str:
    """DuckDB oracle mirroring pii_scrub (same patterns, same order)."""
    counts = ", ".join(
        f"len(regexp_extract_all({text_sql}, '{pat}'))::BIGINT AS n_{tag.lower()}"
        for tag, pat in PII_PATTERNS
    )
    red = text_sql
    for tag, pat in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '[{tag}]', 'g')"
    return f"SELECT doc_id, {counts}, md5({red}) AS redacted_hash FROM documents"
