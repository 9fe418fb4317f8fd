"""Sequence packing: greedy binning of documents into fixed token-budget
training sequences — the sample-packing stage between a cleaned corpus and
a dataloader.

Packing is inherently order-dependent (a document that would overflow the
open bin CLOSES it and starts the next), which no associative aggregate or
window frame can express — this is the one corpus-prep stage that
legitimately needs `applyInPandas`. Scale comes from sharding, not from the
operator: documents are hash-partitioned into independent pack streams and
each stream packs sequentially inside one Arrow batch, so parallelism is
`n_streams` regardless of corpus size and no stream ever sees another's
rows. At 100 TB you raise `n_streams` (e.g. 2**14) so each stream holds a
few MB of (id, token-count) pairs — the packer only ever touches ids and
counts, never text.

Determinism: stream assignment and in-stream order both derive from the
portable md5 hash of the doc id (`text.hash_bucket` semantics), so the
packing is reproducible across runs, partitionings, and engines — the
DuckDB oracle replays the same greedy rule with a recursive CTE and must
match bin-for-bin.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from borsa_spark.functions.text import hash_bucket, token_count

#: output schema of pack_sequences
PACK_SCHEMA = (
    "doc_id long, stream_id long, bin_id long, n_tokens long"
)


def pack_sequences(
    df: DataFrame,
    budget: int = 256,
    n_streams: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy first-overflow-closes-bin packing into ``budget``-token bins.

    Rule (applied per stream, in md5-of-id order): keep a running token
    count; if adding the next document would exceed the budget and the open
    bin is non-empty, close it and start a new bin. A document longer than
    the budget gets a bin of its own (never split, never dropped — the
    caller decides whether to truncate oversized docs first).

    Returns (doc_id, stream_id, bin_id, n_tokens); bin_id is dense per
    stream starting at 0.
    """
    prepared = df.select(
        F.col(id_col).alias("doc_id"),
        hash_bucket(F.col(id_col), "packstream", n_streams).alias("stream_id"),
        F.md5(F.concat(F.lit("packorder:"), F.col(id_col).cast("string")))
            .alias("__ord"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__ord", "doc_id"], ignore_index=True)
        bins = []
        cur_bin, cur_tokens = 0, 0
        for n in pdf["n_tokens"]:
            if cur_tokens > 0 and cur_tokens + n > budget:
                cur_bin += 1
                cur_tokens = 0
            bins.append(cur_bin)
            cur_tokens += n
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf[["doc_id", "stream_id", "bin_id", "n_tokens"]]

    return prepared.groupBy("stream_id").applyInPandas(_pack, PACK_SCHEMA)


def sql_pack_sequences(
    budget: int = 256,
    n_streams: int = 8,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB SQL mirroring pack_sequences(): the greedy scan is a
    recursive CTE advancing one document per stream per iteration."""
    return f"""
    WITH RECURSIVE prepared AS (
      SELECT {id_col} AS doc_id,
             ('0x' || substr(md5('packstream:' || {id_col}::VARCHAR), 1, 15))
               ::BIGINT % {n_streams} AS stream_id,
             md5('packorder:' || {id_col}::VARCHAR) AS ord,
             len(string_split({text_col}, ' '))::BIGINT AS n_tokens
      FROM {table}),
    ordered AS (
      SELECT doc_id, stream_id, n_tokens,
             row_number() OVER (PARTITION BY stream_id
                                ORDER BY ord, doc_id) AS rn
      FROM prepared),
    pack AS (
      SELECT stream_id, rn, doc_id, n_tokens,
             0::BIGINT AS bin_id, n_tokens AS cur
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.stream_id, o.rn, o.doc_id, o.n_tokens,
             CASE WHEN p.cur > 0 AND p.cur + o.n_tokens > {budget}
                  THEN p.bin_id + 1 ELSE p.bin_id END,
             CASE WHEN p.cur > 0 AND p.cur + o.n_tokens > {budget}
                  THEN o.n_tokens ELSE p.cur + o.n_tokens END
      FROM pack p JOIN ordered o
        ON o.stream_id = p.stream_id AND o.rn = p.rn + 1)
    SELECT doc_id, stream_id, bin_id, n_tokens FROM pack
    """
