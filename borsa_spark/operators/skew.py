"""Skew-resilient two-phase ("salted") aggregation.

The scale problem: a groupBy over a key with a few hot values (one symbol
carrying half the ticks, one boilerplate doc hash) funnels the hot key's
entire input through a single reducer task. AQE's skew handling
(``spark.sql.adaptive``) splits skewed *joins*, and map-side partial
aggregation already bounds shuffle volume to one row per (mapper, key) —
but when the DISTINCT VALUE COUNT per hot key is huge (e.g. collecting
per-key distincts or high-cardinality sub-aggregations), the final reduce
still concentrates on one task.

Salting fixes the reduce: phase 1 groups by (key, salt) with salt =
pmod(hash(row-identity), buckets), spreading each hot key over ``buckets``
reducers; phase 2 re-aggregates the per-salt partials by key. Correct for
ALGEBRAIC aggregates — ones with a partial/merge decomposition: sum, count,
min, max, and anything built from them (avg = sum/count). NOT valid for
holistic aggregates (median, exact distinct) — use approx variants there.

This is the explicit, composable form of what the resample/merge pipelines
get implicitly from min_by partial aggregation; reach for it when profiling
shows a straggling final-aggregation task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (phase-1 partial, phase-2 merge) per supported algebraic aggregate.
_MERGES = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    buckets: int = 32,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output column -> (fn, input)
    with fn in {sum, count, min, max, avg}.

    ``salt_on`` is the expression hashed into the salt. The default hashes
    ALL non-key columns together (full row identity): hashing any single
    value column is a trap — a hot key whose value column is constant (one
    symbol repeating the same price) would salt into ONE bucket and the
    mitigation would silently do nothing. The remaining caveat of the
    default: rows that are EXACT duplicates across every non-key column
    still share a salt; pass an explicit unique column (event id, seq) for
    a guaranteed spread on duplicate-heavy data.

    Example::

        salted_agg(ticks, ["symbol"],
                   {"n": ("count", "*"), "vol": ("sum", "volume"),
                    "hi": ("max", "price")},
                   buckets=64, salt_on=F.col("seq"))
    """
    if salt_on is None:
        non_key = [c for c in df.columns if c not in keys]
        if not non_key:
            raise ValueError("salt_on required when df has only key columns")
        salt_on = F.hash(*[F.col(c) for c in non_key])
    salted = df.withColumn("__salt", F.pmod(F.hash(salt_on), F.lit(buckets)))

    partial_exprs: list[Column] = []
    merge_exprs: list[Column] = []
    avg_parts: list[str] = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            partial_exprs.append(
                (F.count("*") if col == "*" else F.count(col)).alias(f"__p_{out}")
            )
            merge_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "avg":
            partial_exprs.append(F.sum(col).alias(f"__ps_{out}"))
            partial_exprs.append(F.count(col).alias(f"__pc_{out}"))
            avg_parts.append(out)
        elif fn in _MERGES:
            partial_exprs.append(_MERGES[fn](col).alias(f"__p_{out}"))
            merge_exprs.append(_MERGES[fn](f"__p_{out}").alias(out))
        else:
            raise ValueError(
                f"{fn!r} is not algebraic-decomposable here; supported: "
                "sum, count, min, max, avg"
            )
    for out in avg_parts:
        merge_exprs.append(
            (F.sum(f"__ps_{out}") / F.sum(f"__pc_{out}")).alias(out)
        )

    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*merge_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    buckets: int = 16,
    salt_on: Column | None = None,
) -> DataFrame:
    """Skew-resilient equi-join: salt the BIG side, replicate the SMALL
    side ``buckets`` ways, join on (keys + salt). Result is row-identical
    to ``big.join(small, on, how)`` for how in {inner, left} — the salt
    spreads each hot key's probe rows over ``buckets`` reducer tasks
    instead of funnelling them through one.

    When to reach for this instead of trusting AQE's skew-join split:
    AQE splits oversized SHUFFLE PARTITIONS of sort-merge joins at runtime,
    which covers most cases — but it cannot help when the skewed join
    feeds directly into an aggregation that Catalyst co-partitions with
    the join (split partitions must be re-coalesced), when the build side
    is replicated anyway (broadcast is off the table because the small
    side is 100s of MB), or when a deterministic plan is required (AQE
    re-plans per run). Salting is the static, predictable form.

    ``how='left'`` is supported because an unmatched big-side row is
    unmatched in every salt bucket exactly once (its own). Right/full
    joins would duplicate small-side unmatched rows per bucket — rejected
    loudly rather than silently wrong.

    NULL join keys never match; with ``how='left'`` they are routed
    AROUND the join entirely (the classic null-skew fix: a null-heavy key
    column otherwise concentrates every null row in one reducer).

    ``salt_on`` defaults to full-row hash of the big side's non-key
    columns (same trap-avoidance as `salted_agg`).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, not {how!r}: right/full "
            "would replicate unmatched small-side rows per bucket"
        )
    if salt_on is None:
        non_key = [c for c in big.columns if c not in on]
        if not non_key:
            raise ValueError("salt_on required when big has only key columns")
        salt_on = F.hash(*[F.col(c) for c in non_key])

    null_pred = None
    for k in on:
        p = F.col(k).isNull()
        null_pred = p if null_pred is None else (null_pred | p)

    big_nn = big.filter(~null_pred) if null_pred is not None else big
    salted_big = big_nn.withColumn(
        "__salt", F.pmod(F.hash(salt_on), F.lit(buckets))
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    joined = salted_big.join(replicated, [*on, "__salt"], how).drop("__salt")

    if how == "left" and null_pred is not None:
        nulls = big.filter(null_pred)
        extra = [c for c in joined.columns if c not in big.columns]
        for c in extra:
            nulls = nulls.withColumn(c, F.lit(None).cast(dict(joined.dtypes)[c]))
        joined = joined.unionByName(nulls.select(joined.columns))
    return joined
