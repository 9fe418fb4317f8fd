"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional file skipping.

Why it's here: at 100 TB the scan is the query. Min/max footer stats
prune files only along dimensions the layout clusters; sorting by one
column gives perfect pruning on it and NONE on the others. Interleaving
the bits of several bucketized dimensions (the Morton curve — the same
idea behind Delta/Iceberg OPTIMIZE ZORDER) gives every interleaved
dimension locality, so a filter on ANY of them skips most files. The
z-value is plain integer bit math, fully inside whole-stage codegen,
and `repartitionByRange` over it is one shuffle that replaces the
one-dimensional sort a naive layout would pay anyway.

`zorder_key` is deliberately exact/deterministic (no sampling): the
same inputs produce the same key on any engine, which is what lets the
oracle replay the interleave bit-for-bit in SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
    open_cost_bytes: int = 0,
) -> dict:
    """Small-file compaction (the Delta/Iceberg OPTIMIZE bin-packing
    counterpart to `zorder_layout`'s clustering): rewrite a fragmented
    parquet table into ~``target_bytes`` files with ZERO shuffle.

    At 100 TB the failure mode this fixes is real: streaming ingest and
    fine-grained partitioning leave millions of KB-sized files, and
    every downstream scan pays per-file open cost + a task per file.
    The Spark-first trick is that the engine already contains the
    bin-packer — FilePartition packing assigns small files first-fit
    into ~``spark.sql.files.maxPartitionBytes`` splits at scan time.
    Pinning that conf to the compaction target and writing the scan
    back out emits ONE file per bin: no shuffle, no sort, no data
    movement beyond the rewrite itself, and each task's work is capped
    by ``target_bytes`` regardless of how many source files exist.

    ``open_cost_bytes`` is Spark's per-file padding during packing
    (default 4 MiB would cap bins at ~32 tiny files each); 0 packs
    purely by real bytes.  Returns receipts:
    ``{"files_before", "files_after", "rows"}`` — file counts measured
    engine-side via input_file_name so they are cluster-valid, not a
    driver-local listing.
    """
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.files.maxPartitionBytes",
            "spark.sql.files.openCostInBytes",
        )
    }
    before = (
        spark.read.parquet(src)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    try:
        conf.set("spark.sql.files.maxPartitionBytes", str(target_bytes))
        conf.set("spark.sql.files.openCostInBytes", str(open_cost_bytes))
        df = spark.read.parquet(src)
        df.write.mode("overwrite").parquet(dst)
    finally:
        for k, v in saved.items():
            conf.set(k, v)
    out = spark.read.parquet(dst)
    after = out.select(F.input_file_name().alias("f")).distinct().count()
    return {
        "files_before": before,
        "files_after": after,
        "rows": out.count(),
    }


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton interleave of ``len(cols)`` already-bucketized NON-NEGATIVE
    integer columns, ``bits`` bits each -> one long. Bit j of column i
    lands at position j * k + i, so the low bits of every dimension
    alternate — close z-values are close in EVERY dimension.

    Callers bucketize first (e.g. ``F.least(F.floor(x), lit(2**bits-1))``);
    this function is pure bit math so the oracle can replay it. k * bits
    must fit a signed long (<= 62)."""
    k = len(cols)
    if k < 2:
        raise ValueError("zorder_key needs at least 2 columns")
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits overflows a long")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    z: Column | None = None
    for i, c in enumerate(cs):
        c = c.cast("long")
        for j in range(bits):
            term = F.shiftleft(
                F.shiftright(c, j).bitwiseAND(F.lit(1)), j * k + i
            )
            z = term if z is None else z + term  # disjoint bits: + == OR
    return z


def sql_zorder_key(exprs: list[str], bits: int = 16) -> str:
    """The DuckDB mirror of `zorder_key`: one unrolled integer
    expression over the given (already-bucketized) SQL expressions."""
    k = len(exprs)
    terms = []
    for i, e in enumerate(exprs):
        for j in range(bits):
            # every term fully parenthesized: SQL gives + tighter
            # precedence than <<, so `a << 1 + b << 3` would associate
            # as `a << (1 + b) << 3`
            terms.append(f"(((({e}) >> {j}) & 1) << {j * k + i})")
    return " + ".join(terms)


def zorder_layout(
    df: DataFrame, cols: list[Column | str], n_files: int, bits: int = 16
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition by the z-key into
    ``n_files`` partitions (one output file each under a plain
    ``.write``), key dropped afterwards. One shuffle — the same price as
    sorting by any single column, but every interleaved dimension gets
    min/max-stat locality."""
    key = zorder_key(cols, bits)
    return (
        df.withColumn("__z", key)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
