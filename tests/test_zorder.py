"""Z-order layout (functions/layout.py): interleave correctness and the
file-skipping receipt — z-clustered files are tight in BOTH dimensions
where a one-column sort leaves the other dimension full-range."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from borsa_spark.functions.layout import (
    sql_zorder_key,
    zorder_key,
    zorder_layout,
)


class TestZorderKey:
    def test_interleave_matches_hand_computation(self, spark):
        # x=0b101 (bits at even positions), y=0b011 (odd positions):
        # z = 1*(1<<0) + 0*(1<<2) + 1*(1<<4) + 1*(1<<1) + 1*(1<<3)
        df = spark.createDataFrame([(5, 3)], "x long, y long")
        (z,) = df.select(
            zorder_key(["x", "y"], bits=3).alias("z")
        ).collect()[0]
        assert z == (1 << 0) + (1 << 4) + (1 << 1) + (1 << 3)

    def test_locality_both_dimensions(self, spark):
        # points close in (x, y) have closer z than points far in either
        df = spark.createDataFrame(
            [(10, 10), (11, 10), (10, 500), (500, 10)], "x long, y long"
        )
        zs = [
            r.z
            for r in df.select(
                zorder_key(["x", "y"], bits=10).alias("z")
            ).collect()
        ]
        near, far_y, far_x = abs(zs[1] - zs[0]), abs(zs[2] - zs[0]), abs(
            zs[3] - zs[0]
        )
        assert near < far_y and near < far_x

    def test_guards(self, spark):
        with pytest.raises(ValueError):
            zorder_key(["x"], bits=8)
        with pytest.raises(ValueError):
            zorder_key(["a", "b", "c", "d"], bits=16)  # 64 > 62

    def test_sql_mirror_matches_spark(self, spark):
        import duckdb

        rows = [(x, y) for x in (0, 1, 7, 100, 1023) for y in
                (0, 3, 64, 1023)]
        df = spark.createDataFrame(rows, "x long, y long")
        got = sorted(
            r.z for r in df.select(
                zorder_key(["x", "y"], bits=10).alias("z")
            ).collect()
        )
        con = duckdb.connect()
        expr = sql_zorder_key(["x", "y"], bits=10)
        want = sorted(
            v
            for (v,) in con.execute(
                f"SELECT {expr} FROM (VALUES "
                + ", ".join(f"({x}, {y})" for x, y in rows)
                + ") t(x, y)"
            ).fetchall()
        )
        assert got == want


class TestZorderLayoutReceipt:
    def test_zorder_file_skipping_receipt(self, spark, tmp_path):
        """Write the same 2-D uniform data (a) sorted by x alone and
        (b) z-ordered, 8 files each. Per-file min/max of y — what footer
        stats give a scan planner — must cover nearly the full axis in
        (a) and a small fraction in (b): the receipt that a y-filter
        skips most z-ordered files but no x-sorted ones."""
        n = 1 << 14
        df = (
            spark.range(n)
            .select(
                (F.col("id") % 128).alias("x"),
                ((F.col("id") * 2654435761) % 128).alias("y"),
            )
        )
        xs_path = str(tmp_path / "xsort")
        zs_path = str(tmp_path / "zsort")
        df.repartitionByRange(8, "x").sortWithinPartitions("x") \
            .write.parquet(xs_path)
        zorder_layout(df, ["x", "y"], n_files=8, bits=7) \
            .write.parquet(zs_path)

        def per_file_y_span(path):
            import glob

            spans = []
            for f in sorted(glob.glob(path + "/part-*.parquet")):
                row = spark.read.parquet(f).agg(
                    F.min("y"), F.max("y")
                ).collect()[0]
                spans.append((row[1] - row[0] + 1) / 128.0)
            return spans

        x_sorted = per_file_y_span(xs_path)
        z_ordered = per_file_y_span(zs_path)
        assert len(x_sorted) == len(z_ordered) == 8
        # x-sorted files see essentially the whole y axis...
        assert min(x_sorted) > 0.9
        # ...z-ordered files each cover a small y slice on average
        assert sum(z_ordered) / len(z_ordered) < 0.5
        assert min(z_ordered) <= 0.3


class TestCompaction:
    def test_binpacks_small_files_losslessly(self, spark, tmp_path):
        from borsa_spark.functions.layout import compact_parquet

        src, dst = str(tmp_path / "frag"), str(tmp_path / "tight")
        df = spark.range(20_000).select(
            F.col("id"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        df.repartition(32).write.parquet(src)
        r = compact_parquet(spark, src, dst, target_bytes=256 * 1024)
        assert r["files_before"] == 32
        assert r["rows"] == 20_000
        # target forces >1 bin, packing collapses far below 32
        assert 1 < r["files_after"] <= 8
        got = sorted(
            (x.id, x.payload) for x in spark.read.parquet(dst).collect()
        )
        want = sorted((x.id, x.payload) for x in df.collect())
        assert got == want

    def test_scan_bins_are_the_output_files_no_shuffle(
        self, spark, tmp_path
    ):
        import contextlib
        import io

        from borsa_spark.functions.layout import compact_parquet

        src, dst = str(tmp_path / "frag"), str(tmp_path / "tight")
        spark.range(5_000).repartition(16).write.parquet(src)
        r = compact_parquet(spark, src, dst, target_bytes=128 * 1024)
        # re-create the compaction read under the same pinned confs:
        # output file count must equal the scan's bin count (one file
        # per FilePartition -> the write added no exchange)
        saved = spark.conf.get("spark.sql.files.maxPartitionBytes")
        try:
            spark.conf.set(
                "spark.sql.files.maxPartitionBytes", str(128 * 1024)
            )
            spark.conf.set("spark.sql.files.openCostInBytes", "0")
            rd = spark.read.parquet(src)
            assert rd.rdd.getNumPartitions() == r["files_after"]
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                rd.explain("formatted")
            assert "Exchange" not in buf.getvalue()
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", saved)

    def test_restores_session_confs(self, spark, tmp_path):
        from borsa_spark.functions.layout import compact_parquet

        before = spark.conf.get("spark.sql.files.maxPartitionBytes")
        spark.range(100).repartition(4).write.parquet(
            str(tmp_path / "frag")
        )
        compact_parquet(
            spark, str(tmp_path / "frag"), str(tmp_path / "tight"),
            target_bytes=1024,
        )
        assert spark.conf.get(
            "spark.sql.files.maxPartitionBytes"
        ) == before
