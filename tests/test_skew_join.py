"""salted_join (operators/skew.py): row-identical to the plain join while
spreading hot probe keys across salt buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from borsa_spark.operators.skew import salted_join


def _frames(spark):
    # 'hot' carries 500 of 520 rows — the skew shape; plus null keys.
    rows = (
        [(i, "hot", float(i)) for i in range(500)]
        + [(1000 + i, f"k{i}", 1.0) for i in range(18)]
        + [(2000, None, 9.0), (2001, None, 8.0)]
    )
    big = spark.createDataFrame(rows, "id long, k string, v double")
    small = spark.createDataFrame(
        [("hot", "H"), ("k3", "A"), ("k7", "B"), ("absent", "Z")],
        "k string, tag string",
    )
    return big, small


def _as_set(df):
    return {tuple(r) for r in df.collect()}


class TestSaltedJoin:
    def test_inner_matches_plain_join(self, spark):
        big, small = _frames(spark)
        got = salted_join(big, small, ["k"], "inner", buckets=8)
        want = big.join(small, ["k"], "inner")
        assert _as_set(got.select("id", "k", "v", "tag")) == _as_set(
            want.select("id", "k", "v", "tag")
        )

    def test_left_matches_plain_join_including_nulls(self, spark):
        big, small = _frames(spark)
        got = salted_join(big, small, ["k"], "left", buckets=8)
        want = big.join(small, ["k"], "left")
        assert _as_set(got.select("id", "k", "v", "tag")) == _as_set(
            want.select("id", "k", "v", "tag")
        )
        # null-key rows survive exactly once with a null tag
        assert got.filter(F.col("k").isNull()).count() == 2

    def test_hot_key_spreads_over_buckets(self, spark):
        big, small = _frames(spark)
        n_buckets = (
            big.filter(F.col("k") == "hot")
            .withColumn(
                "__salt",
                F.pmod(F.hash(F.hash(F.col("id"), F.col("v"))), F.lit(8)),
            )
            .select("__salt")
            .distinct()
            .count()
        )
        assert n_buckets > 1  # the mitigation actually spreads

    def test_right_join_rejected(self, spark):
        big, small = _frames(spark)
        with pytest.raises(ValueError):
            salted_join(big, small, ["k"], "right")

    def test_multi_key(self, spark):
        big = spark.createDataFrame(
            [(1, "a", 1, 1.0), (2, "a", 2, 2.0), (3, "b", 1, 3.0)],
            "id long, k1 string, k2 int, v double",
        )
        small = spark.createDataFrame(
            [("a", 1, "X"), ("b", 1, "Y")], "k1 string, k2 int, tag string"
        )
        got = salted_join(big, small, ["k1", "k2"], "inner", buckets=4)
        want = big.join(small, ["k1", "k2"], "inner")
        assert _as_set(got.select("id", "tag")) == _as_set(
            want.select("id", "tag")
        )
