"""Salting correctness tests (SCALE.md §3): salted ops must equal
their plain equivalents row-for-row, with the hot key spread across
(key, salt) groups in the partial phase."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventstreams_spark.operators.skew import salted_agg, salted_join


def _skewed_df(spark):
    # 10k rows for the hot key, a handful for the rest
    hot = spark.range(10_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(50).select(
        F.concat(F.lit("c"), (F.col("id") % 5)).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionAll(cold)


def test_salted_agg_matches_plain(spark):
    df = _skewed_df(spark)
    got = salted_agg(
        df,
        ["k"],
        {
            "n": ("count", "v"),
            "sv": ("sum", "v"),
            "mn": ("min", "v"),
            "mx": ("max", "v"),
        },
        n_salts=8,
    )
    want = df.groupBy("k").agg(
        F.count("v").alias("n"),
        F.sum("v").alias("sv"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_agg_rejects_non_reassociable(spark):
    df = _skewed_df(spark)
    try:
        salted_agg(df, ["k"], {"a": ("avg", "v")})
    except ValueError as e:
        assert "avg" in str(e)
    else:
        raise AssertionError("avg must be rejected (not reassociable)")


def test_salted_join_matches_plain(spark):
    skewed = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", 1), ("c0", 2), ("c3", 3), ("absent", 9)], "k string, tag int"
    )
    got = salted_join(skewed, dim, "k", n_salts=4)
    want = skewed.join(dim, "k")
    assert got.count() == want.count()
    g = got.groupBy("k", "tag").count()
    w = want.groupBy("k", "tag").count()
    assert sorted(map(tuple, g.collect())) == sorted(map(tuple, w.collect()))
