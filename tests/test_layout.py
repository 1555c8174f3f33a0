"""Z-order layout: predicates on either z-column touch a fraction of
the files; a single-column sort only helps its own column."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventstreams_spark.catalog import load_table
from eventstreams_spark.operators.layout import rewrite_zordered, zorder_key

N_FILES = 8


def files_containing(spark, path, cond):
    df = spark.read.parquet(path).filter(cond)
    return df.select(F.input_file_name()).distinct().count()


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    ev = load_table(spark, sf_dir, "events")
    base = tmp_path_factory.mktemp("layout")
    z = str(base / "zorder")
    naive = str(base / "tsorted")
    rewrite_zordered(ev, z, ["user_id", "value"], N_FILES)
    (
        ev.repartitionByRange(N_FILES, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(naive)
    )
    return z, naive


def test_zorder_preserves_rows(spark, sf_dir, layouts):
    z, _ = layouts
    ev = load_table(spark, sf_dir, "events")
    got = spark.read.parquet(z)
    assert got.count() == ev.count()
    assert sorted(got.columns) == sorted(ev.columns)


def test_zorder_clusters_both_dimensions(spark, sf_dir, layouts):
    z, naive = layouts
    users = [r["user_id"] for r in
             load_table(spark, sf_dir, "events")
             .select("user_id").distinct().limit(10).collect()]
    z_touched = sum(files_containing(spark, z, F.col("user_id") == u) for u in users)
    n_touched = sum(files_containing(spark, naive, F.col("user_id") == u) for u in users)
    # time-sorted layout scatters each user over ~every file; z-order
    # confines a user to a strict subset
    assert z_touched < n_touched
    assert z_touched <= 0.7 * n_touched

    z_val = files_containing(spark, z, F.col("value") < 10.0)
    n_val = files_containing(spark, naive, F.col("value") < 10.0)
    assert z_val <= n_val  # value dimension clustered too


def test_zorder_key_interleaves():
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
    out = df.select(
        zorder_key([F.col("x"), F.col("y")], bits=3).alias("z")
    ).collect()[0]["z"]
    # x bits land on even positions, y on odd: x=101,y=011 -> z=010111
    # bit layout (i*d + j), j=0 for x: positions x:0,2,4 y:1,3,5
    expect = ((1 << 0) | (0 << 2) | (1 << 4)) | ((1 << 1) | (1 << 3) | (0 << 5))
    assert out == expect
