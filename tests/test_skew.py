"""Skew toolkit: salted join row-identity with the plain join, salt
actually in the join keys, two-stage distinct correctness."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from video_metadata_db_spark.operators.skew import (
    salted_join,
    top_frequency_keys,
    two_stage_distinct_count,
)


def _skewed(spark):
    # one hot key (90%) + long tail — the shape that pins a task
    hot = spark.range(900).select(F.lit("HOT").alias("k"), F.col("id").alias("v"))
    tail = spark.range(100).select(
        F.concat(F.lit("t"), F.col("id") % 37).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(tail)


def test_salted_join_matches_plain_join(spark):
    large = _skewed(spark)
    small = spark.createDataFrame(
        [("HOT", 1.0), ("t3", 2.0), ("missing", 9.9)], "k string, w double"
    )
    for how in ("inner", "left"):
        plain = large.join(small, "k", how)
        salted = salted_join(large, small, "k", n_salts=8, how=how)
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect())), how


def test_salt_is_in_join_keys(spark):
    large, small = _skewed(spark), spark.createDataFrame([("HOT", 1.0)], "k string, w double")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        salted_join(large, small, "k").explain("formatted")
    assert "_salt" in buf.getvalue(), "salt column must participate in the join"


def test_two_stage_distinct_count(spark):
    df = _skewed(spark).withColumn("v", F.col("v") % 50)  # repeats per key
    got = {
        r["k"]: r["n_distinct"] for r in two_stage_distinct_count(df, "k", "v").collect()
    }
    want = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == want


def test_top_frequency_keys(spark):
    top = top_frequency_keys(_skewed(spark), "k", k=1).collect()
    assert top[0]["k"] == "HOT"
    assert top[0]["share"] == 0.9
