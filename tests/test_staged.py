"""Resumable staged batch execution: committed stages are never redone."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from video_metadata_db_spark.operators.staged import _stage_dir, run_staged
from video_metadata_db_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _stages():
    return [
        ("filter", lambda df: df.filter(F.col("value") > 0)),
        ("enrich", lambda df: df.withColumn("double_value", F.col("value") * 2)),
        (
            "rollup",
            lambda df: df.groupBy("event_type").agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("double_value"), 6).alias("total"),
            ),
        ),
    ]


def test_staged_run_and_full_resume_skip(spark, tmp_path):
    events = load_table(spark, SF, "events")
    work = str(tmp_path / "staged")
    out, executed = run_staged(spark, events, _stages(), work)
    assert executed == ["filter", "enrich", "rollup"]
    expected = sorted(map(tuple, out.collect()))

    # full rerun: nothing executes, same result read back from storage
    out2, executed2 = run_staged(spark, events, _stages(), work)
    assert executed2 == []
    assert sorted(map(tuple, out2.collect())) == expected


def test_staged_resumes_from_first_missing_stage(spark, tmp_path):
    """Simulated mid-job crash: the last stage's commit is destroyed;
    the rerun redoes ONLY that stage."""
    events = load_table(spark, SF, "events")
    work = str(tmp_path / "staged")
    _, executed = run_staged(spark, events, _stages(), work)
    assert len(executed) == 3

    last = _stage_dir(work, 2, "rollup")
    os.remove(os.path.join(last, "_SUCCESS"))  # uncommitted = crashed mid-write

    out, executed2 = run_staged(spark, events, _stages(), work)
    assert executed2 == ["rollup"], "only the uncommitted stage may re-execute"
    # and the result matches the batch equivalent
    exp = sorted(
        map(
            tuple,
            events.filter(F.col("value") > 0)
            .withColumn("double_value", F.col("value") * 2)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("double_value"), 6).alias("total"),
            )
            .collect(),
        )
    )
    assert sorted(map(tuple, out.collect())) == exp
