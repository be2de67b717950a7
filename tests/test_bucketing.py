"""Bucketed co-located joins: pre-shuffling on the join key at write
time removes the join-time Exchange — the 100 TB answer for a join both
of whose sides are too big to broadcast and which runs repeatedly
(fact-to-fact, incremental pipelines).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from video_metadata_db_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bucketed_test LOCATION '{tmp_path / 'warehouse'}'"
    )
    # force the shuffle-join path (the to-big-to-broadcast scenario
    # bucketing exists for; at sf0.001 everything would broadcast)
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe_thresh = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        (
            orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").saveAsTable("bucketed_test.orders_b")
        )
        (
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
            .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").saveAsTable("bucketed_test.lineitem_b")
        )
        ob = spark.table("bucketed_test.orders_b")
        lb = spark.table("bucketed_test.lineitem_b")
        joined = ob.join(lb, "o_orderkey").groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n")
        )

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in join_section, (
            "bucketed join must read pre-shuffled buckets, not re-shuffle:\n" + join_section
        )

        # and the result matches the plain (shuffling) join
        plain = (
            orders.join(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
            .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        if old_aqe_thresh is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe_thresh)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP DATABASE IF EXISTS bucketed_test CASCADE")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitioned layout + a partition-key filter must show
    PartitionFilters at the scan (zero I/O for pruned partitions) —
    the reference's walk-time directory pruning (:1007-1014), reborn as
    storage-layout pruning."""
    from video_metadata_db_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    out = str(tmp_path / "events_by_type")
    ev.write.partitionBy("event_type").parquet(out)

    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    # and the filter is NOT re-evaluated row-wise on the scanned data
    n_click = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == n_click > 0


def test_corpus_diff_over_bucketed_releases_has_no_exchange(spark, tmp_path):
    """The diff docstring's zero-shuffle claim, plan-gated: two
    releases bucketed on the key full-outer-join without any Exchange,
    and the classification matches the plain (shuffling) diff."""
    from video_metadata_db_spark.operators.diff import corpus_diff

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    old_rel = docs.filter(F.col("doc_id") % 5 != 0)
    new_rel = docs.filter(F.col("doc_id") % 3 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 1, F.concat("text", F.lit(" v2"))).otherwise(
            F.col("text")
        ),
    )
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS diff_test LOCATION '{tmp_path / 'wh'}'"
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        for name, rel in (("old_rel_b", old_rel), ("new_rel_b", new_rel)):
            (
                rel.write.bucketBy(8, "doc_id").sortBy("doc_id")
                .mode("overwrite").saveAsTable(f"diff_test.{name}")
            )
        bucketed = corpus_diff(
            spark.table("diff_test.old_rel_b"),
            spark.table("diff_test.new_rel_b"),
            ["doc_id"],
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bucketed.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin FullOuter" in plan or "SortMergeJoin" in plan
        assert "Exchange" not in plan, (
            "bucketed corpus_diff must not re-shuffle either release:\n" + plan
        )
        got = {r["doc_id"]: r["change"] for r in bucketed.collect()}
        want = {
            r["doc_id"]: r["change"]
            for r in corpus_diff(old_rel, new_rel, ["doc_id"]).collect()
        }
        assert got == want and "added" in got.values() and "removed" in got.values()
        assert "changed" in got.values()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        if old_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
        spark.sql("DROP DATABASE IF EXISTS diff_test CASCADE")
