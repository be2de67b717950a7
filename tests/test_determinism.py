"""Partition-count invariance sweep over the ENTIRE query registry.

The engine's determinism claims (decimal sums, integer-exact ratios,
round-before-rank guards) all reduce to one testable property: the
RESULT of every checked query is byte-identical under a different
physical plan.  Here each query runs twice in the same session — once
with the suite's 8 shuffle partitions and AQE on, once with 3
partitions and AQE OFF (a genuinely different exchange layout, partial
aggregation tree, and reduce order) — and the collected rows must
match exactly, floats included.

A failure is a real scale bug: it means output depends on partition
count, which a cluster changes under the user's feet (AQE, dynamic
allocation, input splits)."""

from __future__ import annotations

import pytest

from video_metadata_db_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"

#: Streaming queries stage temp dirs + checkpoints per call; two calls
#: are two independent pipelines, which is fine, but they dominate the
#: sweep's wall time — and their aggregates are the same decimal/count
#: shapes the batch queries already sweep.  Kept out for runtime, not
#: for doubt: their cross-restart determinism is pinned in
#: tests/test_streaming.py.
_SKIP = {n for n in QUERIES if n.startswith("stream_")}


def _rows(spark, name):
    out = QUERIES[name](spark, SF).collect()
    # key maps None below everything so NULL group keys (grouping sets,
    # outer joins) sort; equality is still checked on the exact tuples
    return sorted(
        (tuple(r) for r in out),
        key=lambda t: tuple((v is not None, str(v)) for v in t),
    )


@pytest.mark.parametrize("name", [n for n in QUERIES if n not in _SKIP])
def test_partition_count_invariance(spark, name):
    baseline = _rows(spark, name)
    conf = spark.conf
    before = conf.get("spark.sql.shuffle.partitions")
    aqe_before = conf.get("spark.sql.adaptive.enabled")
    try:
        conf.set("spark.sql.shuffle.partitions", "3")
        conf.set("spark.sql.adaptive.enabled", "false")
        alt = _rows(spark, name)
    finally:
        conf.set("spark.sql.shuffle.partitions", before)
        conf.set("spark.sql.adaptive.enabled", aqe_before)
    assert alt == baseline, (
        f"{name}: result depends on the physical plan "
        f"({len(baseline)} vs {len(alt)} rows or value drift)"
    )
