"""Loaders for the driver's synthetic parquet corpus (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``.  Parquet is
the engine's native format: columnar, predicate-pushdown- and
column-pruning-friendly — ``df.explain`` on any downstream query should
show ``PushedFilters`` / a narrowed ``ReadSchema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table. Schema comes from the parquet footer —
    never ``inferSchema`` over text."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; corpus tables: {TABLES}")
    if name == "events":
        # events.ts has shipped as both parquet TIMESTAMP(NANOS) (which
        # Spark's vectorized reader rejects — read as raw int64 nanos via
        # the legacy flag and truncate to micros, matching DuckDB/Arrow)
        # and plain TIMESTAMP(MICROS). Adapt to whichever the footer says
        # so regenerated corpora don't break every events query.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(raw.dtypes)["ts"]
        if ts_type == "bigint":
            # integer `div`, not `/`: epoch-2024 nanos (~1.7e18) exceed a
            # double's 53-bit mantissa, so float division truncates wrong
            # by up to 1 µs — caught by the session-window oracle on min(ts)
            raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type.startswith("timestamp_ntz"):
            # normalize to TimestampType so unix_micros/window/watermark
            # operators downstream see one type; session tz is UTC
            # (session.py:40), so the wall-clock value is unchanged
            raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
        return raw.select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view for the SQL API."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
