"""As-of join semantics on handcrafted rows: exact-ts visibility,
no-prior-row NULLs, latest-of-several selection, key isolation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from video_metadata_db_spark.operators.asof import asof_join

LEFT = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)
RIGHT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _t(m: int) -> dt.datetime:
    return dt.datetime(2024, 6, 1, 12, m, 0)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _t(5)),   # before any right row → NULL
            (2, 100, _t(10)),  # exactly at right ts 10 → matches it
            (3, 100, _t(25)),  # after 10 and 20 → matches 20
            (4, 200, _t(30)),  # other key: only key-200 rows visible
        ],
        LEFT,
    )
    right = spark.createDataFrame(
        [
            (100, _t(10), 10.0),
            (100, _t(20), 20.0),
            (200, _t(1), 99.0),
        ],
        RIGHT,
    )
    got = {
        r["event_id"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(left, right, by="user_id", ts="ts").collect()
    }
    assert got[1] == (None, None)
    assert got[2] == (_t(10), 10.0)
    assert got[3] == (_t(20), 20.0)
    assert got[4] == (_t(1), 99.0)
