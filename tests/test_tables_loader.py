"""Corpus-loader schema adaptivity.

Round 2 regression class: the driver regenerated events.parquet with
``ts`` as TIMESTAMP(MICROS) where the round-1 corpus used
TIMESTAMP(NANOS), and the loader's fixed int64-nanos conversion then
broke every events query.  load_table must adapt to whichever flavor
the footer declares and always emit TimestampType micros.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from video_metadata_db_spark.sources.tables import load_table

_ROWS = [
    (1, dt.datetime(2024, 3, 1, 12, 0, 0, 123456), 7, "view", 1.5, "{}"),
    (2, dt.datetime(2024, 3, 1, 12, 10, 0, 654321), 8, "click", 2.5, "{}"),
]


def _write_events(tmp, ts_type, ts_vals):
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": pa.array(ts_vals, ts_type),
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array([r[5] for r in _ROWS], pa.string()),
        }
    )
    pq.write_table(table, f"{tmp}/events.parquet", store_schema=False)


def _check(spark, tmp):
    df = load_table(spark, str(tmp), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = {r["event_id"]: r["ts"] for r in df.collect()}
    assert got == {r[0]: r[1] for r in _ROWS}


def test_events_ts_micros(spark, tmp_path):
    _write_events(tmp_path, pa.timestamp("us"), [r[1] for r in _ROWS])
    _check(spark, tmp_path)


def test_events_ts_nanos(spark, tmp_path):
    _write_events(tmp_path, pa.timestamp("ns"), [r[1] for r in _ROWS])
    _check(spark, tmp_path)


def test_events_ts_micros_tz(spark, tmp_path):
    """A tz-tagged micros flavor reads as plain TimestampType with the
    same UTC wall-clock (session tz is UTC)."""
    vals = [r[1].replace(tzinfo=dt.timezone.utc) for r in _ROWS]
    _write_events(tmp_path, pa.timestamp("us", tz="UTC"), vals)
    _check(spark, tmp_path)
