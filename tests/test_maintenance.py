"""Compaction and sort-clustered rewrite: fewer files, disjoint ranges."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from video_metadata_db_spark.sources.maintenance import compact_parquet, input_bytes
from video_metadata_db_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _fragment(spark, tmp_path, n_files: int = 48) -> str:
    src = str(tmp_path / "fragmented")
    load_table(spark, SF, "events").repartition(n_files).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == n_files
    return src


def test_compact_reduces_file_count_and_keeps_rows(spark, tmp_path):
    src = _fragment(spark, tmp_path)
    out_dir = str(tmp_path / "compacted")
    target = max(1, input_bytes(spark, src) // 2)  # aim for ~2 files
    back = compact_parquet(spark, src, out_dir, target_bytes=target)
    files = glob.glob(f"{out_dir}/part-*.parquet")
    assert 1 <= len(files) <= 4
    src_rows = sorted(map(tuple, spark.read.parquet(src).collect()))
    assert sorted(map(tuple, back.collect())) == src_rows


def test_clustered_compaction_yields_disjoint_key_ranges(spark, tmp_path):
    """With sort_col, every output file owns a disjoint event_id range —
    checked against the actual parquet footer min/max stats, the
    mechanism file-level pruning relies on."""
    src = _fragment(spark, tmp_path)
    out_dir = str(tmp_path / "clustered")
    target = max(1, input_bytes(spark, src) // 4)  # aim for ~4 files
    back = compact_parquet(spark, src, out_dir, target_bytes=target, sort_col="event_id")
    files = sorted(glob.glob(f"{out_dir}/part-*.parquet"))
    assert len(files) >= 3

    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("event_id")
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        ranges.append((lo, hi))
    ranges.sort()
    for (_, prev_hi), (next_lo, _) in zip(ranges, ranges[1:]):
        assert prev_hi < next_lo, f"overlapping file ranges: {ranges}"

    n = back.count()
    assert n == spark.read.parquet(src).count()
    # and a key-range filter is satisfiable from a strict subset of files
    probe_hi = ranges[0][1]
    hits = back.filter(F.col("event_id") <= probe_hi).count()
    assert 0 < hits < n


def test_schema_evolution_merge_read(spark, tmp_path):
    """A lake directory whose batches disagree on schema (a column was
    added later) must read as the UNION schema with nulls backfilled —
    mergeSchema is the ingest-evolution contract; without it the scan
    silently picks one footer's schema."""
    base = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a.mkv")], "file_id long, path string"
    ).write.parquet(f"{base}/batch=1")
    spark.createDataFrame(
        [(2, "b.mkv", 720)], "file_id long, path string, height int"
    ).write.parquet(f"{base}/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"file_id", "path", "height", "batch"}
    rows = {r["file_id"]: (r["path"], r["height"]) for r in merged.collect()}
    assert rows == {1: ("a.mkv", None), 2: ("b.mkv", 720)}


def _file_ranges(files: list[str], col: str) -> list[tuple]:
    out = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        out.append((lo, hi))
    return out


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    """Z-order on (l_partkey, l_suppkey) must make footer-stat pruning
    effective on BOTH columns: for a narrow box predicate on either
    column, most files' min/max ranges miss the box — whereas a
    lexicographic sort on partkey leaves every file covering the full
    suppkey domain (no pruning on the second column)."""
    from video_metadata_db_spark.sources.maintenance import zorder_parquet

    src = str(tmp_path / "li_src")
    load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    ).repartition(8).write.parquet(src)

    zdir = str(tmp_path / "li_z")
    target = max(1, input_bytes(spark, src) // 16)  # aim for ~16 files
    back = zorder_parquet(spark, src, zdir, cols=["l_partkey", "l_suppkey"], target_bytes=target)
    files = sorted(glob.glob(f"{zdir}/part-*.parquet"))
    assert len(files) >= 8, "need enough files for pruning to be measurable"

    # row parity: the rewrite loses nothing
    assert back.count() == spark.read.parquet(src).count()

    def hit_fraction(col: str, lo, hi) -> float:
        ranges = _file_ranges(files, col)
        hits = sum(1 for (mn, mx) in ranges if not (mx < lo or mn > hi))
        return hits / len(files)

    # narrow boxes: ~10% of each key domain
    part_lo, part_hi = 0, 19            # p_partkey 0..199 at sf0.001
    supp_lo, supp_hi = 0, 0             # s_suppkey 0..9
    assert hit_fraction("l_partkey", part_lo, part_hi) <= 0.5, (
        "z-layout must prune files on the FIRST clustered column"
    )
    assert hit_fraction("l_suppkey", supp_lo, supp_hi) <= 0.5, (
        "z-layout must prune files on the SECOND clustered column too"
    )


def test_lexicographic_sort_cannot_prune_second_column(spark, tmp_path):
    """The contrast case justifying Z-order: a partkey-sorted layout
    leaves (nearly) every file spanning the whole suppkey domain."""
    src = str(tmp_path / "li_src2")
    load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    ).repartition(8).write.parquet(src)

    sdir = str(tmp_path / "li_sorted")
    target = max(1, input_bytes(spark, src) // 16)
    compact_parquet(spark, src, sdir, target_bytes=target, sort_col="l_partkey")
    files = sorted(glob.glob(f"{sdir}/part-*.parquet"))
    assert len(files) >= 8

    ranges = _file_ranges(files, "l_suppkey")
    hits = sum(1 for (mn, mx) in ranges if not (mx < 0 or mn > 0))
    assert hits / len(files) >= 0.9, (
        "sanity: single-key sort should NOT prune the second column"
    )
