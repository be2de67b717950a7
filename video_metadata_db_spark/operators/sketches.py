"""Count-min sketch — bounded-memory frequency estimation as plain
DataFrame algebra, shared by the batch query (`heavy_hitters_cms`) and
the streaming maintainer (:mod:`..streaming.sketches`).

The sketch is a DEPTH×WIDTH grid of integer counters; item x adds its
count to cell (i, h_i(x)) for each of the DEPTH md5-salted hash rows,
and a point estimate is the MIN over those cells (one-sided: only ever
an overestimate).  Two properties make it the 100 TB aggregation
pattern:

- **Fixed footprint**: DEPTH×WIDTH cells regardless of key cardinality
  — the shuffle key domain is (row, bucket), never the term domain, so
  a vocabulary of any size aggregates into 4 KiB of state.
- **Mergeability**: cells are sums, so sketches of disjoint batches
  ADD — streaming maintenance (cell-wise sum per micro-batch) lands on
  EXACTLY the sketch a one-shot batch build produces, which is why the
  streaming query can share the batch query's full value oracle.

Hashing follows the repo's md5 recipe (32-bit hex prefix, replayable
in DuckDB as ``CAST(concat('0x', substr(md5(..), 1, 8)) AS BIGINT)``),
salted per row with ``term || '#' || i``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _hash32(term: F.Column, i: F.Column) -> F.Column:
    """The shared CMS row-hash recipe (md5 first-8-hex as a 32-bit
    int) — the ONE definition both the fixed-width sketch and the
    width-sweep audit (`q_cms_width_tradeoff`) derive buckets from, so
    a recipe change can never silently diverge between them."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("#", term, i)), 1, 8), 16, 10
    ).cast("long")


def _bucket(term: F.Column, i: F.Column) -> F.Column:
    return _hash32(term, i) % CMS_WIDTH


def cms_cells(term_counts: DataFrame) -> DataFrame:
    """(i, bucket, cell) sketch cells from a ``(term, cnt)`` frame —
    one partial-aggregatable shuffle on the (row, bucket) cell key."""
    rows = F.expr(f"explode(sequence(0, {CMS_DEPTH - 1}))")
    return (
        term_counts.select("term", "cnt", rows.alias("i"))
        .select("cnt", "i", _bucket(F.col("term"), F.col("i")).alias("bucket"))
        .groupBy("i", "bucket")
        .agg(F.sum("cnt").alias("cell"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of two sketches (the mergeability property)."""
    return (
        a.unionByName(b).groupBy("i", "bucket").agg(F.sum("cell").alias("cell"))
    )


def cms_probe(candidates: DataFrame, cells: DataFrame) -> DataFrame:
    """Attach the sketch estimate (``cms`` column = min over the DEPTH
    row cells) to a ``(term, ...)`` candidate frame.  The cell table is
    DEPTH×WIDTH — always broadcastable."""
    rows = F.expr(f"explode(sequence(0, {CMS_DEPTH - 1}))")
    other = [c for c in candidates.columns if c != "term"]
    probes = candidates.select("term", *other, rows.alias("i")).select(
        "term", *other, "i", _bucket(F.col("term"), F.col("i")).alias("bucket")
    )
    return (
        probes.join(F.broadcast(cells), ["i", "bucket"])
        .groupBy("term", *other)
        .agg(F.min("cell").alias("cms"))
    )
