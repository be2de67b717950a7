"""Corpus snapshot diff — CDC between two dataset releases.

Training corpora ship as versioned releases (the versioned snapshots
in streaming/materialized.py, or any pair of parquet roots); the audit
every release pipeline runs before publishing is the DIFF against the
previous version: which documents appeared, which were dropped, which
changed in place.  The reference's update mode answers only "which
files are new" (video_metadata_db.py:443-476, an mmap membership
probe); this operator is the full three-way classification.

Spark-first shape: ONE full-outer equi-join on the key — both sides
hash-shuffle once on the key (zero shuffle when both releases are
bucketed on it, the layout sources/bucketing.py writes), then a
null-safe column compare classifies each row.  No window, no collect;
at 100 TB the join is the only data movement, and AQE handles the
skewless key space.  For wide payloads, compare a precomputed 64-bit
fingerprint column instead of the payload columns — same plan, fixed
row width; the exact column compare here is what the DuckDB oracle
replays (`IS DISTINCT FROM`).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """(key..., change) for every key in either release, where change ∈
    {'added', 'removed', 'changed'} (plus 'unchanged' when
    ``include_unchanged``).  ``compare_cols`` defaults to every non-key
    column of ``new``; comparison is null-safe per column."""
    keys = list(key_cols)
    compare = (
        list(compare_cols)
        if compare_cols is not None
        else [c for c in new.columns if c not in set(keys)]
    )
    # presence markers survive the coalescing key-list join; payload
    # columns renamed apart so the compare is unambiguous
    o = old.select(
        *keys,
        F.lit(1).alias("_in_old"),
        *[F.col(c).alias(f"_old_{c}") for c in compare],
    )
    n = new.select(
        *keys,
        F.lit(1).alias("_in_new"),
        *[F.col(c).alias(f"_new_{c}") for c in compare],
    )
    joined = o.join(n, keys, "full_outer")
    differs = None
    for c in compare:
        d = ~F.col(f"_old_{c}").eqNullSafe(F.col(f"_new_{c}"))
        differs = d if differs is None else (differs | d)
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(differs if differs is not None else F.lit(False), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(*keys, change.alias("change"))
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out


def corpus_diff_patch(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """:func:`corpus_diff` carrying the new-side payload — an
    APPLYABLE changeset: (key..., change, payload...) where payload is
    the new release's columns (null for 'removed').  Shipping the
    patch instead of the release is the bandwidth win when churn is
    low: |patch| = |added| + |removed| + |changed|, not |corpus|.
    Inverse pinned by test_corpus_diff_patch_roundtrip:
    ``apply_diff(old, patch) == new`` exactly."""
    keys = list(key_cols)
    compare = (
        list(compare_cols)
        if compare_cols is not None
        else [c for c in new.columns if c not in set(keys)]
    )
    classified = corpus_diff(old, new, keys, compare)
    return classified.join(new, keys, "left").select(
        *keys, "change", *compare
    )


def apply_diff(
    old: DataFrame, patch: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Reconstruct the new release from the old one plus a
    :func:`corpus_diff_patch` changeset: drop removed+changed keys,
    union in the patch's added+changed payloads.  One anti join + one
    union — the merge an incremental release publisher runs instead of
    rewriting the corpus."""
    keys = list(key_cols)
    upserts = patch.filter(F.col("change") != "removed").drop("change")
    kept = old.join(patch.select(*keys), keys, "left_anti")
    return kept.unionByName(upserts)
