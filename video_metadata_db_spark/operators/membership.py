"""Bloom-filter membership pre-filtering for update-mode ingestion.

The reference's update mode skips files already present in the db via a
per-file substring scan of the whole TSV (video_metadata_db.py:427-452
— O(db) per candidate, and broken as shipped).  The engine's exact
replacement is a ``left_anti`` join (operators/parity.py); THIS module
is the 100 TB path layered on top of it:

1. Build a Bloom bitmap over the existing keys — ``k`` hash positions
   per key, OR-ed into 64-bit words by a ``bit_or`` aggregate.  The
   bitmap is a tiny (word_idx, bits) DataFrame: m/64 rows ≤ a few
   thousand, broadcastable regardless of how many billions of keys fed
   it.
2. Probe incoming keys with ``k`` broadcast hash joins (no shuffle of
   the incoming side).  A key with any unset bit is DEFINITELY new —
   it skips the expensive exact anti-join entirely.
3. Only the "possibly present" remainder (true members + false
   positives, typically a tiny fraction) goes through the exact
   ``left_anti`` join.

The final result is exactly the anti-join's (Bloom false positives are
caught by step 3), so the whole pipeline stays value-oracle-checkable
while the big shuffle shrinks from |incoming| to |possibly-present|.

Hashing is ``xxhash64(key, seed)`` — JVM-side, codegen'd; the bitmap
layout never needs to be reproduced by the oracle, only the final
membership answer does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bitmap size in bits (2^20 ≈ 1M bits = 16384 longs ≈ 128 KiB) and
#: hash count. For n existing keys, FP rate ≈ (1 - e^(-k·n/m))^k; at
#: n = 100k, k = 3: ~0.2%. Scale m with n at cluster scale.
DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 3


def _positions(key: Column, k: int, m_bits: int) -> list[Column]:
    return [F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(m_bits)) for seed in range(k)]


def build_bloom(
    existing: DataFrame, key_col: str, k: int = DEFAULT_K, m_bits: int = DEFAULT_M_BITS
) -> DataFrame:
    """Bloom bitmap as a (word_idx: long, bits: long) DataFrame.

    One explode to k rows per key, then a single ``bit_or`` aggregate
    shuffling at most m/64 distinct words — the partial aggregation
    collapses almost everything map-side.
    """
    pos = F.explode(F.array(*_positions(F.col(key_col), k, m_bits))).alias("pos")
    words = existing.select(pos).select(
        F.shiftright("pos", 6).alias("word_idx"),
        # shiftleft by a COLUMN needs the SQL form (the Python API only
        # takes an int shift amount)
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
    )
    return words.groupBy("word_idx").agg(F.bit_or("mask").alias("bits"))


def bloom_prefiltered_new_keys(
    incoming: DataFrame,
    existing: DataFrame,
    key_col: str,
    k: int = DEFAULT_K,
    m_bits: int = DEFAULT_M_BITS,
) -> DataFrame:
    """Rows of ``incoming`` whose key is NOT in ``existing`` — exact
    anti-join semantics, Bloom-accelerated.

    ``incoming`` flows through k broadcast left joins (zero shuffles of
    the big side); the exact anti-join runs only on rows whose every
    probed bit was set.
    """
    bloom = F.broadcast(build_bloom(existing, key_col, k, m_bits))
    probed = incoming
    for i, pos in enumerate(_positions(F.col(key_col), k, m_bits)):
        probed = probed.withColumn(f"__pos{i}", pos)
    present_flags = []
    for i in range(k):
        b = bloom.select(
            F.col("word_idx").alias(f"w{i}"), F.col("bits").alias(f"bits{i}")
        )
        probed = probed.join(
            b, F.shiftright(F.col(f"__pos{i}"), 6) == F.col(f"w{i}"), "left"
        )
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(__pos{i} % 64 AS INT))")
        present_flags.append(
            F.coalesce(F.col(f"bits{i}").bitwiseAND(mask) != 0, F.lit(False))
        )
    possibly_present = present_flags[0]
    for flag in present_flags[1:]:
        possibly_present = possibly_present & flag
    probed = probed.withColumn("__maybe", possibly_present).drop(
        *[c for i in range(k) for c in (f"w{i}", f"bits{i}", f"__pos{i}")]
    )

    definitely_new = probed.filter(~F.col("__maybe")).drop("__maybe")
    candidates = probed.filter(F.col("__maybe")).drop("__maybe")
    verified_new = candidates.join(
        existing.select(F.col(key_col).alias("__ex_key")),
        F.col(key_col) == F.col("__ex_key"),
        "left_anti",
    )
    return definitely_new.unionByName(verified_new)
