"""Deduplication operators for training-data pipelines.

Four families, all Catalyst-native (no Python UDFs anywhere):

- **exact**: hash-groupBy on normalized text (md5 key).
- **n-gram Jaccard**: word-shingle overlap via an inverted-index join —
  the exact (quadratic-free) baseline the approximate methods are
  measured against.
- **MinHash + LSH**: 64-permutation signatures → banded bucket join →
  candidate pairs + signature-estimated similarity.  The scale path:
  candidate generation is O(Σ bucket²) instead of O(n²).
- **SimHash**: 60-bit sign-vote fingerprints (near-dup = small Hamming
  distance).

Hashing discipline: every hash is the first 15 hex chars of ``md5``
parsed as a 60-bit integer — deterministic, seedable by prefixing, and
reproducible bit-for-bit in DuckDB SQL (``CAST('0x…' AS BIGINT)``), so
even MinHash/SimHash results are oracle-checkable.

At 100 TB: the shingle explode shuffles on (shingle) for the inverted
index — hot shingles (stopword trigrams) skew; mitigations built in:
document-frequency cap on join shingles (drop shingles appearing in
> ``max_df`` docs — they carry no dedup signal and create the skew),
and AQE skew-join splitting for the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_HASHES = 64
BANDS = 16
ROWS_PER_BAND = N_HASHES // BANDS


def hash60(c: Column, seed: int | None = None) -> Column:
    """60-bit integer hash = first 15 hex chars of md5 (optionally
    seed-prefixed). ``conv`` returns a decimal string → cast long."""
    src = F.concat(F.lit(f"{seed}:"), c) if seed is not None else c
    return F.conv(F.substring(F.md5(src), 1, 15), 16, 10).cast("long")


def normalize_text(c: Column) -> Column:
    """Lowercase + collapse whitespace — the canonical form for exact dedup."""
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def tokens_of(c: Column) -> Column:
    return F.filter(F.split(c, " "), lambda t: t != "")


def shingles_of(c: Column, k: int = 3) -> Column:
    """Distinct word k-shingles of a text column (array<string>).

    Guarded: ``sequence(1, 0)`` in Spark counts DOWN — texts shorter
    than k words must yield an empty array, not a phantom shingle.
    """
    toks = tokens_of(c)
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    return F.when(F.size(toks) >= k, F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )).otherwise(F.array().cast("array<string>"))


# ------------------------------------------------------------- exact ----

def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups on normalized text.

    Returns one row per duplicated content hash: canonical (min) id,
    copy count.  Scale: a single hash-partition shuffle on the 128-bit
    key; map-side partial agg collapses copies early.
    """
    keyed = docs.select(
        F.md5(normalize_text(F.col(text_col))).alias("content_hash"), F.col(id_col)
    )
    return (
        keyed.groupBy("content_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


# ----------------------------------------------------- n-gram Jaccard ---

def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """All pairs with shingle-set Jaccard ≥ threshold, exactly.

    Inverted-index join: explode distinct shingles, self-join on the
    shingle, count co-occurrences per pair, then J = |∩|/(|A|+|B|-|∩|).
    ``max_df`` drops shingles present in more than that many docs —
    they cannot push any pair over a meaningful threshold but dominate
    the join fan-out (the skew bomb at scale).
    """
    sh = docs.select(F.col(id_col).alias("doc"), F.explode(shingles_of(F.col(text_col), k)).alias("s"))
    if max_df is not None:
        rare = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") <= max_df)
        sh = sh.join(rare.select("s"), "s")
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ----------------------------------------------------- MinHash + LSH ----

def minhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc MinHash signature as 64 columns ``sig_0..sig_63``.

    One row per (doc, shingle) with all 64 hashes computed as columns,
    then a single groupBy(doc) with 64 ``min`` aggregates — ONE shuffle
    keyed on the doc id, no 64× row blow-up, fully codegen'd.
    """
    sh = docs.select(
        F.col(id_col).alias("doc"), F.explode(shingles_of(F.col(text_col))).alias("s")
    )
    hashed = sh.select(
        "doc", *[hash60(F.col("s"), seed=i).alias(f"h_{i}") for i in range(N_HASHES)]
    )
    return hashed.groupBy("doc").agg(
        *[F.min(f"h_{i}").alias(f"sig_{i}") for i in range(N_HASHES)]
    )


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Banded LSH: docs sharing any band bucket, with the
    signature-estimated similarity (fraction of equal components).

    Scale: bucket join keys are (band_id, md5-of-band), so candidate
    generation shuffles only signature rows; the pair join is between
    bucket members — O(Σ bucket²), not O(n²).
    """
    band_cols = []
    for b in range(BANDS):
        ins = [F.col(f"sig_{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat_ws(",", *ins)).alias("bucket"))
        )
    bands = signatures.select("doc", F.explode(F.array(*band_cols)).alias("bb")).select(
        "doc", F.col("bb.band_id").alias("band_id"), F.col("bb.bucket").alias("bucket")
    )
    l, r = bands.alias("l"), bands.alias("r")
    pairs = (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .distinct()
    )
    sa = signatures.select(
        F.col("doc").alias("doc_a"), *[F.col(f"sig_{i}").alias(f"a_{i}") for i in range(N_HASHES)]
    )
    sb = signatures.select(
        F.col("doc").alias("doc_b"), *[F.col(f"sig_{i}").alias(f"b_{i}") for i in range(N_HASHES)]
    )
    matches = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0) for i in range(N_HASHES)
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(matches / F.lit(float(N_HASHES)), 6).alias("est_jaccard"),
        )
    )


def minhash_lsh_dedup(
    docs: DataFrame, threshold: float = 0.5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup pairs by MinHash-LSH, filtered on estimated similarity."""
    sigs = minhash_signatures(docs, text_col, id_col)
    return lsh_candidate_pairs(sigs).filter(F.col("est_jaccard") >= threshold)


# ------------------------------------------------------------ SimHash ---

SIMHASH_BITS = 60


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash per doc from unigram token hashes.

    Token hashes are computed once (``transform``), then each output bit
    is a sign-vote aggregate over the hash array — all inside one
    projection, no explode, no shuffle at all (embarrassingly parallel).
    """
    toks = tokens_of(F.col(text_col))
    hashes = F.transform(toks, lambda t: hash60(t))
    bit_votes = [
        F.aggregate(
            hashes,
            F.lit(0).cast("long"),  # init type must match the merge type
            lambda acc, h: acc + (F.shiftright(h, b).bitwiseAND(F.lit(1).cast("long")) * 2 - 1),
        )
        for b in range(SIMHASH_BITS)
    ]
    fingerprint = None
    for b, vote in enumerate(bit_votes):
        term = F.when(vote > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return docs.select(F.col(id_col).alias("doc"), fingerprint.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, via 4-block LSH.

    Pigeonhole: at ≤ ``max_hamming`` (< 4 blocks) differing bits, at
    least one 15-bit block matches exactly — join on (block_id, block
    value), then verify with ``bit_count(xor)``.
    """
    sh = simhash(docs)
    blocks = sh.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_id"),
                        F.shiftright("simhash", i * 15).bitwiseAND(F.lit((1 << 15) - 1)).alias("block"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc", "simhash", "bb.block_id", "bb.block")
    l, r = blocks.alias("l"), blocks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.block_id") == F.col("r.block_id"))
            & (F.col("l.block") == F.col("r.block"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(
            F.col("l.doc").alias("doc_a"),
            F.col("r.doc").alias("doc_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
