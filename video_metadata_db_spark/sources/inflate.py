"""Deterministic corpus inflation — scale-experiment harness.

The scale claims in SCALE.md (candidate pairs grow ~linearly with the
corpus, not quadratically) need a bigger corpus than the largest test
scale to be MEASURED rather than argued (VERDICT r4 item 2).  These
helpers build an N× corpus from a base table deterministically:

- **documents**: each replica suffixes every token with ``~r<k>``
  (replica 0 keeps the original text).  Within a replica the duplicate
  structure is IDENTICAL to the base corpus — same shingle sets modulo
  renaming, same MinHash collision behavior (signatures are hashes of
  shingles, and renaming shingles re-rolls but does not bias the
  min-hash lottery) — while across replicas every shingle differs, so
  no new near-dup pairs appear.  A linear-scaling operator must
  therefore produce ≈N× the base pair count at N× the corpus; naive
  replication WITHOUT remapping would instead create N-cliques of
  every document and force a quadratic term that says nothing about
  the operator.
- **embeddings**: each replica sign-flips a deterministic half of the
  dimensions (parity of a mixed hash of replica and index), which
  decorrelates replicas (expected cosine ≈ 0) while preserving norms
  and the within-replica geometry exactly.

Both are pure Catalyst (a ``crossJoin`` with a tiny replica range +
per-row expressions), so inflating 10× costs one scan of the base —
usable at any base scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: doc_id/vec_id offset between replicas — far above any base id.
REPLICA_OFFSET = 1 << 32


def _replicas(df: DataFrame, factor: int) -> DataFrame:
    if factor < 1:
        raise ValueError("factor must be >= 1")
    spark = df.sparkSession
    reps = spark.range(factor).select(F.col("id").cast("long").alias("rep"))
    return df.crossJoin(F.broadcast(reps))


def inflate_documents(docs: DataFrame, factor: int) -> DataFrame:
    """N× the documents table; replica k > 0 rewrites token t → ``t~rk``
    so replicas share no shingles (see module docstring)."""
    out = _replicas(docs, factor)
    remapped = F.regexp_replace(
        F.col("text"), F.lit(r"(\S+)"), F.concat(F.lit("$1~r"), F.col("rep"))
    )
    return out.select(
        (F.col("doc_id") + F.col("rep") * F.lit(REPLICA_OFFSET)).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text")).otherwise(remapped).alias("text"),
        "lang",
        "source",
        "n_chars",
    )


def inflate_embeddings(emb: DataFrame, factor: int) -> DataFrame:
    """N× the embeddings table; replica k > 0 sign-flips the dimensions
    where ``hash(k, i)`` is odd — an independent ~half-mass pattern per
    replica (a linear-in-k parity would give replicas 1 and 3 the SAME
    pattern and manufacture cross-replica duplicates), decorrelating
    replicas while keeping norms and within-replica geometry exact."""
    out = _replicas(emb, factor)
    flipped = F.transform(
        F.col("embedding"),
        lambda x, i: F.when(F.hash(F.col("rep"), i) % 2 != 0, -x).otherwise(x),
    )
    return out.select(
        (F.col("vec_id") + F.col("rep") * F.lit(REPLICA_OFFSET)).alias("vec_id"),
        F.when(F.col("rep") == 0, F.col("embedding")).otherwise(flipped).alias("embedding"),
        "label",
    )
