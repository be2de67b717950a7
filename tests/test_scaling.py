"""Pinned scale-growth contracts (VERDICT r4 item 2).

SCALE.md argues the LSH candidate generators grow ~linearly with the
corpus; tools/scale_experiment.py measures it at sf0.1×10.  These
tests pin the property at test scale so a regression (a blocking key
that stops engaging, a threshold change that floods buckets) fails CI
long before a cluster run: inflate the corpus N× with replicas that
share no shingles / no cosine mass (sources/inflate.py), and assert
the candidate-pair count grows ≤ N × slack — a quadratic generator
would grow ≥ N².
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from video_metadata_db_spark.operators.dedup import (
    BANDS,
    N_HASHES,
    band_buckets,
    minhash_signatures,
    release_dedup_caches,
    simhash,
)
from video_metadata_db_spark.sources.inflate import (
    REPLICA_OFFSET,
    inflate_documents,
    inflate_embeddings,
)
from video_metadata_db_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
FACTOR = 4
SLACK = 1.6  # replica hash re-rolls wobble bucket sizes; quadratic = ×FACTOR more


def _minhash_candidates(docs) -> int:
    sigs = minhash_signatures(docs)
    packed = sigs.select(
        "doc", F.array(*[F.col(f"sig_{i}") for i in range(N_HASHES)]).alias("sig")
    )
    bands = band_buckets(packed)
    l, r = bands.alias("l"), bands.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc"), F.col("r.doc"))
        .distinct()
        .count()
    )


def _simhash_candidates(docs) -> int:
    from video_metadata_db_spark.operators.dedup import _simhash_blocks

    blocks = _simhash_blocks(simhash(docs), n_blocks=4).select(
        "doc", "block_id", "block"
    )
    l, r = blocks.alias("l"), blocks.alias("r")
    return (
        l.join(
            r,
            (F.col("l.block_id") == F.col("r.block_id"))
            & (F.col("l.block") == F.col("r.block"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc"), F.col("r.doc"))
        .distinct()
        .count()
    )


def test_inflation_is_disjoint_across_replicas(spark):
    """The inflator's contract: replicas add corpus without adding
    cross-replica matches — doc_ids unique, replica-0 text unchanged,
    and no token (hence no shingle) shared between replicas."""
    docs = load_table(spark, SF, "documents").limit(50)
    big = inflate_documents(docs, 3)
    n = docs.count()
    assert big.count() == 3 * n
    assert big.select("doc_id").distinct().count() == 3 * n
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in big.filter(F.col("doc_id") < REPLICA_OFFSET).collect():
        assert r["text"] == orig[r["doc_id"]]
    toks = big.select(
        (F.col("doc_id") / REPLICA_OFFSET).cast("long").alias("rep"),
        F.explode(F.split("text", " ")).alias("t"),
    ).filter(F.col("t") != "")
    shared = (
        toks.distinct()
        .groupBy("t")
        .agg(F.countDistinct("rep").alias("nr"))
        .filter(F.col("nr") > 1)
        .count()
    )
    assert shared == 0


def test_minhash_candidates_grow_linearly(spark):
    docs = load_table(spark, SF, "documents")
    base = _minhash_candidates(docs)
    big = _minhash_candidates(inflate_documents(docs, FACTOR))
    release_dedup_caches()
    assert base > 0
    ratio = big / base
    # linear: ratio ≈ FACTOR; quadratic would be ≈ FACTOR²
    assert ratio <= FACTOR * SLACK, f"candidate growth {ratio:.1f}× vs corpus {FACTOR}×"
    # and the replicas genuinely contribute (not vacuously sub-linear)
    assert ratio >= FACTOR * 0.5


def test_simhash_candidates_grow_linearly(spark):
    docs = load_table(spark, SF, "documents")
    base = _simhash_candidates(docs)
    big = _simhash_candidates(inflate_documents(docs, FACTOR))
    release_dedup_caches()
    assert base > 0
    ratio = big / base
    assert ratio <= FACTOR * SLACK, f"candidate growth {ratio:.1f}× vs corpus {FACTOR}×"
    assert ratio >= FACTOR * 0.5


def test_semantic_blocking_candidates_grow_linearly(spark):
    """SemDeDup's scale path: k grows with n so clusters stay
    worker-sized — candidate pairs (Σ c·(c−1) over clusters) must then
    track corpus growth, not its square."""
    from video_metadata_db_spark.operators.clustering import kmeans_assign

    emb = load_table(spark, SF, "embeddings")
    n = emb.count()

    def candidates(frame, k: int) -> int:
        sizes = (
            kmeans_assign(frame, k=k, n_iter=1)
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        return int(sizes.agg(F.sum(F.col("c") * (F.col("c") - 1))).first()[0])

    base = candidates(emb, k=max(2, n // 100))
    big_emb = inflate_embeddings(emb, FACTOR)
    big = candidates(big_emb, k=max(2, (n * FACTOR) // 100))
    assert base > 0
    ratio = big / base
    assert ratio <= FACTOR * SLACK, f"candidate growth {ratio:.1f}× vs corpus {FACTOR}×"


def test_inflated_embeddings_decorrelated(spark):
    """Cross-replica cosine must be ~0 on average — otherwise the
    inflated corpus would manufacture near-dups and the growth tests
    above would measure the inflator, not the operator."""
    import numpy as np

    emb = load_table(spark, SF, "embeddings").limit(40)
    big = inflate_embeddings(emb, 2)
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=float) for r in big.collect()}
    sims = []
    for vid, v in rows.items():
        if vid < REPLICA_OFFSET and (vid + REPLICA_OFFSET) in rows:
            w = rows[vid + REPLICA_OFFSET]
            sims.append(
                float(v @ w) / (np.linalg.norm(v) * np.linalg.norm(w) + 1e-12)
            )
    assert sims and abs(sum(sims) / len(sims)) < 0.2
    assert max(abs(s) for s in sims) < 0.9
