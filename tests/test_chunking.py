"""Content-defined chunking properties — what the value oracle can't
say: boundary LOCALITY (an edit shifts O(1) chunks, the whole point of
content-defined over fixed-width) and lossless reconstruction."""

from __future__ import annotations

from pyspark.sql import functions as F

from video_metadata_db_spark.operators.chunking import (
    WINDOW,
    chunk_dedup_groups,
    content_defined_chunks,
)
from video_metadata_db_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunks_reconstruct_documents(spark):
    """Chunk texts joined in order == the token stream: chunking is a
    partition of the document, nothing dropped or duplicated."""
    docs = load_table(spark, SF, "documents").limit(100)
    joined = (
        content_defined_chunks(docs)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("rebuilt"),
            F.sum("n_tokens").alias("n_tok"),
        )
    )
    orig = docs.select(
        "doc_id",
        F.array_join(F.filter(F.split("text", " "), lambda t: t != ""), " ").alias(
            "norm"
        ),
    )
    bad = (
        joined.join(orig, "doc_id")
        .filter(F.col("rebuilt") != F.col("norm"))
        .count()
    )
    assert bad == 0


def test_shared_passage_yields_identical_chunks(spark):
    """Two documents embedding the same long passage at DIFFERENT
    offsets must still produce identical chunk hashes for the shared
    interior — the property that makes chunk-hash dedup find
    boilerplate.  (Fixed-width chunking fails this for any offset not
    ≡ 0 mod width.)"""
    # distinct tokens → distinct trigrams → ~1/16 of positions bound
    passage = " ".join(f"tok{i}" for i in range(160))
    docs = _df(
        spark,
        [
            (1, "alpha beta " + passage + " omega"),
            (2, "one two three four five six seven " + passage),
        ],
    )
    ch = content_defined_chunks(docs)
    h1 = {r["chunk_hash"] for r in ch.filter("doc_id = 1").collect()}
    h2 = {r["chunk_hash"] for r in ch.filter("doc_id = 2").collect()}
    shared = h1 & h2
    # the interior of a 160-token passage (~16-token mean chunks) must
    # realign after at most one boundary-finding chunk on each side
    assert len(shared) >= 3, (len(h1), len(h2), len(shared))
    dd = {r["chunk_hash"] for r in chunk_dedup_groups(docs).collect()}
    assert shared <= dd


def test_prefix_edit_shifts_o1_chunks(spark):
    """Prepending words changes at most the chunks before the first
    surviving boundary — every later chunk hash is unchanged."""
    base = " ".join(f"w{i % 13}q{i % 5}" for i in range(200))
    docs = _df(spark, [(1, base), (2, "inserted prefix words " + base)])
    ch = content_defined_chunks(docs)
    h1 = [r["chunk_hash"] for r in ch.filter("doc_id = 1").orderBy("chunk_idx").collect()]
    h2 = [r["chunk_hash"] for r in ch.filter("doc_id = 2").orderBy("chunk_idx").collect()]
    missing = [h for h in h1 if h not in set(h2)]
    assert len(missing) <= 2, f"{len(missing)} of {len(h1)} chunks shifted"


def test_short_and_empty_docs(spark):
    docs = _df(spark, [(1, ""), (2, "  "), (3, "one"), (4, "one two")])
    rows = content_defined_chunks(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc and 2 not in by_doc  # empty docs: no rows
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_tokens"] == 1
    assert len(by_doc[4]) == 1 and by_doc[4][0]["chunk_text"] == "one two"
    # sub-window docs are single chunks by construction
    assert all(r["chunk_idx"] == 0 for r in by_doc[3] + by_doc[4])
    assert WINDOW > 2  # the fixture above assumes w >= 3


def test_containment_catches_asymmetric_quote(spark):
    """A long doc embedding a short doc verbatim must score containment
    ≈ 1.0 even though Jaccard over the union is low — the case this
    operator exists for."""
    from video_metadata_db_spark.operators.chunking import doc_containment_pairs

    short = " ".join(f"quote{i}" for i in range(80))
    long = (
        " ".join(f"body{i}" for i in range(300))
        + " "
        + short
        + " "
        + " ".join(f"tail{i}" for i in range(200))
    )
    docs = _df(spark, [(1, short), (2, long)])
    rows = doc_containment_pairs(docs, min_shared=2).collect()
    assert rows, "embedded passage must be detected"
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["containment"] >= 0.6  # most of the short doc's chunks recur

    # max_df cap drops boilerplate-hot chunks: a chunk in every doc
    # stops generating pairs once capped
    boiler = " ".join(f"b{i}" for i in range(40))
    many = _df(spark, [(i, boiler) for i in range(1, 7)])
    uncapped = doc_containment_pairs(many, min_shared=1).count()
    capped = doc_containment_pairs(many, min_shared=1, max_df=3).count()
    assert uncapped == 15 and capped == 0

    # the denominator must count the FULL chunk set even under max_df:
    # two docs sharing a rare passage atop per-pair boilerplate score
    # by their total chunks, not by the few join survivors
    rare = " ".join(f"rare{i}" for i in range(60))
    mixed = _df(
        spark,
        [(i, boiler + f" uniq{i} " + (rare if i <= 2 else "")) for i in range(1, 7)],
    )
    rows = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in doc_containment_pairs(mixed, min_shared=1, max_df=3).collect()
    }
    assert (1, 2) in rows
    full_sizes = {
        r["doc_id"]: r["cnt"]
        for r in content_defined_chunks(mixed)
        .groupBy("doc_id")
        .agg(F.countDistinct("chunk_hash").alias("cnt"))
        .collect()
    }
    assert rows[(1, 2)] < 1.0  # boilerplate chunks still count below
    assert rows[(1, 2)] <= round(1.0 - 1.0 / min(full_sizes[1], full_sizes[2]), 6) + 1e-9
