"""Content-defined chunking — sub-document dedup granularity.

Document-level dedup misses the dominant duplication mode in web/code
corpora: SHARED PASSAGES inside otherwise-distinct documents
(boilerplate, licenses, quoted threads).  The standard answer is
content-defined chunking (the rolling-hash boundary trick from LBFS /
restic / data-dedup storage): cut a token stream where a rolling
window's hash satisfies ``hash % divisor == 0``.  Because boundaries
depend only on LOCAL content, an insertion early in a document shifts
at most one chunk — unlike fixed-width chunks, where every later chunk
changes — so identical passages yield identical chunks wherever they
appear, and chunk-hash dedup finds them with an exact groupBy.

Implementation is array-native Catalyst (no explode-then-window, no
per-token shuffle): token grams via the zip-shift trick, boundary
positions / chunk ranges as array expressions, one ``posexplode`` at
the very end to emit chunk rows.  Per-row cost is linear in tokens;
the only shuffle is whatever the consumer does with the chunk rows.
Determinism: boundaries come from the md5-derived :func:`~.dedup.hash60`,
so the whole construction replays in DuckDB SQL and every query below
is value-oracled.

At 100 TB: chunking is embarrassingly parallel (scan-only); the
chunk-hash dedup groupBy shuffles (hash, doc, idx) triples — chunk
TEXT never needs to shuffle (hash first, join text back for the few
survivors if needed).  Mean chunk length is ``divisor`` tokens
(geometric); min/max clamps are deliberately omitted — they make
boundaries history-dependent (a sequential state machine), killing
both the array-parallel form and the SQL oracle, and matter only for
storage systems where pathological chunk sizes cost I/O.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import hash60, tokens_of

#: Rolling window width (tokens) and the boundary divisor: a boundary
#: closes a chunk after token p when hash60 of the w-gram ending at p
#: is ≡ 0 mod DIVISOR → mean chunk ≈ DIVISOR tokens.
WINDOW = 3
DIVISOR = 16


def sliding_grams(toks: Column, w: int = WINDOW) -> Column:
    """ALL order-preserving w-token grams (duplicates kept — unlike
    :func:`~.dedup.shingles_of_tokens`, which distincts for set
    semantics).  Gram i (0-based) covers tokens [i, i+w-1]."""
    n = F.size(toks)
    acc = toks
    for j in range(1, w):
        shifted = F.slice(toks, j + 1, F.greatest(n - j, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.when(n >= w, F.slice(acc, 1, F.greatest(n - (w - 1), F.lit(0)))).otherwise(
        F.array().cast("array<string>")
    )


def content_defined_chunks(
    docs: DataFrame,
    w: int = WINDOW,
    divisor: int = DIVISOR,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_hash, chunk_text) — the
    document cut at content-defined boundaries.

    A document shorter than ``w`` tokens is one chunk (no grams → no
    boundaries); an empty document yields no rows.  ``chunk_hash`` is
    md5 of the chunk text — the key sub-document dedup groups on.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens_of(F.col(text_col)).alias("toks")
    )
    grams = toks.select(
        "doc_id", "toks", sliding_grams(F.col("toks"), w).alias("grams")
    )
    # 0-based positions whose token CLOSES a chunk: gram i covers
    # [i, i+w-1], so a flagged gram closes at p = i + w - 1
    bounds = grams.select(
        "doc_id",
        "toks",
        F.filter(
            F.transform(
                F.col("grams"),
                lambda g, i: F.when(hash60(g) % divisor == 0, i + (w - 1)),
            ),
            lambda p: p.isNotNull(),
        ).alias("bp"),
    )
    n = F.size("toks")
    starts = F.concat(
        F.array(F.lit(0)), F.transform(F.col("bp"), lambda p: p + 1)
    )
    ends = F.concat(F.col("bp"), F.array(n - 1))
    # drop the empty trailing range when the last token is a boundary
    # (start n > end n-1), and everything for empty docs ([0] vs [-1])
    ranges = bounds.select(
        "doc_id",
        "toks",
        F.filter(
            F.zip_with(starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))),
            lambda r: r["s"] <= r["e"],
        ).alias("ranges"),
    )
    # Materialize chunk texts INSIDE the array domain, then explode the
    # (n_tokens, text) structs: the generator output carries only the
    # chunk strings — exploding the ranges instead would duplicate the
    # full token array once per chunk row AND re-evaluate the
    # slice+join per downstream reference (CollapseProject inlines it
    # into both md5(chunk_text) and chunk_text — measured ~2× on the
    # sf0.1 bench before this form).
    chunked = ranges.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.col("ranges"),
                lambda r: F.struct(
                    (r["e"] - r["s"] + 1).alias("n_tokens"),
                    F.array_join(
                        F.slice(F.col("toks"), r["s"] + 1, r["e"] - r["s"] + 1), " "
                    ).alias("txt"),
                ),
            )
        ).alias("chunk_idx", "c"),
    )
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("c.n_tokens").cast("long").alias("n_tokens"),
        F.md5(F.col("c.txt")).alias("chunk_hash"),
        F.col("c.txt").alias("chunk_text"),
    )


def doc_containment_pairs(
    docs: DataFrame,
    min_shared: int = 2,
    max_df: int | None = None,
    w: int = WINDOW,
    divisor: int = DIVISOR,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Containment detection: document pairs sharing ≥ ``min_shared``
    content-defined chunks, scored by the containment ratio
    |shared| / min(|chunks_a|, |chunks_b|) — near 1.0 when one
    document quotes or embeds the other, the case Jaccard-style
    near-dup misses (a long doc containing a short doc verbatim has
    low Jaccard but full containment).

    Inverted-index shape (the same discipline as
    :func:`~.dedup.ngram_jaccard_pairs`): join docs on shared chunk
    HASH, count co-occurrences per pair — O(Σ chunk-group²), never
    O(n²).  ``max_df`` drops chunks present in more than that many
    docs (boilerplate chunks are the hot keys and carry no pairing
    signal beyond the first few dozen docs — the skew bomb at scale).
    """
    from .dedup import _scoped_persist

    # the (doc, hash) index feeds sizes + BOTH self-join sides — without
    # a persist the whole chunking pipeline executes up to 4×; the
    # frame joins the dedup family's LRU cache scope (release via
    # release_dedup_caches, same contract as the MinHash signatures)
    chunks = _scoped_persist(
        content_defined_chunks(docs, w, divisor, text_col, id_col)
        .select("doc_id", "chunk_hash")
        .distinct()
    )
    # the denominator counts a document's FULL chunk set — computing it
    # after the max_df filter would inflate containment for
    # boilerplate-heavy docs (2 surviving chunks shared out of 100
    # total must score 0.02, not 1.0); the cap prunes only the JOIN
    sizes = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    if max_df is not None:
        rare = (
            chunks.groupBy("chunk_hash")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
        )
        chunks = chunks.join(rare.select("chunk_hash"), "chunk_hash")
    a, b = chunks.alias("a"), chunks.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.chunk_hash") == F.col("b.chunk_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_chunks").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_chunks").alias("nb"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.round(F.col("n_shared") / F.least("na", "nb"), 6).alias("containment"),
        )
    )


def chunk_dedup_groups(
    docs: DataFrame,
    w: int = WINDOW,
    divisor: int = DIVISOR,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated chunks: one row per chunk content that
    appears more than once in the corpus — (chunk_hash, n_copies,
    n_docs, canonical doc/idx, n_tokens).  The sub-document analogue of
    :func:`~.dedup.exact_dedup`: one groupBy on the chunk hash, chunk
    text never shuffles."""
    chunks = content_defined_chunks(docs, w, divisor, text_col, id_col)
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min(F.struct("doc_id", "chunk_idx")).alias("_c"),
            F.min("n_tokens").alias("n_tokens"),
        )
        .filter(F.col("n_copies") > 1)
        .select(
            "chunk_hash",
            "n_copies",
            "n_docs",
            F.col("_c.doc_id").alias("canonical_doc"),
            F.col("_c.chunk_idx").alias("canonical_idx"),
            "n_tokens",
        )
    )
