"""Text-analysis queries with DuckDB oracles (SURVEY.md §7 Phase 4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import (
    EN_STOPWORDS,
    alpha_ratio,
    avg_token_len,
    bpe_token_count,
    quality_score,
    stopword_ratio,
    token_count,
)
from ..operators.dedup import hash60, shingles_of_tokens, tokens_of
from ..sources.tables import load_table
from .registry import query

_H60 = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"
_STOPS = ", ".join(f"'{w}'" for w in EN_STOPWORDS)


@query(
    "text_quality_score",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text, lang,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS ltoks
  FROM documents
),
m AS (
  SELECT doc_id, lang,
         len(toks) AS n_tokens,
         round(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
               / greatest(length(text), 1), 6) AS alpha_ratio,
         round(len(list_filter(ltoks, x -> x IN ({_STOPS})))
               / greatest(len(toks), 1), 6) AS stop_ratio,
         round(list_aggregate(list_transform(toks, x -> length(x)), 'sum')
               / greatest(len(toks), 1), 6) AS avg_tok_len
  FROM t
)
SELECT doc_id, lang, n_tokens, alpha_ratio, stop_ratio, avg_tok_len,
       0.3 * least(n_tokens / 64.0, 1.0)
           + 0.3 * alpha_ratio
           + 0.2 * stop_ratio
           + 0.2 * (CASE WHEN avg_tok_len >= 3 AND avg_tok_len <= 10
                         THEN 1.0 ELSE 0.5 END) AS quality
FROM m
ORDER BY doc_id
""",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality metrics + composite score — the filter stage of
    a pre-training data pipeline, entirely JVM-side."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    # tokenize ONCE under a name used by every metric: the helpers are
    # higher-order (interpreted) expressions, so an inlined tokenizer
    # would re-split the text ~8x per row
    withtoks = docs.select("doc_id", "lang", "text", tokens_of(t).alias("_toks"))
    toks = F.col("_toks")
    return withtoks.select(
        "doc_id",
        "lang",
        token_count(t, toks).alias("n_tokens"),
        alpha_ratio(t).alias("alpha_ratio"),
        stopword_ratio(t, toks).alias("stop_ratio"),
        avg_token_len(t, toks).alias("avg_tok_len"),
        quality_score(t, toks).alias("quality"),
    ).orderBy("doc_id")


@query(
    "text_token_counts",
    oracle=r"""
SELECT doc_id,
       len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens,
       n_chars
FROM documents
ORDER BY doc_id
""",
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counting (cost estimation stage)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("ws_tokens"),
        bpe_token_count(F.col("text")).alias("bpe_tokens"),
        "n_chars",
    ).orderBy("doc_id")


@query(
    "text_lang_id",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS ltoks
  FROM documents
)
SELECT doc_id, lang,
       round(len(list_filter(ltoks, x -> x IN ({_STOPS})))
             / greatest(len(ltoks), 1), 6) AS en_score,
       CASE WHEN len(list_filter(ltoks, x -> x IN ({_STOPS})))
                 / greatest(len(ltoks), 1) >= 0.1
            THEN 'en' ELSE 'other' END AS lang_guess
FROM t
ORDER BY doc_id
""",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (en vs other) — the n-gram-profile
    heuristic reduced to its decisive feature for this corpus."""
    docs = load_table(spark, sf_dir, "documents")
    # lowered tokens materialized once; the score materialized once more
    # (two consumers: the value column and the threshold) — 1 split per
    # row instead of 4
    withlt = docs.select(
        "doc_id", "lang", tokens_of(F.lower(F.col("text"))).alias("_lt")
    )
    stops = F.size(F.filter(F.col("_lt"), lambda t: t.isin(*EN_STOPWORDS)))
    scored = withlt.select(
        "doc_id",
        "lang",
        F.round(stops / F.greatest(F.size("_lt"), F.lit(1)), 6).alias("en_score"),
    )
    return scored.select(
        "doc_id",
        "lang",
        "en_score",
        F.when(F.col("en_score") >= 0.1, "en").otherwise("other").alias("lang_guess"),
    ).orderBy("doc_id")


_FP_CTE = """
WITH g AS (
  SELECT doc_id, text, greatest(length(text) - 7, 1) AS n_grams FROM documents
),
hs AS (
  SELECT doc_id,
         [{h} FOR p IN range(1, n_grams + 1)] AS hlist
  FROM g
),
wins AS (
  SELECT doc_id,
         list_distinct([list_aggregate(hlist[p:p+3], 'min')
                        FOR p IN range(1, greatest(len(hlist) - 3, 1) + 1)]) AS fps
  FROM hs
)
""".format(h=_H60.format(x="substr(text, p, 8)"))


@query(
    "text_fingerprint",
    oracle=_FP_CTE
    + """
SELECT doc_id, len(fps) AS n_fingerprints, list_aggregate(fps, 'min') AS min_fp
FROM wins
ORDER BY doc_id
""",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (8-gram rolling hash, window 4): count +
    min per doc — the compact form for fingerprint-overlap joins.

    Shape: explode gram POSITIONS, hash each gram with a plain
    (whole-stage codegen) md5 expression, then a 4-row sliding
    window-min per doc.  Two traps avoided: the all-column-expression
    variant re-inlines the hash array into every window term under
    CollapseProject (quadratic md5 count), and hashing inside
    ``transform`` evaluates interpreted per element (~3× slower) —
    explode-then-project keeps the md5 linear AND compiled.
    """
    docs = load_table(spark, sf_dir, "documents")
    hs = (
        docs.select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(F.lit(1), F.greatest(F.length("text") - 7, F.lit(1)))
            ).alias("p"),
        )
        .select(
            "doc_id",
            (F.col("p") - 1).alias("pos0"),
            hash60(F.substring(F.col("text"), F.col("p"), 8)).alias("h"),
        )
    )
    per_doc = Window.partitionBy("doc_id")
    sliding = Window.partitionBy("doc_id").orderBy("pos0").rowsBetween(0, 3)
    wm = (
        hs.withColumn("n", F.count(F.lit(1)).over(per_doc))
        .withColumn("wmin", F.min("h").over(sliding))
        .filter(F.col("pos0") + 1 <= F.greatest(F.col("n") - 3, F.lit(1)))
    )
    return (
        wm.groupBy("doc_id")
        .agg(
            F.countDistinct("wmin").alias("n_fingerprints"),
            F.min("wmin").alias("min_fp"),
        )
        .orderBy("doc_id")
    )


#: Email/phone patterns — identical semantics under Java regex (Spark)
#: and RE2 (DuckDB): no backrefs, no lookaround.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"


@query(
    "text_pii_redact",
    oracle=rf"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@mail-' || source
              || '.com or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones,
       md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_hash
FROM aug
ORDER BY doc_id
""",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: count + redact emails and
    phone numbers, all codegen'd regex (no UDF).  The corpus carries no
    PII, so the query deterministically injects one email + one phone
    per doc (same expression on the oracle side) — the operator under
    test is the extraction/redaction, which at 100 TB must stay
    JVM-side: one pass, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail-"),
        F.col("source"),
        F.lit(".com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(t, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(_PHONE_RE), F.lit(0))).alias("n_phones"),
        F.md5(redacted).alias("redacted_hash"),
    ).orderBy("doc_id")


@query(
    "text_repetition",
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
freq AS (
  SELECT doc_id, u.tok, count(*) AS c
  FROM toks, unnest(t) AS u(tok)
  GROUP BY doc_id, u.tok
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       count(*) AS n_distinct,
       round(count(*) / sum(c), 6) AS type_token_ratio,
       round(max(c) / sum(c), 6) AS top_token_ratio
FROM freq
GROUP BY doc_id
ORDER BY doc_id
""",
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition metrics for quality filtering: type-token ratio and
    most-frequent-token share.  Two-level aggregation — (doc, token)
    partial counts collapse map-side, then a per-doc rollup; the only
    shuffle key is the doc id."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select("doc_id", F.explode(tokens_of(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        freq.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.round(F.count(F.lit(1)) / F.sum("c"), 6).alias("type_token_ratio"),
            F.round(F.max("c") / F.sum("c"), 6).alias("top_token_ratio"),
        )
        .orderBy("doc_id")
    )


@query(
    "filter_length_percentile",
    oracle="""
WITH counts AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok
  FROM documents
),
thr AS (
  SELECT round(quantile_cont(n_tok, 0.1), 6) AS lo,
         round(quantile_cont(n_tok, 0.9), 6) AS hi
  FROM counts
)
SELECT doc_id, n_tok
FROM counts, thr
WHERE n_tok >= lo AND n_tok <= hi
ORDER BY doc_id
""",
)
def q_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative length filter: keep docs between the exact P10
    and P90 of token count.  Two-phase: a tiny global-percentile
    aggregate (one row) broadcast back over the corpus — the standard
    shape for any corpus-statistic-relative filter at scale.  Both
    engines use linear-interpolation percentiles, rounded to 6 dp so
    float representation can't flip a boundary row."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.select("doc_id", token_count(F.col("text")).alias("n_tok"))
    thr = counts.agg(
        F.round(F.percentile("n_tok", F.lit(0.1)), 6).alias("lo"),
        F.round(F.percentile("n_tok", F.lit(0.9)), 6).alias("hi"),
    )
    return (
        counts.join(F.broadcast(thr))
        .filter((F.col("n_tok") >= F.col("lo")) & (F.col("n_tok") <= F.col("hi")))
        .select("doc_id", "n_tok")
        .orderBy("doc_id")
    )


@query(
    "filter_quality_rules",
    oracle=f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS n_toks,
         round(length(list_filter(string_split(lower(text), ''),
                                  c -> c BETWEEN 'a' AND 'z'))
               / greatest(length(text), 1), 6) AS alpha,
         round(len(list_filter(toks, x -> list_contains([{_STOPS}], lower(x))))
               / greatest(len(toks), 1), 6) AS stop_r
  FROM t
), judged AS (
  SELECT doc_id,
         CASE WHEN n_toks < 10 THEN 'too_short'
              WHEN n_toks > 1000 THEN 'too_long'
              WHEN alpha < 0.6 THEN 'low_alpha'
              WHEN stop_r < 0.05 THEN 'no_stopwords'
              ELSE 'keep' END AS verdict
  FROM m
)
SELECT verdict, count(*) AS n_docs,
       CAST(round(count(*) * 1.0 / (SELECT count(*) FROM judged), 6) AS DOUBLE)
         AS fraction
FROM judged GROUP BY verdict ORDER BY verdict
""",
)
def q_filter_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-cascade quality filter with per-rule reject
    accounting — the first-reject-wins CASE ladder gives every dropped
    doc ONE attributable reason, which is how corpus-filter ablations
    are actually reported.  All rules are codegen column expressions;
    one aggregate over the verdict; the doc-level verdict table (before
    the rollup) is the filter's real output at scale."""
    docs = load_table(spark, sf_dir, "documents")
    withtoks = docs.select("text", tokens_of(F.col("text")).alias("_toks"))
    n_toks = token_count(F.col("text"), F.col("_toks"))
    verdict = (
        F.when(n_toks < 10, "too_short")
        .when(n_toks > 1000, "too_long")
        .when(alpha_ratio(F.col("text")) < 0.6, "low_alpha")
        .when(stopword_ratio(F.col("text"), F.col("_toks")) < 0.05, "no_stopwords")
        .otherwise("keep")
    )
    judged = withtoks.select(verdict.alias("verdict"))
    counted = judged.groupBy("verdict").agg(F.count(F.lit(1)).alias("n_docs"))
    # corpus total via a window over the (tiny) verdict aggregate — no
    # second scan, no driver-side count action
    total = F.sum("n_docs").over(Window.partitionBy(F.lit(1)))
    return (
        counted.withColumn("fraction", F.round(F.col("n_docs") / total, 6))
        .orderBy("verdict")
    )


@query(
    "contamination_check",
    oracle=f"""
WITH bench AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0
), corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
), bench_grams AS (
  SELECT DISTINCT {_H60.format(x="g")} AS h
  FROM (
    SELECT unnest(list_transform(
             range(1, greatest(len(toks) - 4, 0) + 1),
             i -> list_aggregate(toks[i:i+4], 'string_agg', ' ')
           )) AS g
    FROM (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
          FROM bench)
    WHERE len(toks) >= 5
  )
), corpus_grams AS (
  SELECT doc_id, n_grams, h FROM (
    SELECT doc_id,
           len(gl) AS n_grams,
           unnest(list_transform(gl, g -> {_H60.format(x="g")})) AS h
    FROM (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 4, 0) + 1),
               i -> list_aggregate(toks[i:i+4], 'string_agg', ' ')
             )) AS gl
      FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM corpus)
      WHERE len(toks) >= 5
    )
  )
)
SELECT c.doc_id,
       count(DISTINCT c.h) AS n_hits,
       CAST(round(count(DISTINCT c.h) * 1.0 / any_value(c.n_grams), 6) AS DOUBLE)
         AS contaminated_frac
FROM corpus_grams c JOIN bench_grams b ON c.h = b.h
GROUP BY c.doc_id
HAVING count(DISTINCT c.h) >= 2
ORDER BY c.doc_id
""",
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: which training docs contain
    ≥2 distinct 5-gram overlaps with a held-out benchmark set (docs
    with ``doc_id % 50 == 0`` stand in for the benchmark).

    The at-scale shape: benchmark grams are DISTINCT-deduped and small
    (broadcast side); corpus grams stream through a broadcast semi-ish
    join — the corpus is never shuffled on the gram key, and per-doc
    aggregation shuffles only the surviving hits.  5-gram hashes are
    md5-derived (oracle-reproducible); word 5-shingles reuse the dedup
    shingle machinery."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)

    def grams(df: DataFrame) -> DataFrame:
        # materialize the shingle array under a name referenced twice
        # (size + explode): CollapseProject then can't re-inline the
        # zip_with chain after the Generate, which would rebuild the
        # whole array once per exploded row (~50× redundant work)
        sh_df = df.select(
            "doc_id", tokens_of(F.col("text")).alias("_toks")
        ).select("doc_id", shingles_of_tokens(F.col("_toks"), k=5).alias("grams"))
        return sh_df.select(
            "doc_id", F.size("grams").alias("n_grams"), F.explode("grams").alias("g")
        ).select("doc_id", "n_grams", hash60(F.col("g")).alias("h"))

    bench_grams = grams(bench).select("h").distinct()
    hits = grams(corpus).join(F.broadcast(bench_grams), "h")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.countDistinct("h").alias("n_hits"),
            F.round(F.countDistinct("h") / F.any_value("n_grams"), 6).alias(
                "contaminated_frac"
            ),
        )
        .filter(F.col("n_hits") >= 2)
        .orderBy("doc_id")
    )


@query(
    "pack_sequences",
    oracle="""
WITH weighted AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
  FROM documents
),
offs AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM weighted WHERE n_tokens > 0
)
SELECT doc_id, n_tokens, start_offset,
       start_offset // 512 AS first_block,
       (start_offset + n_tokens - 1) // 512 AS last_block,
       (start_offset + n_tokens - 1) // 512 - start_offset // 512 + 1 AS n_blocks
FROM offs
ORDER BY doc_id
""",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-chunk, block 512) — where every doc
    lands when the corpus token stream is sliced into fixed training
    blocks.  The Spark side is the DISTRIBUTED two-pass prefix sum
    (``operators/packing.py``: range partition → per-partition totals →
    broadcast offsets → per-partition windows); the oracle is the
    single-window form the naive plan would use — value-identical, and
    the single-partition bottleneck stays in DuckDB where it belongs.
    ``tests/test_packing.py`` pins distributed == naive on Spark too."""
    from ..operators.packing import pack_blocks

    docs = load_table(spark, sf_dir, "documents")
    weighted = docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))
    return pack_blocks(weighted, block_size=512).orderBy("doc_id")


@query(
    "source_mixture_report",
    oracle=f"""
WITH t AS (
  SELECT source,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
         length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
           / greatest(length(text), 1) AS araw
  FROM documents
),
per_source AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         round(sum(n_tokens) / count(*), 6) AS avg_tokens,
         round(avg(araw), 6) AS avg_alpha
  FROM t GROUP BY source
)
SELECT source, n_docs, total_tokens, avg_tokens, avg_alpha,
       round(total_tokens / (sum(total_tokens) OVER ()), 6) AS token_share
FROM per_source
ORDER BY source
""",
)
def q_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture report: per-source doc/token totals and each
    source's share of the corpus token stream — the table a pretraining
    run turns into sampling weights.  One partial-able aggregation
    shuffle on `source` (tiny group key), then a window-sum over the
    per-source rows (|sources| rows — negligible at any corpus size);
    the corpus itself is scanned once."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        token_count(F.col("text")).alias("n_tokens"),
        (
            F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
            / F.greatest(F.length("text"), F.lit(1))
        ).alias("araw"),
    )
    per_source = t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.sum("n_tokens") / F.count(F.lit(1)), 6).alias("avg_tokens"),
        F.round(F.avg("araw"), 6).alias("avg_alpha"),
    )
    share_w = Window.partitionBy(F.lit(1))
    return per_source.select(
        "source",
        "n_docs",
        "total_tokens",
        "avg_tokens",
        "avg_alpha",
        F.round(F.col("total_tokens") / F.sum("total_tokens").over(share_w), 6).alias(
            "token_share"
        ),
    ).orderBy("source")


@query(
    "topk_diverse_docs",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS src_rank
  FROM documents
)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(src_rank AS INTEGER) AS src_rank
FROM ranked
WHERE src_rank <= 5
ORDER BY n_chars DESC, doc_id
LIMIT 20
""",
)
def q_topk_diverse_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-capped top-k: the 20 longest documents with AT MOST 5
    per source — the fairness constraint a curation sampler applies so
    one dominant source can't monopolize a global top-k (same pattern
    serves "top ads per advertiser", "top results per domain").

    Scale shape: the per-source cap runs FIRST as a partitioned
    window (WindowGroupLimit prunes to ≤5 rows per source before any
    global work — the same plan gate as `window_topk_per_group`), then
    the global top-20 is TakeOrderedAndProject over the |sources|·5
    survivors.  Keys are total orders (n_chars desc, doc_id), both
    steps integer-exact."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        docs.withColumn("src_rank", F.row_number().over(w))
        .filter(F.col("src_rank") <= 5)
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("src_rank").cast("int").alias("src_rank"),
        )
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .limit(20)
    )


_FH_BUCKETS = 64


@query(
    "feature_hashing",
    oracle=f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
hashed AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(concat('fh:', term)), 1, 15)) AS BIGINT)
           % {_FH_BUCKETS} AS bucket,
         CASE WHEN substr(md5(concat('fs:', term)), 1, 1)
                   IN ('0','1','2','3','4','5','6','7')
              THEN 1 ELSE -1 END AS sign
  FROM toks
)
SELECT doc_id, CAST(bucket AS INTEGER) AS bucket,
       CAST(SUM(sign) AS BIGINT) AS feature_value
FROM hashed
GROUP BY doc_id, bucket
HAVING SUM(sign) <> 0
ORDER BY doc_id, bucket
""",
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing-trick vectorizer (signed feature hashing à la
    Weinberger et al.): every token maps to one of {_FH_BUCKETS}
    buckets by hash, with a second hash choosing ±1 so collisions
    cancel in expectation — the UNBOUNDED-VOCABULARY featurizer that
    needs no fitted dictionary, no broadcast vocab, and no second
    pass, which is why it's the default at 100 TB (a fitted TF-IDF
    vocab is itself corpus-sized state; this is stateless).

    Exactness: bucket and sign are md5-derived integers (the same
    hash60 discipline as the dedup family), features are exact signed
    counts; zero-sum cells are dropped on both sides.  Scale shape:
    tokenize → hash → ONE partial-aggregatable (doc, bucket) shuffle;
    output is sparse (≤{_FH_BUCKETS} cells/doc)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens_of(F.col("text"))).alias("term"))
    hashed = toks.select(
        "doc_id",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("fh:"), F.col("term"))), 1, 15),
                16,
                10,
            ).cast("long")
            % _FH_BUCKETS
        ).alias("bucket"),
        F.when(
            F.substring(F.md5(F.concat(F.lit("fs:"), F.col("term"))), 1, 1).isin(
                *"01234567"
            ),
            1,
        )
        .otherwise(-1)
        .alias("sign"),
    )
    return (
        hashed.groupBy("doc_id", "bucket")
        .agg(F.sum("sign").alias("feature_value"))
        .filter(F.col("feature_value") != 0)
        .select(
            "doc_id",
            F.col("bucket").cast("int").alias("bucket"),
            F.col("feature_value").cast("long").alias("feature_value"),
        )
        .orderBy("doc_id", "bucket")
    )


# ------------------------------------------ vocabulary coverage audit ---

_OOV_SQL = """
WITH toks AS (
  SELECT source, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
  FROM documents
),
vocab AS (
  SELECT term FROM (
    SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term
    ORDER BY cnt DESC, term
    LIMIT 500
  )
),
flagged AS (
  SELECT t.source,
         CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS is_oov
  FROM toks t LEFT JOIN vocab v USING (term)
)
SELECT source,
       COUNT(*) AS n_tokens,
       CAST(SUM(is_oov) AS BIGINT) AS n_oov,
       CAST((SUM(is_oov) * 1000000) // COUNT(*) AS BIGINT) AS oov_per_million
FROM flagged
GROUP BY source
ORDER BY source
"""


@query("vocab_oov_rate", oracle=_OOV_SQL)
def q_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: fix the vocabulary at the
    top-500 corpus terms (count DESC, term — a total order) and report
    each source's out-of-vocabulary token rate — the go/no-go check run
    before committing a tokenizer to a training mix (a high-OOV source
    wastes context on fragment tokens).

    Plan at scale: term frequencies are one map-side-combining
    aggregate; the top-500 cut runs as TakeOrderedAndProject (never a
    global sort); the fixed vocab is then BROADCAST back and the corpus
    token stream left-joins it locally — zero shuffle on the scoring
    pass beyond the final per-source aggregate.  Rates are reported as
    exact integer parts-per-million (floor division), never a float
    ratio, so any parallelism produces identical bytes."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(tokens_of(F.col("text"))).alias("term"))
    vocab = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "term")
        .limit(500)
        .select("term")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("in_v", F.lit(1))), "term", "left"
    ).select(
        "source",
        F.when(F.col("in_v").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_oov"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("is_oov").alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.expr("CAST((n_oov * 1000000) div n_tokens AS BIGINT)")
            .alias("oov_per_million"),
        )
        .orderBy("source")
    )


@query(
    "lang_mismatch_audit",
    oracle=f"""
WITH t AS (
  SELECT lang,
         CASE WHEN len(list_filter(list_filter(string_split(lower(text), ' '),
                                               x -> x <> ''),
                                   x -> x IN ({_STOPS})))
                   / greatest(len(list_filter(string_split(lower(text), ' '),
                                              x -> x <> '')), 1) >= 0.1
              THEN 'en' ELSE 'other' END AS lang_guess
  FROM documents
)
SELECT lang, lang_guess,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST((count(*) * 1000000)
            // SUM(count(*)) OVER (PARTITION BY lang) AS BIGINT)
         AS share_of_label_ppm
FROM t
GROUP BY lang, lang_guess
ORDER BY lang, lang_guess
""",
)
def q_lang_mismatch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-vs-content language agreement: the confusion matrix
    between the DECLARED lang column and the stopword-profile guess
    `text_lang_id` computes — the mislabeled-metadata detector (a
    label whose guess-share drifts release-over-release means the
    upstream tagger or the scrape changed; `nb_lang_confusion` checks
    the learned classifier, this checks the pipeline's own labels).

    One corpus scan scoring the same fused stopword expression as
    `text_lang_id`, one (label, guess) rollup with the share window on
    the |langs|×2 matrix; shares are exact integer ppm."""
    docs = load_table(spark, sf_dir, "documents")
    lt = tokens_of(F.lower(F.col("text")))
    stops = F.size(F.filter(lt, lambda t: t.isin(*EN_STOPWORDS)))
    guess = F.when(
        stops / F.greatest(F.size(lt), F.lit(1)) >= 0.1, "en"
    ).otherwise("other")
    t = docs.select("lang", guess.alias("lang_guess"))
    return (
        t.groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "share_of_label_ppm",
            F.expr(
                "CAST((n_docs * 1000000) div "
                "SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT)"
            ),
        )
        .orderBy("lang", "lang_guess")
    )


#: DSIR hashed-feature dimensionality: buckets the unigram space is
#: hashed into.  Small on purpose — the method (Xie et al. 2023,
#: "Data Selection for Language Models via Importance Resampling")
#: works with hash collisions; what matters is that target and raw
#: distributions share the same buckets.
_DSIR_BUCKETS = 64


def _dsir_oracle() -> str:
    h8 = "CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT)"
    return f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(list_filter(string_split(text, ' '),
                                          x -> x <> '')) AS tok
  FROM documents
),
b AS (
  SELECT doc_id, lang, {h8} % {_DSIR_BUCKETS} AS bucket FROM toks
),
dist AS (
  SELECT bucket,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS cnt_t,
         count(*) AS cnt_r
  FROM b GROUP BY bucket
),
ratio AS (
  SELECT bucket,
         CAST(round((ln((cnt_t + 1.0)
                        / (sum(cnt_t) OVER () + {_DSIR_BUCKETS}))
                     - ln((cnt_r + 1.0)
                          / (sum(cnt_r) OVER () + {_DSIR_BUCKETS})))
                    * 1000000, 0) AS BIGINT) AS lr_micro
  FROM dist
),
per_doc AS (
  SELECT doc_id, bucket, count(*) AS c FROM b GROUP BY 1, 2
)
SELECT d.doc_id,
       CAST(sum(d.c) AS BIGINT) AS n_tokens,
       round(sum(d.c * r.lr_micro) / 1000000.0, 4) AS dsir_weight
FROM per_doc d JOIN ratio r USING (bucket)
GROUP BY d.doc_id
ORDER BY dsir_weight DESC, d.doc_id
LIMIT 20
"""


@query("dsir_importance_weights", oracle=_dsir_oracle())
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): score every raw document
    by how target-like its hashed n-gram profile is — weight =
    Σ_buckets count · log(p_target / p_raw) with add-1 smoothing over
    {_DSIR_BUCKETS} md5-hashed unigram buckets; target = the 'en'
    slice, raw = the whole corpus.  Top-20 weights are the documents
    importance resampling would keep first when building an
    English-targeted training mix from a mixed-language crawl.

    Float discipline: log-ratios are ln-derived, so they are quantized
    to exact INTEGER micro-units before the per-doc sum — an integer
    sum is partial-order-invariant, so cross-partition reduce order
    (run to run AND engine to engine) cannot wiggle a value across the
    4-dp output rounding; a double sum here flipped a boundary doc
    between runs at sf0.001.

    Scale: one token scan feeds BOTH distributions (conditional
    aggregate — no second pass for the target), the bucket table is
    {_DSIR_BUCKETS} rows and broadcasts, and the per-doc reduce
    shuffles (doc, bucket) pairs — bounded by docs × buckets, not
    token count.  This is the published DSIR architecture: hashed
    features exist precisely so corpus-scale selection never
    materializes a vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("tok"),
    )
    b = toks.select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
            % _DSIR_BUCKETS
        ).alias("bucket"),
    )
    dist = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("cnt_t"),
        F.count(F.lit(1)).alias("cnt_r"),
    )
    w_all = Window.partitionBy()
    ratio = dist.select(
        "bucket",
        F.round(
            (
                F.log(
                    (F.col("cnt_t") + 1.0)
                    / (F.sum("cnt_t").over(w_all) + _DSIR_BUCKETS)
                )
                - F.log(
                    (F.col("cnt_r") + 1.0)
                    / (F.sum("cnt_r").over(w_all) + _DSIR_BUCKETS)
                )
            )
            * 1000000,
            0,
        )
        .cast("long")
        .alias("lr_micro"),
    )
    per_doc = b.groupBy("doc_id", "bucket").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_doc.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("c") * F.col("lr_micro")) / 1000000.0, 4
            ).alias("dsir_weight"),
        )
        .orderBy(F.col("dsir_weight").desc(), "doc_id")
        .limit(20)
    )


@query(
    "heaps_law_fit",
    oracle="""
WITH mx AS (SELECT max(doc_id) AS m FROM documents),
tok0 AS (
  SELECT (doc_id * 10) // ((SELECT m FROM mx) + 1) AS bucket,
         list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT bucket, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS term
  FROM tok0, unnest(range(1, greatest(len(t) - 2, 0) + 1)) AS r(i)
),
term_first AS (
  SELECT term, min(bucket) AS first_bucket FROM sh GROUP BY term
),
new_terms AS (
  SELECT first_bucket AS bucket, count(*) AS v FROM term_first GROUP BY 1
),
bucket_tokens AS (
  SELECT bucket, sum(len(t)) AS n FROM tok0 GROUP BY bucket
),
grid AS (SELECT unnest(generate_series(1, 10)) AS k),
cum AS (
  SELECT g.k,
         (SELECT COALESCE(sum(n), 0) FROM bucket_tokens b WHERE b.bucket < g.k)
           AS cum_tokens,
         (SELECT COALESCE(sum(v), 0) FROM new_terms t WHERE t.bucket < g.k)
           AS cum_vocab
  FROM grid g
),
fit AS (
  SELECT (count(*) * sum(ln(cum_tokens) * ln(cum_vocab))
            - sum(ln(cum_tokens)) * sum(ln(cum_vocab)))
         / (count(*) * sum(ln(cum_tokens) * ln(cum_tokens))
            - sum(ln(cum_tokens)) * sum(ln(cum_tokens))) AS beta_raw,
         avg(ln(cum_vocab)) AS my, avg(ln(cum_tokens)) AS mx2
  FROM cum
)
SELECT k AS prefix_decile,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST(cum_vocab AS BIGINT) AS cum_vocab,
       CAST(round(beta_raw, 6) AS DOUBLE) AS heaps_beta,
       CAST(round(exp(my - beta_raw * mx2), 6) AS DOUBLE) AS heaps_k
FROM cum CROSS JOIN fit
ORDER BY k
""",
)
def q_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAPS'-LAW vocabulary-growth audit: V(n) = K·n^beta fitted over
    ten nested corpus prefixes — the planning curve for tokenizer
    vocabulary sizing and dedup health (a corpus whose beta stays near
    1 is accumulating boilerplate-free novel text; heavy duplication
    pushes beta down).  The vocabulary unit is the 3-token SHINGLE (the
    dedup family's unit): the synthetic corpus draws unigrams from a
    closed word list, so unigram V saturates in the first decile —
    shingle space is combinatorial and actually grows, which is also
    the right unit for boilerplate detection.  Prefixes are
    deterministic doc-id value deciles (integer arithmetic off one
    broadcast max), so the family is nested by construction; V at each
    prefix comes from each shingle's FIRST decile (one groupBy min —
    never ten distinct-counts over ten prefix scans), token mass from
    one per-decile size sum; the log-log OLS runs on the 10-point
    frame.

    Scale: ONE tokenize feeds both aggregates (shingles via the
    zip-with construction, no index explode); per-shingle and
    per-bucket frames shuffle once each; everything past the groupBys
    is 10-row arithmetic.  Output: the 10 (cumulative tokens, vocab)
    points with the fitted beta / K alongside."""
    docs = load_table(spark, sf_dir, "documents")
    mx = docs.agg(F.max("doc_id").alias("m"))
    tok0 = docs.join(F.broadcast(mx)).select(
        F.expr("(doc_id * 10) div (m + 1)").alias("bucket"),
        tokens_of(F.col("text")).alias("t"),
    )
    sh = tok0.select(
        "bucket", F.explode(shingles_of_tokens(F.col("t"))).alias("term")
    ).distinct()
    term_first = sh.groupBy("term").agg(F.min("bucket").alias("first_bucket"))
    new_terms = term_first.groupBy(F.col("first_bucket").alias("bucket")).agg(
        F.count(F.lit(1)).alias("v")
    )
    bucket_tokens = tok0.groupBy("bucket").agg(
        F.sum(F.size("t")).alias("n")
    )
    grid = spark.range(1, 11).select(F.col("id").alias("k"))
    cum = (
        grid.join(F.broadcast(bucket_tokens), F.col("bucket") < F.col("k"), "left")
        .groupBy("k")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("cum_tokens"))
        .join(
            grid.join(
                F.broadcast(new_terms), F.col("bucket") < F.col("k"), "left"
            )
            .groupBy("k")
            .agg(F.coalesce(F.sum("v"), F.lit(0)).alias("cum_vocab")),
            "k",
        )
    )
    fit = cum.agg(
        (
            (
                F.count(F.lit(1))
                * F.sum(F.log("cum_tokens") * F.log("cum_vocab"))
                - F.sum(F.log("cum_tokens")) * F.sum(F.log("cum_vocab"))
            )
            / (
                F.count(F.lit(1))
                * F.sum(F.log("cum_tokens") * F.log("cum_tokens"))
                - F.sum(F.log("cum_tokens")) * F.sum(F.log("cum_tokens"))
            )
        ).alias("beta_raw"),
        F.avg(F.log("cum_vocab")).alias("my"),
        F.avg(F.log("cum_tokens")).alias("mx2"),
    )
    return (
        cum.crossJoin(F.broadcast(fit))
        .select(
            F.col("k").cast("long").alias("prefix_decile"),
            F.col("cum_tokens").cast("long").alias("cum_tokens"),
            F.col("cum_vocab").cast("long").alias("cum_vocab"),
            F.round("beta_raw", 6).cast("double").alias("heaps_beta"),
            F.round(
                F.exp(F.col("my") - F.col("beta_raw") * F.col("mx2")), 6
            )
            .cast("double")
            .alias("heaps_k"),
        )
        .orderBy("prefix_decile")
    )


@query(
    "cohens_kappa_langid",
    oracle=f"""
WITH t AS (
  SELECT lang = 'en' AS actual_en,
         len(list_filter(list_filter(string_split(lower(text), ' '),
                                     x -> x <> ''),
                         x -> x IN ({_STOPS})))
           / greatest(len(list_filter(string_split(lower(text), ' '),
                                      x -> x <> '')), 1) >= 0.1 AS pred_en
  FROM documents
),
cm AS (
  SELECT count(*) AS n,
         sum(CASE WHEN pred_en AND actual_en THEN 1 ELSE 0 END) AS tp,
         sum(CASE WHEN pred_en AND NOT actual_en THEN 1 ELSE 0 END) AS fp,
         sum(CASE WHEN NOT pred_en AND actual_en THEN 1 ELSE 0 END) AS fn,
         sum(CASE WHEN NOT pred_en AND NOT actual_en THEN 1 ELSE 0 END)
           AS tn
  FROM t
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       CAST(round((tp + tn) / (1.0 * n), 6) AS DOUBLE) AS accuracy,
       CAST(round(((1.0 * n * (tp + tn))
                   - (1.0 * (tp + fp) * (tp + fn)
                      + 1.0 * (fn + tn) * (fp + tn)))
                  / ((1.0 * n * n)
                     - (1.0 * (tp + fp) * (tp + fn)
                        + 1.0 * (fn + tn) * (fp + tn))), 6) AS DOUBLE)
         AS cohens_kappa
FROM cm
""",
)
def q_cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S KAPPA for the stopword language-ID heuristic against the
    metadata label — the chance-corrected agreement scalar that
    `nb_lang_confusion`'s raw confusion matrix doesn't give: on an
    imbalanced corpus a majority-class guesser scores high accuracy but
    kappa ≈ 0, so kappa is what a labeling-quality gate thresholds
    (Landis-Koch bands).  κ = (p_o − p_e)/(1 − p_e) computed from
    exact integer confusion counts cross-multiplied before ONE final
    division (n·(tp+tn) vs marginal products over n² — no intermediate
    ratios, so both engines divide identical integers).

    Scale: one token scan into a 4-cell confusion aggregate; everything
    after is scalar arithmetic.  The same plan scores ANY pair of
    binary labelers (model-vs-model agreement, annotator QA)."""
    docs = load_table(spark, sf_dir, "documents")
    withlt = docs.select(
        (F.col("lang") == "en").alias("actual_en"),
        tokens_of(F.lower(F.col("text"))).alias("_lt"),
    )
    stops = F.size(F.filter(F.col("_lt"), lambda t: t.isin(*EN_STOPWORDS)))
    t = withlt.select(
        "actual_en",
        (stops / F.greatest(F.size("_lt"), F.lit(1)) >= 0.1).alias("pred_en"),
    )
    cm = t.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("pred_en") & F.col("actual_en"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred_en") & ~F.col("actual_en"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred_en") & F.col("actual_en"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~F.col("pred_en") & ~F.col("actual_en"), 1).otherwise(0)).alias("tn"),
    )
    pe_num = (
        1.0 * (F.col("tp") + F.col("fp")) * (F.col("tp") + F.col("fn"))
        + 1.0 * (F.col("fn") + F.col("tn")) * (F.col("fp") + F.col("tn"))
    )
    return cm.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.col("tn").cast("long").alias("tn"),
        F.round((F.col("tp") + F.col("tn")) / (1.0 * F.col("n")), 6).alias(
            "accuracy"
        ),
        F.round(
            (1.0 * F.col("n") * (F.col("tp") + F.col("tn")) - pe_num)
            / (1.0 * F.col("n") * F.col("n") - pe_num),
            6,
        ).alias("cohens_kappa"),
    )
