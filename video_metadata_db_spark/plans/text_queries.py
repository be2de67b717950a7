"""Text-analysis queries with DuckDB oracles (SURVEY.md §7 Phase 4)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import (
    EN_STOPWORDS,
    alpha_ratio,
    avg_token_len,
    bpe_token_count,
    char_ngram_hashes,
    quality_score,
    stopword_ratio,
    token_count,
)
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
    return docs.select(
        "doc_id",
        "lang",
        token_count(t).alias("n_tokens"),
        alpha_ratio(t).alias("alpha_ratio"),
        stopword_ratio(t).alias("stop_ratio"),
        avg_token_len(t).alias("avg_tok_len"),
        quality_score(t).alias("quality"),
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
    score = stopword_ratio(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        score.alias("en_score"),
        F.when(score >= 0.1, "en").otherwise("other").alias("lang_guess"),
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

    Shape: hash array computed ONCE per doc, posexploded, then a
    4-row sliding window-min per doc.  (The all-column-expression
    variant re-inlines the hash array into every window term under
    CollapseProject — quadratic md5 count; this form is linear.)
    """
    docs = load_table(spark, sf_dir, "documents")
    hs = docs.select(
        "doc_id", F.posexplode(char_ngram_hashes(F.col("text"))).alias("pos0", "h")
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
