"""Distributed BPE merge training — learning the tokenizer itself.

`encode_tokens` (vocab induction + OOV hashing) and `vocab_bigrams`
(merge-candidate counts) stop one step short of what a tokenizer
pipeline actually produces: the ORDERED MERGE LIST byte-pair encoding
is defined by.  This operator trains it, Spark-first:

- the corpus-sized pass happens ONCE — tokens → (word, count), the
  classic BPE reduction (training then runs over the word-count table,
  |vocab| rows, exactly how production trainers work);
- each merge round is one tiny aggregate (adjacent-pair counts weighted
  by word count, map-side partials) + a 1-row driver argmax + a
  lazy column rewrite; round cost is O(|vocab|), independent of corpus
  size, so 100 TB of text prices the same as its distinct-word table
  after the first scan.

Determinism contract (what makes the unrolled DuckDB oracle possible):
the best pair maximizes (count, then lexicographically smallest left,
then right); the merge applies LEFT-TO-RIGHT NON-OVERLAPPING — both
engines express it as the same literal string `replace` over a
separator-delimited segmentation, so agreement is bit-exact:

    segmentation  =  ␟␟sym₁␟␟sym₂␟␟…␟␟   (␟ = U+001F, double between
                                          symbols, double at both ends)
    merge (a, b)  =  replace("␟a␟␟b␟" → "␟ab␟")

The single-␟ pattern edges consume only the INNER separator of each
flanking pair, so every replacement leaves a well-formed string and
adjacent occurrences merge in the same greedy order a per-word
left-to-right scan would produce (replace() scans left-to-right and
never rescans replaced output — and a merged symbol is strictly longer
than its left part, so it can never cascade within the round).
Words containing U+001F are dropped (separator reservation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_of

SEP = "\x1f"
SEP2 = SEP * 2


def bpe_word_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, cnt) over whitespace tokens — the one corpus-sized pass."""
    return (
        docs.select(F.explode(tokens_of(F.col(text_col))).alias("word"))
        .filter(~F.col("word").contains(SEP))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _char_seg(word: F.Column) -> F.Column:
    """Initial segmentation: every character its own symbol."""
    return F.concat(F.lit(SEP2), F.regexp_replace(word, "(.)", "$1" + SEP2))


def _symbols(seg: F.Column) -> F.Column:
    return F.filter(F.split(seg, SEP2), lambda t: t != "")


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair totals, weighted by word count."""
    syms = words.select("cnt", _symbols(F.col("seg")).alias("s"))
    pairs = syms.select(
        "cnt",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("s"), 1, F.size("s") - 1).alias("left"),
                F.slice(F.col("s"), 2, F.size("s") - 1).alias("right"),
            )
        ).alias("p"),
    )
    return pairs.groupBy(
        F.col("p.left").alias("left"), F.col("p.right").alias("right")
    ).agg(F.sum("cnt").alias("pair_count"))


def bpe_train(
    words: DataFrame, n_merges: int
) -> tuple[list[tuple[str, str, str, int]], DataFrame]:
    """Learn ``n_merges`` merges over a (word, cnt) table.  Returns the
    ordered merge list [(left, right, merged, pair_count)] and the
    final segmentation frame (word, cnt, seg_str — symbols joined by a
    space).  Driver traffic: ONE row per round."""
    seg = words.withColumn("seg", _char_seg(F.col("word")))
    merges: list[tuple[str, str, str, int]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts(seg)
            .orderBy(F.col("pair_count").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], best[0]["pair_count"]
        merges.append((left, right, left + right, int(cnt)))
        seg = seg.withColumn(
            "seg",
            F.replace(
                F.col("seg"),
                F.lit(SEP + left + SEP2 + right + SEP),
                F.lit(SEP + left + right + SEP),
            ),
        )
    out = seg.select(
        "word", "cnt", F.array_join(_symbols(F.col("seg")), " ").alias("seg_str")
    )
    return merges, out
