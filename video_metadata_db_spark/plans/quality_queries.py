"""Data-quality gate queries: declarative expectations and column
profiling over the corpus — the batch-promotion checks an ingest
pipeline runs before anything downstream trusts the data.

Both are ONE aggregate pass regardless of rule count (see
operators/expectations.py); the oracles recompute each rule as an
independent aggregate, proving the fused pass loses nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.expectations import (
    column_profile,
    expect_in,
    expect_matches,
    expect_not_null,
    expect_range,
    expect_unique,
    expectations_report,
)
from ..sources.tables import load_table
from .registry import query

_EXPECT_SQL = """
WITH n AS (SELECT COUNT(*) AS n_rows FROM documents),
rules AS (
  SELECT 'unique(doc_id)' AS rule, 'doc_id' AS "column",
         (SELECT COUNT(doc_id) - COUNT(DISTINCT doc_id) FROM documents) AS violations
  UNION ALL
  SELECT 'not_null(text)', 'text',
         (SELECT COUNT(*) FROM documents WHERE text IS NULL)
  UNION ALL
  SELECT 'range(n_chars,1,400)', 'n_chars',
         (SELECT COUNT(*) FROM documents
          WHERE n_chars IS NULL OR n_chars < 1 OR n_chars > 400)
  UNION ALL
  SELECT 'in(lang)', 'lang',
         (SELECT COUNT(*) FROM documents
          WHERE lang IS NULL OR lang NOT IN ('en', 'de', 'fr'))
  UNION ALL
  SELECT 'matches(source)', 'source',
         (SELECT COUNT(*) FROM documents
          WHERE source IS NULL OR NOT regexp_matches(source, '^[a-z0-9_]+$'))
)
SELECT rule, "column", violations, n.n_rows, violations = 0 AS passed
FROM rules CROSS JOIN n
ORDER BY rule
"""


@query("quality_expectations", oracle=_EXPECT_SQL)
def q_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style batch gate: five declarative constraints (key
    uniqueness, non-null, numeric range, categorical membership, regex
    shape — the range and membership rules DELIBERATELY fail on part
    of the corpus so both report branches are exercised) verified in
    ONE scan + ONE aggregate — violation counts are
    conditional sums riding the same pass, uniqueness is
    count − count_distinct in the same aggregate.  The oracle computes
    every rule independently, proving the fusion exact.  At 100 TB this
    is the difference between one corpus scan and one per rule."""
    docs = load_table(spark, sf_dir, "documents")
    rules = [
        expect_unique("doc_id"),
        expect_not_null("text"),
        expect_range("n_chars", 1, 400),
        expect_in("lang", ["en", "de", "fr"]),
        expect_matches("source", "^[a-z0-9_]+$"),
    ]
    return expectations_report(docs, rules).orderBy("rule")


_PROFILE_SQL = """
WITH n AS (SELECT COUNT(*) AS n_rows FROM documents),
cols AS (
  SELECT 'doc_id' AS "column",
         (SELECT COUNT(*) FROM documents WHERE doc_id IS NULL) AS n_null,
         (SELECT COUNT(DISTINCT doc_id) FROM documents) AS n_distinct,
         (SELECT CAST(MIN(doc_id) AS VARCHAR) FROM documents) AS min_value,
         (SELECT CAST(MAX(doc_id) AS VARCHAR) FROM documents) AS max_value
  UNION ALL
  SELECT 'lang',
         (SELECT COUNT(*) FROM documents WHERE lang IS NULL),
         (SELECT COUNT(DISTINCT lang) FROM documents),
         (SELECT MIN(lang) FROM documents),
         (SELECT MAX(lang) FROM documents)
  UNION ALL
  SELECT 'n_chars',
         (SELECT COUNT(*) FROM documents WHERE n_chars IS NULL),
         (SELECT COUNT(DISTINCT n_chars) FROM documents),
         (SELECT CAST(MIN(n_chars) AS VARCHAR) FROM documents),
         (SELECT CAST(MAX(n_chars) AS VARCHAR) FROM documents)
  UNION ALL
  SELECT 'source',
         (SELECT COUNT(*) FROM documents WHERE source IS NULL),
         (SELECT COUNT(DISTINCT source) FROM documents),
         (SELECT MIN(source) FROM documents),
         (SELECT MAX(source) FROM documents)
)
SELECT "column", n.n_rows, n_null, n_distinct, min_value, max_value
FROM cols CROSS JOIN n
ORDER BY "column"
"""


@query("quality_column_profile", oracle=_PROFILE_SQL)
def q_quality_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column snapshot profile (nulls / distincts / min / max as
    strings so mixed types stack) — one fused aggregate pass; the
    oracle's per-column subqueries prove the fusion exact."""
    docs = load_table(spark, sf_dir, "documents")
    return column_profile(docs, ["doc_id", "lang", "n_chars", "source"]).orderBy(
        "column"
    )


_CURATION_SQL = """
WITH ingested AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, source FROM documents WHERE doc_id % 3 = 0
),
metrics AS (
  SELECT doc_id, text, source,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
         round(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
               / greatest(length(text), 1), 6) AS alpha
  FROM ingested
),
filtered AS (
  SELECT doc_id, text, source, n_tokens FROM metrics
  WHERE n_tokens >= 10 AND alpha >= 0.81
),
deduped AS (
  SELECT doc_id, source, n_tokens FROM (
    SELECT *, row_number() OVER (
      PARTITION BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
      ORDER BY doc_id) AS rn
    FROM filtered
  ) WHERE rn = 1
),
offs AS (
  SELECT doc_id, source, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM deduped
)
SELECT doc_id, source, n_tokens, start_offset,
       start_offset // 512 AS first_block
FROM offs
ORDER BY doc_id
"""


@query("curation_pipeline", oracle=_CURATION_SQL)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END curation DAG in one query — the composition a
    training-data run actually executes, each stage an already-verified
    operator:

    0. INGEST = corpus ∪ a re-keyed third of itself (the update-mode
       re-ingestion scenario, same staging as `dedup_exact` — makes the
       dedup stage provably fire at EVERY scale factor);
    1. quality FILTER (≥10 tokens, ≥81% alpha — codegen predicates;
       the threshold sits inside the corpus's alpha range, so the
       filter drops real rows at every SF);
    2. exact DEDUP keep-first (min doc_id per normalized-text md5 —
       one hash-key shuffle, `operators/dedup.exact_dedup` semantics
       via the same content key; every re-ingested copy drops here);
    3. sequence PACKING of the survivors (distributed two-pass prefix
       sum, `operators/packing.sequence_offsets` — the oracle uses the
       naive single-window form, value-identical).

    Composition is where plan quality shows: the filter pushes into
    the scans feeding the dedup shuffle, keep-first is ONE min(struct)
    aggregate (no corpus window, no semi-join recomputing its inputs),
    the filtered+deduped slim table materializes ONCE at the stage
    boundary (what a real pipeline writes between stages), and the
    packing offsets never global-sort.  At 100 TB the DAG is: one
    corpus read, one content-hash shuffle, one slim intermediate, one
    prefix-sum pass."""
    from ..operators.dedup import normalize_text
    from ..operators.packing import sequence_offsets
    from ..functions.text import alpha_ratio, token_count
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    again = docs.filter(F.col("doc_id") % 3 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    metrics = docs.unionByName(again).select(
        "doc_id",
        "text",
        "source",
        token_count(F.col("text")).alias("n_tokens"),
        alpha_ratio(F.col("text")).alias("alpha"),
    )
    filtered = metrics.filter((F.col("n_tokens") >= 10) & (F.col("alpha") >= 0.81))
    keyed = filtered.withColumn("_key", F.md5(normalize_text(F.col("text"))))
    # keep-first per content key as ONE aggregate: min(struct) with
    # doc_id leading carries the whole kept row — no semi-join back,
    # which would recompute the ingest+filter chain for both join
    # sides (the dedup_keep_best trick, partial-aggregatable)
    survivors = (
        keyed.groupBy("_key")
        .agg(F.min(F.struct("doc_id", "source", "n_tokens")).alias("r"))
        .select("r.doc_id", "r.source", "r.n_tokens")
    )
    # stage boundary: a real pipeline WRITES the filtered+deduped slim
    # table before packing; the eager cut stands in for that write and
    # stops the packing pass (boundaries + totals + rows = 3 readers)
    # from re-running the dedup shuffle per reader.  On a cluster this
    # is a reliable checkpoint / intermediate table, not executor-local.
    survivors = survivors.localCheckpoint(eager=True)
    packed = sequence_offsets(survivors, order_col="doc_id", weight_col="n_tokens")
    return packed.select(
        "doc_id",
        "source",
        "n_tokens",
        "start_offset",
        (F.col("start_offset") / 512).cast("long").alias("first_block"),
    ).orderBy("doc_id")


_OUTLIER_SQL = """
WITH med AS (
  SELECT event_type, round(median(value), 6) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, e.event_id, e.value, m.med,
         abs(e.value - m.med) AS adev
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, round(median(adev), 6) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       COUNT(*) AS n_events,
       any_value(d.med) AS med,
       any_value(m.mad) AS mad,
       CAST(SUM(CASE WHEN abs(d.value - d.med) > 3.5 * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad m USING (event_type)
GROUP BY d.event_type
ORDER BY d.event_type
"""


@query("outlier_mad_events", oracle=_OUTLIER_SQL)
def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: per-type outlier counts by the
    median/MAD rule (|v − median| > 3.5·MAD — the Iglewicz-Hoaglin
    cutoff).  Median and MAD are distribution-robust where mean/stddev
    z-scores break on the heavy tails real telemetry has.

    Plan at scale: two exact-percentile aggregates (each one shuffle on
    event_type; Spark's `percentile` is a typed aggregate with
    map-side partials) with the per-type medians broadcast back for
    the deviation and verdict passes.  Exact medians interpolate
    identically on both engines ((n−1)·p positional, linear) and are
    rounded to 6 dp before the comparison so the 3.5·MAD boundary
    cannot drift."""
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("med")
    )
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.percentile("adev", F.lit(0.5)), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.any_value("med").alias("med"),
            F.any_value("mad").alias("mad"),
            F.sum(
                F.when(F.abs(F.col("value") - F.col("med")) > 3.5 * F.col("mad"), 1)
                .otherwise(0)
            ).cast("long")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@query(
    "ab_test_proportions",
    oracle="""
WITH users AS (
  SELECT user_id,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   > SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
),
arms AS (
  SELECT SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS x_a,
         SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n_b,
         SUM(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS x_b
  FROM users
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(x_a AS BIGINT) AS x_a,
       CAST(n_b AS BIGINT) AS n_b, CAST(x_b AS BIGINT) AS x_b,
       CAST(round(x_a / (1.0 * n_a), 6) AS DOUBLE) AS p_a,
       CAST(round(x_b / (1.0 * n_b), 6) AS DOUBLE) AS p_b,
       CAST(round(
         (x_a / (1.0 * n_a) - x_b / (1.0 * n_b))
         / NULLIF(sqrt(((x_a + x_b) / (1.0 * (n_a + n_b)))
                * (1.0 - (x_a + x_b) / (1.0 * (n_a + n_b)))
                * (1.0 / n_a + 1.0 / n_b)), 0.0), 6) AS DOUBLE) AS z_score
FROM arms
""",
)
def q_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between a deterministic 50/50 user split
    (arm = user_id parity): does the 'purchase' conversion rate differ
    between arms? — the experiment-readout primitive a data platform
    runs constantly, and a null-case fixture here (the synthetic arms
    SHOULD tie, so |z| must come out small).

    Determinism: per-user conversion is an exact MAX aggregate, arm
    totals are exact integer sums collapsed into ONE row by conditional
    aggregation (no pivot shuffle), and the z statistic is a fixed
    expression tree of IEEE ops on those integers — both engines parse
    the identical tree, so every intermediate double is bit-equal and
    the 6-dp round is decorative rather than load-bearing.  One corpus
    scan, one user_id shuffle, one scalar row out."""
    events = load_table(spark, sf_dir, "events")
    users = events.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            > F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        )
        .cast("int")
        .alias("conv")
    )
    even = F.col("user_id") % 2 == 0
    arms = users.agg(
        F.sum(F.when(even, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(even, F.col("conv")).otherwise(0)).alias("x_a"),
        F.sum(F.when(~even, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(~even, F.col("conv")).otherwise(0)).alias("x_b"),
    )
    return arms.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("x_a").cast("long").alias("x_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("x_b").cast("long").alias("x_b"),
        F.expr("CAST(round(x_a / (1.0D * n_a), 6) AS DOUBLE)").alias("p_a"),
        F.expr("CAST(round(x_b / (1.0D * n_b), 6) AS DOUBLE)").alias("p_b"),
        F.expr(
            "CAST(round("
            " (x_a / (1.0D * n_a) - x_b / (1.0D * n_b))"
            " / NULLIF(sqrt(((x_a + x_b) / (1.0D * (n_a + n_b)))"
            "        * (1.0D - (x_a + x_b) / (1.0D * (n_a + n_b)))"
            "        * (1.0D / n_a + 1.0D / n_b)), 0.0D), 6) AS DOUBLE)"
        ).alias("z_score"),
    )


@query(
    "outlier_iqr_events",
    oracle="""
WITH fences AS (
  SELECT event_type,
         round(quantile_cont(value, 0.25), 6) AS q1,
         round(quantile_cont(value, 0.75), 6) AS q3
  FROM events GROUP BY event_type
),
f AS (
  SELECT event_type, q1, q3,
         round(q1 - 1.5 * (q3 - q1), 6) AS lo,
         round(q3 + 1.5 * (q3 - q1), 6) AS hi
  FROM fences
)
SELECT e.event_type AS event_type,
       CAST(f.q1 AS DOUBLE) AS q1, CAST(f.q3 AS DOUBLE) AS q3,
       CAST(f.lo AS DOUBLE) AS fence_lo, CAST(f.hi AS DOUBLE) AS fence_hi,
       CAST(SUM(CASE WHEN e.value < f.lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low,
       CAST(SUM(CASE WHEN e.value > f.hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high
FROM events e JOIN f ON e.event_type = f.event_type
GROUP BY 1, 2, 3, 4, 5
ORDER BY e.event_type
""",
)
def q_outlier_iqr_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence (IQR) outlier counts per event type — the boxplot
    rule, the parametric-free sibling of the MAD detector
    (`outlier_mad_events`): values beyond Q1−1.5·IQR / Q3+1.5·IQR.

    Quartiles interpolate identical samples cross-engine (percentile ≡
    quantile_cont, `agg_percentiles` precedent) and are 6-dp-rounded
    BEFORE the fence arithmetic and the boundary comparison, so a raw
    value sits on the same side of the fence in both engines unless it
    is within float-epsilon of a rounded fence (measure-zero on this
    corpus).  Two passes by necessity (fences are order statistics):
    one groupBy for quartiles — broadcast back (|event_types| rows) —
    one conditional re-aggregation; both shuffles on event_type."""
    events = load_table(spark, sf_dir, "events")
    q = F.expr("percentile(value, array(0.25D, 0.75D))")
    fences = (
        events.groupBy("event_type")
        .agg(q.alias("q"))
        .select(
            "event_type",
            F.round(F.col("q")[0], 6).alias("q1"),
            F.round(F.col("q")[1], 6).alias("q3"),
        )
        .select(
            "event_type",
            "q1",
            "q3",
            F.expr("round(q1 - 1.5D * (q3 - q1), 6)").alias("lo"),
            F.expr("round(q3 + 1.5D * (q3 - q1), 6)").alias("hi"),
        )
    )
    return (
        events.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "q1", "q3", "lo", "hi")
        .agg(
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_low"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_high"),
        )
        .select(
            "event_type",
            F.col("q1").cast("double"),
            F.col("q3").cast("double"),
            F.col("lo").cast("double").alias("fence_lo"),
            F.col("hi").cast("double").alias("fence_hi"),
            "n_low",
            "n_high",
        )
        .orderBy("event_type")
    )


def _skew_cte(col: str) -> str:
    return f"""
  SELECT '{col}' AS key_name,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(cnt) AS BIGINT) AS n_rows,
         CAST(MAX(cnt) AS BIGINT) AS max_cnt,
         CAST(round(MAX(cnt) / (1.0 * SUM(cnt)), 6) AS DOUBLE) AS max_share,
         CAST(round((SELECT SUM(cnt) FROM (
                 SELECT cnt FROM (SELECT count(*) AS cnt FROM lineitem
                                  GROUP BY {col})
                 ORDER BY cnt DESC LIMIT 10))
               / (1.0 * SUM(cnt)), 6) AS DOUBLE) AS top10_share
  FROM (SELECT count(*) AS cnt FROM lineitem GROUP BY {col})"""


@query(
    "skew_key_report",
    oracle=f"""
{_skew_cte("l_orderkey")}
UNION ALL
{_skew_cte("l_partkey")}
UNION ALL
{_skew_cte("l_suppkey")}
ORDER BY key_name
""",
)
def q_skew_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic over the fact table's three join keys —
    the measurement that decides between a plain shuffle join, AQE
    skew splitting, and explicit salting (`join_salted_skew`): max and
    top-10 key shares of row volume per key.

    Each key costs one partial-aggregatable count + one bounded
    top-10 (TakeOrdered over the key-count frame, never the fact
    rows); shares are single divisions of exact integers.  The
    top-10 SUM is tie-insensitive (any 10 largest counts sum the
    same), so no tiebreak is needed for determinism.  At 100 TB this
    is the profiling pass you run BEFORE choosing a join strategy —
    three scans here for clarity; fuse into one scan with
    three conditional aggregates if the profile itself becomes the
    bottleneck."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = []
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        cnts = li.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        top10 = cnts.orderBy(F.col("cnt").desc()).limit(10).agg(
            F.sum("cnt").alias("top10")
        )
        agg = cnts.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("n_rows"),
            F.max("cnt").alias("max_cnt"),
        )
        parts.append(
            agg.crossJoin(F.broadcast(top10)).select(
                F.lit(col).alias("key_name"),
                F.col("n_keys").cast("long"),
                F.col("n_rows").cast("long"),
                F.col("max_cnt").cast("long"),
                F.expr(
                    "CAST(round(max_cnt / (1.0D * n_rows), 6) AS DOUBLE)"
                ).alias("max_share"),
                F.expr(
                    "CAST(round(top10 / (1.0D * n_rows), 6) AS DOUBLE)"
                ).alias("top10_share"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("key_name")


@query(
    "referential_integrity_audit",
    oracle="""
WITH li AS (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
            FROM lineitem),
li_stats AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN l_quantity <= 0 OR l_extendedprice <= 0
                  THEN 1 ELSE 0 END) AS bad_vals
  FROM li
),
li_dup AS (
  SELECT COALESCE(SUM(c - 1), 0) AS dups FROM (
    SELECT COUNT(*) AS c FROM li GROUP BY l_orderkey, l_linenumber
  ) WHERE c > 1
),
ord AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
o_n AS (SELECT COUNT(*) AS n FROM ord),
orphan_li AS (
  SELECT COUNT(*) AS n FROM li
  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM ord)
),
orphan_o AS (
  SELECT COUNT(*) AS n FROM ord
  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
),
childless AS (
  SELECT COUNT(*) AS n FROM ord
  WHERE o_orderkey NOT IN (SELECT l_orderkey FROM li)
),
recon AS (
  SELECT COUNT(*) AS n FROM ord o
  JOIN (SELECT l_orderkey,
               SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS cents
        FROM li GROUP BY l_orderkey) s
    ON o.o_orderkey = s.l_orderkey
  WHERE CAST(round(o.o_totalprice * 100, 0) AS BIGINT) <> s.cents
),
ev AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS nulls
  FROM events
)
SELECT * FROM (
  SELECT 'events_null_value' AS check_name,
         CAST(nulls AS BIGINT) AS n_violations, CAST(n AS BIGINT) AS n_total
  FROM ev
  UNION ALL
  SELECT 'lineitem_dup_pk', CAST(dups AS BIGINT),
         (SELECT CAST(n AS BIGINT) FROM li_stats) FROM li_dup
  UNION ALL
  SELECT 'lineitem_nonpositive_values', CAST(bad_vals AS BIGINT),
         CAST(n AS BIGINT) FROM li_stats
  UNION ALL
  SELECT 'lineitem_orphan_orderkey', CAST(n AS BIGINT),
         (SELECT CAST(n AS BIGINT) FROM li_stats) FROM orphan_li
  UNION ALL
  SELECT 'orders_childless', CAST(n AS BIGINT),
         (SELECT CAST(n AS BIGINT) FROM o_n) FROM childless
  UNION ALL
  SELECT 'orders_orphan_custkey', CAST(n AS BIGINT),
         (SELECT CAST(n AS BIGINT) FROM o_n) FROM orphan_o
  UNION ALL
  SELECT 'orders_price_reconciled', CAST(n AS BIGINT),
         (SELECT CAST(n AS BIGINT) FROM o_n) FROM recon
)
ORDER BY check_name
""",
)
def q_referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table data-quality panel — the warehouse-level complement
    of the single-table `quality_expectations` gate: FK orphan checks
    in both directions (lineitem→orders, orders→customer), childless
    parents, duplicate primary keys, domain checks (non-positive
    quantity/price, NULL measure rate), and header/detail money
    reconciliation (o_totalprice vs Σ line cents — EXACT integer cents
    on both sides, so the mismatch count cannot drift on a float ulp).

    Scale shape: every check is a column-pruned aggregate or key-only
    anti-join over a 2-4-column projection — the plan re-scans each
    table per check (5 pruned lineitem scans; Catalyst does not dedupe
    scans across a union), which is the right default since pruned
    parquet scans are cheap and independent checks parallelize; if
    scans ever dominate, persist the shared projection once and the
    checks run off the cache unchanged.  The panel itself is a union
    of 7 one-row frames — driver traffic is 7 scalars."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    ord_ = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    events = load_table(spark, sf_dir, "events").select("value")

    li_stats = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                (F.col("l_quantity") <= 0) | (F.col("l_extendedprice") <= 0), 1
            ).otherwise(0)
        ).alias("bad_vals"),
    )
    n_li = li_stats.select("n")
    li_dup = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("dups"))
    )
    o_n = ord_.agg(F.count(F.lit(1)).alias("n"))
    orphan_li = (
        li.join(ord_, li["l_orderkey"] == ord_["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    orphan_o = (
        ord_.join(F.broadcast(cust), ord_["o_custkey"] == cust["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    childless = (
        ord_.join(li, ord_["o_orderkey"] == li["l_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    li_sums = li.groupBy("l_orderkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias("cents")
    )
    recon = (
        ord_.join(li_sums, ord_["o_orderkey"] == li_sums["l_orderkey"])
        .filter(
            F.round(F.col("o_totalprice") * 100, 0).cast("long") != F.col("cents")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ev = events.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("nulls"),
    )

    def row(name: str, viol: DataFrame, viol_col: str, total: DataFrame) -> DataFrame:
        return viol.crossJoin(F.broadcast(total.select(F.col("n").alias("_t")))).select(
            F.lit(name).alias("check_name"),
            F.col(viol_col).cast("long").alias("n_violations"),
            F.col("_t").cast("long").alias("n_total"),
        )

    panel = (
        ev.select(
            F.lit("events_null_value").alias("check_name"),
            F.col("nulls").cast("long").alias("n_violations"),
            F.col("n").cast("long").alias("n_total"),
        )
        .unionByName(row("lineitem_dup_pk", li_dup, "dups", n_li))
        .unionByName(
            li_stats.select(
                F.lit("lineitem_nonpositive_values").alias("check_name"),
                F.col("bad_vals").cast("long").alias("n_violations"),
                F.col("n").cast("long").alias("n_total"),
            )
        )
        .unionByName(row("lineitem_orphan_orderkey", orphan_li, "n", n_li))
        .unionByName(row("orders_childless", childless, "n", o_n))
        .unionByName(row("orders_orphan_custkey", orphan_o, "n", o_n))
        .unionByName(row("orders_price_reconciled", recon, "n", o_n))
    )
    return panel.orderBy("check_name")


_PSI_SPLIT = "2024-01-16 00:00:00"


@query(
    "psi_value_drift",
    oracle=f"""
WITH iv AS (
  SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents,
         ts < TIMESTAMP '{_PSI_SPLIT}' AS is_ref
  FROM events WHERE value IS NOT NULL
),
edges AS (
  SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM iv WHERE is_ref
),
binned AS (
  SELECT LEAST(GREATEST(((cents - lo) * 10) // (hi - lo + 1), 0), 9) AS bin,
         is_ref
  FROM iv CROSS JOIN edges
),
counts AS (
  SELECT g.bin,
         COALESCE(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END), 0) AS ref_n,
         COALESCE(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END), 0) AS cur_n
  FROM (SELECT unnest(generate_series(0, 9)) AS bin) g
  LEFT JOIN binned b ON b.bin = g.bin
  GROUP BY g.bin
),
tot AS (SELECT SUM(ref_n) AS rt, SUM(cur_n) AS ct FROM counts),
terms AS (
  SELECT bin, ref_n, cur_n,
         CAST(round(((ref_n + 1) / (1.0 * (rt + 10))
                     - (cur_n + 1) / (1.0 * (ct + 10)))
                    * ln(((ref_n + 1) / (1.0 * (rt + 10)))
                         / ((cur_n + 1) / (1.0 * (ct + 10)))), 9)
              AS DECIMAL(18,9)) AS psi_term
  FROM counts CROSS JOIN tot
)
SELECT CAST(bin AS INTEGER) AS bin,
       CAST(ref_n AS BIGINT) AS ref_n,
       CAST(cur_n AS BIGINT) AS cur_n,
       CAST(psi_term AS DOUBLE) AS psi_term,
       CAST(SUM(psi_term) OVER () AS DOUBLE) AS psi_total
FROM terms
ORDER BY bin
""",
)
def q_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event-value distribution,
    first half of the month (reference) vs the rest (current) — THE
    drift metric model-monitoring stacks alarm on (PSI > 0.2 =
    retrain).  Ten equi-width bins on integer cents with edges from
    the REFERENCE side only (integer multiply/div binning, clamped, so
    current-period outliers land in the edge bins); add-one smoothing
    keeps empty bins finite.

    Determinism: the same discipline as the KL oracle — probabilities
    are exact count ratios, each (p−q)·ln(p/q) term is quantized to
    DECIMAL(18,9) BEFORE summation, so the total is associative-exact
    at any parallelism; the bin grid is generated (0..9), never
    inferred, so both engines see identical empty bins.  Scale shape:
    one corpus scan into a 10-row matrix; everything after is
    bin-cardinality work."""
    events = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    iv = events.select(
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        (F.col("ts") < F.lit(_PSI_SPLIT).cast("timestamp")).alias("is_ref"),
    )
    edges = iv.filter("is_ref").agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    binned = iv.crossJoin(F.broadcast(edges)).select(
        F.expr(
            "LEAST(GREATEST(((cents - lo) * 10) div (hi - lo + 1), 0L), 9L)"
        ).alias("bin"),
        "is_ref",
    )
    counts = (
        spark.range(10)
        .select(F.col("id").alias("bin"))
        .join(binned, "bin", "left")
        .groupBy("bin")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("is_ref"), 1).otherwise(0)), F.lit(0)
            ).alias("ref_n"),
            F.coalesce(
                F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)), F.lit(0)
            ).alias("cur_n"),
        )
    )
    tot = counts.agg(F.sum("ref_n").alias("rt"), F.sum("cur_n").alias("ct"))
    terms = counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "ref_n",
        "cur_n",
        F.expr(
            "CAST(round(((ref_n + 1) / (1.0D * (rt + 10))"
            " - (cur_n + 1) / (1.0D * (ct + 10)))"
            " * ln(((ref_n + 1) / (1.0D * (rt + 10)))"
            " / ((cur_n + 1) / (1.0D * (ct + 10)))), 9)"
            " AS DECIMAL(18,9))"
        ).alias("psi_term"),
    )
    w_all = Window.partitionBy()  # 10 rows — bin-cardinality, never corpus
    return terms.select(
        F.col("bin").cast("int").alias("bin"),
        F.col("ref_n").cast("long").alias("ref_n"),
        F.col("cur_n").cast("long").alias("cur_n"),
        F.col("psi_term").cast("double").alias("psi_term"),
        F.sum("psi_term").over(w_all).cast("double").alias("psi_total"),
    ).orderBy("bin")


@query(
    "benford_first_digit",
    oracle="""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM orders WHERE o_totalprice > 0
),
obs AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
tot AS (SELECT SUM(n) AS t FROM obs)
SELECT g.digit,
       CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders,
       CAST(round(COALESCE(o.n, 0) / (1.0 * t), 6) AS DOUBLE) AS obs_share,
       CAST(round(ln(1.0 + 1.0 / g.digit) / ln(10.0), 6) AS DOUBLE)
         AS benford_share,
       CAST(CAST(round(round(ln(1.0 + 1.0 / g.digit) / ln(10.0), 6) * t, 0)
                 AS BIGINT) AS BIGINT) AS expected_n
FROM (SELECT unnest(generate_series(1, 9)) AS digit) g
LEFT JOIN obs o ON o.digit = g.digit
CROSS JOIN tot
ORDER BY g.digit
""",
)
def q_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order amounts — the
    fraud/forensics screen: natural multi-scale amounts follow
    P(d) = log10(1 + 1/d); fabricated or clipped data shows up as a
    flat or spiked digit histogram (the synthetic fixture's uniform
    pricing deliberately FAILS Benford — the audit's point is the
    comparison columns, not conformity).

    Exactness: digits come from the integer-cents string (no float
    leading-digit extraction); observed counts are exact; the nine
    Benford constants are each ONE ln-quotient rounded to 6 dp before
    the expected-count multiply (then rounded once to a count) — the
    proven transcendental discipline.  Digit grid is generated 1..9 so
    absent digits report 0.  One scan into a 9-row matrix."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = orders.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("t"))
    grid = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    return (
        grid.join(obs, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders"),
            F.expr("CAST(round(COALESCE(n, 0) / (1.0D * t), 6) AS DOUBLE)").alias(
                "obs_share"
            ),
            F.expr(
                "CAST(round(ln(1.0D + 1.0D / digit) / ln(10.0D), 6) AS DOUBLE)"
            ).alias("benford_share"),
            F.expr(
                "CAST(round(round(ln(1.0D + 1.0D / digit) / ln(10.0D), 6) * t, 0)"
                " AS BIGINT)"
            ).alias("expected_n"),
        )
        .orderBy("digit")
    )


_GAP_BUCKET = 1000
_GAP_TOPK = 50


@query(
    "sequence_gap_audit",
    oracle=f"""
WITH k AS (
  SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'O'
),
g AS (SELECT k, lead(k) OVER (ORDER BY k) AS nk FROM k)
SELECT CAST(k + 1 AS BIGINT) AS gap_start,
       CAST(nk - 1 AS BIGINT) AS gap_end,
       CAST(nk - k - 1 AS BIGINT) AS n_missing
FROM g WHERE nk - k > 1
ORDER BY n_missing DESC, gap_start
LIMIT {_GAP_TOPK}
""",
)
def q_sequence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-id-range detector over the open-order key stream (the
    ingest-completeness audit: every gap is a range of records some
    upstream failed to deliver), reporting the {_GAP_TOPK} widest
    gaps.

    The oracle is the textbook single-window lead() — which is a
    SINGLE-REDUCER global sort.  The Spark plan is the distributed
    form: keys bucket by ``k div {_GAP_BUCKET}``; within-bucket gaps
    come from a PARTITIONED lead; cross-bucket gaps come from
    adjacent bucket summaries — adjacency via the two-pass prefix-sum
    rank (`global_row_number`) self-equi-joined on rank+1, which
    correctly bridges entirely-empty buckets.  The value match proves
    the decomposition exact.  Top-k is TakeOrderedAndProject on the
    total key (n_missing desc, gap_start)."""
    from ..operators.packing import global_row_number

    orders = load_table(spark, sf_dir, "orders")
    keys = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_orderkey") / _GAP_BUCKET).cast("long").alias("b"),
    )
    wb = Window.partitionBy("b").orderBy("k")
    within = (
        keys.withColumn("nk", F.lead("k").over(wb))
        .filter(F.col("nk") - F.col("k") > 1)
        .select(
            (F.col("k") + 1).alias("gap_start"),
            (F.col("nk") - 1).alias("gap_end"),
        )
    )
    summ = keys.groupBy("b").agg(F.min("k").alias("min_k"), F.max("k").alias("max_k"))
    ranked = global_row_number(summ, "b", "min_k", out_col="pos")
    lo = ranked.select(F.col("pos").alias("pos"), F.col("max_k").alias("prev_max"))
    hi = ranked.select(
        (F.col("pos") - 1).alias("pos"), F.col("min_k").alias("next_min")
    )
    boundary = (
        lo.join(hi, "pos")
        .filter(F.col("next_min") - F.col("prev_max") > 1)
        .select(
            (F.col("prev_max") + 1).alias("gap_start"),
            (F.col("next_min") - 1).alias("gap_end"),
        )
    )
    return (
        within.unionByName(boundary)
        .select(
            F.col("gap_start").cast("long").alias("gap_start"),
            F.col("gap_end").cast("long").alias("gap_end"),
            (F.col("gap_end") - F.col("gap_start") + 1)
            .cast("long")
            .alias("n_missing"),
        )
        .orderBy(F.col("n_missing").desc(), "gap_start")
        .limit(_GAP_TOPK)
    )


@query(
    "embedding_outlier_counts",
    oracle="""
WITH c AS (
  SELECT label, i AS pos,
         CAST(round(round(avg(embedding[i]), 6) * 1000000, 0) AS BIGINT) AS cm
  FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
  GROUP BY label, i
),
v AS (
  SELECT vec_id, label, i AS pos,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS vm
  FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
),
d AS (
  SELECT vec_id, v.label, SUM((vm - cm) * (vm - cm)) AS d2
  FROM v JOIN c ON v.label = c.label AND v.pos = c.pos
  GROUP BY 1, 2
),
med AS (
  SELECT label, CAST(round(quantile_cont(d2, 0.5), 1) AS DOUBLE) AS med
  FROM d GROUP BY label
),
dev AS (
  SELECT d.label, d2, med, abs(d2 - med) AS adev
  FROM d JOIN med ON d.label = med.label
),
mad AS (
  SELECT label, CAST(round(quantile_cont(adev, 0.5), 1) AS DOUBLE) AS mad
  FROM dev GROUP BY label
)
SELECT dev.label,
       CAST(count(*) AS BIGINT) AS n_vectors,
       any_value(dev.med) AS med_d2,
       any_value(mad.mad) AS mad_d2,
       CAST(SUM(CASE WHEN abs(d2 - dev.med) > 3.5 * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev JOIN mad ON dev.label = mad.label
GROUP BY dev.label
ORDER BY dev.label
""",
)
def q_embedding_outlier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space anomaly counts per label: vectors whose squared
    distance to their own class centroid violates the median/MAD rule
    (|d² − med| > 3.5·MAD, the `outlier_mad_events` cutoff) — the
    mislabeled-example / embedding-drift detector a curation pipeline
    runs before training on labeled vectors.

    Exactness: vector elements and centroids are both quantized to
    integer micro-units (centroids via `embedding_centroids`' round-6
    mean), so every squared distance is an exact BIGINT; the robust
    fences interpolate identical integer samples (percentile ≡
    quantile_cont) and are 6-dp-rounded before the comparison.  Scale
    shape: centroid build and distance pass are each ONE corpus-sized
    positional-explode aggregate with the 640-row centroid table
    broadcast between them; the median/MAD passes aggregate per label
    with fences broadcast back — no window, no pair join."""
    emb = load_table(spark, sf_dir, "embeddings")
    pe = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos0", "x")
    )
    c = pe.groupBy("label", F.col("pos0").alias("pos")).agg(
        F.round(F.round(F.avg("x"), 6) * 1000000, 0).cast("long").alias("cm")
    )
    v = pe.select(
        "vec_id",
        "label",
        F.col("pos0").alias("pos"),
        F.round(F.col("x").cast("double") * 1000000, 0).cast("long").alias("vm"),
    )
    d = (
        v.join(F.broadcast(c), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum((F.col("vm") - F.col("cm")) * (F.col("vm") - F.col("cm"))).alias(
                "d2"
            )
        )
        # d (one row per vector) feeds the median, the deviation join
        # (twice) and the final rollup — without the cut the two
        # corpus-sized positional-explode aggregates above re-run per
        # consumer (16 parquet scans in the before-plan).
        .localCheckpoint(eager=True)
    )
    med = d.groupBy("label").agg(
        F.round(F.percentile("d2", F.lit(0.5)), 1).alias("med")
    )
    dev = d.join(F.broadcast(med), "label").withColumn(
        "adev", F.abs(F.col("d2") - F.col("med"))
    )
    mad = dev.groupBy("label").agg(
        F.round(F.percentile("adev", F.lit(0.5)), 1).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.any_value("med").alias("med_d2"),
            F.any_value("mad").alias("mad_d2"),
            F.sum(
                F.when(
                    F.abs(F.col("d2") - F.col("med")) > 3.5 * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("label")
    )


@query(
    "functional_dependency_audit",
    oracle="""
WITH fd1 AS (
  SELECT 'nation->region' AS fd, n_nationkey AS k,
         CAST(n_regionkey AS VARCHAR) AS d FROM nation
),
fd2 AS (
  SELECT 'part->brand' AS fd, p_partkey AS k, p_brand AS d FROM part
),
fd3 AS (
  SELECT 'brand->type' AS fd,
         CAST(concat('0x', substr(md5(p_brand), 1, 8)) AS BIGINT)
           % 2147483647 AS k,
         p_type AS d
  FROM part
),
fd4 AS (
  SELECT 'cust_nation->segment' AS fd, c_nationkey AS k, c_mktsegment AS d
  FROM customer
),
u AS (
  SELECT * FROM fd1 UNION ALL SELECT * FROM fd2
  UNION ALL SELECT * FROM fd3 UNION ALL SELECT * FROM fd4
),
per_key AS (
  SELECT fd, k, count(DISTINCT d) AS nd FROM u GROUP BY fd, k
)
SELECT fd,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_keys,
       CAST(max(nd) AS BIGINT) AS max_distinct_dependents
FROM per_key GROUP BY fd ORDER BY fd
""",
)
def q_functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: does determinant → dependent hold?
    Four representative FDs — two that must hold (primary-key FDs:
    nation→region, part→brand; a violation means ingest corruption)
    and two expected NOT to hold (brand→type, customer-nation→segment;
    their violation counts are the profile).  The schema-drift
    companion to `referential_integrity_audit`'s FK orphans.

    Each FD is one COUNT(DISTINCT dependent) per key over a 2-column
    pruned projection, unioned into one |FDs|-row report — all
    partial-aggregatable, no joins (the non-key determinant is hashed
    to share the integer key column; md5-derived, identical both
    engines).  At 100 TB each check is an independent column-pruned
    scan — exactly how you'd fan them out."""
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    customer = load_table(spark, sf_dir, "customer")
    from ..operators.dedup import hash31

    fds = [
        nation.select(
            F.lit("nation->region").alias("fd"),
            F.col("n_nationkey").cast("long").alias("k"),
            F.col("n_regionkey").cast("string").alias("d"),
        ),
        part.select(
            F.lit("part->brand").alias("fd"),
            F.col("p_partkey").cast("long").alias("k"),
            F.col("p_brand").alias("d"),
        ),
        part.select(
            F.lit("brand->type").alias("fd"),
            hash31(F.col("p_brand")).alias("k"),
            F.col("p_type").alias("d"),
        ),
        customer.select(
            F.lit("cust_nation->segment").alias("fd"),
            F.col("c_nationkey").cast("long").alias("k"),
            F.col("c_mktsegment").alias("d"),
        ),
    ]
    u = fds[0]
    for f_ in fds[1:]:
        u = u.unionByName(f_)
    per_key = u.groupBy("fd", "k").agg(F.count_distinct("d").alias("nd"))
    return (
        per_key.groupBy("fd")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating_keys"),
            F.max("nd").cast("long").alias("max_distinct_dependents"),
        )
        .orderBy("fd")
    )


#: k-anonymity threshold: quasi-identifier groups smaller than this
#: are treated as re-identifiable.
_K_ANON = 5


@query(
    "k_anonymity_audit",
    oracle=f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS sz
  FROM customer GROUP BY 1, 2
)
SELECT CAST(count(*) AS BIGINT) AS n_groups,
       CAST(min(sz) AS BIGINT) AS min_group_size,
       CAST(SUM(CASE WHEN sz < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_small_groups,
       CAST(SUM(CASE WHEN sz < {_K_ANON} THEN sz ELSE 0 END) AS BIGINT)
         AS n_rows_at_risk,
       CAST(SUM(sz) AS BIGINT) AS n_rows
FROM g
""",
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (nation, market-segment)
    quasi-identifier: how many QI groups fall below k={_K_ANON}
    members, and how many rows those groups expose — the
    re-identification risk gate a curation pipeline runs BEFORE
    releasing joined demographic slices (the privacy companion to
    `text_pii_redact`'s content scrubbing: redaction handles direct
    identifiers, k-anonymity handles linkage attacks via quasi-
    identifiers).

    One QI-keyed aggregate then one 5-cell rollup — both partial-
    aggregatable, all exact integers; at 100 TB the QI aggregate is a
    single shuffle on the (bounded-cardinality) QI key."""
    customer = load_table(spark, sf_dir, "customer")
    g = customer.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("sz").cast("long").alias("min_group_size"),
        F.sum(F.when(F.col("sz") < _K_ANON, 1).otherwise(0))
        .cast("long")
        .alias("n_small_groups"),
        F.sum(F.when(F.col("sz") < _K_ANON, F.col("sz")).otherwise(0))
        .cast("long")
        .alias("n_rows_at_risk"),
        F.sum("sz").cast("long").alias("n_rows"),
    )


@query(
    "class_separability",
    oracle="""
WITH c AS (
  SELECT label, i AS pos,
         CAST(round(round(avg(embedding[i]), 6) * 1000000, 0) AS BIGINT) AS cm
  FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
  GROUP BY label, i
),
g AS (
  SELECT pos, CAST(round(avg(cm), 1) AS DOUBLE) AS gm FROM c GROUP BY pos
),
v AS (
  SELECT vec_id, label, i AS pos,
         CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS vm
  FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
),
intra AS (
  SELECT v.label, vec_id, SUM((vm - cm) * (vm - cm)) AS d2
  FROM v JOIN c ON v.label = c.label AND v.pos = c.pos
  GROUP BY 1, 2
),
intra_m AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
         CAST(round(SUM(d2) / (1.0 * count(*)), 1) AS DOUBLE) AS mean_intra_d2
  FROM intra GROUP BY label
),
between_ AS (
  SELECT c.label, CAST(round(SUM((cm - gm) * (cm - gm)), 1) AS DOUBLE)
           AS between_d2
  FROM c JOIN g ON c.pos = g.pos
  GROUP BY c.label
)
SELECT i.label, i.n_vectors, i.mean_intra_d2, b.between_d2,
       CAST(round(b.between_d2 / NULLIF(i.mean_intra_d2, 0), 6) AS DOUBLE)
         AS separability
FROM intra_m i JOIN between_ b ON i.label = b.label
ORDER BY i.label
""",
)
def q_class_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class separability in embedding space: squared distance of
    each class centroid to the GLOBAL centroid (between-class spread)
    over mean within-class squared distance (intra-class scatter) —
    the Fisher-criterion readout that tells a curation pipeline which
    labels are learnable and which have collapsed into their
    neighbours (the aggregate sibling of `embedding_outlier_counts`'
    per-vector anomalies).

    Exactness: class centroids and vectors share the integer
    micro-unit quantization, so intra d² sums are exact BIGINT; the
    global centroid is a mean of 10 integers (rounded to 1 dp, the
    quantile-drift-proof scale) and the between term is built from
    it deterministically.  Two corpus passes (centroid build +
    distance pass, centroid table broadcast); everything else runs
    on |labels|×dims frames."""
    emb = load_table(spark, sf_dir, "embeddings")
    pe = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos0", "x")
    )
    c = pe.groupBy("label", (F.col("pos0") + 1).alias("pos")).agg(
        F.round(F.round(F.avg("x"), 6) * 1000000, 0).cast("long").alias("cm")
    )
    g = c.groupBy("pos").agg(F.round(F.avg("cm"), 1).alias("gm"))
    v = pe.select(
        "vec_id",
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.round(F.col("x").cast("double") * 1000000, 0).cast("long").alias("vm"),
    )
    intra = (
        v.join(F.broadcast(c), ["label", "pos"])
        .groupBy("label", "vec_id")
        .agg(
            F.sum((F.col("vm") - F.col("cm")) * (F.col("vm") - F.col("cm"))).alias(
                "d2"
            )
        )
    )
    intra_m = intra.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.sum("d2") / (F.lit(1.0) * F.count(F.lit(1))), 1)
        .cast("double")
        .alias("mean_intra_d2"),
    )
    between = (
        c.join(F.broadcast(g), "pos")
        .groupBy("label")
        .agg(
            F.round(
                F.sum((F.col("cm") - F.col("gm")) * (F.col("cm") - F.col("gm"))),
                1,
            )
            .cast("double")
            .alias("between_d2")
        )
    )
    return (
        intra_m.join(between, "label")
        .select(
            "label",
            "n_vectors",
            "mean_intra_d2",
            "between_d2",
            F.round(
                F.col("between_d2") / F.nullif(F.col("mean_intra_d2"), F.lit(0.0)),
                6,
            )
            .cast("double")
            .alias("separability"),
        )
        .orderBy("label")
    )


#: l-diversity floor: a quasi-identifier group whose sensitive
#: attribute takes fewer than this many distinct values is linkable
#: even when k-anonymous (Machanavajjhala et al. 2007).
_L_DIVERSITY = 3


@query(
    "l_diversity_audit",
    oracle=f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(count(*) AS BIGINT) AS group_size,
         CAST(count(DISTINCT (CAST(round(c_acctbal * 100, 0) AS BIGINT)
                              + 10000000) // 200000) AS BIGINT) AS l_distinct
  FROM customer GROUP BY 1, 2
)
SELECT c_nationkey, c_mktsegment, group_size, l_distinct,
       l_distinct >= {_L_DIVERSITY} AS l_ok
FROM g
ORDER BY l_distinct, group_size DESC, c_nationkey, c_mktsegment
LIMIT 20
""",
)
def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the attack k-anonymity misses: a
    (nation, segment) group can be large (k-anonymous,
    `k_anonymity_audit`) yet have every member in the SAME balance
    band, so the sensitive value leaks by membership alone.  Reports
    the 20 least-diverse quasi-identifier groups with their distinct
    sensitive-band count and the ≥{_L_DIVERSITY} flag — the release
    gate a privacy review runs next to the k check.

    Sensitive attribute = $2000 account-balance bands from exact
    integer cents, domain-shifted non-negative before the integer
    division (Spark `div` truncates toward zero, DuckDB `//` floors —
    they disagree on negatives; the shift makes them identical).  One
    partial-aggregatable rollup (count + count-distinct over the QI
    key); the distinct is bounded per group by the band domain, and
    the worst-20 ordering has full deterministic tiebreaks."""
    cust = load_table(spark, sf_dir, "customer")
    # +10,000,000 cents shifts the +-999,999 domain non-negative so
    # Spark's truncating `div` and DuckDB's flooring `//` agree (they
    # diverge on negative balances)
    band = F.expr(
        "(CAST(round(c_acctbal * 100, 0) AS BIGINT) + 10000000) div 200000"
    )
    g = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.count_distinct(band).cast("long").alias("l_distinct"),
    )
    return (
        g.select(
            "c_nationkey",
            "c_mktsegment",
            "group_size",
            "l_distinct",
            (F.col("l_distinct") >= _L_DIVERSITY).alias("l_ok"),
        )
        .orderBy(
            "l_distinct",
            F.col("group_size").desc(),
            "c_nationkey",
            "c_mktsegment",
        )
        .limit(20)
    )


#: t-closeness ceiling: a quasi-identifier group whose sensitive-value
#: distribution sits farther than this (ordered EMD) from the global
#: distribution leaks the attribute by membership (Li et al. 2007).
_T_CLOSENESS = 0.2

_BAND_SQL = "(CAST(round(c_acctbal * 100, 0) AS BIGINT) + 10000000) // 200000"


@query(
    "t_closeness_audit",
    oracle=f"""
WITH rows_b AS (
  SELECT c_nationkey, c_mktsegment, {_BAND_SQL} AS band FROM customer
),
bands AS (SELECT DISTINCT band FROM rows_b),
m AS (SELECT count(*) AS n_bands FROM bands),
total AS (SELECT count(*) AS n_all FROM rows_b),
global_d AS (
  SELECT band, count(*) AS g_cnt FROM rows_b GROUP BY band
),
groups AS (
  SELECT c_nationkey, c_mktsegment, count(*) AS group_size
  FROM rows_b GROUP BY 1, 2
),
group_d AS (
  SELECT c_nationkey, c_mktsegment, band, count(*) AS q_cnt
  FROM rows_b GROUP BY 1, 2, 3
),
grid AS (
  SELECT g.c_nationkey, g.c_mktsegment, g.group_size, b.band,
         coalesce(d.q_cnt, 0) / CAST(g.group_size AS DOUBLE)
           - gd.g_cnt / CAST(t.n_all AS DOUBLE) AS diff
  FROM groups g
  CROSS JOIN bands b
  JOIN global_d gd ON gd.band = b.band
  CROSS JOIN total t
  LEFT JOIN group_d d ON d.c_nationkey = g.c_nationkey
    AND d.c_mktsegment = g.c_mktsegment AND d.band = b.band
),
cum AS (
  SELECT c_nationkey, c_mktsegment, group_size,
         sum(diff) OVER (PARTITION BY c_nationkey, c_mktsegment
                         ORDER BY band
                         ROWS UNBOUNDED PRECEDING) AS cum_diff
  FROM grid
)
SELECT c_nationkey, c_mktsegment, group_size,
       round(sum(abs(cum_diff)) / ((SELECT n_bands FROM m) - 1), 6) AS emd,
       round(sum(abs(cum_diff)) / ((SELECT n_bands FROM m) - 1), 6)
         <= {_T_CLOSENESS} AS t_ok
FROM cum
GROUP BY c_nationkey, c_mktsegment, group_size
ORDER BY emd DESC, c_nationkey, c_mktsegment
LIMIT 20
""",
)
def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung of the release ladder after
    `k_anonymity_audit` and `l_diversity_audit`: a group can be large
    (k) AND diverse (l) yet still leak if its sensitive-value
    DISTRIBUTION is skewed far from the table's (e.g. a group whose
    balances are diverse but all high).  Distance = ordered Earth
    Mover's Distance over the $2000 balance bands — the cumulative
    formulation sum|cum(Q - P)| / (m - 1) from Li et al. 2007 — with
    the 20 farthest quasi-identifier groups and the <= {_T_CLOSENESS}
    release flag.

    Scale: rows aggregate once to (group, band) cells; the EMD grid is
    groups x bands — quasi-identifier cardinality by band domain, both
    bounded by design, never row count — so the cross join is a
    broadcast of a ~10-row band table and the cumulative window runs
    on the tiny grid.  Everything after the first aggregate is
    metadata-sized."""
    cust = load_table(spark, sf_dir, "customer")
    band = F.expr(
        "(CAST(round(c_acctbal * 100, 0) AS BIGINT) + 10000000) div 200000"
    ).alias("band")
    rows_b = cust.select("c_nationkey", "c_mktsegment", band)
    bands = rows_b.select("band").distinct()
    global_d = rows_b.groupBy("band").agg(F.count(F.lit(1)).alias("g_cnt"))
    totals = rows_b.agg(F.count(F.lit(1)).alias("n_all"))
    n_bands = bands.agg(F.count(F.lit(1)).alias("n_bands"))
    groups = rows_b.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    group_d = rows_b.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).alias("q_cnt")
    )
    grid = (
        groups.join(F.broadcast(bands.join(global_d, "band")))
        .join(F.broadcast(totals))
        .join(group_d, ["c_nationkey", "c_mktsegment", "band"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_size",
            "band",
            (
                F.coalesce(F.col("q_cnt"), F.lit(0))
                / F.col("group_size").cast("double")
                - F.col("g_cnt") / F.col("n_all").cast("double")
            ).alias("diff"),
        )
    )
    w = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.withColumn("cum_diff", F.sum("diff").over(w))
    emd = F.round(
        F.sum(F.abs(F.col("cum_diff"))) / (F.first("n_bands") - 1), 6
    )
    return (
        cum.join(F.broadcast(n_bands))
        .groupBy("c_nationkey", "c_mktsegment", "group_size")
        .agg(emd.alias("emd"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_size",
            "emd",
            (F.col("emd") <= _T_CLOSENESS).alias("t_ok"),
        )
        .orderBy(F.col("emd").desc(), "c_nationkey", "c_mktsegment")
        .limit(20)
    )


@query(
    "fairness_parity_audit",
    oracle="""
WITH scored AS (
  SELECT n.n_name AS grp,
         CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS positive
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
),
rates AS (
  SELECT grp, count(*) AS n, SUM(positive) AS positives
  FROM scored GROUP BY 1
),
best AS (
  SELECT max(CAST(round(positives * 1000000.0 / n, 0) AS BIGINT))
           AS best_micro
  FROM rates
)
SELECT grp,
       CAST(n AS BIGINT) AS n,
       CAST(positives AS BIGINT) AS positives,
       round(CAST(round(positives * 1000000.0 / n, 0) AS BIGINT)
             / 1000000.0, 6) AS rate,
       round(CAST(round(positives * 1000000.0 / n, 0) AS BIGINT)
             / CAST(best_micro AS DOUBLE), 6) AS di_ratio,
       CAST(round(positives * 1000000.0 / n, 0) AS BIGINT) * 5
         >= best_micro * 4 AS four_fifths_pass
FROM rates CROSS JOIN best
ORDER BY grp
""",
)
def q_fairness_parity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEMOGRAPHIC-PARITY / DISPARATE-IMPACT audit — the selection-rate
    check a curation or decision pipeline runs per protected group
    (here: customer nation) before shipping: each group's positive
    rate (order flagged urgent/high), its ratio to the BEST group's
    rate, and the EEOC four-fifths flag (rate ≥ 80% of the best) —
    evaluated in exact integer arithmetic (rates quantized to
    micro-units, the 4/5 test as a cross-multiplied integer
    inequality, so no float boundary can flip a verdict).

    Completes the responsible-data family next to k-anonymity /
    l-diversity / t-closeness (those audit what the data LEAKS; this
    audits what a decision rule DOES).  Scale: one fact scan with two
    broadcast dim joins into a 25-group aggregate; everything after is
    group-count arithmetic."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    scored = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("grp"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            )
            .otherwise(0)
            .alias("positive"),
        )
    )
    rates = scored.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("positive").alias("positives")
    )
    rate_micro = F.round(
        F.col("positives") * 1000000.0 / F.col("n"), 0
    ).cast("long")
    best = rates.select(rate_micro.alias("m")).agg(
        F.max("m").alias("best_micro")
    )
    return (
        rates.crossJoin(F.broadcast(best))
        .select(
            "grp",
            F.col("n").cast("long").alias("n"),
            F.col("positives").cast("long").alias("positives"),
            F.round(rate_micro / 1000000.0, 6).alias("rate"),
            F.round(
                rate_micro / F.col("best_micro").cast("double"), 6
            ).alias("di_ratio"),
            (rate_micro * 5 >= F.col("best_micro") * 4).alias(
                "four_fifths_pass"
            ),
        )
        .orderBy("grp")
    )
