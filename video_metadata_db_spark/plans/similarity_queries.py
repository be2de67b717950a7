"""Similarity-search queries (embedding ANN) with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.similarity import brute_force_topk, ivf_topk, lsh_topk
from ..sources.tables import load_table
from .registry import query

QUERY_IDS = [0, 1, 2, 3, 4]
K = 10
_IDS = ", ".join(str(i) for i in QUERY_IDS)


@query(
    "knn_cosine_topk",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN ({_IDS})
),
c AS (
  SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id NOT IN ({_IDS})
),
scored AS (
  SELECT query_id, cand_id,
         round(list_cosine_similarity(qv, cv), 6) AS cos_sim
  FROM q CROSS JOIN c
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, cand_id) AS rank
  FROM scored
)
SELECT query_id, cand_id, cos_sim, rank FROM ranked
WHERE rank <= {K}
ORDER BY query_id, rank
""",
)
def q_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 query vectors — the ANN baseline.

    Scale: broadcast(5 queries) × corpus scan, no shuffle until the
    per-query top-k window (WindowGroupLimit keeps ≤ k per task)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, QUERY_IDS, k=K).orderBy("query_id", "rank")


@query("knn_lsh_topk", oracle=None)
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via 16 random-hyperplane buckets + 1-bit
    multiprobe.  No value oracle (approximate by design — recall vs the
    brute-force baseline is asserted in tests instead)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(emb, QUERY_IDS, k=K, dim=64).orderBy("query_id", "rank")


@query("knn_ivf_topk", oracle=None)
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via IVF (16 inverted lists, 4 probed per
    query): vectorized Pandas-UDF centroid assignment, equi-join
    candidate generation, exact re-scoring.  No value oracle
    (approximate by design — recall asserted in tests)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, QUERY_IDS, k=K).orderBy("query_id", "rank")
