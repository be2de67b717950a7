"""Similarity-search queries (embedding ANN) with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

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


def _lsh_oracle() -> str:
    """Full value oracle for the hyperplane-LSH path: the planes are
    md5-derived DRIVER-SIDE literals (operators/similarity.hyperplane),
    so the same doubles embed into this SQL — bucket signs come from
    the identical left-to-right dot fold on both engines, making even
    the 'approximate' method's candidate sets value-checkable."""
    from ..operators.similarity import N_PLANES, hyperplane

    planes = ", ".join(
        "[" + ", ".join(repr(hyperplane(p, d)) for d in range(64)) + "]"
        + f"::DOUBLE[] AS p{p}"
        for p in range(N_PLANES)
    )
    bucket = " + ".join(
        f"(CASE WHEN list_sum(list_transform(range(1, 65), i -> v[i] * p{p}[i])) >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )
    probes = ", ".join(["qb"] + [f"xor(qb, {1 << p})" for p in range(N_PLANES)])
    return f"""
WITH planes AS (SELECT {planes}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (
  SELECT vec_id, v, {bucket} AS bucket
  FROM e CROSS JOIN planes
),
q AS (
  SELECT vec_id AS query_id, v AS qv, bucket AS qb
  FROM b WHERE vec_id IN ({_IDS})
),
probes AS (
  SELECT query_id, qv, unnest([{probes}]) AS bucket FROM q
),
c AS (
  SELECT vec_id AS cand_id, v AS cv, bucket
  FROM b WHERE vec_id NOT IN ({_IDS})
),
scored AS (
  SELECT DISTINCT query_id, cand_id,
         round(list_cosine_similarity(qv, cv), 6) AS cos_sim
  FROM probes JOIN c USING (bucket)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, cand_id) AS rank
  FROM scored
)
SELECT query_id, cand_id, cos_sim, rank FROM ranked
WHERE rank <= {K}
ORDER BY query_id, rank
"""


@query("knn_lsh_topk", oracle=_lsh_oracle())
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via 16 random-hyperplane buckets + 1-bit
    multiprobe.  'Approximate' describes RECALL vs brute force (pinned
    in tests), not reproducibility: planes, buckets, probes, and
    re-scoring are all deterministic, so the full candidate set
    value-checks against the oracle — the property a production ANN
    pipeline needs for debuggability."""
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(emb, QUERY_IDS, k=K, dim=64).orderBy("query_id", "rank")


def _ivf_oracle(cand_pred: str = "") -> str:
    """IVF replay SQL; ``cand_pred`` is an extra predicate ANDed onto
    the corpus side (the filtered-search form — the index CTEs are
    unchanged, only the inverted-list scan is pruned)."""
    from ..operators.similarity import N_CENTROIDS, N_PROBE

    cent_ids = ", ".join(str(10 + 25 * i) for i in range(N_CENTROIDS))
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id IN ({cent_ids})),
corpus_assign AS (
  SELECT cand_id, cv, cluster FROM (
    SELECT x.vec_id AS cand_id, x.v AS cv, cent.cid AS cluster,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY list_cosine_similarity(x.v, cent.c) DESC,
                                       cent.cid) AS rn
    FROM e x CROSS JOIN cent WHERE x.vec_id NOT IN ({_IDS}) {cand_pred}
  ) WHERE rn = 1
),
query_probe AS (
  SELECT query_id, qv, cluster FROM (
    SELECT x.vec_id AS query_id, x.v AS qv, cent.cid AS cluster,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY list_cosine_similarity(x.v, cent.c) DESC,
                                       cent.cid) AS rn
    FROM e x CROSS JOIN cent WHERE x.vec_id IN ({_IDS})
  ) WHERE rn <= {N_PROBE}
),
scored AS (
  SELECT query_id, cand_id,
         round(list_cosine_similarity(qv, cv), 6) AS cos_sim
  FROM query_probe JOIN corpus_assign USING (cluster)
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, cand_id) AS rank
  FROM scored
)
SELECT query_id, cand_id, cos_sim, rank FROM ranked
WHERE rank <= {K}
ORDER BY query_id, rank
"""


@query("knn_ivf_topk", oracle=_ivf_oracle())
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via IVF (16 inverted lists, 4 probed per
    query): vectorized Pandas-UDF centroid assignment, equi-join
    candidate generation, exact re-scoring.  Centroids are corpus
    vectors at fixed ids (sorted, so the assignment tie-break is the
    centroid ID, not physical layout), which makes the whole
    approximate path deterministic — the oracle replays assignment,
    probing, and re-scoring as cross-join + rank SQL.  Recall vs brute
    force stays pinned in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, QUERY_IDS, k=K).orderBy("query_id", "rank")


@query(
    "knn_ivf_filtered_topk",
    oracle=_ivf_oracle(
        cand_pred="AND x.vec_id IN (SELECT vec_id FROM embeddings WHERE label % 4 = 1)"
    ),
)
def q_knn_ivf_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search: IVF top-10 restricted to candidates
    whose metadata matches a predicate (label % 4 = 1 — a 25% slice).
    The index is built over the FULL corpus (per-query predicates must
    never re-layout the stored inverted lists); the predicate prunes
    the lists with one semi-join BEFORE any distance arithmetic — the
    PRE-filter strategy.  Post-filtering a fixed-k result under-fills
    at selective predicates (filter-then-rank ≠ rank-then-filter);
    pre-filtering keeps exactly-k semantics over the allowed set, and
    at scale the allow-list is a broadcast semi-join (or the predicate
    pushes straight into the bucketed corpus scan).  The oracle
    replays assignment, probing, pruning, and re-scoring in SQL."""
    emb = load_table(spark, sf_dir, "embeddings")
    allowed = emb.filter(F.col("label") % 4 == 1).select("vec_id")
    return ivf_topk(emb, QUERY_IDS, k=K, candidate_ids=allowed).orderBy(
        "query_id", "rank"
    )


@query("pca_project_2d", oracle=None)
def q_pca_project_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 PCA projection of the embedding corpus (with labels) —
    the dimensionality-reduction / corpus-map preprocessing step an
    ANN pipeline runs before indexing (and the 2-D view every
    embedding-quality review starts from).

    Distributed moments (one Arrow pass → d²+d aggregate cells),
    driver-side d×d eigh (same collect contract as k-means
    centroids), JVM-side projection folds against 6-dp-quantized
    broadcast literal components — see ``operators/decomposition.py``.
    Rows-only: eigenvector values are LAPACK-defined; the algebraic
    contracts (variance ordering, orthonormality, centering) are
    pinned by ``tests/test_decomposition.py``."""
    from ..operators.decomposition import pca_project
    from ..sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return pca_project(emb, k=2, extra_cols=("label",)).orderBy("vec_id")


# ------------------------------------------------ NDCG ranking eval ---

#: Micro-scaled NDCG position discounts 1/log2(i+1), i = 1..K — computed
#: ONCE driver-side and embedded as the SAME integer literals in both
#: engines, so the whole metric is exact integer arithmetic (the only
#: transcendental never runs inside either engine).
import math as _math

_NDCG_W = [round(1_000_000 / _math.log2(i + 1)) for i in range(1, K + 1)]
_IDCG_MICRO = sum((K + 1 - j) * w for j, w in enumerate(_NDCG_W, start=1))


def _ndcg_oracle() -> str:
    """NDCG@K of the hyperplane-LSH ranking against the exact brute
    ranking: both pipelines replay verbatim (same generated plane
    literals as `_lsh_oracle`), relevance = K+1-true_rank, discounts =
    the `_NDCG_W` literals."""
    from ..operators.similarity import N_PLANES, hyperplane

    planes = ", ".join(
        "[" + ", ".join(repr(hyperplane(p, d)) for d in range(64)) + "]"
        + f"::DOUBLE[] AS p{p}"
        for p in range(N_PLANES)
    )
    bucket = " + ".join(
        f"(CASE WHEN list_sum(list_transform(range(1, 65), i -> v[i] * p{p}[i])) >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )
    probes = ", ".join(["qb"] + [f"xor(qb, {1 << p})" for p in range(N_PLANES)])
    w_list = ", ".join(str(w) for w in _NDCG_W)
    return f"""
WITH planes AS (SELECT {planes}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (
  SELECT vec_id, v, {bucket} AS bucket
  FROM e CROSS JOIN planes
),
q AS (
  SELECT vec_id AS query_id, v AS qv, bucket AS qb
  FROM b WHERE vec_id IN ({_IDS})
),
probes AS (
  SELECT query_id, qv, unnest([{probes}]) AS bucket FROM q
),
c AS (
  SELECT vec_id AS cand_id, v AS cv, bucket
  FROM b WHERE vec_id NOT IN ({_IDS})
),
lsh_scored AS (
  SELECT DISTINCT query_id, cand_id,
         round(list_cosine_similarity(qv, cv), 6) AS cos_sim
  FROM probes JOIN c USING (bucket)
),
lsh_ranked AS (
  SELECT query_id, cand_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, cand_id) AS pos
  FROM lsh_scored
),
truth AS (
  SELECT query_id, cand_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(list_cosine_similarity(qv, cv), 6)
                                     DESC, cand_id) AS true_rank
  FROM (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN ({_IDS}))
  CROSS JOIN (SELECT vec_id AS cand_id, v AS cv FROM e
              WHERE vec_id NOT IN ({_IDS}))
),
weights AS (
  SELECT unnest(range(1, {K} + 1)) AS pos, unnest([{w_list}]) AS w
),
dcg AS (
  SELECT l.query_id,
         SUM(CASE WHEN t.true_rank <= {K}
                  THEN ({K} + 1 - t.true_rank) * w.w ELSE 0 END) AS dcg_micro
  FROM lsh_ranked l
  JOIN weights w USING (pos)
  LEFT JOIN truth t ON t.query_id = l.query_id AND t.cand_id = l.cand_id
  WHERE l.pos <= {K}
  GROUP BY l.query_id
)
SELECT query_id, CAST(dcg_micro AS BIGINT) AS dcg_micro,
       CAST((dcg_micro * 1000000) // {_IDCG_MICRO} AS BIGINT) AS ndcg_ppm
FROM dcg
ORDER BY query_id
"""


@query("ann_ndcg_eval", oracle=_ndcg_oracle())
def q_ann_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation of the approximate index: NDCG@10 of
    the hyperplane-LSH top-k against the exact brute-force ranking
    (graded relevance = K+1-true_rank) — the standard IR metric that
    complements `dedup_lsh_recall`'s set-level recall with
    position-sensitive credit.

    Exactness: the log2 position discounts are computed ONCE on the
    driver and embedded as the SAME micro-scaled integer literals in
    both engines (`_NDCG_W`), relevance grades are integers, and IDCG
    is a compile-time constant — the whole metric is exact integer
    arithmetic on top of two already-deterministic rankings (6-dp
    cosines, id tie-breaks).  Scale shape: both rankings are
    per-query-bounded (k rows each), the eval join is k-row keyed, and
    the brute ground-truth pass is the audit cost — sample queries at
    100 TB exactly as `dedup_lsh_recall` samples pairs."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    truth = brute_force_topk(emb, QUERY_IDS, k=K).select(
        "query_id", "cand_id", F.col("rank").alias("true_rank")
    )
    cand = lsh_topk(emb, QUERY_IDS, k=K).select(
        "query_id", "cand_id", F.col("rank").alias("pos")
    )
    w_arr = F.lit(_NDCG_W)
    scored = (
        cand.filter(F.col("pos") <= K)
        .join(truth, ["query_id", "cand_id"], "left")
        .select(
            "query_id",
            (
                F.when(
                    F.col("true_rank") <= K,
                    (K + 1 - F.col("true_rank"))
                    * F.element_at(w_arr, F.col("pos").cast("int")),
                ).otherwise(F.lit(0))
            ).alias("gain_micro"),
        )
    )
    return (
        scored.groupBy("query_id")
        .agg(F.sum("gain_micro").alias("dcg_micro"))
        .select(
            "query_id",
            "dcg_micro",
            F.expr(f"CAST((dcg_micro * 1000000) div {_IDCG_MICRO} AS BIGINT)")
            .alias("ndcg_ppm"),
        )
        .orderBy("query_id")
    )


@query(
    "embedding_norm_profile",
    oracle="""
WITH n AS (
  SELECT label,
         SUM(CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT)
             * CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT))
           AS nn
  FROM embeddings, (SELECT unnest(range(1, 65)) AS i)
  GROUP BY vec_id, label
),
m AS (
  SELECT label,
         CAST(count(*) AS BIGINT) AS n_vectors,
         SUM(CAST(nn AS HUGEINT)) AS s,
         SUM(CAST(nn AS HUGEINT) * nn) AS ss,
         CAST(min(nn) AS BIGINT) AS min_sq,
         CAST(max(nn) AS BIGINT) AS max_sq
  FROM n GROUP BY label
)
SELECT label, n_vectors,
       CAST(round(s / (1.0 * n_vectors), 1) AS DOUBLE) AS mean_sq_norm,
       CAST(round((CAST(n_vectors AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)
                  / (1.0 * n_vectors * NULLIF(n_vectors - 1, 0)), 1) AS DOUBLE)
         AS var_sq_norm,
       min_sq, max_sq
FROM m ORDER BY label
""",
)
def q_embedding_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label squared-L2-norm profile of the embedding corpus —
    the normalization sanity gate run BEFORE any cosine machinery
    (un-normalized vectors silently bias every dot-product ranking;
    a label whose norm variance balloons flags a broken encoder
    batch).  Complements `class_separability` (between/within
    geometry) with the per-vector magnitude axis.

    Vector elements quantize to the family's integer micro-units, so
    every squared norm is an exact BIGINT and the moment SUMS are
    exact HUGEINT/DECIMAL(38,0), cast to DOUBLE before the
    n·Σs² − (Σs)² products (overflow-safe at any corpus scale);
    mean/variance are single guarded divisions at output.  One positional-explode aggregate keyed on
    (vec_id, label), one |labels|-row rollup."""
    emb = load_table(spark, sf_dir, "embeddings")
    m_unit = F.round(F.col("x").cast("double") * 1000000, 0).cast("long")
    n = (
        emb.select("vec_id", "label", F.posexplode("embedding").alias("pos0", "x"))
        .select("vec_id", "label", m_unit.alias("vm"))
        .groupBy("vec_id", "label")
        .agg(F.sum(F.col("vm") * F.col("vm")).alias("nn"))
    )
    dec = "decimal(38,0)"
    m = n.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.col("nn").cast(dec)).alias("s"),
        F.sum(F.col("nn").cast(dec) * F.col("nn")).alias("ss"),
        F.min("nn").cast("long").alias("min_sq"),
        F.max("nn").cast("long").alias("max_sq"),
    )
    return m.select(
        "label",
        F.col("n_vectors").cast("long").alias("n_vectors"),
        F.expr("CAST(round(s / (1.0D * n_vectors), 1) AS DOUBLE)").alias(
            "mean_sq_norm"
        ),
        F.expr(
            "CAST(round((CAST(n_vectors AS DOUBLE) * ss - CAST(s AS DOUBLE) * s)"
            " / (1.0D * n_vectors * NULLIF(n_vectors - 1, 0)), 1) AS DOUBLE)"
        ).alias("var_sq_norm"),
        "min_sq",
        "max_sq",
    ).orderBy("label")


#: Matryoshka prefix dimensions evaluated against the full-width truth.
_MRL_PREFIXES = (16, 32, 64)


def _mrl_oracle() -> str:
    """Per-prefix exact sq-L2 top-K vs the 64-dim truth; recall is the
    overlap count / K.  One CTE pair per prefix, all on the same
    double-cast corpus."""
    parts = []
    for p in _MRL_PREFIXES:
        parts.append(f"""
top{p} AS (
  SELECT query_id, cand_id FROM (
    SELECT q.vec_id AS query_id, x.vec_id AS cand_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             list_sum(list_transform(range(1, {p} + 1),
               i -> (q.v[i] - x.v[i]) * (q.v[i] - x.v[i]))), x.vec_id) AS rn
    FROM qv q CROSS JOIN cv x
  ) WHERE rn <= {K}
)""")
    unions = "\nUNION ALL\n".join(
        f"SELECT {p} AS prefix_dim, a.query_id,"
        f" CAST(count(t.cand_id) AS BIGINT) AS n_hits,"
        f" CAST(round(count(t.cand_id) / {float(K)}, 2) AS DOUBLE) AS recall"
        f" FROM top{p} a LEFT JOIN top64 t"
        f" ON a.query_id = t.query_id AND a.cand_id = t.cand_id"
        f" GROUP BY a.query_id"
        for p in _MRL_PREFIXES
    )
    return f"""
WITH ef AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qv AS (SELECT * FROM ef WHERE vec_id IN ({_IDS})),
cv AS (SELECT * FROM ef WHERE vec_id NOT IN ({_IDS})),
{",".join(parts)}
{unions}
ORDER BY prefix_dim, query_id
"""


@query("mrl_prefix_recall", oracle=_mrl_oracle())
def q_mrl_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka evaluation: recall@{K} of truncated-prefix exact
    search (first 16 / 32 / 64 dims) against the full-width ground
    truth — the dimension-vs-quality curve MRL-trained embeddings are
    deployed on (serve short prefixes cheaply, re-rank with the full
    vector; Kusupati et al. 2022).  The 64-prefix row is the identity
    anchor (recall 1.0 by construction), so a drift there flags the
    harness, not the embeddings.

    Per prefix: one broadcast-queries corpus scan with the prefix
    slice folded left-to-right (bit-identical on both engines) and a
    pushed per-query group limit; the recall join runs on K·|queries|
    rows.  At corpus scale the prefix scans share the one cached
    vector column — cost is |prefixes| linear passes over a SAMPLE of
    queries, the same audit shape as `adc_recall_audit`."""
    from pyspark.sql import Window

    from ..operators.quantization import _sq_dist_cols

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id").isin(QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cand = e.filter(~F.col("vec_id").isin(QUERY_IDS))
    w = Window.partitionBy("query_id").orderBy("d", "cand_id")

    def topk(prefix: int) -> DataFrame:
        return (
            cand.crossJoin(F.broadcast(q))
            .select(
                "query_id",
                F.col("vec_id").alias("cand_id"),
                _sq_dist_cols(
                    F.slice(F.col("qv"), 1, prefix),
                    F.slice(F.col("v"), 1, prefix),
                ).alias("d"),
            )
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= K)
            .select("query_id", "cand_id")
        )

    truth = topk(64).withColumn("_hit", F.lit(1))
    per_prefix = [
        topk(p)
        .join(truth, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(F.count("_hit").alias("n_hits"))
        .select(
            F.lit(p).cast("long").alias("prefix_dim"),
            "query_id",
            F.col("n_hits").cast("long").alias("n_hits"),
            F.round(F.col("n_hits") / F.lit(float(K)), 2)
            .cast("double")
            .alias("recall"),
        )
        for p in _MRL_PREFIXES
    ]
    out = per_prefix[0]
    for frame in per_prefix[1:]:
        out = out.unionByName(frame)
    return out.orderBy("prefix_dim", "query_id")


_NPROBE_SWEEP = (1, 2, 4, 8)


def _nprobe_oracle() -> str:
    from ..operators.similarity import N_CENTROIDS

    cent_ids = ", ".join(str(10 + 25 * i) for i in range(N_CENTROIDS))
    per_np = []
    selects = []
    for np_ in _NPROBE_SWEEP:
        per_np.append(f"""probe_{np_} AS (
  SELECT query_id, qv, cluster FROM (
    SELECT x.vec_id AS query_id, x.v AS qv, cent.cid AS cluster,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY list_cosine_similarity(x.v, cent.c) DESC,
                                       cent.cid) AS rn
    FROM e x CROSS JOIN cent WHERE x.vec_id IN ({_IDS})
  ) WHERE rn <= {np_}
),
scored_{np_} AS (
  SELECT query_id, cand_id,
         round(list_cosine_similarity(qv, cv), 6) AS cos_sim
  FROM probe_{np_} JOIN corpus_assign USING (cluster)
),
top_{np_} AS (
  SELECT query_id, cand_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_sim DESC, cand_id) AS rank
    FROM scored_{np_}
  ) WHERE rank <= {K}
)""")
        selects.append(f"""SELECT {np_} AS n_probe,
       (SELECT count(*) FROM scored_{np_}) AS n_scanned_pairs,
       round((SELECT count(*) FROM top_{np_} t
              JOIN truth USING (query_id, cand_id))
             / CAST((SELECT count(*) FROM truth) AS DOUBLE), 6)
         AS recall_at_{K}""")
    chain = ",\n".join(per_np)
    union = "\nUNION ALL\n".join(selects)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id IN ({cent_ids})),
corpus_assign AS (
  SELECT cand_id, cv, cluster FROM (
    SELECT x.vec_id AS cand_id, x.v AS cv, cent.cid AS cluster,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY list_cosine_similarity(x.v, cent.c) DESC,
                                       cent.cid) AS rn
    FROM e x CROSS JOIN cent WHERE x.vec_id NOT IN ({_IDS})
  ) WHERE rn = 1
),
truth AS (
  SELECT query_id, cand_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY round(list_cosine_similarity(q.v, c.v), 6)
                                         DESC,
                                       c.vec_id) AS rank
    FROM e q CROSS JOIN e c
    WHERE q.vec_id IN ({_IDS}) AND c.vec_id NOT IN ({_IDS})
  ) WHERE rank <= {K}
),
{chain}
SELECT * FROM ({union})
ORDER BY n_probe
"""


@query("ivf_nprobe_tradeoff", oracle=_nprobe_oracle())
def q_ivf_nprobe_tradeoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF TUNING CURVE — recall@{K} versus candidate-scan cost as
    n_probe sweeps {_NPROBE_SWEEP}: the one table an ANN deployment
    reads before picking its latency/quality point (FAISS publishes
    exactly this curve per index).  Ground truth is the exact brute
    cosine top-{K}; cost is the number of (query, candidate) pairs the
    probed inverted lists admit to scoring.

    Scale: the corpus assignment is computed ONCE and reused by every
    sweep point (the probe side is |queries| x n_probe rows — only the
    tiny side changes); each sweep point pays one broadcast equi-join
    on cluster id over the shared assignment, so the sweep costs ~one
    IVF search per point, never a re-index.  Exactly the plan a real
    tuner runs offline on a query sample."""
    from ..operators.similarity import (
        N_CENTROIDS,
        brute_force_topk,
        cosine,
        ivf_assign,
        _to_double,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", _to_double(F.col("embedding")).alias("v"))
    centroid_ids = [10 + 25 * i for i in range(N_CENTROIDS)]
    centroids = sorted(
        (r["vec_id"], list(r["v"]))
        for r in e.filter(F.col("vec_id").isin(centroid_ids)).collect()
    )
    # localCheckpoint (eager) rather than persist: the sweep's returned
    # frame references corpus/truth once per sweep point, and execution
    # happens AFTER this function returns — a persist would have to
    # outlive the function (leak) or be unpersisted too early (ADVICE
    # r8: the assignment + brute-force truth recomputed per point).
    # Checkpointing materializes both ONCE, here, and the blocks live
    # as long as the returned plan does.
    corpus = (
        ivf_assign(
            e.filter(~F.col("vec_id").isin(QUERY_IDS)), centroids, n_probe=1
        )
        .select(
            F.col("vec_id").alias("cand_id"),
            F.col("v").alias("cv"),
            F.element_at("clusters", 1).alias("cluster"),
        )
        .localCheckpoint()
    )
    truth = (
        brute_force_topk(emb, QUERY_IDS, k=K)
        .select("query_id", "cand_id")
        .localCheckpoint()
    )
    n_truth = truth.count()
    rows = []
    for np_ in _NPROBE_SWEEP:
        queries = ivf_assign(
            e.filter(F.col("vec_id").isin(QUERY_IDS)), centroids, n_probe=np_
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.explode("clusters").alias("cluster"),
        )
        scored = (
            F.broadcast(queries)
            .join(corpus, "cluster")
            .select(
                "query_id",
                "cand_id",
                F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("cand_id")
        )
        top = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= K)
            .select("query_id", "cand_id")
        )
        stats = scored.agg(
            F.count(F.lit(1)).cast("long").alias("n_scanned_pairs")
        ).crossJoin(
            top.join(truth, ["query_id", "cand_id"]).agg(
                F.round(
                    F.count(F.lit(1)) / float(n_truth), 6
                ).alias(f"recall_at_{K}")
            )
        )
        rows.append(stats.select(F.lit(np_).alias("n_probe"), "*"))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("n_probe")


#: KNN-Shapley configuration: K of the KNN classifier being valued and
#: the validation ids the value is measured against.
_SHAP_K = 5
_VAL_IDS = list(range(10))
_VIDS = ", ".join(str(i) for i in _VAL_IDS)


@query(
    "knn_shapley_values",
    oracle=f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, v AS qv, label AS qlabel
  FROM e WHERE vec_id IN ({_VIDS})
),
t AS (
  SELECT vec_id AS cand_id, v AS cv, label AS clabel
  FROM e WHERE vec_id NOT IN ({_VIDS})
),
scored AS (
  SELECT query_id, cand_id, clabel,
         round(list_cosine_similarity(qv, cv), 6) AS cos_sim,
         CASE WHEN clabel = qlabel THEN 1 ELSE 0 END AS m
  FROM q CROSS JOIN t
),
ranked AS (
  SELECT query_id, cand_id, clabel, m,
         row_number() OVER w AS rank,
         count(*) OVER (PARTITION BY query_id) AS n,
         lead(m) OVER w AS m_next
  FROM scored
  WINDOW w AS (PARTITION BY query_id ORDER BY cos_sim DESC, cand_id)
),
contrib AS (
  SELECT query_id, cand_id, clabel, rank, n,
         CASE WHEN m_next IS NULL THEN 0
              ELSE CAST(round((m - m_next) * LEAST({_SHAP_K}, rank)
                              * {10 ** 12 // _SHAP_K}.0 / rank) AS BIGINT)
         END AS d_pico,
         last_value(m) OVER (PARTITION BY query_id ORDER BY rank
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS m_last
  FROM ranked
),
shap AS (
  SELECT cand_id, clabel,
         sum(d_pico) OVER (PARTITION BY query_id ORDER BY rank
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           + CAST(round(m_last * 1000000000000.0 / n) AS BIGINT) AS s_pico
  FROM contrib
)
SELECT cand_id, clabel AS label,
       CAST(round(avg(s_pico) / 1000000.0) AS BIGINT) AS shapley_micro
FROM shap GROUP BY cand_id, clabel
ORDER BY shapley_micro DESC, cand_id
LIMIT 20
""",
)
def q_knn_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINING-DATA VALUATION — exact KNN-Shapley (Jia et al., PVLDB
    2019, "Efficient task-specific data valuation for nearest neighbor
    algorithms"): each training point's exact Shapley contribution to a
    {_SHAP_K}-NN classifier's accuracy on {len(_VAL_IDS)} validation
    points, the closed-form recursion
    ``s_N = 1[y_N = y]/N;  s_i = s_(i+1) +
    (1[y_i = y] - 1[y_(i+1) = y])/K * min(K, i)/i``
    over candidates ranked by similarity.  The curation use: points
    with NEGATIVE value actively hurt the downstream model — the
    principled version of "filter bad training data".  Output: top-20
    most valuable training points with their mean Shapley value.

    Spark shape: broadcast(validation) × one corpus scan, then the
    recursion telescopes into a SUFFIX SUM — rank, lead, and running
    sum windows all PARTITIONED by validation point (parallelism =
    |validation|, no global window).  Per-term contributions are
    integer-quantized (picounits) before summation so both engines add
    exact integers — FP association order can never flip the hash (the
    Horvitz-Thompson precedent).  At 100 TB: per-partition size is the
    corpus, so production truncates each ranking at top-M via the ANN
    index (the j-th term decays as 1/j; the tail bound is
    sum_(j>M) 1/j = ln(N/M), driving M); the formula and windows are
    unchanged, only the candidate generator swaps — exactly this plan
    over ivf_topk instead of the brute scan.
    """
    from ..operators.similarity import _to_double

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", _to_double(F.col("embedding")).alias("v"), "label")
    q = e.filter(F.col("vec_id").isin(_VAL_IDS)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    t = e.filter(~F.col("vec_id").isin(_VAL_IDS)).select(
        F.col("vec_id").alias("cand_id"),
        F.col("v").alias("cv"),
        F.col("label").alias("clabel"),
    )
    from ..operators.similarity import cosine

    scored = t.join(F.broadcast(q)).select(
        "query_id",
        "cand_id",
        "clabel",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        (F.col("clabel") == F.col("qlabel")).cast("int").alias("m"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "cand_id")
    w_all = Window.partitionBy("query_id")
    ranked = scored.select(
        "query_id",
        "cand_id",
        "clabel",
        "m",
        F.row_number().over(w).alias("rank"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.lead("m").over(w).alias("m_next"),
    )
    w_rank = Window.partitionBy("query_id").orderBy("rank")
    contrib = ranked.select(
        "query_id",
        "cand_id",
        "clabel",
        "rank",
        "n",
        F.when(F.col("m_next").isNull(), F.lit(0).cast("long"))
        .otherwise(
            F.round(
                (F.col("m") - F.col("m_next"))
                * F.least(F.lit(_SHAP_K), F.col("rank"))
                * float(10**12 // _SHAP_K)
                / F.col("rank"),
                0,
            ).cast("long")
        )
        .alias("d_pico"),
        F.last("m")
        .over(
            w_rank.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("m_last"),
    )
    shap = contrib.select(
        "cand_id",
        "clabel",
        (
            F.sum("d_pico").over(
                w_rank.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            )
            + F.round(F.col("m_last") * 1e12 / F.col("n"), 0).cast("long")
        ).alias("s_pico"),
    )
    return (
        shap.groupBy("cand_id", F.col("clabel").alias("label"))
        .agg(
            F.round(F.avg("s_pico") / 1e6, 0).cast("long").alias("shapley_micro")
        )
        .orderBy(F.col("shapley_micro").desc(), "cand_id")
        .limit(20)
    )


@query(
    "embedding_mmd_drift",
    oracle="""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         vec_id % 2 = 0 AS is_ref
  FROM embeddings
),
dims AS (
  SELECT is_ref, t.d AS dim, e.v[t.d] AS x
  FROM e, (SELECT unnest(generate_series(1, 64)) AS d) t
),
means AS (
  SELECT dim,
         avg(CASE WHEN is_ref THEN x END) AS mean_ref,
         avg(CASE WHEN NOT is_ref THEN x END) AS mean_cur
  FROM dims GROUP BY dim
),
diffs AS (
  SELECT dim, mean_ref, mean_cur,
         CAST(round((mean_ref - mean_cur) * 1000000.0) AS BIGINT)
           AS diff_micro
  FROM means
),
mmd AS (
  SELECT sum(diff_micro * diff_micro) AS mmd_pico FROM diffs
)
SELECT dim,
       CAST(round(mean_ref, 6) AS DOUBLE) AS mean_ref,
       CAST(round(mean_cur, 6) AS DOUBLE) AS mean_cur,
       diff_micro,
       CAST(round(mmd_pico / 1000000000000.0, 6) AS DOUBLE) AS mmd2
FROM diffs CROSS JOIN mmd
ORDER BY abs(diff_micro) DESC, dim
LIMIT 10
""",
)
def q_embedding_mmd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMBEDDING-DISTRIBUTION DRIFT between two corpus snapshots (even
    vs odd vec_id halves stand in for reference vs current): linear-
    kernel MMD² = ||mean embedding A − mean embedding B||² — the
    mean-discrepancy form of the kernel two-sample test (Gretton et
    al.), THE cheap detector for "did my embedding distribution move"
    before retraining an ANN index or a classifier head.  Output: the
    10 most-drifted dimensions (exact integer micro mean-gaps) with the
    corpus-level MMD² alongside — the drill-down a drift alarm needs.

    Scale shape: one posexplode scan → ONE combinable (dim) aggregate
    (64 cells regardless of corpus size); per-dim mean gaps are
    integer-quantized before squaring/summing so the verdict is
    association-order-proof; the top-10 ranks 64 post-aggregate rows.
    The polynomial-kernel variant is the same plan over element
    products; an RBF MMD needs random features — out of declarative
    scope by design."""
    from ..operators.similarity import _to_double

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        _to_double(F.col("embedding")).alias("v"),
        (F.col("vec_id") % 2 == 0).alias("is_ref"),
    )
    dims = e.select(
        "is_ref", F.posexplode("v").alias("pos", "x")
    ).select((F.col("pos") + 1).alias("dim"), "is_ref", "x")
    means = dims.groupBy("dim").agg(
        F.avg(F.when(F.col("is_ref"), F.col("x"))).alias("mean_ref"),
        F.avg(F.when(~F.col("is_ref"), F.col("x"))).alias("mean_cur"),
    )
    diffs = means.select(
        "dim",
        "mean_ref",
        "mean_cur",
        F.round((F.col("mean_ref") - F.col("mean_cur")) * 1e6, 0)
        .cast("long")
        .alias("diff_micro"),
    )
    mmd = diffs.agg(
        F.sum(F.col("diff_micro") * F.col("diff_micro")).alias("mmd_pico")
    )
    return (
        diffs.crossJoin(F.broadcast(mmd))
        .select(
            "dim",
            F.round("mean_ref", 6).cast("double").alias("mean_ref"),
            F.round("mean_cur", 6).cast("double").alias("mean_cur"),
            "diff_micro",
            F.round(F.col("mmd_pico") / 1e12, 6).cast("double").alias("mmd2"),
        )
        .orderBy(F.abs(F.col("diff_micro")).desc(), "dim")
        .limit(10)
    )


# ---------------------------------------- k-center greedy coreset (r11) ----

_KC_K = 8


def _kcenter_oracle() -> str:
    """Unrolled 8-step greedy selection as chained CTEs — each step's
    argmax replays the identical round-6 + vec_id tie-break rule the
    Spark loop applies, so the 'iterative' algorithm is still a full
    value oracle."""
    def dist(ci: str) -> str:
        return (
            "list_sum(list_transform(range(1, 65),"
            f" i -> (e.v[i] - {ci}.v[i]) * (e.v[i] - {ci}.v[i])))"
        )

    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        "c0 AS (SELECT vec_id, v, 0.0 AS d FROM e ORDER BY vec_id LIMIT 1)",
    ]
    for j in range(1, _KC_K):
        joins = " CROSS JOIN ".join(f"c{i}" for i in range(j))
        exclude = ", ".join(f"c{i}.vec_id" for i in range(j))
        dists = ", ".join(dist(f"c{i}") for i in range(j))
        least = dists if j == 1 else f"least({dists})"
        ctes.append(
            f"c{j} AS (SELECT e.vec_id, e.v, round({least}, 6) AS d"
            f" FROM e CROSS JOIN {joins}"
            f" WHERE e.vec_id NOT IN ({exclude})"
            f" ORDER BY d DESC, e.vec_id LIMIT 1)"
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT {j} AS sel_order, vec_id, d AS min_dist_sq FROM c{j}"
        for j in range(_KC_K)
    )
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT * FROM (\n" + sel
        + "\n) ORDER BY sel_order"
    )


@query("coreset_kcenter_greedy", oracle=_kcenter_oracle())
def q_coreset_kcenter_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-CENTER GREEDY CORESET (farthest-point traversal) — the
    2-approximation cover every embedding-space data-selection recipe
    leans on (pick the point farthest from the chosen set, repeat):
    8 maximally-spread exemplars whose selection radii are also the
    k-center cost curve.  Complements `dedup_semantic` (which REMOVES
    near-duplicates) by SELECTING for coverage — the "diverse
    subset" half of curation.

    Iterative-by-nature, priced the `kmeans_clusters` way: the
    driver holds only the k chosen vectors (k x 64 doubles), each of
    the k rounds is ONE corpus scan with the centers folded in as
    literal arrays (JVM-parsed as a single SQL expression — the
    round-5 lesson: thousands of py4j Column calls cost seconds,
    one expr string does not), and the argmax is a TakeOrdered, not
    a collect.  Selection compares round-6 distances with a vec_id
    tie-break so both engines' 64-term left-to-right float folds can
    never disagree on WHO gets picked; the oracle unrolls the same
    greedy recursion as chained CTEs.  Scale: k passes over the
    corpus, broadcast-only state — the textbook distributed
    farthest-point traversal."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    first = emb.orderBy("vec_id").select("vec_id", "v").first()
    chosen: list[tuple[int, int, float]] = [(0, int(first["vec_id"]), 0.0)]
    vecs: list[list[float]] = [list(first["v"])]
    for step in range(1, _KC_K):
        folds = [
            "aggregate(zip_with(v, array("
            + ", ".join(f"{x!r}D" for x in c)
            + "), (x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)"
            for c in vecs
        ]
        least = folds[0] if len(folds) == 1 else "least(" + ", ".join(folds) + ")"
        row = (
            emb.filter(~F.col("vec_id").isin([c[1] for c in chosen]))
            .select(
                "vec_id", F.round(F.expr(least), 6).alias("d"), "v"
            )
            .orderBy(F.desc("d"), F.asc("vec_id"))
            .first()
        )
        chosen.append((step, int(row["vec_id"]), float(row["d"])))
        vecs.append(list(row["v"]))
    return spark.createDataFrame(
        chosen, "sel_order int, vec_id bigint, min_dist_sq double"
    ).orderBy("sel_order")
