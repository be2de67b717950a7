"""Product-quantization queries (operators/quantization.py) with FULL
value oracles: the per-subspace Lloyd's runs, the code assignment, and
the asymmetric-distance ranking all replay in DuckDB SQL under the
shared determinism contract (smallest-id seeds, 6-dp quantized
updates, left-to-right distance folds, lowest-code argmin ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

_M = 4  # subspaces
_K = 16  # codes per subspace
_SUB = 16  # dims per subspace (64 / 4)
_QUERY_IDS = [0, 1, 2, 3, 4]
_TOPK = 10


def _sub_ctes(s: int) -> str:
    """The CTE chain for subspace ``s``: slice → seeds → 1 Lloyd's
    round → final code assignment (mirrors lloyds_centroids +
    pq_encode exactly)."""
    lo, hi = s * _SUB + 1, (s + 1) * _SUB
    dist = (
        "list_sum(list_transform(range(1, {n} + 1), "
        "i -> ({a}.v[i] - {b}.c[i]) * ({a}.v[i] - {b}.c[i])))"
    )
    d0 = dist.format(n=_SUB, a=f"e{s}", b=f"c0_{s}")
    d1 = dist.format(n=_SUB, a=f"e{s}", b=f"c1_{s}")
    return f"""
e{s} AS (
  SELECT vec_id, (CAST(embedding AS DOUBLE[]))[{lo}:{hi}] AS v FROM embeddings
),
c0_{s} AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS c
  FROM (SELECT vec_id, v FROM e{s} ORDER BY vec_id LIMIT {_K}) seeds
),
a1_{s} AS (
  SELECT vec_id, v, cluster FROM (
    SELECT e{s}.vec_id, e{s}.v, c0_{s}.cluster,
           row_number() OVER (PARTITION BY e{s}.vec_id
                              ORDER BY {d0}, c0_{s}.cluster) AS rn
    FROM e{s} CROSS JOIN c0_{s}
  ) WHERE rn = 1
),
m1_{s} AS (
  SELECT cluster, i, round(avg(v[i]), 6) AS val
  FROM a1_{s}, range(1, {_SUB} + 1) t(i)
  GROUP BY cluster, i
),
u1_{s} AS (
  SELECT cluster, list(val ORDER BY i) AS c FROM m1_{s} GROUP BY cluster
),
c1_{s} AS (
  SELECT p.cluster, COALESCE(u1_{s}.c, p.c) AS c
  FROM c0_{s} p LEFT JOIN u1_{s} ON p.cluster = u1_{s}.cluster
),
code{s} AS (
  SELECT vec_id, cluster AS code FROM (
    SELECT e{s}.vec_id, c1_{s}.cluster,
           row_number() OVER (PARTITION BY e{s}.vec_id
                              ORDER BY {d1}, c1_{s}.cluster) AS rn
    FROM e{s} CROSS JOIN c1_{s}
  ) WHERE rn = 1
)"""


def _codes_oracle() -> str:
    ctes = ",".join(_sub_ctes(s) for s in range(_M))
    joins = " ".join(f"JOIN code{s} ON code0.vec_id = code{s}.vec_id" for s in range(1, _M))
    cols = ", ".join(f"CAST(code{s}.code AS BIGINT) AS code_{s}" for s in range(_M))
    return f"""
WITH {ctes}
SELECT code0.vec_id, {cols}
FROM code0 {joins}
ORDER BY code0.vec_id
"""


def _qd_ctes(ids: str) -> str:
    """Per-subspace query→code distance tables (the ADC lookup tables)
    — shared by the flat-ADC and IVFADC oracles."""
    return ",".join(
        f"""
qd{s} AS (
  SELECT q.vec_id AS query_id, c.cluster AS code,
         round(list_sum(list_transform(range(1, {_SUB} + 1),
               i -> (q.v[i] - c.c[i]) * (q.v[i] - c.c[i]))), 6) AS d
  FROM (SELECT vec_id, v FROM e{s} WHERE vec_id IN ({ids})) q
  CROSS JOIN c1_{s} c
)"""
        for s in range(_M)
    )


def _adc_oracle() -> str:
    ctes = ",".join(_sub_ctes(s) for s in range(_M))
    ids = ", ".join(str(i) for i in _QUERY_IDS)
    qd = _qd_ctes(ids)
    code_joins = " ".join(
        f"JOIN code{s} x{s} ON x0.vec_id = x{s}.vec_id" for s in range(1, _M)
    )
    qd_joins = " ".join(
        f"JOIN qd{s} ON qd{s}.code = x{s}.code AND qd{s}.query_id = qd0.query_id"
        for s in range(1, _M)
    )
    total = " + ".join(f"qd{s}.d" for s in range(_M))
    return f"""
WITH {ctes},{qd},
scored AS (
  SELECT qd0.query_id, x0.vec_id AS cand_id,
         round({total}, 6) AS approx_sq_dist
  FROM code0 x0 {code_joins}
  JOIN qd0 ON qd0.code = x0.code {qd_joins}
  WHERE x0.vec_id NOT IN ({ids})
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY approx_sq_dist, cand_id) AS rn
  FROM scored
)
SELECT query_id, cand_id, approx_sq_dist
FROM ranked WHERE rn <= {_TOPK}
ORDER BY query_id, cand_id
"""


def _ivf_adc_oracle() -> str:
    from ..operators.similarity import N_CENTROIDS, N_PROBE

    ctes = ",".join(_sub_ctes(s) for s in range(_M))
    ids = ", ".join(str(i) for i in _QUERY_IDS)
    qd = _qd_ctes(ids)
    cent_ids = ", ".join(str(10 + 25 * i) for i in range(N_CENTROIDS))
    code_joins = " ".join(
        f"JOIN code{s} x{s} ON x{s}.vec_id = cand.cand_id" for s in range(_M)
    )
    qd_joins = " ".join(
        f"JOIN qd{s} ON qd{s}.query_id = cand.query_id AND qd{s}.code = x{s}.code"
        for s in range(_M)
    )
    total = " + ".join(f"qd{s}.d" for s in range(_M))
    return f"""
WITH {ctes},{qd},
ef AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS c FROM ef WHERE vec_id IN ({cent_ids})),
corpus_assign AS (
  SELECT cand_id, cluster FROM (
    SELECT x.vec_id AS cand_id, cent.cid AS cluster,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY list_cosine_similarity(x.v, cent.c) DESC,
                                       cent.cid) AS rn
    FROM ef x CROSS JOIN cent WHERE x.vec_id NOT IN ({ids})
  ) WHERE rn = 1
),
query_probe AS (
  SELECT query_id, cluster FROM (
    SELECT x.vec_id AS query_id, cent.cid AS cluster,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY list_cosine_similarity(x.v, cent.c) DESC,
                                       cent.cid) AS rn
    FROM ef x CROSS JOIN cent WHERE x.vec_id IN ({ids})
  ) WHERE rn <= {N_PROBE}
),
cand AS (
  SELECT qp.query_id, ca.cand_id
  FROM corpus_assign ca JOIN query_probe qp USING (cluster)
),
scored AS (
  SELECT cand.query_id, cand.cand_id, round({total}, 6) AS approx_sq_dist
  FROM cand {code_joins} {qd_joins}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY approx_sq_dist, cand_id) AS rn
  FROM scored
)
SELECT query_id, cand_id, approx_sq_dist
FROM ranked WHERE rn <= {_TOPK}
ORDER BY query_id, cand_id
"""


@query("pq_codes", oracle=_codes_oracle())
def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: every embedding compressed to
    four one-byte codes (argmin centroid per 16-dim subspace — codegen
    folds against broadcast literals, scan-only).  32× compression at
    dim=64: the representation ADC search probes INSTEAD of the full
    vectors.  The oracle replays all four per-subspace Lloyd's runs
    and assignments in SQL."""
    from ..operators.quantization import pq_codebooks, pq_encode

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_codebooks(emb, m=_M, k=_K, n_iter=1)
    return pq_encode(emb, books).orderBy("vec_id")


@query("pq_adc_topk", oracle=_adc_oracle())
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance top-10 per query over PQ codes: per-query
    distance tables (|queries| × k rows per subspace) broadcast onto
    the codes table; the full vectors are never read after encoding —
    at 10¹¹ vectors the search working set is m bytes/vector, which is
    why PQ is the corpus-scale ANN representation.  Estimated distances
    are per-subspace 6-dp-rounded sums, bit-identical across engines;
    ties rank by cand_id."""
    from ..operators.quantization import pq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(emb, _QUERY_IDS, topk=_TOPK).orderBy("query_id", "cand_id")


@query("ivf_adc_topk", oracle=_ivf_adc_oracle())
def q_ivf_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC — inverted-file candidate restriction composed with
    asymmetric-distance PQ ranking (the FAISS IVFPQ search shape):
    each query probes its 4 nearest coarse lists and ranks only those
    lists' members by code-table distance, so search touches
    n_probe/C of an m-bytes-per-vector table instead of any full
    vectors.  Both constituent operators are already value-oracled;
    this query oracles their COMPOSITION — coarse assignment, probe
    set, codebooks, codes, distance tables, and ranking replayed
    end-to-end in SQL."""
    from ..operators.quantization import ivf_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_adc_topk(emb, _QUERY_IDS, topk=_TOPK).orderBy("query_id", "cand_id")


@query(
    "sq8_quantization_error",
    oracle="""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
dims AS (
  SELECT CAST(i AS INT) AS i, MIN(v[i]) AS mn, MAX(v[i]) AS mx
  FROM e CROSS JOIN range(1, 65) t(i)
  GROUP BY 1
),
grids AS (
  SELECT list(mn ORDER BY i) AS mnl, list(mx ORDER BY i) AS mxl FROM dims
),
err AS (
  SELECT e.label,
         round(list_sum(list_transform(range(1, 65), i ->
           CASE WHEN g.mxl[i] > g.mnl[i]
                THEN pow(e.v[i] - (g.mnl[i]
                     + round((e.v[i] - g.mnl[i]) * 255.0 / (g.mxl[i] - g.mnl[i]))
                       * (g.mxl[i] - g.mnl[i]) / 255.0), 2)
                ELSE 0.0 END)), 6) AS err6
  FROM e CROSS JOIN grids g
)
SELECT label,
       count(*) AS n_vecs,
       CAST(SUM(CAST(round(err6 * 1000000, 0) AS BIGINT)) AS BIGINT)
         AS err_micro_total,
       CAST(round(sqrt(SUM(CAST(round(err6 * 1000000, 0) AS BIGINT))
                       / (1000000.0 * count(*))), 6) AS DOUBLE) AS rms_error
FROM err
GROUP BY label
ORDER BY label
""",
)
def q_sq8_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization (SQ8) reconstruction-error audit — the
    4×-compression sanity check run before swapping an ANN corpus from
    float32 to uint8 codes: per-dimension min/max grid, 255-step
    uniform quantizer, and the per-label RMS reconstruction error that
    decides whether SQ8 (vs PQ, vs no compression) is acceptable.

    Determinism: the per-dim grid is ONE tiny aggregate (64 rows)
    collected driver-side and embedded as literal arrays (the
    kmeans-centroid precedent — aggregate-sized, never row data); each
    vector's squared error is a LEFT-TO-RIGHT fold over dims (Spark
    ``F.aggregate`` ↔ DuckDB ``list_sum(list_transform ...)``, the
    bit-identical pair the PQ oracles pinned), rounded to 6 dp and
    lifted to integer micro-units BEFORE the cross-row sum — so the
    per-label totals are exact at any partitioning.

    Scale shape: one dims-explode aggregate (64·n rows collapsing
    map-side) + one embarrassingly-parallel scan with the grid as
    broadcast literals + one label rollup.  No join, no window."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("v")
    )
    dims = (
        emb.select(F.posexplode("v").alias("i0", "val"))
        .groupBy("i0")
        .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
        .orderBy("i0")
        .collect()
    )
    mns = [r["mn"] for r in dims]
    mxs = [r["mx"] for r in dims]
    mnl = F.array([F.lit(x) for x in mns])
    mxl = F.array([F.lit(x) for x in mxs])

    def term(i: F.Column) -> F.Column:
        v_i = F.element_at(F.col("v"), i.cast("int"))
        mn_i = F.element_at(mnl, i.cast("int"))
        mx_i = F.element_at(mxl, i.cast("int"))
        step = mx_i - mn_i
        recon = mn_i + F.round((v_i - mn_i) * 255.0 / step) * step / 255.0
        return F.when(mx_i > mn_i, F.pow(v_i - recon, F.lit(2))).otherwise(
            F.lit(0.0)
        )

    err6 = F.round(
        F.aggregate(
            F.transform(F.sequence(F.lit(1), F.lit(64)), term),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    per_vec = emb.select(
        "label", F.round(err6 * 1_000_000, 0).cast("long").alias("err_micro")
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("err_micro").cast("long").alias("err_micro_total"),
        )
        .select(
            "label",
            "n_vecs",
            "err_micro_total",
            F.round(
                F.sqrt(
                    F.col("err_micro_total") / (F.lit(1_000_000.0) * F.col("n_vecs"))
                ),
                6,
            )
            .cast("double")
            .alias("rms_error"),
        )
        .orderBy("label")
    )


def _recall_oracle() -> str:
    """Flat-ADC recall@k vs the exact sq-L2 ground truth: the full ADC
    replay (`_adc_oracle`'s CTE chain) joined against a brute-force
    exact top-k, recall = overlap / k per query."""
    ctes = ",".join(_sub_ctes(s) for s in range(_M))
    ids = ", ".join(str(i) for i in _QUERY_IDS)
    qd = _qd_ctes(ids)
    code_joins = " ".join(
        f"JOIN code{s} x{s} ON x0.vec_id = x{s}.vec_id" for s in range(1, _M)
    )
    qd_joins = " ".join(
        f"JOIN qd{s} ON qd{s}.code = x{s}.code AND qd{s}.query_id = qd0.query_id"
        for s in range(1, _M)
    )
    total = " + ".join(f"qd{s}.d" for s in range(_M))
    return f"""
WITH {ctes},{qd},
scored AS (
  SELECT qd0.query_id, x0.vec_id AS cand_id,
         round({total}, 6) AS approx_sq_dist
  FROM code0 x0 {code_joins}
  JOIN qd0 ON qd0.code = x0.code {qd_joins}
  WHERE x0.vec_id NOT IN ({ids})
),
approx AS (
  SELECT query_id, cand_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY approx_sq_dist, cand_id) AS rn
    FROM scored
  ) WHERE rn <= {_TOPK}
),
ef AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
exact AS (
  SELECT query_id, cand_id FROM (
    SELECT q.vec_id AS query_id, x.vec_id AS cand_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY
             list_sum(list_transform(range(1, 65),
               i -> (q.v[i] - x.v[i]) * (q.v[i] - x.v[i]))), x.vec_id) AS rn
    FROM (SELECT * FROM ef WHERE vec_id IN ({ids})) q
    CROSS JOIN (SELECT * FROM ef WHERE vec_id NOT IN ({ids})) x
  ) WHERE rn <= {_TOPK}
)
SELECT a.query_id,
       CAST(count(e.cand_id) AS BIGINT) AS n_hits,
       CAST(round(count(e.cand_id) / {float(_TOPK)}, 2) AS DOUBLE) AS recall_at_k
FROM approx a LEFT JOIN exact e
  ON a.query_id = e.query_id AND a.cand_id = e.cand_id
GROUP BY a.query_id ORDER BY a.query_id
"""


@query("adc_recall_audit", oracle=_recall_oracle())
def q_adc_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{k} of the compressed flat-ADC search against the EXACT
    squared-L2 top-{k} — the one metric every production ANN
    deployment monitors per release (compression that silently drops
    recall poisons downstream retrieval; FAISS benchmarks report
    exactly this).  Composes two already-verified pipelines: the PQ/ADC
    ranking of `pq_adc_topk` and a brute-force ground truth using the
    SAME left-to-right distance fold both engines replay
    bit-identically.

    Scale shape: the approx side touches only the m-byte code table
    (broadcast distance tables); the exact side is one broadcast-query
    corpus scan with a WindowGroupLimit top-k — the expensive-but-
    linear audit you run on a SAMPLE of queries, not per request.  The
    final recall is a |queries|-row join + count."""
    from ..operators.quantization import _sq_dist_cols, pq_adc_topk
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    approx = pq_adc_topk(emb, _QUERY_IDS, topk=_TOPK).select(
        "query_id", "cand_id"
    )
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id").isin(_QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cand = e.filter(~F.col("vec_id").isin(_QUERY_IDS))
    w = Window.partitionBy("query_id").orderBy("d", "cand_id")
    exact = (
        cand.crossJoin(F.broadcast(q))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            _sq_dist_cols(F.col("qv"), F.col("v")).alias("d"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select("query_id", "cand_id", F.lit(1).alias("_hit"))
    )
    return (
        approx.join(exact, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(F.count("_hit").alias("n_hits"))
        .select(
            "query_id",
            F.col("n_hits").cast("long").alias("n_hits"),
            F.round(F.col("n_hits") / F.lit(float(_TOPK)), 2)
            .cast("double")
            .alias("recall_at_k"),
        )
        .orderBy("query_id")
    )
