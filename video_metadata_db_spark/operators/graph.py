"""PageRank — iterative link analysis over an edge DataFrame.

Complements :mod:`.components` (the other iterative graph operator):
components answers "which near-dup cluster", PageRank answers "which
nodes are central" — the importance signal a curation pipeline uses to
pick canonical representatives, weight domains, or rank entities in a
co-occurrence graph.  The reference has no graph operator; this is
part of the large-scale-training-pipeline extension surface
(SURVEY.md §6).

Distributed shape (the textbook Spark formulation, but with the float
discipline this repo's oracles require):

- one round = ``ranks ⋈ edges`` on ``src`` (contribution scatter)
  + ``groupBy(dst)`` (gather) + a left join back onto the node set so
  zero-in-degree nodes keep their teleport mass,
- the edge table and out-degrees are loop-invariant: computed once,
  persisted, reused every round — at cluster scale pre-partition both
  by ``src`` so every iteration's scatter join is co-located and only
  the (node-sized, edge-free) rank frame moves,
- lineage is cut per round (``localCheckpoint``) so the plan does not
  grow superlinearly across iterations — same trap and same fix as
  ``connected_components``.

Cross-engine determinism: a PageRank round sums FLOAT contributions
per node, and a plain double ``SUM`` depends on partition order.  Each
contribution is therefore rounded to 12 dp and cast to
``DECIMAL(24,12)`` before the sum — exact and associative at any
parallelism — then the damped update is two IEEE-exact scalar ops
(one multiply, one add) re-rounded to 12 dp.  The DuckDB oracle
replays the identical quantized recurrence, so the operator gets a
full value oracle despite being iterative (same discipline as the KL
and k-means oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Per-iteration quantization of contributions and ranks: fine enough
#: that 12-dp error over a handful of rounds cannot reach the 6-dp
#: reported rank, coarse enough that DECIMAL(24,12) sums never overflow
#: (rank mass totals 1.0).
_RANK_DP = 12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``iterations`` damped power-iteration rounds.

    ``edges`` are directed (src → dst); pass a symmetrized edge set for
    an undirected walk.  Dangling nodes (out-degree 0) contribute
    nothing but still receive teleport + in-link mass via the node-set
    left join; their lost mass is NOT redistributed (the common
    simplification — documented so the oracle matches by construction).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # loop-invariant frames: persist once, reuse every round.  At
    # cluster scale both are additionally repartition(src)-aligned so
    # the per-round scatter join never re-shuffles the edge table.
    e = e.persist()
    deg = deg.persist()
    nodes = nodes.persist()

    # n is one aggregate cell (never row data) — the teleport constant
    # (1-d)/n must be a plain Python float literal so Spark and DuckDB
    # evaluate the identical IEEE division exactly once.
    n = nodes.count()
    teleport = (1.0 - damping) / n
    init = round(1.0 / n, _RANK_DP)

    ranks = nodes.select("node", F.lit(float(init)).alias("rank"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("rank") / F.col("out_deg"), _RANK_DP)
                .cast("decimal(24,12)")
                .alias("c"),
            )
        )
        gathered = contrib.groupBy("node").agg(F.sum("c").alias("c"))
        ranks = (
            nodes.join(gathered, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(teleport)
                    + F.lit(damping)
                    * F.coalesce(F.col("c").cast("double"), F.lit(0.0)),
                    _RANK_DP,
                ).alias("rank"),
            )
            # cut lineage so round k+1 plans over a leaf, not k nested
            # join-aggregates; eager so no round re-executes prior ones
            .localCheckpoint(eager=True)
        )
    for f in (e, deg, nodes):
        f.unpersist()
    return ranks


def pagerank_oracle_sql(
    edges_cte: str,
    *,
    iterations: int = 3,
    damping: float = 0.85,
) -> str:
    """DuckDB CTE chain replaying :func:`pagerank` exactly.

    ``edges_cte`` must define a relation ``edges(src, dst)``.  Returns
    SQL ending in a relation ``pr(node, rank)`` — callers append their
    own final SELECT.  The recurrence is unrolled (one CTE pair per
    round) with the same 12-dp quantization, so equality with the Spark
    side is by construction, not by float luck.
    """
    parts = [
        edges_cte,
        "nodes AS (SELECT DISTINCT src AS node FROM edges"
        " UNION SELECT DISTINCT dst FROM edges)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src)",
        # round(1.0/n, 12) — same init literal the operator computes
        "r0 AS (SELECT node, round(1.0 / (SELECT n FROM nn), 12) AS rank"
        " FROM nodes)",
    ]
    d = float(damping)
    for i in range(1, iterations + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node,"
            f" CAST(round(r.rank / g.out_deg, 12) AS DECIMAL(24,12)) AS c"
            f" FROM edges e JOIN r{i - 1} r ON e.src = r.node"
            f" JOIN deg g ON e.src = g.src)"
        )
        parts.append(
            f"r{i} AS (SELECT n.node,"
            f" round({1.0 - d} / (SELECT n FROM nn)"
            f" + {d} * CAST(COALESCE(s.c, 0) AS DOUBLE), 12) AS rank"
            f" FROM nodes n LEFT JOIN"
            f" (SELECT node, SUM(c) AS c FROM c{i} GROUP BY node) s"
            f" USING (node))"
        )
    parts.append(f"pr AS (SELECT node, rank FROM r{iterations})")
    return ",\n".join(parts)
