"""Connected components over near-duplicate pairs — dedup clustering.

Pair generators (MinHash-LSH, SimHash, embedding-cosine) emit EDGES;
an actual dedup pipeline needs GROUPS: every doc labeled with its
cluster so one canonical representative survives.  That is connected
components, an inherently iterative computation (SURVEY.md §7 hard
part 4: similarity/dedup at 100 TB).

Algorithm: label propagation to the minimum reachable id.  Each round
every vertex takes the min of its own label and its neighbors' labels;
convergence in O(diameter) rounds — near-dup graphs are
overwhelmingly tiny cliques (diameter ≤ 2-3), so 3-5 rounds settle
real corpora.  The self-loop trick folds "keep my own label" into the
neighbor aggregation, making each round exactly ONE join + ONE
aggregation; lineage is cut per round with ``localCheckpoint`` so the
plan doesn't grow across iterations (the classic iterative-Spark trap;
on a cluster use ``checkpoint`` to reliable storage instead).

The result is exact, so the DuckDB oracle (recursive-CTE transitive
closure to the same min-reachable-id labels) value-checks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(vertex, component) for every vertex in ``edges``; component =
    min vertex id reachable through the pair graph.

    Raises if ``max_iter`` rounds don't converge — at that point the
    graph has a path longer than any plausible near-dup cluster and
    needs the large-star/small-star variant instead.
    """
    both = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    vertices = both.select(F.col("a").alias("v")).distinct()
    # self-loops fold "min with my own label" into the neighbor min, so
    # a round is join → groupBy, with no second join against labels
    sym = both.unionByName(
        vertices.select(F.col("v").alias("a"), F.col("v").alias("b"))
    ).localCheckpoint()
    labels = vertices.withColumn("comp", F.col("v")).localCheckpoint()

    # labels only ever DECREASE, so Σcomp strictly decreases until the
    # fixpoint — a one-aggregate convergence test instead of a
    # new-vs-old join (saves a shuffle + job per round)
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]
    for _ in range(max_iter):
        # no broadcast hints: labels can be billions of rows at corpus
        # scale — AQE turns these into broadcast joins at runtime
        # whenever the side is actually small
        new_labels = (
            sym.join(labels, sym["a"] == labels["v"])
            .groupBy(F.col("b").alias("v"))
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        new_sum = new_labels.agg(F.sum("comp")).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            return labels.select(F.col("v").alias("doc"), F.col("comp").alias("component"))
        prev_sum = new_sum
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_groups(
    edges: DataFrame, src: str = "doc_a", dst: str = "doc_b"
) -> DataFrame:
    """Cluster rollup: one row per component with canonical (min) doc
    and member count — the 'keep one, drop the rest' dedup decision."""
    comp = connected_components(edges, src, dst)
    return comp.groupBy("component").agg(
        F.min("doc").alias("canonical_doc"), F.count(F.lit(1)).alias("n_members")
    )
