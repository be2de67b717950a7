"""PCA for embedding preprocessing — the dimensionality reduction /
whitening step an ANN or clustering pipeline runs before indexing
(OPQ-style rotations, IVF on reduced dims, 2-D corpus maps).

Design for scale (the same split every operator here uses):

- The DISTRIBUTED part is moment accumulation: one ``mapInPandas``
  pass emits per-Arrow-batch partials (count, per-dim sums, flattened
  d×d gram) — BLAS ``X.T @ X`` per batch, never per-row Python — which
  ``posexplode`` + groupBy reduce to d² + d + 1 cells.  Everything
  shuffled is aggregate-sized: the corpus never moves.
- The DRIVER part is O(d³) on a d×d matrix: covariance assembly and
  ``numpy.linalg.eigh`` — d is embedding width (64 here), so this is
  microseconds and collect traffic is ~4 KB, the same contract as
  k-means' k×d centroid collect (`clustering.py`).
- Projection goes back JVM-side: each component becomes ONE
  ``aggregate(zip_with(...))`` SQL expr string against broadcast
  literal coefficients (the driver-side expression-cost lesson from
  `clustering._sq_dist_sql`) — codegen folds, no Python in the
  projection pass.

Determinism: ``eigh`` of a symmetric matrix yields eigenvectors up to
sign (and basis rotation only for degenerate eigenvalues — not the
case for top components of real embedding spreads); signs are fixed by
making each component's largest-|coordinate| entry positive, and
components are quantized to 6 dp before projection so the JVM fold
sees exact literals.  The moment sums themselves are float64 partials
whose combine order can vary across partitionings — hence the
registered query is rows-only with property tests (variance ordering,
orthonormality, centering) rather than a value oracle; at 6-dp
component quantization re-runs on the same partitioning are stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_fit(
    emb: DataFrame, k: int = 2, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """Fit PCA; returns ``(mean[d], components[k, d])`` with
    components L2-normalized, sign-fixed, 6-dp-quantized, ordered by
    descending eigenvalue."""
    proj = emb.select(F.col(vec_col).cast("array<double>").alias("v"))

    def partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [float(m.shape[0])],
                    "cell": [
                        np.concatenate([m.sum(axis=0), (m.T @ m).ravel()]).tolist()
                    ],
                }
            )

    parts = proj.mapInPandas(partials, "n double, cell array<double>")
    # reduce the per-batch partials DISTRIBUTIVELY: explode to
    # (idx, val) cells and sum — d² + d cells, partial-aggregatable
    cells = (
        parts.select("n", F.posexplode("cell").alias("idx", "val"))
        .groupBy("idx")
        .agg(F.sum("val").alias("s"), F.sum(F.when(F.col("idx") == 0, F.col("n"))).alias("_n"))
    )
    rows = cells.collect()
    if not rows:
        raise ValueError("empty input")
    # solve d from len(rows) = d + d²
    d = int((-1 + (1 + 4 * len(rows)) ** 0.5) / 2)
    n = sum(r["_n"] for r in rows if r["_n"] is not None)
    vals = np.zeros(d + d * d)
    for r in rows:
        vals[r["idx"]] = r["s"]
    s = vals[:d]
    gram = vals[d:].reshape(d, d)
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    comps = evecs[:, ::-1][:, :k].T  # k×d, descending eigenvalue
    # sign fix: largest-|coordinate| entry positive
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, np.round(comps, 6)


def _dot_sql(vec_sql: str, coeffs: list[float]) -> str:
    arr = ", ".join(f"{c!r}D" for c in coeffs)
    return (
        f"aggregate(zip_with({vec_sql}, array({arr}), (a, b) -> a * b), "
        "0D, (acc, x) -> acc + x)"
    )


def pca_project(
    emb: DataFrame,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Project each vector onto the top-k principal components;
    returns (id, *extra, pc1..pck) with projections of the CENTERED
    vectors rounded to 4 dp."""
    mean, comps = pca_fit(emb, k=k, vec_col=vec_col)
    base = emb.select(
        F.col(id_col), *extra_cols, F.col(vec_col).cast("array<double>").alias("_v")
    )
    out_cols = [F.col(id_col), *[F.col(c) for c in extra_cols]]
    for i in range(k):
        offset = float(np.round(np.dot(mean, comps[i]), 6))
        expr = f"round({_dot_sql('_v', comps[i].tolist())} - {offset!r}D, 4)"
        out_cols.append(F.expr(expr).alias(f"pc{i + 1}"))
    return base.select(*out_cols)
