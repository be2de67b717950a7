"""PCA contracts: the algebraic properties that hold regardless of
LAPACK's eigenvector conventions (which is why `pca_project_2d` is
rows-only rather than value-oracled)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from video_metadata_db_spark.operators.decomposition import pca_fit, pca_project
from video_metadata_db_spark.sources.tables import load_table


def test_components_orthonormal_and_sign_fixed(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    _, comps = pca_fit(emb, k=2)
    g = comps @ comps.T
    assert np.allclose(g, np.eye(2), atol=1e-4), g
    for row in comps:
        j = int(np.abs(row).argmax())
        assert row[j] > 0, "sign fix must make the peak coordinate positive"


def test_projection_variance_ordering_and_centering(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = pca_project(emb, k=2).select("pc1", "pc2").collect()
    p1 = np.array([r["pc1"] for r in out])
    p2 = np.array([r["pc2"] for r in out])
    assert p1.var() >= p2.var(), "pc1 must carry the most variance"
    assert abs(p1.mean()) < 1e-2 and abs(p2.mean()) < 1e-2, "centered"


def test_pc1_beats_any_axis_variance(spark, sf_dir):
    """PC1's variance must be ≥ the variance of every RAW axis — the
    defining optimality of the top component (up to quantization)."""
    emb = load_table(spark, sf_dir, "embeddings")
    arr = np.stack(
        [
            np.array(r["embedding"], dtype=np.float64)
            for r in emb.select("embedding").collect()
        ]
    )
    out = pca_project(emb, k=1).select("pc1").collect()
    p1 = np.array([r["pc1"] for r in out])
    assert p1.var() >= arr.var(axis=0).max() * 0.999


def test_projection_stable_across_calls(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = pca_project(emb, k=2).orderBy("vec_id").collect()
    b = pca_project(emb, k=2).orderBy("vec_id").collect()
    assert [(r["pc1"], r["pc2"]) for r in a] == [(r["pc1"], r["pc2"]) for r in b]
