"""Similarity search over embedding columns (array<float>).

- `brute_force_topk`: exact cosine top-k against a query vector. The
  per-row score is a JVM expression; top-k is a TakeOrderedAndProject
  (no full sort materialization) — the exactness baseline.
- `ivf_topk`: IVF-style approximate search: k-means-free variant using
  deterministically sampled centroid rows; vectors are assigned to their
  nearest centroid at index-build time (one shuffle), queries probe only
  the closest `nprobe` cells. At 100 TB the probe prunes the scan to
  nprobe/ncells of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_tfdata_spark.functions.vectors import cosine_similarity


def _qvec(query: list[float]):
    return F.array(*[F.lit(float(x)) for x in query])


def brute_force_topk(
    df: DataFrame, vec_col: str, query: list[float], k: int = 10, id_col: str = "vec_id"
) -> DataFrame:
    """Exact top-k by cosine; deterministic tie-break on id."""
    scored = df.select(
        F.col(id_col),
        cosine_similarity(F.col(vec_col), _qvec(query)).alias("cos"),
    )
    return scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


class IVFIndex:
    """Inverted-file index: centroids are the `ncells` rows with the
    smallest md5(id) — a deterministic uniform sample that assumes NOTHING
    about the id space (dense, sparse, or hashed ids all yield exactly
    min(ncells, n) centroids) and costs one TakeOrderedAndProject job, no
    count(). Rows are assigned to their nearest centroid."""

    def __init__(self, df: DataFrame, vec_col: str, id_col: str, ncells: int = 16):
        self.vec_col, self.id_col, self.ncells = vec_col, id_col, ncells
        cents = (
            df.select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cvec"))
            .orderBy(F.md5(F.col("cell").cast("string")), F.col("cell"))
            .limit(ncells)
        )
        self.centroids = [(r["cell"], list(r["cvec"])) for r in cents.collect()]
        cell = self._nearest_cell_expr(F.col(vec_col))
        self.assigned = df.withColumn("_cell", cell)

    def _nearest_cell_expr(self, vc):
        best = None
        for cid, cvec in self.centroids:
            s = F.struct(
                cosine_similarity(vc, _qvec(cvec)).alias("cos"),
                F.lit(cid).alias("cell"),
            )
            best = s if best is None else F.greatest(best, s)
        return best["cell"]

    def topk(self, query: list[float], k: int = 10, nprobe: int = 4) -> DataFrame:
        import numpy as np

        q = np.array(query)
        def cos(v):
            v = np.array(v)
            return float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v) + 1e-12))

        probed = [c for c, _ in sorted(self.centroids, key=lambda cv: -cos(cv[1]))[:nprobe]]
        cand = self.assigned.filter(F.col("_cell").isin(probed))
        return brute_force_topk(cand, self.vec_col, query, k, self.id_col)
