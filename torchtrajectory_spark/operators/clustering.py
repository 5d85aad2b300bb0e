"""Clustering operators — the k-paths module re-expressed (SURVEY.md §2.12).

The reference clusters trajectories with a Yinyang-accelerated k-means
(``clustering/trajectory/kpaths/Yinyang.java:302-438`` assignment with
broadcast centers + bounds; ``Process.kPath:528-543`` driver loop) and
extracts per-cluster most-frequent paths from edge histograms
(``ClusterPath.extractNewPathFrequency:262-…``, histogram maintenance
``updateHistorgramGuava:112-146``).

Spark-first shape:

* **assignment** = embarrassingly parallel: centroids broadcast (a k x d
  numpy array inside an Arrow UDF closure), distances vectorized over the
  batch — no shuffle at all.
* **centroid update** = one narrow shuffle: ``posexplode(vec)`` ->
  ``groupBy(cluster, dim).avg`` (partial aggregation map-side); the k x d
  result is collected (tiny) and re-broadcast — the same
  broadcast-iterate-reaggregate loop the reference runs per iteration,
  minus its bound bookkeeping (Catalyst's vectorization makes brute
  distance cheaper than maintaining Yinyang group bounds in Python).
* **single fixed-centroid assignment** is pure Catalyst (zip_with +
  aggregate + array_min on (dist, cid) structs) and oracle-checkable.
* **per-cluster term histograms** (A6/X3 analog) = groupBy + window top-n.

At 10^12 scale: assignment streams per partition, the only shuffle is the
k x d re-aggregation, and skew is impossible by construction (keys are
(cluster, dim) with bounded cardinality).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dist2_expr(vec_col, centroid: list[float]):
    """Squared L2 distance between an array<double> column and a literal
    centroid, evaluated left-to-right (deterministic float64 sum)."""
    clit = F.array(*[F.lit(float(x)) for x in centroid])
    diffs = F.zip_with(vec_col, clit, lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def assign_fixed_centroids(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, dist2_u6) for literal centroids — one codegen'd
    scan, ties broken toward the lowest cluster id via struct ordering."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    pairs = F.array(*[
        F.struct(
            _dist2_expr(v, c).alias("d"),
            F.lit(i).alias("cid"),
        )
        for i, c in enumerate(centroids)
    ])
    best = F.array_min(pairs)
    return emb.select(
        F.col(id_col).alias("vec_id"),
        best["cid"].alias("cluster"),
        F.round(best["d"] * 1e6).cast("bigint").alias("dist2_u6"),
    )


def init_centroids(emb: DataFrame, k: int, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> np.ndarray:
    """Deterministic seeding: the k lowest-id vectors (analog of the
    reference's frequency-seeded ``initializeClustersHighFrequency`` —
    deterministic variant for rank-stable tests)."""
    rows = emb.orderBy(id_col).limit(k).select(vec_col).collect()
    return np.array([r[0] for r in rows], dtype=np.float64)


def _assign_np(emb: DataFrame, cents: np.ndarray, id_col: str,
               vec_col: str) -> DataFrame:
    """Arrow-UDF assignment against broadcast centroids (no shuffle)."""
    c = cents.copy()

    @F.pandas_udf(T.IntegerType())
    def nearest(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy())  # (n, d) float32 -> float64
        d = ((x[:, None, :].astype(np.float64) - c[None, :, :]) ** 2).sum(-1)
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return emb.select(
        F.col(id_col).alias("vec_id"),
        nearest(F.col(vec_col)).alias("cluster"),
    )


def kmeans(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """Lloyd's k-means over an embedding column.

    Returns (assignments(vec_id, cluster), centroids k x d). Empty clusters
    keep their previous centroid (deterministic).
    """
    cents = init_centroids(emb, k, id_col, vec_col)
    assigned = _assign_np(emb, cents, id_col, vec_col)
    vecs = emb.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("_vec"))
    for _ in range(n_iter):
        exploded = (
            assigned.join(vecs, "vec_id")
            .select("cluster", F.posexplode("_vec").alias("dim", "x"))
        )
        rows = (
            exploded.groupBy("cluster", "dim")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        new = cents.copy()
        for r in rows:
            new[r["cluster"], r["dim"]] = r["m"]
        cents = new
        assigned = _assign_np(emb, cents, id_col, vec_col)
    return assigned, cents


def cluster_metrics(emb: DataFrame, assigned: DataFrame,
                    cents: np.ndarray, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """(cluster, n, sum_dist2_u6) — the per-cluster sum-of-distances
    objective (``ClusterPath.getSumDistance:148-160`` A7 analog)."""
    c = cents.copy()

    @F.pandas_udf(T.DoubleType())
    def dist_to(v: pd.Series, cl: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype(np.float64)
        cc = c[cl.to_numpy()]
        return pd.Series(((x - cc) ** 2).sum(-1))

    vecs = emb.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("_vec"))
    joined = assigned.join(vecs, "vec_id").select(
        "cluster", dist_to(F.col("_vec"), F.col("cluster")).alias("d2")
    )
    return joined.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("d2") * 1e6).cast("bigint").alias("sum_dist2_u6"),
    )


def top_terms_per_group(docs: DataFrame, groups: DataFrame, n: int = 5,
                        doc_id_col: str = "doc_id",
                        group_doc_col: str = "vec_id",
                        group_col: str = "label",
                        text_col: str = "text",
                        analyzer: str = "ws") -> DataFrame:
    """Per-group top-n terms by frequency — the most-frequent-path
    extraction analog (X3: ``groupBy(cluster, term).count()`` + rank).

    Deterministic rank: (count DESC, term ASC). Returns
    (grp, term, cnt, rank).
    """
    from pyspark.sql.window import Window

    from .stats import tokenized

    tok = tokenized(docs, doc_id_col, text_col, analyzer)
    joined = tok.join(
        groups.select(F.col(group_doc_col).alias("doc_id"),
                      F.col(group_col).alias("grp")),
        "doc_id",
    )
    counts = (
        joined.select("grp", F.explode("tokens").alias("term"))
        .groupBy("grp", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("grp").orderBy(F.col("cnt").desc(),
                                          F.col("term").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
        .select("grp", "term", "cnt", "rank")
    )
