"""Reciprocal Rank Fusion — hybrid lexical + vector retrieval.

RRF (Cormack, Clarke & Buettcher, SIGIR 2009) is the standard fusion
for hybrid search (Lucene/OpenSearch/Vespa default):

    fused(d) = sum over result lists r of  1 / (c + rank_r(d))

with c = 60 canonically. It needs no score calibration between the
lists — only ranks — which is why it composes a BM25 top-N and an
embedding-cosine top-N without normalizing either.

Scale shape: fusion inputs are ALREADY-RETRIEVED top-N result sets
(bounded, k-sized); the corpus-scale work lives in the underlying
retrievals (the pruned WAND scan, the IVF probe). The single-partition
rank windows below are therefore over <=N rows by contract — the same
bounded-driver-state footing as every other resolved-result composition.

Determinism: ranks are assigned over the u6-quantized scores with
doc_id ASC tie-break on BOTH engines (ranking raw floats would let a
sub-1e-6 score difference produce engine-dependent ranks), and the
fused sum is at most one double addition per list pair — bit-stable
across engines.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_C = 60


def rrf_fuse(rankings: list[tuple[DataFrame, str]], k: int,
             c: int = RRF_C, id_col: str = "doc_id") -> DataFrame:
    """Fuse bounded top-N result lists into (id, rrf_u6) top-k.

    ``rankings``: (df, score_col) pairs — each df a top-N result set
    whose rank order is (score_col DESC, id_col ASC). Items missing from
    a list contribute nothing for it (standard RRF).
    """
    if not rankings:
        raise ValueError("rrf_fuse: no rankings given")
    parts = []
    for df, score_col in rankings:
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        parts.append(df.select(
            F.col(id_col).alias("_id"),
            (F.lit(1.0) / (F.lit(int(c)) + F.row_number().over(w)))
            .alias("_w"),
        ))
    u = reduce(DataFrame.unionByName, parts)
    return (
        u.groupBy("_id").agg(F.sum("_w").alias("_rrf"))
        .orderBy(F.col("_rrf").desc(), F.col("_id").asc())
        .limit(int(k))
        .select(F.col("_id").alias(id_col),
                F.round(F.col("_rrf") * 1e6).cast("bigint").alias("rrf_u6"))
    )
