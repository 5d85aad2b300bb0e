"""Multi-field boosted search: one inverted index PER FIELD, scores sum.

The Lucene ``MultiFieldQueryParser`` analog. Lucene indexes each field
as its own inverted index with its own statistics (df, doc length,
average length are all per-field), and a multi-field query is the
disjunction of per-field term queries:

    score(doc) = sum over fields f of  boost_f * BM25_f(query, doc)

This module re-expresses that exactly: each field is a full index built
by ``build_index`` over that column (so every single-field surface —
maintenance, MultiTermQuery, statistics — works per field unchanged),
and the fielded query unions the per-field exact match scores and sums.

Semantics are EXACT, not a fusion heuristic (contrast ``fusion.py``'s
rank-based RRF): a doc ranked outside one field's top-k can still win
the combined ranking, so each field contributes its full match-set
scores — the boolean-OR cost class per field, bounded by the query
terms' posting sizes in that field, never the corpus. The combine is
ONE shuffle on doc_id of posting-sized inputs, then a bounded top-k
merge (TakeOrderedAndProject).

Block-max WAND across fields (Lucene's BlockMaxMaxscore over a
disjunction) would need cross-index bound coordination per doc; at this
engine's segment layout that is a two-phase bound-then-verify plan —
documented future work, the exact scan is the correctness baseline.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import BM25_B, BM25_K1, DEFAULT_K


def topk_bm25_fielded(
    spark: SparkSession,
    fields: dict[str, tuple[str, float]],
    query_terms: list[str],
    k: int = DEFAULT_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k by boosted multi-field BM25. ``fields`` maps a field name
    to (index_dir, boost); every query term queries every field with
    that field's own statistics. Returns (doc_id, score)."""
    from .wand import scores_bm25_index_all

    if not fields:
        raise ValueError("topk_bm25_fielded: no fields")
    parts = [
        (scores_bm25_index_all(spark, idx, query_terms, k1=k1, b=b),
         boost)
        for _name, (idx, boost) in sorted(fields.items())
    ]
    return combine_fielded(parts, k)


def combine_fielded(parts: list[tuple[DataFrame, float]],
                    k: int) -> DataFrame:
    """Boosted-sum combine of per-field (doc_id, score) match sets: one
    shuffle on doc_id of posting-sized inputs, then the bounded top-k
    merge (score DESC, doc_id ASC)."""
    boosted = [
        df.select("doc_id", (F.col("score") * float(w)).alias("score"))
        for df, w in parts
    ]
    u = reduce(DataFrame.unionAll, boosted)
    return (
        u.groupBy("doc_id").agg(F.sum("score").alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(int(k))
    )
