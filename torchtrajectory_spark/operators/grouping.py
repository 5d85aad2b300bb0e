"""Result grouping / field collapsing: top-k GROUPS for a BM25 query.

The Lucene grouping-module / Elasticsearch ``collapse`` analog (the
reference engine has no grouping surface; the public analog is Lucene's
two-pass ``FirstPassGroupingCollector``): rank GROUP VALUES of a
doc-store metadata column by their best-scoring matching document, and
return each of the k best groups represented by that document. A search
UI uses this for result diversity — "best hit per repository".

Semantics are EXACT, not a post-filter over a retrieved top-N: every
live document matching any query term is scored with index-wide BM25
statistics (same formula/tie-breaks as ``topk_bm25_index``), each
group's best document is (score DESC, doc_id ASC), and groups order by
(best score DESC, value ASC). Documents with a NULL group value form no
group and are excluded (Lucene's ``allGroups=false`` convention).

Scale shape: the scoring and the per-group argmax both happen INSIDE one
per-segment cogroup of the bucket+term-pruned postings blocks with the
segment's doc-store rows (both sides segment-partitioned) — the only
shuffled rows are per-(segment, group) best triples, group-cardinality x
segments sized, never corpus-sized. Exactness forgoes WAND's theta
pruning (a doc outside the global top-k can still be its group's best),
so the cost class is the boolean-OR scan: bounded by the query terms'
posting sizes, not the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import BM25_B, BM25_K1, DEFAULT_K
from .index import read_doc_stats, tombstone_ids
from .wand import IndexMeta, _q_blocks, _segment_scores_all, query_term_meta


def collapse_topk(
    spark: SparkSession,
    index_dir: str,
    query_terms: list[str],
    group_col: str,
    k: int = DEFAULT_K,
    buckets: int | None = None,
    k1: float = BM25_K1,
    b: float = BM25_B,
    scalars: tuple[float, float] | None = None,
    meta: IndexMeta | None = None,
) -> DataFrame:
    """Top-k groups by best BM25 hit. Returns (value, doc_id, score):
    the group value (cast to string), its best-scoring matching doc, and
    that doc's score; ordered (score DESC, value ASC), limit k."""
    q = sorted(set(str(t) for t in query_terms))
    if meta is None:
        meta = query_term_meta(spark, index_dir, q, buckets, scalars)
    blocks = _q_blocks(spark, index_dir, q, buckets).select(
        "segment", "term", "n_docs", "max_tf", "min_dl",
        "doc_gaps", "tfs", "dls",
    )
    stats = read_doc_stats(spark, index_dir).select(
        "segment", "doc_id",
        F.col(group_col).cast("string").alias("value"),
    )
    dead = tombstone_ids(index_dir)
    empty = pd.DataFrame({"value": pd.Series(dtype="object"),
                          "doc_id": pd.Series(dtype="int64"),
                          "score": pd.Series(dtype="float64")})

    def run(blk: pd.DataFrame, st: pd.DataFrame) -> pd.DataFrame:
        if not len(blk) or not len(st):
            return empty
        scored = _segment_scores_all(blk.drop(columns=["segment"]), q,
                                     meta, k1, b, blocked=dead)
        if not len(scored):
            return empty
        hit = scored.merge(st[["doc_id", "value"]], on="doc_id",
                           how="inner")
        hit = hit[hit["value"].notna()]
        if not len(hit):
            return empty
        # per-group argmax (score DESC, doc_id ASC) — numpy lexsort so
        # the tie-break is explicit, then first row per value
        order = np.lexsort((hit["doc_id"].to_numpy(),
                            -hit["score"].to_numpy()))
        hit = hit.iloc[order]
        best = hit.drop_duplicates("value", keep="first")
        return best[["value", "doc_id", "score"]]

    per_seg = blocks.groupBy("segment").cogroup(
        stats.groupBy("segment")
    ).applyInPandas(run, schema="value string, doc_id bigint, score double")
    # cross-segment combine: lexicographic struct max == argmax by
    # (score DESC, doc_id ASC); a doc's score is complete within its
    # one segment, so the combine is pure selection, no float re-adds
    best = per_seg.groupBy("value").agg(
        F.max(F.struct(
            F.col("score").alias("s"),
            (-F.col("doc_id")).alias("nd"),
            F.col("doc_id").alias("d"),
        )).alias("best")
    )
    return (
        best.select(
            "value",
            F.col("best.d").alias("doc_id"),
            F.col("best.s").alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("value").asc())
        .limit(int(k))
    )
