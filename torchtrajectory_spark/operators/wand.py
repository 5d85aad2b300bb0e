"""Index-backed top-k BM25: block-max pruned, UB-ordered, early-terminating.

Distributed re-expression of T-Torch's flagship top-k scan
(``base/invertedIndex/EdgeInvertedIndex.findTopK:102-177``):

reference (single JVM)                      -> this engine (Spark)
--------------------------------------------------------------------------
posting probe per query edge  (J1)          -> parquet scan filtered to
                                               query terms + their crc32
                                               buckets (partition pruning)
UB(doc) = sum of matched term weights (A2)  -> per-segment numpy UB
                                               accumulation from block-max
                                               metadata (idf * tf_sat(max_tf,
                                               min_dl))
max-heap by UB, scan desc     (T2)          -> np.argsort UB desc, chunked
bounded top-k min-heap        (T3)          -> running k-th best per chunk
theta early termination       (T4)          -> stop when bestKth >= next
                                               chunk's max UB
restDistance DP abandon       (T5)          -> block-max bound IS the
                                               remaining-score bound
heap pop                      (T7)          -> per-segment top-k ->
                                               TakeOrderedAndProject merge,
                                               (score DESC, doc_id ASC)

The index is doc-sharded into segments; each segment task runs the whole
pruned scan locally over numpy arrays (one ``applyInPandas`` group per
segment), then Spark merges the tiny per-segment top-k lists. At 10^12-file
scale parallelism = number of segments; no stage ever materializes more
than the query terms' postings for one segment.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import BM25_B, BM25_K1, DEFAULT_K
from ..functions import codec
from ..functions.bm25 import idf_py, tf_sat_np
from .index import bucket_of, read_doc_stats, read_index_config, read_postings


@dataclass(frozen=True)
class IndexMeta:
    """Global scalars + per-term df, computed once per opened index."""
    n_docs: float
    avgdl: float
    term_df: dict  # term -> df (float)


def _corpus_scalars(spark: SparkSession, index_dir: str) -> tuple[float, float]:
    """(n_docs, avgdl) straight from the manifest rows — no data scan."""
    from .index import read_manifest

    m = read_manifest(spark, index_dir)
    if "sum_dl" in m.columns:
        row = m.agg(F.sum("row_count").alias("n"),
                    F.sum("sum_dl").alias("sdl")).first()
        n = float(row["n"] or 0)
        return n, (float(row["sdl"] or 0) / n if n else 0.0)
    # legacy index without sum_dl: fall back to a doc_stats scan
    ds = read_doc_stats(spark, index_dir)
    row = ds.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).first()
    return float(row["n"]), float(row["avgdl"] or 0.0)


def open_index_meta(spark: SparkSession, index_dir: str) -> IndexMeta:
    """Full-dictionary meta: manifest scalars + the precomputed terms
    table (df from block metadata at build time — no payload decode)."""
    from .index import read_terms

    n_docs, avgdl = _corpus_scalars(spark, index_dir)
    dfs = (
        read_terms(spark, index_dir)
        .groupBy("term").agg(F.sum("df").alias("df"))
        .collect()
    )
    return IndexMeta(
        n_docs=n_docs,
        avgdl=avgdl,
        term_df={r["term"]: float(r["df"]) for r in dfs},
    )


def query_term_meta(spark: SparkSession, index_dir: str,
                    query_terms: list[str],
                    buckets: int | None = None) -> IndexMeta:
    """Per-query variant: df only for the query terms, from the terms
    dictionary with the bucket predicate pushed into the scan."""
    from .index import read_index_config, read_terms

    n_docs, avgdl = _corpus_scalars(spark, index_dir)
    q = sorted(set(query_terms))
    if buckets is None:
        buckets = int(read_index_config(index_dir)["buckets"])
    bks = sorted({bucket_of(t, buckets) for t in q})
    dfs = (
        read_terms(spark, index_dir)
        .where(F.col("bucket").isin(bks))
        .where(F.col("term").isin(q))
        .groupBy("term").agg(F.sum("df").alias("df"))
        .collect()
    )
    return IndexMeta(n_docs, avgdl,
                     {r["term"]: float(r["df"]) for r in dfs})


def _q_blocks(spark: SparkSession, index_dir: str, q: list[str],
              buckets: int | None = None) -> DataFrame:
    """Query terms' blocks with bucket predicate for partition pruning."""
    if buckets is None:
        buckets = int(read_index_config(index_dir)["buckets"])
    bks = sorted({bucket_of(t, buckets) for t in q})
    return (
        read_postings(spark, index_dir)
        .where(F.col("bucket").isin(bks))
        .where(F.col("term").isin(q))
    )


def _segment_topk(pdf: pd.DataFrame, q: list[str], k: int, meta: IndexMeta,
                  k1: float, b: float) -> pd.DataFrame:
    """Exact top-k for one segment: UB-ordered chunked scan, early stop."""
    idf = {t: idf_py(meta.term_df.get(t, 0.0), meta.n_docs) for t in q}
    # decode per-term postings (salted sub-lists concat + sort by doc)
    all_docs: list[np.ndarray] = []
    all_ubs: list[np.ndarray] = []
    term_arrays = {}
    for term, grp in pdf.groupby("term", sort=True):
        docs = np.concatenate([codec.decode_sorted(g) for g in grp["doc_gaps"]])
        tfs = np.concatenate([codec.decode_u32s(g) for g in grp["tfs"]])
        dls = np.concatenate([codec.decode_u32s(g) for g in grp["dls"]])
        order = np.argsort(docs, kind="mergesort")
        docs, tfs, dls = docs[order], tfs[order], dls[order]
        term_arrays[term] = (docs, tfs, dls)
        # per-block UB expanded to members (block-max metadata bound)
        blk_ub = idf[term] * tf_sat_np(
            grp["max_tf"].to_numpy(dtype=np.float64),
            grp["min_dl"].to_numpy(dtype=np.float64),
            meta.avgdl, k1, b,
        )
        member_ub = np.repeat(blk_ub, grp["n_docs"].to_numpy())[order]
        all_docs.append(docs)
        all_ubs.append(member_ub)
    if not all_docs:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})

    cand = np.concatenate(all_docs)
    ubs = np.concatenate(all_ubs)
    # UB(doc) = sum of per-term block-max bounds (reference A2)
    uniq, inv = np.unique(cand, return_inverse=True)
    ub_sum = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(ub_sum, inv, ubs)

    # scan candidates in UB-descending order, chunked; stop when the
    # running k-th best beats the next chunk's best possible UB (T4)
    order = np.argsort(-ub_sum, kind="mergesort")
    sorted_docs = uniq[order]
    sorted_ubs = ub_sum[order]

    topk_scores = np.empty(0, dtype=np.float64)
    topk_docs = np.empty(0, dtype=np.int64)
    best_kth = -math.inf
    chunk = max(k * 4, 1024)
    for s in range(0, sorted_docs.size, chunk):
        # strict > so an exact UB tie (which could still tie on score and
        # win the doc_id tie-break) is never pruned — rank-identity
        if best_kth > sorted_ubs[s] and topk_docs.size >= k:
            break  # theta-pruning: no remaining candidate can enter top-k
        dchunk = sorted_docs[s:s + chunk]
        scores = np.zeros(dchunk.size, dtype=np.float64)
        for term in sorted(term_arrays):
            docs, tfs, dls = term_arrays[term]
            pos = np.searchsorted(docs, dchunk)
            pos_c = np.clip(pos, 0, docs.size - 1)
            hit = docs[pos_c] == dchunk
            contrib = idf[term] * tf_sat_np(
                tfs[pos_c].astype(np.float64),
                dls[pos_c].astype(np.float64),
                meta.avgdl, k1, b,
            )
            scores += np.where(hit, contrib, 0.0)
        topk_docs = np.concatenate([topk_docs, dchunk])
        topk_scores = np.concatenate([topk_scores, scores])
        # keep only current top-k (score DESC, doc ASC)
        sel = np.lexsort((topk_docs, -topk_scores))[:k]
        topk_docs, topk_scores = topk_docs[sel], topk_scores[sel]
        if topk_docs.size >= k:
            best_kth = topk_scores[-1]
    return pd.DataFrame({"doc_id": topk_docs, "score": topk_scores})


def topk_bm25_index(
    spark: SparkSession,
    index_dir: str,
    query_terms: list[str],
    k: int = DEFAULT_K,
    meta: IndexMeta | None = None,
    buckets: int | None = None,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k BM25 from the compressed index. Returns (doc_id, score)."""
    q = sorted(set(str(t) for t in query_terms))
    if meta is None:
        meta = query_term_meta(spark, index_dir, q, buckets)
    # column-prune before the Arrow transfer: the scorer needs only the
    # block payloads + bound metadata, not salt/block_id/first/last/bucket
    # (ReadSchema shrinks accordingly — checked in EXPLAIN.md)
    blocks = _q_blocks(spark, index_dir, q, buckets).select(
        "segment", "term", "n_docs", "max_tf", "min_dl",
        "doc_gaps", "tfs", "dls",
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return _segment_topk(
            pdf.drop(columns=["segment"]), q, k, meta, k1, b
        )

    per_seg = blocks.groupBy("segment").applyInPandas(
        lambda key_pdf: run(key_pdf),
        schema="doc_id bigint, score double",
    )
    return (
        per_seg.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def topk_bm25_index_filtered(
    spark: SparkSession,
    index_dir: str,
    query_terms: list[str],
    k: int,
    predicate,
    buckets: int | None = None,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Index-backed top-k with a metadata predicate on the candidates.

    F2-in-the-loop semantics (``EdgeInvertedIndex.java:155``): scores use
    index-wide statistics; ``predicate`` (a Column over doc_stats' metadata
    columns, e.g. ``F.col("lang").isin("en")``) restricts heap membership
    via a semi-join *before* the global top-k, so pruning happens ahead of
    the ``TakeOrderedAndProject`` merge. Pure DataFrame algebra over the
    decoded query-term postings — the decode touches only the query terms'
    partition-pruned buckets.
    """
    from .index import postings_flat as _flat
    from .index import read_doc_stats

    q = sorted(set(str(t) for t in query_terms))
    meta = query_term_meta(spark, index_dir, q, buckets)
    idf = {t: idf_py(meta.term_df.get(t, 0.0), meta.n_docs) for t in q}

    ds = read_doc_stats(spark, index_dir)
    allowed = ds.where(predicate).select("doc_id")

    # terms pruned BELOW the decode UDF (pushed into the parquet scan)
    flat = _flat(spark, index_dir, terms=q, buckets=buckets)
    idf_map = F.create_map(
        *[x for t in q for x in (F.lit(t), F.lit(idf[t]))]
    )
    contrib = flat.select(
        "doc_id",
        (
            idf_map[F.col("term")]
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.lit(meta.avgdl))
            )
        ).alias("contrib"),
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"))
        .join(allowed, "doc_id", "left_semi")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
