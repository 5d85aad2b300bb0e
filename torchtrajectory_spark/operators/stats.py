"""Corpus statistics: tokenized view, doc_stats, terms dictionary.

Analog of T-Torch's histogram/statistics pass
(``clustering/trajectory/kpaths/Process.createTrajectoryHistogram:268-281``
term-frequency histograms; edge lengths as term weights
``base/invertedIndex/EdgeInvertedIndex.java:121``) — in BM25 terms: df, idf,
document length norms. Everything here is pure DataFrame algebra: partial
(map-side) aggregation, pushdown and codegen come from Catalyst for free
(SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.bm25 import idf_expr
from ..functions.tokenizer import tokens_col


def tokenized(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
              analyzer: str = "ws") -> DataFrame:
    """(doc_id, tokens ARRAY<STRING>) view of a corpus."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col), analyzer).alias("tokens"),
    )


def doc_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
              analyzer: str = "ws", meta_cols: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, dl, content_sha256, *meta) — dl = token count.

    content_sha256 is the per-row invariant (BASELINE.json input_hint):
    computed at ingest, re-derivable from the doc store, compared in tests.
    """
    cols = [
        F.col(id_col).alias("doc_id"),
        F.size(tokens_col(F.col(text_col), analyzer)).cast("bigint").alias("dl"),
        F.sha2(F.col(text_col), 256).alias("content_sha256"),
    ]
    cols += [F.col(c) for c in meta_cols]
    return df.select(*cols)


def term_freqs(tok: DataFrame) -> DataFrame:
    """(doc_id, term, tf) — per-document term frequencies.

    Note the reference keeps only the *last* position per (term, doc)
    (``EdgeInvertedIndex.index:41-49``, implicit tf=1); BM25 needs true tf
    (SURVEY.md §7 risk 3) — the north rule's scorer defines truth here.
    """
    return (
        tok.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )


def corpus_scalars(tok: DataFrame) -> DataFrame:
    """One-row (n_docs, avgdl) — cross-joined (broadcast) into scoring plans."""
    return tok.select(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size("tokens").cast("double")).alias("avgdl"),
    )


def term_dict(tfreqs: DataFrame, n_docs_df: DataFrame) -> DataFrame:
    """terms(term, df, idf) dictionary — the precomputed-weights table
    (analog of the precomputed shortest-path cache, SURVEY.md §4.1)."""
    df_tbl = tfreqs.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    return df_tbl.crossJoin(F.broadcast(n_docs_df.select("n_docs"))).select(
        "term", "df", idf_expr(F.col("df"), F.col("n_docs")).alias("idf")
    )
