"""Boolean retrieval: OR (path query) and AND (strict path query).

Reference semantics:
* OR  — trajectories sharing >=1 edge with the query path,
  ``base/invertedIndex/EdgeInvertedIndex.findByPath:52-62`` (J2).
* AND — trajectories containing *all* query edges (relational division),
  ``EdgeInvertedIndex.findByStrictPath:65-89`` (J3). The reference counts
  duplicate query edges (a doc matching one repeated edge can pass) — we use
  distinct query terms, the documented divergence (SURVEY.md §2.3 J3 note).

Two physical strategies:
* corpus-direct: ``arrays_overlap`` / conjunctive ``array_contains`` on the
  tokenized corpus — single scan, zero shuffles, fully codegen'd.
* index-backed: semi-join against the postings table (see ``index.py``) —
  the 10^12-file path, where only matching term buckets are read.
Both return identical (doc_id) sets; tests assert it.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .stats import tokenized


def bool_or(df: DataFrame, query_terms: list[str], id_col: str = "doc_id",
            text_col: str = "text", analyzer: str = "ws") -> DataFrame:
    """Docs containing >= 1 query term. Single scan, no shuffle, no join."""
    tok = tokenized(df, id_col, text_col, analyzer)
    q = F.array(*[F.lit(str(t)) for t in query_terms])
    return tok.where(F.arrays_overlap("tokens", q)).select("doc_id")


def bool_and(df: DataFrame, query_terms: list[str], id_col: str = "doc_id",
             text_col: str = "text", analyzer: str = "ws") -> DataFrame:
    """Docs containing *all* distinct query terms (relational division)."""
    tok = tokenized(df, id_col, text_col, analyzer)
    terms = sorted({str(t) for t in query_terms})
    cond = reduce(
        lambda a, b: a & b,
        [F.array_contains("tokens", t) for t in terms],
    )
    return tok.where(cond).select("doc_id")


def bool_or_index(postings_flat: DataFrame, query_terms: list[str]) -> DataFrame:
    """OR over a flat postings DF (term, doc_id, ...): semi-join + distinct.

    Mirrors J2: ``postings.join(broadcast(qterms), "term").distinct()``.
    """
    q = [str(t) for t in query_terms]
    return (
        postings_flat.where(F.col("term").isin(q))
        .select("doc_id")
        .distinct()
    )


def bool_and_index(postings_flat: DataFrame, query_terms: list[str]) -> DataFrame:
    """AND via count-matching (relational division), mirrors J3."""
    terms = sorted({str(t) for t in query_terms})
    return (
        postings_flat.where(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("n_match"))
        .where(F.col("n_match") == F.lit(len(terms)))
        .select("doc_id")
    )
