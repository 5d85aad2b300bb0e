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


def _bool_index_blocks(spark, index_dir: str, query_terms: list[str],
                       mode: str, buckets: int | None = None) -> DataFrame:
    """Segment-local boolean retrieval straight from compressed blocks.

    One ``applyInPandas`` group per segment decodes ONLY the query terms'
    docID streams (bucket+term predicates pushed to the parquet scan —
    same pruning as the WAND path) and computes the union / intersection
    with numpy set ops. Segments are doc-disjoint, so per-segment results
    concatenate with no global distinct — the flat-rows formulation paid
    a decode-explode stage plus a corpus-keyed shuffle for the same
    answer. Salted sub-lists of a hot term union naturally (np.unique).
    """
    import numpy as np
    import pandas as pd

    from ..functions import codec
    from .index import sorted_isin, tombstone_ids
    from .wand import _q_blocks

    q = sorted({str(t) for t in query_terms})
    nq = len(q)
    blocks = _q_blocks(spark, index_dir, q, buckets).select(
        "segment", "term", "doc_gaps"
    )
    dead = tombstone_ids(index_dir)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        per_term = []
        for _term, grp in pdf.groupby("term"):
            arrs = [codec.decode_sorted(g) for g in grp["doc_gaps"]]
            per_term.append(np.unique(np.concatenate(arrs)))
        if not per_term:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
        if mode == "or":
            out = np.unique(np.concatenate(per_term))
        else:
            if len(per_term) < nq:
                return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
            per_term.sort(key=len)
            out = per_term[0]
            for arr in per_term[1:]:
                out = np.intersect1d(out, arr, assume_unique=True)
                if out.size == 0:
                    break
        if dead is not None and out.size:
            out = out[~sorted_isin(dead, out)]  # tombstone mask
        return pd.DataFrame({"doc_id": out})

    return blocks.groupBy("segment").applyInPandas(
        run, schema="doc_id bigint"
    )


def bool_or_index_blocks(spark, index_dir: str, query_terms: list[str],
                         buckets: int | None = None) -> DataFrame:
    """OR (J2) from the compressed index — see ``_bool_index_blocks``."""
    return _bool_index_blocks(spark, index_dir, query_terms, "or", buckets)


def bool_and_index_blocks(spark, index_dir: str, query_terms: list[str],
                          buckets: int | None = None) -> DataFrame:
    """AND (J3) from the compressed index — see ``_bool_index_blocks``."""
    return _bool_index_blocks(spark, index_dir, query_terms, "and", buckets)
