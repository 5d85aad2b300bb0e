"""BM25 scoring formula — the engine's single source of truth.

Replaces T-Torch's LORS edge-length-weighted score
(``base/invertedIndex/EdgeInvertedIndex.java:196-233``: additive per-term
weight with positional band) with the standard BM25 used by the north rule.

    idf(t)       = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_sat(tf,dl)= tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(d, Q)  = sum over t in Q of idf(t) * tf_sat(tf_td, dl_d)

All float64. Global result order is (score DESC, doc_id ASC) — the
reference's heap pop order is ascending (``EdgeInvertedIndex.java:172-176``);
our spec fixes it descending with a deterministic tie-break (SURVEY.md §2.5
T7 note).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import BM25_B, BM25_K1


def idf_expr(df_col: Column, n_docs: Column | float) -> Column:
    n = F.lit(float(n_docs)) if isinstance(n_docs, (int, float)) else n_docs
    return F.log(F.lit(1.0) + (n - df_col + F.lit(0.5)) / (df_col + F.lit(0.5)))


def tf_sat_expr(tf_col: Column, dl_col: Column, avgdl: Column | float,
                k1: float = BM25_K1, b: float = BM25_B) -> Column:
    a = F.lit(float(avgdl)) if isinstance(avgdl, (int, float)) else avgdl
    return (tf_col * F.lit(k1 + 1.0)) / (
        tf_col + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl_col / a)
    )


def idf_np(df: np.ndarray | float, n_docs: float) -> np.ndarray | float:
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_sat_np(tf, dl, avgdl: float, k1: float = BM25_K1, b: float = BM25_B):
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def idf_py(df: float, n_docs: float) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def score_py(tf: float, dl: float, df: float, n_docs: float, avgdl: float,
             k1: float = BM25_K1, b: float = BM25_B) -> float:
    """Scalar reference implementation for tests/oracles."""
    return idf_py(df, n_docs) * tf * (k1 + 1.0) / (
        tf + k1 * (1.0 - b + b * dl / avgdl)
    )
