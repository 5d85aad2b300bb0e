"""Single source of truth for engine constants (rank-identity critical).

BM25 parameters and codec geometry live here so that the build path, the
query path, the brute-force oracle and the tests can never drift apart
(SURVEY.md §7 Stage 1: "pinned in one module").
"""

from __future__ import annotations

from dataclasses import dataclass

# BM25 (Robertson/Sparck-Jones, Lucene-style idf floor-free variant)
BM25_K1: float = 1.2
BM25_B: float = 0.75

# Posting block geometry (reference: JavaFastPFOR blocks of 128+ ints,
# InvertedIndex.java:26-27) — 128 docs per block, per-block max-score.
BLOCK_SIZE: int = 128

# On-disk index layout version: bump whenever the postings/doc_stats/
# manifest schema or codec changes so cached test indexes (ensure_index
# under /tmp) rebuild instead of failing obscurely.
INDEX_FORMAT_VERSION: int = 2

# Term-hash merge buckets (SPIMI merge shuffle width). At 10^12-file scale
# this would be O(10^5); on local[32] keep a multiple of cores.
DEFAULT_BUCKETS: int = 64

# Skew salting: terms with df above this fraction of the corpus are split
# into SALT_FACTOR independent sub-lists during the merge shuffle
# (SURVEY.md §4.3.2 — hot code tokens like ``def``/``{``).
HOT_TERM_DF_FRACTION: float = 0.10
SALT_FACTOR: int = 8

# Default top-k
DEFAULT_K: int = 10


@dataclass(frozen=True)
class BM25Params:
    k1: float = BM25_K1
    b: float = BM25_B


DEFAULT_BM25 = BM25Params()
