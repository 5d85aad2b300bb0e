"""Sequence-similarity kernels — parity family for T-Torch's measure suite.

The reference scores trajectories against a query with DP kernels over
point sequences (``queryEngine/similarity/SimilarityFunction.java``: LCSS
:61-95, ERP :97-136, EDR :138-169, DTW :204-225, Hausdorff :227-272,
discrete Fréchet :274-300, lockstep Euclidean :50-58) dispatched from
``LEVI.findTopK`` (``base/spatialIndex/LEVI.java:95-112``).

Full-text re-expression: a document is a sequence of scalar token values
``v_i = (crc32(token_i) % 1000) / 1000`` (the positional/value structure of
a trajectory), distance = |x - y|, epsilon-match for LCSS/EDR mirrors the
reference's 50 m epsilon (``LEVI.java:30``). Kernels run inside
``mapInPandas`` (Arrow batches, numpy DP vectorized along one axis); the
global top-k is Spark's TakeOrderedAndProject.

These are NOT SQL-expressible (iterative DP) — driver records a rows-only
check; exactness is asserted in tests against pure-Python references.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizer import tokenize_py

EPS = 0.05        # epsilon-match for LCSS/EDR (analog of LEVI.java:30)
ERP_GAP = 0.0     # ERP gap value g (analog SimilarityFunction.java:97-136)
MEASURES = ("dtw", "lcss", "edr", "erp", "euclid", "hausdorff", "frechet")
# higher-is-better measures (rest are distances: lower is better)
_SIM_MEASURES = {"lcss"}


def seq_of(text: str, analyzer: str = "ws") -> np.ndarray:
    toks = tokenize_py(text or "", analyzer)
    if not toks:
        return np.zeros(1, dtype=np.float64)
    return np.array(
        [(zlib.crc32(t.encode()) % 1000) / 1000.0 for t in toks],
        dtype=np.float64,
    )


# ----------------------- numpy DP kernels (vectorized rows) ---------------

def dtw(a: np.ndarray, b: np.ndarray) -> float:
    """DTW with |x-y| cost (reference SimilarityFunction.java:204-225)."""
    n, m = len(a), len(b)
    prev = np.full(m + 1, np.inf)
    prev[0] = 0.0
    for i in range(n):
        cost = np.abs(a[i] - b)
        cur = np.empty(m + 1)
        cur[0] = np.inf
        for j in range(1, m + 1):
            best = prev[j]
            if prev[j - 1] < best:
                best = prev[j - 1]
            if cur[j - 1] < best:
                best = cur[j - 1]
            cur[j] = cost[j - 1] + best
        prev = cur
    return float(prev[m])


def lcss(a: np.ndarray, b: np.ndarray, eps: float = EPS,
         theta: int | None = None) -> float:
    """LCSS similarity (match count), positional band theta (LEVI theta=10
    analog; None = unbounded)."""
    n, m = len(a), len(b)
    prev = np.zeros(m + 1, dtype=np.int64)
    for i in range(n):
        cur = np.zeros(m + 1, dtype=np.int64)
        match = np.abs(a[i] - b) <= eps
        if theta is not None:
            jidx = np.arange(m)
            match = match & (np.abs(jidx - i) <= theta)
        for j in range(1, m + 1):
            if match[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = max(prev[j], cur[j - 1])
        prev = cur
    return float(prev[m])


def edr(a: np.ndarray, b: np.ndarray, eps: float = EPS) -> float:
    n, m = len(a), len(b)
    prev = np.arange(m + 1, dtype=np.int64)
    for i in range(n):
        cur = np.empty(m + 1, dtype=np.int64)
        cur[0] = i + 1
        subcost = (np.abs(a[i] - b) > eps).astype(np.int64)
        for j in range(1, m + 1):
            cur[j] = min(prev[j - 1] + subcost[j - 1], prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return float(prev[m])


def erp(a: np.ndarray, b: np.ndarray, g: float = ERP_GAP) -> float:
    n, m = len(a), len(b)
    prev = np.cumsum(np.concatenate(([0.0], np.abs(b - g))))
    for i in range(n):
        cur = np.empty(m + 1)
        cur[0] = prev[0] + abs(a[i] - g)
        for j in range(1, m + 1):
            cur[j] = min(
                prev[j - 1] + abs(a[i] - b[j - 1]),
                prev[j] + abs(a[i] - g),
                cur[j - 1] + abs(b[j - 1] - g),
            )
        prev = cur
    return float(prev[m])


def euclid(a: np.ndarray, b: np.ndarray) -> float:
    """Lockstep Euclidean over the common prefix (reference :50-58 requires
    equal length; we truncate to min length, documented divergence)."""
    n = min(len(a), len(b))
    if n == 0:
        return 0.0
    return float(np.sqrt(np.sum((a[:n] - b[:n]) ** 2)))


def hausdorff(a: np.ndarray, b: np.ndarray) -> float:
    d = np.abs(a[:, None] - b[None, :])
    return float(max(d.min(axis=1).max(), d.min(axis=0).max()))


def frechet(a: np.ndarray, b: np.ndarray) -> float:
    n, m = len(a), len(b)
    d = np.abs(a[:, None] - b[None, :])
    dp = np.empty((n, m))
    dp[0, 0] = d[0, 0]
    for j in range(1, m):
        dp[0, j] = max(dp[0, j - 1], d[0, j])
    for i in range(1, n):
        dp[i, 0] = max(dp[i - 1, 0], d[i, 0])
        for j in range(1, m):
            dp[i, j] = max(
                min(dp[i - 1, j], dp[i - 1, j - 1], dp[i, j - 1]), d[i, j]
            )
    return float(dp[n - 1, m - 1])


KERNELS = {
    "dtw": dtw,
    "lcss": lcss,
    "edr": edr,
    "erp": erp,
    "euclid": euclid,
    "hausdorff": hausdorff,
    "frechet": frechet,
}


def ebd_topk(df: DataFrame, query_terms: list[str], k: int,
             id_col: str = "doc_id", text_col: str = "text",
             analyzer: str = "ws") -> DataFrame:
    """EBD intersection-based distance, pure Catalyst (K9 analog).

    The reference's clustering distance (``TrajectoryMtree.java:21-27``
    wires ``DistanceFunctions.EBD``) is set-overlap based; here:
    ``1 - |distinct(tokens) ∩ q| / max(|distinct(tokens)|, |q|)`` via
    ``array_intersect`` — fully codegen'd, SQL-oracle-checkable (exact
    rational arithmetic before one float division). Returns
    (doc_id, dist_u6) ordered (dist ASC, doc_id ASC) LIMIT k.
    """
    from ..operators.stats import tokenized

    q = sorted(set(str(t) for t in query_terms))
    qa = F.array(*[F.lit(t) for t in q])
    tok = tokenized(df, id_col, text_col, analyzer)
    dtoks = F.array_distinct("tokens")
    inter = F.size(F.array_intersect(dtoks, qa)).cast("double")
    denom = F.greatest(F.size(dtoks), F.lit(len(q))).cast("double")
    dist = F.lit(1.0) - inter / denom
    return (
        tok.select("doc_id", dist.alias("dist"))
        .orderBy(F.col("dist").asc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id",
                F.round(F.col("dist") * 1e6).cast("bigint").alias("dist_u6"))
    )


def topk_similar(
    df: DataFrame,
    query_text: str,
    k: int,
    measure: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "ws",
) -> DataFrame:
    """Top-k documents by DP kernel vs a query text.

    Ordering: similarity measures (lcss) DESC, distances ASC; ties by
    doc_id ASC (our fixed spec — the reference heap pops ascending,
    SURVEY.md §2.5 T7 note). Returns (doc_id, score_u6).
    """
    if measure not in KERNELS:
        raise ValueError(f"unknown measure {measure!r}")
    qseq = seq_of(query_text, analyzer)
    kern = KERNELS[measure]
    higher_better = measure in _SIM_MEASURES

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scores = [
                kern(seq_of(t, analyzer), qseq) for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf[id_col], "score": np.asarray(scores, dtype=np.float64)}
            )

    scored = df.select(id_col, text_col).mapInPandas(
        score, schema="doc_id bigint, score double"
    )
    order = (
        [F.col("score").desc(), F.col("doc_id").asc()]
        if higher_better
        else [F.col("score").asc(), F.col("doc_id").asc()]
    )
    return (
        scored.orderBy(*order)
        .limit(k)
        .select(
            "doc_id", F.round(F.col("score") * 1e6).cast("bigint").alias("score_u6")
        )
    )
