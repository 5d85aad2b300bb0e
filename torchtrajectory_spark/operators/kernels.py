"""Sequence-similarity kernels — parity family for T-Torch's measure suite.

The reference scores trajectories against a query with DP kernels over
point sequences (``queryEngine/similarity/SimilarityFunction.java``: LCSS
:61-95, ERP :97-136, EDR :138-169, DTW :204-225, Hausdorff :227-272,
discrete Fréchet :274-300, lockstep Euclidean :50-58) dispatched from
``LEVI.findTopK`` (``base/spatialIndex/LEVI.java:95-112``).

Full-text re-expression: a document is the sequence of scalar token values
``v_i = (int(md5(token_i)[:4], 16) % 1000) / 1000`` over its first
``SEQ_PREFIX`` tokens (the positional/value structure of a trajectory;
the FIXED prefix is part of the query spec — it makes the DP small enough
that a DuckDB unrolled-DP oracle checks every kernel exactly), distance =
|x - y|, epsilon-match for LCSS/EDR mirrors the reference's 50 m epsilon
(``LEVI.java:30``). The md5-derived value is engine-portable (DuckDB
derives the identical integer by nibble arithmetic over the same hex).

Kernels run inside ``mapInPandas`` (Arrow batches); every floating-point
operation is sequenced exactly as the generated oracle SQL sequences it,
so scores are bit-identical across engines. The global top-k is Spark's
TakeOrderedAndProject.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizer import tokenize_py

EPS = 0.05        # epsilon-match for LCSS/EDR (analog of LEVI.java:30)
ERP_GAP = 0.0     # ERP gap value g (analog SimilarityFunction.java:97-136)
SEQ_PREFIX = 32   # fixed token prefix per document (query spec)
MEASURES = ("dtw", "lcss", "edr", "erp", "euclid", "hausdorff", "frechet")
# higher-is-better measures (rest are distances: lower is better)
_SIM_MEASURES = {"lcss"}


def val_of(token: str) -> float:
    """Portable token value: first 4 hex chars of md5 mod 1000, scaled."""
    h = hashlib.md5(token.encode()).hexdigest()
    return (int(h[:4], 16) % 1000) / 1000.0


def seq_of(text: str, analyzer: str = "ws",
           prefix: int | None = SEQ_PREFIX) -> np.ndarray:
    toks = tokenize_py(text or "", analyzer)
    if prefix is not None:
        toks = toks[:prefix]
    if not toks:
        return np.zeros(1, dtype=np.float64)
    return np.array([val_of(t) for t in toks], dtype=np.float64)


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
    equal length; we truncate to min length, documented divergence).

    Sequential left-to-right accumulation — the oracle SQL adds the same
    terms in the same order (numpy's pairwise summation would differ in
    the last ulp and break bit-identity)."""
    n = min(len(a), len(b))
    acc = 0.0
    for i in range(n):
        d = float(a[i]) - float(b[i])
        acc += d * d
    return float(np.sqrt(acc))


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


# ------------------ doc-batched DP kernels (same-length blocks) -----------
#
# The scalar kernels above are the spec (and what the generated DuckDB
# oracles unroll). The hot scoring path runs the SAME recurrences
# vectorized across the DOC axis: a block of B same-length sequences
# advances one DP cell for all B docs per numpy op, so a 32x32 DP costs
# ~1k vector ops per block instead of ~1k interpreted steps PER DOC
# (measured ~1 ms/doc scalar). Per-cell float sequencing is unchanged —
# min(a,b,c) = minimum(minimum(a,b),c) and each +/- is one op in both
# forms — so scores are bit-identical to the scalar kernels and the
# oracles (asserted in tests/test_kernels.py).

def _min3(a, b, c):
    return np.minimum(np.minimum(a, b), c)


def dtw_batch(X: np.ndarray, q: np.ndarray) -> np.ndarray:
    B, n = X.shape
    m = len(q)
    prev = np.full((B, m + 1), np.inf)
    prev[:, 0] = 0.0
    for i in range(n):
        cost = np.abs(X[:, i, None] - q[None, :])
        cur = np.empty((B, m + 1))
        cur[:, 0] = np.inf
        for j in range(1, m + 1):
            cur[:, j] = cost[:, j - 1] + _min3(
                prev[:, j], prev[:, j - 1], cur[:, j - 1]
            )
        prev = cur
    return prev[:, m]


def lcss_batch(X: np.ndarray, q: np.ndarray, eps: float = EPS,
               theta: int | None = None) -> np.ndarray:
    B, n = X.shape
    m = len(q)
    prev = np.zeros((B, m + 1), dtype=np.int64)
    jidx = np.arange(m)
    for i in range(n):
        match = np.abs(X[:, i, None] - q[None, :]) <= eps
        if theta is not None:
            match = match & (np.abs(jidx - i) <= theta)[None, :]
        cur = np.zeros((B, m + 1), dtype=np.int64)
        for j in range(1, m + 1):
            cur[:, j] = np.where(
                match[:, j - 1], prev[:, j - 1] + 1,
                np.maximum(prev[:, j], cur[:, j - 1]),
            )
        prev = cur
    return prev[:, m].astype(np.float64)


def edr_batch(X: np.ndarray, q: np.ndarray,
              eps: float = EPS) -> np.ndarray:
    B, n = X.shape
    m = len(q)
    prev = np.tile(np.arange(m + 1, dtype=np.int64), (B, 1))
    for i in range(n):
        cur = np.empty((B, m + 1), dtype=np.int64)
        cur[:, 0] = i + 1
        subcost = (np.abs(X[:, i, None] - q[None, :]) > eps).astype(np.int64)
        for j in range(1, m + 1):
            cur[:, j] = _min3(
                prev[:, j - 1] + subcost[:, j - 1],
                prev[:, j] + 1, cur[:, j - 1] + 1,
            )
        prev = cur
    return prev[:, m].astype(np.float64)


def erp_batch(X: np.ndarray, q: np.ndarray,
              g: float = ERP_GAP) -> np.ndarray:
    B, n = X.shape
    m = len(q)
    prev = np.tile(
        np.cumsum(np.concatenate(([0.0], np.abs(q - g)))), (B, 1)
    )
    for i in range(n):
        ai = X[:, i]
        dq = np.abs(ai[:, None] - q[None, :])
        gap_a = np.abs(ai - g)
        cur = np.empty((B, m + 1))
        cur[:, 0] = prev[:, 0] + gap_a
        for j in range(1, m + 1):
            cur[:, j] = _min3(
                prev[:, j - 1] + dq[:, j - 1],
                prev[:, j] + gap_a,
                cur[:, j - 1] + abs(float(q[j - 1]) - g),
            )
        prev = cur
    return prev[:, m]


def euclid_batch(X: np.ndarray, q: np.ndarray) -> np.ndarray:
    B, n = X.shape
    nc = min(n, len(q))
    acc = np.zeros(B)
    for i in range(nc):
        d = X[:, i] - q[i]
        acc += d * d
    return np.sqrt(acc)


def hausdorff_batch(X: np.ndarray, q: np.ndarray) -> np.ndarray:
    D = np.abs(X[:, :, None] - q[None, None, :])
    return np.maximum(D.min(axis=2).max(axis=1), D.min(axis=1).max(axis=1))


def frechet_batch(X: np.ndarray, q: np.ndarray) -> np.ndarray:
    B, n = X.shape
    m = len(q)
    D = np.abs(X[:, :, None] - q[None, None, :])
    dp = np.empty((B, n, m))
    dp[:, 0, 0] = D[:, 0, 0]
    for j in range(1, m):
        dp[:, 0, j] = np.maximum(dp[:, 0, j - 1], D[:, 0, j])
    for i in range(1, n):
        dp[:, i, 0] = np.maximum(dp[:, i - 1, 0], D[:, i, 0])
        for j in range(1, m):
            dp[:, i, j] = np.maximum(
                _min3(dp[:, i - 1, j], dp[:, i - 1, j - 1],
                      dp[:, i, j - 1]),
                D[:, i, j],
            )
    return dp[:, n - 1, m - 1]


KERNELS_BATCH = {
    "dtw": dtw_batch,
    "lcss": lcss_batch,
    "edr": edr_batch,
    "erp": erp_batch,
    "euclid": euclid_batch,
    "hausdorff": hausdorff_batch,
    "frechet": frechet_batch,
}


def score_block(seqs: list[np.ndarray], q: np.ndarray,
                measure: str) -> np.ndarray:
    """Score a ragged list of sequences with the batched kernel, grouping
    rows by length (<= SEQ_PREFIX distinct lengths per block)."""
    kern = KERNELS_BATCH[measure]
    lens = np.array([len(s) for s in seqs])
    out = np.empty(len(seqs))
    for ln in np.unique(lens):
        idx = np.where(lens == ln)[0]
        X = np.stack([seqs[i] for i in idx])
        out[idx] = kern(X, q)
    return out


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


# ------------------- index-assisted pruned top-k (LEVI analog) ------------
#
# The reference never brute-forces its measure suite: LEVI generates
# candidates from prebuilt structures, bounds them, and early-terminates
# (``LEVI.java:115-132`` match-count UB, ``:251-392`` round-capped
# deepening with the running k-th best as the theta threshold). The
# re-expression below:
#
# * ``seq_table`` — the prebuilt doc -> value-sequence side table (the
#   ``trajectory_edge.txt`` mapped-trajectory analog): built once per
#   corpus, queries never re-tokenize documents.
# * ``seq_bounds`` — one vectorized numpy pass over the side table
#   computing a provable per-doc bound for the measure (UB for lcss,
#   LB for the distances; see each bound's derivation inline).
# * ``topk_similar_pruned`` — round 1 scores the best-bounded seed set
#   exactly, fixing theta = running k-th best; round 2 scores only docs
#   whose bound says they could still enter (bound <= theta / >= theta)
#   — the T4 theta-test over a 2-round T6 deepening loop. Exact: every
#   final top-k member's bound passes the theta test, so results are
#   identical to the brute-force scan (asserted in tests).


def seq_table(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", analyzer: str = "ws") -> DataFrame:
    """(doc_id, vals ARRAY<DOUBLE>) — the fixed-prefix value sequences."""

    def conv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "vals": [seq_of(t, analyzer).tolist()
                         for t in pdf[text_col]],
            })

    return df.select(id_col, text_col).mapInPandas(
        conv, schema="doc_id bigint, vals array<double>"
    )


def _bound_np(vals: np.ndarray, q: np.ndarray, measure: str) -> float:
    """Provable bound for one doc (UB for lcss, LB otherwise).

    * lcss  UB: LCSS pairs each matched query point with a distinct doc
      point, so LCSS <= min(#q-points with any eps-match, #doc-points
      with any eps-match, n, m).
    * dtw   LB: every a_i (and every b_j) appears in >=1 warping pair of
      cost >= its nearest-counterpart distance, so DTW >= max(sum_i
      min_j |a_i-b_j|, sum_j min_i |a_i-b_j|).
    * edr   LB: each unmatched-at-eps a_i (resp. b_j) consumes >=1 edit
      op, and |n-m| ops are unavoidable: LB = max(|n-m|, unmatched_a,
      unmatched_b).
    * erp   LB (g=0): the classic ERP bound |sum(a) - sum(b)|.
    * frechet LB: a coupling covers every point, so discrete Frechet >=
      Hausdorff — computed exactly (cheap) and used as the bound.
    * euclid / hausdorff: the exact score IS the bound (both are cheap
      closed forms; "pruning" degenerates to scoring, which is correct
      and costs nothing extra).
    """
    d = np.abs(vals[:, None] - q[None, :])
    n, m = len(vals), len(q)
    if measure == "lcss":
        match = d <= EPS
        return float(min(match.any(axis=1).sum(),
                         match.any(axis=0).sum(), n, m))
    if measure == "dtw":
        return float(max(d.min(axis=1).sum(), d.min(axis=0).sum()))
    if measure == "edr":
        unmatched = d > EPS
        return float(max(abs(n - m),
                         unmatched.all(axis=1).sum(),
                         unmatched.all(axis=0).sum()))
    if measure == "erp":
        return float(abs((vals - ERP_GAP).sum() - (q - ERP_GAP).sum()))
    if measure in ("hausdorff", "frechet"):
        return float(max(d.min(axis=1).max(), d.min(axis=0).max()))
    if measure == "euclid":
        nc = min(n, m)
        acc = 0.0
        for i in range(nc):
            dd = float(vals[i]) - float(q[i])
            acc += dd * dd
        return float(np.sqrt(acc))
    raise ValueError(measure)


def seq_bounds(seq_tbl: DataFrame, query_text: str, measure: str,
               analyzer: str = "ws") -> DataFrame:
    """(doc_id, bound) for every doc in the side table."""
    qseq = seq_of(query_text, analyzer)

    def bounds(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "bound": [
                    _bound_np(np.asarray(v, dtype=np.float64), qseq, measure)
                    for v in pdf["vals"]
                ],
            })

    return seq_tbl.mapInPandas(bounds, schema="doc_id bigint, bound double")


def _score_seqs(seq_tbl: DataFrame, ids: DataFrame, query_text: str,
                measure: str, analyzer: str = "ws") -> DataFrame:
    """(doc_id, score) — exact DP for the docs in ``ids`` only, scored
    with the doc-batched kernels (bit-identical to the scalar spec)."""
    qseq = seq_of(query_text, analyzer)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seqs = [np.asarray(v, dtype=np.float64) for v in pdf["vals"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "score": score_block(seqs, qseq, measure),
            })

    return seq_tbl.join(ids.select("doc_id"), "doc_id", "left_semi") \
        .mapInPandas(score, schema="doc_id bigint, score double")


def topk_similar_pruned(
    seq_tbl: DataFrame,
    query_text: str,
    k: int,
    measure: str,
    analyzer: str = "ws",
) -> DataFrame:
    """Exact top-k over the prebuilt sequence table with bound pruning.

    Rank-identical to ``topk_similar`` on the same corpus (the bound
    derivations guarantee every final top-k member survives the theta
    test; ties at theta are kept because the survivor filter is
    non-strict). Returns (doc_id, score_u6).
    """
    if measure not in KERNELS:
        raise ValueError(f"unknown measure {measure!r}")
    higher_better = measure in _SIM_MEASURES
    if measure in ("euclid", "hausdorff"):
        # the "bound" for these closed-form measures IS the exact score
        # (same op sequence) — one pass, no seed/survivor rounds
        return (
            seq_bounds(seq_tbl, query_text, measure, analyzer)
            .orderBy(F.col("bound").asc(), F.col("doc_id").asc())
            .limit(k)
            .select(
                "doc_id",
                F.round(F.col("bound") * 1e6).cast("bigint")
                .alias("score_u6"),
            )
        )
    # ONE fused pass computes every doc's bound AND exact scores for each
    # batch's best-bounded k docs (the seed set): a Python-worker stage
    # carries a ~0.4 s fixed launch cost locally, so the round-2 shape
    # (bounds job -> seed-score job -> survivor job) paid it three times.
    # Per-batch seeds are as valid as globally-best seeds — ANY exactly-
    # scored set yields a correct theta; a tighter theta only shrinks the
    # survivor set, never the result (the final pass is exact).
    qseq = seq_of(query_text, analyzer)

    def bounds_and_seeds(batches: Iterator[pd.DataFrame]
                         ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            seqs = [np.asarray(v, dtype=np.float64) for v in pdf["vals"]]
            bnd = np.array([_bound_np(s, qseq, measure) for s in seqs])
            order = np.argsort(-bnd if higher_better else bnd,
                               kind="stable")[:k]
            seed_score = np.full(len(seqs), np.nan)
            if len(order):
                seed_score[order] = score_block(
                    [seqs[i] for i in order], qseq, measure
                )
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "bound": bnd,
                "seed_score": seed_score,
            })

    bounds = seq_tbl.mapInPandas(
        bounds_and_seeds,
        schema="doc_id bigint, bound double, seed_score double",
    ).localCheckpoint(eager=True)

    seed_scores = sorted(
        (r["seed_score"]
         # non-seed rows carry NaN, which the pandas->Arrow handoff maps
         # to SQL null — guard both representations
         for r in bounds.where(F.col("seed_score").isNotNull()
                               & ~F.isnan(F.col("seed_score")))
         .select("seed_score").collect()),
        reverse=higher_better,
    )
    s_order = (
        [F.col("score").desc(), F.col("doc_id").asc()]
        if higher_better
        else [F.col("score").asc(), F.col("doc_id").asc()]
    )
    if len(seed_scores) < k:
        # fewer docs than k: no pruning possible, score everything
        survivors = bounds
    else:
        theta = seed_scores[k - 1]
        keep = (F.col("bound") >= theta) if higher_better \
            else (F.col("bound") <= theta)
        survivors = bounds.where(keep)
    final = _score_seqs(seq_tbl, survivors, query_text, measure, analyzer)
    return (
        final.orderBy(*s_order)
        .limit(k)
        .select(
            "doc_id",
            F.round(F.col("score") * 1e6).cast("bigint").alias("score_u6"),
        )
    )
